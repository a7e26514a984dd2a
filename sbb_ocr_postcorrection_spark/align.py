"""Line-sequence alignment — the dinglehopper seq_align analog (J3).

The reference aligns OCR lines to GT lines per page with an external
sequence aligner (qurator.dinglehopper.align, called at
preprocessing/cli_preproc.py:220) and then scores each aligned pair
(sequence_similarity.py:4-95: Levenshtein, CER, band filter, similarity
bit). This module re-derives those semantics from scratch:

* Needleman-Wunsch over the two LINE sequences, with per-cell cost =
  normalized edit distance of the two lines (gap cost 1.0) — pure Python,
  deterministic tie-break (diag > up > left);
* pair scoring per the reference's band rule: min_dist = round(len(gt)*0),
  allowed_dist = round(len(gt)*0.10), similarity = 1 iff min ≤ lev ≤ allowed.

Runs inside the per-page Arrow kernel (operators/alignment.py); no Spark
dependency here so the single-node oracle path stays importable anywhere.
"""

from __future__ import annotations

from .textkit import cer, levenshtein, nfc

GAP_COST = 1.0
MIN_RATIO = 0.0
MAX_RATIO = 0.10


def _pair_cost(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if not la and not lb:
        return 0.0
    return levenshtein(a, b) / max(la, lb)


def seq_align(ocr_lines: list[str], gt_lines: list[str]) -> list[tuple[int | None, int | None]]:
    """Global alignment of two line sequences; returns (ocr_idx, gt_idx)
    pairs in order, None marking a gap (unmatched line)."""
    n, m = len(ocr_lines), len(gt_lines)
    # DP table
    dp = [[0.0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        dp[i][0] = i * GAP_COST
    for j in range(1, m + 1):
        dp[0][j] = j * GAP_COST
    for i in range(1, n + 1):
        oi = ocr_lines[i - 1]
        row = dp[i]
        prev = dp[i - 1]
        for j in range(1, m + 1):
            row[j] = min(
                prev[j - 1] + _pair_cost(oi, gt_lines[j - 1]),
                prev[j] + GAP_COST,
                row[j - 1] + GAP_COST,
            )
    # traceback, deterministic preference: diag, up, left
    out: list[tuple[int | None, int | None]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and abs(
            dp[i][j] - (dp[i - 1][j - 1] + _pair_cost(ocr_lines[i - 1], gt_lines[j - 1]))
        ) < 1e-12:
            out.append((i - 1, j - 1))
            i -= 1
            j -= 1
        elif i > 0 and abs(dp[i][j] - (dp[i - 1][j] + GAP_COST)) < 1e-12:
            out.append((i - 1, None))
            i -= 1
        else:
            out.append((None, j - 1))
            j -= 1
    out.reverse()
    return out


def score_pair(ocr: str, gt: str) -> dict:
    """The reference's similarity scoring for one aligned pair
    (sequence_similarity.py:23-80 semantics)."""
    ocr_n = nfc(ocr)
    gt_n = nfc(gt)
    lev = levenshtein(ocr_n, gt_n)
    min_dist = round(len(gt_n) * MIN_RATIO)
    allowed = round(len(gt_n) * MAX_RATIO)
    return {
        "ocr": ocr_n,
        "gt": gt_n,
        "cer": round(cer(ocr_n, gt_n), 6),
        "levenshtein": lev,
        "min_dist": min_dist,
        "allowed_dist": allowed,
        "similarity": 1 if min_dist <= lev <= allowed else 0,
    }


def align_page(ocr_lines: list[str], gt_lines: list[str]) -> list[dict]:
    """Aligned + scored rows for one page; gap lines pair with ''."""
    rows = []
    for k, (io, ig) in enumerate(seq_align(ocr_lines, gt_lines)):
        ocr = ocr_lines[io] if io is not None else ""
        gt = gt_lines[ig] if ig is not None else ""
        row = score_pair(ocr, gt)
        row["line_id"] = k
        rows.append(row)
    return rows
