"""Pure string functions — the F1..F18 scalar-function surface of SURVEY.md §2.8.

Everything here is deterministic, side-effect free and NumPy/stdlib only, so
the same code runs inside the single-node oracle and inside Arrow-batched
Spark kernels (byte-identity by construction).

Reference parity notes (behavior re-derived, no code copied):
* NFC normalization — reference normalizes before any comparison
  (helpers.py:321-343); Spark has no NFC builtin, so it lives here.
* max-length line splitting on separator boundaries mirrors the semantics of
  split_iter / split_into_groups / split_with_max_len
  (preprocessing/cli_preproc.py:29-68) including the inline assert cases at
  cli_preproc.py:72-85 (ported verbatim to tests/test_textkit.py).
* Levenshtein is our own DP implementation — NOT Spark's builtin — because
  the reference uses dinglehopper's edit distance and we need one definition
  on both the oracle and Spark sides.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable, Iterator


def nfc(s: str) -> str:
    """Unicode NFC normalization (F1)."""
    return unicodedata.normalize("NFC", s)


_WS_RE = re.compile(r"\s+")


def tokenize(s: str) -> list[str]:
    """Whitespace tokenization (F2); drops empty tokens."""
    return [t for t in _WS_RE.split(s) if t]


_WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+", re.UNICODE)


def wordpunct_tokenize(s: str) -> list[str]:
    """Word/punctuation tokenizer (F17 analog)."""
    return _WORDPUNCT_RE.findall(s)


def _levenshtein_np(a: str, b: str) -> int:
    """Row-vectorized DP for long strings: the substitution/deletion mins
    vectorize per row; the insertion term is a running minimum (cumulative),
    computed via np.minimum.accumulate on (prev_min - index)."""
    import numpy as np

    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(ca) + 1, dtype=np.int64)
    idx = np.arange(1, len(ca) + 1, dtype=np.int64)
    cur = np.empty(len(ca) + 1, dtype=np.int64)
    for j in range(1, len(cb) + 1):
        best = np.minimum(prev[:-1] + (ca != cb[j - 1]), prev[1:] + 1)
        # cur[i] = min(best[i], cur[i-1] + 1); with f[i] = cur[i] - i this is
        # f[i] = min(best[i] - i, f[i-1]), a prefix-min seeded by f[0] = j
        f = np.minimum.accumulate(np.concatenate(([j], best - idx)))
        cur[0] = j
        cur[1:] = f[1:] + idx
        prev, cur = cur, prev
    return int(prev[-1])


def levenshtein(a: str, b: str) -> int:
    """Edit distance, classic two-row DP (F12). Deterministic; switches to
    a row-vectorized NumPy DP for long inputs (same values, ~10× faster on
    the alignment kernel's 150+-char lines)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    if len(b) >= 48:
        return _levenshtein_np(a, b)
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, start=1):
        cur = [j]
        for i, ca in enumerate(a, start=1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def cer(ocr: str, gt: str) -> float:
    """Character error rate = distance / len(gt) (F13 semantics).

    CODE-POINT definition — matches the DuckDB levenshtein oracle exactly.
    The reference's CER (dinglehopper, via preprocessing/
    sequence_similarity.py:1-2) counts GRAPHEME CLUSTERS; use
    cer_clusters/levenshtein_clusters for that parity (SURVEY §7.3). After
    NFC the two agree except on clusters with no precomposed form
    (multi-mark stacks, ZWJ sequences, regional-indicator flags)."""
    if not gt:
        return 0.0 if not ocr else float(len(ocr))
    return levenshtein(ocr, gt) / len(gt)


# ------------------------------------------------ grapheme-cluster parity --

_ZWJ = "\u200d"
_MARK_CATS = ("Mn", "Mc", "Me")


def _is_ri(ch: str) -> bool:
    return 0x1F1E6 <= ord(ch) <= 0x1F1FF  # regional indicators (flags)


def grapheme_clusters(s: str) -> list[str]:
    """Extended grapheme clusters — the UAX #29 subset OCR text exercises
    (dinglehopper's unit of edit distance): combining marks (Mn/Mc/Me) and
    variation selectors extend the preceding base; ZWJ joins both sides
    (emoji/ligature sequences); CRLF is one cluster; regional indicators
    pair up. Full UAX #29 (prepend class, Hangul L/V/T) is out of scope —
    those don't occur in the corpus and are documented divergences."""
    clusters: list[str] = []
    cur: list[str] = []
    ri_count = 0
    for ch in s:
        join = False
        if cur:
            prev = cur[-1]
            if prev == "\r" and ch == "\n":
                join = True
            elif prev in ("\r", "\n"):
                join = False
            elif prev == _ZWJ or ch == _ZWJ:
                join = True
            elif (
                unicodedata.category(ch) in _MARK_CATS
                or 0xFE00 <= ord(ch) <= 0xFE0F
            ):
                join = True
            elif _is_ri(ch) and _is_ri(prev) and ri_count % 2 == 1:
                join = True
        if join:
            cur.append(ch)
            if _is_ri(ch):
                ri_count += 1
        else:
            if cur:
                clusters.append("".join(cur))
            cur = [ch]
            ri_count = 1 if _is_ri(ch) else 0
    if cur:
        clusters.append("".join(cur))
    return clusters


def levenshtein_clusters(a: str, b: str) -> int:
    """Edit distance over grapheme clusters of the NFC forms — the
    reference's distance definition (dinglehopper edit_distance.distance).
    Sequence-generic two-row DP; cluster lists are short (one element per
    visible glyph), so the NumPy path isn't needed here."""
    ca = grapheme_clusters(nfc(a))
    cb = grapheme_clusters(nfc(b))
    if ca == cb:
        return 0
    if not ca:
        return len(cb)
    if not cb:
        return len(ca)
    if len(ca) > len(cb):
        ca, cb = cb, ca
    prev = list(range(len(ca) + 1))
    for j, gb in enumerate(cb, start=1):
        cur = [j]
        for i, ga in enumerate(ca, start=1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ga != gb)))
        prev = cur
    return prev[-1]


def cer_clusters(ocr: str, gt: str) -> float:
    """Grapheme-cluster CER with dinglehopper's exact convention
    (character_error_rate_n): distance over NFC cluster sequences divided
    by the number of clusters in the REFERENCE (gt); 0/0 → 0.0, d/0 → inf."""
    d = levenshtein_clusters(ocr, gt)
    n = len(grapheme_clusters(nfc(gt)))
    if d == 0:
        return 0.0
    if n == 0:
        return float("inf")
    return d / n


def char_ngrams(s: str, n: int) -> list[str]:
    """Character n-grams of s (detector features)."""
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def word_shingles(tokens: list[str], n: int) -> list[str]:
    """Word n-gram shingles (dedup features)."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def split_iter(s: str, sep: str = " ") -> list[str]:
    """Separator split, empty pieces dropped — same observable output as the
    reference's regex-generator split_iter (cli_preproc.py:29-35) on
    non-degenerate input; its inline assert case is ported verbatim in
    tests/test_textkit.py."""
    return [p for p in s.split(sep) if p]


def split_into_groups(s: str, sep: str = " ", max_len: int = 40) -> list[list[str]]:
    """Greedy grouping of a string's tokens such that each group re-joins to
    at most max_len chars (cli_preproc.py:38-54 semantics): a token longer
    than max_len raises ValueError; a group is flushed when appending the
    next token would exceed max_len."""
    groups: list[list[str]] = []
    cur: list[str] = []
    for t in split_iter(s, sep):
        if len(t) > max_len:
            raise ValueError(f"token longer than max_len={max_len}: {t!r}")
        if len(sep.join(cur + [t])) > max_len:
            groups.append(cur)
            cur = [t]
        else:
            cur.append(t)
    groups.append(cur)
    return groups


def split_with_max_len(s: str, sep: str = " ", max_len: int = 40) -> list[str]:
    """Split a line at separator boundaries into chunks ≤ max_len
    (cli_preproc.py:57-68 semantics). Inverse: ``reassemble``."""
    return [sep.join(g) for g in split_into_groups(s, sep, max_len)]


def reassemble(parts: Iterable[str], sep: str = " ") -> str:
    """Inverse of split_with_max_len (cli_correct.py:34-59 analog)."""
    return sep.join(parts)


def sliding_windows(tokens: list[str], size: int = 4) -> Iterator[list[str]]:
    """Token sliding windows, stride 1 (helpers.py:92-134 semantics): a
    sequence shorter than `size` yields itself once; otherwise one window per
    start position 0..len-size."""
    if len(tokens) <= size:
        if tokens:
            yield tokens
        return
    for i in range(len(tokens) - size + 1):
        yield tokens[i : i + size]


def segment_runs(ids: list[int]) -> list[list[int]]:
    """Gaps-and-islands segmentation of an int sequence: a gap of more than 1
    starts a new run (helpers.py:137-223 semantics, W2)."""
    runs: list[list[int]] = []
    cur: list[int] = []
    prev: int | None = None
    for i in ids:
        if prev is not None and i - prev != 1:
            runs.append(cur)
            cur = []
        cur.append(i)
        prev = i
    if cur:
        runs.append(cur)
    return runs


def _seq_labels(a: list, b: list, pad_to: int) -> list[int]:
    """Shared label core: positional 1-correct/2-error over two sequences
    space-padded to the longer length, then 0-padded to pad_to — ONE
    definition for the code-point and grapheme-cluster views."""
    n = max(len(a), len(b))
    a = list(a) + [" "] * (n - len(a))
    b = list(b) + [" "] * (n - len(b))
    labels = [1 if x == y else 2 for x, y in zip(a, b)]
    if pad_to > n:
        labels += [0] * (pad_to - n)
    return labels


def char_labels(ocr: str, gt: str, pad_to: int = 0) -> list[int]:
    """Per-char equality labels: 1 correct, 2 error, 0 pad
    (cli_preproc.py:405-412 semantics, F8). Both strings space-padded to the
    longer length before comparison (F7)."""
    return _seq_labels(list(ocr), list(gt), pad_to)


def char_labels_clusters(ocr: str, gt: str, pad_to: int = 0) -> list[int]:
    """char_labels over grapheme clusters of the NFC forms — dinglehopper's
    unit (one label per visible glyph, SURVEY §7.3): a combining-mark error
    yields ONE error label on its base cluster, not a spurious extra
    position that shifts every later label."""
    return _seq_labels(grapheme_clusters(nfc(ocr)), grapheme_clusters(nfc(gt)), pad_to)
