"""Winnowing fingerprints: exact parity with a pure-Python
implementation of the published algorithm, plus the detection guarantee
(any shared substring ≥ k+w−1 chars must produce a match pair)."""

import hashlib
from collections import defaultdict

import duckdb

from sbb_ocr_postcorrection_spark.operators.dedup import (
    QUOTE_ID_BASE,
    QUOTE_MOD,
    QUOTE_SUFFIX,
)
from sbb_ocr_postcorrection_spark.operators.winnow import (
    WIN_K,
    WIN_MAX_DF,
    WIN_MIN_SHARED,
    WIN_W,
    winnow_fingerprints,
    winnow_matches,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corpus():
    docs = {}
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        docs[doc_id] = text
        if doc_id % QUOTE_MOD == 0:
            cut = max(len(text) * 2 // 5, 1)
            docs[doc_id + QUOTE_ID_BASE] = text[:cut] + QUOTE_SUFFIX
    return docs


def _ref_fps(text):
    t = (text or "").lower()
    n = len(t)
    if n < WIN_K + WIN_W - 1:
        return set()
    hs = [_h60(t[i : i + WIN_K]) for i in range(n - WIN_K + 1)]
    out = set()
    for s in range(len(hs) - WIN_W + 1):
        win = [(hs[s + j], -(s + j)) for j in range(WIN_W)]
        h, negi = min(win)
        out.add((h, -negi + 1))  # 1-based position
    return out


def test_winnow_fingerprints_match_reference(spark):
    want = {
        (doc_id, h, pos)
        for doc_id, text in _corpus().items()
        for h, pos in _ref_fps(text)
    }
    got = {
        (r["doc_id"], r["fp_hash"], r["pos"])
        for r in winnow_fingerprints(spark, SF).collect()
    }
    assert got == want


def test_winnow_matches_reference_and_guarantee(spark):
    docs = _corpus()
    fps = {d: {h for h, _ in _ref_fps(t)} for d, t in docs.items()}
    df = defaultdict(int)
    for s in fps.values():
        for h in s:
            df[h] += 1
    keep = {h for h, n in df.items() if n <= WIN_MAX_DF}
    want = {}
    ids = sorted(fps)
    by_h = defaultdict(set)
    for d, s in fps.items():
        for h in s & keep:
            by_h[h].add(d)
    cand = {
        (a, b)
        for members in by_h.values()
        for a in members
        for b in members
        if a < b
    }
    for a, b in cand:
        shared = len(fps[a] & fps[b] & keep)
        if shared >= WIN_MIN_SHARED:
            want[(a, b)] = (
                shared,
                len(fps[a]),
                len(fps[b]),
                round(shared / min(len(fps[a]), len(fps[b])), 6),
            )
    got = {
        (r["id1"], r["id2"]): (
            r["n_shared"],
            r["n_fp1"],
            r["n_fp2"],
            r["overlap"],
        )
        for r in winnow_matches(spark, SF).collect()
    }
    assert got == want
    # detection guarantee: long-enough excerpts MUST be paired with their
    # source (their shared prefix is far beyond k+w-1 chars)
    long_quotes = [
        d
        for d in docs
        if d >= QUOTE_ID_BASE
        and len(docs[d - QUOTE_ID_BASE]) * 2 // 5 >= 3 * (WIN_K + WIN_W - 1)
    ]
    assert long_quotes
    missing = [
        d for d in long_quotes if (d - QUOTE_ID_BASE, d) not in got
    ]
    assert not missing, f"guarantee violated for {missing[:5]}"
