"""Perceptual average-hash (aHash) family: pure-Python kernel replay +
twin detection guarantee (operators/multimodal.py image_ahash*)."""

import pandas as pd

from sbb_ocr_postcorrection_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def _py_ahash(b: bytes) -> int:
    """From-scratch reference (no numpy): sample 60 evenly-spaced bytes,
    set bit i iff 60·luma_i > Σ lumas."""
    n = len(b)
    if n == 0:
        return 0
    lum = [b[(i * n) // mm.AHASH_BITS] for i in range(mm.AHASH_BITS)]
    total = sum(lum)
    h = 0
    for i, v in enumerate(lum):
        if mm.AHASH_BITS * v > total:
            h |= 1 << i
    return h


def test_ahash_kernel_reference(spark):
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r for r in mm.image_ahash(spark, SF).collect()}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        b = (text or "").encode()
        assert got[doc_id]["ahash"] == _py_ahash(b)
        assert got[doc_id]["n_bytes"] == len(b)
    # twins exist and are hashed too
    twin_ids = [
        i + 1_000_000
        for i, t in zip(pdf["doc_id"], pdf["text"])
        if i % 37 == 0 and len(t or "") >= mm.AHASH_BITS
    ]
    assert twin_ids and all(t in got for t in twin_ids)


def test_ahash_edge_payloads():
    assert _py_ahash(b"") == mm._ahash_bytes(b"") == 0
    for payload in (b"a", b"ab", b"a" * 59, b"abc" * 100, bytes(range(256))):
        assert mm._ahash_bytes(payload) == _py_ahash(payload)
    # constant payload: no byte exceeds the mean -> hash 0
    assert mm._ahash_bytes(b"x" * 500) == 0


def test_ahash_twins_detected(spark):
    """Every injected twin pair must be caught by the banded join +
    Hamming verify. The swap construction keeps the luma total fixed, so
    twins sit at Hamming ≤ 2 (inside the band join's exact ≤ 3
    pigeonhole guarantee) and at nonzero distance for at least one pair
    (exercising the tolerance path, not just exact equality)."""
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in mm.image_ahash_dedup(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    twin_keys = [
        (i, i + 1_000_000)
        for i, t in zip(pdf["doc_id"], pdf["text"])
        if i % 37 == 0 and len(t or "") >= mm.AHASH_BITS
    ]
    assert twin_keys
    for k in twin_keys:
        assert k in pairs, f"twin pair {k} missed"
        assert 0 <= pairs[k] <= 2
    assert any(pairs[k] > 0 for k in twin_keys)


def test_ahash_recall_guarantee(spark):
    """The 4×15 banding's pigeonhole guarantee: recall is exactly 100%
    for every Hamming value ≤ 3; ground-truth counts always bound the
    caught counts."""
    rows = mm.ahash_recall_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_caught"] <= r["n_true_pairs"]
        if r["hamming"] <= 3:
            assert r["recall_pct"] == 100.0
