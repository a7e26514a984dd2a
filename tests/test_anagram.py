"""TICCL anagram-hash lookup (operators/anagram.py): pure-Python replay
+ witness corrections + key-arithmetic properties."""

from collections import Counter

import pandas as pd

from sbb_ocr_postcorrection_spark.operators import anagram as an

SF = "/root/testdata/sf0.001"


def _av(w: str) -> int:
    return sum(ord(c) ** 5 for c in w)


def _py_vocab(pdf):
    tf = Counter()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        t = (text or "").lower()
        if doc_id % an.ANAGRAM_NOISE_MOD == 0:
            t += " " + an.ANAGRAM_NOISE_WORDS
        tf.update(w for w in t.split(" ") if w)
    return tf


def _py_candidates(tf):
    keys = {w: _av(w) for w in tf}
    by_key = {}
    for w, k in keys.items():
        by_key.setdefault(k, []).append(w)
    hits = set()
    for s, t in an.ANAGRAM_CONFUSIONS:
        d = _av(s) - _av(t)
        for e, ke in keys.items():
            for c in by_key.get(ke - d, []):
                if (
                    e != c
                    and s in e
                    and t in c
                    and len(e) == len(c) + len(s) - len(t)
                    and tf[c] > tf[e]
                ):
                    hits.add((e, tf[e], c, tf[c], s, t))
    return hits


def test_anagram_key_is_order_invariant():
    assert _av("listen") == _av("silent") == _av("enlist")
    assert _av("scan") != _av("scam")
    # the edit delta is position-independent
    for s, t in an.ANAGRAM_CONFUSIONS:
        d = _av(s) - _av(t)
        assert _av(f"x{s}y") - _av(f"x{t}y") == d
        assert _av(f"{s}xy") - _av(f"{t}xy") == d


def test_anagram_candidates_reference(spark):
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    want = _py_candidates(_py_vocab(pdf))
    got = {
        (
            r["err_word"],
            r["err_tf"],
            r["cand_word"],
            r["cand_tf"],
            r["sub_err"],
            r["sub_true"],
        )
        for r in an.anagram_candidates(spark, SF).collect()
    }
    assert got == want
    # the four injected OCR corruptions must all resolve
    errs = {e for e, *_ in got}
    assert {"tablc", "va1ue", "rnerge", "8atch"} <= errs


def test_anagram_corrections_pick_most_frequent(spark):
    rows = {
        r["err_word"]: r
        for r in an.anagram_corrections(spark, SF).collect()
    }
    assert rows["tablc"]["cand_word"] == "table"
    assert rows["va1ue"]["cand_word"] == "value"
    assert rows["rnerge"]["cand_word"] == "merge"
    assert rows["8atch"]["cand_word"] == "batch"
    for r in rows.values():
        assert r["cand_tf"] > r["err_tf"]
