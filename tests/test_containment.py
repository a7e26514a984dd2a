"""Asymmetric containment detection: exact parity with a pure-Python
reference implementation, plus the modality witness — pairs the
Jaccard-symmetric dedup family structurally misses (high containment,
low Jaccard) must be present and correctly oriented."""

from collections import defaultdict

import duckdb

from sbb_ocr_postcorrection_spark.operators.dedup import (
    CONTAIN_THRESHOLD,
    QUOTE_ID_BASE,
    QUOTE_MOD,
    QUOTE_SUFFIX,
    containment_pairs,
)

SF = "/root/testdata/sf0.001"


def _shingles(text):
    t = [w for w in (text or "").lower().split(" ") if w]
    return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}


def _ref_pairs():
    docs = {}
    for doc_id, text, lang in duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall():
        docs[doc_id] = (lang, text)
        if doc_id % QUOTE_MOD == 0:
            cut = max(len(text) * 2 // 5, 1)
            docs[doc_id + QUOTE_ID_BASE] = (lang, text[:cut] + QUOTE_SUFFIX)
    sh = {i: _shingles(t) for i, (_, t) in docs.items()}
    by_shingle = defaultdict(set)
    for i, s in sh.items():
        for g in s:
            by_shingle[g].add(i)
    cands = set()
    for ids in by_shingle.values():
        ids = sorted(ids)
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                if docs[ids[a]][0] == docs[ids[b]][0]:
                    cands.add((ids[a], ids[b]))
    want = {}
    for i1, i2 in cands:
        n = len(sh[i1] & sh[i2])
        c1 = round(n / len(sh[i1]), 6)
        c2 = round(n / len(sh[i2]), 6)
        if max(c1, c2) < CONTAIN_THRESHOLD:
            continue
        j = round(n / (len(sh[i1]) + len(sh[i2]) - n), 6)
        want[(i1, i2)] = (n, c1, c2, j, i1 if c1 >= c2 else i2)
    return want


def test_containment_matches_reference(spark):
    want = _ref_pairs()
    got = {
        (r["id1"], r["id2"]): (
            r["n_common"],
            r["containment1"],
            r["containment2"],
            r["jaccard"],
            r["contained_id"],
        )
        for r in containment_pairs(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, (n, c1, c2, j, cid) in want.items():
        gn, gc1, gc2, gj, gcid = got[k]
        assert gn == n and gcid == cid
        assert abs(gc1 - c1) < 1e-9 and abs(gc2 - c2) < 1e-9
        assert abs(gj - j) < 1e-9


def test_containment_catches_what_jaccard_misses(spark):
    """The witness: at least one reported pair must have containment ≥
    threshold while its Jaccard sits BELOW the dedup family's 0.8 bar,
    and the contained side must be the quote page."""
    rows = containment_pairs(spark, SF).collect()
    assert rows
    witnesses = [
        r
        for r in rows
        if r["jaccard"] < 0.8
        and max(r["containment1"], r["containment2"]) >= CONTAIN_THRESHOLD
    ]
    assert witnesses, "every reported pair was Jaccard-visible"
    assert all(w["contained_id"] >= QUOTE_ID_BASE for w in witnesses)


def test_semantic_dedup_drops_injected_twins(spark):
    """Every injected ×2-scaled twin lands in its source's cluster and is
    dropped with the source as keeper (cosine exactly 1 after round-4);
    sources themselves survive."""
    from sbb_ocr_postcorrection_spark.operators.similarity import (
        SEM_DUP_ID_BASE,
        SEM_DUP_MOD,
        semantic_dedup,
    )

    rows = {r["vec_id"]: r for r in semantic_dedup(spark, SF).collect()}
    injected = [v for v in rows if v >= SEM_DUP_ID_BASE]
    assert injected, "fixture injects twins"
    for v in injected:
        src = v - SEM_DUP_ID_BASE
        assert src % SEM_DUP_MOD == 0 and src in rows
        assert rows[v]["cell"] == rows[src]["cell"], "×2 preserves the cell"
        assert rows[v]["dropped"] == 1 and rows[v]["keeper"] == src
        assert rows[src]["dropped"] == 0 and rows[src]["keeper"] == src
    kept = [v for v, r in rows.items() if not r["dropped"]]
    assert len(kept) == len(rows) - sum(r["dropped"] for r in rows.values())
