"""Inverted index + keyword search: hand-computed fixture, conjunctive
semantics, tie-breaks, and the broadcast-probe plan shape."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    rows = [
        (1, "alpha beta alpha gamma"),
        (2, "alpha beta beta"),
        (3, "alpha delta"),
        (4, "beta beta beta"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_stats(spark):
    from sbb_ocr_postcorrection_spark.operators.index import inverted_index

    idx = {r["token"]: r for r in
           inverted_index(spark, SF, docs=_docs(spark)).collect()}
    assert idx["alpha"]["df"] == 3 and idx["alpha"]["cf"] == 4
    assert idx["beta"]["df"] == 3 and idx["beta"]["cf"] == 6
    assert idx["gamma"]["df"] == 1 and idx["gamma"]["cf"] == 1
    assert idx["alpha"]["top_postings"] == [1, 2, 3]
    assert idx["beta"]["top_postings"] == [1, 2, 4]
    # null text contributes nothing
    assert all(5 not in r["top_postings"] for r in idx.values())


def test_keyword_search_conjunctive_topk(spark):
    """Probe terms self-derive as the 2 most frequent tokens (beta cf=6,
    alpha cf=4); only docs carrying BOTH match; score = total tf with
    doc_id tie-break."""
    from sbb_ocr_postcorrection_spark.operators.index import keyword_search

    rows = keyword_search(spark, SF, docs=_docs(spark)).collect()
    # d1: alpha·2 + beta·1 = 3; d2: alpha·1 + beta·2 = 3; d3/d4 lack one
    # term; the 3-3 tie breaks on doc_id
    assert [(r["rank"], r["doc_id"], r["score"]) for r in rows] == [
        (1, 1, 3),
        (2, 2, 3),
    ]


def test_keyword_search_plan_broadcasts_terms(spark):
    from sbb_ocr_postcorrection_spark.operators.index import keyword_search

    plan = (
        keyword_search(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_rare_terms_ranking(spark):
    """Distinctive-term ranking: rarity (df) first, then in-doc tf, then
    token; docs with fewer terms than k emit what they have; null text
    emits nothing."""
    from sbb_ocr_postcorrection_spark.operators.index import rare_terms

    rows = rare_terms(spark, SF, docs=_docs(spark)).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rnk"])):
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    # d1: gamma (df=1) beats alpha (df=3, tf=2) beats beta (df=3, tf=1)
    assert by_doc[1] == ["gamma", "alpha", "beta"]
    assert by_doc[3] == ["delta", "alpha"]
    assert by_doc[4] == ["beta"]
    assert 5 not in by_doc


def test_phrase_search_exact_adjacency(spark):
    """Positional intersection: adjacency required (alpha...gamma with a
    word between must NOT match), overlapping occurrences each count,
    first_pos is the earliest anchor."""
    from sbb_ocr_postcorrection_spark.operators.index import phrase_search

    rows = [
        (1, "alpha beta alpha beta alpha beta"),  # 3 occurrences at 0,2,4
        (2, "alpha x beta"),                       # co-occur, not adjacent
        (3, "x alpha beta y"),                     # one at pos 1
        (4, "beta alpha"),                         # wrong order
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search(spark, SF, docs=docs,
                                  phrase=["alpha", "beta"]).collect()}
    assert got == {1: (3, 0), 3: (1, 1)}
    # self-derived probe: the corpus' top bigram here is "alpha beta"
    auto = {r["doc_id"]: r["n_matches"]
            for r in phrase_search(spark, SF, docs=docs).collect()}
    assert auto == {1: 3, 3: 1}
