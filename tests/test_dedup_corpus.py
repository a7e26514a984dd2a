"""deduplicate_corpus keep/drop semantics on a crafted corpus.

The near-dup pair is a 46-word text with ONE word changed: shingle Jaccard
0.875 (≥ the 0.8 threshold) and deterministically recalled by the banded
MinHash on this fixed input (LSH here is a pure function of the text)."""

import pandas as pd
import pytest

from sbb_ocr_postcorrection_spark.operators.dedup import deduplicate_corpus

BASE = ("the quick brown fox jumps over the lazy dog near the old river "
        "bank while birds sing in the tall green trees above and clouds "
        "drift slowly across the wide blue summer sky as children play "
        "games on the warm soft grass beside the quiet stone bridge")


@pytest.fixture()
def crafted_docs(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                BASE,                                # keeper of exact group
                BASE,                                # exact dup of 0
                BASE.replace("lazy", "sleepy"),      # near dup (J = 0.875)
                "completely different words about spark engines and parquet "
                "files flowing through distributed shuffle stages tonight",
                BASE,                                # exact dup of 0
                "another unrelated document with its own vocabulary talking "
                "about ocean tides and lunar cycles in winter evenings",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [len(BASE)] * 3 + [100, len(BASE), 100],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_keep_rules(spark, crafted_docs):
    rows = {r["doc_id"]: r for r in deduplicate_corpus(spark, crafted_docs, 0.8).collect()}
    assert rows[0]["keep"] == 1 and rows[0]["drop_reason"] == "kept"
    assert rows[1]["keep"] == 0 and rows[1]["drop_reason"] == "exact_dup"
    assert rows[4]["keep"] == 0 and rows[4]["drop_reason"] == "exact_dup"
    # near dup: one changed word in 46 → J=0.875 ≥ 0.8 → dropped
    assert rows[2]["keep"] == 0 and rows[2]["drop_reason"] == "near_dup"
    # distinct docs survive
    assert rows[3]["keep"] == 1
    assert rows[5]["keep"] == 1
    kept = sorted(i for i, r in rows.items() if r["keep"] == 1)
    assert kept == [0, 3, 5]


def test_threshold_spares_weaker_matches(spark, crafted_docs):
    # raising the bar above 0.875 keeps the near-dup
    rows = {r["doc_id"]: r for r in deduplicate_corpus(spark, crafted_docs, 0.9).collect()}
    assert rows[2]["keep"] == 1
    assert rows[1]["keep"] == 0  # exact dups unaffected by the threshold
