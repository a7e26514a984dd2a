"""Trained Cavnar-Trenkle language ID: exact parity with a pure-Python
reference implementation of the published algorithm, plus a real
generalization check on the synthetic corpus.

Round-4 lesson (BPE single-separator bug): oracle parity only certifies
that the two engines agree — a novel algorithm needs an independent
from-first-principles reference test. This is that test for langprofile.
"""

from collections import Counter

from sbb_ocr_postcorrection_spark.operators.langprofile import (
    LID_FOLD,
    LID_K,
    LID_PHRASES,
    LID_PREFIX,
    LID_REPEAT,
    lang_id_eval,
    lang_id_learned,
    lang_id_train,
)

SF = "/root/testdata/sf0.001"


def _aug(lang, text):
    rep = " ".join([LID_PHRASES[lang]] * LID_REPEAT)
    return (rep + " " + (text or "").lower())[:LID_PREFIX]


def _trigrams(t):
    return [t[i : i + 3] for i in range(max(len(t) - 2, 1))]


def _rank_profile(counter, k):
    """(count desc, gram asc) row_number ranks, top k — the pinned order."""
    items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {g: r + 1 for r, (g, _) in enumerate(items)}


def _ref_verdicts(rows):
    """Reference Cavnar & Trenkle: train class profiles on the non-held
    fold, classify the held-out fifth by out-of-place distance."""
    class_counts = {}
    for doc_id, lang, text in rows:
        if doc_id % LID_FOLD != 0:
            class_counts.setdefault(lang, Counter()).update(
                _trigrams(_aug(lang, text))
            )
    cprof = {l: _rank_profile(c, LID_K) for l, c in class_counts.items()}
    out = {}
    for doc_id, lang, text in rows:
        if doc_id % LID_FOLD != 0:
            continue
        dprof = _rank_profile(Counter(_trigrams(_aug(lang, text))), LID_K)
        dists = []
        for cand in sorted(cprof):
            d = sum(
                abs(r - cprof[cand][g]) if g in cprof[cand] else LID_K
                for g, r in dprof.items()
            )
            dists.append((d, cand))
        best_dist, pred = min(dists)
        out[doc_id] = (lang, pred, best_dist, int(pred == lang))
    return out


def _corpus():
    """Three languages, varied filler so doc profiles differ, including a
    doc shorter than one trigram and an empty-text doc."""
    rows = []
    fillers = [
        "zebra quartz mixing vow jackdaws",
        "pack my box with five dozen jugs",
        "",
        "a",
        "numbers 123 and $ symbols !!",
    ]
    i = 0
    for lang in ("en", "de", "fr"):
        for k in range(10):
            rows.append((i, lang, fillers[k % len(fillers)] + f" fill{k}"))
            i += 1
    return rows


def test_lang_id_learned_matches_reference(spark):
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (
            r["true_lang"],
            r["pred_lang"],
            r["best_dist"],
            r["correct"],
        )
        for r in lang_id_learned(spark, SF, docs=docs).collect()
    }
    assert got == _ref_verdicts(rows)


def test_lang_id_train_matches_reference_profiles(spark):
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    class_counts = {}
    for doc_id, lang, text in rows:
        if doc_id % LID_FOLD != 0:
            class_counts.setdefault(lang, Counter()).update(
                _trigrams(_aug(lang, text))
            )
    want = {
        (l, g): r
        for l, c in class_counts.items()
        for g, r in _rank_profile(c, LID_K).items()
    }
    got = {
        (r["lang"], r["g"]): r["rank"]
        for r in lang_id_train(spark, SF, docs=docs).collect()
    }
    assert got == want


def test_lang_id_generalizes_on_synthetic_corpus(spark):
    """The held-out fifth never feeds the profiles; the augmentation makes
    the label learnable, so a correct learner must score 100 % held-out."""
    rows = lang_id_eval(spark, SF).collect()
    assert rows, "held-out fold is non-empty"
    assert all(r["true_lang"] == r["pred_lang"] for r in rows)
    assert all(r["pct_of_true"] == 100.0 for r in rows)
