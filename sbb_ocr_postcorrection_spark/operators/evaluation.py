"""Evaluation aggregates — the A9 surface (mt/cli_correct.py:368-393,
1537-1550): precision/recall/F1/accuracy computed from the 4 confusion
cells of a groupBy, never via sklearn on collected arrays.

The demo instance classifies events: prediction = value above a threshold,
truth = event_type == 'purchase'. The operator shape (two boolean columns →
confusion cells → derived metrics in one pass) is what transfers to the
detector-vs-goldstandard evaluation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .relational import load


def confusion_metrics(
    df: DataFrame, pred_col, truth_col, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Confusion cells + P/R/F1/accuracy per group in a single two-phase
    aggregation. pred/truth are boolean columns (or expressions)."""
    p = pred_col.cast("int")
    t = truth_col.cast("int")
    base = df.groupBy(*group_cols).agg(
        F.sum(p * t).alias("tp"),
        F.sum(p * (1 - t)).alias("fp"),
        F.sum((1 - p) * t).alias("fn"),
        F.sum((1 - p) * (1 - t)).alias("tn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return base.select(
        *group_cols,
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("prec"),
        F.round(rec, 6).alias("rec"),
        F.round(2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12)), 6).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn"))
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


def detector_eval(spark, sf_dir) -> DataFrame:
    """A9 demo over events: predict 'purchase' from value > 15."""
    e = load(spark, sf_dir, "events")
    return confusion_metrics(
        e,
        pred_col=(F.col("value") > 15),
        truth_col=(F.col("event_type") == "purchase"),
        group_cols=(),
    )
