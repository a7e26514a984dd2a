"""Line splitting + order-preserving reassembly — the F10/J7 pair.

The reference splits over-long lines at separator boundaries
(cli_preproc.py:29-68, applied :104-131), records boundaries in
line_ids.json, and re-joins after correction (cli_correct.py:34-59). Here:

* split: pandas-batched UDF returning array<string> (greedy grouping is
  inherently sequential per line) → posexplode carries (parent, pos) — the
  UDTF surface of SURVEY.md §2.9;
* reassemble: pure relational — groupBy(parent) over sort_array(struct(pos,
  part)), concat_ws. The round trip is exact by construction, which the
  query result itself certifies (roundtrip_ok per doc).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..textkit import split_with_max_len
from .relational import load

MAX_LEN = 40


def _split_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pdf.copy()
        out["parts"] = [
            split_with_max_len(" ".join(str(t).split()), max_len=MAX_LEN)
            if t is not None
            else []
            for t in pdf["text"]
        ]
        yield out[["doc_id", "text", "parts"]]


def split_lines(spark, sf_dir) -> DataFrame:
    """documents.text → one row per ≤40-char part with (parent, pos)."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    parts = d.select("doc_id", "text").mapInPandas(
        _split_kernel, schema="doc_id long, text string, parts array<string>"
    )
    return parts.select(
        F.col("doc_id").alias("parent_id"),
        "text",
        F.posexplode("parts").alias("pos", "part"),
    )


def split_roundtrip(spark, sf_dir) -> DataFrame:
    """Split → reassemble → verify: per doc, n_parts, max part length and
    whether the reassembly equals the (whitespace-normalized) original."""
    exploded = split_lines(spark, sf_dir)
    reassembled = exploded.groupBy("parent_id").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.max(F.length("part")).alias("max_part_len"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "part"))),
                lambda s: s["part"],
            ),
        ).alias("rejoined"),
        F.first("text").alias("text"),
    )
    return reassembled.select(
        "parent_id",
        "n_parts",
        "max_part_len",
        (
            F.col("rejoined")
            == F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
        ).cast("int").alias("roundtrip_ok"),
    )
