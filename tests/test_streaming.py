"""Streaming ingest: same kernel, windowed metrics, late-data fold-in."""

import os

import pyarrow.parquet as pq

from sbb_ocr_postcorrection_spark.datagen import generate_pages, pages_to_arrow
from sbb_ocr_postcorrection_spark.kernel import run_document
from sbb_ocr_postcorrection_spark.streaming.ingest import run_stream_once


def test_stream_matches_batch_kernel(spark, tmp_path):
    d = tmp_path / "stream_in"
    os.makedirs(d)
    pages = generate_pages(80, seed=13)
    # two arriving files
    pq.write_table(pages_to_arrow(pages[:40]), str(d / "a.parquet"))
    pq.write_table(pages_to_arrow(pages[40:]), str(d / "b.parquet"))

    result = run_stream_once(spark, str(d), query_name="t_metrics")
    rows = result.collect()
    assert sum(r["docs"] for r in rows) == 80
    # metrics equal the oracle's aggregation over the same pages
    oracle = {}
    for p in pages:
        day = p.warc_ts.date()
        r = run_document(p.html)
        k = (day, p.lang)
        docs, ci, co = oracle.get(k, (0, 0, 0))
        oracle[k] = (docs + 1, ci + r.chars_in, co + r.chars_out)
    got = {
        (r["window_start"].date(), r["lang"]): (r["docs"], r["chars_in"], r["chars_out"])
        for r in rows
    }
    assert got == oracle
