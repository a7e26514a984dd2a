"""Streaming ingest: same kernel, windowed metrics, late-data fold-in;
stateful cross-batch dedup (applyInPandasWithState)."""

import datetime
import os

import pandas as pd
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


def _text_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    # micros, not pandas-default nanos: Spark reads TIMESTAMP_MICROS
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
    pdf.to_parquet(path)


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    """Cross-batch duplicate detection: state (the per-digest seen-count)
    must survive the micro-batch boundary — a duplicate arriving in a LATER
    file is flagged, proving real applyInPandasWithState state, not
    batch-local dedup."""
    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import dedup_stream

    d = tmp_path / "in"
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # batch 1: two distinct texts + an in-batch duplicate of text A
    _text_batch(
        d / "b1.parquet",
        [
            ("u1", t0, "alpha beta gamma"),
            ("u2", t0 + datetime.timedelta(seconds=1), "delta epsilon"),
            ("u3", t0 + datetime.timedelta(seconds=2), "alpha beta gamma"),
        ],
    )

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    verdicts = dedup_stream(stream)
    seen = []

    def sink(batch_df, _epoch):
        seen.extend(batch_df.collect())

    q = verdicts.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()

    # batch 2 arrives later: a cross-batch duplicate of A and a new text
    _text_batch(
        d / "b2.parquet",
        [
            ("u4", t0 + datetime.timedelta(seconds=3), "alpha beta gamma"),
            ("u5", t0 + datetime.timedelta(seconds=4), "zeta eta theta"),
        ],
    )
    q.processAllAvailable()
    q.stop()

    by_url = {r["url"]: r for r in seen}
    assert set(by_url) == {"u1", "u2", "u3", "u4", "u5"}
    assert by_url["u1"]["is_first"] and by_url["u1"]["n_seen_before"] == 0
    assert by_url["u2"]["is_first"]
    # in-batch duplicate: ordered after u1 by (warc_ts, url)
    assert not by_url["u3"]["is_first"] and by_url["u3"]["n_seen_before"] == 1
    # CROSS-BATCH duplicate: state survived the micro-batch boundary
    assert not by_url["u4"]["is_first"] and by_url["u4"]["n_seen_before"] == 2
    assert by_url["u5"]["is_first"]
    # keepers = exactly the distinct contents
    assert sum(1 for r in seen if r["is_first"]) == 3


def test_stateful_dedup_survives_query_restart(spark, tmp_path):
    """The production resume story for streams (the batch job has
    SIGKILL-resume; this is the streaming analog): STOP the query after
    batch 1, start a NEW query from the same checkpointLocation, and the
    per-digest state store must come back — a later duplicate of a
    batch-1 document is flagged by the restarted query, and already-read
    input files are not re-emitted."""
    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import dedup_stream

    d = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    _text_batch(d / "b1.parquet", [("u1", t0, "alpha beta gamma")])

    def start(sink):
        stream = (
            spark.readStream.schema("url string, warc_ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        return (
            dedup_stream(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )

    first = []
    q1 = start(lambda df, _e: first.extend(df.collect()))
    q1.processAllAvailable()
    q1.stop()
    assert [r["url"] for r in first] == ["u1"] and first[0]["is_first"]

    # the query is GONE; new files arrive while nothing is running
    _text_batch(
        d / "b2.parquet",
        [
            ("u2", t0 + datetime.timedelta(seconds=1), "alpha beta gamma"),
            ("u3", t0 + datetime.timedelta(seconds=2), "delta epsilon"),
        ],
    )
    second = []
    q2 = start(lambda df, _e: second.extend(df.collect()))
    q2.processAllAvailable()
    q2.stop()
    by_url = {r["url"]: r for r in second}
    # u1 was consumed before the restart — not re-emitted
    assert set(by_url) == {"u2", "u3"}
    # state recovered: u2 duplicates u1 ACROSS the restart
    assert not by_url["u2"]["is_first"] and by_url["u2"]["n_seen_before"] == 1
    assert by_url["u3"]["is_first"]


def test_url_dedup_stream_across_microbatches(spark, tmp_path):
    """Canonical-URL first-seen dedup: a LATER batch's re-crawl under a
    different spelling (scheme case, www, query tracking, trailing slash)
    of an already-seen page is flagged — state keyed on the canonical
    form, not the raw string."""
    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import url_dedup_stream

    d = tmp_path / "in"
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    _text_batch(
        d / "b1.parquet",
        [
            ("http://www.a.test/x", t0, "ignored"),
            ("https://b.test/y", t0 + datetime.timedelta(seconds=1), "ignored"),
        ],
    )
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    verdicts = url_dedup_stream(stream)
    seen = []

    def sink(batch_df, _epoch):
        seen.extend(batch_df.collect())

    q = verdicts.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()
    # batch 2: same page as b1's first row, different spelling + a new page
    _text_batch(
        d / "b2.parquet",
        [
            ("HTTPS://A.test/x/?utm_source=f", t0 + datetime.timedelta(seconds=2), "ignored"),
            ("https://c.test/z", t0 + datetime.timedelta(seconds=3), "ignored"),
        ],
    )
    q.processAllAvailable()
    q.stop()

    by_url = {r["url"]: r for r in seen}
    assert len(by_url) == 4
    assert by_url["http://www.a.test/x"]["is_first"]
    assert by_url["http://www.a.test/x"]["canon_url"] == "a.test/x"
    recrawl = by_url["HTTPS://A.test/x/?utm_source=f"]
    assert recrawl["canon_url"] == "a.test/x"
    assert not recrawl["is_first"] and recrawl["n_seen_before"] == 1
    assert by_url["https://b.test/y"]["is_first"]
    assert by_url["https://c.test/z"]["is_first"]


def test_extract_then_dedup_single_streaming_query(spark, tmp_path):
    """Kernel + stateful dedup composed in ONE streaming query, with
    CRAFTED duplicates: re-crawls of page 0 (same html bytes → same
    extracted text, later warc_ts) appear both in the first file and in a
    LATER micro-batch, and must be flagged as duplicates of the original;
    distinct pages stay keepers."""
    import dataclasses

    from sbb_ocr_postcorrection_spark.datagen import generate_pages, pages_to_arrow
    from sbb_ocr_postcorrection_spark.kernel import run_document
    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import (
        extract_dedup_stream,
    )

    d = tmp_path / "in"
    os.makedirs(d)
    base = generate_pages(8, seed=21)
    later = max(p.warc_ts for p in base) + datetime.timedelta(hours=1)
    recrawl_1 = dataclasses.replace(
        base[0], url=base[0].url + "?recrawl=1", warc_ts=later
    )
    recrawl_2 = dataclasses.replace(
        base[0], url=base[0].url + "?recrawl=2",
        warc_ts=later + datetime.timedelta(hours=1),
    )
    pq.write_table(pages_to_arrow(list(base[:4]) + [recrawl_1]), str(d / "a.parquet"))
    pq.write_table(pages_to_arrow(list(base[4:]) + [recrawl_2]), str(d / "b.parquet"))
    # Spark's file stream orders files by MODIFICATION TIME, not name;
    # under suite load both writes can land in the same mtime tick and
    # b.parquet processes first, making recrawl_2 the keeper (the round-4
    # order-dependent flake). Pin strictly increasing mtimes so the
    # first-seen-wins assertions below are deterministic.
    t = os.stat(d / "a.parquet").st_mtime
    os.utime(d / "a.parquet", (t, t))
    os.utime(d / "b.parquet", (t + 10, t + 10))

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []

    def sink(batch_df, _epoch):
        seen.extend(batch_df.collect())

    q = (
        extract_dedup_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(seen) == 10
    by_url = {r["url"]: r for r in seen}
    # the original page 0 is the keeper; its same-batch re-crawl (later
    # warc_ts) and its NEXT-micro-batch re-crawl are both duplicates
    assert by_url[base[0].url]["is_first"]
    assert not by_url[recrawl_1.url]["is_first"]
    assert by_url[recrawl_1.url]["n_seen_before"] == 1
    assert not by_url[recrawl_2.url]["is_first"]  # cross-batch state
    assert by_url[recrawl_2.url]["n_seen_before"] == 2
    # sanity: the dedup really keyed on the KERNEL-extracted text
    assert (
        run_document(recrawl_1.html).extracted_text
        == run_document(base[0].html).extracted_text
    )
    # all genuinely distinct pages are keepers
    n_distinct = len({run_document(p.html).extracted_text for p in base})
    assert sum(1 for r in seen if r["is_first"]) == n_distinct


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """The streaming session_window query emits exactly the sessions the
    batch gaps-and-islands oracle computes, once the watermark passes —
    the migration equivalence a user relies on. Exactly-gap boundaries
    merge (pinned in the oracle)."""
    import pyspark.sql.functions as F

    from sbb_ocr_postcorrection_spark.streaming.sessions import (
        sessionize_batch_oracle,
        sessionize_stream,
    )

    t0 = datetime.datetime(2024, 1, 1)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)
    real = [
        (1, s(0)), (1, s(100)), (1, s(250)),
        (1, s(550)), (1, s(560)),           # 250→550 is exactly the gap: merges
        (1, s(1200)),                        # new session (gap 340 > 300)
        (2, s(0)), (2, s(1000)), (2, s(1100)),
    ]
    # flush events far in the future advance the watermark so every real
    # session closes and is emitted in append mode
    flush = [(1, s(90_000)), (2, s(90_000))]
    d = tmp_path / "sess_in"
    spark.createDataFrame(real + flush, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(str(d))

    src = spark.readStream.schema("user_id long, ts timestamp").parquet(str(d))
    q = (
        sessionize_stream(src, gap="5 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    )
    batch = spark.createDataFrame(real, "user_id long, ts timestamp")
    expected = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch_oracle(batch, gap_seconds=300).collect()
    )
    assert got == expected and len(expected) == 4
    # and on a BATCH frame the same session_window expression agrees too
    direct = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_stream(batch, gap="5 minutes").collect()
    )
    assert direct == expected


def test_extract_curate_stream_equals_batch_gate(spark, tmp_path):
    """Kernel + stateless curation gate in one streaming query: the
    stream's keep/reason verdicts equal applying the same gate to the
    batch extraction of the same pages, and the gate itself reuses the
    oracle-checked batch expression builders."""
    from sbb_ocr_postcorrection_spark.datagen import generate_pages, pages_to_arrow
    from sbb_ocr_postcorrection_spark.kernels_spark import extract_pages
    from sbb_ocr_postcorrection_spark.streaming.curate_stream import (
        curate_gate,
        extract_curate_stream,
    )

    import dataclasses

    d = tmp_path / "cur_in"
    os.makedirs(d)
    pages = generate_pages(60, seed=33)
    # crafted failures so each gate actually fires: no-stopword text (lang
    # gate) and a stopword-rich 9-token page (quality gate needs >= 10)
    no_stop = dataclasses.replace(
        pages[0], url="http://x.test/nostop",
        html=b"<html><body><p>zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo</p></body></html>",
    )
    tiny = dataclasses.replace(
        pages[1], url="http://x.test/tiny",
        html=b"<html><body><p>der die und das ist aber ein Text hier</p></body></html>",
    )
    pq.write_table(pages_to_arrow(list(pages[:30]) + [no_stop]), str(d / "a.parquet"))
    pq.write_table(pages_to_arrow(list(pages[30:]) + [tiny]), str(d / "b.parquet"))

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        extract_curate_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch = curate_gate(extract_pages(spark.read.parquet(str(d))))
    expected = {r["url"]: (r["keep"], r["reason"], r["lang_conf"]) for r in batch.collect()}
    got = {r["url"]: (r["keep"], r["reason"], r["lang_conf"]) for r in seen}
    assert got == expected and len(got) == 62
    # every gate fires somewhere: crafted pages hit lang and quality
    assert got["http://x.test/nostop"][1] == "lang_filtered"
    assert got["http://x.test/tiny"][1] == "low_quality"
    assert sum(1 for v in got.values() if v[1] == "kept") >= 50


def test_blocklist_gate_stream_matches_batch(spark, tmp_path):
    """The pre-kernel streaming policy gate: verdicts on the stream equal
    the batch blocklist operator on the same pages (the expr form and the
    dim-join form are the same law), the gate is STATELESS (append mode,
    no watermark), and drop=True filters blocked pages before the kernel
    would see them."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from sbb_ocr_postcorrection_spark.operators.urls import url_blocklist_gate
    from sbb_ocr_postcorrection_spark.streaming.ingest import (
        blocklist_gate_stream,
    )

    d = tmp_path / "in"
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://www.bad.test/x", t0),
        ("https://sub.deep.bad.test/y", t0),
        ("https://good.test/casino/slots", t0),
        ("https://good.test/fine", t0),
        ("https://notbad.test/z", t0),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
    pdf.to_parquet(d / "b1.parquet")
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    gated = blocklist_gate_stream(
        stream, blocked_hosts=["bad.test"], blocked_path_re="/casino($|[/?#])"
    )
    seen = []
    q = (
        gated.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["url"]: (r["blocked_host"], r["blocked_path"], r["url_pass"])
           for r in seen}
    batch_docs = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(rows)], "doc_id long, url string"
    )
    want_rows = url_blocklist_gate(
        spark, "/root/testdata/sf0.001",
        blocked_hosts=["bad.test"], blocked_path_re="/casino($|[/?#])",
        docs=batch_docs,
    ).collect()
    want = {
        rows[r["doc_id"]][0]: (r["blocked_host"], r["blocked_path"], r["url_pass"])
        for r in want_rows
    }
    assert got == want
    assert got["https://www.bad.test/x"] == (1, 0, 0)
    assert got["https://sub.deep.bad.test/y"] == (1, 0, 0)
    assert got["https://good.test/casino/slots"] == (0, 1, 0)
    assert got["https://good.test/fine"] == (0, 0, 1)
    assert got["https://notbad.test/z"] == (0, 0, 1)

    # drop=True: blocked pages never reach downstream operators
    dropped = blocklist_gate_stream(
        stream, blocked_hosts=["bad.test"],
        blocked_path_re="/casino($|[/?#])", drop=True,
    )
    kept = []
    q2 = (
        dropped.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["url"] for r in kept} == {
        "https://good.test/fine", "https://notbad.test/z"
    }
    assert "blocked_host" not in (kept[0].asDict() if kept else {})


def test_robots_gate_stream_matches_batch(spark, tmp_path):
    """Streaming robots gate: stream-static policy join + the SAME matcher
    as the batch gate — verdicts equal on the same pages; drop=True
    restores the input schema with blocked pages filtered."""
    import datetime
    import os

    from sbb_ocr_postcorrection_spark.sources.robots import robots_gate
    from sbb_ocr_postcorrection_spark.streaming.ingest import robots_gate_stream

    d = tmp_path / "in"
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://a.test/secret/x", t0),
        ("https://a.test:443/secret/y", t0),
        ("https://a.test/open", t0),
        ("https://norobots.test/z", t0),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
    pdf.to_parquet(d / "b1.parquet")
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /secret\n")],
        "host string, robots_txt string",
    )
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        robots_gate_stream(stream, robots)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["url"]: r["robots_allowed"] for r in seen}
    batch_docs = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(rows)], "doc_id long, url string"
    )
    want_rows = robots_gate(
        spark, "/root/testdata/sf0.001", robots=robots, docs=batch_docs
    ).collect()
    want = {rows[r["doc_id"]][0]: r["robots_allowed"] for r in want_rows}
    assert got == want == {
        "https://a.test/secret/x": 0,
        "https://a.test:443/secret/y": 0,  # port spelling still gated
        "https://a.test/open": 1,
        "https://norobots.test/z": 1,
    }
    kept = []
    q2 = (
        robots_gate_stream(stream, robots, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["url"] for r in kept} == {
        "https://a.test/open", "https://norobots.test/z"
    }
    assert set(kept[0].asDict()) == {"url", "warc_ts"}


def test_bloom_gate_stream_matches_batch(spark, tmp_path):
    """Stream-static Bloom screen (VERDICT r3 #7): per-document verdicts
    across micro-batches equal the batch bloom_gate on the same
    (history, batch) relations — bitmap build and probe gather are
    SHARED code, and the oracle-certified false-positive semantics carry
    over unchanged. The gate is stateless (append mode, no watermark);
    drop=True keeps only definite-new rows and restores the input
    schema."""
    from sbb_ocr_postcorrection_spark.operators.dedup import bloom_gate
    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import (
        bloom_gate_stream,
    )

    hist_rows = [(i, f"history doc {i}") for i in range(40)]
    batch_rows = (
        [(100 + i, f"history doc {i}") for i in range(20)]  # true re-crawls
        + [(200 + i, f"fresh doc {i}") for i in range(20)]  # definite-new
        + [(999, None)]  # null text → per-doc sentinel digest
    )
    history = spark.createDataFrame(hist_rows, "doc_id long, text string")
    batch_df = spark.createDataFrame(batch_rows, "doc_id long, text string")

    d = tmp_path / "in"
    os.makedirs(d)
    pd.DataFrame(batch_rows[:15], columns=["doc_id", "text"]).to_parquet(
        d / "b1.parquet"
    )
    pd.DataFrame(batch_rows[15:], columns=["doc_id", "text"]).to_parquet(
        d / "b2.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )

    seen = []
    q = (
        bloom_gate_stream(stream, history, m_bits=512, k_hashes=4)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: (r["content_hash"], r["bloom_hit"]) for r in seen}

    want = {
        r["doc_id"]: (r["content_hash"], r["bloom_hit"])
        for r in bloom_gate(
            spark, "/root/testdata/sf0.001", history=history, batch=batch_df,
            m_bits=512, k_hashes=4,
        ).collect()
    }
    assert got == want and len(got) == 41
    # no false negatives: every true re-crawl is flagged maybe-seen
    assert all(got[100 + i][1] == 1 for i in range(20))
    # the screen lets at least some definitely-new docs through
    new_ids = [200 + i for i in range(20)] + [999]
    assert any(got[i][1] == 0 for i in new_ids)

    kept = []
    q2 = (
        bloom_gate_stream(stream, history, m_bits=512, k_hashes=4, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["doc_id"] for r in kept} == {
        i for i, (_, hit) in got.items() if hit == 0
    }
    assert set(kept[0].asDict()) == {"doc_id", "text"}


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """Streaming contamination screen == the batch decontaminate verdicts
    on the same corpus (shared _shingles builder, distinct-overlap
    counts), stateless, with drop=True filtering contaminated pages and
    restoring the input schema."""
    from pyspark.sql import functions as F

    from sbb_ocr_postcorrection_spark.functions.exprs import tokens_expr
    from sbb_ocr_postcorrection_spark.operators.dedup import (
        _shingles,
        decontaminate,
    )
    from sbb_ocr_postcorrection_spark.streaming.curate_stream import (
        decontaminate_stream,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),   # bench
        (5, "benchmark question about spark adaptive joins"), # bench
        (1, "totally unrelated text about gardening tips"),
        (2, "the quick brown fox appears here verbatim"),      # contaminated
        (3, "question about spark adaptive joins copied in"),  # contaminated
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = docs.select(
        "doc_id",
        F.explode(_shingles(tokens_expr(F.col("text")))).alias("shingle"),
    )
    want = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(
            spark, "/root/testdata/sf0.001", bench_mod=5, sh=sh, docs=docs
        ).collect()
        if r["role"] == "train"
    }

    import os

    train = [(i, t) for i, t in rows if i % 5 != 0]
    d = tmp_path / "in"
    os.makedirs(d)
    pd.DataFrame(train, columns=["doc_id", "text"]).to_parquet(
        d / "b1.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    evals = sh.filter(F.col("doc_id") % 5 == 0).select("shingle")
    seen = []
    q = (
        decontaminate_stream(stream, evals)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in seen}
    assert got == want
    assert got[2][1] == 1 and got[3][1] == 1  # the two verbatim carriers
    assert got[1][1] == 0 and got[4][1] == 0

    kept = []
    q2 = (
        decontaminate_stream(stream, evals, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["doc_id"] for r in kept} == {1, 4}
    assert set(kept[0].asDict()) == {"doc_id", "text"}


def test_template_gate_stream_matches_batch(spark, tmp_path):
    """Streaming template screen == the same pure-expr gate applied in
    batch; flagged = pages whose tag skeleton is a known mega-template;
    drop=True restores the input schema exactly."""
    from pyspark.sql import functions as F

    from sbb_ocr_postcorrection_spark.streaming.curate_stream import (
        template_gate_stream,
    )

    mega = "<html><body><nav><a href='/x'>m</a></nav><p>{t}</p></body></html>"
    rare = "<html><body><article><p>{t}</p><p>extra</p></article></body></html>"
    rows = [
        (f"u{i}", (mega if i % 3 else rare).format(t=f"text {i}").encode())
        for i in range(9)
    ]
    batch = spark.createDataFrame(rows, "url string, html binary")
    # yesterday's rollup: the dominant skeleton is the mega template
    from sbb_ocr_postcorrection_spark.operators.webstruct import TAG_RE

    sig_col = F.md5(
        F.concat_ws(
            ",",
            F.regexp_extract_all(
                F.decode(F.col("html"), "utf-8"), F.lit(TAG_RE), F.lit(1)
            ),
        )
    )
    mega_sigs = (
        batch.select(sig_col.alias("template_sig"))
        .groupBy("template_sig")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .select("template_sig")
    )
    want = {
        r["url"]: (r["template_sig"], r["template_flagged"])
        for r in template_gate_stream(batch, mega_sigs).collect()
    }

    d = tmp_path / "tin"
    os.makedirs(d)
    pd.DataFrame(rows, columns=["url", "html"]).to_parquet(d / "b1.parquet")
    stream = (
        spark.readStream.schema("url string, html binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        template_gate_stream(stream, mega_sigs)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["url"]: (r["template_sig"], r["template_flagged"]) for r in seen}
    assert got == want
    # 6 mega pages flagged, 3 rare pages pass
    assert sum(f for _, f in got.values()) == 6

    kept = []
    q2 = (
        template_gate_stream(stream, mega_sigs, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["url"] for r in kept} == {u for u, (_, f) in want.items() if not f}
    assert kept and set(kept[0].asDict()) == {"url", "html"}


def test_volume_anomaly_stream_matches_batch(spark, tmp_path):
    """Streaming volume screen == the same windowed count + integer spike
    rule computed in batch over identical pages; unknown windows never
    flag; a planted flood window flags."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from sbb_ocr_postcorrection_spark.streaming.ingest import (
        VOLUME_SPIKE_FACTOR,
        volume_anomaly_stream,
    )

    base_day = _dt.datetime(2024, 3, 1)
    rows = []
    # day 0: 4 docs (baseline 3 -> not > 2*3), day 1: 9 docs (baseline 2
    # -> 9 > 4 flags), day 2: 5 docs with NO baseline -> never flags
    for day, n in ((0, 4), (1, 9), (2, 5)):
        for i in range(n):
            ts = base_day + _dt.timedelta(days=day, minutes=i)
            rows.append((f"u{day}-{i}", ts, f"t{i}"))
    d = tmp_path / "vin"
    os.makedirs(d)
    _text_batch(d / "b1.parquet", rows[:8])
    _text_batch(d / "b2.parquet", rows[8:])
    baseline = spark.createDataFrame(
        [(base_day, 3), (base_day + _dt.timedelta(days=1), 2)],
        "window_start timestamp, expected_docs long",
    )
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        volume_anomaly_stream(stream, baseline)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("vol_anom")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["window_start"]: (r["n_docs"], r["expected_docs"], r["volume_anomaly"])
        for r in spark.sql("SELECT * FROM vol_anom").collect()
    }
    batch = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    counts = {
        r["ws"]: r["n"]
        for r in batch.groupBy(
            F.window("warc_ts", "1 day").start.alias("ws")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expected = {base_day: 3, base_day + _dt.timedelta(days=1): 2}
    want = {
        ws: (
            n,
            expected.get(ws),
            int(ws in expected and n > VOLUME_SPIKE_FACTOR * expected[ws]),
        )
        for ws, n in counts.items()
    }
    assert got == want
    flags = [v[2] for v in got.values()]
    assert sum(flags) == 1, "exactly the planted flood window flags"


def test_politeness_limit_stream_matches_batch(spark, tmp_path):
    """Per-host rate limiting == the batch row_number-within-window rule
    on the same (time-ordered) pages; budgets carry ACROSS micro-batches
    within a window and reset at the window boundary."""
    import datetime as _dt

    from pyspark.sql import Window as W, functions as F

    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import (
        politeness_limit_stream,
    )

    t0 = _dt.datetime(2024, 4, 1, 12, 0, 0)
    rows = []
    # hostA: 5 urls inside one minute (cap 2 -> 3 deferred), then 2 more
    # in the NEXT minute (budget resets); hostB: 2 urls (all allowed)
    for i in range(5):
        rows.append((f"https://a.test/p{i}", t0 + _dt.timedelta(seconds=10 + i), f"t{i}"))
    for i in range(2):
        rows.append((f"https://a.test/q{i}", t0 + _dt.timedelta(seconds=70 + i), f"u{i}"))
    for i in range(2):
        rows.append((f"https://b.test/r{i}", t0 + _dt.timedelta(seconds=20 + i), f"v{i}"))
    d = tmp_path / "pin"
    os.makedirs(d)
    # split MID-WINDOW so the budget must persist across batches
    _text_batch(d / "a.parquet", rows[:3])
    _text_batch(d / "b.parquet", rows[3:])
    t = _dt.datetime.now().timestamp()
    os.utime(d / "a.parquet", (t, t))
    os.utime(d / "b.parquet", (t + 10, t + 10))

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        politeness_limit_stream(stream, cap=2, window_sec=60)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["url"]: (r["host"], r["window_epoch"], r["n_allowed_before"], r["allowed"])
        for r in seen
    }
    batch = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    host = F.regexp_extract(F.col("url"), r"^(?:[a-z]+://)?(?:www\.)?([^/]+)", 1)
    epoch = (F.unix_timestamp("warc_ts") / 60).cast("long")
    w = W.partitionBy(host, epoch).orderBy("warc_ts", "url")
    want = {
        r["url"]: (r["h"], r["e"], min(r["rn"] - 1, 2), r["rn"] <= 2)
        for r in batch.select(
            "url",
            host.alias("h"),
            epoch.alias("e"),
            F.row_number().over(w).alias("rn"),
        ).collect()
    }
    # n_allowed_before saturates at cap for deferred rows in both forms
    assert got == want
    assert sum(1 for v in got.values() if not v[3]) == 3
    assert all(v[3] for u, v in got.items() if u.startswith("https://b"))


def test_politeness_limit_stream_mega_host(spark, tmp_path):
    """Skew stress: one host floods 2 000 urls into a single window
    across two micro-batches (cap 5) — exactly 5 allowed corpus-wide for
    that host, the earliest 5 by (warc_ts, url), and the flood never
    starves the small host's budget."""
    import datetime as _dt

    from sbb_ocr_postcorrection_spark.streaming.dedup_stream import (
        politeness_limit_stream,
    )

    t0 = _dt.datetime(2024, 4, 2, 9, 0, 0)
    flood = [
        (f"https://mega.test/p{i:05d}", t0 + _dt.timedelta(milliseconds=i), "x")
        for i in range(2000)
    ]
    small = [
        (f"https://tiny.test/s{i}", t0 + _dt.timedelta(seconds=i), "y")
        for i in range(3)
    ]
    rows = flood + small
    d = tmp_path / "mega"
    os.makedirs(d)
    _text_batch(d / "a.parquet", rows[:1000])
    _text_batch(d / "b.parquet", rows[1000:])
    t = _dt.datetime.now().timestamp()
    os.utime(d / "a.parquet", (t, t))
    os.utime(d / "b.parquet", (t + 10, t + 10))
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        politeness_limit_stream(stream, cap=5, window_sec=60)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    mega = [r for r in seen if r["host"] == "mega.test"]
    tiny = [r for r in seen if r["host"] == "tiny.test"]
    assert len(mega) == 2000 and len(tiny) == 3
    allowed = sorted(r["url"] for r in mega if r["allowed"])
    assert allowed == [f"https://mega.test/p{i:05d}" for i in range(5)]
    assert all(r["allowed"] for r in tiny)

def _ts_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
    pdf.to_parquet(path)


def test_trailing_anomaly_stream_learns_baseline(spark, tmp_path):
    """Self-adaptive per-host anomaly == a pure-Python replay of the
    window-closure rule; the baseline ring carries ACROSS micro-batches
    and a burst window flags only once its host has full history."""
    import datetime as _dt

    from sbb_ocr_postcorrection_spark.streaming.ingest import (
        trailing_anomaly_stream,
    )

    t0 = _dt.datetime(2024, 4, 1, 12, 0, 0)
    rows = []
    # hostA: 4 quiet minutes (2 docs each), a 9-doc burst in minute 4,
    # then 1 doc in minute 5 (closes the burst). hostB: young feed —
    # 3 minutes only, never enough history to flag.
    for m in range(4):
        for i in range(2):
            rows.append(
                (f"https://a.test/{m}-{i}", t0 + _dt.timedelta(minutes=m, seconds=i))
            )
    for i in range(9):
        rows.append(
            (f"https://a.test/burst{i}", t0 + _dt.timedelta(minutes=4, seconds=i))
        )
    rows.append(("https://a.test/after", t0 + _dt.timedelta(minutes=5)))
    for m in range(3):
        rows.append(
            (f"https://b.test/{m}", t0 + _dt.timedelta(minutes=m, seconds=30))
        )
    rows.sort(key=lambda r: r[1])

    d = tmp_path / "ta"
    os.makedirs(d)
    # split MID-STREAM so ring state must persist across micro-batches
    _ts_batch(d / "a.parquet", rows[: len(rows) // 2])
    _ts_batch(d / "b.parquet", rows[len(rows) // 2 :])
    t = _dt.datetime.now().timestamp()
    os.utime(d / "a.parquet", (t, t))
    os.utime(d / "b.parquet", (t + 10, t + 10))

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    q = (
        trailing_anomaly_stream(stream, window_sec=60, trail=4, factor=2)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["host"], r["epoch"]): (
            r["n_docs"], r["trail_sum"], r["n_trail"], r["anomaly"]
        )
        for r in seen
    }

    # pure-Python replay of the closure semantics over the SAME rows
    from collections import defaultdict

    per_host = defaultdict(list)
    for url, ts in rows:
        h = url.split("//")[1].split("/")[0]
        per_host[h].append((ts, url))
    want = {}
    for h, evs in per_host.items():
        evs.sort()
        ring, cur_e, cur_n = [], None, 0
        for ts, _u in evs:
            e = int(ts.timestamp()) // 60
            if cur_e is None:
                cur_e, cur_n = e, 0
            elif e != cur_e:
                want[(h, cur_e)] = (
                    cur_n,
                    sum(ring),
                    len(ring),
                    int(len(ring) == 4 and cur_n * 4 > 2 * sum(ring)),
                )
                ring = (ring + [cur_n])[-4:]
                cur_e, cur_n = e, 0
            cur_n += 1
    assert got == want
    # the burst window flagged; hostB (young feed) never did
    a_flags = [k for k, v in got.items() if v[3] == 1 and k[0] == "a.test"]
    assert len(a_flags) == 1 and a_flags[0][1] == int(
        (t0 + _dt.timedelta(minutes=4)).timestamp()
    ) // 60
    assert not any(v[3] for k, v in got.items() if k[0] == "b.test")


def test_dsir_gate_stream_matches_batch_and_batch_score(spark, tmp_path):
    """Streaming DSIR screen: the stateless expression fold must equal
    the batch dsir_score plan value-for-value, stream == batch, and
    drop=True restores the input schema."""
    from sbb_ocr_postcorrection_spark.operators import selection as sel
    from sbb_ocr_postcorrection_spark.streaming.curate_stream import (
        dsir_gate_stream,
    )

    rows = []
    va = "alpha beta gamma delta epsilon zeta eta theta"
    vb = "qqq www eee rrr ttt yyy uuu iii"
    for i in range(12):
        rows.append((i, f"{va} alpha beta {i % 3}", "en", "srcA"))
    for i in range(12, 20):
        rows.append((i, f"{va} gamma delta {i % 3}", "de", "srcA"))
    for i in range(20, 28):
        rows.append((i, f"{vb} qqq www {i % 3}", "zh", "srcB"))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    weights = sel.dsir_weights(spark, "/root/testdata/sf0.001", docs=d)

    # the expression fold == the batch shuffle plan, value for value
    want_score = {
        r["doc_id"]: (r["n_grams"], r["score"])
        for r in sel.dsir_score(
            spark, "/root/testdata/sf0.001", docs=d
        ).collect()
    }
    batch_gate = {
        r["doc_id"]: (r["dsir_n_grams"], r["dsir_score"])
        for r in dsir_gate_stream(d, weights).collect()
    }
    assert batch_gate == want_score

    want = {
        r["doc_id"]: (r["dsir_score"], r["dsir_keep"])
        for r in dsir_gate_stream(d, weights, threshold=-5000).collect()
    }
    din = tmp_path / "dsir_in"
    os.makedirs(din)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf.iloc[:10].to_parquet(din / "b1.parquet")
    pdf.iloc[10:].to_parquet(din / "b2.parquet")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(din))
    )
    seen = []
    q = (
        dsir_gate_stream(stream, weights, threshold=-5000)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: (r["dsir_score"], r["dsir_keep"]) for r in seen}
    assert got == want
    # alien-vocab docs score far below the cut and drop; target and
    # target-LIKE raw docs clear it (en: +11k, de-like: ~-1.7k, alien:
    # ~-32k fixed-point log2 units)
    assert all(got[i][1] == 1 for i in range(20))
    assert all(got[i][1] == 0 for i in range(20, 28))

    kept = []
    q2 = (
        dsir_gate_stream(stream, weights, threshold=-5000, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["doc_id"] for r in kept} == {
        i for i, (_, k) in got.items() if k
    }
    assert kept and set(kept[0].asDict()) == {"doc_id", "text", "lang", "source"}


def test_hll_cardinality_stream_matches_batch(spark, tmp_path):
    """Streaming HLL == batch HLL: the cross-batch register state must be
    bit-identical to the one-pass batch aggregation (max-merge is
    order-independent), certified on the exact integer digest s_num and
    n_zero; the float estimate agrees to rounding."""
    from sbb_ocr_postcorrection_spark.operators.index import hll_distinct_tokens
    from sbb_ocr_postcorrection_spark.streaming.ingest import (
        hll_cardinality_stream,
    )

    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    din = tmp_path / "hll_in"
    os.makedirs(din)
    pdf.iloc[:20].to_parquet(din / "b1.parquet")
    pdf.iloc[20:].to_parquet(din / "b2.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(din))
    )
    seen = []
    q = (
        hll_cardinality_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for r in seen:  # update mode: later emissions supersede earlier ones
        final[r["source"]] = r
    batch = {
        r["source"]: r
        for r in hll_distinct_tokens(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(final) == set(batch)
    for src, b in batch.items():
        s = final[src]
        assert s["s_num"] == b["s_num"], src
        assert s["n_zero"] == b["n_zero"], src
        assert abs(s["hll_estimate"] - b["hll_estimate"]) <= 1e-3, src
    # token counter equals the plain token count
    n_tok = sum(
        len([w for w in (t or "").lower().split(" ") if w]) for t in pdf["text"]
    )
    assert sum(r["n_tokens_seen"] for r in final.values()) == n_tok


def test_entropy_gate_stream_matches_batch_entropy(spark, tmp_path):
    """The stream gate's row-local sorted-run fold must reproduce the
    batch token_entropy aggregation value-for-value, stream == batch,
    template spam fails, normal docs pass, empty docs fail."""
    from sbb_ocr_postcorrection_spark.operators.textstats import token_entropy
    from sbb_ocr_postcorrection_spark.streaming.curate_stream import (
        entropy_gate_stream,
    )

    rows = [(0, "spam " * 40, "en", "s"), (1, "", "en", "s")]
    rows += [
        (i, f"alpha beta gamma delta w{i} x{i} y{i} z{i}", "en", "s")
        for i in range(2, 14)
    ]
    schema = "doc_id long, text string, lang string, source string"
    d = spark.createDataFrame(rows, schema)

    want_batch = {
        r["doc_id"]: (r["n_tokens"], r["h_num"])
        for r in token_entropy(spark, "/root/testdata/sf0.001", docs=d).collect()
    }
    gate_batch = {
        r["doc_id"]: (r["ent_n_tokens"], r["ent_h_num"], r["entropy_keep"])
        for r in entropy_gate_stream(d).collect()
    }
    assert {k: v[:2] for k, v in gate_batch.items()} == want_batch
    assert gate_batch[0][2] == 0 and gate_batch[1][2] == 0
    assert all(gate_batch[i][2] == 1 for i in range(2, 14))

    din = tmp_path / "ent_in"
    os.makedirs(din)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf.iloc[:7].to_parquet(din / "b1.parquet")
    pdf.iloc[7:].to_parquet(din / "b2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(din))
    )
    seen = []
    q = (
        entropy_gate_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: seen.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: (r["ent_n_tokens"], r["ent_h_num"], r["entropy_keep"])
        for r in seen
    }
    assert got == gate_batch

    kept = []
    q2 = (
        entropy_gate_stream(stream, drop=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: kept.extend(b.collect()))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert {r["doc_id"] for r in kept} == set(range(2, 14))
    assert kept and set(kept[0].asDict()) == {"doc_id", "text", "lang", "source"}
