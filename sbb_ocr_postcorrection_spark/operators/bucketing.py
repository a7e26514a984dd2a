"""Bucketed tables: co-located, shuffle-free joins for repeated join keys.

At 100 TB the dominant cost of a recurring equi-join (documents ⋈ scores,
documents ⋈ dedup verdicts, ...) is re-shuffling both sides on every run.
Spark's answer is bucketing: write each table hash-partitioned AND sorted
by the join key (`bucketBy(n, key).sortBy(key)`); any later sort-merge
join between tables bucketed the same way reads matching buckets
pair-wise — NO Exchange, NO per-query Sort in the plan. This module is the
engine's materialization layer for that technique; tests assert the
shuffle-free plan mechanically (tests/test_plans.py).

Design notes for scale:
* bucket count is a layout contract — both sides must agree (Spark joins
  bucketed tables shuffle-free only when bucket counts match or divide);
* the write itself pays one shuffle (that is the point: pay once, join
  many times);
* bucketed tables are saveAsTable (metastore-backed) because pure-path
  parquet has nowhere to record the bucket spec.

Graft analog: the reference's SQLite page-db is re-read and re-joined by
every downstream stage (SURVEY.md §2.1 S7); bucketing is the Spark-native
equivalent of "the table is already laid out for the access pattern".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .relational import load


def _quoted(table: str) -> str:
    """Backtick-quote a (possibly db-qualified) identifier for SQL."""
    return ".".join("`" + p.replace("`", "``") + "`" for p in table.split("."))


def write_bucketed(
    df: DataFrame, table: str, buckets: int = 8, key: str = "doc_id"
) -> str:
    """Materialize df hash-bucketed and per-bucket sorted on `key`.

    Drops a pre-existing table AND a stale warehouse directory first: a
    location left behind by an earlier session is invisible to the fresh
    metastore, and saveAsTable refuses to reuse it
    (LOCATION_ALREADY_EXISTS). The cleanup goes through the Hadoop
    FileSystem API so it works for hdfs://s3a:// warehouses, not just
    local paths, and the name is lowercased to match what the metastore
    actually writes. The stale path deleted is ONLY the MANAGED target —
    the owning database's locationUri + table name, resolved via the
    catalog API, which is the one directory saveAsTable will write to —
    so a qualified 'db.tbl' name or a non-default current database never
    deletes the wrong path (ADVICE r2 #5), and an EXTERNAL table's backing
    data (which DROP TABLE deliberately preserves) is never touched: its
    location is somewhere else by definition. Identifiers are
    backtick-quoted throughout."""
    table = table.lower()
    spark = df.sparkSession
    db, _, name = table.rpartition(".")
    dbloc = spark.catalog.getDatabase(
        db or spark.catalog.currentDatabase()
    ).locationUri
    managed_target = f"{dbloc.rstrip('/')}/{name}"
    spark.sql(f"DROP TABLE IF EXISTS {_quoted(table)}")
    # orphan cleanup: a MANAGED table's dir is already gone after the DROP
    # (the delete is then a no-op); what this clears is a directory left by
    # a previous session whose metastore entry no longer exists
    jvm = spark._jvm
    stale = jvm.org.apache.hadoop.fs.Path(managed_target)
    fs = stale.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(stale, True)
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return table


def bucketed_documents_with_stats(
    spark, sf_dir, buckets: int = 8, prefix: str = "demo"
) -> DataFrame:
    """Demo flow: bucket the documents table and a derived per-doc stats
    table on doc_id, then join them co-located.

    The returned plan must contain no Exchange: both scans announce the
    bucket layout, the merge join zips matching buckets. The `merge` hint
    pins SortMergeJoin so a small test table does not silently take the
    broadcast path (which would hide a missing bucket layout). `prefix`
    scopes the table names — concurrent callers sharing a warehouse must
    not clobber each other's layout."""
    from ..functions.exprs import tokens_expr

    d = load(spark, sf_dir, "documents")
    # the shared tokenizer (empty-filtering), NOT a raw split: token counts
    # here must agree with token_stats / lm_unigram_score for joins across
    # operator outputs
    stats = d.select(
        "doc_id",
        F.size(tokens_expr(F.col("text"))).alias("n_tokens_ws"),
        F.length("text").alias("text_len"),
    )
    docs_t = write_bucketed(
        d.select("doc_id", "lang", "source"), f"{prefix}_docs_b", buckets
    )
    stats_t = write_bucketed(stats, f"{prefix}_stats_b", buckets)
    a = spark.table(docs_t)
    b = spark.table(stats_t)
    return a.hint("merge").join(b, "doc_id").select(
        "doc_id", "lang", "source", "n_tokens_ws", "text_len"
    )
