"""Deduplication operators for large-scale training-data pipelines.

Four families over the `documents` table:
  exact        md5-hash groupBy (full-content identity)
  jaccard      exact n-gram-shingle Jaccard via shingle self-join (the
               verifiable oracle for the approximate methods)
  minhash_lsh  MinHash signatures + banded LSH candidate generation —
               the 100-TB-scale path: candidates come from equality joins on
               band keys, never a cross join
  simhash      64-bit SimHash fingerprints, near-dup = small hamming radius

Everything JVM-side (xxhash64, transform, aggregate) — no Python in the hot
path; the shingle explode is bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .relational import load

# MinHash parameters: 16 permutations, 4 bands × 4 rows. The modulus is
# Mersenne-31 so a*h+b stays far below 2^63 (Spark 4 runs ANSI mode: long
# overflow is an error, not a wrap).
_MINHASH_PERMS = [(2 * i + 1, 40503 * i + 7) for i in range(16)]
_BANDS = 4
_ROWS_PER_BAND = 4
_MERSENNE = (1 << 31) - 1


from ..functions.exprs import tokens_expr as _tokens  # noqa: E402


def _shingles(tokens_col, n: int = 3):
    """Word n-gram shingles via JVM sequence/transform (no UDF).

    slice() instead of element_at: under Spark 4's default ANSI mode an
    out-of-bounds element_at THROWS, so a 1-2-token document would crash
    the job; slice truncates, matching the DuckDB oracle's NULL-skipping
    concat_ws semantics (short docs yield their single short shingle)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tokens_col) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
        )
    )


def exact_groups(spark, sf_dir) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest; keeper = min doc_id per
    group. Two-phase hash agg, shuffle on the digest only (never the text)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
    )


def shingle_table(spark, sf_dir) -> DataFrame:
    """(doc_id, lang, shingle) exploded distinct-shingle relation — the
    shared input of jaccard/minhash.

    Two deliberate plan choices:
    * tokens are materialized as a column BEFORE the shingle transform —
      inlining the tokenizer into the lambda makes Spark re-evaluate
      split+filter for every element_at (measured 10× slowdown);
    * the scan is repartitioned to the session's parallelism — a small
      parquet file arrives as one partition and would run the CPU-heavy
      explode single-threaded (at real scale the input has enough splits;
      this keeps the toy-scale plan shaped like the real one)."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select("doc_id", "lang", _tokens(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id", "lang", F.explode(_shingles(F.col("toks"))).alias("shingle")
    )


def jaccard_pairs(
    spark,
    sf_dir,
    threshold: float = 0.0,
    k: int = 100,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a language block.

    Plan: explode shingles → self-equi-join on (lang, shingle) → pair
    intersection counts → join per-doc sizes → J = |∩| / (|a|+|b|-|∩|).
    At scale the shingle join is the standard blocking trick: only documents
    sharing a shingle ever meet (no O(n²) cross join).

    ``max_shingle_df`` is the 100-TB knob: drop shingles whose document
    frequency exceeds the cap from the INTERSECTION join (boilerplate
    n-grams pair everything with everything — C(df,2) blows up on hot
    shingles while carrying no near-dup signal). Sizes keep counting all
    shingles, so capped Jaccard is a lower bound of exact Jaccard. Default
    None = exact (the DuckDB-oracle-checked configuration)."""
    sh = shingle_table(spark, sf_dir)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh_join = sh.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        sh_join = sh
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_join.alias("a")
    b = sh_join.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("id1") == F.col("sa.doc_id"))
        .join(sb, F.col("id2") == F.col("sb.doc_id"))
        .select(
            "id1",
            "id2",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
        .orderBy(F.desc("jaccard"), F.asc("id1"), F.asc("id2"))
        .limit(k)
    )
    return jac


def minhash_signatures(spark, sf_dir) -> DataFrame:
    """16-permutation MinHash signature per document, fully JVM-side:
    sig_j = min over shingles of (a_j * xxhash64(shingle) + b_j) mod M."""
    sh = shingle_table(spark, sf_dir).withColumn(
        "h", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
    )
    sig_cols = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"mh_{j}")
        for j, (a, b) in enumerate(_MINHASH_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*sig_cols)


def minhash_lsh_candidates(spark, sf_dir) -> DataFrame:
    """Banded LSH: band key = hash of 4 consecutive signature slots; docs
    sharing any band key become a candidate pair. Equality join on the band
    key — this is what scales: shuffle keys are (band_idx, band_hash), and a
    skewed band (boilerplate-heavy corpora) can be salted like any hot key."""
    sig = minhash_signatures(spark, sf_dir)
    # one pass: explode an array of (band, band_hash) structs rather than
    # unioning 4 selects (a union re-evaluates the signature subtree per
    # branch — the shingle explode and 16 min-aggs would run 4×)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"mh_{b * _ROWS_PER_BAND + r}")
                        for r in range(_ROWS_PER_BAND)
                    ]
                ).alias("band_hash"),
            )
            for b in range(_BANDS)
        ]
    )
    bt = sig.select("doc_id", F.explode(band_structs).alias("bh")).select(
        "doc_id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash")
    )
    # candidate pairs per bucket WITHOUT a self-join: group to the bucket's
    # sorted id list, expand pairs in-array. One shuffle on the band key
    # (saltable if a boilerplate-heavy bucket goes hot), subtree evaluated
    # once. Pair expansion is quadratic per bucket by definition of LSH —
    # production adds a bucket-size cap; at test SF buckets are tiny.
    groups = (
        bt.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"
            )
        ).alias("p")
    )
    return pairs.select(
        F.col("p.a").alias("id1"), F.col("p.b").alias("id2")
    ).distinct()


def deduplicate_corpus(
    spark, sf_dir, jaccard_threshold: float = 0.8
) -> DataFrame:
    """The composite dedup flow a training pipeline runs: exact dedup →
    MinHash-LSH candidates → exact-Jaccard verification → drop losers.

    Keep rule (deterministic): per exact-duplicate group, keep min doc_id;
    per verified near-dup pair, keep the smaller doc_id. Returns the
    documents table with `keep` ∈ {0,1} and the reason a doc was dropped.
    At 100 TB every stage is an equality-keyed shuffle (digest / band hash
    / shingle) — never a cross join."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    exact = exact_groups(spark, sf_dir)
    exact_losers = (
        d.select("doc_id", F.md5("text").alias("content_hash"))
        .join(exact, "content_hash")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id", F.lit("exact_dup").alias("drop_reason"))
    )
    # near-dups: LSH candidates verified by exact jaccard ≥ threshold
    cands = minhash_lsh_candidates(spark, sf_dir)
    verified = (
        jaccard_pairs(spark, sf_dir, threshold=0.0, k=1_000_000)
        .join(cands, ["id1", "id2"], "left_semi")
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    near_losers = verified.select(
        F.col("id2").alias("doc_id"), F.lit("near_dup").alias("drop_reason")
    ).distinct()
    losers = exact_losers.unionByName(near_losers).groupBy("doc_id").agg(
        F.min("drop_reason").alias("drop_reason")
    )
    return (
        d.select("doc_id", "lang", "source")
        .join(losers, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(F.col("drop_reason").isNull(), 1).otherwise(0).alias("keep"),
            F.coalesce("drop_reason", F.lit("kept")).alias("drop_reason"),
        )
    )


def embedding_cosine_pairs(spark, sf_dir, k: int = 100) -> DataFrame:
    """Embedding-cosine near-dup: top-k candidate pairs by exact cosine
    (id1 < id2), rounded + fully tie-broken. The exact O(n²) form is the
    correctness oracle; the scale path is LSH bucketing first
    (similarity.lsh_bucketed_topk) and exact rescoring only within buckets.
    Norms precomputed per row; pair scoring is one zip_with/aggregate."""
    from .relational import load as _load

    e = _load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    base = e.select(
        "vec_id", v.alias("v"),
    ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = base.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"), F.col("norm").alias("n1")
    )
    b = base.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"), F.col("norm").alias("n2")
    )
    pairs = a.join(b, F.col("id1") < F.col("id2"))
    cos = F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 4)
    return (
        pairs.select("id1", "id2", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id1"), F.asc("id2"))
        .limit(k)
    )


def simhash_fingerprints(spark, sf_dir) -> DataFrame:
    """64-bit SimHash per document, JVM-side and single-pass: explode
    tokens, hash each once, then ONE groupBy(doc_id) carrying 64 signed
    bit-vote sums (partial aggregation map-side, so the shuffle moves 64
    longs per doc, not the tokens). Bit i set iff its vote is positive."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = d.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = tok.groupBy("doc_id").agg(*votes)
    # assemble the signed 64-bit fingerprint: bit 63 contributes -(2^63)
    fp = F.lit(0).cast("long")
    for i in range(64):
        weight = F.lit(-(2 ** 63)).cast("long") if i == 63 else F.lit(2 ** i).cast("long")
        fp = fp + F.when(F.col(f"v{i}") > 0, weight).otherwise(F.lit(0).cast("long"))
    return voted.select("doc_id", fp.alias("simhash"))


def simhash_bucket_pairs(spark, sf_dir, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates = docs sharing the top `prefix_bits` of their
    SimHash (one rotation; production would union several rotations)."""
    fp = simhash_fingerprints(spark, sf_dir)
    keyed = fp.withColumn("bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits))
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.bucket").alias("bucket"),
        )
    )
