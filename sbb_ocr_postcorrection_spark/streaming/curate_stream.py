"""Streaming curation gate: extraction kernel → per-document content
filters, inline on the stream.

The stateless half of the curation pipeline (operators/curation.py) lifted
to Structured Streaming: language-ID and quality heuristics are pure
column expressions over the extracted text, so they run inside the same
micro-batch as the kernel with NO state, NO watermark, NO extra shuffle —
each arriving page leaves the query already labeled keep/drop. The
stateful stages (cross-batch dedup) compose downstream via
dedup_stream, exactly as in extract_dedup_stream; corpus-level stages
(LSH near-dup, decontamination, LM rarity — they need global relations)
stay batch jobs over the landed output.

The gate expressions are THE SAME builders the oracle-checked batch
operators use (functions/exprs.lang_cols / quality_cols), so the
stream's verdicts are pinned to the batch semantics by construction; the
test additionally asserts stream == batch on the same pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.exprs import lang_cols, quality_cols
from ..operators.textstats import DE_STOPS, EN_STOPS


def curate_gate(extracted: DataFrame, conf_threshold: float = 0.05) -> DataFrame:
    """(url, warc_ts, lang, extracted_text, ...) → + lang/quality columns
    and a keep/reason verdict. Works identically on a stream or a batch
    frame (pure column expressions), which the test exploits.

    The text is tokenized ONCE into an intermediate column shared by both
    builders — higher-order-function exprs are excluded from codegen
    subexpression elimination, so inlining the tokenizer into each derived
    column would re-split the document several times per row; Catalyst's
    CollapseProject keeps the non-cheap shared column materialized."""
    from ..functions.exprs import tokens_expr

    with_toks = extracted.withColumn("_toks", tokens_expr(F.col("extracted_text")))
    toks = F.col("_toks")
    lc = lang_cols(
        F.col("extracted_text"), DE_STOPS, EN_STOPS, conf_threshold, toks=toks
    )
    qc = quality_cols(F.col("extracted_text"), toks=toks)
    reason = (
        F.when(lc["lang_pass"] == 0, "lang_filtered")
        .when(qc["quality_keep"] == 0, "low_quality")
        .otherwise("kept")
    )
    return with_toks.select(
        "url",
        "warc_ts",
        "lang",
        "extracted_text",
        lc["lang_guess"].alias("lang_guess"),
        lc["lang_conf"].alias("lang_conf"),
        qc["n_tokens"].alias("n_tokens"),
        qc["alpha_ratio"].alias("alpha_ratio"),
        (reason == "kept").cast("int").alias("keep"),
        reason.alias("reason"),
    )


def extract_curate_stream(
    pages_stream: DataFrame, conf_threshold: float = 0.05
) -> DataFrame:
    """Kernel + curation gate in ONE streaming query."""
    from .ingest import extract_stream

    return curate_gate(extract_stream(pages_stream), conf_threshold)


def decontaminate_stream(
    stream: DataFrame, eval_shingles: DataFrame,
    min_overlap: int = 1, text_col: str = "text", drop: bool = False,
) -> DataFrame:
    """Benchmark-contamination screen on the stream: the streaming form of
    operators/dedup.decontaminate. A continuous crawl must not let pages
    overlapping the held-out eval suites into the training corpus — and
    the check belongs at ingest, before a contaminated page costs
    downstream curation.

    Stateless stream-static shape: the eval shingle set is collected ONCE
    at query definition (dimension-sized by construction — eval suites
    are fixed while the corpus is 100 TB; the bloom-bitmap collect
    rationale) into a literal array, and the verdict is pure JVM exprs —
    the SAME `_shingles` builder the batch operator and the LSH family
    use (tokenizer/shingle drift impossible), then
    size(array_intersect(...)) against the literal. No state store, no
    watermark, no Python, nothing crosses Arrow. n_overlap counts
    DISTINCT shared shingles, matching the batch semantics exactly
    (both sides are distinct sets)."""
    from ..functions.exprs import tokens_expr
    from ..operators.dedup import _shingles

    clash = {"n_overlap", "contaminated"} & set(stream.columns)
    if clash:
        # withColumn would silently overwrite a caller's column of the
        # same name (and drop=True would keep the clobbered value under
        # the claim of a restored schema) — refuse loudly instead
        raise ValueError(
            f"decontaminate_stream reserves column(s) {sorted(clash)}; "
            "rename them on the input stream first"
        )
    evals = sorted(
        r["shingle"]
        for r in eval_shingles.select("shingle").distinct().collect()
    )
    # the cast pins the literal's type even when evals is EMPTY — a
    # legitimately empty eval set otherwise builds array<void> and
    # array_intersect fails analysis instead of marking every page clean
    overlap = F.size(
        F.array_intersect(
            _shingles(tokens_expr(F.col(text_col))),
            F.lit(evals).cast("array<string>"),
        )
    )
    out = stream.withColumn("n_overlap", overlap).withColumn(
        "contaminated", (F.col("n_overlap") >= min_overlap).cast("int")
    )
    if drop:
        # both names are reserved (guard above), so dropping them always
        # restores exactly the caller's schema
        return out.filter(F.col("contaminated") == 0).drop(
            "n_overlap", "contaminated"
        )
    return out


def template_gate_stream(
    stream: DataFrame,
    mega_sigs: DataFrame,
    drop: bool = False,
    html_col: str = "html",
) -> DataFrame:
    """Boilerplate-farm screen on the stream: tag-skeleton fingerprint of
    each arriving page (operators/webstruct.TAG_RE — the SAME regex the
    batch template_fingerprint hashes with, so drift is impossible)
    checked against the known mega-template signature set. A continuous
    crawl learns its spam/CMS templates from yesterday's batch rollup and
    demotes matching pages at ingest, before they cost extraction.

    Stateless stream-static shape (the decontaminate_stream rationale):
    the sig set is collected ONCE at query definition — mega-templates
    are a curated dimension, thousands at most while the stream is
    unbounded — into a literal array; the fingerprint is pure JVM exprs
    (regexp_extract_all → concat_ws → md5), no state store, no watermark,
    no Python. Works identically on a batch frame, which the test
    exploits for stream == batch."""
    from ..operators.webstruct import TAG_RE

    clash = {"template_sig", "template_flagged"} & set(stream.columns)
    if clash:
        raise ValueError(
            f"template_gate_stream reserves column(s) {sorted(clash)}; "
            "rename them on the input stream first"
        )
    sigs = sorted(
        r["template_sig"]
        for r in mega_sigs.select("template_sig").distinct().collect()
    )
    html_str = F.decode(F.col(html_col), "utf-8")
    sig = F.md5(
        F.concat_ws(
            ",", F.regexp_extract_all(html_str, F.lit(TAG_RE), F.lit(1))
        )
    )
    out = stream.withColumn("template_sig", sig).withColumn(
        "template_flagged",
        F.array_contains(
            F.lit(sigs).cast("array<string>"), F.col("template_sig")
        ).cast("int"),
    )
    if drop:
        return out.filter(F.col("template_flagged") == 0).drop(
            "template_sig", "template_flagged"
        )
    return out


def dsir_gate_stream(
    stream: DataFrame,
    weights: DataFrame,
    threshold: int = 0,
    drop: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Target-domain importance screen on the stream: score each arriving
    document under a DSIR importance model trained by yesterday's batch
    (operators/selection.dsir_weights) and gate on the fixed-point
    log-ratio score — the continuous-ingest shape of importance
    resampling (score at ingest, resample offline).

    Stateless stream-static shape (the template_gate_stream rationale):
    the weight model is a FIXED 1024-bucket dimension, collected once at
    query definition into an array literal indexed by bucket; scoring is
    pure JVM higher-order exprs (split → bigrams → md5 bucket →
    aggregate-sum) — no state store, no watermark, no Python, and no
    stream-side aggregation (a per-doc groupBy would force watermarks;
    the fold over the bigram ARRAY computes the same sum row-locally).
    Works identically on a batch frame, which the test exploits both for
    stream == batch and for equality with the batch dsir_score plan."""
    from ..functions.exprs import tokens_expr
    from ..operators.selection import DSIR_BUCKETS

    clash = {"dsir_n_grams", "dsir_score", "dsir_keep"} & set(stream.columns)
    if clash:
        raise ValueError(
            f"dsir_gate_stream reserves column(s) {sorted(clash)}; "
            "rename them on the input stream first"
        )
    wrow = {
        r["bucket"]: r["w"]
        for r in weights.select("bucket", "w").collect()
    }
    w_arr = F.lit([int(wrow.get(b, 0)) for b in range(DSIR_BUCKETS)]).cast(
        "array<long>"
    )
    toks = tokens_expr(F.col(text_col))
    bgs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _w_of(x):
        bucket = (
            F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
            % DSIR_BUCKETS
        )
        return F.element_at(w_arr, (bucket + 1).cast("int"))

    out = (
        stream.withColumn("_bgs", bgs)
        .withColumn("dsir_n_grams", F.size("_bgs").cast("long"))
        .withColumn(
            "dsir_score",
            F.aggregate(
                F.col("_bgs"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + _w_of(x),
            ),
        )
        .withColumn(
            "dsir_keep", (F.col("dsir_score") >= threshold).cast("int")
        )
        .drop("_bgs")
    )
    if drop:
        return out.filter(F.col("dsir_keep") == 1).drop(
            "dsir_n_grams", "dsir_score", "dsir_keep"
        )
    return out


ENTROPY_MIN_MILLIBITS = 500  # drop docs under 0.5 bits/token (template spam)


def _ilog2_frag(v: str) -> str:
    """Inline Mitchell fixed-point log2 of the positive int64 SQL
    fragment `v` (S = 1024; mirrors operators/selection.with_ilog2)."""
    f = f"(length(bin({v})) - 1)"
    p = f"shiftleft(cast(1 as bigint), cast({f} as int))"
    return f"({f} * 1024 + (({v} - {p}) * 1024) div {p})"


def entropy_gate_stream(
    stream: DataFrame, drop: bool = False, text_col: str = "text"
) -> DataFrame:
    """Shannon-entropy quality screen on the stream: the online form of
    operators/textstats.token_entropy, computed WITHOUT any stream-side
    aggregation — the per-doc token histogram folds row-locally over the
    SORTED token array (equal tokens are adjacent, so one pass counts
    runs), and each run contributes c·ilog2(c) to the exact fixed-point
    entropy numerator. Pure JVM higher-order exprs: no state store, no
    watermark, no Python (the dsir_gate_stream discipline). Docs under
    ENTROPY_MIN_MILLIBITS/1000 bits per token (template/repetition spam)
    fail the gate; empty docs score 0 and fail (emptiness is judged
    upstream — here zero entropy IS the spam signal)."""
    from ..functions.exprs import tokens_expr

    clash = {"ent_n_tokens", "ent_h_num", "entropy_keep"} & set(stream.columns)
    if clash:
        raise ValueError(
            f"entropy_gate_stream reserves column(s) {sorted(clash)}; "
            "rename them on the input stream first"
        )
    toks = tokens_expr(F.col(text_col))
    fold = (
        "aggregate("
        "  array_sort(_etoks),"
        "  struct(cast('' as string) as prev, cast(0 as bigint) as run,"
        "         cast(0 as bigint) as acc),"
        "  (s, x) -> IF(x = s.prev,"
        "    struct(s.prev as prev, s.run + cast(1 as bigint) as run,"
        "           s.acc as acc),"
        "    struct(x as prev, cast(1 as bigint) as run,"
        f"          s.acc + IF(s.run > 0, s.run * {_ilog2_frag('s.run')},"
        "                      cast(0 as bigint)) as acc)),"
        f" s -> s.acc + IF(s.run > 0, s.run * {_ilog2_frag('s.run')},"
        "                  cast(0 as bigint)))"
    )
    out = (
        stream.withColumn("_etoks", toks)
        .withColumn("ent_n_tokens", F.size("_etoks").cast("long"))
        .withColumn("_sum_clc", F.expr(fold))
        .withColumn(
            "ent_h_num",
            F.when(F.col("ent_n_tokens") > 0,
                   F.col("ent_n_tokens")
                   * F.expr(_ilog2_frag("ent_n_tokens"))
                   - F.col("_sum_clc"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "entropy_keep",
            (
                (F.col("ent_n_tokens") > 0)
                & (
                    F.col("ent_h_num") * 1000
                    >= F.col("ent_n_tokens") * 1024 * ENTROPY_MIN_MILLIBITS
                )
            ).cast("int"),
        )
        .drop("_etoks", "_sum_clc")
    )
    if drop:
        return out.filter(F.col("entropy_keep") == 1).drop(
            "ent_n_tokens", "ent_h_num", "entropy_keep"
        )
    return out
