#!/usr/bin/env python
"""Round-7 optimization instrumentation (guide §1). NOT the driver bench.

Modes:
  --plans [names...]   write .explain("formatted") for each query to
                       plans/r07/<name>_<tag>.txt  (tag via --tag, default
                       "before")
  --time  [names...]   per-query isolated timing: N repetitions of the
                       noop sink (computation only, guide §1.4) plus the
                       collect() the frozen bench.py uses, printed as JSON.

Queries run with the same session config as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle=cores, arrow_batch=1024) on $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "rollup_stats", "topk_vocab", "filter_project", "equijoin_agg",
    "reassembly", "sliding_window", "gaps_islands", "stratified_split",
    "dedup_exact", "dedup_jaccard_pairs", "dedup_minhash_lsh",
    "dedup_corpus_keep", "url_dedup", "line_dedup", "passage_dedup",
    "dedup_incremental", "dedup_bloom", "host_reputation_gate", "seq_pack",
    "length_percentiles", "ann_brute_force", "ann_ivf_pinned",
    "quality_score", "fingerprints", "winnow_matches", "passage_retrieval",
    "extract_pipeline",
]


def build():
    from sbb_ocr_postcorrection_spark.pipeline import build_session

    spark = build_session(
        app="bench_extra", cores=CPUS, shuffle_partitions=max(CPUS, 8),
        arrow_batch=1024,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    import __spark_entry__ as entrymod

    names = [a for a in sys.argv[2:] if not a.startswith("--")] or HEADLINE
    tag = "before"
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    spark = build()
    qs = entrymod.queries()

    if sys.argv[1] == "--plans":
        out_dir = os.path.join(REPO, "plans", "r07")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    elif sys.argv[1] == "--time":
        results: dict[str, dict] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"r07 isolate: {name}")
            noops, collects = [], []
            for _ in range(reps):
                df = qs[name](spark, SF_DIR)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                noops.append(round(time.time() - t0, 3))
                df2 = qs[name](spark, SF_DIR)
                t0 = time.time()
                n = len(df2.collect())
                collects.append(round(time.time() - t0, 3))
            results[name] = {
                "noop": noops, "noop_min": min(noops),
                "collect": collects, "collect_min": min(collects),
                "rows": n,
            }
            print(json.dumps({name: results[name]}), flush=True)
        print("FINAL " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
