#!/usr/bin/env python
"""spark-submit entry point for the extraction job.

Cluster use (north_rule contract):
    python scripts/make_pyfiles.py dist/pkg.zip
    spark-submit --py-files dist/pkg.zip scripts/run_job.py \
        --input /data/pages --output /data/out --lang de

Local sandbox use (this container):
    python scripts/run_job.py --input <pages.parquet> --output <dir> \
        [--cores 32] [--lang de] [--no-resume] [--generate N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--lang", default=None, help="language filter (e.g. de)")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-resume", action="store_true", help="reprocess everything")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages as input first (demo mode)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from sbb_ocr_postcorrection_spark.pipeline import (
        build_session,
        job_metrics,
        run_extraction_job,
    )

    input_path = args.input
    if args.generate:
        from sbb_ocr_postcorrection_spark.datagen import write_pages_parquet

        os.makedirs(args.output, exist_ok=True)
        input_path = os.path.join(args.output, "pages_input.parquet")
        write_pages_parquet(input_path, args.generate, seed=args.seed)
    if not input_path:
        ap.error("--input or --generate required")

    spark = build_session(app="sbb-extract-job", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    pages = spark.read.parquet(input_path)
    summary = run_extraction_job(
        spark, pages, args.output, lang_filter=args.lang, resume=not args.no_resume
    )
    metrics = job_metrics(spark, args.output).collect()[0].asDict()
    print(json.dumps({"summary": summary, "metrics": metrics}, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
