#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count +
sorted-column value multiset. Exit nonzero on any mismatch.

Usage: python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

--json writes the machine-readable per-query result artifact the repo
commits every round (CORRECTNESS_local_r{N}.json) so the driver's ~50-query
sampling can never hide a regression in the unsampled remainder
(VERDICT r3 next-step #2).
"""

from __future__ import annotations

import json
import math
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sbb_ocr_postcorrection_spark.pipeline import build_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = build_session(app="check-oracle", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        def record(status: str, n_rows: int, detail: str = "") -> None:
            results[name] = {
                "status": status,
                "rows": n_rows,
                "seconds": round(time.time() - t0, 1),
            }
            if detail:
                results[name]["detail"] = detail

        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record("fail", 0, f"spark error: {e}")
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(rows)} rows, {time.time()-t0:.1f}s)")
            if not rows:
                failures.append(name)
                record("fail", 0, "zero rows in rows-only query")
                print(f"FAIL  {name}: zero rows in rows-only query")
            else:
                record("rows_only", len(rows))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record("fail", len(rows), f"duckdb error: {e}")
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            record("fail", len(rows), f"columns {sorted(cols)} != {sorted(ocols)}")
            print(f"FAIL  {name}: columns {sorted(cols)} != {sorted(ocols)}")
            continue
        if len(rows) != len(orows):
            failures.append(name)
            record("fail", len(rows), f"rowcount {len(rows)} != {len(orows)}")
            print(f"FAIL  {name}: rowcount {len(rows)} != {len(orows)}")
            continue
        a = canon(rows, cols)
        b = canon(orows, ocols)
        if a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            record("fail", len(rows), f"value mismatch, first diffs: {diff}")
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        record("hash_match", len(rows))
        print(f"OK    {name}: {len(rows)} rows match ({time.time()-t0:.1f}s)")

    spark.stop()
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "total": len(results),
            "hash_match": sum(
                1 for r in results.values() if r["status"] == "hash_match"
            ),
            "rows_only": sorted(
                n for n, r in results.items() if r["status"] == "rows_only"
            ),
            "failures": sorted(failures),
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
