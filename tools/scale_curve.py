"""Ad-hoc cross-engine scaling points beyond the per-round 8x curve.

Runs bench.scale_curves at an arbitrary replication factor without the
full bench suite, e.g. the 32x points that show the Spark/DuckDB
crossing decisively:

    python tools/scale_curve.py --reps 32 --shapes minhash,spans

Prints one JSON line and appends it to SCALE_POINTS.jsonl at the repo
root (one record per run, env + reps + shapes + timings), so larger
points accumulate as evidence without perturbing the driver's
BENCH_LOCAL_r{N}.json contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from duckdb_vss_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument(
        "--shapes",
        default="minhash,spans",
        help="comma list from minhash,contamination,spans,semdedup,hnsw,kmeans,q01,asof,q03",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("scale-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # session warmup
    errors: dict[str, str] = {}
    t0 = time.time()
    out = bench.scale_curves(
        spark,
        args.sf_dir,
        reps=args.reps,
        shapes=set(s for s in args.shapes.split(",") if s),
        errors=errors,
    )
    rec = {
        "reps": args.reps,
        "shapes": args.shapes,
        "sf_dir": args.sf_dir,
        "wall": round(time.time() - t0, 1),
        "points": out,
    }
    if errors:
        rec["errors"] = errors
    line = json.dumps(rec)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "SCALE_POINTS.jsonl"),
        "a",
    ) as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
