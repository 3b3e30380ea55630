"""Dump ``explain("formatted")`` for declared queries to files.

The optimization-round deliverable: ``plans/r16/<query>_before.txt`` /
``..._after.txt`` so the judge can check plan claims without running
Spark.

Usage:
  python tools/dump_plans.py --out plans/r16 --tag before [name ...]

With no names, dumps every declared query (``__spark_entry__.queries()``)
plus the extra registry. The explain is the PRE-execution plan
(``AdaptiveSparkPlan isFinalPlan=false``) — deterministic, no data run.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--tag", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from duckdb_vss_spark import get_spark
    from duckdb_vss_spark import queries as _qmod

    spark = get_spark("dump_plans")
    qs = {**entrymod.queries(), **_qmod.extra_queries()}
    names = args.names or list(qs)
    os.makedirs(args.out, exist_ok=True)
    n_ok = n_err = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            txt = f"ERROR building plan: {type(e).__name__}: {e}\n"
            n_err += 1
        else:
            n_ok += 1
        with open(os.path.join(args.out, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(txt)
        print(f"{name}: {'ok' if not txt.startswith('ERROR') else 'ERROR'}")
    print(f"{n_ok} plans dumped, {n_err} errors -> {args.out}")
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
