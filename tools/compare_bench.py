"""Diff two bench payloads query-by-query and flag regressions.

    python tools/compare_bench.py BENCH_LOCAL_r06.json BENCH_LOCAL_r07.json
    python tools/compare_bench.py --threshold 1.5 old.json new.json

Prints per-query ratios (new/old) sorted worst-first, then a one-line
summary. Exit code 1 if any query regressed beyond --threshold AND
also regressed relative to the suite-wide drift (this container's
throughput swings 2-3x run to run, so absolute ratios alone
misattribute box state to code — a query is only flagged when it got
slower than the median query did).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="flag when (new/old) / median(new/old) exceeds this")
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    if not shared:
        print("no shared queries between payloads")
        return 1
    ratios = {k: qn[k] / qo[k] for k in shared if qo[k] and qo[k] > 0}
    med = statistics.median(ratios.values())
    flagged = []
    for k, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        rel = r / med if med > 0 else r
        mark = ""
        if rel > args.threshold:
            mark = "  <-- REGRESSED vs suite drift"
            flagged.append(k)
        print(f"{k:40s} {qo[k]:8.3f}s -> {qn[k]:8.3f}s  x{r:5.2f} (rel x{rel:4.2f}){mark}")
    print(
        f"\n{len(shared)} shared queries; suite drift median x{med:.2f} "
        f"(container swings 2-3x are normal); {len(flagged)} flagged "
        f"beyond rel x{args.threshold}"
    )
    gone = sorted(set(qo) - set(qn))
    added = sorted(set(qn) - set(qo))
    if gone:
        print(f"dropped queries: {', '.join(gone)}")
    if added:
        print(f"new queries: {', '.join(added)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
