"""Noise-aware bench gate (VERDICT r13 #6): per-query drift watching
stopped being informative once the container's run-to-run swing (2-3x
per row) exceeded any real per-round change, so the gate flags only

  (a) rows whose suite-median-relative time drifted in the SAME
      direction across TWO consecutive round pairs (three payloads:
      prev2 prev1 current). Monotone drift compounds, so the two-round
      bar is --monotone-threshold (default 1.3x per pair, >=1.69x
      compounded) — VERDICT r16 #2: hnsw_delete_batch crept
      1.19 -> 1.63 -> 2.52 s (x1.37 then x1.55) and the old single
      x1.5-both-pairs bar structurally could not flag it. Or
  (b) rows whose normalized physical-plan hash changed between the
      --plans files (emitted by tools/check_correctness.py
      --plan-hashes) — a plan-shape change is a code signal no amount
      of container noise produces.

Two-payload mode keeps the older median-relative single-pair report
for ad-hoc diffs.

    python tools/compare_bench.py BENCH_LOCAL_r12.json BENCH_LOCAL_r13.json BENCH_LOCAL_r14.json
    python tools/compare_bench.py old.json new.json
    python tools/compare_bench.py ... --plans PLANS_r13.json PLANS_r14.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f).get("queries", {})


def _rel_ratios(qo: dict, qn: dict) -> dict[str, float]:
    """new/old per query, normalized by the suite median so a whole-box
    slowdown reads as x1.0 for every row."""
    shared = set(qo) & set(qn)
    ratios = {k: qn[k] / qo[k] for k in shared if qo.get(k) and qo[k] > 0}
    if not ratios:
        return {}
    med = statistics.median(ratios.values())
    return {k: (r / med if med > 0 else r) for k, r in ratios.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("payloads", nargs="+", help="2 or 3 bench JSONs, oldest first")
    ap.add_argument(
        "--threshold", type=float, default=1.5,
        help="flag when the median-relative ratio exceeds this (>50%% drift)",
    )
    ap.add_argument(
        "--monotone-threshold", type=float, default=1.3,
        help="3-payload mode: flag same-direction drift beyond this in "
        "BOTH pairs (lower than --threshold because monotone drift "
        "compounds; 1.3 x 1.3 is already x1.69 over two rounds)",
    )
    ap.add_argument(
        "--plans", nargs=2, metavar=("OLD", "NEW"), default=None,
        help="two plan-hash JSONs from check_correctness.py --plan-hashes",
    )
    args = ap.parse_args()
    if len(args.payloads) not in (2, 3):
        ap.error("expected 2 or 3 bench payloads")

    flagged: list[str] = []
    if len(args.payloads) == 3:
        q0, q1, q2 = (_load(p) for p in args.payloads)
        r01, r12 = _rel_ratios(q0, q1), _rel_ratios(q1, q2)
        both = sorted(set(r01) & set(r12))
        thr = args.monotone_threshold
        print(
            f"two-round gate over {len(both)} rows "
            f"({args.payloads[0]} -> {args.payloads[1]} -> {args.payloads[2]}); "
            f"flag = median-relative drift >x{thr} in the same "
            "direction in BOTH pairs (monotone drift compounds)"
        )
        for k in both:
            a, b = r01[k], r12[k]
            slow = a > thr and b > thr
            fast = a < 1 / thr and b < 1 / thr
            if slow or fast:
                flagged.append(k)
                word = "REGRESSED" if slow else "improved"
                print(
                    f"  {k:40s} rel x{a:4.2f} then x{b:4.2f}  <-- {word} "
                    "two rounds running"
                )
        if not flagged:
            print("  no persistent drift (single-pair swings are container noise)")
        new_rows = sorted(set(q2) - set(q1))
        gone = sorted(set(q1) - set(q2))
        if new_rows:
            print(f"new rows in {args.payloads[2]}: {', '.join(new_rows)}")
        if gone:
            print(f"rows dropped from {args.payloads[2]}: {', '.join(gone)}")
    else:
        qo, qn = (_load(p) for p in args.payloads)
        rel = _rel_ratios(qo, qn)
        if not rel:
            print("no shared queries between payloads")
            return 1
        for k, r in sorted(rel.items(), key=lambda kv: -kv[1]):
            mark = ""
            if r > args.threshold:
                mark = "  <-- beyond suite drift (verify across a second round before acting)"
                flagged.append(k)
            print(f"{k:40s} {qo[k]:8.3f}s -> {qn[k]:8.3f}s  rel x{r:4.2f}{mark}")
        print(
            f"\n{len(rel)} shared queries; single-pair report — the "
            "container swings 2-3x, so treat flags as watch items, not "
            "regressions, until a second round confirms"
        )

    plan_changed: list[str] = []
    if args.plans:
        with open(args.plans[0]) as f:
            po = json.load(f)
        with open(args.plans[1]) as f:
            pn = json.load(f)
        plan_changed = sorted(k for k in set(po) & set(pn) if po[k] != pn[k])
        if plan_changed:
            print(
                f"\nPLAN CHANGED ({len(plan_changed)} rows — code signal, "
                "inspect .explain before shipping):"
            )
            for k in plan_changed:
                print(f"  {k}: {po[k]} -> {pn[k]}")
        else:
            print(f"\nplan hashes: all {len(set(po) & set(pn))} shared rows unchanged")

    return 1 if (flagged or plan_changed) else 0


if __name__ == "__main__":
    sys.exit(main())
