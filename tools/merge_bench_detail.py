#!/usr/bin/env python3
"""Merge N full bench_detail.json runs into the committed round detail:
per-query MIN across like-labeled runs (the r13 ask — the committed
number is the best the code demonstrably did, not the last sweep).

Usage: merge_bench_detail.py OUT run1.json run2.json [...]
"""
import json
import sys


def main():
    out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    labels = {r["cache"]["label"] for r in runs}
    assert len(labels) == 1, f"runs must be like-labeled, got {labels}"
    # FAIL LOUDLY on errors (r15 verdict: a silently-carried
    # [STREAM_FAILED] let BENCH_SCALING claim "zero failures" over a
    # merge that contained one). A run with errors must be triaged —
    # re-run it clean, or pass --allow-errors to merge anyway (the
    # merged file then still carries every error, annotated per run).
    allow = "--allow-errors" in sys.argv
    per_run_errors = {f"run{i+1}": r.get("errors", {})
                      for i, r in enumerate(runs) if r.get("errors")}
    if per_run_errors and not allow:
        sys.exit(f"REFUSING to merge: errors present in {sorted(per_run_errors)}:\n"
                 + json.dumps(per_run_errors, indent=1)
                 + "\nRe-run those sweeps clean, or pass --allow-errors.")
    names = set()
    for r in runs:
        names |= set(r["queries"])
    queries, passes = {}, {}
    for n in sorted(names):
        per_run = [(r["queries"][n], r["passes"].get(n, [])) for r in runs if n in r["queries"]]
        best = min(per_run, key=lambda t: t[0])
        queries[n], passes[n] = best
    merged = {
        "cache": min((r["cache"] for r in runs), key=lambda c: -c["second_sweep_mb_s"]),
        "errors": {k: v for r in runs for k, v in r.get("errors", {}).items()},
        "errors_by_run": per_run_errors,  # provenance: WHICH sweep failed
        "failed": max(r.get("failed", 0) for r in runs),
        "metric": "total",
        "passes": passes,
        "protocol": (
            f"min across {len(runs)} full like-labeled {labels.pop()} runs "
            "(r13 ask: stop needing forensic drift accounts); "
            "each run itself min-of-3 passes after warmup"),
        "queries": queries,
        "runs": {f"run{i+1}_total": round(sum(r["queries"].values()), 4)
                 for i, r in enumerate(runs)},
    }
    json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
    print(f"{out}: {len(queries)} queries, total {sum(queries.values()):.1f} s, "
          f"runs {merged['runs']}")


if __name__ == "__main__":
    main()
