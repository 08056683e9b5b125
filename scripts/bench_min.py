#!/usr/bin/env python3
"""Merge N graft.Bench output files into the best-of-runs artifact.

Usage: python3 scripts/bench_min.py BENCH_OUT.json [BENCH_OUT.json ...]

Same-HEAD bench totals on this box span +/-7% with load (r12 judge
measurement: 296-317 s across three runs), so a single run cannot
distinguish a plan regression from box weather. The official
round-over-round comparison artifact is the PER-QUERY MINIMUM across
independent full runs: the min is the closest observable to the plan's
intrinsic cost, and per-query loadavg context rides along from each run.

Output schema mirrors one Bench line plus provenance:
  {"metric":"total_min_of_runs","value":<sum of per-query minima>, ...,
   "queries":{q:min}, "runs":[{"value":..,"loadavg_start":..,..}]}
"""
import json
import sys


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    queries = {}
    for r in runs:
        for q, v in r["queries"].items():
            queries[q] = min(v, queries.get(q, float("inf")))
    errors = {}
    for i, r in enumerate(runs):
        for q, e in r.get("errors", {}).items():
            errors.setdefault(q, []).append("run%d: %s" % (i + 1, e))
    # a query that succeeded in ANY run has a timing; report the FULL
    # per-run error list for queries that failed in EVERY run (keeping
    # only the last run's message hid distinct failure modes — r13 advice)
    errors = {q: msgs for q, msgs in errors.items() if q not in queries}
    # expected-vs-timed: a query failing in every run would otherwise
    # silently deflate the total; make the registry gap visible. The
    # expected COUNT comes from the registry itself (Bench's n_registered,
    # stamped by the JVM that owns the query map) — a union of run outputs
    # cannot see a query that every run silently skipped.
    expected = set()
    for r in runs:
        expected |= set(r["queries"]) | set(r.get("errors", {}))
    n_expected = max(
        [r.get("n_registered", 0) for r in runs] + [len(expected)])
    stream = sum(v for q, v in queries.items() if q.startswith("q_stream"))
    total = sum(queries.values())
    out = {
        "metric": "total_min_of_runs",
        "value": round(total, 3),
        "unit": "sec",
        "n_runs": len(runs),
        "n_queries_timed": len(queries),
        "n_queries_expected": n_expected,
        "never_succeeded": sorted(expected - set(queries)),
        "batch_total": round(total - stream, 3),
        "streaming_total": round(stream, 3),
        "queries": {q: round(v, 3) for q, v in sorted(queries.items())},
        "errors": errors,
        "sf": runs[0].get("sf"),
        "runs": [
            {
                "value": r.get("value"),
                "loadavg_start": r.get("loadavg_start"),
                "loadavg_end": r.get("loadavg_end"),
            }
            for r in runs
        ],
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
