#!/usr/bin/env python3
"""sf1 scale-regression detector (r13 directive #5) — driver-side tooling,
like check_oracle.py.

Diffs a NEW sf1 bench run (graft.Bench JSON — the file at
target/bench_last.json / SPARK_GRAFT_BENCH_OUT, or any JSON object with a
"queries" map, possibly nested under "result") against the committed sf1
baseline (BENCH_SF1_r15.json by default), applying the SAME rule as the
sf0.1 driver detector: flag when new > max(2 * base, base + 1s). Queries
absent from the baseline are reported as "new" (they become baseline on
the next refresh), errors (value < 0) are always flagged.

Usage:
  python3 tools/scale_check.py <new_bench.json> [baseline.json]

Exit code 1 when any regression or error is found, 0 otherwise; prints
one JSON summary line either way.
"""
import json
import sys


def load_queries(path):
    d = json.load(open(path))
    if "queries" not in d and "result" in d:
        d = d["result"]
    q = d.get("queries")
    if not isinstance(q, dict):
        raise SystemExit(f"{path}: no 'queries' map found")
    return {k: float(v) for k, v in q.items()}


def main():
    new_path = sys.argv[1]
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1_r15.json"
    new = load_queries(new_path)
    base = load_queries(base_path)
    regressions, errors, fresh = [], [], []
    for name, sec in sorted(new.items()):
        if sec < 0:
            errors.append(name)
            continue
        if name not in base:
            fresh.append({"query": name, "sec": round(sec, 3)})
            continue
        b = base[name]
        if sec > max(2 * b, b + 1.0):
            regressions.append({
                "query": name, "sec": round(sec, 3),
                "baseline_sec": round(b, 3),
                "ratio": round(sec / b, 2) if b > 0 else None})
    checked = sum(1 for n in new if n in base and new[n] >= 0)
    print(json.dumps({
        "baseline": base_path, "new": new_path,
        "n_checked": checked,
        "n_regressions": len(regressions), "regressions": regressions,
        "n_errors": len(errors), "errors": errors,
        "n_new_queries": len(fresh), "new_queries": fresh,
        "rule": "flag when new > max(2*baseline, baseline+1s)"}))
    sys.exit(1 if (regressions or errors) else 0)


if __name__ == "__main__":
    main()
