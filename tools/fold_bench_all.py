#!/usr/bin/env python3
"""Fold N full-catalog bench passes (one JSON line each, as graft.Bench
prints with SPARK_GRAFT_BENCH_ALL=1) into one BENCH_ALL artifact:
per-entry MIN across passes, total = sum of mins.

Usage: python3 tools/fold_bench_all.py OUT.json NOTE pass1.json [pass2.json ...]
"""
import json
import sys


def main(out_path, note, passes):
    runs = []
    for p in passes:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    runs.append(json.loads(line))
                    break
    if not runs:
        raise SystemExit("no bench JSON lines found")
    names = set()
    for r in runs:
        names.update(r["queries"].keys())
    folded = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        folded[n] = min(vals)
    artifact = {
        "metric": "total_all",
        "value": round(sum(folded.values()), 3),
        "unit": "sec",
        "queries": folded,
        "sf": runs[0].get("sf"),
        "runs": len(runs),
        "note": note,
        "load_guard": [r.get("load_guard") for r in runs],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out_path}: {len(folded)} entries, total {artifact['value']}s "
          f"over {len(runs)} passes")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
