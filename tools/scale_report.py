#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from the per-factor bench_full.json dumps
(target/scale_x{1,10,32}.json, produced by graft.Bench with
SPARK_GRAFT_SF_DIR pointed at the ScaleGen-derived corpora).

For each query: seconds, shuffle-write bytes, and peak task memory at
each factor, plus time/shuffle growth ratios normalized by the data
growth — a ratio <= ~1 means at-most-linear scaling (fixed overheads
make small-factor ratios < 1).

Usage: python3 tools/scale_report.py SCALE_r5.json
"""
import json, sys

FACTORS = [1, 10, 32]

def main(out_path):
    runs = {}
    for f in FACTORS:
        with open(f"target/scale_x{f}.json") as fh:
            runs[f] = json.load(fh)["queries"]
    queries = sorted(runs[1].keys())
    report = {"factors": FACTORS, "queries": {}}
    worst = (None, 0.0)
    for q in queries:
        entry = {}
        for f in FACTORS:
            m = runs[f][q]
            entry[f"x{f}"] = {
                "sec": round(m["sec"], 3),
                "shuffle_write": m.get("shuffle_write", 0),
                "peak_task_mem": m.get("peak_task_mem", 0),
                "spill": m.get("spill", 0),
            }
        t1, t32 = runs[1][q]["sec"], runs[32][q]["sec"]
        s1 = max(1, runs[1][q].get("shuffle_write", 0))
        s32 = runs[32][q].get("shuffle_write", 0)
        entry["time_growth_vs_linear_x32"] = round((t32 / t1) / 32.0, 3)
        entry["shuffle_growth_vs_linear_x32"] = round((s32 / s1) / 32.0, 3)
        if entry["time_growth_vs_linear_x32"] > worst[1]:
            worst = (q, entry["time_growth_vs_linear_x32"])
        report["queries"][q] = entry
    report["verdict"] = {
        "worst_time_growth_vs_linear": {"query": worst[0], "ratio": worst[1]},
        "note": ("ratio = (t_x32/t_x1)/32; <=1 means at-most-linear wall-time "
                 "growth at 32x the data on fixed local[32] resources"),
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report["verdict"], indent=1))
    for q in queries:
        e = report["queries"][q]
        print(f"{q:24s} t: {e['x1']['sec']:7.2f} -> {e['x10']['sec']:7.2f} -> "
              f"{e['x32']['sec']:7.2f}  (x32 time ratio/linear "
              f"{e['time_growth_vs_linear_x32']:.2f}, shuffle "
              f"{e['shuffle_growth_vs_linear_x32']:.2f})")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r5.json")
