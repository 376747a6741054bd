#!/usr/bin/env python3
"""Join two graft.tools.Scaling logs (sf0.1 baseline, sf1) into the
SCALING.md measurement table: per-query seconds at both scales and the
t(sf1)/t(sf0.1) volume ratio. Dev-only; the committed artifact is
SCALING.md itself."""
import json
import sys


def load(path):
    rows, summary = {}, None
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"metric":"scaling'):
            continue
        d = json.loads(line)
        if d["metric"] == "scaling":
            rows[d["query"]] = d["sec"]
        elif d["metric"] == "scaling_summary":
            summary = d
    return rows, summary


def main():
    base_path, big_path = sys.argv[1], sys.argv[2]
    base, bsum = load(base_path)
    big, gsum = load(big_path)
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("| --- | --- | --- | --- |")
    items = sorted(base.items(), key=lambda kv: -(big.get(kv[0], 0) or 0))
    for q, b in items:
        g = big.get(q)
        if g is None or b <= 0 or g <= 0:
            print(f"| {q} | {b:.2f} | FAILED | — |")
            continue
        print(f"| {q} | {b:.2f} | {g:.2f} | {g / b:.1f}× |")
    if bsum and gsum:
        ab, ag = bsum["artifacts_s"], gsum["artifacts_s"]
        print(f"| shared artifacts (build) | {ab:.2f} | {ag:.2f} | {ag / ab:.1f}× |")
        print()
        print(f"cal_st: sf0.1 run {bsum['cal_st']}, sf1 run {gsum['cal_st']}")
        tb = bsum["total_s"]
        tg = gsum["total_s"]
        print(f"totals: {tb:.1f}s -> {tg:.1f}s ({tg / tb:.1f}x)")


if __name__ == "__main__":
    main()
