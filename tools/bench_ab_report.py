#!/usr/bin/env python3
"""Attribution analysis over the four run_r17_bench_ab.sh runs:
identity agreement of per-query deltas within a methodology, warm vs
no-warm totals, and the GC share of each timed window. Usage:
  bench_ab_report.py warm1.json warm2.json nowarm1.json nowarm2.json
"""
import json, sys

DELTA_SEC = 0.5


def load(p):
    return json.load(open(p))


def deltas(a, b):
    qs = [k for k in a["queries"] if k in b["queries"]
          and a["queries"][k] >= 0 and b["queries"][k] >= 0]
    return {k: b["queries"][k] - a["queries"][k] for k in qs}


def big(d):
    return {k for k, v in d.items() if abs(v) >= DELTA_SEC}


def gc_share(d):
    """total min-run GC seconds / total min-run wall seconds."""
    gc = 0.0
    for k, io in d.get("io", {}).items():
        runs = d.get("runs", {}).get(k)
        g = io.get("gc_ms")
        if not runs or not g:
            continue
        gc += (g[0] if runs[0] <= runs[1] else g[1]) / 1000.0
    return gc


def main():
    w1, w2, n1, n2 = (load(p) for p in sys.argv[1:5])
    for label, d in (("warm1", w1), ("warm2", w2),
                     ("nowarm1", n1), ("nowarm2", n2)):
        print(f"{label}: total={d['value']:.1f}s cpu_vs_wall={d['cpu_vs_wall']:.2f} "
              f"warmup={d['warmup_sec']:.0f}s "
              f"timed_gc={gc_share(d):.1f}s gc_total={d['gc_total_ms']/1000:.1f}s")
    dw = deltas(w1, w2)
    dn = deltas(n1, n2)
    print(f"\nwithin-warm   |delta|>={DELTA_SEC}s: {sorted(big(dw))}")
    print(f"within-nowarm |delta|>={DELTA_SEC}s: {sorted(big(dn))}")
    # cross-methodology: per-query min across the two runs of each
    wmin = {k: min(w1["queries"][k], w2["queries"][k]) for k in dw}
    nmin = {k: min(n1["queries"][k], n2["queries"][k]) for k in dn}
    common = sorted(set(wmin) & set(nmin))
    tw, tn = sum(wmin[k] for k in common), sum(nmin[k] for k in common)
    print(f"\nwarm-of-two total {tw:.1f}s vs nowarm-of-two total {tn:.1f}s "
          f"-> warm/nowarm = {tw/tn:.3f} over {len(common)} queries")
    cross = sorted(((wmin[k] - nmin[k], k) for k in common), reverse=True)
    print("warm slower than nowarm by >=0.5s:")
    for d, k in cross:
        if d >= DELTA_SEC:
            print(f"  {d:+.2f}  {k}  (warm {wmin[k]:.2f} vs nowarm {nmin[k]:.2f})")
    print("warm faster than nowarm by >=0.5s:")
    for d, k in cross[::-1]:
        if d <= -DELTA_SEC:
            print(f"  {d:+.2f}  {k}  (warm {wmin[k]:.2f} vs nowarm {nmin[k]:.2f})")


if __name__ == "__main__":
    main()
