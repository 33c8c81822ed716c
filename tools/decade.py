#!/usr/bin/env python3
"""Second-decade scaling report (r13 verdict task 1).

Takes two graft.Bench JSON lines — one at sf0.1, one at the amplified
sf1-equivalent (tools: graft.AmplifyDecade) — and prints the per-query
scaling exponent  e = log10(t_big / t_small)  for a ×10 data step
(e = 1 → linear, e < 1 → sublinear / fixed-overhead-dominated,
e > 1 → super-linear: investigate before trusting the 100 TB claim).

Usage: python3 tools/decade.py <bench_sf01.json> <bench_sf1eq.json> [--out MD]
"""
import sys, json, math, argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    s = json.load(open(args.small))["queries"]
    b = json.load(open(args.big))["queries"]
    rows = []
    for q in sorted(set(s) & set(b)):
        ts, tb = s[q], b[q]
        if not ts or not tb:
            continue
        e = math.log10(tb / ts)
        rows.append((q, ts, tb, tb / ts, e))
    rows.sort(key=lambda r: -r[4])
    lines = ["| query | sf0.1 s | sf1eq s | ratio | exponent |",
             "|---|---|---|---|---|"]
    for q, ts, tb, r, e in rows:
        flag = " **<-- SUPER-LINEAR**" if e > 1.05 else ""
        lines.append(f"| {q} | {ts:.2f} | {tb:.2f} | {r:.2f}x | {e:.2f}{flag} |")
    worst = max((r[4] for r in rows), default=0.0)
    lines.append(f"\nworst exponent: {worst:.2f} over {len(rows)} queries "
                 f"({sum(1 for r in rows if r[4] > 1.05)} super-linear)")
    text = "\n".join(lines)
    print(text)
    if args.out:
        open(args.out, "w").write(text + "\n")
    return 1 if worst > 1.05 else 0


if __name__ == "__main__":
    sys.exit(main())
