#!/usr/bin/env python3
"""Per-query sf1/sf0.1 scaling table from a same-session pair of
BENCH_FULL-format records (round 12: BENCH_FULL.json at sf0.1 +
BENCH_SF1.json at /tmp/sf1, cut back-to-back by tools-free protocol).
Data ratio is 10x on every fact-side table (lineitem/orders/events/
documents/embeddings; dimensions unchanged), so 'growth <= 1.5x the
data ratio' means time ratio <= 15. Queries far BELOW 10x are fixed-
cost-dominated at this SF, not sublinear miracles."""
import json, sys

def load(p):
    d = json.load(open(p))
    return d, d["queries"], d.get("spreads", {})

a, qa, sa = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json")
b, qb, sb = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1.json")
rows = []
for k in sorted(qa):
    if k in qb and qa[k] > 0 and qb[k] > 0:
        rows.append((qb[k] / qa[k], k, qa[k], qb[k], sa.get(k, 0), sb.get(k, 0)))
rows.sort(reverse=True)
print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} {'spr01':>6s} {'spr1':>6s}")
for r, k, va, vb, s1, s2 in rows:
    flag = " <== >15x" if r > 15 else ""
    print(f"{k:34s} {va:8.3f} {vb:8.3f} {r:7.2f} {s1:6.2f} {s2:6.2f}{flag}")
n15 = sum(1 for r in rows if r[0] > 15)
print(f"\nn={len(rows)} queries paired; {n15} above 15x; "
      f"totals {a['value']:.1f}s -> {b['value']:.1f}s "
      f"(ratio {b['value']/a['value']:.2f}); "
      f"controls {a.get('control_ratio')} / {b.get('control_ratio')}")
