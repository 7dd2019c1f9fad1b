#!/usr/bin/env python3
"""Plot-data fidelity cross-check: run the reference generate_plot_data on
the identical fixture rows and compare every table with our engine's
plotData output (StatsDump writes both).

Tie policy: top-k boundaries use pandas first-seen order while our engine
pins (count desc, key asc); entries are compared as (key → count) maps and
boundary differences are accepted only when the counts are equal.

Usage: python3 tools/plot_crosscheck.py /tmp/xcheck
"""
import sys

sys.path.insert(0, "/root/reference")
import types

import pandas as pd

# plot.py imports plotly at module level but generate_plot_data never uses
# it — stub the modules so the data-layer function is importable here.
for mod in ("plotly", "plotly.express", "plotly.graph_objects"):
    sys.modules.setdefault(mod, types.ModuleType(mod))

from piholelongtermstats.process import preprocess_df
from piholelongtermstats.plot import generate_plot_data

FAIL = 0


def check(name, ok, detail=""):
    global FAIL
    if ok:
        print(f"  ok {name}")
    else:
        FAIL += 1
        print(f"  MISMATCH {name}: {detail}")


def counts_match(name, ref_map, our_map):
    """key→count maps match, allowing boundary swaps between equal counts."""
    ref_counts = sorted(ref_map.values())
    our_counts = sorted(our_map.values())
    if ref_counts != our_counts:
        check(name, False, f"count multisets differ: {ref_counts[:5]} vs {our_counts[:5]}")
        return
    boundary = min(ref_counts) if ref_counts else 0
    solid_ref = {k for k, v in ref_map.items() if v > boundary}
    solid_our = {k for k, v in our_map.items() if v > boundary}
    check(name, solid_ref == solid_our and
          all(ref_map[k] == our_map[k] for k in solid_ref),
          f"above-boundary sets differ: {sorted(solid_ref ^ solid_our)[:4]}")


def main(d):
    df = pd.read_parquet(f"{d}/fixture").sort_values("timestamp").reset_index(drop=True)
    prep = preprocess_df(df, timezone="UTC")
    ref = generate_plot_data(prep, 10, 10)

    def ours(name):
        return pd.read_parquet(f"{d}/plot_{name}")

    # stacked client bar: exact (all 5 fixture clients fit in top-10)
    r = ref["top_clients_stacked"]
    o = ours("top_clients_stacked")
    check("top_clients_stacked",
          set(zip(r["client"].astype(str), r["status_type"], r["count"])) ==
          set(zip(o["client"], o["status_type"], o["cnt"])))

    # top domain bars per class: tie-aware top-10 map compare
    for key, mine in (("blocked_df", "blocked_df"), ("allowed_df", "allowed_df")):
        r = ref[key]
        o = ours(mine)
        counts_match(key, dict(zip(r["Domain"], r["count"])),
                     dict(zip(o["domain"], o["cnt"])))

    # reply time by date
    r = ref["reply_time_df"]
    o = ours("reply_time_df")
    rm = {str(k.date()): v for k, v in zip(r["date"], r["reply_time_ms"])}
    om = {str(k): v for k, v in zip(o["date"], o["avg_reply_ms"])}
    # tolerance: Spark rounds HALF_UP to 3dp, pandas values are unrounded —
    # exact equality would flap on .0005 boundaries
    check("reply_time_df", set(rm) == set(om) and
          all(abs(rm[k] - om[k]) <= 0.0011 for k in rm),
          f"{list(rm.items())[:2]} vs {list(om.items())[:2]}")

    # client-domain scatter (min(10,10) top sets; fixture has 5 clients /
    # ~20 domains so boundaries tie-checked via count multiset)
    r = ref["client_domain_scatter_df"]
    o = ours("client_domain_scatter_df")
    counts_match("client_domain_scatter_df",
                 {(str(c), dm, s): n for c, dm, s, n in
                  zip(r["client"].astype(str), r["domain"], r["status_type"], r["count"])},
                 {(c, dm, s): n for c, dm, s, n in
                  zip(o["client"], o["domain"], o["status_type"], o["cnt"])})

    # heatmaps: per (day, hour) cell values, missing cells = 0
    for key, mine in (("day_hour_heatmap", "day_hour_heatmap"),
                      ("blocked_day_hour_heatmap", "blocked_day_hour_heatmap"),
                      ("allowed_day_hour_heatmap", "allowed_day_hour_heatmap")):
        r = ref[key]  # pivot: index day_name, columns hours
        o = ours(mine)
        # sparse fixtures leave NaN holes in both pivots (day-hour combos
        # with no traffic) — an absent cell and a zero cell are the same
        def cell(v):
            return 0 if pd.isna(v) else int(v)
        rcells = {(day, int(h)): cell(r.loc[day, h])
                  for day in r.index for h in r.columns if cell(r.loc[day, h]) != 0}
        ocells = {}
        for _, row in o.iterrows():
            for h in range(24):
                v = cell(row[f"h{h}"])
                if v:
                    ocells[(row["day_name"], h)] = v
        check(key, rcells == ocells,
              f"cell diff: {sorted(set(rcells.items()) ^ set(ocells.items()))[:3]}")

    print(f"FAIL={FAIL}")
    return 1 if FAIL else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
