#!/usr/bin/env python3
"""Measure the REFERENCE implementation's single-node throughput on the
same rows as `graft.FacadeBench` — creates the baseline BASELINE.md
documents as absent (the reference publishes no numbers).

Runs the reference's full facade pipeline (pandas, imported read-only
from /root/reference) over the events table of a testdata SF dir:
preprocess_df → compute_stats → generate_plot_data →
prepare_hourly_aggregated_data, timing each stage.

The events table maps to the FTL frame shape exactly as the engine's
`Preprocess.preprocessEvents` maps it (client=user_id, domain=props,
reply_time=value; event_type → a representative FTL status code from
each class), so both sides chew identical rows.

Usage: python3 tools/ref_bench.py [sfDir] [reps]
"""
import json
import sys
import time
import types

sys.path.insert(0, "/root/reference")
for mod in ("plotly", "plotly.express", "plotly.graph_objects"):
    sys.modules.setdefault(mod, types.ModuleType(mod))

import pandas as pd

from piholelongtermstats.process import preprocess_df, prepare_hourly_aggregated_data
from piholelongtermstats.stats import compute_stats
from piholelongtermstats.plot import generate_plot_data

ALLOWED = {"click", "view", "purchase"}  # Preprocess.AllowedEventTypes
BLOCKED = {"error"}                      # Preprocess.BlockedEventTypes


def load(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet")
    status = pd.Series(0, index=ev.index)
    status[ev["event_type"].isin(ALLOWED)] = 2   # an Allowed FTL code
    status[ev["event_type"].isin(BLOCKED)] = 1   # a Blocked FTL code
    return pd.DataFrame({
        "id": ev["event_id"],
        # epoch seconds regardless of the parquet timestamp unit (the
        # testdata is nanos; replicated throughput sets may be micros)
        "timestamp": (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                      .astype("int64") // 10**9),
        "type": 1,
        "status": status,
        "domain": ev["props"],
        "client": ev["user_id"].astype(str),
        "reply_time": ev["value"],
    })


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    raw = load(sf)
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        prep = preprocess_df(raw.copy(), timezone="UTC")
        t1 = time.perf_counter()
        compute_stats(prep, prep["timestamp"].min(), prep["timestamp"].max())
        t2 = time.perf_counter()
        generate_plot_data(prep, 10, 10)
        t3 = time.perf_counter()
        prepare_hourly_aggregated_data(prep, 10)
        t4 = time.perf_counter()
        runs.append({"preprocess": t1 - t0, "stats": t2 - t1,
                     "plot_data": t3 - t2, "hourly_agg": t4 - t3,
                     "total": t4 - t0})
    best = min(runs, key=lambda r: r["total"])
    print(json.dumps({"impl": "reference-pandas", "sf": sf,
                      "rows": int(len(raw)), "reps": reps,
                      "best": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
