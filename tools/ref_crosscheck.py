#!/usr/bin/env python3
"""Fidelity cross-check: run the REFERENCE implementation
(/root/reference, read-only import) on the exact fixture rows our engine
computed stats for, and diff the two stat dictionaries.

Usage:
  sbt "runMain graft.StatsDump /tmp/xcheck 1 2000"
  python3 tools/ref_crosscheck.py /tmp/xcheck
"""
import json
import math
import sys

sys.path.insert(0, "/root/reference")
import pandas as pd

from piholelongtermstats.process import preprocess_df
from piholelongtermstats.stats import compute_stats

# keys our engine intentionally reports differently (documented quirks we
# preserve under the reference NAME but the reference computes from probe
# metadata we don't have / displays elsewhere)
SKIP = set()
FLOAT_TOL = 1e-6


def tie_ok(k, prep, ref, ours):
    """pandas argmax has NO deterministic tie-break contract (quicksort /
    positional idxmax); our engine pins (count desc, key asc). A mismatch
    is acceptable iff our claimant is in the pandas argmax TIE SET."""
    if k in ("most_persistent_client", "blocked_domain"):
        counts = (prep[prep["status_type"] == "Blocked"]
                  .groupby(["client", "domain"]).size())
        ties = set(counts[counts == counts.max()].index)
        return (ours["most_persistent_client"], ours["blocked_domain"]) in ties
    # companion count keys: when the claimant differs under a tie, verify
    # OUR count is correct for OUR claimant (all-status count quirk)
    if k.endswith("_domain_count"):
        base = k[:-len("_count")]  # e.g. top_allowed_domain
        dom = ours.get(base)
        if base.startswith(("day_", "night_")):
            period = "Day" if base.startswith("day_") else "Night"
            sub = prep[prep["day_period"] == period]
        else:
            sub = prep
        return int((sub["domain"] == dom).sum()) == ours[k]
    m = {"day": "Day", "night": "Night"}
    for p, period in m.items():
        for cls, status in (("allowed", "Allowed"), ("blocked", "Blocked")):
            sub = prep[(prep["day_period"] == period)
                       & (prep["status_type"] == status)]
            if k == f"{p}_top_{cls}_domain":
                c = sub.groupby("domain").size()
                return len(c) > 0 and c.get(ours[k], -1) == c.max()
            if k == f"{p}_top_{cls}_domain_client":
                dsub = sub[sub["domain"] == ours[f"{p}_top_{cls}_domain"]]
                c = dsub.groupby("client").size()
                return len(c) > 0 and c.get(ours[k], -1) == c.max()
            if k == f"{p}_top_{cls}_client":
                c = sub.groupby("client").size()
                return len(c) > 0 and c.get(ours[k], -1) == c.max()
    for cls, status in (("allowed", "Allowed"), ("blocked", "Blocked")):
        sub = prep[prep["status_type"] == status]
        if k == f"top_{cls}_domain":
            c = sub.groupby("domain").size()
            return len(c) > 0 and c.get(ours[k], -1) == c.max()
        if k == f"top_{cls}_domain_client":
            dsub = sub[sub["domain"] == ours[f"top_{cls}_domain"]]
            c = dsub.groupby("client").size()
            return len(c) > 0 and c.get(ours[k], -1) == c.max()
        if k == f"top_{cls}_client":
            c = sub.groupby("client").size()
            return len(c) > 0 and c.get(ours[k], -1) == c.max()
    if k in ("top_client", "most_diverse_client", "day_top_client",
             "night_top_client", "slowest_domain"):
        if k == "most_diverse_client":
            c = prep.groupby("client")["domain"].nunique()
        elif k == "slowest_domain":
            c = prep.groupby("domain")["reply_time"].mean()
        elif k in ("day_top_client", "night_top_client"):
            period = "Day" if k.startswith("day") else "Night"
            c = prep[prep["day_period"] == period].groupby("client").size()
        else:
            c = prep.groupby("client").size()
        return len(c) > 0 and c.get(ours[k], None) == c.max()
    return False


def main(d):
    df = pd.read_parquet(f"{d}/fixture")
    df = df.sort_values("timestamp").reset_index(drop=True)
    prep = preprocess_df(df, timezone="UTC")
    ref = compute_stats(
        prep, prep["timestamp"].min(), prep["timestamp"].max())
    ours = json.load(open(f"{d}/spark_stats.json"))

    n_pass = n_fail = 0
    for k in sorted(ref):
        if k in SKIP:
            continue
        r, o = ref[k], ours.get(k, "<missing>")
        if isinstance(r, float) or isinstance(o, float):
            ok = (r is None and o is None) or (
                isinstance(r, (int, float)) and isinstance(o, (int, float))
                and (math.isclose(float(r), float(o), rel_tol=FLOAT_TOL,
                                  abs_tol=FLOAT_TOL)))
        else:
            ok = str(r) == str(o)
        if not ok:
            try:
                ok = tie_ok(k, prep, ref, ours)
                if ok:
                    print(f"  tie-accepted {k}: ref={r!r} ours={o!r} (equal measure)")
            except Exception:
                pass
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"  MISMATCH {k}: ref={r!r} ours={o!r}")
    missing = set(ref) - set(ours) - SKIP
    extra = set(ours) - set(ref)
    print(f"PASS={n_pass} FAIL={n_fail} missing={sorted(missing)} extra={sorted(extra)}")
    return 1 if n_fail or missing else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
