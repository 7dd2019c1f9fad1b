#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's t2 gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json on the same testdata.
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string with float rounding for hash
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(9).map(lambda v: f"{v:.9f}" if pd.notna(v) else "NULL")
        else:
            out[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def run_oracle(con, name, sql):
    """Execute one oracle. p25's one-shot form (the recursive
    connected-components closure COMPOSED with the LM-scoring CTEs)
    exceeds DuckDB's temp spill at sf1 (>37 GB before ENOSPC at 50k
    docs — CORRECTNESS_SF1.md), while each half alone fits (p09/p16
    pass). Stage it: materialize the curation survivors into a temp
    table, then run the LM half against it. Same rows, bounded spill."""
    if name == "p25_curated_chunks_lm" and "ptoks AS (" in sql:
        i = sql.find("ptoks AS (")
        prefix = sql[:i].rstrip().rstrip(",")
        con.sql("DROP TABLE IF EXISTS _p25_surv")
        con.sql("CREATE TEMP TABLE _p25_surv AS " + prefix + " SELECT doc_id FROM surv")
        return con.sql("WITH surv AS (SELECT doc_id FROM _p25_surv),\n" + sql[i:]).df()
    return con.sql(sql).df()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_nooracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            n_nooracle += 1
            print(f"  ~ {name}: no oracle, rows={len(got)}" + (" !! EMPTY" if len(got) == 0 else ""))
            continue
        try:
            exp = run_oracle(con, name, oracle[name])
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {str(e)[:200]}")
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            n_fail += 1
            print(f"  ✗ {name}: COLUMN MISMATCH spark={list(cg.columns)} duckdb={list(ce.columns)}")
        elif len(cg) != len(ce):
            n_fail += 1
            print(f"  ✗ {name}: ROWCOUNT spark={len(cg)} duckdb={len(ce)}")
        elif not cg.equals(ce):
            n_fail += 1
            diff = (cg != ce).any(axis=1)
            print(f"  ✗ {name}: VALUE MISMATCH ({diff.sum()} rows)")
            print("    spark :", cg[diff].head(3).to_dict("records"))
            print("    duckdb:", ce[diff].head(3).to_dict("records"))
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(cg)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_nooracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
