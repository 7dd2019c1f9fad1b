#!/usr/bin/env python3
"""Dev-only: replicate a testdata table N x into /tmp with distinct ids,
so operators can be measured on corpus-scale row counts (the sf0.1 files
are latency-bound, not throughput-bound). Used with graft.ShingleProbe /
graft.Profile; round-8 numbers in SCALE.md came from these replicas.

Usage: python3 tools/make_scaled.py documents 100   -> /tmp/docs_x100
       python3 tools/make_scaled.py embeddings 100  -> /tmp/emb_x100
"""
import sys, os
import duckdb

TABLES = {
    "documents": ("docs", "SELECT doc_id + r.i * 1000000 AS doc_id, "
                          "text, lang, source, n_chars"),
    "embeddings": ("emb", "SELECT vec_id + r.i * 1000000 AS vec_id, "
                          "embedding, label"),
}

def main(table, mult, sf_dir="/root/testdata/sf0.1"):
    prefix, select = TABLES[table]
    out = f"/tmp/{prefix}_x{mult}"
    os.makedirs(out, exist_ok=True)
    duckdb.sql(f"""
      COPY ({select}
            FROM '{sf_dir}/{table}.parquet',
                 (SELECT unnest(generate_series(0, {mult - 1})) AS i) r)
      TO '{out}/{table}.parquet' (FORMAT parquet)
    """)
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{out}/{table}.parquet rows={n}")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
