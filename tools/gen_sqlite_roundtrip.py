#!/usr/bin/env python3
"""Generative page-level round-trip fixtures for SqliteRoundTripPropertySpec.

Usage: gen_sqlite_roundtrip.py <seed> <nCases> <outDir>

For each case writes, via the REAL sqlite3 library (the authority on the
file format):
  case_<i>.db                a random table under a random page size,
                             text encoding, rowid/WITHOUT-ROWID shape,
                             and row count
  case_<i>_expected.parquet  the exact rows inserted, with the Spark-side
                             column types (INTEGER->int64, REAL->float64,
                             TEXT->string, BLOB->binary)
  case_<i>.meta              one line: <table> <withoutRowid 0|1>

The value generator is biased toward the file-format edges the reader
must handle:
  - INTEGER: every serial-type width (0/1-byte/2/3/4/6/8-byte, signed),
    including Long.MIN/MAX and negative rowid-alias keys (9-byte varints)
  - REAL: +/-inf, subnormals, integral floats (SQLite's REAL->INTEGER
    storage optimization makes these land as integer serials that the
    reader must coerce back to double)
  - TEXT/BLOB: byte lengths straddling the single-page overflow threshold
    (usable-35) and multi-page overflow chains (several x page size),
    plus non-ASCII text under all three encodings
  - row counts up to a few thousand at page_size 512, forcing interior
    B-tree pages and splits

Deterministic for a given seed: no wall clock, no library RNG but random.
"""
import os
import random
import sqlite3
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TEXT_PALETTE = "abcdefghijklmnopqrstuvwxyz0123456789 _-.,!?éüñ中文日本語🐉🦑"


def gen_int(rng):
    bucket = rng.randrange(10)
    if bucket == 0:
        return rng.choice([0, 1, -1])  # serial types 8/9 and 1-byte
    if bucket == 1:
        return rng.choice([127, -128, 255, -255])  # 1/2-byte edges
    if bucket == 2:
        return rng.choice([32767, -32768, 65535])  # 2/3-byte edges
    if bucket == 3:
        return rng.choice([(1 << 23) - 1, -(1 << 23), (1 << 31) - 1, -(1 << 31)])
    if bucket == 4:
        return rng.choice([(1 << 47) - 1, -(1 << 47), (1 << 63) - 1, -(1 << 63)])
    return rng.randrange(-(1 << 62), 1 << 62)


def gen_real(rng):
    bucket = rng.randrange(8)
    if bucket == 0:
        return rng.choice([float("inf"), float("-inf")])
    if bucket == 1:
        return rng.choice([5e-324, 2.2250738585072014e-308])  # subnormal edge
    if bucket == 2:
        return float(rng.randrange(-1000, 1000))  # integral: stored as INTEGER
    if bucket == 3:
        return 0.0
    return rng.uniform(-1e12, 1e12)


def gen_len(rng, page_size):
    """Byte-length buckets straddling overflow thresholds."""
    bucket = rng.randrange(8)
    if bucket <= 3:
        return rng.randrange(0, 24)  # in-page
    if bucket <= 5:
        # single-page overflow boundary: payload limit is usable-35
        return rng.randrange(max(0, page_size - 70), page_size + 70)
    # multi-page overflow chain
    return rng.randrange(2 * page_size, 4 * page_size)


def gen_text(rng, page_size):
    n = gen_len(rng, page_size)
    return "".join(rng.choice(TEXT_PALETTE) for _ in range(n))


def gen_blob(rng, page_size):
    n = gen_len(rng, page_size)
    return bytes(rng.randrange(256) for _ in range(n))


GEN = {"INTEGER": gen_int, "REAL": gen_real, "TEXT": gen_text, "BLOB": gen_blob}
ARROW = {"INTEGER": pa.int64(), "REAL": pa.float64(),
         "TEXT": pa.string(), "BLOB": pa.binary()}


def gen_case(rng, i, out):
    page_size = rng.choice([512, 1024, 4096])
    encoding = rng.choice(["UTF-8", "UTF-16le", "UTF-16be"])
    shape = rng.choice(["plain", "plain", "rowid_alias", "without_rowid"])
    ncols = rng.randrange(1, 8)
    types = [rng.choice(list(GEN)) for _ in range(ncols)]
    names = [f"c{j}" for j in range(ncols)]
    # big row counts only at small page size (keeps generation fast while
    # still forcing interior-page splits)
    nrows = rng.choice([0, 1, 7, 60, 60, 300] + ([1500] if page_size == 512 else []))

    pk_idx = None
    if shape == "rowid_alias":
        pk_idx = rng.randrange(ncols)
        types[pk_idx] = "INTEGER"
    elif shape == "without_rowid":
        pk_idx = rng.randrange(ncols)
        types[pk_idx] = rng.choice(["INTEGER", "TEXT"])

    def decl(j):
        base = f"{names[j]} {types[j]}"
        if shape == "rowid_alias" and j == pk_idx:
            base += " PRIMARY KEY"
        return base

    ddl = f"CREATE TABLE t ({', '.join(decl(j) for j in range(ncols))}"
    if shape == "without_rowid":
        ddl += f", PRIMARY KEY ({names[pk_idx]})) WITHOUT ROWID"
    else:
        ddl += ")"

    rows = []
    pk_seen = set()
    for r in range(nrows):
        row = []
        for j in range(ncols):
            if j == pk_idx:
                # unique, non-null; for INTEGER keys bias into negative and
                # wide values (9-byte rowid varints on the alias path)
                while True:
                    v = gen_int(rng) if types[j] == "INTEGER" else (
                        f"k{r}_" + gen_text(rng, 64)[:16])
                    if v not in pk_seen:
                        pk_seen.add(v)
                        break
            elif rng.random() < 0.12:
                v = None
            else:
                v = GEN[types[j]](rng, page_size) if types[j] in ("TEXT", "BLOB") \
                    else GEN[types[j]](rng)
            row.append(v)
        rows.append(tuple(row))

    db = os.path.join(out, f"case_{i}.db")
    con = sqlite3.connect(db)
    con.execute(f"PRAGMA page_size = {page_size}")
    con.execute(f"PRAGMA encoding = '{encoding}'")
    # a couple of sibling tables so sqlite_master has several entries to walk
    con.execute("CREATE TABLE _aux1 (x INTEGER)")
    con.execute(ddl)
    con.execute("CREATE TABLE _aux2 (y TEXT)")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' * ncols)})", rows)
    con.commit()
    con.close()

    arrays = []
    for j in range(ncols):
        vals = [r[j] for r in rows]
        arrays.append(pa.array(vals, type=ARROW[types[j]]))
    table = pa.Table.from_arrays(arrays, names=names)
    pq.write_table(table, os.path.join(out, f"case_{i}_expected.parquet"))
    with open(os.path.join(out, f"case_{i}.meta"), "w") as f:
        f.write(f"t {1 if shape == 'without_rowid' else 0} "
                f"{page_size} {encoding} {shape} rows={nrows} cols={ncols}\n")


def main():
    seed, n, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.makedirs(out, exist_ok=True)
    rng = random.Random(seed)
    for i in range(n):
        gen_case(rng, i, out)
    print(f"generated {n} cases in {out}")


if __name__ == "__main__":
    main()
