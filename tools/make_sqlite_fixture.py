#!/usr/bin/env python3
"""Build the SQLite test fixtures for FtlIngestSpec (dev tooling — run
once, outputs are committed as test resources).

Creates, with the reference's DDL (reference: tests/conftest.py:129-148):
  src/test/resources/ftl_fixture.db        3000 rows, multi-level B-tree,
                                           NULL reply_times, one overflow
                                           row (6000-char domain), one
                                           invalid-UTF-8 domain (stored as
                                           a blob in the TEXT column)
  src/test/resources/ftl_fixture_pk.db     same first 200 rows but with
                                           id INTEGER PRIMARY KEY (rowid
                                           alias: id stored as NULL)
  src/test/resources/ftl_fixture_empty.db  DDL only, zero rows
  src/test/resources/ftl_fixture.csv       CSV twin of ftl_fixture.db for
                                           the row-for-row cross check
                                           (overflow/blob rows excluded —
                                           the CSV path can't carry them)

Deterministic: fixed seed, no wall clock.
"""
import csv
import os
import sqlite3

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")

DDL = """
CREATE TABLE queries (
    id INTEGER{pk},
    timestamp INTEGER,
    type INTEGER,
    status INTEGER,
    domain TEXT,
    client TEXT,
    forward TEXT,
    additional_info TEXT,
    reply_type INTEGER,
    reply_time REAL,
    dnssec INTEGER,
    list_id TEXT,
    ede INTEGER
)
"""

T0 = 1704067200  # 2024-01-01 UTC


def rows(n):
    # simple deterministic LCG so the fixture never depends on library RNGs
    state = 12345

    def rnd(m):
        nonlocal state
        state = (state * 1103515245 + 12345) % (1 << 31)
        return state % m

    out = []
    for i in range(1, n + 1):
        ts = T0 + i * 97 + rnd(50)
        typ = 1 + rnd(2)
        status = (1, 2, 3, 9)[rnd(4)]
        domain = f"www.domain{rnd(40)}.example"
        client = f"192.168.1.{1 + rnd(20)}"
        reply = None if rnd(10) == 0 else round(rnd(10000) / 10000.0, 4)
        out.append((i, ts, typ, status, domain, client, None, None,
                    rnd(5), reply, rnd(2), None, None))
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    data = rows(3000)

    main_db = os.path.join(OUT, "ftl_fixture.db")
    if os.path.exists(main_db):
        os.remove(main_db)
    conn = sqlite3.connect(main_db)
    conn.execute(DDL.format(pk=""))
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")", data)
    # overflow row: payload far beyond one 4096-byte page
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9001, T0 + 999999, 1, 2, "x" * 6000, "192.168.1.99", None, None,
         0, 0.5, 0, None, None))
    # invalid-UTF-8 domain: a blob value in the TEXT column (SQLite keeps
    # the blob type) — readers must decode with replacement (db.py:17)
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9002, T0 + 999998, 1, 2, sqlite3.Binary(b"A\xc3\xffB"), "192.168.1.98",
         None, None, 0, 0.25, 0, None, None))
    # wide-integer serial types (int48/int64) and a negative REAL — the
    # sign-extension / 6- and 8-byte decode paths
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9003, 2 ** 45, 1, 2, "wide48.example", "192.168.1.97", None, None,
         0, -0.5, 0, None, None))
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9004, 2 ** 61, 1, 2, "wide64.example", "192.168.1.96", None, None,
         0, None, 0, None, None))
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9005, -12345, 1, 2, "negative-ts.example", "192.168.1.95", None, None,
         0, 1.25, 0, None, None))
    conn.commit()
    conn.close()

    pk_db = os.path.join(OUT, "ftl_fixture_pk.db")
    if os.path.exists(pk_db):
        os.remove(pk_db)
    conn = sqlite3.connect(pk_db)
    conn.execute(DDL.format(pk=" PRIMARY KEY"))
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")",
                     data[:200])
    conn.commit()
    conn.close()

    empty_db = os.path.join(OUT, "ftl_fixture_empty.db")
    if os.path.exists(empty_db):
        os.remove(empty_db)
    conn = sqlite3.connect(empty_db)
    conn.execute(DDL.format(pk=""))
    conn.commit()
    conn.close()

    # WITHOUT ROWID twin of the main fixture's first 3000 rows: composite
    # table-level PK (domain, id) puts a TEXT column FIRST in the stored
    # record (index key order), so readers must permute storage order back
    # to declared order; 3000 rows force a multi-level index b-tree whose
    # INTERIOR pages carry full records (true B-tree) -- a reader that
    # only scans leaves silently drops those rows
    wr_db = os.path.join(OUT, "ftl_fixture_wr.db")
    if os.path.exists(wr_db):
        os.remove(wr_db)
    conn = sqlite3.connect(wr_db)
    conn.execute(DDL.format(pk="").rstrip().rstrip(")")
                 + ", PRIMARY KEY (domain, id)\n) WITHOUT ROWID")
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")", data)
    conn.commit()
    conn.close()

    # UTF-16le twin of the pk fixture's rows (+ one non-ASCII domain):
    # every TEXT value -- including sqlite_master's schema sql -- is
    # stored UTF-16; readers must decode via the header-declared encoding
    utf16_db = os.path.join(OUT, "ftl_fixture_utf16.db")
    if os.path.exists(utf16_db):
        os.remove(utf16_db)
    conn = sqlite3.connect(utf16_db)
    conn.execute("PRAGMA encoding = 'UTF-16le'")
    conn.execute(DDL.format(pk=""))
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")",
                     data[:200])
    conn.execute(
        "INSERT INTO queries VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        (9010, T0 + 500000, 1, 2, "www.bücher-中文-\U0001f409.example",
         "192.168.1.94", None, None, 0, 0.75, 0, None, None))
    conn.commit()
    conn.close()

    # WAL fixture: a database frozen mid-WAL — first 500 rows checkpointed
    # into the main file, the next 300 committed ONLY into the -wal
    # sidecar (copied out while the connection is still open, before the
    # close-time auto-checkpoint). ftl_fixture_wal_ckpt.db is the
    # checkpointed twin: same logical content, WAL folded in — the reader
    # must produce identical rows from both.
    import shutil
    work = os.path.join(OUT, "_wal_work.db")
    for p in (work, work + "-wal", work + "-shm"):
        if os.path.exists(p):
            os.remove(p)
    conn = sqlite3.connect(work)
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute("PRAGMA wal_autocheckpoint=0")
    conn.execute(DDL.format(pk=""))
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")",
                     data[:500])
    conn.commit()
    conn.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    conn.executemany("INSERT INTO queries VALUES (" + ",".join("?" * 13) + ")",
                     data[500:800])
    conn.commit()
    wal_db = os.path.join(OUT, "ftl_fixture_wal.db")
    shutil.copy(work, wal_db)
    shutil.copy(work + "-wal", wal_db + "-wal")
    conn.close()  # auto-checkpoints the work copy → the folded-in twin
    shutil.copy(work, os.path.join(OUT, "ftl_fixture_wal_ckpt.db"))
    for p in (work, work + "-wal", work + "-shm"):
        if os.path.exists(p):
            os.remove(p)

    with open(os.path.join(OUT, "ftl_fixture.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "timestamp", "type", "status", "domain", "client",
                    "reply_time"])
        for r in data:
            w.writerow([r[0], r[1], r[2], r[3], r[4], r[5],
                        "" if r[9] is None else r[9]])
    print(f"fixtures written to {OUT}")


if __name__ == "__main__":
    main()
