#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB (views named after
the testdata tables over <sfDir>/*.parquet), and compares:
  - row count
  - column names (sorted)
  - values: rows sorted by all columns, cell-by-cell (exact; floats via repr)
Exit code 0 iff every query matches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_key(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        out.append("|".join(canon(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = []
    n_checked = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        s_names = list(spark_rel.columns)
        s_types = [str(t) for t in spark_rel.types]
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows (no oracle)")
            continue
        n_checked += 1
        try:
            orel = con.sql(oracles[name])
            o_names = list(orel.columns)
            o_types = [str(t) for t in orel.types]
            o_rows = orel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(s_names) != sorted(o_names):
            failures.append((name, f"columns differ: spark={sorted(s_names)} oracle={sorted(o_names)}"))
            continue
        st = dict(zip(s_names, s_types))
        ot = dict(zip(o_names, o_types))
        tdiff = {c: (st[c], ot[c]) for c in st if st[c] != ot[c]}
        if tdiff:
            print(f"[type-warn] {name}: {tdiff}")
        if len(s_rows) != len(o_rows):
            failures.append((name, f"row count: spark={len(s_rows)} oracle={len(o_rows)}"))
            continue
        sk, ok = frame_key(s_names, s_rows), frame_key(o_names, o_rows)
        if sk != ok:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(sk, ok)) if a != b)
            failures.append((name, f"value mismatch at sorted row {bad[0]}:\n  spark : {bad[1][:300]}\n  oracle: {bad[2][:300]}"))
            continue
        print(f"[OK] {name}: {len(s_rows)} rows")
    print(f"\n{n_checked} oracle-checked, {len(failures)} failures")
    for name, msg in failures:
        print(f"[FAIL] {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
