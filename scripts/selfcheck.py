#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Emulates the driver's compare pipeline as closely as we can observe it:
  - Spark side read with pandas/pyarrow (pd.read_parquet) — decimals come
    back as decimal.Decimal objects, timestamps keep their parquet unit.
  - Oracle side read with duckdb .df() — DECIMAL becomes float64.
  - Columns sorted by name, every cell stringified, rows sorted, compared.
This catches the dtype-level drift the old DuckDB-level compare missed
(e.g. Decimal('12.30') vs 12.3 stringify differently → driver hash
mismatch).  Rows-only queries (no oracle) are still sorted+hashed to prove
the driver can process them (arrays/structs in cells would crash it).
Exit code 0 iff every query matches and every rows-only dump is hashable.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame_key(df):
    """Driver-style canonical form: columns sorted by name, cells
    stringified, rows sorted.  Explicitly rejects nested cells
    (np.ndarray/list/dict/set): astype(str) would happily stringify them,
    but the real driver sorts RAW cells and crashes — so the probe must
    raise, not silently succeed."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(
                lambda v: isinstance(v, (list, dict, set, tuple))
                or type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0)
            if bad.any():
                raise TypeError(
                    f"column {c!r} contains nested (array/struct) cells — "
                    "the driver's sort/hash would crash on these")
    if len(df) == 0:
        return []
    # Stringify COLUMN BY COLUMN, not df.astype(str): pandas formats
    # datetimes per consolidated block, so a whole-frame astype renders
    # an all-midnight DATE column with " 00:00:00" whenever ANY datetime
    # column in the frame carries a time — but only on the side where
    # the date arrived as datetime64 (duckdb .df()), not where it stayed
    # datetime.date (pd.read_parquet of date32). That false-diffed
    # lobby_disclosure_latest (driver hash: pass). Per-column astype
    # keeps the all-midnight date-only rendering both sides agree on.
    cols = [df[c].astype(str) for c in df.columns]
    rows = ["|".join(vals) for vals in zip(*cols)]
    return sorted(rows)


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
        sdf = pd.read_parquet(qdir)
        if name not in oracles:
            # still prove the driver can sort/hash it (no array cells etc.)
            try:
                frame_key(sdf)
                print(f"[rows-only] {name}: {len(sdf)} rows (no oracle)")
            except Exception as e:
                failures.append((name, f"rows-only dump not hashable: {e}"))
            continue
        n_checked += 1
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"))
            continue
        sd = {c: str(sdf[c].dtype) for c in sdf.columns}
        od = {c: str(odf[c].dtype) for c in odf.columns}
        tdiff = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
        if tdiff:
            print(f"[dtype-warn] {name}: {tdiff}")
        if len(sdf) != len(odf):
            failures.append((name, f"row count: spark={len(sdf)} oracle={len(odf)}"))
            continue
        try:
            sk, ok = frame_key(sdf), frame_key(odf)
        except Exception as e:
            failures.append((name, f"not hashable: {e}"))
            continue
        if sk != ok:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(sk, ok)) if a != b)
            failures.append((name, f"value mismatch at sorted row {bad[0]}:\n  spark : {bad[1][:300]}\n  oracle: {bad[2][:300]}"))
            continue
        print(f"[OK] {name}: {len(sdf)} rows")
    print(f"\n{n_checked} oracle-checked, {len(failures)} failures")
    for name, msg in failures:
        print(f"[FAIL] {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
