#!/usr/bin/env python3
"""Local oracle gate: compare graft.Verify parquet dumps against the DuckDB
oracle SQL (oracle_sql.json), mirroring the driver's rows/schema/hash check.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

The Verify main must have been run first:
  sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(v):
    """Canonicalize a cell for multiset comparison (float noise-free)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trip: 17 significant digits, stable across engines for
        # identical doubles; catches any real numeric divergence
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_multiset(rows):
    return sorted("\x01".join(canon(c) for c in r) for r in rows)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name in sorted(oracle):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"{name}: MISSING spark output")
            n_bad += 1
            continue
        srel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols, srows = srel.columns, srel.fetchall()
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
        schema_ok = [c.lower() for c in scols] == [c.lower() for c in ocols]
        sm, om = rows_multiset(srows), rows_multiset(orows)
        rows_ok = len(srows) == len(orows)
        hash_ok = sm == om
        status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            n_bad += 1
            print(f"{name}: {status} rows {len(srows)}/{len(orows)} "
                  f"schema_ok={schema_ok} hash_ok={hash_ok}")
            if not schema_ok:
                print(f"  spark cols:  {scols}\n  oracle cols: {ocols}")
            if not hash_ok and rows_ok:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                for a, b in diff:
                    print(f"  spark:  {a[:160]}\n  oracle: {b[:160]}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
