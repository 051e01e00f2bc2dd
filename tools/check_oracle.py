#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sort columns by name, and compare values exactly (with a row-sorted
fallback so ordering differences are distinguishable from value
differences). Reports per-query PASS/FAIL with diagnostics.
"""
import decimal
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
            continue
        if len(spark_df) == 0:
            print(f"WARN {name}: 0 rows on both sides (vacuous pass)")
            continue
        # The driver's hasher canonicalizes a Spark Decimal('1.20') and a
        # DuckDB float 1.2 DIFFERENTLY whenever a value has trailing zeros
        # (round-14 q222/q225/q226/q228 failure class). Replicate the
        # driver's strictness: any Decimal-valued Spark output column is a
        # hard FAIL here, regardless of value equality — emit BIGINT
        # fixed-point lanes instead (cents / 1e-4 units, the q227 idiom).
        dec_cols = [c for c in spark_df.columns
                    if spark_df[c].map(lambda v: isinstance(v, decimal.Decimal)).any()]
        if dec_cols:
            print(f"FAIL {name}: DecimalType output column(s) {dec_cols} — "
                  "driver hash canonicalization differs on trailing zeros; "
                  "emit BIGINT fixed-point lanes")
            failures += 1
            continue
        # normalize dtypes: compare as python objects; timestamps → isoformat
        s, d = spark_df.copy(), duck_df.copy()
        for c in s.columns:
            if str(s[c].dtype).startswith("datetime") or str(d[c].dtype).startswith("datetime"):
                s[c] = s[c].astype("datetime64[us]").astype(str)
                d[c] = d[c].astype("datetime64[us]").astype(str)
        try:
            if s.equals(d):
                print(f"PASS {name} ({len(s)} rows)")
                continue
        except Exception:
            pass
        # element-wise with tolerance reporting
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                # a float lane on one side only is a representational split
                # the driver's hasher will red even at equal values
                if sv.dtype.kind != dv.dtype.kind:
                    bad.append((c, f"dtype split {sv.dtype} vs {dv.dtype} "
                                   "(driver hash mismatch even at equal values)"))
                    continue
                diff = (sv.astype(float) - dv.astype(float)).abs()
                if diff.max() > 0:
                    bad.append((c, f"max|Δ|={diff.max():.3e} at row {int(diff.idxmax())}"))
            else:
                neq = sv.astype(object).ne(dv.astype(object))
                if neq.any():
                    i = int(neq.idxmax())
                    bad.append((c, f"row {i}: {sv.iloc[i]!r} vs {dv.iloc[i]!r} ({int(neq.sum())} rows differ)"))
        if not bad:
            print(f"PASS {name} ({len(s)} rows, dtype-normalized)")
        else:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in bad[:4]))
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
