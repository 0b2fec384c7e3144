"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Usage:
    python tools/oracle_check.py [query ...]      # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/oracle_check.py

For each registered query: run the Spark DataFrame and the DuckDB oracle
SQL on the same parquet tables, sort columns by name, sort rows, and
compare row counts, dtypes (after arrow normalization) and values.
Prints one line per query: OK / HASH-RED (with the first differing cell)
/ NO_ORACLE / ERR.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def _canon_dtype(s: pd.Series) -> str:
    import numpy as np

    if s.dtype == object:
        for v in s:
            if v is not None and not (isinstance(v, float) and pd.isna(v)):
                return type(v).__name__
        return "empty"
    return str(s.dtype)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entry_mod
    from ffp_spark.pipeline import build_session

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_red = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = _norm(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"{name}: ERR spark: {e}")
            n_red += 1
            continue
        if name not in oracles:
            print(f"{name}: NO_ORACLE ({len(sdf)} rows)")
            continue
        try:
            odf = _norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ERR oracle: {e}")
            n_red += 1
            continue
        if len(sdf) != len(odf):
            print(f"{name}: ROWS-RED spark={len(sdf)} oracle={len(odf)}")
            n_red += 1
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"{name}: SCHEMA-RED spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_red += 1
            continue
        bad = None
        for c in sdf.columns:
            st, ot = _canon_dtype(sdf[c]), _canon_dtype(odf[c])
            if st != ot and {st, ot} - {"empty"}:
                # int64 vs Int64 etc — compare loosely by kind
                kinds = {st.lower().rstrip("0123456789"), ot.lower().rstrip("0123456789")}
                if kinds not in ({"int"}, {"float"}, {"str"}, {"bool"}):
                    bad = f"dtype[{c}]: spark={st} oracle={ot}"
                    break
            sv, ov = sdf[c], odf[c]
            try:
                eq = (sv.isna() & ov.isna()) | (sv == ov)
            except Exception:
                eq = sv.astype(str) == ov.astype(str)
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                bad = f"value[{c}][row {i}]: spark={sv[i]!r} oracle={ov[i]!r}"
                break
        if bad:
            print(f"{name}: HASH-RED {bad}")
            n_red += 1
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    spark.stop()
    sys.exit(1 if n_red else 0)


if __name__ == "__main__":
    main()
