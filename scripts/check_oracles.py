"""Local rehearsal of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB ``oracle_sql()`` on the
same parquet dir, compare row count / schema / values (sorted columns).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

from catabra_pandas_spark.sources import TABLES  # noqa: E402


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(map(str.lower, spark_df.columns)) != sorted(map(str.lower, oracle_df.columns)):
        return [f"columns differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"]
    spark_df.columns = [c.lower() for c in spark_df.columns]
    oracle_df.columns = [c.lower() for c in oracle_df.columns]
    cols = sorted(spark_df.columns)
    a = spark_df[cols]
    b = oracle_df[cols]
    if len(a) != len(b):
        return [f"row count: spark={len(a)} oracle={len(b)}"]
    sort_cols = cols
    a = a.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    b = b.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    for c in cols:
        x, y = a[c], b[c]
        # the driver hashes VALUES+REPRESENTATION: equal values in different
        # dtypes (e.g. DuckDB HUGEINT surfacing as object, or int vs float)
        # red the row even when this value compare passes — r1's
        # group_intervals failed exactly this way
        kx, ky = x.dtype.kind, y.dtype.kind
        if kx != ky and not ({kx, ky} <= {"i", "u"}):
            problems.append(
                f"col {c}: dtype kinds differ ({x.dtype} vs {y.dtype}) (HASH RISK)")
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            x = pd.to_numeric(x, errors="coerce").astype(float)
            y = pd.to_numeric(y, errors="coerce").astype(float)
            # IEEE signed zero: 0.0 == -0.0 is True, but the driver hashes
            # the REPRESENTATION — DuckDB round() emits -0.0 for small
            # negatives where Spark's F.round emits 0.0 (r6's
            # resample_eav_custom_slope failed exactly this way)
            sz = (np.signbit(x.to_numpy()) != np.signbit(y.to_numpy())) & \
                 (x.to_numpy() == 0.0) & (y.to_numpy() == 0.0)
            if sz.any():
                problems.append(
                    f"col {c}: {int(sz.sum())} rows differ only in zero sign"
                    " (-0.0 vs 0.0) (HASH RISK)")
            exact = ((x == y) | (x.isna() & y.isna()))
            close = np.isclose(x, y, atol=1e-9, rtol=0) | (x.isna() & y.isna())
            if not exact.all():
                n_hash = int((~exact).sum())
                if close.all():
                    problems.append(f"col {c}: {n_hash} rows differ only in float ulps"
                                    " (HASH RISK)")
                else:
                    bad = (~close).idxmax()
                    problems.append(f"col {c}: VALUE MISMATCH e.g. row {bad}: "
                                    f"{x[bad]!r} vs {y[bad]!r} ({int((~close).sum())} rows)")
        else:
            if pd.api.types.is_bool_dtype(x) or pd.api.types.is_bool_dtype(y):
                x, y = x.astype("boolean"), y.astype("boolean")
            eq = (x == y) | (x.isna() & y.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(f"col {c}: VALUE MISMATCH e.g. row {bad}: "
                                f"{x[bad]!r} vs {y[bad]!r} ({int((~eq).sum())} rows)")
    return problems


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"    {p}")
            n_bad += 1
        else:
            print(f"[ok] {name}: {len(sdf)} rows match")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
