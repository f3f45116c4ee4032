"""Local stand-in for the driver's duckdb-oracle gate: runs every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compares row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def normalize(df_pandas):
    import pandas as pd
    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import subprocess
    import duckdb
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # stamp provenance so a committed CORRECTNESS_FULL artifact is
    # verifiably tied to the code state it was produced from
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=repo).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"],
                           capture_output=True, text=True,
                           cwd=repo).stdout.strip()
    print(f"git {sha}{' (dirty)' if dirty else ''}  sf_dir={SF_DIR}  "
          f"{time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}")

    # validate any name filter BEFORE the SparkSession boots — the
    # query/oracle dicts are just callables and need no session, so a
    # typo costs zero seconds, not a JVM boot (round-11 review
    # finding); an all-unknown filter must also never print a vacuous
    # N/N pass
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"ERROR: unknown query name(s): {sorted(unknown)}; "
                  f"known: {sorted(qs)[:10]}...")
            return 1

    spark = (SparkSession.builder.master("local[8]")
             .appName("correctness")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"okay {name}: rows-only check, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            fails.append(name)
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            fails.append(name)
            continue
        if not s.equals(o):
            diff = (s != o).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(s)} rows differ; first:")
            print("  spark:", s[diff].head(2).to_dict("records"))
            print("  duck :", o[diff].head(2).to_dict("records"))
            fails.append(name)
            continue
        print(f"PASS {name}: {len(s)} rows match ({time.time()-t0:.1f}s)")
    if only:
        ran = len([n for n in qs if n in only])
        print(f"\n{ran - len(fails)}/{ran} pass (filtered; "
              f"{len(qs)} total)")
        return 1 if fails else 0
    print(f"\n{len(qs) - len(fails)}/{len(qs)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
