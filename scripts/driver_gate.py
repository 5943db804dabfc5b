"""Driver-faithful correctness gate: Spark vs DuckDB at sf0.01.

Emulates the driver's canonicalizer more closely than tests/test_oracle.py:
both results go through pandas, are sorted by all columns (name order), and
are value-hashed with ``pd.util.hash_pandas_object`` — so dtype mismatches
(e.g. DuckDB HUGEINT → float64 vs Spark int64) and unhashable cells (array
columns) fail here exactly as they fail in the driver.

Usage: python scripts/driver_gate.py [query ...]   (default: all)
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as _dt

    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].isna().all():
            df[c] = pd.Series([""] * len(df), dtype=object)
        elif df[c].dtype == object:
            # Spark toPandas yields datetime.date objects; DuckDB yields
            # datetime64 — normalize both to datetime64[us].
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (_dt.date, _dt.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    # default local[8]/8 mirrors the driver's t2 box; sf1.0 certification
    # runs want the full machine (SPARK_GRAFT_GATE_CPUS=32 _PARTS=32).
    cpus = os.environ.get("SPARK_GRAFT_GATE_CPUS", "8")
    parts = os.environ.get("SPARK_GRAFT_GATE_PARTS", "8")
    # sf1.0 knobs: q-series outputs are full 6M-row projections, so the
    # local-mode JVM needs real heap and result headroom, and Arrow-batched
    # toPandas turns a multi-minute py4j row copy into seconds.  Defaults
    # keep the driver's exact t2 shape.
    driver_mem = os.environ.get("SPARK_GRAFT_GATE_DRIVER_MEM", "4g")
    arrow = os.environ.get("SPARK_GRAFT_GATE_ARROW", "false")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", arrow)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    names = sys.argv[1:] or sorted(entrymod.queries())
    oracles = entrymod.oracle_sql()
    failed = []
    for name in names:
        try:
            sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(oracles[name]).df()
            s, o = canon(sdf), canon(odf)
            ok_rows = len(s) == len(o)
            ok_cols = list(s.columns) == list(o.columns)
            ok_dtype = ok_cols and all(
                (s[c].dtype == o[c].dtype) or (s[c].dtype.kind == o[c].dtype.kind)
                for c in s.columns
            )
            ok_hash = (
                ok_rows
                and ok_cols
                and int(pd.util.hash_pandas_object(s, index=False).sum())
                == int(pd.util.hash_pandas_object(o, index=False).sum())
            )
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            print(
                f"{name}: {status} rows={len(s)}/{len(o)} cols={ok_cols} "
                f"dtypes={ok_dtype} hash={ok_hash}"
            )
            if status == "FAIL":
                failed.append(name)
                if not ok_dtype:
                    print("  spark dtypes:", dict(sdf.dtypes.astype(str)))
                    print("  oracle dtypes:", dict(odf.dtypes.astype(str)))
        except Exception as e:  # noqa: BLE001 — report like the driver's err field
            failed.append(name)
            print(f"{name}: ERR {type(e).__name__}: {e}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
