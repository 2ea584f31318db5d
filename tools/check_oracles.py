"""Driver-sim: run every __spark_entry__ query at sf0.01 and compare with its
DuckDB oracle — row count, column names, and order-insensitive value
multiset. Usage: python tools/check_oracles.py [sf_dir] [only_query ...]"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> tuple:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(str(x) for x in v) + "]"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return tuple(cols), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pcompress_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    from pcompress_spark.cache import release_persisted

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {str(e)[:300]}")
            continue
        finally:
            # result fully consumed by toPandas — drop the query's tracked
            # persists so 70 queries don't accumulate 70 cache entries
            release_persisted()
        if name not in oracles:
            print(f"· {name}: rows-only check, {len(spark_pdf)} rows "
                  f"cols={list(spark_pdf.columns)}")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {str(e)[:300]}")
            continue
        sc, sr = canon(spark_pdf)
        dc, dr = canon(duck_pdf)
        if sc != dc:
            failures.append(name)
            print(f"✗ {name}: SCHEMA spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"✗ {name}: ROWS spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"✗ {name}: VALUES differ, first diffs: {diff}")
        else:
            print(f"✓ {name}: {len(sr)} rows match exactly")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
