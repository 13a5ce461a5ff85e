"""Local mimic of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin, compare row count + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(map(repr, out))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            # Fetch via Arrow (like the driver): DuckDB HUGEINT surfaces as
            # decimal128, so an un-cast sum() mismatches Spark's int64 here
            # even though fetchall() would return plain Python ints.
            tbl = rel.arrow()
            duck_rows = [
                tuple(d[c] for c in duck_cols) for d in tbl.to_pylist()
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        sc, sv = norm_rows(spark_cols, [tuple(r) for r in spark_rows])
        dc, dv = norm_rows(duck_cols, duck_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sv)} duck={len(dv)}")
            _show_diff(sv, dv)
        elif sv != dv:
            failures.append(name)
            print(f"FAIL {name}: values differ ({len(sv)} rows)")
            _show_diff(sv, dv)
        else:
            print(f"OK   {name}: {len(sv)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


def _show_diff(sv, dv, n=3):
    s, d = set(sv), set(dv)
    for r in list(s - d)[:n]:
        print(f"  spark-only: {r}")
    for r in list(d - s)[:n]:
        print(f"  duck-only:  {r}")


if __name__ == "__main__":
    main()
