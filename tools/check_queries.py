"""Check a SUBSET of registry entries vs their DuckDB oracles — the fast
iteration loop while building a new entry (driver_sim runs the full
contract; this runs just the named queries, at one or more sf dirs).

Usage: python tools/check_queries.py q1 q2 ... [--sf /root/testdata/sf0.01]
       (repeat --sf for multiple scales; default sf0.001 AND sf0.01 —
       the non-vacuity rule wants row counts at both).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", action="append", default=None)
    args = ap.parse_args()
    sf_dirs = args.sf or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in args.names:
            if name not in qs:
                print(f"{name}: NOT REGISTERED")
                fails.append(name)
                continue
            t0 = time.time()
            sdf = qs[name](spark, sf).toPandas()
            dt = time.time() - t0
            if name not in osql:
                print(f"[{sf}] {name}: rows-only, {len(sdf)} rows ({dt:.1f}s)")
                if len(sdf) == 0:
                    fails.append(f"{name}@{sf}:vacuous")
                continue
            odf = con.execute(osql[name]).fetchdf()
            cols = sorted(sdf.columns)
            ok_cols = cols == sorted(odf.columns)
            ok_rows = len(sdf) == len(odf)
            ok_vals = False
            if ok_cols and ok_rows and len(sdf) > 0:
                s = sdf[cols].astype(str).apply("|".join, axis=1).sort_values().tolist()
                o = odf[cols].astype(str).apply("|".join, axis=1).sort_values().tolist()
                ok_vals = s == o
                if not ok_vals:
                    diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
                    print("  first diffs:", diff)
            vacuous = len(sdf) == 0
            ok = ok_cols and ok_rows and ok_vals and not vacuous
            status = "OK" if ok else (
                "VACUOUS" if vacuous and ok_cols and ok_rows else "MISMATCH"
            )
            if not ok:
                fails.append(f"{name}@{sf}")
                if not ok_cols:
                    print(f"  cols spark={cols} oracle={sorted(odf.columns)}")
            print(
                f"[{sf}] {name}: {status} "
                f"(rows spark={len(sdf)} oracle={len(odf)}, {dt:.1f}s)"
            )
    print("RESULT:", "ALL OK" if not fails else f"FAILS: {fails}")
    return 0 if not fails else 1


if __name__ == "__main__":
    raise SystemExit(main())
