"""Simulate the driver: vanilla session, entry() smoke, queries vs oracle at sf0.01."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")

# env-gate probes (VERDICT r5 #9): the round the image gains these deps,
# the gated entries (Delta MERGE, transformWithStateInPandas) activate —
# this line makes the gate state visible in every round's session log
for mod in ("google.protobuf.descriptor", "delta"):
    try:
        __import__(mod)
        print(f"PROBE: {mod} AVAILABLE — env-gated entries should be live")
    except ImportError:
        print(f"PROBE: {mod} absent (env-gated entries stay gated)")
from hunger_games_glue_streaming_etl_spark.plans.sources_sql import (
    _avro_runtime_available,
    _protobuf_runtime_available,
)
print(
    "PROBE: spark-avro jar "
    + ("AVAILABLE — scan_avro_roundtrip should be live"
       if _avro_runtime_available() else "absent (scan_avro_roundtrip stays gated)")
)
print(
    "PROBE: spark-protobuf jar "
    + ("AVAILABLE — scan_protobuf_messagebus should be live"
       if _protobuf_runtime_available()
       else "absent (scan_protobuf_messagebus stays gated)")
)

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={df.schema.simpleString()}")
print("sample:", rows[:2])

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, osql = E.queries(), E.oracle_sql()
fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in osql:
        print(f"{name}: rows-only, {len(sdf)} rows"); continue
    odf = con.execute(osql[name]).fetchdf()
    cols = sorted(sdf.columns)
    ok_cols = cols == sorted(odf.columns)
    ok_rows = len(sdf) == len(odf)
    ok_vals = len(sdf) == 0
    if ok_cols and ok_rows and len(sdf) > 0:
        s = sdf[cols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().tolist()
        o = odf[cols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().tolist()
        ok_vals = s == o
    status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
    if status != "OK": fails.append(name)
    print(f"{name}: {status} (rows spark={len(sdf)} oracle={len(odf)})")
print("RESULT:", "ALL OK" if not fails else f"FAILS: {fails}")
