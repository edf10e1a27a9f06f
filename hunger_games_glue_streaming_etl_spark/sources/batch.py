"""Batch readers (reference ops A3/A4: CSV scan, KV-store scan → DataFrame).

The reference reads its dims with header-only CSV inference
(``script/TributeStreamingJob.py:85-86``) and a Glue DynamicFrame DynamoDB
scan (``:90-97``).  Semantically both are tiny dimension tables; the engine
standardizes on Parquet/CSV/JSON readers with *explicit* schemas — inference
is a correctness hazard (all-string CSV columns compared numerically in the
reference) and a scale hazard (inference is an extra full pass over data).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None, multiline: bool = False
) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# DataFrame handles cached per live session: repeated spark.read.parquet on
# the same path re-lists files and re-reads footers (~100ms/query of pure
# overhead in a multi-query run); the logical plan is immutable, so reuse is
# free.  WeakKey so a stopped session's entries are collectable.
_table_cache: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver synthetic table (TESTDATA.md) as a DataFrame."""
    per_session = _table_cache.setdefault(spark, {})
    key = (sf_dir, name)
    if key not in per_session:
        per_session[key] = _read_table(spark, sf_dir, name)
    return per_session[key]


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``events.ts`` is written as parquet TIMESTAMP(NANOS).  How Spark
    surfaces that changed across versions, so normalize by observed type:

    * Spark ≤4.0 rejects it in the vectorized reader unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
      column arrives as a raw nanosecond LONG — integer-divide to µs
      (float division loses µs precision on ~1.7e18 ns values) and wrap
      with ``timestamp_micros``.
    * Spark 4.1+ ignores that conf and reads the column natively as
      TIMESTAMP_NTZ already truncated to µs.  Reinterpreting the NTZ wall
      time as a UTC instant (``to_utc_timestamp(ts, 'UTC')``) is
      timezone-independent and lands on the exact same µs-since-epoch
      values DuckDB produces (its nanos read also floor-truncates to µs).

    Either way the result is a microsecond ``TimestampType`` column whose
    internal µs equal DuckDB's, so oracle comparisons stay exact.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        df = fan_out(df)
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition a scan up to the cluster's parallelism when the source
    under-partitions it.

    The text/vector tables carry heavy *per-row* compute (md5 shingle
    hashing, 64-wide SimHash folds, 64-dim dot products), and the fixture
    parquet files are single row groups — Spark cannot split below
    row-group granularity no matter how small ``files.maxPartitionBytes``
    is, so without this every shuffle-free query over them runs serially
    on one core (measured: SimHash fingerprints 4.9 s serial → 0.6 s at
    32-way; the shuffle moves ~20 MB of text, which is noise next to the
    compute).  On a real cluster the sources arrive in many splits and
    this is a no-op — the gate only fires when scan parallelism is below
    ``defaultParallelism``.  All registered queries are partitioning-
    independent by construction (portable hashes, no rand(), unique
    window tiebreaks), so fanning out never changes results."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several synthetic tables at once; defaults to all of them."""
    wanted = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in wanted}
