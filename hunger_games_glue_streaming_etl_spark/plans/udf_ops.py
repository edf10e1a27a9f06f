"""Python-UDF surface (SURVEY.md §2C: the reference's only user-code path is
the per-row ``foreach`` sink; the engine's sanctioned Python paths are
Arrow-vectorized).

Two demonstrations, both oracle-checked:

* a scalar ``pandas_udf`` (Arrow batches, numpy math — the 10-100× path over
  row-at-a-time UDFs);
* a Python UDTF (table function, one→many row expansion).

Determinism: the z-score constants (mean/std) are aggregated once and
ROUNDed before entering the UDF, so the per-row arithmetic is pure
float ops on identical inputs in both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..sources.batch import load_table
from .registry import register


@pandas_udf(T.DoubleType())
def _zscore(x: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    return (x - mean) / std


@register(
    "udf_pandas_zscore",
    oracle="""
    WITH stats AS (
        SELECT ROUND(AVG(o_totalprice), 6) AS m, ROUND(STDDEV_SAMP(o_totalprice), 6) AS s
        FROM orders
    )
    SELECT o_orderkey, ROUND((o_totalprice - m) / s, 6) AS zscore
    FROM orders CROSS JOIN stats
    """,
)
def udf_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: per-order z-score against rounded global
    moments (one agg + broadcast of a 1-row stats frame + Arrow-batched
    scalar UDF — zero Python row loops)."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.round(F.avg("o_totalprice"), 6).alias("m"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("s"),
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .select(
            "o_orderkey",
            F.round(_zscore("o_totalprice", "m", "s"), 6).alias("zscore"),
        )
    )


@udtf(returnType="pos int, token string", useArrow=True)
class _TokenPositions:
    """UDTF: explode a (pre-tokenized) prefix into (position, token) rows.
    Arrow-evaluated (``useArrow=True``) so the plan is ``ArrowEvalPythonUDTF``
    — batched transfer, not the row-at-a-time ``BatchEvalPythonUDTF`` the
    plan audit forbids."""

    def eval(self, tokens: list):  # noqa: ANN001 — Spark passes the array value
        if tokens:
            for i, t in enumerate(tokens[:5]):
                yield i, t


@register(
    "udtf_token_positions",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[1:5] AS toks
        FROM documents
    ),
    idx AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token FROM idx
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over the token array (lateral one→many expansion).
    Equivalent to posexplode — registered through the UDTF surface to pin
    the table-function API; the oracle uses UNNEST WITH ORDINALITY."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.slice(tokens("text"), 1, 5).alias("toks"))
    view = "udtf_toks_src"
    toks.createOrReplaceTempView(view)
    spark.udtf.register("token_positions", _TokenPositions)
    return spark.sql(
        f"""
        SELECT doc_id, t.pos, t.token
        FROM {view}, LATERAL token_positions(toks) AS t
        """
    )


def _round_half_up6(s: pd.Series) -> pd.Series:
    """SQL-style ROUND (half away from zero) at 6 dp — numpy's .round is
    half-to-even, which disagrees with the oracle exactly when a quotient
    lands on a decimal tie (this data's dyadic values make that real)."""
    import numpy as np

    return np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6


def _per_user_robust_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    # one quantile call = one sort per group; three separate calls sorted
    # the group three times (measured ~0.5 s of the 3.6 s entry at sf0.1 —
    # the remaining ~2.3 s is the irreducible grouped-map Arrow boundary,
    # r03 VERDICT #9).  Same linear interpolation, bit-identical values.
    q1, med, q3 = pdf["value"].quantile([0.25, 0.5, 0.75])
    out = pdf[["user_id", "event_id"]].copy()
    out["robust_z"] = _round_half_up6((pdf["value"] - med) / (q3 - q1))
    return out


def _per_slab_robust_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    # each Arrow group carries a ~32-user SLAB; split by the fine key
    # in-kernel and apply the identical per-user function — same values,
    # 1/32 of the per-GROUP Arrow boundary crossings (the r11 cogroup
    # slab lesson applied to grouped-map: the boundary cost is per group,
    # not per row, and 1500 single-user groups paid 1500 crossings for
    # microseconds of quantile work each)
    return pd.concat(
        [
            _per_user_robust_scale(g)
            for _, g in pdf.groupby("user_id", sort=False)
        ],
        ignore_index=True,
    )


@register(
    "udf_grouped_map_normalize",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               quantile_cont(value, 0.5) AS med,
               quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, ROUND((e.value - med) / iqr, 6) AS robust_z
    FROM events e JOIN stats USING (user_id)
    """,
)
def udf_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-user robust scaling
    ((x − median) / IQR) inside each group's pandas frame — the per-entity
    model-scoring shape.

    Median/IQR, not mean/stddev, deliberately: order statistics involve no
    summation, so pandas and the SQL oracle derive bit-identical constants.
    Mean-based constants proved un-oracle-able on this data — 2-decimal
    values with power-of-2 group sizes put group means *exactly* on decimal
    rounding boundaries, where the engines' 1e-12 summation differences
    flip the tie (observed at sf0.01).

    The grouped-map key is COARSENED to ~32-user slabs
    (``user_id div 32``; raw-key units, so every SF ships the same
    users-per-boundary) and the kernel splits by the fine key with a
    pandas groupby applying the IDENTICAL per-user function — the r11
    slab rule: per-user groups are tiny (~100 rows), so the per-GROUP
    Arrow boundary dominated the entry (identity kernel = 2.3 s of the
    3.5 s wall at sf0.1, r04 measurement); slabs divide the boundary
    count by 32 while the per-user arithmetic — and therefore every
    output value — is unchanged."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("__slab", F.floor(F.col("user_id") / 32))
        .groupBy("__slab")
        .applyInPandas(
            _per_slab_robust_scale,
            schema="user_id long, event_id long, robust_z double",
        )
    )


# NB: pass a DataType object, not a DDL string — string return types are
# parsed through the active session, which doesn't exist yet at import
@pandas_udf(T.DoubleType())
def _median_udaf(v: pd.Series) -> float:
    """Grouped-agg pandas UDAF (whole group's Series → one scalar)."""
    import numpy as np

    return float(np.median(v))


@register(
    "udaf_grouped_agg_median",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE via a grouped-agg pandas_udf: per-group
    median price computed in numpy over each group's Arrow batch — the
    UDAF leg of the UDF surface (scalar pandas_udf, grouped-map, UDTF,
    and stateful already covered).  Median, not mean, so the oracle's
    quantile_cont derives the bit-identical constant (np.median's
    midpoint average is the same IEEE op in both engines); rounded at
    4 dp like the percentile queries."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_median_udaf("l_extendedprice"), 4).alias("median_price")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT (o_orderkey * 31 + o_custkey) % 97 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_orderkey) AS min_key
    FROM orders GROUP BY 1
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy Python surface below the pandas
    tier: batches arrive as raw ``pyarrow.RecordBatch`` (no pandas
    conversion cost, no index semantics), the right lane for columnar
    kernels that speak Arrow natively (tokenizers, Arrow-compute, FFI
    codecs).  The kernel derives an integer bucket with ``pyarrow.
    compute`` only — the whole Python stage is Arrow-vectorized, and
    the SQL aggregate on top proves the stage composes with ordinary
    Catalyst plans.  Closed-form integer output, hash-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(batches):
        for batch in batches:
            k = batch.column("o_orderkey")
            c = batch.column("o_custkey")
            bucket = pc.add(
                pc.multiply(k, pa.scalar(31, pa.int64())), c
            )
            bucket = pc.subtract(
                bucket,
                pc.multiply(
                    pc.divide(bucket, pa.scalar(97, pa.int64())),
                    pa.scalar(97, pa.int64()),
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [k, bucket], names=["o_orderkey", "bucket"]
            )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    mapped = orders.mapInArrow(bucketize, "o_orderkey long, bucket long")
    return mapped.groupBy("bucket").agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
    )


@register(
    "udf_cogrouped_orders_profile",
    oracle="""
    SELECT c.c_custkey,
           CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(o.key_sum, 0) AS BIGINT) AS order_key_sum
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_orderkey) AS key_sum
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 10 = 3
    """,
)
def udf_cogrouped_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map (``groupBy().cogroup().applyInPandas``) — the
    two-sided Arrow UDF surface: for each customer key, the kernel
    receives the customer's rows AND that customer's orders as two
    pandas frames in one call (either side possibly empty — customers
    without orders must still emit, which the LEFT JOIN oracle pins).
    The modular key filter keeps the fixture's group count bounded; the
    kernel itself is pure integer arithmetic.  Scale shape: cogroup is
    ONE co-partitioned shuffle of both sides on the key — the same
    exchange a join would pay — with the per-key logic in an Arrow
    batch, the escape hatch for merge logic SQL can't express (custom
    as-of rules, per-entity reconciliation).

    The key predicate is pushed to BOTH sides before the cogroup: a
    cogroup invokes the kernel for every key present in EITHER input, so
    filtering only the customer side still shipped ALL orders keys into
    the exchange and paid the per-group Arrow boundary for the ~90% of
    groups whose customer frame was empty — measured 38.3 s at sf0.1 vs
    3.4 s with the predicate mirrored (the boundary cost is per GROUP,
    not per row — the round-4 small-groups lesson applied to cogroup).

    The cogroup key is COARSENED to batch ~32 customers per Arrow group
    (``c_custkey DIV 320``; filtered keys are 10 apart), and the kernel
    splits by the fine key with a vectorized pandas groupby+merge.  The
    per-GROUP boundary is the dominant cost when groups are tiny —
    1500 single-key groups paid 1500 boundary crossings for microseconds
    of work each (r10 5× scale-bench: wall grew 4.29× with group count).
    Batching divides the boundary count by the batch factor while the
    in-kernel work stays vectorized, so wall tracks ROWS, not keys —
    the scale-safe shape for per-entity kernels over high-cardinality
    keys.  The batch factor (320 raw-key units) is corpus-independent:
    at any SF each Arrow call carries the same ~32-key slab."""
    import pandas as pd

    def profile(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            # order-only coarse groups (none after the mirrored predicate,
            # but the contract requires handling either side empty)
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series([], dtype="int64"),
                    "nationkey": pd.Series([], dtype="int64"),
                    "n_orders": pd.Series([], dtype="int64"),
                    "order_key_sum": pd.Series([], dtype="int64"),
                }
            )
        out = pd.DataFrame(
            {
                "c_custkey": cust["c_custkey"].astype("int64"),
                "nationkey": cust["c_nationkey"].astype("int64"),
            }
        )
        if len(orders):
            per_key = (
                orders.groupby("o_custkey")["o_orderkey"]
                .agg(n_orders="count", order_key_sum="sum")
                .reset_index()
            )
            out = out.merge(
                per_key, left_on="c_custkey", right_on="o_custkey", how="left"
            ).drop(columns="o_custkey")
            out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
            out["order_key_sum"] = out["order_key_sum"].fillna(0).astype("int64")
        else:
            out["n_orders"] = pd.Series(0, index=out.index, dtype="int64")
            out["order_key_sum"] = pd.Series(0, index=out.index, dtype="int64")
        return out

    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 3)
        .select("c_custkey", "c_nationkey")
        .withColumn("batch_key", F.floor(F.col("c_custkey") / 320))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 3)
        .select("o_custkey", "o_orderkey")
        .withColumn("batch_key", F.floor(F.col("o_custkey") / 320))
    )
    return (
        customer.groupBy("batch_key")
        .cogroup(orders.groupBy("batch_key"))
        .applyInPandas(
            profile,
            "c_custkey long, nationkey long, n_orders long, order_key_sum long",
        )
    )


@register(
    "udf_grouped_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           MIN(l_extendedprice) AS min_price
    FROM lineitem GROUP BY 1
    """,
)
def udf_grouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInArrow`` — the raw-Arrow sibling of
    ``applyInPandas`` (whole group arrives as ONE ``pyarrow.Table``, no
    pandas conversion), completing the Arrow UDF quartet alongside
    ``mapInArrow``, cogrouped ``applyInPandas``, and the pandas
    grouped-map.  The kernel casts the integer-valued double quantities
    to int64 BEFORE summing (Arrow's safe cast throws on any lossy value,
    guarding the exactness assumption; the BIGINT sum is then
    order-independent), counts rows, and takes an arithmetic-free MIN —
    all hash-exact.  Scale shape: one shuffle on the group key; groups
    stream through as Arrow batches with constant per-group output."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: "pa.Table") -> "pa.Table":
        qty = pc.cast(table.column("l_quantity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [table.column("l_returnflag")[0].as_py()], pa.string()
                ),
                "n_lines": pa.array([table.num_rows], pa.int64()),
                "qty_sum": pa.array([pc.sum(qty).as_py()], pa.int64()),
                "min_price": pa.array(
                    [pc.min_max(table.column("l_extendedprice"))["min"].as_py()],
                    pa.float64(),
                ),
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInArrow(
        summarize,
        "l_returnflag string, n_lines long, qty_sum long, min_price double",
    )


@register(
    "udf_cogrouped_apply_in_arrow",
    oracle="""
    SELECT c.c_custkey,
           CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(o.max_key, 0) AS BIGINT) AS max_orderkey
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderkey) AS max_key
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 10 = 7
    """,
)
def udf_cogrouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInArrow`` — the last cell of the raw-Arrow UDF
    matrix (VERDICT r9 missing #3): two co-partitioned inputs arrive as
    ``pyarrow.Table`` pairs per key, no pandas conversion.  Kernel logic
    is integer-only (count + MAX — no accumulation-order hazard), and a
    customer with no orders still emits (the LEFT-JOIN oracle pins the
    empty-right case; an order key with no customer emits nothing, which
    the kernel's empty-left early-out pins).

    The key predicate is mirrored to BOTH cogroup inputs (the round-6
    rule: a cogroup fires the kernel for every key present in EITHER
    side, so a one-sided filter still ships the other side's full key
    domain through the exchange and pays the per-GROUP Arrow boundary
    for each empty-partner group).  Scale shape: one co-partitioned
    shuffle, constant per-group output."""
    import pyarrow as pa

    def reconcile(key, cust: "pa.Table", orders: "pa.Table") -> "pa.Table":
        if cust.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "nationkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "max_orderkey": pa.array([], pa.int64()),
                }
            )
        okeys = orders.column("o_orderkey") if orders.num_rows else None
        max_key = max(okeys.to_pylist()) if okeys is not None else 0
        return pa.table(
            {
                "c_custkey": pa.array([key[0].as_py()], pa.int64()),
                "nationkey": pa.array(
                    [cust.column("c_nationkey")[0].as_py()], pa.int64()
                ),
                "n_orders": pa.array([orders.num_rows], pa.int64()),
                "max_orderkey": pa.array([max_key], pa.int64()),
            }
        )

    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 7)
        .select("c_custkey", "c_nationkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 7)
        .select("o_custkey", "o_orderkey")
    )
    return (
        customer.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInArrow(
            reconcile,
            "c_custkey long, nationkey long, n_orders long, max_orderkey long",
        )
    )


@udtf(useArrow=True)
class _SplitFixed:
    """POLYMORPHIC UDTF (no static returnType): ``analyze`` computes the
    output schema at PLAN time from the literal column-count argument —
    ``split_fixed(x, 3)`` plans three string columns, ``split_fixed(x, 5)``
    five — the Spark 4 dynamic-schema table-function surface (the shape
    CSV-ish parsers and pivoting TVFs need).  Arrow-evaluated like every
    sanctioned Python path."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None:
            raise ValueError("split_fixed: n must be a constant literal")
        return AnalyzeResult(
            StructType(
                [
                    StructField(f"part{i}", StringType())
                    for i in range(int(n.value))
                ]
            )
        )

    def eval(self, text, n):  # noqa: ANN001
        parts = (text or "").split("|")
        yield tuple(
            parts[i] if i < len(parts) else None for i in range(int(n))
        )


@register(
    "udtf_dynamic_schema_split",
    oracle="""
    SELECT doc_id,
           split_part(src, '|', 1) AS part0,
           split_part(src, '|', 2) AS part1,
           split_part(src, '|', 3) AS part2
    FROM (
        SELECT doc_id, lang || '|' || source || '|' || CAST(doc_id AS VARCHAR) AS src
        FROM documents
    )
    """,
)
def udtf_dynamic_schema_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema UDTF via ``analyze()`` — the polymorphic
    table-function variant next to the fixed-schema `udtf_token_positions`:
    the literal arity argument (3) shapes the planned output columns
    before execution, so the same function serves any fixed-width parse.
    The oracle replays the split with ``split_part``; column names come
    from the analyze-generated schema, aligned on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.concat_ws(
            "|", F.col("lang"), F.col("source"), F.col("doc_id").cast("string")
        ).alias("src"),
    )
    view = "udtf_split_src"
    src.createOrReplaceTempView(view)
    spark.udtf.register("split_fixed", _SplitFixed)
    return spark.sql(
        f"""
        SELECT doc_id, t.part0, t.part1, t.part2
        FROM {view}, LATERAL split_fixed(src, 3) AS t
        """
    )


@udtf(
    returnType="custkey bigint, n_orders bigint, span_days bigint, max_gap_days bigint",
    useArrow=True,
)
class _OrderGaps:
    """Per-partition sequential state machine: consumes one customer's
    orders in event order, tracks first/prev dates and the running max
    inter-order gap.  A fresh instance is constructed per PARTITION BY
    key, so state never leaks across customers."""

    def __init__(self) -> None:
        self.key = None
        self.n = 0
        self.first = None
        self.prev = None
        self.max_gap = 0

    def eval(self, row) -> None:
        self.key = row["o_custkey"]
        d = row["o_orderdate"]
        if self.prev is None:
            self.first = d
        else:
            gap = (d - self.prev).days
            if gap > self.max_gap:
                self.max_gap = gap
        self.prev = d
        self.n += 1

    def terminate(self):
        if self.key is not None:
            yield int(self.key), self.n, (self.prev - self.first).days, self.max_gap


@register(
    "udtf_table_partition_args",
    oracle="""
    WITH t AS (
        SELECT o_custkey, o_orderdate,
               lag(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS prev
        FROM orders WHERE o_custkey % 20 = 0
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                AS BIGINT) AS span_days,
           CAST(COALESCE(MAX(date_diff('day', prev, o_orderdate)), 0)
                AS BIGINT) AS max_gap_days
    FROM t GROUP BY o_custkey
    """,
)
def udtf_table_partition_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a TABLE argument + ``PARTITION BY ... ORDER BY`` — the
    SQL-native face of applyInPandas: ``FROM order_gaps(TABLE(v)
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)`` hands the
    UDTF one ordered partition per customer (fresh instance per key,
    ``terminate`` fires at each boundary), so sequential per-key logic
    is declared IN the query instead of through the DataFrame API.
    Spark plans it as one hash-partitioned exchange + in-partition sort
    — the same shuffle an applyInPandas needs — and the eval loop is
    row-at-a-time Python, so the key predicate (5% of customers) is
    pushed BELOW the UDTF into the scan; at 100 TB this surface is for
    genuinely sequential per-key state machines, never for arithmetic a
    window function can express (the oracle replays it as exactly that
    lag/aggregate window).  The unique ORDER BY tiebreak pins tie-day
    sequences; gaps are integer day diffs on midnight-aligned dates —
    hash-exact."""
    view = "udtf_gaps_src"
    load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 20 == 0
    ).select("o_custkey", "o_orderdate", "o_orderkey").createOrReplaceTempView(view)
    spark.udtf.register("order_gaps", _OrderGaps)
    return spark.sql(
        f"""
        SELECT custkey, n_orders, span_days, max_gap_days
        FROM order_gaps(TABLE({view})
                        PARTITION BY o_custkey
                        ORDER BY (o_orderdate, o_orderkey))
        """
    )


@register(
    "pandas_api_on_spark",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def pandas_api_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``, the Koalas lineage) —
    the third Python front end next to DataFrame and SQL, and the one a
    pandas-native user reaches for first.  A groupby-agg written in
    pandas idiom lowers to the SAME Catalyst hash aggregate as the
    DataFrame form (no Python workers — every op here is a column
    expression), which is exactly what the oracle pins.
    ``to_spark(index_col=...)`` keeps the group key as a column and —
    with the lazy groupby path — avoids materializing pandas-on-Spark's
    default distributed-sequence index (a driver-coordinated zipWithIndex
    job, the one anti-scale trap of this API; docstring is the warning).
    Aggregates rounded, never per-row arithmetic."""
    import pyspark.pandas as ps  # noqa: F401 (import also validates the module)

    orders = load_table(spark, sf_dir, "orders")
    psdf = orders.pandas_api()
    g = psdf.groupby("o_orderpriority").agg(
        n_orders=("o_orderkey", "count"),
        total=("o_totalprice", "sum"),
        max_price=("o_totalprice", "max"),
    )
    sdf = g.to_spark(index_col="o_orderpriority")
    return sdf.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("total", 2).alias("total"),
        F.round("max_price", 2).alias("max_price"),
    )
