"""One-off wall-clock breakdown of streaming_ensemble_ann_topk's phases
(r16 guide §1: measure before changing).  Reuses the entry's own helpers
so the phase timings add up to the entry's bench wall."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ensemble-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        ensemble_ann_topk_batch,
        ensemble_frozen_state,
    )
    from hunger_games_glue_streaming_etl_spark.plans.similarity_ops import (
        _K,
        _balanced_ivf_index,
        _sq8_refine,
    )
    from hunger_games_glue_streaming_etl_spark.plans.streaming_queries import (
        _lean_state_partitions,
        _stage_query_stream,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    # warmup (bench parity)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr("id", "cast(id AS double) AS v").mapInPandas(
        lambda it: it, schema="id long, v double"
    ).write.mode("overwrite").format("noop").save()

    for rep in range(3):
        t0 = time.perf_counter()
        emb = load_table(spark, sf_dir, "embeddings")
        _, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
        t1 = time.perf_counter()
        refine = _sq8_refine(spark, sf_dir)
        t2 = time.perf_counter()
        frozen = ensemble_frozen_state(emb, cents)
        t3 = time.perf_counter()
        src = _stage_query_stream(spark, sf_dir)
        t4 = time.perf_counter()
        schema = StructType(
            [
                StructField("qid", LongType()),
                StructField("qv", ArrayType(DoubleType())),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        results: list = []
        serve_times: list = []

        def serve(batch_df, _epoch):
            s0 = time.perf_counter()
            rows = batch_df.select("qid", "qv").collect()
            if not rows:
                return
            qf = spark.createDataFrame(rows, schema).select(
                "qid", F.col("qv").alias("__qv")
            )
            out = ensemble_ann_topk_batch(
                emb, qf, cents, n_probe, k=_K, refine=refine, frozen=frozen
            )
            results.extend(out.collect())
            serve_times.append(time.perf_counter() - s0)

        with _lean_state_partitions(spark):
            q = stream.writeStream.foreachBatch(serve).start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        t5 = time.perf_counter()
        spark.createDataFrame(
            results, "qid long, rank int, vec_id long, cosine double"
        ).write.mode("overwrite").format("noop").save()
        t6 = time.perf_counter()
        print(
            f"rep{rep}: ivf={t1-t0:.2f} refine={t2-t1:.2f} "
            f"frozen={t3-t2:.2f} stage={t4-t3:.2f} "
            f"stream_total={t5-t4:.2f} serves={[round(s,2) for s in serve_times]} "
            f"emit={t6-t5:.2f} TOTAL={t6-t0:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
