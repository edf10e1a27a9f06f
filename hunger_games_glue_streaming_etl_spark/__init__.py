"""PySpark-native analytics engine with the capabilities of
``AlexKaracaoglu/hunger-games-glue-streaming-etl``.

The reference is a single AWS Glue streaming job
(``script/TributeStreamingJob.py``): a Kinesis JSON stream joined against two
static dimension tables, five CASE-derived status columns, and a dual sink
(keyed upsert + append archive).  This engine re-expresses that capability
surface — and the general relational/streaming/LLM-data-pipeline operator
categories it implies — as an idiomatic DataFrame / SQL / Structured
Streaming library designed for large-cluster scale.

Modules
-------
``session``    SparkSession factory with scale-aware defaults (AQE, Arrow,
               pinned UTC, shuffle partitions sized to cores).
``schemas``    Explicit ``StructType`` registry (the Glue Catalog's role).
``sources``    Batch + streaming readers with mandatory explicit schemas.
``operators``  Relational / dedup / similarity / text operators.
``sinks``      Set-oriented ``foreachBatch`` sinks (keyed upsert, archive).
``streaming``  The continuous tribute-status pipeline (reference parity).
``plans``      The query registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
