"""BM25 lexical search over a document table — the library form of the
``text_bm25_search`` contract query (VERDICT r03 #8: the term list was
baked into plan and oracle; this operator takes it as an argument).

Score determinism (the oracle rules): a *rational* idf ``(N+1)/(df+1)``
instead of the textbook ``ln`` form — every op in the score is then a
correctly-rounded IEEE multiply/divide/add, bit-identical across engines
(``ln`` is not: Spark's ``Math.log`` and DuckDB's ``std::log`` differ in
the last ulp on ~2.5% of inputs — measured).  Per-term partial scores sum
in the caller's term order on both sides.

Scale shape: ONE tokenize+explode serves document lengths and every
per-term statistic (the pinned token stream is aggregated twice — per-doc
lengths, and a pivot over only query-term rows); N/avgdl/df sides are
1-row broadcasts; top-k is TakeOrderedAndProject (per-partition heaps,
k-row driver merge — no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import pin
from ..functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``limit`` documents by BM25 for the query ``terms``, as
    ``(id_col, bm25)`` ordered by score desc with id tiebreak.

    Zero-score documents are dropped (no query term present); ties in
    score resolve by ascending id, so the result is fully deterministic.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("bm25_topk: at least one query term is required")
    toks = pin(docs.select(id_col, F.explode(tokens(text_col)).alias("term")))
    dl = toks.groupBy(id_col).agg(F.count("*").cast("int").alias("dl"))
    n_stats = docs.agg(F.count("*").cast("long").alias("n_docs"))
    avg_stats = dl.agg((F.sum("dl") * 1.0 / F.count("*")).alias("avgdl"))
    # one pass for every term's tf: pivot with an explicit value list
    # (deterministic columns), then df = per-column non-null count
    tf_all = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col)
        .pivot("term", terms)
        .count()
        .select(id_col, *[F.col(t).alias(f"tf_{t}") for t in terms])
    )
    df_all = tf_all.agg(
        *[F.count(F.col(f"tf_{t}")).cast("long").alias(f"df_{t}") for t in terms]
    )
    scored = (
        dl.join(tf_all, id_col, "left")
        .crossJoin(F.broadcast(n_stats))
        .crossJoin(F.broadcast(avg_stats))
        .crossJoin(F.broadcast(df_all))
    )
    score = None
    for t in terms:
        term_score = F.coalesce(
            F.col(f"tf_{t}")
            * (k1 + 1.0)
            * (F.col("n_docs") + 1.0)
            / (F.col(f"df_{t}") + 1.0)
            / (
                F.col(f"tf_{t}")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
            F.lit(0.0),
        )
        score = term_score if score is None else score + term_score
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(F.col("bm25") > 0)
        .select(id_col, "bm25")
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(limit)
    )
