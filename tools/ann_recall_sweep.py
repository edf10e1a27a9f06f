#!/usr/bin/env python
"""ANN recall sweep across scale fixtures (VERDICT r12 next #3/#4): for
each named index entry, count how many of the exact float top-10 the
approximate top-10 recovers, per fixture dir.  Extends the r11/r12
recall tables (which measured IVF and SQ8 only) with PQ and the round-13
refined-SQ8 tier.

Usage: python tools/ann_recall_sweep.py [dir ...]   (default sf0.1, 20x, 50x)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.operators.similarity import (
    cosine_topk,
    ensemble_refined_recall_batch,
    ivf_balanced_ann_topk,
    ivf_balanced_build,
    ivf_ann_topk,
    ivf_build_centroids,
    ivf_scaled_dials,
    ivfpq_ann_topk,
    ivfpq_balanced_ann_topk,
    ivfpq_balanced_codebooks,
    ivfpq_build,
    pq_ann_topk,
    pq_build_codebooks,
    pq_scaled_refine,
    sq8_ann_topk,
    sq8_ann_topk_clipped,
    sq8_ann_topk_refined,
)
from hunger_games_glue_streaming_etl_spark.session import get_spark
from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

K = 10
DEFAULT_DIRS = ["/root/testdata/sf0.1", "/tmp/hg_scale_sf20", "/tmp/hg_scale_sf50"]


# query vectors sampled across the base id range — present at EVERY
# notch (base ids survive scale_fixture replication).  vec_id 0 first so
# column one of every multi-query row reproduces the historical
# single-query tables.  The per-dir sweep ADDS the corpus-DERIVED query
# set (vec_id % GREATEST(100, n//5) = 0 — the r14 de-pinned multiquery
# contract, VERDICT r13 #4), which at the replica notches probes every
# replica stripe instead of just replica 0.
QUERY_IDS = [0, 17, 123, 321, 499]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_spark(app_name="hg-ann-recall-sweep")
    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        n_cells, n_probe = ivf_scaled_dials(n)
        cents = ivf_build_centroids(emb, n_centroids=n_cells, iterations=1)
        bal_cents = ivf_balanced_build(emb, n_cells)
        pq_cbs = pq_build_codebooks(emb)
        ivfpq_cents, ivfpq_cbs = ivfpq_build(emb, n_cells=n_cells)
        ivfpq_bal_cbs = ivfpq_balanced_codebooks(emb, bal_cents)
        qmod = max(100, n // 5)
        derived = [
            r[0]
            for r in emb.filter(f"vec_id % {qmod} = 0")
            .select("vec_id")
            .orderBy("vec_id")
            .collect()
        ]
        qids = QUERY_IDS + [q for q in derived if q not in QUERY_IDS]
        per_query: dict[str, list[int]] = {}
        for qid in qids:
            row = emb.filter(f"vec_id = {qid}").select("embedding").first()
            if row is None:
                continue
            qv = [float(x) for x in row[0]]
            exact = {r[0] for r in cosine_topk(emb, qv, k=K).collect()}

            def topset(df) -> set:
                return {r[0] for r in df.select("vec_id").collect()}

            def hits(df) -> int:
                return len(exact & topset(df))

            # materialize the two union members once: their served top-k
            # sets ARE the candidate sets of the "ivfpq ∪ ivf_balanced"
            # serving row (VERDICT r14 #6) — an exact re-rank over a
            # candidate union keeps every exact-top-k member present, so
            # union recall = |exact ∩ (A ∪ B)|, ≥ pointwise max by
            # construction
            ivfbal_set = topset(
                ivf_balanced_ann_topk(
                    emb, qv, k=K, n_cells=n_cells, n_probe=n_probe,
                    centroids=bal_cents,
                )
            )
            ivfpq_set = topset(
                ivfpq_ann_topk(
                    emb, qv, k=K, n_probe=n_probe,
                    refine=pq_scaled_refine(n, min_refine=8),
                    centroids=ivfpq_cents, codebooks=ivfpq_cbs,
                )
            )

            for name, got in {
                "sq8_max": hits(sq8_ann_topk(emb, qv, k=K)),
                "sq8_clipped": hits(sq8_ann_topk_clipped(emb, qv, k=K)),
                "sq8_refined": hits(
                    sq8_ann_topk_refined(
                        emb, qv, k=K,
                        refine=pq_scaled_refine(n, min_refine=8),
                    )
                ),
                "pq_refine4": hits(pq_ann_topk(emb, qv, k=K, codebooks=pq_cbs)),
                "pq_scaled_refine": hits(
                    pq_ann_topk(
                        emb, qv, k=K, refine=pq_scaled_refine(n),
                        codebooks=pq_cbs,
                    )
                ),
                "ivf_scaled_probe": hits(
                    ivf_ann_topk(
                        emb, qv, k=K, n_centroids=n_cells, n_probe=n_probe,
                        centroids=cents,
                    )
                ),
                "ivf_balanced": len(exact & ivfbal_set),
                "ivfpq_residual": len(exact & ivfpq_set),
                "ivfpq_union_ivf_balanced": len(
                    exact & (ivfpq_set | ivfbal_set)
                ),
                "ivfpq_balanced": hits(
                    ivfpq_balanced_ann_topk(
                        emb, qv, k=K, n_cells=n_cells, n_probe=n_probe,
                        refine=pq_scaled_refine(n, min_refine=8),
                        centroids=bal_cents, codebooks=ivfpq_bal_cbs,
                    )
                ),
            }.items():
                per_query.setdefault(name, []).append(got)
        # the ensemble operator computes per-query recall itself (one scan
        # for the whole batch) — run it once over the full qid set
        ens = ensemble_refined_recall_batch(
            emb, qids, bal_cents, n_probe, k=K,
            refine=pq_scaled_refine(n, min_refine=8),
        ).collect()
        by_qid = {r["qid"]: r["recall_at_10"] for r in ens}
        per_query["ensemble_sq8_ivf"] = [by_qid.get(q, 0) for q in qids]
        results = {
            name: {"per_query": xs, "min": min(xs),
                   "mean": round(sum(xs) / len(xs), 1)}
            for name, xs in per_query.items()
        }
        print(
            json.dumps(
                {"dir": d, "n_vectors": n, "query_ids": qids,
                 "derived_qmod": qmod,
                 "recall_at_10": results}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
