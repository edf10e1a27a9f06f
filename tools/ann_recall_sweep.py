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
    ivf_ann_topk,
    ivf_build_centroids,
    ivf_scaled_dials,
    ivfpq_ann_topk,
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


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_spark(app_name="hg-ann-recall-sweep")
    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").select("embedding").first()[0]
        ]
        exact = {r[0] for r in cosine_topk(emb, qv, k=K).collect()}

        def hits(df) -> int:
            return len(exact & {r[0] for r in df.select("vec_id").collect()})

        n = emb.count()
        n_cells, n_probe = ivf_scaled_dials(n)
        cents = ivf_build_centroids(emb, n_centroids=n_cells, iterations=1)
        results = {
            "sq8_max": hits(sq8_ann_topk(emb, qv, k=K)),
            "sq8_clipped": hits(sq8_ann_topk_clipped(emb, qv, k=K)),
            "sq8_refined": hits(sq8_ann_topk_refined(emb, qv, k=K)),
            "pq_refine4": hits(
                pq_ann_topk(emb, qv, k=K, codebooks=pq_build_codebooks(emb))
            ),
            "pq_scaled_refine": hits(
                pq_ann_topk(
                    emb, qv, k=K, refine=pq_scaled_refine(n),
                    codebooks=pq_build_codebooks(emb),
                )
            ),
            "ivf_scaled_probe": hits(
                ivf_ann_topk(
                    emb, qv, k=K, n_centroids=n_cells, n_probe=n_probe,
                    centroids=cents,
                )
            ),
        }
        ivfpq_cents, ivfpq_cbs = ivfpq_build(emb, n_cells=n_cells)
        results["ivfpq_residual"] = hits(
            ivfpq_ann_topk(
                emb, qv, k=K, n_probe=n_probe,
                refine=pq_scaled_refine(n, min_refine=8),
                centroids=ivfpq_cents, codebooks=ivfpq_cbs,
            )
        )
        print(json.dumps({"dir": d, "n_vectors": n, "recall_at_10": results}),
              flush=True)


if __name__ == "__main__":
    main()
