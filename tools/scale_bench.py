#!/usr/bin/env python
"""Scale spot-bench (VERDICT r9 next #5): run the heaviest registry
entries at sf0.1 AND at a k×-scaled synthetic fixture
(tools/scale_fixture.py), and report per-entry wall-clock scaling
ratios.  Confirms (a) no ANSI-overflow class above bench scale (the r6
``dq_table_fingerprint`` lesson: sf0.01-green does not bound sf0.5
arithmetic) and (b) no super-linear blowup in the pair/cluster tiers as
the CORPUS grows (the duplicate-count axis was measured separately by
the round-9 viral-duplicate sweep).

Usage:
  python tools/scale_fixture.py 5 /tmp/hg_scale_sf05
  python tools/scale_bench.py /tmp/hg_scale_sf05 [entry ...] [--fresh]

Prints one JSON line per entry: base median, scaled median, ratio; a
ratio ≤ ~k·log(k) (≈ 11.6 for k=5) is at-worst O(n log n).

``--fresh`` runs each entry in its OWN subprocess/SparkSession (VERDICT
r13 #6): back-to-back 100× heavies in one local-mode session can fail a
LATER entry's broadcast build — localCheckpoint blocks from the previous
entry await async ContextCleaner GC and local mode shares the driver
heap with block storage — so shared-session failures at the big notches
must be bisected by hand.  Fresh sessions make each entry's
pass/fail its own evidence (and one entry's crash no longer kills the
sweep; the parent records the error and moves on).  The default stays
in-process: at fixture scale the shared session is faster and the r5
neighbor-poisoning interleave is a feature.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.plans import QUERIES
from hunger_games_glue_streaming_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"

# default: the top-10 heaviest non-streaming entries of BENCH_r09
# (streaming entries are multi-trigger state-machine fixed cost, not a
# data-path scale question)
DEFAULT_ENTRIES = [
    "pipeline_pretrain_corpus",
    "dedup_cluster_components_star",
    "dedup_cluster_canonical_keep",
    "graph_pagerank_trade",
    "curation_clean_corpus",
    "dedup_ngram_jaccard_pairs",
    "dedup_cluster_components",
    "pipeline_near_dedup",
    "udf_cogrouped_orders_profile",
    "profile_table_columns_approx",
]


# recall floors pinned by MEASUREMENT on the fixture distribution AND on
# the entry's declared query vector (vec_id 0) — the round-13 multi-query
# sweep showed cell-probe recall is QUERY-dependent on the replica
# geometry (BASELINE.md round-13 multi-query table; only the exact-dot
# refine tier is query-robust); not scale invariants
CALIBRATED_BANDS = {
    "sim_ivf_recall_check",
    "sim_pq_recall_check",
    "sim_sq8_recall_check",
    # the round-12 mitigation entries carry measured floors too — they
    # HELD at 20× (10/10 both; BASELINE.md round-12), but a floor pinned
    # by measurement on a distribution is calibrated by nature, so a
    # future fixture geometry may legitimately degrade them
    "sim_ivf_ann_topk_scaled_probe",
    "sim_sq8_clipped_recall_check",
    # round-13 tier: exact-dot refine bands (measured 10/10 through 50×
    # where the un-refined clipped scan and fixed-refine PQ measure 0/10)
    "sim_sq8_refined_recall_check",
    "sim_pq_scaled_refine_recall_check",
    "sim_ivfpq_residual_recall_check",
    # balanced-IVF tier (round-13 late): floor ≥4 is query-pinned AND
    # distribution-pinned — measured 7/7/4/10/10 at
    # sf0.001/sf0.01/sf0.1/20×/50× (BASELINE.md balanced-IVF census)
    "sim_ivf_balanced_recall_check",
    # round-14: the DE-PINNED multiquery batch surfaces replica-stripe
    # queries whose recall legitimately degrades at the notches (the
    # saturation-tie geometry the fixed query set was hiding —
    # BASELINE.md round-14 de-pinned sweep); floor ≥8 per query is a
    # calibrated band on the fixture distribution
    "sim_sq8_refined_recall_multiquery",
    # the ensemble's floor is ≥ the pointwise max of its members by
    # construction, but the members' floors are calibrated, so so is it
    "sim_ensemble_recall_multiquery",
}

# entries whose boolean columns are STATISTICAL-GUARANTEE bands (estimator
# error bounds / sampling contracts — a False at any scale is a defect).
# Booleans on entries in NEITHER set are DATA, not bands: e.g.
# sketch_bloom_membership's `actually_present` is ground truth that is
# legitimately False on false-positive probe rows (the 50× sweep caught
# the old any-boolean heuristic misfiring on exactly that), and
# chat_format_audit's per-conversation audit flags report fixture
# content.  Only listed entries get band-asserted at scale.
STATISTICAL_BANDS = {
    "agg_approx_distinct_error",
    "agg_approx_percentile_error",
    "sketch_hll_estimate",
    "sketch_native_hll_ndv",
    "sketch_native_kll_rank_bands",
    "sketch_native_theta_audience",
    "profile_table_columns_approx",
    "stats_catalog_analyze",
    "sample_tablesample_percent",
    "sample_stratified_by_key",
    "sample_freqitems_contract",
}


def execute_fully(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _run_fresh(scaled_dir: str, entries: list[str]) -> None:
    """Parent mode for ``--fresh``: one subprocess (one SparkSession, one
    JVM) per entry; merge the children's summary lines."""
    import subprocess

    results = {}
    for e in entries:
        cmd = [sys.executable, os.path.abspath(__file__), scaled_dir, e]
        p = subprocess.run(cmd, capture_output=True, text=True)
        summary = None
        for line in p.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if obj.get("metric") == "scale_spot_bench":
                summary = obj
            elif obj.get("entry"):
                print(line, flush=True)
        if summary is not None and e in summary.get("results", {}):
            results[e] = summary["results"][e]
        else:
            tail = "\n".join(p.stdout.splitlines()[-3:] + p.stderr.splitlines()[-8:])
            results[e] = {"error": f"rc={p.returncode}", "tail": tail[-800:]}
            print(json.dumps({"entry": e, "FRESH_SESSION_FAILED": True,
                              "rc": p.returncode}), flush=True)
    print(json.dumps({"metric": "scale_spot_bench", "scaled_dir": scaled_dir,
                      "fresh_sessions": True, "results": results}))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--fresh"]
    scaled_dir = argv[0]
    entries = argv[1:] or DEFAULT_ENTRIES
    if "--fresh" in sys.argv:
        _run_fresh(scaled_dir, entries)
        return
    repeats = int(os.environ.get("SCALE_REPEATS", "3"))
    spark = get_spark(app_name="hg-scale-bench")
    # the bench.py warmup set: JVM/codegen/Arrow-pool startup must not
    # bill the first measured query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr(
        "aggregate(sequence(1, 16), 0L, (acc, x) -> acc + x) AS s"
    ).collect()
    spark.range(1_000).selectExpr("id", "cast(id AS double) AS v").mapInPandas(
        lambda it: it, schema="id long, v double"
    ).write.mode("overwrite").format("noop").save()

    def median(xs):
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    results = {}
    # interleave A/B/A/B (the r3 rule: isolated timings lie) and suites
    # (the r5 rule: neighbors poison) — alternate dirs inside each repeat
    samples = {(e, d): [] for e in entries for d in (BASE, scaled_dir)}
    for _ in range(repeats):
        for e in entries:
            for d in (BASE, scaled_dir):
                t0 = time.perf_counter()
                execute_fully(QUERIES[e](spark, d))
                samples[(e, d)].append(time.perf_counter() - t0)
    for e in entries:
        b = median(samples[(e, BASE)])
        s = median(samples[(e, scaled_dir)])
        results[e] = {
            "base_s": round(b, 2),
            "scaled_s": round(s, 2),
            "ratio": round(s / b, 2),
        }
        # band-at-scale check (the round-11 theta lesson: a tolerance-band
        # entry green at oracle scale can still fail at target scale —
        # estimator error profiles change in estimation mode).  Any
        # small-result entry with boolean columns gets its booleans
        # asserted on the SCALED fixture.  Two band classes differ in what
        # a False means:
        #  - STATISTICAL-GUARANTEE bands (HLL/KLL/theta/approx_* error
        #    bounds) hold at any scale by construction — a False is a
        #    DEFECT (this is how the theta set-op band bug was caught).
        #  - MEASURED-CALIBRATION bands (ANN recall floors, pinned to the
        #    fixture distribution) are distribution-dependent — the 20×
        #    replica fixture's collinear dim-0 embedding shifts are
        #    adversarial geometry for fixed-probe IVF / max-scaled SQ8,
        #    so a False there is reported as degradation, not failure.
        if e in CALIBRATED_BANDS or e in STATISTICAL_BANDS:
            # Aggregate Spark-side (one bool_and per boolean column) so ANY
            # result cardinality is checkable — the old limit(101) guard
            # silently skipped entries with >100 rows (ADVICE r11 #1),
            # which contradicted the no-silent-caps convention.  Band
            # entries only: data booleans are excluded by design (see
            # STATISTICAL_BANDS).
            import pyspark.sql.functions as _F

            df = QUERIES[e](spark, scaled_dir)
            bool_cols = [c for c, t in df.dtypes if t == "boolean"]
            # count rows in the SAME agg: bool_and over an empty result is
            # NULL, so a band entry that degenerates to 0 rows at scale
            # would otherwise read as green — a vacuous pass (ADVICE r12)
            agg = df.agg(
                _F.count(_F.lit(1)).alias("__n"),
                *[_F.bool_and(_F.col(c)).alias(c) for c in bool_cols],
            ).collect()[0]
            if agg["__n"] == 0:
                results[e]["band_vacuous_at_scale"] = True
                print(
                    json.dumps({"entry": e, "BAND_VACUOUS_AT_SCALE": True}),
                    flush=True,
                )
            bad = [c for c in bool_cols if agg[c] is False]
            if e in CALIBRATED_BANDS:
                results[e]["calibrated_band_degraded_at_scale"] = bool(bad)
            else:
                results[e]["bands_green_at_scale"] = not bad and agg["__n"] > 0
                if bad:
                    print(
                        json.dumps({"entry": e, "BAND_FAILURES_AT_SCALE": bad}),
                        flush=True,
                    )
        print(json.dumps({"entry": e, **results[e]}), flush=True)
    print(json.dumps({"metric": "scale_spot_bench", "scaled_dir": scaled_dir,
                      "repeats": repeats, "results": results}))


if __name__ == "__main__":
    main()
