"""Near-dup cluster queries: connected components over the MinHash-LSH
candidate pairs, and the canonical-keep roster derived from them.

The pair detectors (``plans/dedup_ops.py``) stop at (id_a, id_b) edges;
these entries close the loop to what a curation pipeline actually applies:
transitive clusters and one kept doc per cluster.  The oracle replays the
SAME pair SQL (string-reused from the registered pairs entry, so the two
can never diverge) and closes the transitive hull with a recursive CTE —
DuckDB's fixpoint semantics for ``WITH RECURSIVE ... UNION`` match the
min-label propagation exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_lsh_pairs
from ..operators.graph import (
    component_sizes,
    connected_components,
    connected_components_star,
)
from ..sources.batch import load_table
from .registry import ORACLE, register

# the registered pairs oracle is a complete WITH...SELECT statement;
# nesting it as a CTE body keeps both engines' edge sets definitionally
# identical (DuckDB allows a WITH inside a CTE's parenthesized subquery)
_PAIRS_SQL = ORACLE["dedup_minhash_lsh_pairs"]

_COMPONENTS_SQL = f"""
    WITH RECURSIVE pairs AS (
        {_PAIRS_SQL}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON r.node = e.src
    ),
    lab AS (
        SELECT node AS doc_id, MIN(label) AS component_id
        FROM reach GROUP BY node
    )
"""


@register(
    "dedup_cluster_components",
    oracle=f"""
    {_COMPONENTS_SQL}
    SELECT doc_id, component_id,
           CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS component_size
    FROM lab
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document labeled with its near-dup cluster: connected
    components over the MinHash-LSH pair edges (min-reachable-id label,
    fully deterministic), plus the cluster size.  Singletons label
    themselves — the output covers the whole corpus, so the entry can
    never be vacuous.

    At scale: the propagation loop shuffles (node, label) longs only —
    one shuffle per round, diameter rounds total (near-dup clusters are
    dense; ≤ 4 rounds on every fixture sf) — then one shuffle for sizes.
    The pair edges come from the SAME operator the pairs entry registers,
    so cluster semantics inherit the DF-capped, hash-keyed candidate
    join."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    labels = connected_components(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    return component_sizes(labels).select(
        F.col("node").alias("doc_id"), "component_id", "component_size"
    )


@register(
    "dedup_cluster_canonical_keep",
    oracle=f"""
    {_COMPONENTS_SQL}
    SELECT component_id AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM lab
    GROUP BY component_id
    HAVING COUNT(*) > 1
    """,
)
def dedup_cluster_canonical_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision near-dedup exists for: one canonical doc per
    multi-member cluster (min doc_id — deterministic), with member and
    drop counts.  Clusters of size 1 are unique docs and never surface
    here; the planted fixture corpus guarantees non-vacuity (25 pairs →
    multi-member clusters at every sf)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    labels = connected_components(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    return (
        labels.groupBy("component_id")
        .agg(
            F.count("*").alias("n_members"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .filter(F.col("n_members") > 1)
        .select(
            F.col("component_id").alias("canonical_id"),
            "n_members",
            "n_dropped",
        )
    )


@register(
    "split_by_near_dup_cluster",
    oracle=f"""
    {_COMPONENTS_SQL}
    SELECT doc_id, component_id,
           CASE WHEN CAST(('0x' || substr(md5('0:' ||
                          CAST(component_id AS VARCHAR)), 1, 12))
                     AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'holdout' END AS split
    FROM lab
    """,
)
def split_by_near_dup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/holdout split: hash the near-dup CLUSTER label,
    not the document id, so a duplicate family can never straddle the
    boundary.  The naive per-doc split (``split_train_holdout``) puts
    ~10% of each near-dup family in holdout — the classic
    train/test-contamination leak (a model evaluated on a holdout doc
    whose near-twin it trained on scores inflated); splitting by
    ``component_id`` moves whole families together while singletons
    (component = own id) behave exactly like the per-doc split.

    Same scale shape as ``dedup_cluster_components`` (the label
    propagation dominates; the split itself is one hash on the already-
    computed label) and the same nested-oracle discipline: the recursive
    CTE replays the identical edge set, then applies the identical
    portable hash to the label — doc membership AND split assignment are
    hash-checked end to end."""
    from ..functions.text import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    labels = connected_components(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    bucket = F.pmod(
        portable_hash64(F.col("component_id").cast("string")), F.lit(100)
    )
    return labels.select(
        F.col("node").alias("doc_id"),
        "component_id",
        F.when(bucket < 90, "train").otherwise("holdout").alias("split"),
    )


_DERIVED_PAIRS_SQL = ORACLE["dedup_ngram_jaccard_derived_cap"]

_FAMILY_COMPONENTS_SQL = f"""
    WITH RECURSIVE pairs AS (
        {_DERIVED_PAIRS_SQL}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON r.node = e.src
    ),
    lab AS (
        SELECT node AS doc_id, MIN(label) AS component_id
        FROM reach GROUP BY node
    ),
    fam AS (
        SELECT doc_id, component_id,
               COUNT(*) OVER (PARTITION BY component_id) AS family_size
        FROM lab
    )
"""


def _routed_family_sql() -> str:
    """Combined oracle for the duplication-routed family entry: BOTH
    candidate generators live in one statement, each gated by the same
    1-row route flag the Spark side derives, so whichever branch the
    dial picks is replayed identically — no scale at which the route
    decision can silently diverge between engines (the round-15 routing
    rule; contrast the ADVICE-r14 dead-predicate trap)."""
    from ..operators.dedup import FAMILY_ROUTE_CAND_PER_DOC
    from .dedup_ops import _CAP_DIAL_CTES, _JACCARD, _SHINGLES

    return f"""
    WITH RECURSIVE {_SHINGLES},
    {_CAP_DIAL_CTES},
    {_JACCARD},
    -- MATERIALIZED bridges: DuckDB inlines (re-executes) a CTE per
    -- reference, and the recursive fixpoint below re-references edges
    -- per round — unbridged, the full shingle explode replayed ~15x
    -- (measured 91.5 s vs 1.6 s at sf0.1; the r14 AS MATERIALIZED rule)
    shh0m AS MATERIALIZED (SELECT doc_id, hsh FROM shh0),
    dfhm AS MATERIALIZED (SELECT hsh, dfv FROM dfh),
    capm AS MATERIALIZED (SELECT df_cap FROM cap),
    sizesm AS MATERIALIZED (SELECT doc_id, n FROM sizes),
    route AS MATERIALIZED (
        SELECT CAST((SELECT SUM(dfv * (dfv - 1) // 2)
                     FROM dfhm CROSS JOIN capm
                     WHERE dfv <= capm.df_cap) AS BIGINT) AS cand_est,
               (SELECT COUNT(*) FROM documents) AS n_docs
    ),
    mins AS (SELECT doc_id, MIN(hsh) AS mk FROM shh0m GROUP BY doc_id),
    rare AS (
        SELECT s.doc_id, s.hsh
        FROM shh0m s JOIN dfhm USING (hsh) CROSS JOIN capm
        WHERE dfhm.dfv <= capm.df_cap
    ),
    rnk AS (
        SELECT r.hsh, r.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY r.hsh ORDER BY m.mk, r.doc_id
               ) AS rn
        FROM rare r JOIN mins m USING (doc_id)
    ),
    scand AS (
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
                        GREATEST(a.doc_id, b.doc_id) AS id_b
        FROM rnk a JOIN rnk b ON a.hsh = b.hsh AND b.rn = a.rn + 1
        WHERE a.doc_id <> b.doc_id
    ),
    sshared AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS ov
        FROM scand c
        JOIN shh0m a ON a.doc_id = c.id_a
        JOIN shh0m b ON b.doc_id = c.id_b AND b.hsh = a.hsh
        GROUP BY 1, 2
    ),
    spairs AS (
        SELECT s.id_a, s.id_b
        FROM sshared s
        JOIN sizesm sa ON s.id_a = sa.doc_id
        JOIN sizesm sb ON s.id_b = sb.doc_id
        WHERE ROUND(s.ov * 1.0 / (sa.n + sb.n - s.ov), 6) >= 0.5
    ),
    allpairs AS MATERIALIZED (
        SELECT j.id_a, j.id_b FROM jac j CROSS JOIN route
        WHERE route.cand_est <= {FAMILY_ROUTE_CAND_PER_DOC} * route.n_docs
          AND j.jaccard >= 0.5
        UNION ALL
        SELECT s.id_a, s.id_b FROM spairs s CROSS JOIN route
        WHERE route.cand_est > {FAMILY_ROUTE_CAND_PER_DOC} * route.n_docs
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM allpairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM allpairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON r.node = e.src
    ),
    lab AS (
        SELECT node AS doc_id, MIN(label) AS component_id
        FROM reach GROUP BY node
    ),
    fam AS (
        SELECT doc_id, component_id,
               COUNT(*) OVER (PARTITION BY component_id) AS family_size
        FROM lab
    )
    SELECT component_id AS anchor_id, doc_id AS member_id,
           CAST(family_size AS BIGINT) AS family_size,
           r.cand_est,
           CAST(CASE WHEN r.cand_est > {FAMILY_ROUTE_CAND_PER_DOC} * r.n_docs
                THEN 1 ELSE 0 END AS INT) AS route_sparse
    FROM fam CROSS JOIN route r WHERE doc_id <> component_id
    """


@register("dedup_family_canonical_pairs", oracle=_routed_family_sql())
def dedup_family_canonical_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTPUT-BUDGETED form of the derived-cap screen (VERDICT r12 next
    #7): a replica family of multiplicity m is m(m−1)/2 mutual pairs in
    ``dedup_ngram_jaccard_derived_cap`` — genuinely quadratic output by
    construction (1.05M pairs at 20×).  A 100 TB scrub doesn't need them:
    the action taken per family is "keep the anchor, drop/link the
    members", which needs exactly one (anchor, member) row per member.
    This entry closes the pair set transitively (the existing
    cluster-components machinery — min-label propagation, per-round
    lineage truncation) and emits ONE canonical pair per non-anchor
    member: output grows ~k·families under k× replication instead of k².
    The family-recall contract is unchanged — every doc touched by any
    derived-cap pair appears, and two docs share an anchor iff the pair
    graph connects them (pinned in
    ``test_family_canonical_pairs_cover_quadratic_screen``).

    DUPLICATION-ROUTED candidate generation (VERDICT r14 next #3): the
    dense derived-cap screen's candidate volume is quadratic per
    recovered family — 208.7 s isolated at 20×, 867 s at 50× — while
    the sorted-neighborhood chain generator (``ngram_chain_edges``)
    covers the same families with Σd linear candidates (33 s at 50×,
    99.67% member coverage).  This entry measures the corpus's actual
    duplication profile (``family_screen_profile``: the screen's exact
    candidate count per doc, a 1-row bounded-dial collect whose
    materializing job fills the shingle cache the chosen branch reuses)
    and routes: dense exact candidates below
    ``FAMILY_ROUTE_CAND_PER_DOC`` candidates/doc, sparse chain + star
    contraction above (chain edges build high-diameter paths — the r13
    rule).  Both the profile (``cand_est`` column) and the route flag
    are exposed outputs, so the data-derived dial itself is
    hash-checked (the round-4 rule), and the oracle carries BOTH
    branches gated by the identical route predicate — whichever branch
    fires, both engines replay it."""
    from ..caching import pin
    from ..operators.dedup import (
        FAMILY_ROUTE_CAND_PER_DOC,
        family_screen_profile,
        ngram_chain_edges,
        ngram_jaccard_pairs,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ONE shingle explode for profile + routed branch (r16, VERDICT r15
    # next #2): the profile's materializing collect fills this pinned
    # frame's cache; the dense screen then reads the cache and takes the
    # already-derived cap as a literal instead of rebuilding the dial —
    # the un-shared form re-aggregated the DF histogram and re-derived
    # the dial inside the branch (+51% at sf0.1, VERDICT r15).
    sh = pin(shingle_sets(docs))
    prof = family_screen_profile(docs, shingles=sh).collect()[0]
    cand_est, n_docs = int(prof["cand_est"]), int(prof["n_docs"])
    sparse = cand_est > FAMILY_ROUTE_CAND_PER_DOC * n_docs
    if sparse:
        pairs = ngram_chain_edges(docs)
        components = connected_components_star
    else:
        # literal cap == the dial value the profile already derived
        # (deterministic function of the DF histogram), so the screen is
        # value-identical to df_cap_dial="derived" minus the rebuild
        pairs = ngram_jaccard_pairs(
            docs, df_cap=int(prof["df_cap"]), shingles=sh
        )
        components = connected_components
    labels = components(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    from pyspark.sql import Window

    fam = labels.select(
        F.col("node").alias("doc_id"),
        "component_id",
        F.count("*")
        .over(Window.partitionBy("component_id"))
        .alias("family_size"),
    )
    return (
        fam.filter(F.col("doc_id") != F.col("component_id"))
        .select(
            F.col("component_id").alias("anchor_id"),
            F.col("doc_id").alias("member_id"),
            F.col("family_size").cast("long").alias("family_size"),
        )
        .withColumn("cand_est", F.lit(cand_est).cast("long"))
        .withColumn("route_sparse", F.lit(1 if sparse else 0).cast("int"))
    )


@register(
    "dedup_cluster_components_star",
    oracle=f"""
    {_COMPONENTS_SQL}
    SELECT doc_id, component_id,
           CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS component_size
    FROM lab
    """,
)
def dedup_cluster_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same clusters via the alternating large-star/small-star
    algorithm (O(log n) rounds, per-round lineage truncation) — the
    adversarial-chain fallback hash-checked END TO END against the same
    recursive-CTE oracle as the propagation entry (both converge to the
    min-reachable-id fixpoint, so one oracle pins both implementations;
    cross-implementation parity is additionally unit-tested on random
    graphs).  At scale the star rounds shuffle (long, long) edges only,
    like the propagation rounds — the difference is round COUNT on
    high-diameter graphs, not round shape."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    labels = connected_components_star(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    return component_sizes(labels).select(
        F.col("node").alias("doc_id"), "component_id", "component_size"
    )


@register(
    "pipeline_near_dedup",
    oracle=f"""
    {_COMPONENTS_SQL},
    sized AS (
        SELECT doc_id,
               component_id,
               CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
                   AS cluster_size
        FROM lab
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           s.cluster_size
    FROM sized s JOIN documents d ON s.doc_id = d.doc_id
    WHERE s.doc_id = s.component_id
    """,
)
def pipeline_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup — the flow a curation user actually runs, as
    ONE plan: corpus → MinHash-LSH candidate pairs → exact-Jaccard verify
    → connected components → canonical keep (min doc_id per cluster) →
    the filtered corpus, each kept doc annotated with the size of the
    cluster it represents (``cluster_size = 1`` ⇒ unique doc, so the
    output is never vacuous and the drop count is recoverable as
    ``Σ(cluster_size-1)``).

    Composition is the point: the three standalone cluster entries each
    rebuild the ~5 s pair pipeline per entry (honest per-entry
    measurement); here the pair buckets are pinned and the label loop is
    checkpointed, so the expensive stages execute ONCE for the whole
    flow.  At scale nothing new crosses a shuffle beyond the component
    stages already audited: pairs ship 48-bit hashes, the loop ships
    (long, long), and the final join re-attaches doc metadata by id only
    for the KEPT minority.  The oracle nests the pairs entry's own SQL
    inside the recursive-CTE hull, so edges/clusters/keeps can't diverge
    between engines."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    labels = connected_components(
        docs.select("doc_id"),
        pairs.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    kept = (
        component_sizes(labels)
        .filter(F.col("node") == F.col("component_id"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("component_size").alias("cluster_size"),
        )
    )
    return kept.join(docs, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        "cluster_size",
    )


_PR_SCALE = 1_000_000  # rank micro-units; all arithmetic integer


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration in DuckDB SQL (integer fixed-point:
    contrib = (85·(r // deg)) // 100, base = (15·SCALE) // (100·N))."""
    return f"""
    {out} AS (
        SELECT e.v AS node,
               (SELECT (15 * {_PR_SCALE}) // (100 * n) FROM nn)
               + SUM((85 * (p.r // dg.d)) // 100) AS r
        FROM ed e
        JOIN {prev} p ON e.u = p.node
        JOIN deg dg ON e.u = dg.u
        GROUP BY e.v
    )"""


@register(
    "graph_pagerank_trade",
    oracle=f"""
    WITH eg AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ed AS (SELECT u, v FROM eg UNION ALL SELECT v AS u, u AS v FROM eg),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY u),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT u AS node,
                  CAST({_PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS r
           FROM deg),
    {_pagerank_iter_sql("r0", "it1")},
    {_pagerank_iter_sql("it1", "it2")},
    {_pagerank_iter_sql("it2", "it3")}
    SELECT node, CAST(r AS BIGINT) AS rank_fp FROM it3
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, damping 0.85) over the bipartite
    customer↔supplier trade graph (an edge per distinct (customer,
    supplier) pair that shares an order line) — the influence-ranking
    iterative workload, alongside connected components, that pushes graph
    processing through DataFrame loops.

    Hash-exact because ALL arithmetic is integer fixed-point micro-units:
    per-node share ``r // deg``, damped contribution ``(85·share) // 100``,
    teleport base ``(15·SCALE) // (100·N)`` with N corpus-derived on both
    engines — integer sums are order-free, so no accumulation-order hazard
    (float PageRank would diverge in the last ulp across engines).  The
    oracle unrolls the three iterations as chained CTEs.

    At scale: edges are (long, long) pairs, mirrored once and pinned; each
    iteration is one join-shuffle + one aggregate (the canonical Pregel
    round), and every round ends in ``localCheckpoint`` per the iterative-
    loop lineage rule.  Degenerate nodes can't occur (every node in the
    edge list has degree ≥ 1 by construction, so no dangling-mass term)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    from ..session import lean_shuffle, loop_shuffle_width

    # EAGER materialization, not pin (r15): ed/deg feed the rank-init
    # checkpoint, the nn broadcast build, AND every loop round — under a
    # lazy pin those consumers raced the cache fill and re-executed the
    # join+distinct edge pipeline per consumer (the r4 multi-consumer
    # rule; the broadcast-build race is the r7 packing lesson).  The
    # edge materialization runs at session width (it's the corpus-sized
    # stage); only the (node, rank) loop below runs lean.
    ed = eg.union(
        eg.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = ed.groupBy("u").agg(F.count("*").alias("d")).localCheckpoint(eager=True)
    nn = F.broadcast(deg.agg(F.count("*").cast("long").alias("n")))
    # the 3 Pregel rounds shuffle (long, long) rank/contribution rows —
    # DERIVED lean width (r16): ~2M edge rows per loop task, floored at
    # the literal 8 the r15 A/B measured, so fixture plans are unchanged
    # and a 100 TB edge set widens the loop instead of funneling into 8
    # tasks (VERDICT r15 next #5; the count is a cheap cached scan of
    # the checkpointed edge frame).
    with lean_shuffle(spark, loop_shuffle_width(ed.count(), floor=8)):
        ranks = (
            deg.crossJoin(nn)
            .selectExpr("u AS node", f"CAST({_PR_SCALE} div n AS BIGINT) AS r")
            .localCheckpoint(eager=True)
        )
        for _ in range(3):
            contrib = (
                ed.join(ranks, ed.u == ranks.node)
                .join(deg, "u")
                .selectExpr("v AS node", "(85 * (r div d)) div 100 AS c")
            )
            ranks = (
                contrib.groupBy("node")
                .agg(F.sum("c").alias("s"))
                .crossJoin(nn)
                .selectExpr(
                    "node",
                    f"CAST((15 * {_PR_SCALE}) div (100 * n) + s AS BIGINT) AS r",
                )
                .localCheckpoint(eager=True)
            )
    return ranks.selectExpr("node", "CAST(r AS BIGINT) AS rank_fp")


@register(
    "graph_triangles_copurchase",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 2 = 1
    ),
    pairs AS (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT x AS node FROM pairs
              UNION ALL SELECT y AS node FROM pairs)
        GROUP BY node
    ),
    ori AS (
        SELECT CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.x ELSE p.y END AS src,
               CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN dy.d ELSE dx.d END AS dd,
               CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.y ELSE p.x END AS dst
        FROM pairs p
        JOIN deg dx ON dx.node = p.x
        JOIN deg dy ON dy.node = p.y
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM ori e1
        JOIN ori e2 ON e1.src = e2.src
                   AND (e1.dd, e1.dst) < (e2.dd, e2.dst)
        JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    )
    SELECT
        CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
        CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
        CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
        (SELECT n_triangles FROM tri) AS n_triangles
    """,
)
def graph_triangles_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + wedge count (the global clustering-coefficient
    integers) over the part co-purchase graph — the third graph workload
    beside connected components and PageRank, and the canonical test of
    whether a join plan survives skew: counting triangles naively joins
    the edge list to itself on high-degree hubs and explodes.

    This uses the MPC-standard DEGREE-ORDERED ORIENTATION: every
    undirected edge points from its (degree, id)-smaller endpoint to the
    larger, so each triangle is counted exactly once and — the scale
    argument — every node's OUT-degree is O(√m), which bounds the wedge
    join at O(m^1.5) total regardless of hub degrees (a hub of degree
    100k contributes wedges only through its low-degree neighbors).
    Wedge closure is one equi-join back to the oriented edge list.  All
    keys are (long, long) pairs; the total order (d, id) is replayed
    identically by the oracle's tuple comparisons, so the single output
    row — nodes, edges, wedges, triangles — is hash-exact.

    The odd-part slice (``l_partkey % 2 = 1``, pushed into the parquet
    scan) bounds FIXTURE cost only — TPC-H's random co-purchase graph is
    far denser (avg degree ~120) than a real catalog's, and wedges scale
    with d²; the orientation, not the slice, is the scale mechanism."""
    from ..operators.graph import triangle_counts

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_partkey") % 2 == 1)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .distinct()
    )
    return triangle_counts(pairs)


def _sparse_family_sql() -> str:
    from .dedup_ops import _CAP_DIAL_CTES, _SHINGLES

    return f"""
    WITH RECURSIVE {_SHINGLES},
    {_CAP_DIAL_CTES},
    rare AS (
        SELECT s.doc_id, s.hsh
        FROM shh0 s JOIN dfh USING (hsh) CROSS JOIN cap
        WHERE dfh.dfv <= cap.df_cap
    ),
    mins AS (SELECT doc_id, MIN(hsh) AS mk FROM shh0 GROUP BY doc_id),
    rnk AS (
        SELECT r.hsh, r.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY r.hsh ORDER BY m.mk, r.doc_id
               ) AS rn
        FROM rare r JOIN mins m USING (doc_id)
    ),
    cand AS (
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
                        GREATEST(a.doc_id, b.doc_id) AS id_b
        FROM rnk a JOIN rnk b ON a.hsh = b.hsh AND b.rn = a.rn + 1
        WHERE a.doc_id <> b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shh0 GROUP BY doc_id),
    shared AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS ov
        FROM cand c
        JOIN shh0 a ON a.doc_id = c.id_a
        JOIN shh0 b ON b.doc_id = c.id_b AND b.hsh = a.hsh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s
        JOIN sizes sa ON s.id_a = sa.doc_id
        JOIN sizes sb ON s.id_b = sb.doc_id
        WHERE ROUND(s.ov * 1.0 / (sa.n + sb.n - s.ov), 6) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON r.node = e.src
    ),
    lab AS (
        SELECT node AS doc_id, MIN(label) AS component_id
        FROM reach GROUP BY node
    ),
    fam AS (
        SELECT doc_id, component_id,
               COUNT(*) OVER (PARTITION BY component_id) AS family_size
        FROM lab
    )
    SELECT component_id AS anchor_id, doc_id AS member_id,
           CAST(family_size AS BIGINT) AS family_size
    FROM fam WHERE doc_id <> component_id
    """


@register("dedup_family_canonical_pairs_sparse", oracle=_sparse_family_sql())
def dedup_family_canonical_pairs_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-candidate sibling of ``dedup_family_canonical_pairs``: the
    derived-cap screen's within-bucket self-join emits d² candidates per
    shingle bucket — recall the family entry pays 867 s at 50× for.
    Family recovery doesn't need the quadratic candidate set: per capped
    bucket, doc_id-ADJACENT pairs (d−1 chain edges) connect every bucket
    member, and true family members co-occur across MANY buckets, so the
    verified chain closes the same families with Σd (linear) candidate
    volume.  Each surviving edge is verified with the exact full-overlap
    Jaccard (identical values to the full screen), then the existing
    min-label components machinery emits one (anchor, member) row per
    non-anchor member.  The oracle replays chain construction (including
    the shared cap dial CTEs), verification, and the recursive closure —
    hash-exact.  Family parity with the quadratic screen at the oracle
    scales is test-pinned; the sparse-vs-full trade at 20×/50× is
    measured in BASELINE.md round-13."""
    from ..operators.dedup import ngram_chain_edges

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_chain_edges(docs)
    # star contraction, not plain propagation: chain edges make
    # high-DIAMETER components (a d-member family is a d-long path, and
    # plain min-label propagation needs diameter rounds — it hit the
    # 50-round bound at the 50x notch); the large-star/small-star
    # rounds contract paths in O(log n)
    labels = connected_components_star(
        docs.select("doc_id"),
        edges.select("id_a", "id_b"),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )
    from pyspark.sql import Window

    fam = labels.select(
        F.col("node").alias("doc_id"),
        "component_id",
        F.count("*")
        .over(Window.partitionBy("component_id"))
        .alias("family_size"),
    )
    return fam.filter(F.col("doc_id") != F.col("component_id")).select(
        F.col("component_id").alias("anchor_id"),
        F.col("doc_id").alias("member_id"),
        F.col("family_size").cast("long").alias("family_size"),
    )


# ---- k-core peeling ---------------------------------------------------------
# The fourth classic graph workload beside components / PageRank /
# triangles: iteratively remove nodes of degree < K until fixpoint — the
# surviving K-core is the standard "dense, well-connected" subgraph used
# for spam/bot filtering and community seeding.  K is corpus-derived:
# (4m)//(3n) = two-thirds of the average degree, which sits BELOW the
# graph's degeneracy at every fixture scale (measured 29/38/39 vs
# degeneracy 33/40/41 at sf0.001/0.01/0.1) — a K above the degeneracy
# collapses the whole graph in a cascade (measured: even the p25-degree
# quantile unravels 100% of the TPC-H co-purchase graph), so deriving K
# from edge/node counts, not a degree quantile, is what makes the entry
# non-degenerate at any scale.
_KCORE_ROUNDS = 8


def _kcore_sql(rounds: int = _KCORE_ROUNDS) -> str:
    """Unrolled peel rounds.  Every multi-referenced CTE is AS
    MATERIALIZED: each round references the previous round TWICE (both
    edge endpoints), so DuckDB's default CTE inlining re-executes the
    whole prefix 2^rounds times (measured: >120 s inlined vs 0.1 s
    materialized at sf0.01)."""
    parts = [
        """
    kli AS MATERIALIZED (
        SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 2 = 1
    ),
    kpairs AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM kli a JOIN kli b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    kedges AS MATERIALIZED (
        SELECT x AS src, y AS dst FROM kpairs
        UNION ALL SELECT y, x FROM kpairs
    ),
    kdeg AS MATERIALIZED (
        SELECT src AS node, COUNT(*) AS d FROM kedges GROUP BY src
    ),
    kdial AS MATERIALIZED (
        SELECT (4 * (SELECT COUNT(*) FROM kpairs))
               // (3 * (SELECT COUNT(*) FROM kdeg)) AS k
    ),
    r0 AS MATERIALIZED (SELECT node FROM kdeg)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    r{i} AS MATERIALIZED (
        SELECT e.src AS node
        FROM kedges e JOIN r{i - 1} a ON e.src = a.node
                      JOIN r{i - 1} b ON e.dst = b.node
        CROSS JOIN kdial
        GROUP BY e.src, k HAVING COUNT(*) >= k
    )"""
        )
    case = (
        "CASE "
        + " ".join(f"WHEN m{i}.node IS NULL THEN {i}" for i in range(1, rounds + 1))
        + " ELSE 0 END"
    )
    joins = " ".join(
        f"LEFT JOIN r{i} m{i} ON r0.node = m{i}.node" for i in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT r0.node AS part_id, CAST({case} AS BIGINT) AS peel_round
    FROM r0 {joins}
    """
    )


@register("graph_kcore_peel", oracle=_kcore_sql())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition by iterative peeling over the part
    co-purchase graph (8 unrolled rounds): every node's
    peel round (1-based round in which it fell below the in-subgraph
    degree threshold K, 0 = survives in the K-core).  The cascade is the
    point — a node can start above K and still peel once its neighbors
    go (sf0.1 measures a 5-round cascade before the fixpoint).

    Scale shape: each round is one self-equi-join of the (long, long)
    edge list against the surviving node set (keys only, never
    attributes) + a map-side HAVING; every round ends in an eager
    ``localCheckpoint`` (the r4 iterative-loop rule — plans otherwise
    embed the previous round's tree once per endpoint reference and grow
    2^rounds).  Peel depth, not corpus size, bounds the round count; at
    100 TB the per-round cost is one shuffle of the live edge set, which
    only SHRINKS as peeling proceeds.  The fixpoint lands well inside the
    unroll at every fixture scale (unit-pinned); the K dial is collected
    driver-side (1 row, the bounded-dial class) after being computed by
    the same integer arithmetic the oracle replays.

    Two r15 optimizations, same values (the oracle's full unroll is
    equivalent by monotonicity — survivor sets only SHRINK, each round
    filters the previous round's set): (1) EARLY FIXPOINT EXIT — equal
    consecutive survivor COUNTs prove set equality, so every later
    round is identical and the loop stops instead of paying the
    remaining joins+checkpoints (sf0.1 reaches the fixpoint at round 5
    of 8).  (2) The peel-round assembly is one union of the (tiny,
    checkpointed) per-round survivor sets + a max-aggregate — ONE
    shuffle — instead of 8 sequential left joins; by monotonicity
    "first round absent" = "last round present + 1", and a node
    surviving the last computed round survives the full unroll."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_partkey") % 2 == 1)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .distinct()
    )
    from ..session import lean_shuffle, loop_shuffle_width

    # the corpus-sized pair pipeline materializes at SESSION width (AQE
    # coalesces the small case); the peel loop's checkpointed rounds are
    # keys-only (long, long) shuffles of a shrinking graph — run them at
    # a DERIVED lean width (r16, VERDICT r15 next #5: the literal 4 was
    # an sf0.1 A/B on this box — 32 → 4.18 s, 8 → 3.53 s, 4 → 3.28 s
    # isolated-warm medians — but a constant is the r13 core-count
    # task-OOM class at 100 TB; loop_shuffle_width keeps ~2M edge rows
    # per loop task and floors at the measured 4, so fixture-scale plans
    # are unchanged).
    edges = pairs.select(
        F.col("x").alias("src"), F.col("y").alias("dst")
    ).unionAll(
        pairs.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    ).localCheckpoint(eager=True)
    n_edge_rows = edges.count()
    with lean_shuffle(spark, loop_shuffle_width(n_edge_rows, floor=4)):
        nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
            eager=True
        )
        m = n_edge_rows // 2
        n = nodes.count()
        k = (4 * m) // (3 * n)

        rounds = [nodes]
        cur = nodes
        prev_n = n
        for _ in range(_KCORE_ROUNDS):
            cur = (
                edges.join(cur, edges.src == cur.node)
                .select("src", "dst")
                .join(
                    cur.select(F.col("node").alias("dst_node")),
                    F.col("dst") == F.col("dst_node"),
                )
                .groupBy("src")
                .agg(F.count("*").alias("d"))
                .filter(F.col("d") >= k)
                .select(F.col("src").alias("node"))
                .localCheckpoint(eager=True)
            )
            cur_n = cur.count()
            if cur_n == prev_n:
                # survivor sets are monotone-shrinking, so equal counts
                # prove set equality: every remaining round equals this
                # one and contributes nothing to any node's peel round
                break
            rounds.append(cur)
            prev_n = cur_n

        # peel assembly: union the per-round survivor sets tagged with
        # their round index, take each node's LAST survived round m —
        # by monotonicity peel_round = m + 1 (first absence), 0 if the
        # node survives the final computed round (= the full unroll)
        last = len(rounds) - 1
        tagged = rounds[0].select(
            F.col("node").alias("part_id"), F.lit(0).alias("__r")
        )
        for i in range(1, last + 1):
            tagged = tagged.unionAll(
                rounds[i].select(
                    F.col("node").alias("part_id"), F.lit(i).alias("__r")
                )
            )
        return tagged.groupBy("part_id").agg(
            F.when(F.max("__r") == last, F.lit(0))
            .otherwise(F.max("__r") + 1)
            .cast("long")
            .alias("peel_round")
        )
