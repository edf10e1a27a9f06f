"""Connected components over candidate-pair edges — the clustering step a
near-dedup pipeline runs AFTER pairwise detection: LSH/MinHash emit pairs,
but keep/drop decisions need whole *clusters* (a near-dup chain a–b, b–c
must collapse to ONE canonical doc even though (a, c) was never a
candidate pair).

The reference has no graph surface at all (its entire compute is the
149-line tribute stream, ``script/TributeStreamingJob.py``); this is an
engine extension for the LLM-curation tier, same mandate as the dedup
operators that feed it.

Algorithm: deterministic min-label propagation to a fixpoint — every node
starts labeled with its own id; each round every node takes the min label
across itself and its neighbors; converged when no label changes.  Rounds
needed = graph diameter, and near-dup clusters are small and dense
(diameter ≲ 4 in practice), so the loop is short.  Each round is ONE
shuffle on node id (edges join labels, then a min-aggregate); labels are
(node, label) longs only — no payload ever enters the loop.  Every round
ends in ``localCheckpoint(eager=True)``: iterative DataFrame loops MUST
truncate lineage, not merely cache — each round's plan embeds the
previous round's tree more than once, so the un-truncated logical plan
grows geometrically and OOMs the driver long before the data does
(measured: 2 GB plan string at ~10 rounds).  For adversarial long-chain
graphs the alternating large-star / small-star variant
(:func:`connected_components_star`, Kiveris et al., "Connected Components
in MapReduce and Beyond") converges in O(log n) rounds with the same
per-round shape — the propagation loop below is the dial-free default
for shallow near-dup graphs, and the round bound guards either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import pin


def _make_truncate(frame: DataFrame, checkpoint_dir: str | None):
    """Return the per-round lineage-truncation function for an iterative
    loop.  Default: ``localCheckpoint(eager=True)`` — blocks live on
    executors, which is the right local/dev deal but loses partitions if
    an executor dies mid-loop.  With ``checkpoint_dir`` set, rounds go
    through reliable ``DataFrame.checkpoint()`` to that directory (HDFS/
    S3/DBFS on a real cluster): on a preemptible 100 TB fleet one lost
    executor must not kill a 10-round job, and recomputing a truncated
    round is impossible by construction — reliable storage is the only
    recovery path.  Same values either way (parity unit-tested)."""
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)
    sc = frame.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes``: one row per node (singletons keep their own id as label).
    ``edges``: undirected pairs (each edge internally mirrored).
    Returns ``(node, component_id)``; deterministic — the fixpoint is
    unique regardless of execution order.

    Raises if the propagation hasn't converged after ``max_rounds`` (the
    fixpoint always exists; the bound only guards runaway inputs whose
    diameter exceeds it, where the large-star/small-star variant is the
    right tool)."""
    # EAGER materialization, not pin: the mirrored edge frame is consumed
    # once per round, and an un-materialized cache carries Catalyst's
    # pre-execution size GUESS into every round's join planning — at the
    # 100× fixture that guess undersold a multi-million-row pair set and
    # AQE chose to BROADCAST it, killing the driver with
    # notEnoughMemoryToBuildAndBroadcastTable (components/canonical_keep/
    # pipeline_near_dedup all died; the star variant happened to survive).
    # localCheckpoint(eager=True) gives the planner the TRUE byte size, so
    # broadcast is picked only when the edges genuinely fit — exactly the
    # loop's documented posture (label shuffles, never edge broadcasts,
    # at scale).
    _truncate_edges = _make_truncate(edges, checkpoint_dir)
    und = _truncate_edges(
        edges.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        ).union(
            edges.select(
                F.col(dst_col).alias("__src"), F.col(src_col).alias("__dst")
            )
        )
    )
    # All nodes participate with self-labels.  A touched-nodes-only
    # variant (propagate over edge endpoints, anti-join singletons back at
    # the end) was built and MEASURED SLOWER at every scale tried — the
    # extra distinct/anti-join/union stages cost more than they save,
    # because the loop state is just (node, label) longs (16 bytes/row):
    # even at 10^10 docs a round shuffles ~160 GB of ids across a
    # cluster, skew-free, while corpus text never enters the loop.  The
    # suite medians are the go/no-go record (CLAUDE.md): all-nodes 6.2 s
    # vs touched-only 9-15 s for the components entry at sf0.1.
    # Per-round lineage TRUNCATION, not just caching: labels appears twice
    # in each round's plan (neighbor join + union), so the un-truncated
    # logical plan grows ~3× per round — harmless at near-dup diameters
    # (≤4 rounds) but a ~10-round graph ran the driver into a 2 GB plan
    # string / heap OOM during AQE's plan rendering (measured on a
    # 120-node random graph).  localCheckpoint(eager=True) materializes
    # the round's (node, label) longs and roots the next round's plan
    # there — constant-size plans at any diameter, same values.
    _truncate = _make_truncate(nodes, checkpoint_dir)

    # Convergence check: min-propagation is monotone (labels only ever
    # decrease), so Σ label is strictly decreasing until the fixpoint and
    # "sum unchanged" ⇔ "no label changed".  One O(N) aggregate per round
    # on the checkpointed frame — the earlier new⋈old join + isEmpty
    # cost a full extra shuffle join per round for the same bit of
    # information.  DECIMAL(38,0) keeps the sum exact at any corpus size
    # (10^10 64-bit ids overflow BIGINT's 9.2e18).
    def _label_sum(frame: DataFrame) -> object:
        return frame.agg(
            F.sum(F.col("component_id").cast("decimal(38,0)"))
        ).first()[0]

    # (r15 A/B note: wrapping this loop in lean_shuffle(8) like the other
    # iterative loops measured a slight REGRESSION isolated-warm at sf0.1
    # — 3.59 → 3.82 s median — AQE's coalesce already handles the tiny
    # label shuffles here; reverted per the r4 measure-first rule.)
    labels = _truncate(
        nodes.select(
            F.col(id_col).alias("node"), F.col(id_col).alias("component_id")
        )
    )
    prev_sum = _label_sum(labels)
    for _ in range(max_rounds):
        neighbor_labels = und.join(
            labels, und["__src"] == labels["node"]
        ).select(F.col("__dst").alias("node"), "component_id")
        new_labels = _truncate(
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component_id").alias("component_id"))
        )
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds — "
        "diameter exceeds the bound; use more rounds or a star-contraction "
        "variant for chain-shaped graphs"
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 60,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — the
    O(log n)-round variant for adversarial chain-shaped graphs, where the
    min-label propagation loop needs diameter rounds.  Same contract and
    same deterministic output as :func:`connected_components` (labels =
    min reachable id); near-dup graphs are dense and shallow, so the
    propagation loop stays the default — this is the fallback its
    docstring promises.

    Per round: large-star re-points every node's larger neighbors at its
    neighborhood min, small-star re-points the smaller ones — each is one
    groupBy + one join over (long, long) edges, nothing else shuffles.
    Convergence is detected by an edge-multiset signature (count + exact
    decimal sums + a product-mod check) and then confirmed exactly with a
    ONE-SIDED ``exceptAll`` before returning — sound only because the
    signature already proved equal exact COUNT(*)s, so one-sided
    containment under equal cardinality is full set equality (see
    ``_same_exact``; weakening the signature's count component would
    invalidate this and require the two-sided check).

    Lineage discipline: each round ends in ``localCheckpoint(eager=True)``
    — caching alone is NOT enough for an O(log n)-round loop, because the
    un-truncated logical plan re-embeds the previous round's tree at every
    self-reference and grows multiplicatively (measured: a 64-node chain
    OOMs the driver's plan analysis by round ~10 under plain persist).
    The propagation loop gets away with pin() only because near-dup
    graphs converge in ≤4 rounds.  localCheckpoint trades fault-tolerance
    of the stored partitions for truncation, the standard deal for
    iterative graph algorithms (GraphX's Pregel checkpoints the same
    way); pass ``checkpoint_dir`` to route rounds through reliable
    ``DataFrame.checkpoint()`` instead (see ``_make_truncate``)."""
    _truncate = _make_truncate(nodes, checkpoint_dir)
    # EAGER materialization of the canonical edge set (r15): the loop's
    # first signature aggregate, the large-star round, and the final
    # exceptAll confirmation all consume it — a lazy pin raced the cache
    # fill across those consumers and re-executed the upstream pair
    # pipeline per branch (the r4 multi-consumer rule).  Materializing
    # here also runs the corpus-sized pair pipeline at SESSION width,
    # before the lean loop block below (the r13 100×-notch rule).
    e = _truncate(
        edges.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )

    _P = 2_147_483_647

    def _sig(frame: DataFrame) -> tuple:
        row = frame.agg(
            F.count("*"),
            F.sum(F.col("u").cast("decimal(38,0)")),
            F.sum(F.col("v").cast("decimal(38,0)")),
            F.sum(((F.col("u") % _P) * (F.col("v") % _P)) % _P),
        ).first()
        return tuple(row)

    def _same_exact(a: DataFrame, b: DataFrame) -> bool:
        # both sides are distinct() outputs and the signature check that
        # gates this call already proved equal COUNTs, so one-sided
        # containment (a \ b = ∅ with |a| = |b|) is full set equality —
        # half the anti-join cost of the two-sided form
        return a.exceptAll(b).isEmpty()

    # star rounds shuffle (long, long) contracted edges of a shrinking
    # graph — DERIVED lean width (r16): ~2M edge rows per loop task,
    # floored at the literal 8 the r15 A/B measured (fixture plans
    # unchanged; a 100 TB edge set widens the loop instead of funneling
    # into 8 tasks — VERDICT r15 next #5).  The corpus-sized pair
    # pipeline already materialized above at session width, so the count
    # is a cheap cached scan.
    from ..session import lean_shuffle, loop_shuffle_width

    with lean_shuffle(nodes.sparkSession, loop_shuffle_width(e.count(), floor=8)):
        prev_sig = _sig(e)
        for _ in range(max_rounds):
            # large-star: m(u) = min(N(u) ∪ {u}); emit (v, m) for v > u
            sym = e.select("u", "v").union(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins = sym.groupBy("u").agg(F.min("v").alias("__mn")).select(
                "u", F.least("__mn", "u").alias("m")
            )
            e1 = pin(
                sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # small-star on canonical (u > v) edges: m(u) = min(N(u));
            # emit (v, m) for every smaller neighbor, plus (u, m)
            smins = e1.groupBy("u").agg(F.min("v").alias("m"))
            joined = e1.join(smins, "u")
            e2 = _truncate(  # truncate lineage every round (see docstring)
                joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(joined.select("u", F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            cur_sig = _sig(e2)
            e1.unpersist()
            if cur_sig == prev_sig and _same_exact(e2, e):
                e = e2
                break
            e = e2
            prev_sig = cur_sig
        else:
            raise RuntimeError(
                f"connected_components_star: no fixpoint after {max_rounds} rounds"
            )

    # at the fixpoint every edge is (node, component_root); roots and
    # singletons label themselves
    roots = e.groupBy("u").agg(F.min("v").alias("__root"))
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(roots, F.col("node") == F.col("u"), "left")
        .select(
            "node",
            F.coalesce(F.col("__root"), F.col("node")).alias("component_id"),
        )
    )


def component_sizes(labels: DataFrame) -> DataFrame:
    """Attach each node's component size — the fan-out a canonical-keep
    stage needs (``component_size = 1`` ⇒ unique doc).  A window count
    over the component partition: ONE shuffle, and ``labels`` is consumed
    once (the earlier aggregate-then-rejoin shape read it twice, which
    re-executed the whole propagation lineage when unpinned — measured
    7-11 s of pure recompute at sf0.1)."""
    w = Window.partitionBy("component_id")
    return labels.select(
        "node",
        "component_id",
        F.count("*").over(w).cast("long").alias("component_size"),
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Exact triangle + wedge census of an undirected graph given as
    unique ``(x, y)`` edges with ``x < y`` — one hash-exact row:
    ``n_nodes, n_edges, n_wedges, n_triangles``.

    Degree-ordered orientation (MPC-standard): every edge points from
    its ``(degree, id)``-smaller endpoint to the larger, so each
    triangle is counted exactly once and every out-degree is O(√m) —
    the wedge join is bounded O(m^1.5) total no matter how large a hub's
    degree is.  Stage frames are eagerly materialized: the closure join
    consumes each frame 2-3 times in one action, and an unmaterialized
    frame re-executes its lineage per consumer (measured 5× at sf0.01).

    ``n_wedges`` is the UNDIRECTED wedge count Σ C(d, 2) — the global
    clustering coefficient is ``3·n_triangles / n_wedges``."""
    from pyspark.sql import functions as F

    pairs = pairs.localCheckpoint(eager=True)
    deg = (
        pairs.select(F.col("x").alias("node"))
        .unionAll(pairs.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)
    )
    dx, dy = deg.alias("dx"), deg.alias("dy")
    x_first = (F.col("dx.d") < F.col("dy.d")) | (
        (F.col("dx.d") == F.col("dy.d")) & (F.col("x") < F.col("y"))
    )
    ori = (
        pairs.join(dx, F.col("dx.node") == F.col("x"))
        .join(dy, F.col("dy.node") == F.col("y"))
        .select(
            F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
            F.when(x_first, F.col("dy.d")).otherwise(F.col("dx.d")).alias("dd"),
            F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = ori.alias("e1"), ori.alias("e2"), ori.alias("e3")
    wedge_lt = (F.col("e1.dd") < F.col("e2.dd")) | (
        (F.col("e1.dd") == F.col("e2.dd")) & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri = (
        e1.join(e2, (F.col("e1.src") == F.col("e2.src")) & wedge_lt)
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    tops = pairs.agg(F.count("*").alias("n_edges"))
    degs = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    return (
        degs.crossJoin(F.broadcast(tops))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )
