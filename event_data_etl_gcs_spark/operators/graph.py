"""Iterative graph operators: connected components over candidate-pair
edges — the cluster step of every dedup pipeline (pairs -> groups ->
one representative per group).

Algorithm: label propagation to the minimum id. Each iteration joins the
current labels across the edge list and takes the per-node min of
neighbor labels; converges in O(diameter) iterations. Dedup-duplicate
components are near-cliques (diameter 1-2), so a handful of iterations
suffice; the loop stops early when an iteration changes nothing.

Scale notes: each iteration is one shuffle join on node id over the edge
list — the standard large-scale CC formulation (cf. "hash-to-min").
Labels are cached per iteration and the previous generation unpersisted;
convergence is checked with a cheap anti-join count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Cached-intermediate accounting (ADVICE r6): banded_srp_candidates (and
# cosine_dedup_pairs' member map) persist skinny tables consumed by several
# branches of ONE build, but the build's result is returned LAZILY — the
# builder cannot unpersist before its caller materializes. Instead every
# such frame is registered here and the PREVIOUS build's caches are
# released on the next public entry (knn_edges_ann / cosine_dedup_pairs),
# bounding accumulated executor storage at one build's worth in
# long-lived drivers and streaming loops. Unpersisting is always safe:
# an older still-lazy result simply recomputes if materialized later.
#
# The registry is THREAD-LOCAL (VERDICT r9 "what's wrong" #2): two
# concurrent builds in one driver — e.g. parallel streaming queries,
# whose foreachBatch callbacks run on separate threads — must not
# release each other's live caches mid-build. Within a thread, builds
# are sequential, so release-previous-at-next-entry stays correct. A
# thread that exits with tracked frames leaks nothing durable: Spark's
# ContextCleaner unpersists cached plans once the DataFrames are GC'd.
# ---------------------------------------------------------------------------
import threading as _threading
import weakref as _weakref

_ANN_CACHES = _threading.local()
# Global weak companion of the thread-local registry (ADVICE r10 #5):
# a teardown running on a DIFFERENT thread than the builds (driver-wide
# cleanup, test fixtures) can still reclaim executor storage via
# release_ann_caches(all_threads=True). Weak refs only — the global set
# never extends a frame's lifetime, so ContextCleaner semantics are
# unchanged for threads that simply exit.
_ANN_CACHES_GLOBAL: "_weakref.WeakSet[DataFrame]" = _weakref.WeakSet()
_ANN_CACHES_LOCK = _threading.Lock()


def _track_ann_cache(df: DataFrame) -> DataFrame:
    frames = getattr(_ANN_CACHES, "frames", None)
    if frames is None:
        frames = _ANN_CACHES.frames = []
    frames.append(df)
    with _ANN_CACHES_LOCK:
        _ANN_CACHES_GLOBAL.add(df)
    return df


def release_ann_caches(all_threads: bool = False) -> None:
    """Unpersist every intermediate cached by THIS thread's prior
    ANN/embedding-dedup builds. Called automatically at each public
    build entry; callers that materialized their result and want the
    executor storage back immediately may also call it directly.

    ``all_threads=True`` additionally unpersists every still-live
    tracked frame from EVERY thread (via a weak registry) — for
    driver-wide teardown. Never use it while another thread's build is
    in flight: unpersisting a live intermediate forces that build to
    recompute it (correctness is unaffected)."""
    frames = getattr(_ANN_CACHES, "frames", None) or []
    while frames:
        df = frames.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped: nothing to release
    if all_threads:
        with _ANN_CACHES_LOCK:
            others = list(_ANN_CACHES_GLOBAL)
            _ANN_CACHES_GLOBAL.clear()
        for df in others:
            try:
                df.unpersist()
            except Exception:
                pass


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable. Deterministic."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # localCheckpoint, not cache (round 11): `sym` appears in EVERY
    # iteration's plan, and cache keeps the upstream lineage riding in
    # each stage's serialized task binary — for expression-heavy edge
    # inputs (the banded-SRP ANN build) that's ~8 MB per stage binary
    # plus the codegen for it, measured as the 1 GiB-driver OOM class.
    # Checkpointing truncates the plan once; upstream runs ONCE.
    sym = sym.distinct().localCheckpoint(eager=True)

    # localCheckpoint (not cache) per generation: ``labels`` appears
    # TWICE in each iteration's plan (own labels ∪ neighbor labels), so
    # without lineage truncation the logical plan tree DOUBLES per round
    # — measured: a 2 GB plan string at depth ~20 on an 8M-edge ring
    # chain (cache avoids recomputation but not plan growth; the same
    # lesson pagerank learned in round 3).
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iterations):
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                (F.col("n.node") == F.col("o.node"))
                & (F.col("n.component") != F.col("o.component")),
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # exiting on the iteration cap means some component's diameter
        # exceeds max_iterations and its labels are NOT converged — wrong
        # silently, and the reachability oracle would fail with no hint.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations (long duplicate chains have large diameters)"
        )
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs -> (doc id, cluster representative = min id in the
    connected component)."""
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )


def symmetrize(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Undirected (u<v) edge list -> both-direction adjacency."""
    return edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )


def knn_edges(vectors: DataFrame, k: int = 3) -> DataFrame:
    """Undirected kNN graph over an embedding column: (u, v, cos_sim)
    with u < v, where (u, v) appears iff v is among u's exact cosine
    top-k or vice versa.

    Built from :func:`..similarity.brute_force_topk` (broadcast queries,
    JVM-lambda dot products). cos_sim is direction-independent bit-exact
    (elementwise multiply commutes, fold order over dims is fixed), so
    the symmetrized DISTINCT collapses the two directions to one row.

    Scale: at 100 TB you would not brute-force the kNN step — swap the
    candidate generator for the ANN paths (lsh_bucket_topk / IVF / PQ)
    and keep this symmetrize+distinct contract; the graph ops downstream
    only see (u, v) edges.
    """
    from .similarity import brute_force_topk

    topk = brute_force_topk(vectors, vectors, k=k)
    und = topk.select(
        F.least("query_id", "neighbor_id").alias("u"),
        F.greatest("query_id", "neighbor_id").alias("v"),
        "cos_sim",
    )
    return und.distinct()


def degree_table(edges: DataFrame) -> DataFrame:
    """(node, degree) over an undirected u<v edge list. One shuffle."""
    return (
        symmetrize(edges)
        .groupBy(F.col("u").alias("node"))
        .agg(F.count("*").cast("long").alias("degree"))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient.

    Input: undirected edge list with u < v (one row per edge). Each
    triangle a<b<c is enumerated exactly once via two shuffle joins on
    the oriented edge list (the classic sort-merge triangle listing:
    wedges a->b->c checked against closing edge (a, c)), then exploded
    to its three corners and counted per node.

    Output: (node, degree, n_triangles, lcc) for every node, where
    lcc = 2*T / (d*(d-1)) — both operands exact integers, one double
    division, so the float is bit-portable. d == 1 nodes get lcc 0.0.

    Scale: id-orientation bounds work by sum of per-node out-degree
    squared; for skewed degree distributions re-orient by (degree, id)
    first — the count is identical, the join fan-out drops to the
    compact-forward bound. kNN graphs are degree-bounded by 2k, so the
    plain orientation is already tight here.
    """
    # Materialize the edge list ONCE (round 11): the triangle join
    # references it THREE times, and without lineage truncation the
    # upstream edge construction (e.g. the ANN candidate build) executes
    # once per reference and its full plan rides in every task binary.
    e = edges.select("u", "v").localCheckpoint(eager=True)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    deg = degree_table(e)
    return (
        deg.join(corners, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0).cast("long")))
        .withColumn(
            "lcc",
            F.when(
                F.col("degree") > 1,
                (F.lit(2.0) * F.col("n_triangles").cast("double"))
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select("node", "degree", "n_triangles", "lcc")
    )


def bfs_hops(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Minimum hop distance from the seed (= global min node id) to every
    node reachable within ``max_hops``: (node, hops).

    Fixed-depth frontier expansion: each level is one shuffle join of the
    current distance table against the adjacency list, then a min-hops
    groupBy — O(max_hops) bounded iterations, no convergence check
    needed. Caching per level, previous generation unpersisted (same
    discipline as :func:`connected_components`).
    """
    # localCheckpoint, not cache (round 11): same task-binary-bloat
    # rationale as connected_components — `sym` feeds every level's join
    # and must not carry the upstream edge build's plan along.
    sym = symmetrize(edges).localCheckpoint(eager=True)
    # u < v on every input row, so min(u) is the global min node id.
    seed = sym.agg(F.min("u").alias("node"))
    dist = seed.withColumn("hops", F.lit(0).cast("int")).cache()
    dist.count()
    for h in range(1, max_hops + 1):
        frontier = (
            dist.filter(F.col("hops") == h - 1)
            .alias("d")
            .join(sym.alias("s"), F.col("d.node") == F.col("s.u"))
            .select(
                F.col("s.v").alias("node"), F.lit(h).cast("int").alias("hops")
            )
        )
        new_dist = (
            dist.union(frontier)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
            .cache()
        )
        new_dist.count()
        dist.unpersist()
        dist = new_dist
    # Truncate lineage BEFORE releasing sym (ADVICE r11): the cached
    # dist's lineage passes through the localCheckpoint'd sym, so a
    # lost cached block could not be recomputed once sym is gone; the
    # checkpointed result is node-cardinality (tiny) and recoverable.
    out = dist.localCheckpoint(eager=True)
    dist.unpersist()
    sym.unpersist()
    return out


def pagerank(
    edges: DataFrame, iterations: int = 10, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected u<v edge list:
    (node, pagerank).

    Power iteration: rank_{t+1}(n) = (1-d)/N + d * sum over neighbors m
    of rank_t(m)/degree(m). Every node in the edge list has degree >= 1
    (no dangling mass). Each iteration is one shuffle join on node id +
    one groupBy — the standard large-scale formulation; adjacency and
    degrees are computed once and cached across iterations.

    Cross-partition double summation makes the result engine- and
    partitioning-nondeterministic in the last ulp, so this is a
    rows-only query (the pytest gate compares against a numpy power
    iteration at 1e-9 instead of a SQL oracle).
    """
    # Eagerly checkpoint the symmetrized list: deg, adj and the rank
    # init all derive from it, and the upstream edge construction (e.g.
    # the exact kNN build) must run ONCE, not once per consumer —
    # measured 82 s -> ~47 s on the sf0.1 kNN graph.
    sym = symmetrize(edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        # empty edge list (e.g. a corpus with no external links feeding
        # domain_authority): an empty rank table, not ZeroDivisionError
        # (ADVICE r10 #3)
        return edges.sparkSession.createDataFrame(
            [], "node long, pagerank double"
        )
    adj = (
        sym.alias("s")
        .join(deg.alias("g"), F.col("s.u") == F.col("g.node"))
        .select(
            F.col("s.u").alias("src"),
            F.col("s.v").alias("dst"),
            F.col("g.degree").alias("degree"),
        )
        .cache()
    )
    base = (1.0 - damping) / n_nodes
    # Each iteration references `ranks` twice (contribs + the node-list
    # left join), so lineage doubles per round — localCheckpoint truncates
    # the logical plan (cache alone leaves it growing 2^iterations).
    # Cadence + laziness (round 12, A/B-measured on the sf0.1 kNN graph,
    # results hash-identical): checkpointing every SECOND iteration and
    # letting the checkpoint materialize inside the next job instead of
    # an eager driver-blocking job per round cut the 10-iteration loop
    # 5.9 s -> 3.6 s — at small node counts the per-round driver sync
    # is the wall, not the joins. The recompute cost of the skipped
    # round grows with the graph, so past 10M nodes every round
    # checkpoints eagerly again (the r10 posture).
    ckpt_every = 2 if n_nodes < 10_000_000 else 1
    ranks = deg.select(
        "node", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)
    for i in range(iterations):
        contribs = (
            adj.alias("a")
            .join(ranks.alias("r"), F.col("a.src") == F.col("r.node"))
            .select(
                F.col("a.dst").alias("node"),
                (F.col("r.rank") / F.col("a.degree")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        new_ranks = (
            ranks.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % ckpt_every == 0 or i == iterations - 1:
            # FINAL iteration checkpoints eagerly (ADVICE r12): with the
            # every-2nd-round lazy cadence no job runs inside the loop,
            # so an unconditional unpersist below would evict the cached
            # adjacency BEFORE anything materializes and every iteration
            # would recompute the sym-join-deg — measured 3.4-4.6 s for
            # the 10-round sf0.1 loop vs ~1.8 s with the adjacency held.
            # The eager final cut materializes all rounds while adj is
            # still persisted; the in-loop cuts stay lazy (the r12 win).
            new_ranks = new_ranks.localCheckpoint(
                eager=(ckpt_every == 1 or i == iterations - 1)
            )
        ranks = new_ranks
    adj.unpersist()
    return ranks.select("node", F.col("rank").alias("pagerank"))


# Scaled-integer PageRank: rank mass carried as int64 units of 1/PR_SCALE.
# Every per-iteration step is integer floor arithmetic, so summation
# order cannot change a single unit — the result is partitioning-
# independent AND cross-engine exact (the quantized-literal device that
# made PCA/IVF exact, applied to power iteration). Overflow analysis:
# total mass never exceeds PR_SCALE (floor losses only shrink it), so
# in_mass <= 1e12 and the largest intermediate, 17 * in_mass, is
# <= 1.7e13 << 2^63.
PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 17, 20  # damping 0.85 as an exact rational

# Small-graph strategy switch for pagerank_quantized (round 13): below
# this node count the whole symmetrized edge list fits one Arrow task
# (kNN graphs bound degree by 2k, web-ish graphs by the crawl budget;
# 65k nodes x a few hundred edges each is tens of MB), and TEN
# distributed iterations — each a join + groupBy + left join, i.e. ~30
# tiny shuffle stages whose scheduling dominates — collapse into one
# numpy loop INSIDE a task. Integer floor arithmetic is summation-order
# independent, so the result is bit-identical to the distributed loop
# (pinned by tests/test_graph.py::test_pagerank_quantized_local_parity);
# above the bound the shuffle loop is the only thing that scales and
# runs unchanged. Same family of size switch as SCORING_FOLD_MAX_N and
# the broadcast join-back bound.
PR_LOCAL_MAX_NODES = 65_536


def _pagerank_quantized_local(
    sym: DataFrame, n_nodes: int, iterations: int, scale: int
) -> DataFrame:
    """One-task numpy power iteration over the (small) symmetrized edge
    list: (node, r). Arithmetic is exactly the distributed loop's —
    r0 = scale DIV n, contrib = r DIV degree summed per dst (int64),
    r' = base + (17 * in_mass) DIV 20 — all non-negative int64, so
    numpy floor division and np.add.at reproduce it bit-for-bit."""
    import numpy as np
    import pandas as pd

    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)
    r0 = scale // n_nodes
    damp_num, damp_den = PR_DAMP_NUM, PR_DAMP_DEN

    def run(batches):
        us, vs = [], []
        for pdf in batches:
            if len(pdf):
                us.append(pdf["u"].to_numpy(np.int64))
                vs.append(pdf["v"].to_numpy(np.int64))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        # sym carries both directions, so every node appears as u;
        # degree(node) = its row count as source.
        nodes, src_idx = np.unique(u, return_inverse=True)
        deg = np.bincount(src_idx).astype(np.int64)
        dst_idx = np.searchsorted(nodes, v)
        r = np.full(len(nodes), r0, dtype=np.int64)
        for _ in range(iterations):
            contrib = r[src_idx] // deg[src_idx]
            in_mass = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(in_mass, dst_idx, contrib)
            r = base + (damp_num * in_mass) // damp_den
        yield pd.DataFrame({"node": nodes, "r": r})

    # coalesce (narrow) the checkpointed sym into the one task.
    return sym.coalesce(1).mapInPandas(run, "node long, r long")


def pagerank_quantized(
    edges: DataFrame,
    iterations: int = 10,
    scale: int = PR_SCALE,
    local_max_nodes: int = PR_LOCAL_MAX_NODES,
) -> DataFrame:
    """Fixed-iteration PageRank in scaled-integer arithmetic:
    (node, pr_scaled, pagerank) where ``pr_scaled`` is the exact int64
    rank in units of 1/scale and ``pagerank`` is the single exact
    double division pr_scaled/scale.

    Same plan shape as :func:`pagerank` (cached adjacency+degree, one
    shuffle join + groupBy-sum per iteration), but the per-edge
    contribution is ``r DIV degree`` and the damped update is
    ``base + (17 * in_mass) DIV 20`` — integer ops whose results are
    identical under any partitioning, so unlike the float form this has
    an exact DuckDB oracle (queries/graph.py unrolls the iterations as
    chained CTEs). Rank error vs the float form is bounded by the floor
    losses: <= iterations * (max_degree + 1) units of 1/scale, i.e.
    ~1e-11 at the default scale (pinned vs numpy in test_graph.py)."""
    # Eagerly checkpoint the symmetrized list: deg, adj and the rank
    # init all derive from it, and the upstream edge construction (e.g.
    # the exact kNN build) must run ONCE, not once per consumer —
    # measured 82 s -> ~47 s on the sf0.1 kNN graph.
    sym = symmetrize(edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        # empty edge list -> empty rank table (ADVICE r10 #3); the DuckDB
        # oracle agrees by construction (pr0 selects FROM the empty deg)
        return edges.sparkSession.createDataFrame(
            [], "node long, pr_scaled long, pagerank double"
        )
    if n_nodes <= local_max_nodes:
        # small-graph strategy (see PR_LOCAL_MAX_NODES): one Arrow task
        # replaces ~3 shuffle stages per iteration; bit-identical output.
        ranks = _pagerank_quantized_local(sym, n_nodes, iterations, scale)
        return ranks.select(
            "node",
            F.col("r").alias("pr_scaled"),
            (F.col("r").cast("double") / F.lit(float(scale))).alias("pagerank"),
        )
    adj = (
        sym.alias("s")
        .join(deg.alias("g"), F.col("s.u") == F.col("g.node"))
        .select(
            F.col("s.u").alias("src"),
            F.col("s.v").alias("dst"),
            F.col("g.degree").alias("degree"),
        )
        .cache()
    )
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)
    # Same adaptive checkpoint cadence as the float form (see pagerank):
    # every 2nd round, lazily, below 10M nodes — A/B-measured 5.9 s ->
    # 3.6 s on the sf0.1 kNN graph with hash-identical output (integer
    # arithmetic is invariant to how often lineage is cut).
    ckpt_every = 2 if n_nodes < 10_000_000 else 1
    ranks = deg.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for i in range(iterations):
        contribs = (
            adj.alias("a")
            .join(ranks.alias("rk"), F.col("a.src") == F.col("rk.node"))
            .select(
                F.col("a.dst").alias("node"),
                F.expr("rk.r DIV a.degree").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("in_mass"))
        )
        ranks = (
            ranks.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(in_mass, 0L)) "
                        f"DIV {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("r"),
            )
        )
        if (i + 1) % ckpt_every == 0 or i == iterations - 1:
            # eager on the FINAL iteration (ADVICE r12): materialize the
            # loop while adj is still persisted — see pagerank above.
            ranks = ranks.localCheckpoint(
                eager=(ckpt_every == 1 or i == iterations - 1)
            )
    adj.unpersist()
    return ranks.select(
        "node",
        F.col("r").alias("pr_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("pagerank"),
    )


# Default skew posture (round-6: DEFAULT-ON, was opt-in). Values are the
# measured round-5 hybrid operating point (SCALE_r5.md: 100% near-dup
# recall at bounded wall on the 200k duplicate-heavy corpus, vs 27.8%
# for skip-only). ring_cap < max_bucket keeps hot-bucket candidate
# output strictly below the exact-join cost of a cap-sized bucket.
KNN_ANN_MAX_BUCKET = 512
KNN_ANN_RING_CAP = 128
# band_bits auto-derivation target: ~this many vectors per bucket on a
# uniform corpus (band_bits = log2(n / occupancy), floor 4 so tiny
# corpora keep the pre-round-6 geometry and its pinned oracles).
KNN_ANN_TARGET_OCCUPANCY = 256
# Candidate join-back broadcasts the vector table when the corpus is at
# most this many rows (~64 MB of float32 at 64 dims): the pairs-sized
# candidate table then never shuffles. A billion-row corpus exceeds the
# bound and keeps the correct shuffle join.
JOINBACK_BROADCAST_MAX_ROWS = 250_000


def derive_band_bits(n: int, target_occupancy: int = KNN_ANN_TARGET_OCCUPANCY) -> int:
    """band_bits ≈ log2(n / target_occupancy), floored at 4.

    The first lever against LSH bucket skew is more buckets, not caps
    (SCALE_r5.md): aim for ~target_occupancy members per bucket so the
    within-bucket join stays ~occupancy² regardless of corpus size.
    """
    import math

    if n <= target_occupancy:
        return 4
    return max(4, math.ceil(math.log2(n / target_occupancy)))


def _plane_fold_sql(j: int) -> str:
    """Interpreted-HOF signed projection of plane ``j`` over the
    ``embedding`` column (the pre-round-13 spelling, kept as the
    any-width fallback)."""
    from .similarity import LSH_C1, LSH_C2, LSH_HALF, LSH_MOD

    # constants as LONG literals: ANSI mode errors on the int32
    # overflow of (j+1)*C1 + (i-1)*C2 otherwise (BUILDER_NOTES)
    sign = (
        f"(CASE WHEN (({j + 1}L * {LSH_C1}L + (i - 1) * {LSH_C2}L) % {LSH_MOD}L)"
        f" < {LSH_HALF}L THEN 1 ELSE -1 END)"
    )
    return (
        "aggregate(transform(sequence(1, size(embedding)), "
        f"i -> {sign} * CAST(embedding[i - 1] AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _plane_proj_sql(j: int, unroll: bool) -> str:
    """Signed projection of plane ``j`` — the fold, or (round 13,
    VERDICT r12 #2) the size()-guarded unrolled add/subtract chain:
    every (plane, dim) sign is a compile-time constant, so the fixed
    64-dim width collapses to plain codegen-able arithmetic with the
    SAME left-to-right evaluation order (bit-identical; multiplying by
    ±1 is an exact identity/negation, a-b == a+(-b) in IEEE)."""
    fold = _plane_fold_sql(j)
    if not unroll:
        return fold
    from .similarity import PLANE_UNROLL_DIM, plane_dot_chain_sql

    return (
        f"(CASE WHEN size(embedding) = {PLANE_UNROLL_DIM} "
        f"THEN {plane_dot_chain_sql(j, 'embedding')} ELSE {fold} END)"
    )


def _plane_bits_sql(planes: list[int], unroll: bool = False) -> str:
    """Packed sign bits of the deterministic SRP planes (JVM fold —
    bit-portable with the DuckDB mirror; ``unroll=True`` swaps each
    fold for the codegen-able constant-sign chain, same bits)."""
    bits = [
        f"(CASE WHEN {_plane_proj_sql(j, unroll)} > 0 THEN {1 << b}L ELSE 0L END)"
        for b, j in enumerate(planes)
    ]
    return " + ".join(bits)


def _plane_dot_sql(j_expr: str, j_values: list[int] | None = None) -> str:
    """Raw (unsigned) projection onto the deterministic +/-1 direction
    of plane ``j_expr`` — same sign family as the bucket planes, but the
    CONTINUOUS value, and the plane index may be a per-row SQL
    expression (band-dependent ordering).

    ``j_values`` (round 13): when the caller knows the finite set of
    plane indices ``j_expr`` can take (one per band), the projection
    dispatches through a CASE to the per-plane unrolled constant-sign
    chain — codegen-able, bit-identical (same guard/fallback story as
    :func:`_plane_proj_sql`)."""
    from .similarity import LSH_C1, LSH_C2, LSH_HALF, LSH_MOD

    sign = (
        f"(CASE WHEN ((({j_expr} + 1) * {LSH_C1}L + (i - 1) * {LSH_C2}L)"
        f" % {LSH_MOD}L) < {LSH_HALF}L THEN 1 ELSE -1 END)"
    )
    fold = (
        "aggregate(transform(sequence(1, size(embedding)), "
        f"i -> {sign} * CAST(embedding[i - 1] AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    if not j_values:
        return fold
    from .similarity import PLANE_UNROLL_DIM, plane_dot_chain_sql

    branches = " ".join(
        f"WHEN {j} THEN {plane_dot_chain_sql(j, 'embedding')}"
        for j in j_values
    )
    return (
        f"(CASE WHEN size(embedding) = {PLANE_UNROLL_DIM} "
        f"THEN (CASE ({j_expr}) {branches} ELSE {fold} END) "
        f"ELSE {fold} END)"
    )


def banded_srp_candidates(
    base: DataFrame,
    n_bands: int = 4,
    band_bits: int | None = None,
    max_bucket: int | None = KNN_ANN_MAX_BUCKET,
    ring_cap: int | None = KNN_ANN_RING_CAP,
    unroll_planes: bool = False,
) -> DataFrame:
    """Distinct candidate pairs (ida < idb) from banded random-hyperplane
    LSH over ``base`` (columns: id, embedding) — the shared candidate
    engine behind :func:`knn_edges_ann` and (since round 6)
    ``operators/similarity.cosine_dedup_pairs``. Hybrid skew controls
    default-on; ``band_bits=None`` auto-derives from a count. See
    :func:`knn_edges_ann` for the full semantics discussion."""
    if band_bits is None:
        band_bits = derive_band_bits(base.count())

    def band_bucket_sql(band: int) -> str:
        return _plane_bits_sql(
            [band * band_bits + b for b in range(band_bits)],
            unroll=unroll_planes,
        )

    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.expr(band_bucket_sql(band)).cast("int").alias("bkt"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bkt")
    # The signature table is referenced by SEVERAL downstream plans (the
    # bucket-size aggregate, the size join, and the exact/ring pair
    # branches); without a persist each reference recomputes all
    # n_bands * band_bits plane folds over the embeddings — measured as
    # a triple signature pass at 200k x 40 planes. The table itself is
    # skinny (id, band, bkt — ~24 B x n x n_bands; MEMORY_AND_DISK
    # spills rather than OOMs at 100 TB scale), the arrays stay behind.
    # Tracked for release on the next build (see _ANN_CACHES above).
    banded = _track_ann_cache(banded.persist())

    def exact_pairs(members: DataFrame) -> DataFrame:
        a = members.alias("a")
        b = members.alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))

    def ring_pairs(members: DataFrame, cap: int) -> DataFrame:
        # Ring candidates: rank bucket members by a CONTINUOUS random
        # projection — the raw (unsigned) dot against a deterministic
        # +/-1 direction, a DIFFERENT direction per band (plane index
        # offset past the banding planes). Near vectors project near, so
        # ring neighbors are angle-biased (a projection-sorted sliding-
        # window join, cf. random-projection sort-joins), and each band
        # contributes a DIFFERENT ordering, so the n_bands rings sample
        # diverse neighborhoods instead of one (hash ordering and a
        # shared bit-signature ordering both measured recall ~0.21 vs
        # 0.75 here; see tests). The sort of a hot bucket is O(m log m)
        # in one task — cheap; the quadratic JOIN OUTPUT was the killer.
        # Each member pos p equi-joins positions p+1..p+cap. Edge-of-
        # ring members get fewer forward candidates but appear as
        # backward candidates of their predecessors; the later
        # symmetrize covers both directions.
        if cap < 1:
            raise ValueError(f"ring_cap must be >= 1, got {cap}")
        proj = _plane_dot_sql(
            "(CAST(band AS INT) + " f"{n_bands * band_bits})",
            j_values=(
                [n_bands * band_bits + b for b in range(n_bands)]
                if unroll_planes
                else None
            ),
        )
        wpos = Window.partitionBy("band", "bkt").orderBy("proj", "id")
        wall = Window.partitionBy("band", "bkt")
        # `pos` feeds BOTH sides of the ring equi-join below; persist the
        # skinny ranked table (ids + positions, embeddings already
        # projected away) so the hot-member embedding join + projection
        # fold + double window run once, not twice.
        pos = _track_ann_cache(
            members.join(base.select("id", "embedding"), "id")
            .withColumn("proj", F.expr(proj))
            .withColumn("pos", F.row_number().over(wpos))
            .withColumn("maxpos", F.max("pos").over(wall))
            .select("band", "bkt", "id", "pos", "maxpos")
            .persist()
        )
        # Forward ring, clamped to the bucket's last position: without
        # the clamp every member of every bucket emits `cap` candidate
        # slots (a cap-fold inflation of the exploded table in small
        # buckets); the last member would even emit a DESCENDING
        # sequence. `when` gates the explode (NULL rows emit nothing).
        left = pos.select(
            "band",
            "bkt",
            F.col("id").alias("lid"),
            F.explode(
                F.when(
                    F.col("pos") < F.col("maxpos"),
                    F.sequence(
                        F.col("pos") + 1,
                        F.least(F.col("pos") + F.lit(cap), F.col("maxpos")),
                    ),
                )
            ).alias("tpos"),
        )
        right = pos.select(
            "band", "bkt", F.col("id").alias("rid"), F.col("pos").alias("tpos")
        )
        return left.join(right, ["band", "bkt", "tpos"]).select(
            F.least("lid", "rid").alias("ida"),
            F.greatest("lid", "rid").alias("idb"),
        )

    if max_bucket is not None:
        # Hot-bucket control — the LSH skew lever. Correlated/duplicated
        # data concentrates in few buckets (measured: one bucket held a
        # THIRD of a 200k corpus), making the within-bucket self-join
        # quadratic exactly where the hash is least discriminative. The
        # bucket-size table is buckets-sized (tiny) and broadcasts.
        # DEFAULT-ON since round 6; the registered queries' DuckDB
        # oracles mirror the hybrid exactly, so the capped semantics are
        # oracle-checked, not just bounded.
        sizes = banded.groupBy("band", "bkt").agg(F.count("*").alias("__bsz"))
        sized = banded.join(F.broadcast(sizes), ["band", "bkt"])
        small = sized.filter(F.col("__bsz") <= max_bucket).drop("__bsz")
        hot = sized.filter(F.col("__bsz") > max_bucket).drop("__bsz")
        if ring_cap is not None:
            # Hybrid: exact join inside sane buckets, ring-sample the
            # hot ones instead of dropping them.
            return exact_pairs(small).unionByName(
                ring_pairs(hot, ring_cap)
            ).distinct()
        # Skip hot buckets; members keep their other n_bands-1 bands.
        return exact_pairs(small).distinct()
    if ring_cap is not None:
        return ring_pairs(banded, ring_cap).distinct()
    return exact_pairs(banded).distinct()


# knn_edges_ann scoring strategy switch: at or below this corpus size
# the exact JVM-fold scoring path runs (bit-portable with the DuckDB
# oracle mirrors — every conformance corpus is under it); above it the
# vectorized bucket-local numpy path takes over (identical candidate
# geometry, float-noise-level cos differences only).
SCORING_FOLD_MAX_N = 4096
# Bound on the flat candidate table a single ring block materializes
# inside the bucket-local scorer (entries, not bytes; ~3 int64/float64
# arrays of this length live at once). Keeps a pathological
# multi-million-member hot bucket's task memory at a few hundred MB
# instead of member_count x 2*ring_cap.
RING_BLOCK_ENTRIES = 16_000_000


def _numpy_banded_signatures(
    base: DataFrame, n_bands: int, band_bits: int
) -> DataFrame:
    """Banded SRP signatures + ring projection via one vectorized Arrow
    pass (``mapInPandas``) — the bucket-path counterpart of the JVM
    fold expressions in :func:`banded_srp_candidates`.

    Emits n_bands rows per input row: (id, embedding, nrm, band, bkt,
    proj). Same deterministic +/-1 planes as the fold path — sign(j, i)
    = [((j+1)*C1 + i*C2) mod M < M/2] — evaluated as one (batch x dim)
    @ (dim x planes) float64 matmul instead of per-plane interpreted
    folds (measured: the 40-plane fold pass alone is ~9.4 s at 200k x
    64; the matmul is milliseconds). Bucket assignment can differ from
    the fold only where a plane dot sits within BLAS-reordering noise
    of zero — measure-zero; tests pin edge-set equality at sf0.1."""
    import numpy as np
    import pandas as pd

    from .similarity import LSH_C1, LSH_C2, LSH_HALF, LSH_MOD

    n_planes = n_bands * band_bits + n_bands  # bucket planes + proj planes

    def sig_fn(batches):
        planes = None
        weights = np.array([1 << b for b in range(band_bits)], dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if planes is None:
                dim = E.shape[1]
                j = np.arange(n_planes)[:, None]
                i = np.arange(dim)[None, :]
                planes = np.where(
                    ((j + 1) * LSH_C1 + i * LSH_C2) % LSH_MOD < LSH_HALF, 1.0, -1.0
                )
            P = E @ planes.T  # (batch, n_planes)
            bits = P[:, : n_bands * band_bits] > 0
            out = []
            for band in range(n_bands):
                bkt = (
                    bits[:, band * band_bits : (band + 1) * band_bits] @ weights
                ).astype(np.int32)
                out.append(
                    pd.DataFrame(
                        {
                            "id": pdf["id"].to_numpy(np.int64),
                            "embedding": pdf["embedding"],
                            "nrm": pdf["nrm"].to_numpy(np.float64),
                            "band": np.full(len(pdf), band, dtype=np.int32),
                            "bkt": bkt,
                            "proj": P[:, n_bands * band_bits + band],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return base.mapInPandas(
        sig_fn,
        schema=(
            "id long, embedding array<float>, nrm double, "
            "band int, bkt int, proj double"
        ),
    )


def _topk_set_mask(D, NB, kk: int):
    """Boolean mask selecting, per row of ``D``, the top-``kk`` entries
    by (value desc, neighbor id asc) — as a SET, in O(R*C) partition
    passes instead of a per-entry lexsort (the global merge downstream
    re-ranks, so intra-bucket output order is irrelevant; only WHICH
    candidates survive matters, and exact-value ties — duplicate
    vectors — must resolve to the LOWEST neighbor ids to match the
    fold path's global (cos DESC, id ASC) rank).

    D: (R, C) float64, -inf padding for absent entries. NB: (R, C)
    int64 neighbor ids (padding arbitrary)."""
    import numpy as np

    R, C = D.shape
    kk = min(kk, C)
    # per-row boundary = kk-th largest value
    b = -np.partition(-D, kk - 1, axis=1)[:, kk - 1 : kk]
    strict = D > b
    # ties AT the boundary: take the `need` smallest neighbor ids
    finite_eq = (D == b) & np.isfinite(D)
    need = (kk - strict.sum(axis=1)).astype(np.int64)
    big = np.iinfo(np.int64).max
    nidq = np.where(finite_eq, NB, big)
    small = np.sort(np.partition(nidq, kk - 1, axis=1)[:, :kk], axis=1)
    thr = np.take_along_axis(
        small, np.maximum(need - 1, 0)[:, None], axis=1
    )
    take_eq = finite_eq & (NB <= thr) & (need[:, None] > 0)
    return strict | take_eq


def _bucket_local_topk(
    exploded: DataFrame,
    k: int,
    max_bucket: int | None,
    ring_cap: int | None,
) -> DataFrame:
    """Vectorized per-bucket top-k — the at-scale scoring path of
    :func:`knn_edges_ann`.

    Input: one row per (vector, band) with the band bucket id and the
    continuous ring projection (columns: id, embedding, nrm, band, bkt,
    proj). Each (band, bkt) group computes its own top-k entirely
    inside one Arrow batch (``applyInPandas``): candidate PAIRS are
    never materialized as a DataFrame, so the 93M-row candidate
    shuffle + 64-dim interpreted cosine folds + 187M-row window sort
    of the fold path collapse into one grouped shuffle of the corpus
    (x n_bands) and a few GFLOP of BLAS.

    Semantics match the fold path exactly: buckets within
    ``max_bucket`` score all within-bucket pairs (dense U @ U.T);
    hot buckets score only the ring — each member against its next
    ``ring_cap`` neighbors in (proj, id) order, the same ordering the
    fold path's ring join uses. Per-member selection keeps the best
    ``k`` by (cos desc, neighbor_id asc) — the global merge of
    per-bucket top-ks equals the global top-k over the union of bucket
    candidate sets (top-k(∪S_i) ⊆ ∪ top-k(S_i)).

    100-TB notes: one (band, bucket) group = one task; the grouped
    shuffle carries the embeddings (n_bands x corpus bytes). Bucket
    occupancy is held ~constant by derive_band_bits, so group memory
    is bounded by max_bucket for sane buckets and by the hot-bucket
    member count for ring buckets (a 10M-member pathological bucket is
    ~2.5 GB of float32 at 64 dims in one task — shard such buckets by
    proj-range with a ring_cap overlap before grouping if a corpus
    ever produces one)."""
    import numpy as np
    import pandas as pd

    ring_block_entries = RING_BLOCK_ENTRIES  # driver-side read (testable)

    def bucket_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "neighbor_id": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        if m < 2:
            return empty
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        ids = pdf["id"].to_numpy(np.int64)
        U = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        U /= pdf["nrm"].to_numpy(np.float64)[:, None]
        kk = min(k, m - 1)
        # branch parity with the fold engine: dense when uncapped or
        # within max_bucket; ring when a ring_cap applies (pure-ring
        # mode rings EVERY bucket); skip-only mode drops hot buckets
        dense = (max_bucket is None and ring_cap is None) or (
            max_bucket is not None and m <= max_bucket
        )
        if not dense and ring_cap is None:
            return empty  # skip-only mode: hot bucket dropped entirely
        if dense:
            G = U @ U.T
            np.fill_diagonal(G, -np.inf)
            NB = np.broadcast_to(ids, (m, m))
            mask = _topk_set_mask(G, NB, kk)
            qi, nj = np.nonzero(mask)
            q = ids[qi]
            nb = ids[nj]
            cs = G[qi, nj]
        else:
            c = min(ring_cap, m - 1)
            order = np.lexsort((ids, pdf["proj"].to_numpy(np.float64)))
            ids_s = ids[order]
            Us = U[order]
            # Blocked ring scan: a flat (member x 2*cap) candidate
            # table would be the bucket's memory hazard at pathological
            # sizes (10M members x cap 128 = 20 GB of float64), so
            # members are processed in row blocks bounded by
            # RING_BLOCK_ENTRIES candidate entries. Every ring pair
            # (p, p+d) is computed exactly once — in the block that
            # owns query row p — and emitted for BOTH directions; a
            # query's candidates therefore span at most two blocks'
            # emissions, and the global (query, neighbor) merge + rank
            # downstream makes the union equal to the unblocked top-k
            # (tests pin equality under a tiny forced block size).
            blk = max(1, ring_block_entries // (2 * c))
            out_q, out_n, out_c = [], [], []
            for s in range(0, m, blk):
                e = min(s + blk, m)
                # rows touched by this block's pairs: queries p in
                # [s, e) (forward) and p+d up to e-1+c (backward)
                hi = min(e + c, m)
                R = hi - s
                D = np.full((R, 2 * c), -np.inf)
                NB = np.zeros((R, 2 * c), np.int64)
                for d in range(1, c + 1):
                    p_end = min(e, m - d)  # pairs (p, p+d), p in [s, p_end)
                    if p_end <= s:
                        break
                    dots = np.einsum(
                        "ij,ij->i", Us[s:p_end], Us[s + d : p_end + d]
                    )
                    rr = np.arange(s - s, p_end - s)
                    D[rr, d - 1] = dots  # forward: query p
                    NB[rr, d - 1] = ids_s[s + d : p_end + d]
                    D[rr + d, c + d - 1] = dots  # backward: query p+d
                    NB[rr + d, c + d - 1] = ids_s[s:p_end]
                mask = _topk_set_mask(D, NB, kk)
                qi, cj = np.nonzero(mask)
                out_q.append(ids_s[qi + s])
                out_n.append(NB[qi, cj])
                out_c.append(D[qi, cj])
            if not out_q:
                return empty
            q = np.concatenate(out_q)
            nb = np.concatenate(out_n)
            cs = np.concatenate(out_c)
        return pd.DataFrame({"query_id": q, "neighbor_id": nb, "cos_sim": cs})

    return exploded.groupBy("band", "bkt").applyInPandas(
        bucket_fn, schema="query_id long, neighbor_id long, cos_sim double"
    )


def _bucket_local_threshold_pairs(
    exploded: DataFrame,
    threshold: float,
    max_bucket: int | None,
    ring_cap: int | None,
) -> DataFrame:
    """Vectorized per-bucket THRESHOLD pairs (id_a < id_b, cos >=
    threshold) — the at-scale pass-1 of
    ``operators/similarity.cosine_dedup_pairs``, sibling of
    :func:`_bucket_local_topk` (same input contract and candidate
    geometry: dense within sane buckets, proj-ordered ring within hot
    ones). Non-qualifying candidate pairs never leave the numpy batch;
    the only shuffle after the grouped one is the cross-band dedupe of
    the (output-sized) qualifying pairs."""
    import numpy as np
    import pandas as pd

    def bucket_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        if m < 2:
            return empty
        ids = pdf["id"].to_numpy(np.int64)
        U = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        U /= pdf["nrm"].to_numpy(np.float64)[:, None]
        dense = (max_bucket is None and ring_cap is None) or (
            max_bucket is not None and m <= max_bucket
        )
        if not dense and ring_cap is None:
            return empty  # skip-only mode: hot bucket dropped entirely
        if dense:
            order = np.argsort(ids, kind="mergesort")
            ids_o = ids[order]
            G = U[order] @ U[order].T
            iu, ju = np.triu_indices(m, k=1)
            cs = G[iu, ju]
            sel = cs >= threshold
            a, b, cs = ids_o[iu[sel]], ids_o[ju[sel]], cs[sel]
        else:
            c = min(ring_cap, m - 1)
            order = np.lexsort((ids, pdf["proj"].to_numpy(np.float64)))
            ids_s = ids[order]
            Us = U[order]
            outs_a, outs_b, outs_c = [], [], []
            for d in range(1, c + 1):
                dots = np.einsum("ij,ij->i", Us[:-d], Us[d:])
                sel = dots >= threshold
                if sel.any():
                    la, lb = ids_s[:-d][sel], ids_s[d:][sel]
                    outs_a.append(np.minimum(la, lb))
                    outs_b.append(np.maximum(la, lb))
                    outs_c.append(dots[sel])
            if not outs_a:
                return empty
            a = np.concatenate(outs_a)
            b = np.concatenate(outs_b)
            cs = np.concatenate(outs_c)
        return pd.DataFrame({"id_a": a, "id_b": b, "cos_sim": cs})

    parts = exploded.groupBy("band", "bkt").applyInPandas(
        bucket_fn, schema="id_a long, id_b long, cos_sim double"
    )
    # a pair can qualify in several bands with (near-)identical cosines;
    # one row per pair, deterministic value
    return parts.groupBy("id_a", "id_b").agg(F.max("cos_sim").alias("cos_sim"))


def banded_signature_table(
    base: DataFrame, n_bands: int, band_bits: int
) -> DataFrame:
    """(id, band, bkt) — one row per (vector, band), JVM-fold signatures
    (bit-portable with the DuckDB mirrors). ``base``: id, embedding."""
    return base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.expr(
                            _plane_bits_sql(
                                [band * band_bits + b for b in range(band_bits)]
                            )
                        )
                        .cast("int")
                        .alias("bkt"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bkt")


def knn_topk_append_batch(
    new_vectors: DataFrame,
    existing_vectors: DataFrame,
    existing_topk: DataFrame,
    k: int = 3,
    n_bands: int = 4,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """One increment of kNN-graph maintenance: fold the new batch into a
    persisted directed top-k state WITHOUT re-scoring the old corpus
    against itself — the kNN sibling of ``minhash_incremental_pairs``
    (docs), ``ivf_append_batch`` (cells) and the PQ streaming ingest.

    Candidates are the banded-SRP bucket matches between NEW vectors
    and (existing + new); each candidate pair is exactly cosine-scored
    once — in the batch where its LATER member arrives — so the union
    of all increments sees exactly the candidate set of the uncapped
    batch build (same bucket condition, same fold scoring). The
    existing directed top-k rows join the new candidate rows and
    re-rank per node: a new vector can both acquire its own neighbors
    and displace an old node's current neighbor.

    Deliberately UNCAPPED (no max_bucket/ring_cap): ring sampling
    orders by full bucket membership, which changes as batches arrive
    — it would make the result depend on batch boundaries. Exactness
    contract (pytest-pinned): the final state is IDENTICAL however the
    corpus is split into batches, and its u<v edge derivation equals
    ``knn_edges_ann(..., max_bucket=None, ring_cap=None,
    scoring="fold")`` on the full corpus. ``band_bits`` is pinned (no
    auto-derive): the signature geometry must not drift between
    batches.

    Returns (updated_topk, new_vector_rows): the FULL replacement
    top-k state (<= k rows per node) and the batch's (id, embedding,
    nrm) rows for the vector index append. At 100 TB you would rewrite
    only the touched nodes (query_ids present in the scored candidate
    set) through a partition-pruned MERGE/replace instead of a full
    state rewrite; the state itself stays edge-count-bounded either
    way (n x k rows).
    """
    from .similarity import dot_sql, norm_sql

    base_new = new_vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("embedding"),
        F.expr(norm_sql(vec_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    all_vecs = existing_vectors.unionByName(base_new)

    sig_new = banded_signature_table(base_new, n_bands, band_bits)
    sig_all = banded_signature_table(all_vecs, n_bands, band_bits)
    cand = (
        sig_new.alias("a")
        .join(
            sig_all.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least("a.id", "b.id").alias("ida"),
            F.greatest("a.id", "b.id").alias("idb"),
        )
        .distinct()
    )
    va = all_vecs.select(
        F.col("id").alias("ida"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    vb = all_vecs.select(
        F.col("id").alias("idb"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        cand.join(va, "ida")
        .join(vb, "idb")
        .select(
            "ida",
            "idb",
            (
                F.expr(dot_sql("ea", "eb")) / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
    )
    both = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ida").alias("query_id"),
                    F.col("idb").alias("neighbor_id"),
                ),
                F.struct(
                    F.col("idb").alias("query_id"),
                    F.col("ida").alias("neighbor_id"),
                ),
            )
        ).alias("qn"),
        "cos_sim",
    ).select("qn.query_id", "qn.neighbor_id", "cos_sim")
    # dedupe (query, neighbor) BEFORE ranking: in normal forward
    # progress the state never overlaps the new candidates (every new
    # pair touches a vector no prior batch has seen), but a foreachBatch
    # REPLAY re-scores a batch the state already integrated — without
    # the dedupe the duplicate row eats a rank slot and evicts the
    # node's true k-th neighbor (cos values of duplicates are identical,
    # so max() is exact)
    merged = (
        existing_topk.unionByName(both)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    updated = (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
    return updated, base_new


def knn_topk_to_edges(topk: DataFrame) -> DataFrame:
    """Directed top-k state -> the undirected (u < v, cos_sim) edge
    contract of :func:`knn_edges` / :func:`knn_edges_ann`."""
    return (
        topk.select(
            F.least("query_id", "neighbor_id").alias("u"),
            F.greatest("query_id", "neighbor_id").alias("v"),
            "cos_sim",
        )
        .distinct()
    )


def knn_edges_ann(
    vectors: DataFrame,
    k: int = 3,
    n_bands: int = 4,
    band_bits: int | None = None,
    max_bucket: int | None = KNN_ANN_MAX_BUCKET,
    ring_cap: int | None = KNN_ANN_RING_CAP,
    scoring: str = "auto",
) -> DataFrame:
    """The SCALE path for the kNN graph build: banded random-hyperplane
    LSH candidate generation instead of the brute-force cross product.

    Each vector hashes to ``n_bands`` band buckets (``band_bits``
    deterministic hyperplane signs per band — same integer sign pattern
    as operators/similarity.py); candidate pairs share at least one
    band. Candidates self-join as an EQUI-join on (band, bucket) —
    shuffle-partitioned, quadratic only within a bucket, NO broadcast of
    the corpus — then embeddings join back BY ID (arrays never ride the
    band shuffle; the minhash lesson), exact cosines rank per node, and
    the per-node top-k symmetrizes to u<v edges exactly like
    :func:`knn_edges`. Recall < 1 by construction (a true neighbor in
    no shared band is missed); tests/test_graph.py measures it against
    the exact builder.

    ``band_bits=None`` (the default) derives the band width from a
    corpus count: ``max(4, ceil(log2(n / 256)))`` — one eager count job
    at build time, in exchange for bucket occupancy that stays ~constant
    as the corpus grows (the log2 prescription SCALE_r5.md measured).
    Pass an explicit int to pin the geometry (oracle-comparable runs).

    Skew controls (DEFAULT-ON since round 6 — the 100-TB-safe call is
    the zero-argument call; pass ``max_bucket=None, ring_cap=None`` to
    get the uncapped build):

    ``max_bucket`` alone — skip buckets larger than the cap entirely
    (members keep their other bands). Blunt; loses all candidates from
    the skipped band.

    ``ring_cap`` alone — BOUNDED ring candidate generation everywhere:
    members of each (band, bucket) are ranked by a deterministic hash
    and each member pairs only with the next ``ring_cap`` positions.
    The quadratic within-bucket self-join becomes a pure equi-join on
    (band, bucket, position) whose output is <= members x ring_cap rows
    — LINEAR in bucket size, and the blow-up never materializes (vs
    max_bucket, which must first count the bucket it then throws away).
    With ring_cap >= the largest bucket the output is IDENTICAL to the
    uncapped build (tests pin this); below that it SAMPLES candidates
    (hash order ~ random permutation), which measurably costs recall on
    a diverse corpus — use the hybrid below instead.

    ``max_bucket`` + ``ring_cap`` (the recommended skew posture) —
    buckets within max_bucket keep the EXACT within-bucket join; buckets
    above it are RING-SAMPLED instead of skipped. Exactness is preserved
    everywhere except genuine hot buckets. Rings are ordered by a
    continuous per-band random projection, which makes the sampling
    LOSSLESS for the duplicate-concentration shape that creates hot
    buckets in practice (the measured 100x corpus): exact/near copies
    project (near-)identically, sort consecutively, and any ring cap >=
    the copy-group size finds every duplicate pair. For a DIVERSE hot
    bucket (clustered-but-distinct vectors) the ring is a partial
    sample — measured here: no 1-D ordering localizes true kNN inside a
    64-dim mega-bucket — so the first lever there is more band_bits
    (~log2(n/target_occupancy)); the ring bounds the cost of whatever
    skew remains. Always strictly better recall than skipping, at the
    same bounded candidate count (<= members x ring_cap per bucket).

    ``scoring`` selects the physical strategy, NOT the candidate
    geometry (both strategies see identical (band, bucket, ring)
    candidate sets and identical deterministic tie-breaks):

    * ``"fold"`` — candidate pairs materialize, embeddings join back by
      id, exact cosines via the JVM left-to-right double fold:
      bit-portable with the DuckDB oracle mirror. Cost at 200k vectors:
      a ~93M-row pair shuffle + interpreted 64-dim folds + a 187M-row
      window sort (measured, SCALE_r6.md).
    * ``"bucket"`` — :func:`_bucket_local_topk`: per-bucket vectorized
      top-k inside Arrow batches; pairs never materialize. cos_sim
      differs from the fold by float summation order only (BLAS vs
      left fold, ~1e-15 relative); tests pin edge-set equality on the
      sf0.1 corpus.
    * ``"auto"`` (default) — ``"fold"`` at or below SCORING_FOLD_MAX_N
      corpus rows (covers every conformance corpus; exactness is free
      there), ``"bucket"`` above (the 100-TB call).
    """
    from .similarity import dot_sql, norm_sql

    if scoring not in ("auto", "fold", "bucket"):
        raise ValueError(f"scoring must be auto|fold|bucket, got {scoring!r}")
    release_ann_caches()  # previous build's tracked intermediates
    base = vectors.select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.expr(norm_sql("embedding")).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    n = base.count()
    if band_bits is None:
        band_bits = derive_band_bits(n)
    if scoring == "auto":
        scoring = "fold" if n <= SCORING_FOLD_MAX_N else "bucket"

    if scoring == "bucket":
        exploded = _numpy_banded_signatures(base, n_bands, band_bits)
        parts = _bucket_local_topk(exploded, k, max_bucket, ring_cap)
        # a pair found in several bands scores (near-)identically in
        # each; collapse to one row per direction before the final rank
        both = parts.groupBy("query_id", "neighbor_id").agg(
            F.max("cos_sim").alias("cos_sim")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        topk = both.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
        return (
            topk.select(
                F.least("query_id", "neighbor_id").alias("u"),
                F.greatest("query_id", "neighbor_id").alias("v"),
                "cos_sim",
            )
            .distinct()
        )

    cand = banded_srp_candidates(base, n_bands, band_bits, max_bucket, ring_cap)
    # Join-back physical strategy: the candidate table is pairs-sized
    # (tens of millions of skinny rows at 100x) while the vector table
    # is corpus-sized; when the corpus fits a broadcast
    # (JOINBACK_BROADCAST_MAX_ROWS, ~64 MB of float32 at 64 dims) the
    # two join-backs skip shuffling the candidate table twice. Beyond
    # the bound — the real 100 TB corpus — the shuffle join is correct
    # and this hint stays off. Plan-only: output is unchanged.
    bcast = n <= JOINBACK_BROADCAST_MAX_ROWS
    va = base.select(
        F.col("id").alias("ida"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    vb = base.select(
        F.col("id").alias("idb"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        cand.join(F.broadcast(va) if bcast else va, "ida")
        .join(F.broadcast(vb) if bcast else vb, "idb")
        .select(
            "ida",
            "idb",
            (
                F.expr(dot_sql("ea", "eb")) / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
    )
    # Symmetrize by EXPLODE, not union-of-two-projections: `scored` is
    # the expensive end of the pipeline (candidate join-backs + exact
    # cosines), and under a broadcast join-back there is no shuffle
    # exchange for Spark to reuse — a union would execute the whole
    # scoring plan twice. One generator row -> two (query, neighbor)
    # rows, cosines computed once, bit-identical output.
    both = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ida").alias("query_id"),
                    F.col("idb").alias("neighbor_id"),
                ),
                F.struct(
                    F.col("idb").alias("query_id"),
                    F.col("ida").alias("neighbor_id"),
                ),
            )
        ).alias("qn"),
        "cos_sim",
    ).select("qn.query_id", "qn.neighbor_id", "cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    topk = both.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return (
        topk.select(
            F.least("query_id", "neighbor_id").alias("u"),
            F.greatest("query_id", "neighbor_id").alias("v"),
            "cos_sim",
        )
        .distinct()
    )
