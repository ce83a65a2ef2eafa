"""Link-graph analytics over the crawl output — PageRank and connected
components. Both are iterative DataFrame algorithms: the driver loop
only sequences Spark jobs; all per-edge work stays distributed.

Why these live in a crawler engine: PageRank over the discovered link
graph is the classic frontier-prioritization signal (the reference
crawls breadth-first — ``crawler/discovery.py`` — which is exactly
rank-free PageRank's first iteration), and connected components is the
canonical post-near-dup step: minhash/simhash emit PAIRS
(operators/dedup.py), and picking one canonical doc per duplicate
CLUSTER requires the transitive closure of those pairs.

Scale notes (10^10 nodes):
* every iteration is one hash join edges⋈ranks (shuffle on src) + one
  aggregation (shuffle on dst) — the same two shuffles Pregel-style
  systems pay; pre-partitioning both edge directions by their join key
  would co-locate them across iterations on a real cluster;
* each generation's LINEAGE IS CUT with a checkpoint (``_next_gen``):
  every iteration references the previous generation 2-3×, so with
  persist alone the logical plan tree doubles per iteration —
  execution stays cached but Catalyst re-optimization and the
  listener's plan stringification walk the exponential tree (measured:
  ~90 s of pure ``generateTreeString`` CPU by iteration 10 of a
  10-node-chain CC). GraphFrames checkpoints its CC every 2 iterations
  for exactly this reason; here every generation is already
  materialized (the convergence check / generation release needs it),
  so the cut is free. A reliable checkpoint is used when the context
  has a checkpoint dir (production — survives executor loss);
  otherwise ``localCheckpoint`` (local/test mode);
* connected_components is hash-min label propagation: O(diameter)
  rounds, which on web graphs is small (~20); the O(log n)
  alternating large-star/small-star variant (Kiveris et al., "Connected
  Components in MapReduce", SoCC'14) drops in here if a pathological
  diameter ever matters — same join/agg shapes per round;
* convergence checks are one scalar aggregate per round (no data to
  the driver beyond a count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Sums that must be bit-identical across engines/partitionings go
# through fixed-point accumulation (see __spark_entry__ header rule).
_DEC = "decimal(38,18)"


def _nodes_of(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def _next_gen(df: DataFrame) -> DataFrame:
    """Materialize one iteration's output AND cut its plan lineage.

    Returns a DataFrame backed by the computed blocks with an O(1)
    logical plan (a scan leaf), so the next iteration's plan does not
    embed this one's — see the module docstring for why persist alone
    is not enough (exponential plan-tree growth). Reliable checkpoint
    when ``spark.sparkContext.setCheckpointDir`` was called (the
    production setting — generation blocks survive executor loss);
    ``localCheckpoint`` otherwise. Superseded generations are released
    by the context cleaner when their python/JVM references drop at
    the next rebind."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:  # noqa: BLE001 — API variance across versions
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution:

        r'(v) = (1-d)/n + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/n)

    Returns (id, rank). Deterministic across partitionings: the two
    per-iteration sums (in-contributions, dangling mass) accumulate in
    DECIMAL(38,18), so the result is reproducible and oracle-checkable
    bit-for-bit; scalar factors (n, dangling) stay in the plan as
    1-row crossJoins — nothing collects to the driver."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = _nodes_of(e, "src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))  # 1-row scalar
    outdeg = e.groupBy("src").agg(F.count("*").alias("od")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    ranks = _next_gen(
        nodes.crossJoin(n1).select("id", (F.lit(1.0) / F.col("n")).alias("r"))
    )
    for i in range(n_iter):
        # _next_gen materializes the new generation (both uses of the
        # previous one — contrib + dangling — read its checkpoint
        # blocks) and cuts the plan, so the loop's plan/lineage cost is
        # O(1) per iteration instead of doubling. ``checkpoint_every``
        # trades that per-iteration materialization barrier against
        # plan growth: between pins the plan doubles per iteration
        # (ranks is read twice per step), so k unpinned iterations cost
        # a 2^k plan tree — fine for small fixed n_iter (the VERDICT-r4
        # fixed-iteration mode: fewer driver barriers, same bit-exact
        # decimal result), ruinous for convergence-loop use; the final
        # iteration always materializes so callers get a scan leaf.
        ranks_next = _pagerank_step(e, nodes, outdeg, n1, ranks, damping)
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks_next = _next_gen(ranks_next)
        ranks = ranks_next
    out = ranks.select("id", F.col("r").alias("rank"))
    nodes.unpersist()
    outdeg.unpersist()
    return out


def _pagerank_step(
    e: DataFrame,
    nodes: DataFrame,
    outdeg: DataFrame,
    n1: DataFrame,
    ranks: DataFrame,
    damping: float,
) -> DataFrame:
    """One PageRank iteration as a pure plan (un-materialized) — split
    out so the physical-plan audit (scripts/explain_audit.py) can pin
    the per-iteration join/agg shapes, which the checkpoint leaf hides
    from the final plan."""
    contrib = (
        e.join(ranks, e.src == ranks.id)
        .join(outdeg, "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum((F.col("r") / F.col("od")).cast(_DEC)).cast("double").alias("c"))
    )
    dangling = (
        ranks.join(outdeg, ranks.id == outdeg.src, "left_anti")
        .agg(F.sum(F.col("r").cast(_DEC)).cast("double").alias("dang"))
        .select(F.coalesce("dang", F.lit(0.0)).alias("dang"))
    )
    return (
        nodes.join(contrib, "id", "left")
        .crossJoin(n1)
        .crossJoin(dangling)
        .select(
            "id",
            (
                F.lit(1.0 - damping) / F.col("n")
                + F.lit(damping)
                * (F.coalesce("c", F.lit(0.0)) + F.col("dang") / F.col("n"))
            ).alias("r"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    strict: bool = False,
) -> DataFrame:
    """Connected components by hash-min label propagation: every node
    starts labeled with its own id; each round every node takes the
    minimum label among itself and its neighbors; converged when a
    round changes nothing. Returns (id, component) where component is
    the minimum node id in the component — the canonical-representative
    convention the dedup family's keep-min policy already uses
    (operators/dedup.exact_dedup).

    Rounds = graph diameter (small on web/dup graphs: near-dup clusters
    are dense, diameter 2-3). Each round: one join (shuffle on id) +
    one min-agg (shuffle on neighbor) + one scalar convergence count.

    No-silent-caps: if propagation has not converged after ``max_iter``
    rounds (a long-path graph with eccentricity > max_iter), the labels
    are only partially propagated — ``strict=True`` raises, the default
    emits a ``RuntimeWarning`` with the residual changed-label count so
    a caller never mistakes truncated labels for converged components."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.persist(StorageLevel.MEMORY_AND_DISK)
    labels = _next_gen(
        _nodes_of(und, "a", "b").select("id", F.col("id").alias("label"))
    )
    changed = 0
    for _ in range(max_iter):
        prev = labels
        # lineage cut per generation (see _next_gen): the convergence
        # join below compares two checkpoint leaves, not two copies of
        # the whole iteration history
        labels = _next_gen(_cc_step(und, labels))
        changed = (
            labels.join(prev.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components: not converged after {max_iter} rounds "
            f"({changed} labels still changing) — returned labels are "
            "partially propagated; raise max_iter (rounds needed = graph "
            "eccentricity)"
        )
        if strict:
            und.unpersist()
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    out = labels.select("id", F.col("label").alias("component"))
    und.unpersist()
    return out


def _cc_step(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One hash-min label-propagation round as a pure plan — split out
    for the physical-plan audit (see _pagerank_step)."""
    neigh_min = (
        und.join(labels, und.a == labels.id)
        .groupBy(F.col("b").alias("id"))
        .agg(F.min("label").alias("nlabel"))
    )
    return labels.join(neigh_min, "id", "left").select(
        "id", F.least("label", F.coalesce("nlabel", "label")).alias("label")
    )
