"""Duplicate clustering: iterative hash-min connected components.

Spark has no recursive operator, so the fixpoint loop is driven from
Python over DataFrames (SURVEY.md §4): each iteration propagates the
minimum label across edges AND pointer-jumps (label <- label's label),
``localCheckpoint`` cuts lineage, and convergence is an aggregate
check. Plain hash-min moves the component minimum one hop per
iteration — O(diameter) Spark jobs, and near-dup graphs DO have long
chains (partial-overlap docs A~B~C~... from the winnowing/substring
sweeps); the jumping step halves the remaining distance each round,
so convergence is O(log diameter) jobs, which is what bounds the
driver-loop floor at cluster scale. Large-star/small-star style
alternation is unnecessary at the label-propagation sizes we produce
(edges are already deduplicated verified pairs); the hot-key danger is
the giant-cluster hub, mitigated by propagating in BOTH directions in
one shuffle, by AQE skew handling on the joins, and by the jump join
having exactly one build row per key (skewed probe keys stream against
a single match — no fan-out).

Output labels are stable: the minimum member id of each component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "select_canonical"]


def select_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    text_col: str = "text",
    keep=None,
) -> DataFrame:
    """The deduplicated corpus: one ``id_col`` row per surviving doc —
    every document in no duplicate cluster, plus exactly ONE
    representative per cluster.

    ``clusters`` maps ``id_col`` -> ``cluster_col`` for clustered docs
    (the shape :func:`connected_components` / ``DedupPipeline.clusters``
    emit). ``keep`` is a struct Column MINIMIZED per cluster to pick the
    representative; the default keeps the longest ``text_col``, ties
    broken by smallest id — deterministic, so reruns and retries select
    the same survivor set.

    Scale shape: representative selection is a single hash aggregation
    (``min(struct(...))`` — partial map-side combine, no window sort,
    no per-cluster explode), and the non-clustered side is a left-anti
    join on the id. Both shuffle on keys the upstream stages already
    partition by.
    """
    if keep is None:
        keep = F.struct(
            (-F.length(F.col(text_col))).alias("p"),
            F.col(id_col).alias("i"),
        )
    member = docs.join(clusters.select(id_col, cluster_col), id_col)
    reps = (
        member.groupBy(cluster_col)
        .agg(F.min(keep).alias("_k"))
        .select(F.col("_k.i").alias(id_col))
    )
    untouched = docs.join(
        clusters.select(id_col), id_col, "left_anti"
    ).select(id_col)
    return untouched.unionByName(reps)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    pointer_jumping: bool = True,
    pointer_jumping_after: int = 3,
) -> DataFrame:
    """-> (id, cluster_id) where cluster_id = min id reachable.

    ``vertices`` (one ``id`` column) optionally adds isolated vertices,
    which come back as singleton clusters (cluster_id = id).

    ``pointer_jumping`` compresses label chains (label <- label(label)):
    labels are monotonically nonincreasing and ``label <= id`` is
    invariant, so the jump can only tighten, and a path graph converges
    in O(log n) iterations instead of O(n). The jump join costs ~20%
    per iteration (measured on bench-shaped dup graphs), and typical
    near-dup components converge in <= ``pointer_jumping_after``
    one-hop rounds anyway, so jumping engages ADAPTIVELY — only from
    iteration ``pointer_jumping_after`` on, i.e. only when plain
    propagation has demonstrably not finished (long chains from
    partial-overlap docs, giant boilerplate components). Small graphs
    pay nothing; pathological ones still get O(log d).
    """
    e = (
        edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # undirected: one table with both orientations; propagation becomes a
    # single groupBy instead of two joins
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))

    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    und = und.localCheckpoint(eager=True)

    for it in range(max_iterations):
        # candidate new label per vertex: min over (own, neighbours' labels)
        neigh = (
            und.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "id")
        )
        stepped = labels.join(neigh, "id", "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
            F.col("label").alias("_old"),
        )
        if pointer_jumping and it >= pointer_jumping_after:
            # label <- label(label): every label value IS a vertex id
            # (labels start at id and only ever take other vertices'
            # labels), so the build side has exactly one row per key and
            # the jump is a plain equi-join, skew-safe by construction
            ptr = stepped.select(
                F.col("id").alias("_pid"), F.col("label").alias("_plabel")
            )
            stepped = stepped.join(
                ptr, stepped["label"] == ptr["_pid"], "left"
            ).select(
                "id",
                F.coalesce(F.col("_plabel"), F.col("label")).alias("label"),
                "_old",
            )
        new_labels = stepped.select(
            "id",
            "label",
            (F.col("label") < F.col("_old")).alias("changed"),
        )
        if checkpoint_every and (it % checkpoint_every == 0):
            # lazy checkpoint: the convergence count below materializes it,
            # so lineage is cut without an extra serial job per iteration
            new_labels = new_labels.localCheckpoint(eager=False)
        n_changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    out = labels.select("id", F.col("label").alias("cluster_id"))
    if vertices is not None:
        singles = vertices.select("id").distinct().join(out, "id", "left_anti")
        out = out.unionByName(
            singles.select("id", F.col("id").alias("cluster_id"))
        )
    return out
