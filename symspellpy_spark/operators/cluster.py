"""Duplicate clustering: iterative hash-min connected components.

Spark has no recursive operator, so the fixpoint loop is driven from
Python over DataFrames (SURVEY.md §4): each iteration propagates the
minimum label across edges, ``localCheckpoint`` cuts lineage, and
convergence is an aggregate check. Large-star/small-star style
alternation is unnecessary at the label-propagation sizes we produce
(edges are already deduplicated verified pairs); the hot-key danger is
the giant-cluster hub, mitigated by propagating in BOTH directions in
one shuffle and by AQE skew handling on the join.

Output labels are stable: the minimum member id of each component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """-> (id, cluster_id) where cluster_id = min id reachable.

    ``vertices`` (one ``id`` column) optionally adds isolated vertices,
    which come back as singleton clusters (cluster_id = id).
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
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("changed"),
            )
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
