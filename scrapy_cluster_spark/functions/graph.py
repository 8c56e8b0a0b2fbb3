"""Graph helpers for dedup clustering: connected components over the
near-dup pair graph → one canonical doc per duplicate cluster.

The reference has no graph code (scrapy-cluster dedups URLs, not
documents); this is the training-data-pipeline step downstream of the
pair-producing dedup families (MinHash / SimHash / embedding LSH):
pairs only SAY two docs are dups — corpus dedup needs the transitive
closure so each cluster keeps exactly one representative.

Algorithm: min-label propagation to fixpoint (each vertex repeatedly
takes the min label among itself and its neighbors).  One shuffle join
+ one grouped min per round; converges in O(graph diameter) rounds —
near-dup clusters are dense (quasi-cliques), so typically 2-3 rounds.
At 10⁹-edge scale the same loop is the standard Spark CC shape
(alternate large-star/small-star to bound diameter); lineage is
truncated per round with localCheckpoint (a production job checkpoints
to reliable storage / a temp table instead).  Deterministic: labels
are ids, min is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) where component = min id reachable over the
    undirected edge set.  Isolated vertices label themselves.

    Fixpoint-checked: stops as soon as a round changes nothing (the
    per-round convergence probe is a LIMIT 1 count — O(1) result, one
    cheap job on the already-checkpointed labels)."""
    # materialize the (possibly expensive — e.g. a full MinHash+LSH
    # pipeline) edge plan ONCE: the loop below re-reads it every round
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionAll(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "d"), "d")
            .groupBy("s")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("s", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("component", "new_component")
            .join(labels, "id")
            .filter(F.col("new_component") != F.col("component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Docs + near-dup pairs → (doc_id, cluster_id, is_canonical):
    cluster_id = min doc_id in the connected component; the canonical
    (kept) doc is the one equal to its cluster id — the deterministic
    keep-lowest-id policy exact_dedup already uses."""
    cc = connected_components(docs, pairs, id_col, a_col, b_col)
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
