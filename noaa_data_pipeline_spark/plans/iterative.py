"""Iterative algorithms as driver-looped DataFrame programs.

Spark's model for iteration is a driver loop over declarative steps
with persisted intermediates — each iteration is one distributed
pass, lineage is cut between rounds so plans stay bounded. K-means
over the embeddings table is the demonstrator (it is also the real
assignment step the IVF index in plans/similarity.py stands on).

Determinism: centroids initialize from the k lowest vec_ids,
distance comparisons break ties by centroid id, and centroid means
use scaled-long exact sums — the result is reproducible across
partitionings and runs. No SQL oracle (multi-round iteration isn't a
single query); tests/test_iterative.py checks against an independent
numpy implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register
from .common import SCALE

K = 8
ITERATIONS = 5
DIM = 64


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector by squared L2; ties -> lowest cid.
    Scale: centroids broadcast (k x dim doubles); assignment is one
    map-side pass over the corpus, no shuffle."""
    dist = F.aggregate(
        F.zip_with(F.col("emb"), F.col("c_emb"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "emb", "cid", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cid")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroid = per-dimension mean of member vectors, computed
    with scaled-long exact sums then reassembled into an array.
    Scale: one shuffle on (cid, dim) — map-side combined; the
    centroid frame is k rows."""
    comps = assigned.select(
        "cid", F.posexplode("emb").alias("dim", "val")
    )
    means = comps.groupBy("cid", "dim").agg(
        (
            (F.sum(F.floor(F.col("val") * SCALE).cast("long")).cast("double") / SCALE)
            / F.count("val")
        ).alias("mean")
    )
    return (
        means.groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "mean"))), lambda s: s.mean
            ).alias("c_emb")
        )
    )


def kmeans(
    spark: SparkSession, emb: DataFrame, k: int = K, iterations: int = ITERATIONS
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means: returns (assignments, centroids)."""
    centroids = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"))
    )
    assigned = None
    for _ in range(iterations):
        assigned = _assign(emb, centroids)
        # persist + materialize: cuts lineage so iteration i+1's plan
        # doesn't replay iterations 0..i, and stops the concurrent
        # broadcast build from re-running the previous round
        assigned = assigned.persist()
        assigned.count()
        centroids = _recompute(assigned).persist()
        centroids.count()
    return assigned, centroids


@register("kmeans_embeddings", oracle=None)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster sizes + within-cluster dispersion after
    {ITERATIONS} Lloyd iterations (rows-only in the gate; pytest
    verifies assignments against a numpy reference)."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = raw.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    assigned, centroids = kmeans(spark, emb)
    return (
        assigned.groupBy("cid")
        .agg(F.count("*").alias("n_members"), F.min("vec_id").alias("lowest_member"))
        .orderBy("cid")
    )


# --- connected components over the near-dup pair graph ---------------


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Minimum-label propagation over an undirected edge list
    (src, dst) -> (node, component) where component is the smallest
    node id reachable — the clustering step a dedup pipeline runs on
    its candidate-pair graph to pick one representative per
    duplicate group.

    Each round joins current labels across edges both ways and takes
    the min; convergence when no label changes. Rounds needed =
    graph diameter (near-dup clusters are tiny, so 2-3 in practice;
    large-diameter graphs would switch to the pointer-doubling /
    large-star small-star variant). Scale per round: one shuffle on
    node id; persisted labels cut lineage between rounds.

    ``shuffle_partitions`` narrows the per-round shuffles for small
    candidate graphs (a dozen multi-stage rounds at the session's
    full width is pure scheduling overhead); pass None on a real
    cluster to inherit the session setting."""
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(prev_parts), shuffle_partitions)),
        )
        # AQE's per-stage barriers and re-planning are pure overhead on
        # a dozen tiny label-propagation rounds (measured 7s -> 16s
        # with AQE on); statically planned small shuffles win here
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    both = None
    try:
        # materialize the edge list once: every round consumes it, and
        # without the persist each iteration re-runs the upstream
        # candidate-generation pipeline that produced the pairs
        both = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        both.count()
        nodes = both.select(F.col("src").alias("node")).distinct()
        labels = nodes.select("node", F.col("node").alias("component")).persist()
        labels.count()
        changed = -1
        for _ in range(max_iterations):
            neighbor_min = (
                both.join(labels, both.src == labels.node)
                .groupBy(F.col("dst").alias("node2"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
                .select(
                    "node",
                    F.least(
                        "component", F.coalesce("nbr_component", "component")
                    ).alias("component"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            # silent wrong answers are worse than a loud stop: a
            # component chain longer than max_iterations has not
            # converged (switch to pointer-doubling for such graphs)
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds"
            )
        return labels
    finally:
        if both is not None:
            both.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


@register("dedup_clusters_cc", oracle=None)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction: connected components over the
    MinHash-LSH near-dup pairs, reporting one row per cluster with
    its representative (smallest doc_id), size, and member list —
    the final step that turns pairwise near-dup evidence into a
    keep/drop decision per document. Rows-only in the gate (iterative
    multi-round algorithm); tests/test_iterative.py verifies the
    clustering against a pure-Python union-find on the same pairs."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
        .select(
            F.col("component").alias("cluster_rep"),
            "n_members",
            "members",
        )
        .orderBy("cluster_rep")
    )
