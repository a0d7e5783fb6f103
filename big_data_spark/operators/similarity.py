"""Similarity search over embedding columns (north-star; SURVEY §7).

Three tiers, increasing scale:
  1. brute-force cosine top-k        -> queries.q60 (exact baseline)
  2. sign-LSH bucketing              -> queries.q63 (deterministic,
     oracle-checkable; probe = same-bucket candidates)
  3. IVF (this module): KMeans coarse quantizer + nprobe cell search
     — the standard billion-vector layout. Vectors are partitioned by
     cell id on disk, so a probe touches nprobe/nlist of the corpus;
     at 100 TB that's the difference between scanning everything and
     scanning ~1-5%.

All distance math is native column expressions (functions.dot /
cosine_similarity) — no Python in the scan path; only the tiny
centroid table crosses to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cosine_similarity

SEED = 42


@dataclass
class IVFIndex:
    """Coarse-quantized vector table: rows carry their cell id;
    centroids is a tiny (nlist x dim) table kept broadcast-able."""

    assigned: DataFrame  # vec_id, embedding, cell
    centroids: DataFrame  # cell, centroid (array<double>)
    nlist: int


def build_ivf_index(
    emb: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFIndex:
    """Fit the coarse quantizer and assign every vector to a cell.

    On a real deployment ``assigned`` is then written
    ``partitionBy("cell")`` so each probe reads only its cells'
    files (partition pruning does the candidate selection).
    """
    feat = emb.select(id_col, vec_col, array_to_vector(vec_col).alias("_v"))
    km = KMeans(k=nlist, seed=SEED, featuresCol="_v", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "cell")
    centroids = feat.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cell", "centroid"],
    )
    return IVFIndex(assigned=assigned, centroids=centroids, nlist=nlist)


def ivf_search(
    index: IVFIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors probing the nprobe nearest cells.

    The centroid ranking happens on the broadcast centroid table (a
    few KB); the candidate scan is a partition-pruned filter, then
    exact cosine + TakeOrderedAndProject.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = [
        r["cell"]
        for r in index.centroids.select(
            "cell",
            cosine_similarity(F.col("centroid"), q).alias("sim"),
        )
        .orderBy(F.desc("sim"))
        .limit(nprobe)
        .collect()
    ]
    cand = index.assigned.filter(F.col("cell").isin(probe_cells))
    return (
        cand.select(
            "vec_id",
            "cell",
            F.round(cosine_similarity(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact baseline for recall measurement."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
