"""Embedding clustering: deterministic Lloyd's k-means over fixed-point
vectors (SURVEY.md §2.11 L3 — the IVF *training* step).

``l3_knn_bucketed`` searches precomputed buckets; this module builds such
buckets from the data. The design is the standard scalable k-means shape
(what MLlib's KMeans also does): centroids live on the driver and are
broadcast each iteration, so per-iteration cost is ONE corpus scan plus a
``k × dim``-row partial aggregation — nothing driver-side ever grows with
the corpus, only with ``k × dim``.

Cross-engine determinism (the part a float k-means can't give you): vectors
are quantized to fixed-point int64 (``floor(x * scale + 0.5)``), so

* squared-L2 distances are exact integers — the argmin never depends on
  accumulation order, and ties break on the lowest cluster id;
* centroid updates are integer sums + counts (exact, order-independent),
  re-rounded to the fixed-point grid via the same portable
  ``floor(sum/count + 0.5)`` in Spark, Python, and the SQL oracle.

A float implementation differs between engines in the low bits of every
mean, and one flipped assignment cascades; the fixed-point form is
bit-identical everywhere, which is what makes an *oracle-checked* k-means
possible at all. (Quantizing to 1e-3 moves each coordinate by ≤5e-4 —
noise relative to unit-scale embeddings.)

Empty-cluster rule: a centroid that attracts no points is dropped (its id
simply stops appearing), matching the set-semantics of the SQL update CTE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

#: fixed-point grid: 3 decimal digits (1e-3 resolution)
FIXED_POINT_SCALE = 1000


def quantize_fixed_point(vec, scale: int = FIXED_POINT_SCALE):
    """``array<float> -> array<long>`` on the fixed-point grid, portable
    (same IEEE ops as the oracle's ``floor(x * scale + 0.5)``)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long")
    )


def _sq_l2(a, b):
    """Exact integer squared-L2 distance between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(qdf: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast the k-row centroid table,
    score in-row, keep the (dist, cluster)-min via one partial-aggregable
    ``min(struct)`` — no window, no per-vector sort."""
    scored = qdf.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "qv",
        F.struct(
            _sq_l2(F.col("qv"), F.col("cv")).alias("dist"),
            F.col("cluster").alias("cluster"),
        ).alias("dc"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min("dc").alias("dc"), F.first("qv").alias("qv")
    )
    return best.select(
        "vec_id", "qv", F.col("dc.cluster").alias("cluster"), F.col("dc.dist").alias("dist")
    )


def _assign_topn(qdf: DataFrame, centroids: DataFrame, probe: int) -> DataFrame:
    """Top-``probe`` nearest centroids per vector (IVF multi-probe): the
    k-row centroid table broadcasts, scores compute in-row, and the
    per-vector top-n comes from ``sort_array(collect_list(...))`` over the
    k bounded candidate structs — a partial-aggregable ObjectHashAggregate
    (k structs per vector per partition), no window, no per-vector sort
    stage. Ties break on (dist, cluster), matching the oracle's
    ``ORDER BY dist, cluster``."""
    scored = qdf.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        F.struct(
            _sq_l2(F.col("qv"), F.col("cv")).alias("dist"),
            F.col("cluster").alias("cluster"),
        ).alias("dc"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.slice(F.sort_array(F.collect_list("dc")), 1, probe).alias("top"))
        .select("vec_id", F.explode("top").alias("dc"))
        .select(
            "vec_id",
            F.col("dc.cluster").alias("cluster"),
            F.col("dc.dist").alias("dist"),
        )
    )


def _centroids_df(spark: SparkSession, rows: list[tuple[int, list[int]]]) -> DataFrame:
    schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("cv", ArrayType(LongType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
    probe: int = 1,
) -> DataFrame:
    """Deterministic Lloyd's k-means; returns ``vec_id, cluster, dist``.

    ``probe > 1`` returns the top-``probe`` nearest centroids per vector
    under the FINAL centroids (IVF multi-probe — training rounds still
    assign rn=1, standard Lloyd's), up to ``probe`` rows per vector.

    Init: the vectors with the ``k`` smallest ids (deterministic, no RNG —
    the same retry-stability argument as every hash-based keep decision in
    this repo). Each of the ``iters`` rounds does one assignment scan and
    one integer mean update; the returned frame is the final assignment
    under the last centroids. ``dist`` is the exact integer squared-L2
    distance on the fixed-point grid.

    Scale: per round, one scan + one ``posexplode`` partial aggregation
    whose shuffle is O(k × dim × partitions); the k×dim centroid table is
    collected to the driver (constant size) and re-broadcast. Iterations
    are driver-side Python over *collected centroids only* — the corpus
    never leaves executors, and plans don't grow with iteration count
    because each round plans from the same base frame.
    """
    qdf = _quantized(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    final = _fit_centroids(qdf, k=k, iters=iters)
    if probe > 1:
        return _assign_topn(qdf, final, probe)
    return _assign(qdf, final).select("vec_id", "cluster", "dist")


def _quantized(emb: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding",
               scale: int = FIXED_POINT_SCALE) -> DataFrame:
    """(vec_id, qv) on the fixed-point grid, scan-parallelism recovered."""
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    return parallelize_narrow_scan(
        emb.select(
            F.col(id_col).cast("long").alias("vec_id"),
            quantize_fixed_point(F.col(vec_col), scale).alias("qv"),
        )
    )


def _fit_centroids(qdf: DataFrame, *, k: int, iters: int) -> DataFrame:
    """Lloyd's over a quantized frame → the final k-row centroid table."""
    spark = qdf.sparkSession
    init = (
        qdf.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cluster"), F.col("qv").alias("cv"))
    )
    centroids = [(int(r["cluster"]), list(r["cv"])) for r in init.collect()]

    for _ in range(iters):
        assigned = _assign(qdf, _centroids_df(spark, centroids))
        sums = (
            assigned.select("cluster", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in sums:
            # floor(sum/count + 0.5) in double — the identical IEEE ops the
            # SQL oracle's update CTE performs
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = int(
                math.floor(r["s"] / r["n"] + 0.5)
            )
        centroids = [
            (c, [dims[p] for p in sorted(dims)])
            for c, dims in sorted(by_cluster.items())
        ]

    return _centroids_df(spark, centroids)


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
) -> DataFrame:
    """Train-only entry point: the final k-row ``(cluster, cv)`` centroid
    table from the same deterministic Lloyd's recipe as
    :func:`kmeans_assign` — for the asymmetric index/probe flows (st13
    ingest admission) where centroids are fitted ONCE on a seed corpus
    and arrivals assign against them forever after, exactly how a
    production IVF coarse quantizer is deployed."""
    return _fit_centroids(
        _quantized(emb, id_col=id_col, vec_col=vec_col, scale=scale),
        k=k, iters=iters,
    )


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
) -> DataFrame:
    """Assign vectors to their top-``probe`` cells under a PRE-FITTED
    centroid table (broadcast, scored in-row — the corpus never
    shuffles for assignment). Returns ``vec_id, cluster, dist``."""
    qdf = _quantized(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    if probe > 1:
        return _assign_topn(qdf, centroids, probe)
    return _assign(qdf, centroids).select("vec_id", "cluster", "dist")
