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


def _assign_rows(
    qdf: DataFrame,
    centroid_rows: list[tuple[int, list[int]]],
    probe: int = 1,
    with_qv: bool = False,
    passthrough: tuple[str, ...] = (),
    with_rank: bool = False,
) -> DataFrame:
    """Top-``probe`` nearest centroids per vector over the DRIVER-RESIDENT
    ``k``-row centroid list, Arrow-vectorized (round 12).

    The previous shape (crossJoin the broadcast centroid table, score each
    of the n×k rows with the ``zip_with``/``aggregate`` integer fold, then
    a min-struct / sort_array(collect_list) aggregate) paid an interpreted
    HigherOrderFunction eval per (vector, centroid) — CodegenFallback, so
    the k-way row explosion dominated every IVF tier's fit+assign cost.
    Here each Arrow batch computes all n×k squared-L2 distances as three
    integer matrix ops (``|q|² + |c|² − 2·q·cᵀ`` — EXACT in int64: the
    fixed-point grid bounds every term far below overflow), so the
    arithmetic is bit-for-bit the oracle's, with zero floating point.

    Tie-breaks replicate ``ORDER BY dist, cluster``: centroids are scored
    in ascending-cluster column order, ``argmin``/stable ``argsort`` keep
    the first (= lowest cluster) among equal distances. The centroid list
    is a closure constant (k × dim ints — the same bounded driver state
    the collect-based Lloyd's loop already holds); the corpus never
    shuffles for assignment, exactly as before.

    ``passthrough`` names extra input columns carried through the pass
    unchanged (repeated per probe row) — the §8 move-the-payload-once
    rule: an index build that needs ``(cluster, vec_id, embedding)``
    ships the vector through this one Arrow pass instead of joining the
    assignment back onto the corpus by ``vec_id`` (a corpus×corpus
    shuffle). ``with_rank`` adds the 1-based probe rank ``rn`` (rank 1 =
    the ``ORDER BY dist, cluster`` winner), so rank-1 consumers filter
    instead of re-aggregating.
    """
    import numpy as np

    rows = sorted((int(c), list(cv)) for c, cv in centroid_rows)
    clusters = np.array([c for c, _ in rows], dtype=np.int64)
    cmat = np.array([cv for _, cv in rows], dtype=np.int64)
    cc = (cmat * cmat).sum(axis=1)
    schema = (
        "vec_id long, qv array<long>, cluster long, dist long"
        if with_qv
        else "vec_id long, cluster long, dist long"
    )
    if with_rank:
        schema += ", rn int"
    for name in passthrough:
        schema += ", %s %s" % (name, qdf.schema[name].dataType.simpleString())

    dim = cmat.shape[1] if cmat.ndim == 2 else 0

    def _score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            if b.num_rows == 0:
                continue
            qv = b.column("qv")
            # malformed-row guard (round 13, ADVICE r12): a null or
            # wrong-dimension vector used to crash the whole job at
            # reshape; such rows are now dropped from assignment (the
            # expected dimension is the centroids') — one vectorized
            # length compare on the fast path, nothing else changes.
            lens = pc.list_value_length(qv).to_numpy(zero_copy_only=False)
            lens = np.asarray(lens, dtype=np.float64)
            good = ~np.isnan(lens) & (lens == dim)
            if not good.all():
                keep = pa.array(np.flatnonzero(good))
                b = b.take(keep)
                if b.num_rows == 0:
                    continue
                qv = b.column("qv")
            n = b.num_rows
            q = np.asarray(qv.flatten(), dtype=np.int64).reshape(n, -1)
            qq = (q * q).sum(axis=1)
            dists = qq[:, None] + cc[None, :] - 2 * (q @ cmat.T)
            vid = np.asarray(b.column("vec_id"), dtype=np.int64)
            if probe <= 1:
                j = np.argmin(dists, axis=1)  # first min = lowest cluster
                cols = {
                    "vec_id": pa.array(vid, pa.int64()),
                    "cluster": pa.array(clusters[j], pa.int64()),
                    "dist": pa.array(dists[np.arange(n), j], pa.int64()),
                }
                if with_qv:
                    cols = {
                        "vec_id": cols["vec_id"],
                        "qv": qv,
                        "cluster": cols["cluster"],
                        "dist": cols["dist"],
                    }
                if with_rank:
                    cols["rn"] = pa.array(np.ones(n, dtype=np.int32),
                                          pa.int32())
                for name in passthrough:
                    cols[name] = b.column(name)
                yield pa.record_batch(cols)
            else:
                # fewer live centroids than probe (clusters can collapse
                # on degenerate data): emit what exists, like the
                # slice(sort_array(...), 1, probe) it replaced
                order = np.argsort(dists, axis=1, kind="stable")[:, :probe]
                w = order.shape[1]
                cols = {
                    "vec_id": pa.array(np.repeat(vid, w), pa.int64()),
                    "cluster": pa.array(clusters[order].ravel(), pa.int64()),
                    "dist": pa.array(
                        np.take_along_axis(dists, order, axis=1).ravel(),
                        pa.int64(),
                    ),
                }
                if with_rank:
                    cols["rn"] = pa.array(
                        np.tile(np.arange(1, w + 1, dtype=np.int32), n),
                        pa.int32(),
                    )
                if passthrough:
                    idx = pa.array(np.repeat(np.arange(n), w))
                    for name in passthrough:
                        cols[name] = b.column(name).take(idx)
                yield pa.record_batch(cols)

    return qdf.select(
        "vec_id", "qv", *[c for c in passthrough]
    ).mapInArrow(_score, schema=schema)


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
    final = _fit_centroid_rows(qdf, k=k, iters=iters)
    return _assign_rows(qdf, final, probe=probe).select(
        "vec_id", "cluster", "dist"
    )


def _quantized(emb: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding",
               scale: int = FIXED_POINT_SCALE,
               passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, qv[, *passthrough]) on the fixed-point grid,
    scan-parallelism recovered."""
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    return parallelize_narrow_scan(
        emb.select(
            F.col(id_col).cast("long").alias("vec_id"),
            quantize_fixed_point(F.col(vec_col), scale).alias("qv"),
            *[F.col(c) for c in passthrough],
        )
    )


def _fit_centroid_rows(
    qdf: DataFrame, *, k: int, iters: int
) -> list[tuple[int, list[int]]]:
    """Lloyd's over a quantized frame → the final k-row centroid list
    (driver-resident, the bounded state the loop already held)."""
    init = (
        qdf.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cluster"), F.col("qv").alias("cv"))
    )
    centroids = [(int(r["cluster"]), list(r["cv"])) for r in init.collect()]

    for _ in range(iters):
        assigned = _assign_rows(qdf, centroids, probe=1, with_qv=True)
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

    return centroids


def _fit_centroids(qdf: DataFrame, *, k: int, iters: int) -> DataFrame:
    """Lloyd's over a quantized frame → the final k-row centroid table."""
    return _centroids_df(
        qdf.sparkSession, _fit_centroid_rows(qdf, k=k, iters=iters)
    )


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
    passthrough: tuple[str, ...] = (),
    with_rank: bool = False,
) -> DataFrame:
    """Assign vectors to their top-``probe`` cells under a PRE-FITTED
    centroid table (collected to its bounded k×dim driver form, scored
    Arrow-vectorized in-task — the corpus never shuffles for
    assignment). Returns ``vec_id, cluster, dist`` plus, on request,
    the 1-based probe rank ``rn`` and any ``passthrough`` input columns
    carried through the pass (round 13: lets an index build emit
    ``(cluster, vec_id, embedding)`` in the one Arrow pass instead of
    shuffling the corpus to join the vector back on by id)."""
    qdf = _quantized(
        emb, id_col=id_col, vec_col=vec_col, scale=scale,
        passthrough=passthrough,
    )
    rows = [(int(r["cluster"]), list(r["cv"])) for r in centroids.collect()]
    out = _assign_rows(
        qdf, rows, probe=probe, passthrough=passthrough,
        with_rank=with_rank,
    )
    cols = ["vec_id", "cluster", "dist"]
    if with_rank:
        cols.append("rn")
    cols.extend(passthrough)
    return out.select(*cols)
