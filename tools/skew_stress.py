#!/usr/bin/env python
"""Adversarial skew stress: measure the scalable twins against the naive
window/aggregate forms on data built to break them.

SCALE.md argues the two-phase operators (operators/scalable_windows.py,
operators/skew.py) remove the one-task-per-hot-key funnel; this harness
MEASURES it instead of arguing it. It synthesizes a corpus where one key
owns most rows (the 100 TB regime where "partition by language" puts 40%
of the web in one task), runs naive vs scalable forms, verifies the
outputs agree (full-value checksum, not row counts), and prints a JSON
line per case.

Usage::

    python tools/skew_stress.py [--rows 4000000] [--hot-frac 0.75]
                                [--keys 64] [--out results.json]

The checksum compares sum(rn * h(id)), etc., over ALL rows — any single
disagreeing rank flips it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrjob_spark.session import get_spark


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def _checksum(df, expr) -> int:
    return df.agg(F.sum(expr).cast("decimal(38,0)").alias("c")).first()["c"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.75)
    ap.add_argument("--keys", type=int, default=64)
    ap.add_argument("--val-card", type=int, default=100_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="skew_stress", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/skew_stress_input.parquet"
    hot_n = int(args.rows * args.hot_frac)
    # deterministic synthetic rows: id unique, key hot for the first
    # hot_frac of ids, v a wrapping value with ties, val_card distinct values
    base = spark.range(args.rows).select(
        F.col("id"),
        F.when(F.col("id") < hot_n, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % args.keys).cast("string")))
        .alias("key"),
        (F.col("id") * 2654435761 % 1_000_003).cast("double").alias("v"),
        (F.col("id") % args.val_card).alias("val"),
    )
    base.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    print(
        f"[skew] {args.rows} rows, hot key = {hot_n} rows "
        f"({100 * args.hot_frac:.0f}%), {args.keys} cold keys",
        file=sys.stderr,
    )

    results = {}
    # checksum terms go through decimal(38,0): rank × crc32 sums blow past
    # int64 at a few million rows
    idh = F.crc32(F.col("id").cast("string")).cast("decimal(38,0)")

    # -- 1. ranking window ---------------------------------------------------
    from mrjob_spark.operators.scalable_windows import bucketed_ranking

    w = Window.partitionBy("key").orderBy(F.col("v").desc(), F.col("id"))
    naive_rank = df.select(
        "key", "id", F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"), F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )
    scal_rank = bucketed_ranking(
        df.select("key", "id", "v"), "key", "v", "id", bucket_width=1000.0
    )
    t_naive = _noop(naive_rank)
    t_scal = _noop(scal_rank)
    chk = (
        F.col("rn").cast("decimal(38,0)") * idh
        + F.col("rnk")
        + F.col("drnk")
        + F.col("quartile")
    )
    same = _checksum(naive_rank, chk) == _checksum(scal_rank, chk)
    results["ranking_window"] = {
        "naive_sec": t_naive, "scalable_sec": t_scal, "values_match": same,
    }
    print(f"[skew] ranking: naive {t_naive}s scalable {t_scal}s match={same}",
          file=sys.stderr)

    # -- 2. running sum ------------------------------------------------------
    from mrjob_spark.operators.scalable_windows import bucketed_running_sum

    wr = (
        Window.partitionBy("key").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive_cum = df.select("key", "id", "val", F.sum("val").over(wr).alias("cum"))
    scal_cum = bucketed_running_sum(
        df.select("key", "id", "val"), "key", "id", "val",
        bucket_width=float(max(args.rows // 256, 1)),
    )
    t_naive = _noop(naive_cum)
    t_scal = _noop(scal_cum)
    cum_chk = F.col("cum").cast("decimal(38,0)") * idh
    same = _checksum(naive_cum, cum_chk) == _checksum(scal_cum, cum_chk)
    results["running_sum"] = {
        "naive_sec": t_naive, "scalable_sec": t_scal, "values_match": same,
    }
    print(f"[skew] running sum: naive {t_naive}s scalable {t_scal}s match={same}",
          file=sys.stderr)

    # -- 3. non-algebraic aggregate (collect_set) ----------------------------
    from mrjob_spark.operators.skew import salted_collect_set

    naive_set = df.groupBy("key").agg(F.collect_set("val").alias("val_set"))
    scal_set = salted_collect_set(df, "key", "val", n_salts=32)
    t_naive = _noop(naive_set)
    t_scal = _noop(scal_set)
    set_chk = F.aggregate(
        F.col("val_set"),
        F.lit(0).cast("decimal(38,0)"),
        lambda a, x: a + (x * x).cast("decimal(38,0)"),
    ) + F.size("val_set")
    same = _checksum(naive_set, set_chk) == _checksum(scal_set, set_chk)
    results["collect_set"] = {
        "naive_sec": t_naive, "scalable_sec": t_scal, "values_match": same,
    }
    print(f"[skew] collect_set: naive {t_naive}s scalable {t_scal}s match={same}",
          file=sys.stderr)

    # -- 3b. first-occurrence selection (the paragraph-dedup core) -----------
    # one boilerplate hash owns hot_frac of all (doc, pos, hash) rows —
    # the 10^8-document-boilerplate regime. Naive form: min(struct) as a
    # WINDOW over para_h (the hot hash funnels through one sorted task).
    # Production form (operators/dedup.py:paragraph_dedup): min(struct)
    # as a partial-agg HASH AGGREGATE + join-back off one repartition.
    paras = df.select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("para_idx"),
        F.col("key").alias("para_h"),
    )
    first_struct = F.struct("doc_id", "para_idx")
    wf = Window.partitionBy("para_h")
    naive_first = paras.select(
        "doc_id", "para_idx", "para_h",
        (F.min(first_struct).over(wf) == first_struct).alias("kept"),
    )
    shuffled = paras.repartition(F.col("para_h"))
    firsts = shuffled.groupBy("para_h").agg(
        F.min(first_struct).alias("first"))
    scal_first = shuffled.join(firsts, "para_h").select(
        "doc_id", "para_idx", "para_h",
        ((F.col("first.doc_id") == F.col("doc_id"))
         & (F.col("first.para_idx") == F.col("para_idx"))).alias("kept"),
    )
    t_naive = _noop(naive_first)
    t_scal = _noop(scal_first)
    doc_h = F.crc32(F.col("doc_id").cast("string")).cast("decimal(38,0)")
    kchk = (F.when(F.col("kept"), 1).otherwise(0).cast("decimal(38,0)")
            * doc_h + F.crc32("para_h").cast("decimal(38,0)"))
    same = _checksum(naive_first, kchk) == _checksum(scal_first, kchk)
    results["first_occurrence"] = {
        "naive_sec": t_naive, "scalable_sec": t_scal, "values_match": same,
    }
    print(f"[skew] first-occurrence: window {t_naive}s agg+join {t_scal}s"
          f" match={same}", file=sys.stderr)

    # -- 3c. substring-dedup DF cutoff (the round-10 operator's hot-shingle
    # guard): one boilerplate 8-gram owns hot_frac of the corpus anchors.
    # Uncapped, every hot anchor is "duplicated" and shuffles to its doc
    # (plus inflates the per-doc position arrays); the cap declares it
    # boilerplate and excludes it BEFORE the doc-side shuffle, so only
    # the genuine pair-dup residue moves. Values are checked against the
    # analytic expectation (docs laid out so hot and pair runs never
    # chain), not naive-vs-scalable: the cap CHANGES semantics by design.
    from mrjob_spark.operators.dedup import substring_dedup

    n_docs = max(args.rows // 400, 1000)
    n_docs -= n_docs % 2  # every doc needs a pair partner (occ exactly 2)
    hot_docs = int(n_docs * args.hot_frac)
    # doc text: [8-token block][10 unique tokens][8-token pair block]
    # hot docs share block A (hot_docs copies); every doc d and its
    # partner d^1 share pair block P_{d//2} (occ=2, under any cap >= 2)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(
                F.col("id") < hot_docs,
                F.lit(" ".join("hot%d" % i for i in range(8))),
            ).otherwise(
                F.concat_ws(" ", *[
                    F.concat(F.lit("s%d" % i), F.col("id").cast("string"))
                    for i in range(8)
                ])
            ),
            F.concat_ws(" ", *[
                F.concat(F.lit("u%d" % i), F.col("id").cast("string"))
                for i in range(10)
            ]),
            F.concat_ws(" ", *[
                F.concat(F.lit("p%d" % i),
                         (F.col("id") / 2).cast("long").cast("string"))
                for i in range(8)
            ]),
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet("/tmp/skew_substr_input.parquet")
    sdocs = spark.read.parquet("/tmp/skew_substr_input.parquet")
    uncapped = substring_dedup(sdocs, "doc_id", "text", k=8)
    capped = substring_dedup(sdocs, "doc_id", "text", k=8,
                             max_shingle_df=hot_docs - 1)
    t_uncapped = _noop(uncapped)
    t_capped = _noop(capped)
    # analytic check: every doc keeps the pair-block run (1 anchor, 8
    # tokens); hot docs additionally carry the hot run ONLY uncapped
    doc_h = F.crc32(F.col("doc_id").cast("string")).cast("decimal(38,0)")
    schk = (F.col("n_dup_anchors") * 1000 + F.col("n_dup_runs") * 100
            + F.col("max_run_tokens")).cast("decimal(38,0)") * doc_h
    got_capped = _checksum(capped, schk)
    expect_capped = _checksum(
        sdocs.select(
            "doc_id", F.lit(1).alias("n_dup_anchors"),
            F.lit(1).alias("n_dup_runs"), F.lit(8).alias("max_run_tokens"),
        ),
        schk,
    )
    cap_ok = got_capped == expect_capped
    hot_rows_ok = (
        uncapped.where(F.col("n_dup_runs") == 2).count() == hot_docs
    )
    results["substring_df_cutoff"] = {
        "uncapped_sec": t_uncapped, "capped_sec": t_capped,
        "capped_values_match_analytic": cap_ok,
        "uncapped_hot_docs_flagged": hot_rows_ok,
    }
    print(f"[skew] substring DF-cutoff: uncapped {t_uncapped}s capped"
          f" {t_capped}s capped-analytic={cap_ok}"
          f" hot-flagged={hot_rows_ok}", file=sys.stderr)

    # -- 4. skewed sort-merge join: AQE skew-split on vs off -----------------
    # right side: unique join keys incl. the hot one, too big to broadcast
    right = spark.range(args.keys + 1).select(
        F.when(F.col("id") == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") - 1).cast("string")))
        .alias("key"),
        (F.col("id") * 7 % 1000).alias("dim_val"),
    )
    joined = (
        df.join(right.hint("shuffle_merge"), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dim_val").alias("s"))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_off = _noop(joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # make the splitter see this workload's skew, not the global defaults
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    t_on = _noop(joined)
    jchk = F.col("n").cast("decimal(38,0)") * F.crc32("key").cast("decimal(38,0)") + F.col("s")
    same = _checksum(joined, jchk) is not None  # single plan; values equal by def
    results["skewed_smj_aqe"] = {
        "aqe_skew_off_sec": t_off, "aqe_skew_on_sec": t_on, "ran": same,
    }
    print(f"[skew] skewed SMJ: AQE-off {t_off}s AQE-on {t_on}s", file=sys.stderr)

    # -- 5. near-dup admission under a hot band bucket (round 11) -----------
    # One giant duplicate family puts hot_frac of the batch into the SAME
    # 16 band buckets — the regime where any pair-generating design does
    # hot_docs² work. lsh_band_admission's per-bucket work is a partial
    # min-aggregate (a counter cell per partition), so the hot run must
    # cost ~the uniform run, and the verdicts are checked analytically:
    # the family's smallest doc_id admits, every later member is
    # dup_in_batch, every unique doc is new, nothing is dup_of_history
    # (history is built on a disjoint token universe).
    from mrjob_spark.operators.dedup import (
        lsh_band_admission,
        minhash_band_rows,
    )

    n_docs = max(args.rows // 400, 1000)
    hot_docs = int(n_docs * args.hot_frac)
    hot_text = " ".join("famtok%d" % i for i in range(24))

    def _docs(tag, lo, hi, hot_upto=None):
        # tokens are md5 slices, NOT id-suffixed literals: shingles are
        # CHARACTER 8-grams, so "b0_1001 b1_1001 …" vs "…1002…" share
        # most of their shingle sets and band-collide — hashed tokens
        # make distinct docs genuinely dissimilar
        d = spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.substring(
                    F.md5(F.concat(F.lit("%s%d_" % (tag, i)),
                                   F.col("id").cast("string"))),
                    1, 10,
                )
                for i in range(24)
            ]).alias("text"),
        )
        if hot_upto is not None:
            d = d.select(
                "doc_id",
                F.when(F.col("doc_id") < hot_upto, F.lit(hot_text))
                .otherwise(F.col("text")).alias("text"),
            )
        return d

    _docs("b", 0, n_docs, hot_upto=hot_docs).write.mode("overwrite").parquet(
        "/tmp/skew_neardup_batch.parquet")
    _docs("u", 0, n_docs).write.mode("overwrite").parquet(
        "/tmp/skew_neardup_uniform.parquet")
    minhash_band_rows(
        _docs("h", n_docs, n_docs + n_docs // 4), "doc_id", "text"
    ).select("band_idx", "band_hash").write.mode("overwrite").parquet(
        "/tmp/skew_neardup_hist.parquet")

    hist = spark.read.parquet("/tmp/skew_neardup_hist.parquet")
    hot_batch = spark.read.parquet("/tmp/skew_neardup_batch.parquet")
    uni_batch = spark.read.parquet("/tmp/skew_neardup_uniform.parquet")
    t_hot = _noop(lsh_band_admission(hot_batch, hist))
    t_uniform = _noop(lsh_band_admission(uni_batch, hist))
    verdicts = lsh_band_admission(hot_batch, hist)
    vchk = (
        F.when(F.col("verdict") == "new", 1)
        .when(F.col("verdict") == "dup_in_batch", 2)
        .otherwise(1000)
        .cast("decimal(38,0)")
        * F.crc32(F.col("doc_id").cast("string")).cast("decimal(38,0)")
    )
    expect = hot_batch.select(
        "doc_id",
        F.when((F.col("doc_id") > 0) & (F.col("doc_id") < hot_docs),
               F.lit("dup_in_batch")).otherwise(F.lit("new"))
        .alias("verdict"),
    )
    adm_ok = _checksum(verdicts, vchk) == _checksum(expect, vchk)
    results["neardup_admission_hot_bucket"] = {
        "hot_sec": t_hot, "uniform_sec": t_uniform,
        "values_match_analytic": adm_ok,
    }
    print(f"[skew] neardup admission: hot-bucket {t_hot}s uniform"
          f" {t_uniform}s analytic={adm_ok}", file=sys.stderr)

    line = json.dumps({"rows": args.rows, "hot_frac": args.hot_frac, **results})
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
