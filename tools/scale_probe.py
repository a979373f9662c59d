"""Scale-up probe: replicate the sf0.1 fixtures ~Nx (default 10x, i.e.
sf~1: ~6M lineitem rows) into a temp warehouse with key-space offsets,
then time representative plan shapes at both scales and report the
wall-clock scaling exponent. A linear plan (exponent ~1.0) survives
scale-up; superlinear means a shuffle or build side is growing faster
than the data.

Replication keeps referential integrity: fact keys (orderkey) are
offset per copy so joins fan out correctly; dimension keys (custkey,
suppkey, partkey) are NOT offset, so dims stay dim-sized and fact->dim
joins stay broadcastable — exactly the 100 TB regime (facts grow,
dims don't).

Usage: python tools/scale_probe.py [factor] [--keep]
Prints one JSON line: {"factor": N, "queries": {name: {"sec_base":
s0, "sec_scaled": s1, "exponent": e}}}.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from canvas_data_loader_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000_000


def replicate(spark, factor: int, dest: str) -> None:
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    copies_li = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFFSET))
        for i in range(factor)
    ]
    copies_o = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFFSET))
        for i in range(factor)
    ]
    big_li = copies_li[0]
    for c in copies_li[1:]:
        big_li = big_li.unionByName(c)
    big_o = copies_o[0]
    for c in copies_o[1:]:
        big_o = big_o.unionByName(c)
    # Write with enough output files that the scaled read parallelizes
    # (one 200 MB file would serialize the scan on the splitless edge).
    big_li.repartition(32).write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")
    big_o.repartition(16).write.mode("overwrite").parquet(f"{dest}/orders.parquet")
    for dim in ("customer", "supplier", "nation", "region", "part"):
        shutil.copy(f"{BASE}/{dim}.parquet", f"{dest}/{dim}.parquet")


def shapes(spark, d: str):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    o = spark.read.parquet(f"{d}/orders.parquet")
    c = spark.read.parquet(f"{d}/customer.parquet")
    s = spark.read.parquet(f"{d}/supplier.parquet")

    def scan_agg():
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
        )

    def fact_fact_join():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def fact_dim_broadcast():
        return (
            li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    def window_topk():
        from pyspark.sql import Window

        w = Window.partitionBy("l_suppkey").orderBy(F.desc("l_extendedprice"))
        return (
            li.select("l_suppkey", "l_extendedprice", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3)
        )

    return {
        "scan_agg": scan_agg,
        "fact_fact_join": fact_fact_join,
        "fact_dim_broadcast": fact_dim_broadcast,
        "window_topk": window_topk,
    }


def time_all(spark, d: str) -> dict[str, float]:
    out = {}
    for name, fn in shapes(spark, d).items():
        fn().write.format("noop").mode("overwrite").save()  # warm
        t = time.time()
        fn().write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t, 3)
    return out


def main_logcleanup():
    """Metadata-path cost vs commit count (the reason vacuum's log
    cleanup exists): a delta table accumulates N commits; a FRESH
    reader's state resolution (log listing + replay) is O(N) from
    bare JSON, O(checkpoint + tail) after checkpoint, and stays that
    way FOREVER only if the cleaned log stops growing — after
    checkpoint+vacuum the log holds one JSON + the checkpoint parts
    regardless of history length. Reports fresh-object replay seconds
    and on-disk log file counts at N and 10N commits, for all three
    states. Usage: --logcleanup [n_commits]."""
    from canvas_data_loader_spark.plans.delta import DeltaWarehouse

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("scale_probe_logcleanup")
    report = {}
    for cnt in (n, 10 * n):
        root = tempfile.mkdtemp(prefix=f"scale_probe_lc_{cnt}_")
        try:
            wh = DeltaWarehouse(spark, root, checkpoint_interval=10**9)
            wh.write(
                "t",
                spark.range(0, 1000).selectExpr("id", "id * 2 as v"),
                snapshot="s0",
                bucket=("id", 8),
            )
            for i in range(cnt):
                wh.record_txn("t", "probe", i + 1)

            def fresh_replay_sec():
                t0 = time.time()
                w2 = DeltaWarehouse(spark, root)
                w2._replay("t")
                return round(time.time() - t0, 3)

            def log_files():
                ldir = wh._log_dir("t")
                return len(
                    [
                        f
                        for f in os.listdir(ldir)
                        if f.endswith(".json") or ".checkpoint" in f
                    ]
                )

            row = {"json_replay_sec": fresh_replay_sec(),
                   "log_files": log_files()}
            wh.checkpoint("t")
            row["ckpt_replay_sec"] = fresh_replay_sec()
            wh.vacuum("t", retention_sec=0.0)
            row["cleaned_replay_sec"] = fresh_replay_sec()
            row["log_files_cleaned"] = log_files()
            report[f"n{cnt}"] = row
        finally:
            shutil.rmtree(root, ignore_errors=True)
    ratios = {
        k: round(
            report[f"n{10 * n}"][f"{k}_sec"]
            / max(report[f"n{n}"][f"{k}_sec"], 1e-3),
            2,
        )
        for k in ("json_replay", "ckpt_replay", "cleaned_replay")
    }
    print(
        json.dumps(
            {
                "mode": "logcleanup",
                "n_commits": [n, 10 * n],
                "runs": report,
                "growth_10x": ratios,
            }
        )
    )


def main_incremental_neardup():
    """O(batch) claim for cross-dump incremental near-dup (q167),
    END TO END since r11 — candidate generation AND the exact-Jaccard
    re-score: a FIXED new dump deduped against a persisted
    banded-signature index that grows by DISJOINT factor-x copies.
    The incremental probe reads the stored band table, equi-joins the
    new dump's bands (no corpus re-shingle, no corpus self-join),
    bucket-prunes the corpus TEXT fetch to the candidate ids' buckets
    (plans.ops.fetch_docs_for_pairs over the doc_id-bucketed docs
    table), and re-scores candidate-bounded
    (operators.dedup.rescore_candidates — the semi-join keeps the
    shingle explode off the corpus). The rebuild comparator
    re-computes MinHash bands for index+dump, self-joins, and
    re-scores CORPUS-WIDE (the pre-r11 shape). Expected: the probe's
    exponent stays ~flat (index scan + bounded bucket reads) while
    the rebuild pays full shingle+minhash+self-join at every scale —
    the gap, not just the exponents, is the finding.
    Usage: --incremental-neardup [factor]."""
    from canvas_data_loader_spark.operators import dedup as D
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale_probe_incnd")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    # the dump: the base corpus's %5==4 slice, re-salted like copy 0
    # (true near-dups of copy 0 exist at every factor) and id-shifted
    # above every index copy
    new = (
        d.filter(F.col("doc_id") % 5 == 4)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1000 * OFFSET))
        .withColumn(
            "text", F.regexp_replace(F.col("text"), r"(^|\s)", "$1x0q")
        )
    )
    new_bands = D.minhash_bands(
        new, "text", "doc_id", num_hashes=16, band_size=4
    ).localCheckpoint()
    report = {}
    for f in (1, factor):
        dest = tempfile.mkdtemp(prefix=f"scale_probe_incnd_{f}_")
        try:
            replicate_documents_disjoint(spark, f, dest)
            idx_docs = spark.read.parquet(f"{dest}/documents.parquet")
            wh = Warehouse(spark, os.path.join(dest, "wh"))
            # index build is amortized across every prior dump's
            # import (a pure band append per dump) — untimed here
            wh.write(
                "band_index",
                D.minhash_bands(
                    idx_docs, "text", "doc_id", num_hashes=16, band_size=4
                ),
                "s0",
                bucket=("band_hash", 64),
            )
            # the corpus text table, bucketed by doc_id — the layout
            # that lets the re-score's candidate fetch prune to the
            # candidate buckets (write amortized across imports;
            # untimed like the index build)
            wh.write("documents", idx_docs, "s0", bucket=("doc_id", 64))

            def probe():
                # END-TO-END per-dump dedup (r11): candidates against
                # the persisted index, then the candidate-BOUNDED
                # exact re-score over a bucket-pruned corpus fetch —
                # the corpus is never re-shingled and never fully
                # scanned
                from canvas_data_loader_spark.plans.ops import (
                    fetch_docs_for_pairs,
                )

                idx = wh.read("band_index")
                cand = D.incremental_neardup_candidates(
                    idx, new_bands
                ).localCheckpoint()
                corpus_docs = fetch_docs_for_pairs(wh, "documents", cand)
                docs_all = corpus_docs.select("doc_id", "text").unionByName(
                    new.select("doc_id", "text")
                )
                return D.rescore_candidates(docs_all, cand).count()

            def rebuild():
                # the naive comparator: recompute bands for the FULL
                # corpus, self-join, then the corpus-wide re-score
                # (the pre-r11 shape — every doc re-shingled)
                from canvas_data_loader_spark.functions.text import (
                    shingles_from_tokens,
                    tokens,
                )

                full = idx_docs.unionByName(new)
                pairs = D.minhash_candidate_pairs(
                    full, "text", "doc_id"
                ).filter(
                    (F.col("doc_a") >= 1000 * OFFSET)
                    | (F.col("doc_b") >= 1000 * OFFSET)
                )
                sh = (
                    full.select("doc_id", tokens("text").alias("__t"))
                    .select(
                        "doc_id",
                        F.explode(
                            F.array_distinct(
                                shingles_from_tokens(F.col("__t"), 3)
                            )
                        ).alias("s"),
                    )
                    .localCheckpoint(eager=False)
                )
                sizes = sh.groupBy("doc_id").agg(
                    F.count(F.lit(1)).alias("n_sh")
                )
                common = (
                    pairs.join(
                        sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id")
                    )
                    .join(
                        sh.alias("sb"),
                        (F.col("doc_b") == F.col("sb.doc_id"))
                        & (F.col("sa.s") == F.col("sb.s")),
                    )
                    .groupBy("doc_a", "doc_b")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
                )
                return (
                    common.join(
                        sizes.select(
                            F.col("doc_id").alias("doc_a"),
                            F.col("n_sh").alias("na"),
                        ),
                        "doc_a",
                    )
                    .join(
                        sizes.select(
                            F.col("doc_id").alias("doc_b"),
                            F.col("n_sh").alias("nb"),
                        ),
                        "doc_b",
                    )
                    .count()
                )

            def cand_only():
                # candidate GENERATION alone (the r10 probe) — its
                # exponent isolates the end-to-end residual growth to
                # the candidate-doc text fetch (IO-only, no shingle)
                return D.incremental_neardup_candidates(
                    wh.read("band_index"), new_bands
                ).count()

            n_inc = probe()  # warm
            t0 = time.time()
            assert probe() == n_inc
            t_probe = round(time.time() - t0, 3)
            cand_only()  # warm
            t0 = time.time()
            cand_only()
            t_cand = round(time.time() - t0, 3)
            n_reb = rebuild()  # warm
            t0 = time.time()
            assert rebuild() == n_reb
            t_rebuild = round(time.time() - t0, 3)
            assert n_inc == n_reb, (
                f"maintained != rebuilt at x{f}: {n_inc} vs {n_reb}"
            )
            report[f"x{f}"] = {
                "probe_sec": t_probe,
                "cand_sec": t_cand,
                "rebuild_sec": t_rebuild,
                "pairs": n_inc,
            }
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    exp = {
        k: round(
            math.log(
                max(report[f"x{factor}"][f"{k}_sec"], 1e-3)
                / max(report["x1"][f"{k}_sec"], 1e-3)
            )
            / math.log(factor),
            3,
        )
        for k in ("probe", "cand", "rebuild")
    }
    print(
        json.dumps(
            {
                "mode": "incremental-neardup",
                "factor": factor,
                "runs": report,
                "exponent": exp,
            }
        )
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    keep = "--keep" in sys.argv
    spark = get_spark("scale_probe")
    dest = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        replicate(spark, factor, dest)
        base_t = time_all(spark, BASE)
        scaled_t = time_all(spark, dest)
        report = {}
        for name in base_t:
            e = math.log(max(scaled_t[name], 1e-3) / max(base_t[name], 1e-3)) / math.log(factor)
            report[name] = {
                "sec_base": base_t[name],
                "sec_scaled": scaled_t[name],
                "exponent": round(e, 3),
            }
        print(json.dumps({"factor": factor, "queries": report}))
    finally:
        if not keep:
            shutil.rmtree(dest, ignore_errors=True)





def replicate_documents(spark, factor: int, dest: str) -> None:
    """documents scaled by unioning id-offset copies with a per-copy
    token prefix mutation (so near-dup structure doesn't collapse into
    exact cross-copy duplicates and LSH bucket sizes stay realistic)."""
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET)).withColumn(
            "text", F.concat(F.lit(f"c{i} "), F.col("text"))
        )
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(f"{dest}/documents.parquet")


def text_shapes(spark, d: str):
    from canvas_data_loader_spark.operators import dedup as D
    from canvas_data_loader_spark.queries import load

    docs = spark.read.parquet(f"{d}/documents.parquet")

    def quality_map():
        w = F.split(F.col("text"), " ")
        n = F.size(w)
        return docs.select(
            "doc_id",
            (F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) * 1.0 / n).alias("mwl"),
            (F.size(F.array_distinct(w)) * 1.0 / n).alias("ttr"),
        )

    def exact_groups():
        return D.exact_dedup_groups(docs, "text", "doc_id")

    def minhash_band_rows():
        return D.minhash_bands(docs, "text", "doc_id", num_hashes=16, band_size=4)

    def lsh_candidates():
        return D.minhash_candidate_pairs(docs, "text", "doc_id", num_hashes=16, band_size=4)

    return {
        "quality_map": quality_map,
        "exact_dedup_groups": exact_groups,
        "minhash_bands": minhash_band_rows,
        "lsh_candidate_pairs": lsh_candidates,
    }


def main_text():
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_text")
    dest = tempfile.mkdtemp(prefix="scale_probe_text_")
    try:
        replicate_documents(spark, factor, dest)
        # base = the same replicated layout at factor 1 (fair file counts)
        base_dir = tempfile.mkdtemp(prefix="scale_probe_text_base_")
        replicate_documents(spark, 1, base_dir)

        def time_dir(d):
            out = {}
            for name, fn in text_shapes(spark, d).items():
                fn().write.format("noop").mode("overwrite").save()
                t = time.time()
                fn().write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t, 3)
            return out

        base_t = time_dir(base_dir)
        scaled_t = time_dir(dest)
        report = {}
        for name in base_t:
            e = math.log(max(scaled_t[name], 1e-3) / max(base_t[name], 1e-3)) / math.log(factor)
            report[name] = {
                "sec_base": base_t[name],
                "sec_scaled": scaled_t[name],
                "exponent": round(e, 3),
            }
        print(json.dumps({"mode": "text", "factor": factor, "queries": report}))
        shutil.rmtree(base_dir, ignore_errors=True)
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def replicate_embeddings(spark, factor: int, dest: str) -> None:
    """embeddings scaled by id-offset copies with a tiny deterministic
    per-copy rotation of the vector (swap of two coordinates), so
    cross-copy vectors are near- but not exact duplicates."""
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    copies = []
    for i in range(factor):
        v = F.col("embedding")
        if i % 2 == 1:
            v = F.concat(F.slice(v, 2, 63), F.slice(v, 1, 1))  # rotate by 1
        copies.append(
            e.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET)).withColumn(
                "embedding", v
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(f"{dest}/embeddings.parquet")


def embed_shapes(spark, d: str):
    from canvas_data_loader_spark.operators import simsearch as S

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % OFFSET < 5)  # 5 queries per copy-space

    def brute():
        return S.brute_force_topk(emb, q.limit(5), k=10)

    def ivf():
        return S.ivf_topk(emb, q.limit(5), k=10, n_cells=16, n_probe=4)

    def neardup():
        return S.embedding_neardup_pairs(emb, 0.95)

    def neardup_lsh():
        return S.embedding_neardup_pairs_lsh(emb, 0.95)

    return {
        "brute_force_topk": brute,
        "ivf_topk": ivf,
        "embedding_neardup": neardup,
        "embedding_neardup_lsh": neardup_lsh,
    }


def main_neardup():
    """Probe ONLY the near-dup family (exact block-pair vs banded LSH)
    so the two plans' scaling exponents land side by side: the exact
    operator does O(n²) dot products by definition (distributed, but
    quadratic work — its exponent approaches 2 once compute dominates),
    while the LSH path only scores same-bucket pairs and should stay
    sublinear-to-linear in wall clock at these sizes."""
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_neardup")
    dest = tempfile.mkdtemp(prefix="scale_probe_nd_")
    base_dir = tempfile.mkdtemp(prefix="scale_probe_nd_base_")
    try:
        replicate_embeddings(spark, factor, dest)
        replicate_embeddings(spark, 1, base_dir)
        wanted = ("embedding_neardup", "embedding_neardup_lsh")

        def time_dir(d):
            out = {}
            for name, fn in embed_shapes(spark, d).items():
                if name not in wanted:
                    continue
                fn().write.format("noop").mode("overwrite").save()
                t = time.time()
                fn().write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t, 3)
            return out

        base_t = time_dir(base_dir)
        scaled_t = time_dir(dest)
        report = {}
        for name in base_t:
            e = math.log(
                max(scaled_t[name], 1e-3) / max(base_t[name], 1e-3)
            ) / math.log(factor)
            report[name] = {
                "sec_base": base_t[name],
                "sec_scaled": scaled_t[name],
                "exponent": round(e, 3),
            }
        print(json.dumps({"mode": "neardup", "factor": factor, "queries": report}))
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


def main_embed():
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_embed")
    dest = tempfile.mkdtemp(prefix="scale_probe_embed_")
    base_dir = tempfile.mkdtemp(prefix="scale_probe_embed_base_")
    try:
        replicate_embeddings(spark, factor, dest)
        replicate_embeddings(spark, 1, base_dir)

        def time_dir(d):
            out = {}
            for name, fn in embed_shapes(spark, d).items():
                fn().write.format("noop").mode("overwrite").save()
                t = time.time()
                fn().write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t, 3)
            return out

        base_t = time_dir(base_dir)
        scaled_t = time_dir(dest)
        report = {}
        for name in base_t:
            e = math.log(max(scaled_t[name], 1e-3) / max(base_t[name], 1e-3)) / math.log(factor)
            report[name] = {
                "sec_base": base_t[name],
                "sec_scaled": scaled_t[name],
                "exponent": round(e, 3),
            }
        print(json.dumps({"mode": "embed", "factor": factor, "queries": report}))
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


def main_semdedup():
    """Scaling probe for semantic_dedup under the documented discipline:
    n_cells grows ~ sqrt(corpus), so the pair space
    sum |cell|^2 = n^2/n_cells grows ~ n^1.5 instead of the fixed-cell
    n^2. Reported side by side: fixed n_cells=16 (the WRONG way to
    scale it) vs sqrt-scaled cells.

    Measured (this container): at 10x (50k vectors) both variants are
    still overhead-bound (~0.5 exponents, indistinguishable); at 20x
    (100k vectors) the fixed-cell quadratic term emerges — exponent
    1.17, 67s — while sqrt-scaled cells hold exponent 0.24, 25s. Run
    with factor >= 20 to see the separation."""
    from canvas_data_loader_spark.operators.simsearch import semantic_dedup

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_semdedup")
    dest = tempfile.mkdtemp(prefix="scale_probe_sd_")
    base_dir = tempfile.mkdtemp(prefix="scale_probe_sd_base_")
    try:
        replicate_embeddings(spark, factor, dest)
        replicate_embeddings(spark, 1, base_dir)

        def time_dir(d, n_cells):
            emb = spark.read.parquet(f"{d}/embeddings.parquet")
            fn = lambda: semantic_dedup(  # noqa: E731
                emb, threshold=0.95, n_cells=n_cells, vectorized=True
            )
            fn().write.format("noop").mode("overwrite").save()
            t = time.time()
            fn().write.format("noop").mode("overwrite").save()
            return round(time.time() - t, 3)

        variants = {
            "semdedup_fixed_cells": (16, 16),
            # None = the operator's own derived sqrt-cells DEFAULT
            # (max(16, ceil(sqrt(n)))) — probing exactly what a
            # no-args caller gets, not a hand-tuned variant.
            "semdedup_default_sqrt_cells": (None, None),
        }
        if "--default-only" in sys.argv:
            # at factor >= 50 the fixed-cell variant alone runs for
            # minutes (it is the known-quadratic shape); allow probing
            # just the enforced default
            variants.pop("semdedup_fixed_cells")
        report = {}
        for name, (bc, sc) in variants.items():
            b, s = time_dir(base_dir, bc), time_dir(dest, sc)
            report[name] = {
                "sec_base": b,
                "sec_scaled": s,
                "cells": [bc, sc],
                "exponent": round(
                    math.log(max(s, 1e-3) / max(b, 1e-3)) / math.log(factor), 3
                ),
            }
        print(json.dumps({"mode": "semdedup", "factor": factor, "queries": report}))
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


def replicate_documents_disjoint(spark, factor: int, dest: str) -> None:
    """documents scaled by DISJOINT copies: every token is salted with
    the copy index, so no shingle is shared across copies. This is the
    'corpus grows with new content' regime — the df distribution keeps
    its shape while the corpus multiplies — which is what a set-
    similarity join's scaling exponent should be measured against.
    (The near-dup replication in ``replicate_documents`` intentionally
    creates factor^2 TRUE cross-copy pairs; with that input any exact
    algorithm is superlinear because the OUTPUT is.)"""
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET)).withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(^|\s)", f"$1x{i}q"),
        )
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{dest}/documents.parquet"
    )


def main_decontam():
    """Scaling probe for the decontamination rewrite (q164): corpus
    scaled by DISJOINT copies (no shingle shared across copies — the
    'corpus grows with new content' regime), with the eval sources
    replicating ALONGSIDE the training docs. That is deliberately the
    HARSHER regime: production eval sets are fixed-size benchmarks, so
    the gram hit-join's probe side would stay constant there; here it
    grows with the corpus and the exponent still should stay ~linear
    (hash join on md5 grams, span-bounded position explode — nothing
    pairwise). Usage: --decontam [factor]."""
    from canvas_data_loader_spark.queries import SPARK

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_decontam")
    report = {}
    for f in (1, factor):
        dest = tempfile.mkdtemp(prefix=f"scale_probe_decontam_{f}_")
        try:
            replicate_documents_disjoint(spark, f, dest)
            q = SPARK["q164_decontamination_cut"]
            q(spark, dest).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            q(spark, dest).write.format("noop").mode("overwrite").save()
            report[f"x{f}"] = round(time.time() - t0, 3)
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    e = math.log(
        max(report[f"x{factor}"], 1e-3) / max(report["x1"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "decontam",
                "factor": factor,
                "sec": report,
                "exponent": round(e, 3),
            }
        )
    )


def main_ppjoin():
    """Scaling probe for the exact set-similarity join (PPJoin prefix
    filtering, q138's operator). Measured against a disjoint-content
    scale-up (df shape preserved, output ~linear): the prefix filter's
    rarest-first candidate buckets should keep the join near-linear —
    the contract that replaces MinHash-LSH's approximation with exact
    results. Also reports the candidate-pair count vs the quadratic
    all-pairs bound, the pruning ratio that must HOLD as the corpus
    grows. Usage: --ppjoin [factor]."""
    from canvas_data_loader_spark.operators.dedup import setsim_prefix_join

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_ppjoin")
    dest = tempfile.mkdtemp(prefix="scale_probe_pp_")
    base_dir = tempfile.mkdtemp(prefix="scale_probe_pp_base_")
    try:
        replicate_documents_disjoint(spark, factor, dest)
        replicate_documents_disjoint(spark, 1, base_dir)

        def probe_dir(d):
            docs = spark.read.parquet(f"{d}/documents.parquet")
            fn = lambda: setsim_prefix_join(  # noqa: E731
                docs, "text", "doc_id", n=3, t_num=3, t_den=5
            )
            fn().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            n_docs = docs.count()
            pairs = fn().count()
            return sec, n_docs, pairs

        b_sec, b_docs, b_pairs = probe_dir(base_dir)
        s_sec, s_docs, s_pairs = probe_dir(dest)
        report = {
            "mode": "ppjoin",
            "factor": factor,
            "sec_base": b_sec,
            "sec_scaled": s_sec,
            "exponent": round(
                math.log(max(s_sec, 1e-3) / max(b_sec, 1e-3))
                / math.log(factor),
                3,
            ),
            "docs": [b_docs, s_docs],
            "result_pairs": [b_pairs, s_pairs],
            # all-pairs bound n*(n-1)/2: how much work the prefix
            # filter is avoiding at each scale
            "allpairs_bound": [
                b_docs * (b_docs - 1) // 2,
                s_docs * (s_docs - 1) // 2,
            ],
        }
        print(json.dumps(report))
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


def main_textops():
    """10x exponents for the round-2 text/packing op family (q110-q114:
    PII redaction, overlapping chunking, token entropy, boilerplate
    bigrams, sequence packing). All five are documents-only, so the
    registered query callables run unmodified against the replicated
    corpus dir — probing the exact plans the driver checks."""
    from canvas_data_loader_spark import queries as Q

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    names = [
        "q110_pii_redaction",
        "q111_doc_chunking",
        "q112_token_entropy",
        "q113_boilerplate_bigrams",
        "q114_sequence_packing",
        # round-6 documents-only additions: BPE packing/chunking,
        # model/LM/DSIR scoring, winnowing + overlap pairs, CDC
        "q122_bpe_token_packing",
        "q123_bpe_chunk_manifest",
        "q125_quality_model_score",
        "q130_unigram_logprob",
        "q131_dsir_importance",
        "q132_winnowing_fingerprints",
        "q133_partial_overlap_pairs",
        "q134_cdc_chunking",
        # round-6 batch 2: repetition filters, temperature mixture,
        # ExactSubstr coverage, count-min sketch (all documents-only,
        # linear-shaped). q138_setsim_prefix_join is deliberately NOT
        # probed via replication: a replicated corpus multiplies every
        # doc's duplicate group by `factor`, so the TRUE pair-set (and
        # thus any exact join's output) grows ~factor^2 by
        # construction — a data property, not a plan property; its
        # scale argument is structural (rarest-first prefix keys +
        # candidate-bounded verify, see operators/dedup.py).
        "q137_repetition_filters",
        "q139_temperature_mixture",
        "q141_exactsubstr_coverage",
        "q142_countmin_sketch",
        "q145_exactsubstr_cut",
        "q148_curation_pipeline_v2",
        "q151_inverted_index",
        "q154_poisson_bootstrap",
    ]
    spark = get_spark("scale_probe_textops")
    dest = tempfile.mkdtemp(prefix="scale_probe_textops_")
    base_dir = tempfile.mkdtemp(prefix="scale_probe_textops_base_")
    try:
        replicate_documents(spark, factor, dest)
        replicate_documents(spark, 1, base_dir)

        def time_dir(d):
            out = {}
            for name in names:
                fn = Q.SPARK[name]
                fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t0, 3)
            return out

        base_t = time_dir(base_dir)
        scaled_t = time_dir(dest)
        report = {}
        for name in names:
            e = math.log(
                max(scaled_t[name], 1e-3) / max(base_t[name], 1e-3)
            ) / math.log(factor)
            report[name] = {
                "sec_base": base_t[name],
                "sec_scaled": scaled_t[name],
                "exponent": round(e, 3),
            }
        print(json.dumps({"mode": "textops", "factor": factor, "queries": report}))
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


def main_skew():
    """Measure the salted-join strategy on a zipf-skewed key: 90% of
    fact rows share ONE key. Plain shuffle join must put that key's
    rows in one task; the salted join scatters them across ``salt``
    subkeys. (AQE's skew-join split also fires on the plain path —
    this probe quantifies how much headroom the explicit strategy has
    when AQE cannot help, e.g. an aggregation directly downstream.)
    """
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from canvas_data_loader_spark.operators.skew import salted_join

    spark = get_spark("scale_probe_skew")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    big = li
    for i in range(1, factor):
        big = big.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFFSET))
        )
    # 90% of rows collapse onto hot key 1
    skewed = big.withColumn(
        "hot_key",
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1)).otherwise(
            F.col("l_orderkey") % 1000
        ),
    ).select("hot_key", "l_quantity", "l_orderkey")
    dim = spark.range(0, 1000).select(
        F.col("id").alias("hot_key"), (F.col("id") * 2).alias("dim_val")
    )
    # force a shuffle join (no broadcast) so skew actually matters
    plain = skewed.hint("merge").join(dim.hint("merge"), "hot_key").groupBy(
        "dim_val"
    ).agg(F.sum("l_quantity").alias("s"))
    salted = salted_join(
        skewed, dim, "hot_key", scatter_col="l_orderkey", salt=32
    ).groupBy("dim_val").agg(F.sum("l_quantity").alias("s"))

    def t(df):
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    no_aqe = {"spark.sql.adaptive.enabled": "false"}
    results = {}
    for name, df in [("plain_smj", plain), ("salted", salted)]:
        results[name + "_aqe"] = t(df)
    for k, v in no_aqe.items():
        spark.conf.set(k, v)
    for name, df in [("plain_smj", plain), ("salted", salted)]:
        results[name + "_noaqe"] = t(df)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(json.dumps({"mode": "skew", "factor": factor, "sec": results}))


def main_merge():
    """Measure the pipeline's MERGE cost as the WAREHOUSE TABLE scales
    with the incoming batch held fixed — the claim under the bucketed
    default (PipelineConfig.bucketed_tables): a daily batch touching b
    of N buckets scans/rewrites ~b/N of the table, so merge time should
    be near-FLAT in table size (exponent ~0 once IO dominates), while
    the non-bucketed merge rewrites the full table every time
    (exponent ~1 by construction). Usage: --merge [factor]."""
    import tempfile

    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = 32
    spark = get_spark("scale_probe_merge")
    # full-width orders (9 columns, unique key): wide enough that a
    # full-table rewrite has real IO cost, so layout differences show
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    # fixed batch, same at every scale, and BUCKET-LOCAL: restricted to
    # keys hashing into 2 of the 32 buckets — the realistic daily-dump
    # shape the bucketed default exists for (a batch spread over every
    # bucket degenerates to a full-table read by construction, for any
    # layout)
    from canvas_data_loader_spark.operators.merge import bucket_of

    batch = (
        li.filter(bucket_of(F.col("k"), n_buckets).isin(0, 1))
        .limit(256)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_merge_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write("t", table_at(f), snapshot="base", bucket=("k", n_buckets))
            t0 = time.time()
            affected = wh.merge_bucketed("t", batch, snapshot="m1")
            bucketed_sec = round(time.time() - t0, 3)

            wh.write("tf", table_at(f), snapshot="base")  # non-bucketed twin
            from canvas_data_loader_spark.operators.merge import merge_upsert

            t0 = time.time()
            wh.write(
                "tf", merge_upsert(wh.read("tf"), batch, "k"), snapshot="m1"
            )
            flat_sec = round(time.time() - t0, 3)
            report[f"x{f}"] = {
                "bucketed_sec": bucketed_sec,
                "full_rewrite_sec": flat_sec,
                "affected_buckets": len(affected),
                "n_buckets": n_buckets,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    e_b = math.log(
        max(report[f"x{factor}"]["bucketed_sec"], 1e-3)
        / max(report["x1"]["bucketed_sec"], 1e-3)
    ) / math.log(factor)
    e_f = math.log(
        max(report[f"x{factor}"]["full_rewrite_sec"], 1e-3)
        / max(report["x1"]["full_rewrite_sec"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "merge",
                "factor": factor,
                "tables": report,
                "exponent_bucketed": round(e_b, 3),
                "exponent_full_rewrite": round(e_f, 3),
            }
        )
    )


def main_mv():
    """Measure materialized-view refresh cost as the FACT TABLE scales
    with the per-interval change batch held fixed — the claim behind
    plans/ops.py refresh_rollup_view: an incremental refresh reads the
    changed buckets' feed plus the view (group-sized), never the fact
    table, so it should be near-FLAT in table size (exponent ~0),
    while the full rebuild it replaces rescans everything (exponent
    ~1 by construction). Usage: --mv [factor]."""
    import tempfile

    from canvas_data_loader_spark.operators.ivm import build_rollup
    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.ops import (
        create_rollup_view,
        refresh_rollup_view,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # b/N matters more here than in --merge: the feed reads FULL ROWS
    # of the changed buckets at two versions, while the rebuild it
    # competes with scans only the rollup's pruned columns — so the
    # crossover sits at roughly b/N < pruned-width/row-width. 128
    # buckets puts the fixed 2-bucket batch at b/N = 1/64, the daily-
    # dump regime the bucketed default exists for (at 100 TB, N is
    # thousands and b/N smaller still).
    n_buckets = 128
    spark = get_spark("scale_probe_mv")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    # fixed bucket-local batch (same shape as --merge: the daily dump)
    batch = (
        li.filter(bucket_of(F.col("k"), n_buckets).isin(0, 1))
        .limit(256)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )
    keys, sums = ["o_orderpriority"], {"total_price": "o_totalprice"}

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_mv_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write("t", table_at(f), snapshot="base", bucket=("k", n_buckets))
            create_rollup_view(wh, "v", "t", keys, sums)
            wh.merge_bucketed("t", batch, snapshot="m1")
            t0 = time.time()
            out = refresh_rollup_view(wh, "v")
            assert out["mode"] == "incremental", out
            inc_sec = round(time.time() - t0, 3)
            # the alternative this replaces: rebuild from the fact table
            wh.merge_bucketed(
                "t",
                batch.withColumn("o_totalprice", F.col("o_totalprice") + 1),
                snapshot="m2",
            )
            t0 = time.time()
            out = refresh_rollup_view(wh, "v", full=True)
            assert out["mode"] == "full", out
            full_sec = round(time.time() - t0, 3)
            # exactness stays the contract at every scale
            maintained = sorted(
                tuple(r) for r in wh.read("v").collect()
            )
            recomputed = sorted(
                tuple(r)
                for r in build_rollup(wh.read("t"), keys, sums).collect()
            )
            assert maintained == recomputed
            report[f"x{f}"] = {
                "incremental_sec": inc_sec,
                "full_rebuild_sec": full_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    e_i = math.log(
        max(report[f"x{factor}"]["incremental_sec"], 1e-3)
        / max(report["x1"]["incremental_sec"], 1e-3)
    ) / math.log(factor)
    e_f = math.log(
        max(report[f"x{factor}"]["full_rebuild_sec"], 1e-3)
        / max(report["x1"]["full_rebuild_sec"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "mv",
                "factor": factor,
                "tables": report,
                "exponent_incremental": round(e_i, 3),
                "exponent_full_rebuild": round(e_f, 3),
            }
        )
    )


def main_minmax():
    """Measure MIN/MAX materialized-view refresh cost as the fact
    table scales with the per-interval change batch held fixed — the
    claim behind plans/ops.py refresh_minmax_view: the incremental
    refresh rescans ONLY the changed buckets (b/N of the fact table)
    plus the combine-sized partials, so it should be near-FLAT in
    table size, while the full rebuild is O(table) by construction.
    The batch DELETES each touched group's current minimum — the
    non-retractable case the partials sidecar exists for — so the
    probe times exactly the hard path. Usage: --minmax [factor]."""
    import tempfile

    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.ops import (
        create_minmax_view,
        refresh_minmax_view,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = 128
    spark = get_spark("scale_probe_minmax")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    batch = (
        li.filter(bucket_of(F.col("k"), n_buckets).isin(0, 1))
        .limit(256)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )
    keys = ["o_orderpriority"]
    aggs = {"lo": ("o_totalprice", "min"), "hi": ("o_totalprice", "max")}

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    def recomputed(wh):
        return sorted(
            tuple(r)
            for r in wh.read("t")
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("o_totalprice").alias("lo"),
                F.max("o_totalprice").alias("hi"),
            )
            .collect()
        )

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_minmax_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write("t", table_at(f), snapshot="base", bucket=("k", n_buckets))
            create_minmax_view(wh, "v", "t", keys, aggs)
            # the hard path: DELETE rows that include per-group minima
            # in the touched buckets (retraction of an extremum), plus
            # a merge that moves values — both land in 2 of 128 buckets
            wh.merge_bucketed("t", batch, snapshot="m1")
            wh.delete_where(
                "t",
                bucket_of(F.col("k"), n_buckets).isin(0)
                & (F.col("o_totalprice") < 1000),
                mode="mor",
            )
            t0 = time.time()
            out = refresh_minmax_view(wh, "v")
            assert out["mode"] == "incremental", out
            inc_sec = round(time.time() - t0, 3)
            wh.merge_bucketed(
                "t",
                batch.withColumn("o_totalprice", F.col("o_totalprice") + 1),
                snapshot="m2",
            )
            t0 = time.time()
            out = refresh_minmax_view(wh, "v", full=True)
            assert out["mode"] == "full", out
            full_sec = round(time.time() - t0, 3)
            maintained = sorted(tuple(r) for r in wh.read("v").collect())
            assert maintained == recomputed(wh)
            report[f"x{f}"] = {
                "incremental_sec": inc_sec,
                "full_rebuild_sec": full_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    e_i = math.log(
        max(report[f"x{factor}"]["incremental_sec"], 1e-3)
        / max(report["x1"]["incremental_sec"], 1e-3)
    ) / math.log(factor)
    e_f = math.log(
        max(report[f"x{factor}"]["full_rebuild_sec"], 1e-3)
        / max(report["x1"]["full_rebuild_sec"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "minmax",
                "factor": factor,
                "tables": report,
                "exponent_incremental": round(e_i, 3),
                "exponent_full_rebuild": round(e_f, 3),
            }
        )
    )


def main_mirror():
    """Measure cross-warehouse sync cost as the SOURCE TABLE scales
    with the per-interval change batch held fixed — the claims behind
    plans/ops.py sync_mirror: an incremental sync moves the changed
    buckets' feed (near-flat in table size), a maintenance-only
    interval is watermark-advance (metadata, ~constant), and the
    initial clone is O(table) by construction (the thing the other two
    modes exist to avoid). Usage: --mirror [factor]."""
    import tempfile

    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.ops import sync_mirror
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = 128
    spark = get_spark("scale_probe_mirror")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    batch = (
        li.filter(bucket_of(F.col("k"), n_buckets).isin(0, 1))
        .limit(256)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_mirror_{f}_")
        try:
            src = Warehouse(spark, os.path.join(root, "src"))
            dst = Warehouse(spark, os.path.join(root, "dst"))
            src.write(
                "t", table_at(f), snapshot="base", bucket=("k", n_buckets)
            )
            t0 = time.time()
            out = sync_mirror(src, "t", dst)
            assert out["mode"] == "clone", out
            clone_sec = round(time.time() - t0, 3)
            src.merge_bucketed("t", batch, snapshot="m1")
            t0 = time.time()
            out = sync_mirror(src, "t", dst)
            assert out["mode"] == "incremental", out
            inc_sec = round(time.time() - t0, 3)
            src.compact("t")
            t0 = time.time()
            out = sync_mirror(src, "t", dst)
            assert out["mode"] == "advance", out
            adv_sec = round(time.time() - t0, 3)
            report[f"x{f}"] = {
                "clone_sec": clone_sec,
                "incremental_sec": inc_sec,
                "advance_sec": adv_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def expo(key):
        return round(
            math.log(
                max(report[f"x{factor}"][key], 1e-3)
                / max(report["x1"][key], 1e-3)
            )
            / math.log(factor),
            3,
        )

    print(
        json.dumps(
            {
                "mode": "mirror",
                "factor": factor,
                "tables": report,
                "exponent_clone": expo("clone_sec"),
                "exponent_incremental": expo("incremental_sec"),
                "exponent_advance": expo("advance_sec"),
            }
        )
    )


def main_feedsource():
    """Measure the cdl_warehouse streaming source's per-trigger cost as
    the TABLE scales with the per-interval change batch held fixed —
    the claims behind sources/warehouse_source.py: planning is
    metadata-only (~constant), a changed-bucket micro-batch reads b/N
    of the table (near-flat in table size), and a maintenance interval
    advances with zero data IO. The stream machinery is exercised
    directly (offset resolution + _plan_range + the executor Arrow
    diff), which is exactly what a trigger executes minus Spark's
    fixed scheduling overhead. Usage: --feedsource [factor]."""
    import tempfile

    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.pipeline import Warehouse
    from canvas_data_loader_spark.sources.warehouse_source import (
        _Meta,
        _plan_range,
        _read_feed_partition,
    )
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_feedsource")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        # bucket count scales WITH the table (constant bytes/bucket) —
        # how a 100 TB table is actually laid out; the contract under
        # test is "micro-batch cost ∝ changed-bucket BYTES, not table
        # size". With n_buckets held fixed instead, the same probe
        # measures ∝ b/N of the table (exponent ~0.7 observed), which
        # is the documented behavior, not a bug.
        n_buckets = 128 * f
        batch = (
            li.filter(bucket_of(F.col("k"), n_buckets).isin(0, 1))
            .limit(256)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1)
            .localCheckpoint()
        )
        root = tempfile.mkdtemp(prefix=f"scale_probe_feed_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write(
                "t", table_at(f), snapshot="base", bucket=("k", n_buckets)
            )
            wh.merge_bucketed("t", batch, snapshot="m1")
            meta = _Meta(root, "t")
            full_schema = to_arrow_schema(
                StructType(
                    list(meta.spark_schema().fields)
                    + [
                        StructField("_change_type", StringType(), False),
                        StructField("_commit_version", LongType(), False),
                    ]
                )
            )
            vs = meta.retained_versions()
            # per-trigger planning cost (metadata only)
            t0 = time.time()
            parts = _plan_range(meta, vs[-2], vs[-1], "k", 1 << 40)
            plan_sec = round(time.time() - t0, 3)
            # changed-bucket micro-batch: plan + executor diff
            t0 = time.time()
            rows = sum(
                sum(len(b) for b in _read_feed_partition(p, full_schema))
                for p in parts
            )
            diff_sec = round(time.time() - t0, 3)
            assert rows > 0 and len(parts) <= 2, (rows, len(parts))
            # maintenance interval: compaction -> zero-partition advance
            wh.compact("t")
            meta = _Meta(root, "t")
            vs = meta.retained_versions()
            t0 = time.time()
            adv = _plan_range(meta, vs[-2], vs[-1], "k", 1 << 40)
            adv_sec = round(time.time() - t0, 3)
            assert adv == []
            report[f"x{f}"] = {
                "plan_sec": plan_sec,
                "diff_sec": diff_sec,
                "advance_sec": adv_sec,
                "feed_rows": rows,
                "partitions": len(parts),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def expo(key):
        return round(
            math.log(
                max(report[f"x{factor}"][key], 1e-3)
                / max(report["x1"][key], 1e-3)
            )
            / math.log(factor),
            3,
        )

    print(
        json.dumps(
            {
                "mode": "feedsource",
                "factor": factor,
                "tables": report,
                "exponent_plan": expo("plan_sec"),
                "exponent_diff": expo("diff_sec"),
                "exponent_advance": expo("advance_sec"),
            }
        )
    )


def main_delete():
    """Measure row-level DELETE cost as the table scales with the
    deleted row set held fixed and SCATTERED (256 keys spread across
    every bucket — the GDPR-style shape where partition pruning cannot
    help and copy-on-write is at its worst). The claim behind
    delete_where's merge-on-read lane: the mor commit WRITES O(deleted
    positions) — its cost is one predicate scan — while copy-on-write
    rewrites every affected bucket, which for scattered keys means the
    whole table (exponent ~1 with a write-sized constant). The probe
    reports both exponents and the cow/mor ratio at scale; compaction
    (which eventually materializes the vectors) is a separate,
    schedulable cost, not part of the delete. Usage: --delete
    [factor]."""
    import tempfile

    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = 32
    spark = get_spark("scale_probe_delete")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    # fixed scattered key set: every 101st key — lands in ~every bucket
    victim_keys = [r.k for r in li.select("k").limit(25856).collect()][::101]

    def table_at(f):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        return big

    # warmup: a throwaway delete on a 1x table so JVM/codegen warmup
    # doesn't pollute the x1 timing (same protocol as BASELINE.md's
    # bench-context note)
    warm_root = tempfile.mkdtemp(prefix="scale_probe_delete_warm_")
    try:
        wh = Warehouse(spark, warm_root)
        wh.write("t", table_at(1), snapshot="base", bucket=("k", n_buckets))
        wh.delete_where("t", F.col("k").isin(victim_keys[:8]), mode="mor")
        wh.delete_where("t", F.col("k").isin(victim_keys[8:16]), mode="cow")
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_delete_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write("t", table_at(f), snapshot="base", bucket=("k", n_buckets))
            cond = F.col("k").isin(victim_keys)
            t0 = time.time()
            n_mor = wh.delete_where("t", cond, mode="mor")
            mor_sec = round(time.time() - t0, 3)

            wh.write("tc", table_at(f), snapshot="base", bucket=("k", n_buckets))
            t0 = time.time()
            n_cow = wh.delete_where("tc", cond, mode="cow")
            cow_sec = round(time.time() - t0, 3)
            assert n_mor == n_cow == len(victim_keys), (n_mor, n_cow)
            report[f"x{f}"] = {"mor_sec": mor_sec, "cow_sec": cow_sec,
                               "deleted": n_mor}
        finally:
            shutil.rmtree(root, ignore_errors=True)
    e_mor = math.log(
        max(report[f"x{factor}"]["mor_sec"], 1e-3)
        / max(report["x1"]["mor_sec"], 1e-3)
    ) / math.log(factor)
    e_cow = math.log(
        max(report[f"x{factor}"]["cow_sec"], 1e-3)
        / max(report["x1"]["cow_sec"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "delete",
                "factor": factor,
                "tables": report,
                "exponent_mor": round(e_mor, 3),
                "exponent_cow": round(e_cow, 3),
                "cow_over_mor_at_scale": round(
                    report[f"x{factor}"]["cow_sec"]
                    / max(report[f"x{factor}"]["mor_sec"], 1e-3),
                    2,
                ),
            }
        )
    )




def main_writers():
    """N concurrent disjoint-bucket MERGE writers on ONE table, both
    commit protocols, reconciliation ON vs OFF (A/B of the round-9
    logical conflict detection): commits/sec, wall time, and re-derive
    counts. Writer i's batch is restricted to keys hashing into bucket
    i, so every pairwise conflict is LOGICAL (CAS loss on disjoint
    buckets) — with reconciliation the loser re-publishes its already-
    written files (zero re-derives); with it disabled every CAS loss
    re-reads + re-writes its buckets (the pre-round-9 behavior).
    Expect: recon re-derives == 0, and recon wall <= rederive wall,
    with commit throughput ~linear in writers until CAS contention.
    Usage: --writers [n_writers] [merges_each]."""
    import re
    import tempfile
    import threading

    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.delta import DeltaWarehouse
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    merges_each = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_buckets = 32
    spark = get_spark("scale_probe_writers")
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    report = {}
    for proto, cls in (("manifest", Warehouse), ("delta", DeltaWarehouse)):
        batches = [
            li.filter(bucket_of(F.col("k"), n_buckets) == i)
            .limit(128)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1)
            .localCheckpoint()
            for i in range(n_writers)
        ]
        for recon in (True, False):
            root = tempfile.mkdtemp(prefix=f"scale_probe_writers_{proto}_")
            try:
                wh0 = cls(spark, root)
                wh0.write(
                    "t", li, snapshot="base", bucket=("k", n_buckets)
                )
                base_v = wh0.current_version("t")
                handles = [cls(spark, root) for _ in range(n_writers)]
                if not recon:
                    for h in handles:
                        if isinstance(h, DeltaWarehouse):
                            h._reconcile_merge_commit = (
                                lambda *a, **k: None
                            )
                        else:
                            h._reconcile_merge_publish = (
                                lambda *a, **k: None
                            )
                errs: list[str] = []

                def work(i):
                    try:
                        for m in range(merges_each):
                            handles[i].merge_bucketed(
                                "t",
                                batches[i],
                                snapshot=f"w{i}m{m}",
                                max_commit_retries=50,
                            )
                    except Exception as e:  # noqa: BLE001
                        errs.append(f"w{i}: {e}")

                threads = [
                    threading.Thread(target=work, args=(i,))
                    for i in range(n_writers)
                ]
                t0 = time.time()
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                elapsed = round(time.time() - t0, 3)
                total = n_writers * merges_each
                head_v = wh0.current_version("t")
                rederives = [
                    d
                    for d in os.listdir(os.path.join(root, "t"))
                    if re.search(r"-v\d+$", d)
                    or re.fullmatch(r"batch-w\d+m\d+-\d+", d)
                ]
                report[f"{proto}_{'recon' if recon else 'no_recon'}"] = {
                    "elapsed_sec": elapsed,
                    "commits": head_v - base_v,
                    "commits_per_sec": round(total / max(elapsed, 1e-3), 2),
                    "rederive_dirs": len(rederives),
                    "errors": errs,
                }
                assert not errs, errs
                assert head_v - base_v == total, (head_v, base_v, total)
            finally:
                shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "mode": "writers",
                "n_writers": n_writers,
                "merges_each": merges_each,
                "n_buckets": n_buckets,
                "runs": report,
            }
        )
    )




def main_source_pushdown():
    """Point-lookup cost through the REGISTERED batch source
    (spark.read.format("cdl_warehouse")) as the table's file count
    scales with bucket count ∝ table size (constant bytes/bucket — the
    100 TB layout): with filter pushdown the lookup plans ONE bucket's
    files at any scale (flat); the no-pushdown twin plans every live
    file (O(table)). Also reports the reader-level planned/skipped
    file counts. Usage: --source-pushdown [factor]."""
    import tempfile

    from canvas_data_loader_spark.plans.pipeline import Warehouse
    from canvas_data_loader_spark.sources.warehouse_source import (
        WarehouseDataSource,
        WarehousePushdownSnapshotReader,
        _Meta,
    )
    from pyspark.sql.datasource import EqualTo

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base_buckets = 64
    spark = get_spark("scale_probe_source_pushdown")
    spark.dataSource.register(WarehouseDataSource)
    li = spark.read.parquet(f"{BASE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "k"
    )
    probe_key = int(li.limit(1).collect()[0]["k"])
    report = {}
    for f in (1, factor):
        big = li
        for i in range(1, f):
            big = big.unionByName(
                li.withColumn("k", F.col("k") + F.lit(i * OFFSET))
            )
        root = tempfile.mkdtemp(prefix=f"scale_probe_srcpd_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write(
                "t", big, snapshot="base", bucket=("k", base_buckets * f)
            )
            meta = _Meta(root, "t")
            rd = WarehousePushdownSnapshotReader(
                meta.spark_schema(None), {"root": root, "table": "t"}
            )
            rd.pushFilters([EqualTo(("k",), probe_key)])
            planned = len(rd.partitions())
            total = rd.pushed["files_planned"] + rd.pushed["files_skipped"]

            def lookup(push: bool):
                r = (
                    spark.read.format("cdl_warehouse")
                    .option("root", root)
                    .option("table", "t")
                )
                if not push:
                    r = r.option("pushdown", "false")
                t0 = time.time()
                n = r.load().filter(F.col("k") == probe_key).count()
                assert n == 1, n
                return round(time.time() - t0, 3)

            lookup(True)  # warm the source-planning path once
            report[f"x{f}"] = {
                "n_buckets": base_buckets * f,
                "files_total": total,
                "files_planned_pushdown": planned,
                "lookup_sec_pushdown": lookup(True),
                "lookup_sec_no_pushdown": lookup(False),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    e = math.log(
        max(report[f"x{factor}"]["lookup_sec_pushdown"], 1e-3)
        / max(report["x1"]["lookup_sec_pushdown"], 1e-3)
    ) / math.log(factor)
    print(
        json.dumps(
            {
                "mode": "source-pushdown",
                "factor": factor,
                "tables": report,
                "exponent_pushdown_lookup": round(e, 3),
            }
        )
    )




def main_checkpoint():
    """Checkpoint write cost vs state size (round-10, multi-part
    classic checkpoints): synthesize a delta log whose live set holds
    N add actions (metadata only — checkpoint() never opens data
    files), checkpoint with a fixed part size, and report parts,
    total seconds, and seconds/part at N and 10N. Contract: cost per
    PART stays ~constant as the state grows — the single-part design
    this replaces funneled the whole state through one O(state)
    parquet write (the metadata bottleneck at millions of live
    files). Usage: --checkpoint [n_actions] [part_size]."""
    import tempfile

    from canvas_data_loader_spark.plans.delta import DeltaWarehouse

    n_actions = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    part_size = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    report = {}
    for n in (n_actions, n_actions * 10):
        root = tempfile.mkdtemp(prefix=f"scale_probe_ckpt_{n}_")
        try:
            wh = DeltaWarehouse(
                None,
                root,
                checkpoint_interval=10**9,
                checkpoint_part_size=part_size,
            )
            os.makedirs(wh._log_dir("t"), exist_ok=True)
            meta = wh._meta_action(
                '{"type":"struct","fields":[{"name":"id","type":"long",'
                '"nullable":true,"metadata":{}}]}',
                ("id", 32),
                None,
            )
            actions = [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {"metaData": meta},
            ] + [
                {
                    "add": {
                        "path": f"batch-b/__kb={i % 32}/part-{i:08d}.parquet",
                        "partitionValues": {"__kb": str(i % 32)},
                        "size": 1024,
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": (
                            '{"numRecords":100,"minValues":{"id":%d},'
                            '"maxValues":{"id":%d}}' % (i * 100, i * 100 + 99)
                        ),
                    }
                }
                for i in range(n)
            ]
            wh._commit("t", 0, actions)
            t0 = time.time()
            wh.checkpoint("t")
            sec = round(time.time() - t0, 3)
            lc = json.load(
                open(os.path.join(wh._log_dir("t"), "_last_checkpoint"))
            )
            parts = int(lc.get("parts") or 1)
            # replay-from-checkpoint time (the read half of the story)
            t0 = time.time()
            v, _, live, _, _ = wh._replay("t")
            replay_sec = round(time.time() - t0, 3)
            assert len(live) == n, (len(live), n)
            report[f"n{n}"] = {
                "actions": n,
                "parts": parts,
                "checkpoint_sec": sec,
                "sec_per_part": round(sec / parts, 3),
                "replay_from_checkpoint_sec": replay_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    a, b = report[f"n{n_actions}"], report[f"n{n_actions * 10}"]
    print(
        json.dumps(
            {
                "mode": "checkpoint",
                "part_size": part_size,
                "runs": report,
                "sec_per_part_ratio_10x": round(
                    b["sec_per_part"] / max(a["sec_per_part"], 1e-3), 2
                ),
            }
        )
    )


def main_ann_index():
    """Probe-cost claim for the persisted IVF embedding index (round
    11, plans/ops.py create/update/probe_ann_index): a FIXED query
    batch probed against an index over a corpus grown by disjoint
    factor-x id copies. Each scale's index uses the sqrt-cells rule
    (derive_n_cells) with bucket count ∝ cells — the constant
    bytes-per-cell layout — so a probe reads n_probe cells' buckets
    regardless of corpus size; index creation is untimed (amortized
    across imports, maintained incrementally by update_ann_index).
    The comparator is exact brute-force top-k over the same corpus —
    O(corpus) per query batch by construction. Expected: probe ~flat,
    brute-force ∝ corpus, and the gap is the index's reason to exist.
    Usage: --ann-index [factor]."""
    from canvas_data_loader_spark.operators.simsearch import (
        brute_force_topk,
        derive_n_cells,
    )
    from canvas_data_loader_spark.plans.ops import (
        create_ann_index,
        probe_ann_index,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale_probe_ann")
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") % 97 == 3).limit(32).localCheckpoint()
    n_q = queries.count()
    report = {}
    for f in (1, factor):
        dest = tempfile.mkdtemp(prefix=f"scale_probe_ann_{f}_")
        try:
            copies = [
                e.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
                for i in range(f)
            ]
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            big.repartition(16).write.mode("overwrite").parquet(
                f"{dest}/embeddings.parquet"
            )
            corpus = spark.read.parquet(f"{dest}/embeddings.parquet")
            n_rows = corpus.count()
            n_cells = derive_n_cells(n_rows)
            wh = Warehouse(spark, os.path.join(dest, "wh"))
            create_ann_index(  # untimed: amortized across imports
                wh, "ann", corpus, "s0",
                n_cells=n_cells, n_buckets=max(4, n_cells // 4),
            )

            def probe():
                return probe_ann_index(
                    wh, "ann", queries, k=10, n_probe=4
                ).count()

            def brute():
                return brute_force_topk(corpus, queries, k=10).count()

            n_p = probe()  # warm
            t0 = time.time()
            assert probe() == n_p
            t_probe = round(time.time() - t0, 3)
            n_b = brute()  # warm
            t0 = time.time()
            assert brute() == n_b
            t_brute = round(time.time() - t0, 3)
            report[f"x{f}"] = {
                "probe_sec": t_probe,
                "brute_sec": t_brute,
                "rows": n_rows,
                "cells": n_cells,
                "probe_hits": n_p,
                "brute_hits": n_b,
            }
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    exp = {
        k: round(
            math.log(
                max(report[f"x{factor}"][f"{k}_sec"], 1e-3)
                / max(report["x1"][f"{k}_sec"], 1e-3)
            )
            / math.log(factor),
            3,
        )
        for k in ("probe", "brute")
    }
    print(
        json.dumps(
            {
                "mode": "ann-index",
                "factor": factor,
                "n_queries": n_q,
                "runs": report,
                "exponent": exp,
            }
        )
    )



def main_ivfpq_index():
    """Probe-cost + storage claim for the COMPRESSED IVF-PQ index
    (round 13, plans/ops.py create/update/probe_ivfpq_index): a FIXED
    query batch probed against an index over a corpus grown by
    disjoint factor-x id copies — the main_ann_index harness with the
    compressed lane measured instead of asserted. Each scale uses the
    sqrt-cells rule with bucket count ∝ cells (constant
    bytes-per-cell); the corpus rides the warehouse bucketed by id so
    the exact re-score fetch prunes. Comparator = probe_ann_index over
    a raw-vector index of the SAME corpus (the twin the lane
    compresses); both probes read n_probe cells' buckets, so both
    should be ~flat — what the compressed lane buys is the index
    BYTES, reported per scale. Index creation is untimed (amortized
    across imports, maintained by update_ivfpq_index at O(changed)).
    Usage: --ivfpq-index [factor]."""
    from canvas_data_loader_spark.operators.simsearch import derive_n_cells
    from canvas_data_loader_spark.plans.ops import (
        create_ann_index,
        create_ivfpq_index,
        probe_ann_index,
        probe_ivfpq_index,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    def tree_bytes(root):
        total = 0
        for dp, _, fs in os.walk(root):
            for fname in fs:
                total += os.path.getsize(os.path.join(dp, fname))
        return total

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale_probe_ivfpq")
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") % 97 == 3).limit(32).localCheckpoint()
    n_q = queries.count()
    report = {}
    for f in ((1,) if factor <= 1 else (1, factor)):
        dest = tempfile.mkdtemp(prefix=f"scale_probe_ivfpq_{f}_")
        try:
            copies = [
                e.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
                for i in range(f)
            ]
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            wh = Warehouse(spark, os.path.join(dest, "wh"))
            wh.write("vecs", big, "s0", bucket=("vec_id", 16))
            n_rows = wh.read("vecs").count()
            n_cells = derive_n_cells(n_rows)
            n_b = max(4, n_cells // 4)
            create_ivfpq_index(  # untimed: amortized across imports
                wh, "pq", None, "s0", n_cells=n_cells, m_subs=8,
                n_codes=8, n_buckets=n_b, source="vecs",
            )
            create_ann_index(
                wh, "ann", None, "s0", n_cells=n_cells, n_buckets=n_b,
                source="vecs",
            )

            def probe_pq():
                return probe_ivfpq_index(
                    wh, "pq", queries, k=10, n_probe=4
                ).count()

            def probe_raw():
                return probe_ann_index(
                    wh, "ann", queries, k=10, n_probe=4
                ).count()

            n_pq = probe_pq()  # warm
            t0 = time.time()
            assert probe_pq() == n_pq
            t_pq = round(time.time() - t0, 3)
            n_raw = probe_raw()  # warm
            t0 = time.time()
            assert probe_raw() == n_raw
            t_raw = round(time.time() - t0, 3)
            # the compressed probe must return the same hit count as
            # the raw twin at every scale (pairwise identity at
            # covering rescore_c is pinned in TestIvfPqIndex)
            assert n_pq == n_raw, (n_pq, n_raw)
            b_pq = tree_bytes(wh.current_path("pq"))
            b_raw = tree_bytes(wh.current_path("ann"))
            report[f"x{f}"] = {
                "pq_sec": t_pq,
                "raw_sec": t_raw,
                "rows": n_rows,
                "cells": n_cells,
                "pq_hits": n_pq,
                "raw_hits": n_raw,
                "pq_bytes": b_pq,
                "raw_bytes": b_raw,
                "compression": round(b_raw / max(b_pq, 1), 2),
            }
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    exp = (
        {
            k: round(
                math.log(
                    max(report[f"x{factor}"][f"{k}_sec"], 1e-3)
                    / max(report["x1"][f"{k}_sec"], 1e-3)
                )
                / math.log(factor),
                3,
            )
            for k in ("pq", "raw")
        }
        if factor > 1
        else None
    )
    print(
        json.dumps(
            {
                "mode": "ivfpq-index",
                "factor": factor,
                "n_queries": n_q,
                "runs": report,
                "exponent": exp,
            }
        )
    )


def main_decontam_index():
    """Probe-cost claim for the MAINTAINED decontamination index
    (round 12, plans/ops.py register/sync/probe_decontam_index): one
    FIXED new dump decontaminated against a FIXED eval suite while the
    historical training corpus grows by disjoint factor-x copies — the
    A24/A25 new-dumps-only loop. The index path probes only the
    buckets the dump's own grams route to and never re-derives the
    eval grams, so its cost is O(dump): expected ~flat (exponent ~0)
    at any corpus size. The comparator is the q164 shape — re-derive
    eval grams AND scan the whole training corpus per pass — which
    grows with the corpus by construction. Index creation is untimed
    (amortized across imports, maintained from the eval corpus' change
    feed). Usage: --decontam-index [factor]."""
    from canvas_data_loader_spark.functions.text import tokens
    from canvas_data_loader_spark.operators.dedup import exactsubstr_grams
    from canvas_data_loader_spark.plans.ops import (
        probe_decontam_index,
        register_decontam_index,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale_probe_decontam_index")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    eval_docs = d.filter(
        F.col("source").isin("src0", "src1", "src2")
    ).select("doc_id", "text").localCheckpoint()
    dump = (
        d.filter(
            (~F.col("source").isin("src0", "src1", "src2"))
            & (F.col("doc_id") % 5 == 4)
        )
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n_dump = dump.count()
    report = {}
    for f in (1, factor):
        dest = tempfile.mkdtemp(prefix=f"scale_probe_dcidx_{f}_")
        try:
            replicate_documents_disjoint(spark, f, dest)
            corpus = spark.read.parquet(f"{dest}/documents.parquet").select(
                "doc_id", "text"
            )
            n_rows = corpus.count()
            wh = Warehouse(spark, os.path.join(dest, "wh"))
            wh.write("eval_docs", eval_docs, "s0", bucket=("doc_id", 4))
            register_decontam_index(  # untimed: maintained, not rebuilt
                wh, "dc", "eval_docs", "idx0", id_col="doc_id",
                text_col="text", n=3, n_buckets=64,
            )

            def probe():
                return probe_decontam_index(wh, "dc", dump).count()

            def recompute():
                ev_g = (
                    exactsubstr_grams(
                        eval_docs.select(
                            "doc_id", tokens(F.col("text")).alias("t")
                        ),
                        n=3,
                    )
                    .select("g")
                    .distinct()
                )
                # the full pass scans the grown corpus PLUS the dump
                # (its hit set must cover the probe's) — the q164 shape
                return (
                    exactsubstr_grams(
                        corpus.unionByName(dump).select(
                            "doc_id", tokens(F.col("text")).alias("t")
                        ),
                        n=3,
                    )
                    .join(ev_g, "g", "semi")
                    .count()
                )

            n_p = probe()  # warm
            t0 = time.time()
            assert probe() == n_p
            t_probe = round(time.time() - t0, 3)
            n_r = recompute()  # warm
            t0 = time.time()
            assert recompute() == n_r
            t_re = round(time.time() - t0, 3)
            report[f"x{f}"] = {
                "probe_sec": t_probe,
                "recompute_sec": t_re,
                "corpus_rows": n_rows,
                "probe_hits": n_p,
                "recompute_hits": n_r,
            }
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    exp = {
        k: round(
            math.log(
                max(report[f"x{factor}"][f"{k}_sec"], 1e-3)
                / max(report["x1"][f"{k}_sec"], 1e-3)
            )
            / math.log(factor),
            3,
        )
        for k in ("probe", "recompute")
    }
    print(
        json.dumps(
            {
                "mode": "decontam-index",
                "factor": factor,
                "n_dump_docs": n_dump,
                "runs": report,
                "exponent": exp,
            }
        )
    )


def main_join_view():
    """Measure join-view IVM refresh cost as the FACT table scales
    with the per-interval change batches held fixed — the claim behind
    plans/ops.py refresh_join_view: an incremental refresh reads the
    feeds plus the touched join-key buckets of the view/pending pair
    and a key-pruned slice of the dim, never the fact table, so it
    should be near-FLAT in fact size (exponent ~0) while the full
    rebuild it replaces scans everything (exponent ~1 by
    construction). Both a fact-side and a dim-side wave are timed —
    the dim-side one is the motion that NEEDS the pending sidecar.
    Usage: --join-view [factor]."""
    import tempfile

    from canvas_data_loader_spark.operators.merge import bucket_of
    from canvas_data_loader_spark.plans.ops import (
        _jv_split,
        create_join_view,
        refresh_join_view,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_join_view")
    o = spark.read.parquet(f"{BASE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    c = spark.read.parquet(f"{BASE}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    # FIXED-KEY batches (the daily dump): 32 fact upserts + 8 dim
    # re-segmentations. Bucket counts scale WITH the fact table
    # (constant bytes/bucket — the 100 TB layout, the --feedsource
    # probe's documented contract): the batch's <=32 fks then route to
    # <=32 view/pending buckets whose SIZE is scale-invariant, so the
    # incremental read is ~constant bytes while the rebuild scans the
    # growing table. With n_buckets held fixed instead, the touched
    # buckets' size grows ~linearly and the incremental measures b/N
    # of the table — that is the documented small-layout behavior, not
    # a regression.
    fact_batch = (
        o.limit(32)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )
    dim_batch = (
        c.limit(8)
        .withColumn("c_mktsegment", F.lit("RESEGMENTED"))
        .localCheckpoint()
    )

    def fact_at(f):
        big = o
        for i in range(1, f):
            big = big.unionByName(
                o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_jv_{f}_")
        try:
            wh = Warehouse(spark, root)
            n_b = 64 * f
            # pre-cluster each write by its bucket expression (the
            # rebucket discipline) so the Hive-partitioned write emits
            # one file per bucket instead of tasks x buckets shards —
            # probe SETUP cost, not the thing being measured
            big = fact_at(f)
            big = big.repartition(n_b, bucket_of(F.col("o_orderkey"), n_b))
            wh.write("orders", big, snapshot="base", bucket=("o_orderkey", n_b))
            wh.write("customer", c, snapshot="base", bucket=("c_custkey", 16))
            create_join_view(
                wh, "ojv", "orders", "customer", fk="o_custkey", n_buckets=n_b
            )
            wh.merge_bucketed("orders", fact_batch, snapshot="m1")
            t0 = time.time()
            out = refresh_join_view(wh, "ojv")
            assert out["mode"] == "incremental", out
            fact_sec = round(time.time() - t0, 3)
            wh.merge_bucketed("customer", dim_batch, snapshot="m1")
            t0 = time.time()
            out = refresh_join_view(wh, "ojv")
            assert out["mode"] == "incremental", out
            dim_sec = round(time.time() - t0, 3)
            t0 = time.time()
            out = refresh_join_view(wh, "ojv", full=True)
            assert out["mode"] == "full", out
            full_sec = round(time.time() - t0, 3)
            # exactness stays the contract at every scale
            m, pnd = _jv_split(
                wh.read("orders"), wh.read("customer"), "o_custkey",
                "c_custkey", ["c_name", "c_mktsegment"],
            )
            assert wh.read("ojv").count() == m.count()
            assert wh.read("ojv__pending").count() == pnd.count()
            report[f"x{f}"] = {
                "fact_wave_sec": fact_sec,
                "dim_wave_sec": dim_sec,
                "full_rebuild_sec": full_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    exp = {
        k: round(
            math.log(
                max(report[f"x{factor}"][k], 1e-3)
                / max(report["x1"][k], 1e-3)
            )
            / math.log(factor),
            3,
        )
        for k in ("fact_wave_sec", "dim_wave_sec", "full_rebuild_sec")
    }
    print(
        json.dumps(
            {
                "mode": "join-view",
                "factor": factor,
                "tables": report,
                "exponents": exp,
            }
        )
    )


def main_bloom_index():
    """Measure maintained-Bloom-index cost as the corpus scales with
    the dump held fixed — the claim behind plans/ops.py
    register/sync/probe_bloom_index: the filter is bounded by
    k*16^hex_chars cells no matter the corpus, so the per-dump sync
    (count deltas of the batch folded onto touched cells) and the
    probe (broadcast joins against the fixed-size filter) should both
    be near-FLAT in corpus size, while rebuilding the filter from
    scratch scans the corpus (exponent ~1). Usage: --bloom-index
    [factor]."""
    import tempfile

    from canvas_data_loader_spark.plans.ops import (
        advance_index,
        probe_bloom_index,
        register_bloom_index,
    )
    from canvas_data_loader_spark.plans.pipeline import Warehouse

    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale_probe_bloom_index")
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    dump = (
        docs.limit(512)
        .withColumn("doc_id", F.col("doc_id") + F.lit(77 * OFFSET))
        .localCheckpoint()
    )

    def corpus_at(f):
        big = docs
        for i in range(1, f):
            big = big.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
            )
        return big

    report = {}
    for f in (1, factor):
        root = tempfile.mkdtemp(prefix=f"scale_probe_bf_{f}_")
        try:
            wh = Warehouse(spark, root)
            wh.write(
                "corpus", corpus_at(f), snapshot="base", bucket=("doc_id", 64)
            )
            t0 = time.time()
            register_bloom_index(wh, "bf", "corpus", "idx0")
            build_sec = round(time.time() - t0, 3)
            wh.merge_bucketed("corpus", dump, snapshot="m1")
            t0 = time.time()
            out = advance_index(wh, "bf")
            assert out["mode"] == "incremental", out
            sync_sec = round(time.time() - t0, 3)
            t0 = time.time()
            probe_bloom_index(wh, "bf", dump).count()
            probe_sec = round(time.time() - t0, 3)
            report[f"x{f}"] = {
                "build_sec": build_sec,
                "sync_sec": sync_sec,
                "probe_sec": probe_sec,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    exp = {
        k: round(
            math.log(
                max(report[f"x{factor}"][k], 1e-3)
                / max(report["x1"][k], 1e-3)
            )
            / math.log(factor),
            3,
        )
        for k in ("build_sec", "sync_sec", "probe_sec")
    }
    print(
        json.dumps(
            {
                "mode": "bloom-index",
                "factor": factor,
                "tables": report,
                "exponents": exp,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--checkpoint":
        main_checkpoint()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ann-index":
        main_ann_index()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfpq-index":
        main_ivfpq_index()
    elif len(sys.argv) > 1 and sys.argv[1] == "--source-pushdown":
        main_source_pushdown()
    elif len(sys.argv) > 1 and sys.argv[1] == "--writers":
        main_writers()
    elif len(sys.argv) > 1 and sys.argv[1] == "--merge":
        main_merge()
    elif len(sys.argv) > 1 and sys.argv[1] == "--text":
        main_text()
    elif len(sys.argv) > 1 and sys.argv[1] == "--embed":
        main_embed()
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew":
        main_skew()
    elif len(sys.argv) > 1 and sys.argv[1] == "--neardup":
        main_neardup()
    elif len(sys.argv) > 1 and sys.argv[1] == "--textops":
        main_textops()
    elif len(sys.argv) > 1 and sys.argv[1] == "--semdedup":
        main_semdedup()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ppjoin":
        main_ppjoin()
    elif len(sys.argv) > 1 and sys.argv[1] == "--decontam":
        main_decontam()
    elif len(sys.argv) > 1 and sys.argv[1] == "--decontam-index":
        main_decontam_index()
    elif len(sys.argv) > 1 and sys.argv[1] == "--incremental-neardup":
        main_incremental_neardup()
    elif len(sys.argv) > 1 and sys.argv[1] == "--logcleanup":
        main_logcleanup()
    elif len(sys.argv) > 1 and sys.argv[1] == "--mv":
        main_mv()
    elif len(sys.argv) > 1 and sys.argv[1] == "--minmax":
        main_minmax()
    elif len(sys.argv) > 1 and sys.argv[1] == "--join-view":
        main_join_view()
    elif len(sys.argv) > 1 and sys.argv[1] == "--bloom-index":
        main_bloom_index()
    elif len(sys.argv) > 1 and sys.argv[1] == "--mirror":
        main_mirror()
    elif len(sys.argv) > 1 and sys.argv[1] == "--feedsource":
        main_feedsource()
    elif len(sys.argv) > 1 and sys.argv[1] == "--delete":
        main_delete()
    else:
        main()
