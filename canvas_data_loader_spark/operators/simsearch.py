"""Similarity search over embedding columns (``array<float>``).

Two strategies:

- ``brute_force_topk``: exact top-k cosine. Queries are broadcast
  (they're small by construction); candidates stream through a single
  projection + per-query window top-k. At 100 TB this is the correct
  baseline shape: no shuffle of the candidate table, one pass, the
  only shuffle is the final top-k combine which AQE keeps tiny.

- ``lsh_topk``: random-hyperplane LSH. Each vector hashes to a
  ``n_planes``-bit bucket; only same-bucket (or neighbor-probe)
  candidates are scored. Turns the cross product into an equi-join on
  bucket — the scale path when queries are many.

- ``ivf_topk``: inverted-file (IVF) index. A small deterministic set
  of coarse centroids partitions the corpus into cells; each query
  scores only the ``n_probe`` nearest cells. The cell assignment is
  the precomputable/bucketable artifact at scale (write the corpus
  partitioned by ``cell``); probing is an equi-join on cell.

All math is JVM-side (zip_with/aggregate in double) — deterministic,
codegen'd, oracle-comparable. Hyperplanes are generated from a seeded
RNG on the driver and inlined as literals (no closure capture).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, norm


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, sim, rank), rank 1..k, ties broken
    by neighbor_id for determinism.
    """
    # Precompute each side's L2 norm ONCE before the cross join —
    # cosine(q,c) recomputed per pair would redo the candidate norm
    # |queries| times (measured ~40% of the scan cost at k=10, 5 queries).
    # sim = dot/(qnorm*cnorm) keeps the exact same IEEE operation order
    # as cosine(), so results stay oracle-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    denom = F.col("__qn") * F.col("__cn")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom == 0, F.lit(None))
            .otherwise(dot(F.col("__qv"), F.col("__cv")) / denom)
            .alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its max-cosine coarse centroid.

    centroids: (cell:int, cvec:array<float>) — small, broadcast. The
    argmax is a struct-max aggregation (one map-side-combinable
    shuffle), never a window. Output: (out_id, vec_col, cell).
    """
    scored = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_col)
    ).crossJoin(F.broadcast(centroids)).select(
        out_id,
        vec_col,
        F.col("cell"),
        cosine(F.col(vec_col), F.col("cvec")).alias("__sim"),
    )
    best = (
        scored.groupBy(out_id)
        .agg(F.max(F.struct(F.col("__sim"), (-F.col("cell")).alias("__nc"))).alias("__m"))
        .select(out_id, (-F.col("__m.__nc")).cast("int").alias("cell"))
    )
    return df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_col)
    ).join(best, on=out_id)


def assign_cells_vectorized(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """BLAS path for cell assignment: the centroid matrix is tiny
    (n_cells x dim), so broadcast it and compute each Arrow batch's
    (batch x n_cells) cosine block in numpy — blocked like the neardup
    prefilter so no single dgemm call crosses this container's
    large-buffer stall. ~15x the expression path at 20k vectors
    (tools/scale_probe.py --embed), same argmax tie-break (equal sims
    -> smallest cell id; numpy argmax picks the first, centroids are
    ordered by cell). Zero-norm vectors score 0 against every cell and
    land in the first one deterministically.
    Output: (out_id, vec_col, cell).
    """
    import numpy as np
    import pandas as pd

    cents = centroids.orderBy("cell").collect()
    cells = np.array([r["cell"] for r in cents], dtype=np.int64)
    cmat = np.array([r["cvec"] for r in cents], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0] = np.inf
    cunit_t = np.ascontiguousarray((cmat / cn[:, None]).T)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cells, cunit_t))

    def gen(batches):
        b_cells, b_ct = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bn = np.linalg.norm(B, axis=1)
            bn[bn == 0] = np.inf
            Bu = B / bn[:, None]
            picks = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), 256):
                sims = Bu[lo : lo + 256] @ b_ct
                picks[lo : lo + len(sims)] = b_cells[np.argmax(sims, axis=1)]
            out = pdf[[id_col, vec_col]].copy()
            out.columns = [out_id, vec_col]
            out["cell"] = picks
            yield out

    in_schema = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_col)
    ).schema
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )
    return df.select(id_col, vec_col).mapInPandas(gen, fields + ", cell int")



def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse index.

    Centroids are the first ``n_cells`` candidate vectors by id —
    deterministic (no RNG, reproducible across runs/engines); a
    production build would k-means-refine them, which changes recall
    but not the dataflow. Corpus vectors are assigned to their nearest
    centroid cell; each query probes its ``n_probe`` nearest cells and
    brute-forces only those. Both joins are equi-joins on ``cell``; at
    scale the assignment is precomputed and the corpus is written
    partitioned by cell, so a probe reads n_probe/n_cells of the data.
    Output: (query_id, neighbor_id, sim, rank).
    """
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cell").asc()
    )
    centroids = (
        candidates.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col(id_col).asc()))
            .cast("int")
            .alias("cell"),
            F.col(vec_col).alias("cvec"),
        )
    )
    assign = assign_cells_vectorized if vectorized else assign_cells
    assigned = assign(candidates, centroids, id_col, vec_col, "neighbor_id")

    # Each query's n_probe nearest cells (tiny: |queries| x n_cells).
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "__qv",
            "cell",
            cosine(F.col("__qv"), F.col("cvec")).alias("__sim"),
        )
        .withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col(vec_col)).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes (driver-side, inlined as literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def bucketize(
    df: DataFrame, planes: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add an LSH ``bucket`` column: sign-bit signature over hyperplanes."""
    bucket = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.

    The cross join becomes an equi-join on ``bucket`` — at scale the
    candidate side is bucketed once (written bucketed/partitioned) and
    each query probes one bucket. Recall is tunable via n_planes
    (fewer planes = bigger buckets = higher recall, more compute).
    Output: (query_id, neighbor_id, sim, rank).
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = bucketize(
        candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        planes,
        "__cv",
    )
    q = bucketize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        planes,
        "__qv",
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_neardup_pairs(
    candidates: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs with cosine >= threshold, exactly.

    Two phases:

    1. PREFILTER (vectorized): the corpus matrix is broadcast and each
       Arrow batch computes a (batch x corpus) normalized matmul in
       numpy, keeping pairs above ``threshold - margin``. This replaces
       the interpreted per-pair aggregate() over the full cross join —
       measured 10x+ at sf0.1 (12.5M pairs). BLAS summation order
       differs from sequential, hence the margin, not the verdict.
    2. EXACT (expression): survivors (tiny) are re-scored with the
       same sequential-order zip_with/aggregate expression the oracle
       uses, and the final threshold is applied there — results are
       bit-identical to the naive plan.

    At 100 TB the broadcast side is an LSH/IVF bucket, not the whole
    corpus — same two-phase shape, bounded block sizes.
    Output: (vec_a, vec_b, sim) with vec_a < vec_b.
    """
    import numpy as np
    import pandas as pd

    rows = candidates.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.inf  # zero vectors match nothing
    unit = mat / norms[:, None]
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((ids, unit))
    margin = 1e-9

    def gen(batches):
        c_ids, c_unit = bc.value
        ct = np.ascontiguousarray(c_unit.T)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bn = np.linalg.norm(B, axis=1)
            bn[bn == 0] = np.inf
            Bu = B / bn[:, None]
            # Block the matmul: bounded (256 x corpus) outputs keep
            # every BLAS call on the small-buffer fast path (this
            # container's dgemm hits a multi-second stall on large
            # single calls) and bound peak memory regardless of how
            # big an Arrow batch the reader hands us.
            outs = []
            for lo in range(0, Bu.shape[0], 256):
                sims = Bu[lo : lo + 256] @ ct
                bi, ci = np.nonzero(sims >= threshold - margin)
                a, b = b_ids[lo:][bi], c_ids[ci]
                keep = a < b
                outs.append(pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep]}))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"vec_a": [], "vec_b": []}
            )

    cand_pairs = candidates.select(id_col, vec_col).mapInPandas(
        gen, "vec_a long, vec_b long"
    )
    a = candidates.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va")
    )
    b = candidates.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb")
    )
    exact = cosine(F.col("__va"), F.col("__vb"))
    return (
        cand_pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("sim", exact)
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )
