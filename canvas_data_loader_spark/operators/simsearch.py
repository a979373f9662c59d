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

import math
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


def first_n_centroids(
    df: DataFrame,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    base: int = 1,
) -> DataFrame:
    """The first ``n`` vectors by id with an explicit index column —
    the deterministic centroid seed used by ivf_topk/semantic_dedup.

    Indexing happens driver-side over the collected <= n rows instead
    of a global ``row_number()`` over ``Window.orderBy`` on the
    ``limit(n)`` frame: identical deterministic result, but no
    single-partition WindowExec (warning-clean plans). The centroid
    frame was always destined for a broadcast, so materializing n
    rows on the driver moves no more data than that broadcast would;
    at corpus sizes where n ~ sqrt(corpus) outgrows the driver (~1e6
    cells), swap the broadcast for a shuffle join on cell and keep
    centroids as a table. The vector element type is preserved
    exactly (float32 values round-trip losslessly through Python
    floats), so downstream scores are bit-identical.
    """
    rows = (
        df.orderBy(F.col(id_col).asc()).limit(n).select(id_col, vec_col).collect()
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(cell_col, T.IntegerType(), False),
            T.StructField("cvec", df.schema[vec_col].dataType, False),
        ]
    )
    data = [(i + base, list(r[1])) for i, r in enumerate(rows)]
    return df.sparkSession.createDataFrame(data, schema)


def _round_half_up(x: float, dp: int) -> float:
    """Replicate Spark's ``round(double, dp)`` exactly on the driver.

    Spark's Round is BigDecimal.valueOf(x).setScale(dp, HALF_UP)
    .doubleValue(); BigDecimal.valueOf goes through Double.toString —
    the shortest round-trip decimal — and Python's repr() is the same
    shortest form, so Decimal(repr(x)) is the identical decimal value.
    The trailing ``+ 0.0`` folds -0.0 to +0.0 (BigDecimal is
    sign-magnitude, so Java loses the zero sign; IEEE x + 0.0 == x for
    every other double)."""
    from decimal import ROUND_HALF_UP, Decimal

    return (
        float(
            Decimal(repr(float(x))).quantize(
                Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
            )
        )
        + 0.0
    )


def _lloyd_partials_vectorized(
    df: DataFrame, cent_rows, vec_col: str
) -> DataFrame:
    """Fused assign+partial-sum pass for one vectorized Lloyd step.

    ONE mapInPandas pass over the corpus computes each batch's argmax
    cell (same blocked-BLAS argmax and tie-break as
    assign_cells_vectorized) and immediately folds the batch into
    per-cell partial sums — the Python boundary returns n_cells rows
    per Arrow batch (cell, cnt, sums) instead of shipping every
    (id, vector, cell) row back to the JVM for a posexplode + two
    shuffles (guide §2.3: aggregate before you shuffle / shuffle
    metadata, not payloads). At 100 TB the per-task partials are
    n_cells x dim doubles regardless of corpus size.
    Output rows: (cell int, cnt long, sums array<double>).
    """
    import numpy as np
    import pandas as pd

    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["cvec"] for r in cent_rows], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0] = np.inf
    cunit_t = np.ascontiguousarray((cmat / cn[:, None]).T)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bn = np.linalg.norm(B, axis=1)
            bn[bn == 0] = np.inf
            Bu = B / bn[:, None]
            idx = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), 256):
                sims = Bu[lo : lo + 256] @ cunit_t
                idx[lo : lo + len(sims)] = np.argmax(sims, axis=1)
            out_c, out_n, out_s = [], [], []
            for ci in np.unique(idx):
                m = idx == ci
                out_c.append(int(cells[ci]))
                out_n.append(int(m.sum()))
                out_s.append(B[m].sum(axis=0))
            yield pd.DataFrame({"cell": out_c, "cnt": out_n, "sums": out_s})

    return df.select(F.col(vec_col).alias(vec_col)).mapInPandas(
        gen, "cell int, cnt long, sums array<double>"
    )


def lloyd_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
    round_dp: int = 6,
) -> DataFrame:
    """One deterministic Lloyd (k-means) iteration over cosine cells.

    Assignment is the tie-broken argmax of ``assign_cells`` (equal
    sims -> smallest cell); the update is the element-wise mean of
    each cell's members, ROUNDED to ``round_dp`` decimals so the
    order-dependent double sum is reproducible across partitionings
    and engines (the repo-wide 6dp policy for order-dependent sums —
    per-dimension cell sums have tens-to-thousands of terms, far
    inside the safe range; it is what lets the two mean paths below
    coexist with each other and with the DuckDB oracle's own
    summation order). Empty cells keep their previous centroid
    (cast to double, exact for float32 inputs).

    Vectorized path: ONE fused mapInPandas pass computes assignment
    and per-cell partial sums together (_lloyd_partials_vectorized);
    the driver folds the tiny (task-batch x cell) partials in collect
    order and applies the Spark-identical HALF_UP rounding
    (_round_half_up). Replaces the former assignment pass + posexplode
    + groupBy(cell, dim) + groupBy(cell) tower — two shuffles and a
    corpus-sized Python->JVM return removed per iteration (measured
    q118 lloyd step 3.5s -> ~0.6s at sf0.1).

    Expression path: per-dimension means via posexplode +
    groupBy(cell, dim) — a map-side-combinable AVG whose shuffle is
    n_cells x dim partial sums. (A 64-wide one-shot agg was tried and
    is ~3x slower here — wholestage codegen compile dominates at this
    width.) The empty-cell fallback is merged driver-side against the
    already-collected previous centroids — no join.

    The <= n_cells result rows are materialized on the driver (they
    were destined for a broadcast anyway), so each iteration's plan
    starts from a literal frame instead of an ever-deeper lazy chain.
    Output: (cell:int, cvec:array<double>).
    """
    cent_rows = centroids.orderBy("cell").collect()  # <= n_cells, tiny
    if vectorized:
        import numpy as np

        acc: dict[int, list] = {}
        # collect order == partition order (deterministic scan split),
        # batch partials within a partition arrive in batch order —
        # the fold order is reproducible run to run; cross-order
        # last-ulp drift is absorbed by the round_dp policy above
        for r in _lloyd_partials_vectorized(df, cent_rows, vec_col).collect():
            c = int(r["cell"])
            v = np.asarray(r["sums"], dtype=np.float64)
            if c in acc:
                acc[c][0] = acc[c][0] + v
                acc[c][1] += int(r["cnt"])
            else:
                acc[c] = [v, int(r["cnt"])]
        got = {
            c: [_round_half_up(x / n, round_dp) for x in s]
            for c, (s, n) in acc.items()
        }
    else:
        assigned = assign_cells(df, centroids, id_col, vec_col, "__kid")
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("cell", "dim")
            .agg(F.round(F.avg(F.col("val").cast("double")), round_dp).alias("cval"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("__s"))
            .select("cell", F.expr("transform(__s, x -> x.cval)").alias("mvec"))
        )
        got = {int(r["cell"]): list(r["mvec"]) for r in means.collect()}
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("cvec", T.ArrayType(T.DoubleType()), False),
        ]
    )
    data = [
        (
            int(r["cell"]),
            got.get(int(r["cell"]), [float(x) for x in r["cvec"]]),
        )
        for r in cent_rows
    ]
    return df.sparkSession.createDataFrame(data, schema)


def refined_centroids(
    df: DataFrame,
    n_cells: int,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
) -> DataFrame:
    """Coarse-quantizer centroids: deterministic first-n-by-id seed,
    optionally refined by ``refine_iters`` Lloyd iterations.

    Fully reproducible end to end — seeded init (no RNG), fixed
    iteration count, tie-broken assignment, 6dp-rounded means — so
    even the REFINED approximate index stays oracle-checkable (the
    SQL mirror unrolls the same iterations). Production recall wants
    refine_iters >= 1: the first-N seed collapses most of the corpus
    into few cells, while refined centroids spread it (measured in
    tests/test_operators.py::TestKmeansRefine).
    """
    c = first_n_centroids(df, n_cells, id_col, vec_col)
    for _ in range(refine_iters):
        c = lloyd_step(df, c, id_col, vec_col, vectorized)
    return c


def _json_arr_lit(values, elem_type: str) -> F.Column:
    """A driver-side list as ONE constant-folded array literal.

    ``from_json`` over a single string literal keeps the analysis tree
    at one node — an ``array(lit, lit, ...)`` expression carries one
    child PER ELEMENT and every analyzer/optimizer rule re-traverses
    them all (measured 1.4s of pure plan analysis for a 1024-element
    centroid table vs 0.015s this way), and per-element ``F.lit``
    calls pay a py4j round-trip each. The optimizer constant-folds the
    parse once (foldable input), so execution reads a plain Literal.
    Doubles go through repr (shortest round-trip form) and Jackson's
    correctly-rounded parser — bit-exact; non-finite values would be
    invalid JSON and silently NULL the whole array, so they are
    refused here (none of the callers can produce them).
    """
    return F.expr(_json_arr_sql(values, elem_type))


def _json_arr_sql(values, elem_type: str) -> str:
    """SQL-text form of ``_json_arr_lit`` (same constant-folded
    from_json-over-one-literal discipline), for expressions assembled
    as a single SQL string."""
    if elem_type == "double":
        import math as _math

        if any(not _math.isfinite(v) for v in values):
            raise ValueError("_json_arr_sql: non-finite value")
        body = ",".join(repr(float(v)) for v in values)
    else:
        body = ",".join(str(int(v)) for v in values)
    return f"from_json('[{body}]', 'array<{elem_type}>')"


def argmax_cell_expr(cent_rows, vec_col) -> F.Column:
    """The max-cosine cell of one vector column as a PURE codegen
    expression over the collected centroid rows (cell, cvec), ties ->
    smallest cell, all-NULL sims (zero-norm vector or all-zero
    centroids) -> smallest cell.

    Bit-equivalence with the old crossJoin + max(struct(sim, -cell))
    aggregate path: each sim is the identical IEEE op sequence
    (zip_with cast-to-double products, left fold from 0.0, divided by
    norm(v) * norm(c)); centroid norms are pre-folded on the driver
    with the same sequential double arithmetic (Python float IS
    binary64, math.sqrt is correctly rounded like the JVM's); the
    argmax picks the FIRST occurrence of the array max over cells
    sorted ascending, which is exactly the max-struct tie-break. The
    codebook rides as ONE flattened parsed literal (the _cb_flat_lit
    discipline: no per-element py4j chatter, O(1) expression tree in
    n_cells), and norm(v) / the sims array are each bound ONCE via
    single-element transform lambdas so nothing re-evaluates per cell.

    The whole tree is assembled as ONE SQL string handed to F.expr —
    building the identical tree through the Python Column API costs
    ~300 py4j round trips (each nested lambda is several JVM calls;
    measured 0.7-0.8s of pure driver chatter per invocation at k=16,
    and the Lloyd refinement path invokes this once per iteration).
    One parse call produces the same analyzed expressions, so the
    executed plan — and every IEEE op — is unchanged.
    """
    import math as _math

    cent_rows = sorted(cent_rows, key=lambda r: int(r["cell"]))
    dim = len(cent_rows[0]["cvec"])
    k = len(cent_rows)
    cflat = _json_arr_sql(
        [float(x) for r in cent_rows for x in r["cvec"]], "double"
    )
    cells = _json_arr_sql([int(r["cell"]) for r in cent_rows], "int")
    norms = []
    for r in cent_rows:
        acc = 0.0
        for x in r["cvec"]:
            acc = acc + float(x) * float(x)
        norms.append(_math.sqrt(acc))
    cnorms = _json_arr_sql(norms, "double")
    if not isinstance(vec_col, str):
        raise TypeError("argmax_cell_expr: vec_col must be a column name")
    col = f"`{vec_col}`"
    nv = (
        f"sqrt(aggregate({col}, 0.0D,"
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    # sims_of(n): per-cell cosine, NULL when the denominator is zero
    sims = (
        f"transform(sequence(0, {k - 1}), j -> "
        f"CASE WHEN (n * element_at({cnorms}, j + 1)) = 0"
        " THEN CAST(NULL AS DOUBLE)"
        f" ELSE aggregate(zip_with({col},"
        f" slice({cflat}, (j * {dim}) + 1, {dim}),"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (a, x) -> a + x)"
        f" / (n * element_at({cnorms}, j + 1)) END)"
    )
    # pick_of(s): first index holding the max = smallest cell among
    # sim-ties (cells ascending); array_position yields NULL when the
    # max itself is NULL (all sims NULL) and the old max-struct
    # ordering resolved that case to the smallest cell too
    pick = (
        f"element_at({cells},"
        " CAST(coalesce(nullif(array_position(s, array_max(s)), 0), 1)"
        " AS INT))"
    )
    return F.expr(
        f"element_at(transform(array({nv}), n -> "
        f"element_at(transform(array({sims}), s -> {pick}), 1)), 1)"
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its max-cosine coarse centroid.

    centroids: (cell:int, cvec:array<float|double>) — small; collected
    to the driver (it was always destined for a broadcast, so this
    moves no more data) and inlined as one flattened literal so the
    assignment is a PURE per-row projection: no crossJoin row
    explosion, no argmax shuffle, no join-back — the plan is scan ->
    project, mirroring the vectorized mapInPandas path's shape. Same
    argmax and tie-break as the old max-struct aggregate
    (argmax_cell_expr documents the bit-equivalence argument).
    Output: (out_id, vec_col, cell).
    """
    cent_rows = centroids.orderBy("cell").collect()
    return df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(vec_col),
        argmax_cell_expr(cent_rows, vec_col).cast("int").alias("cell"),
    )


def assign_cells_vectorized(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
    keep_vec: bool = True,
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
    Output: (out_id, vec_col, cell) — or (out_id, cell) with
    ``keep_vec=False``: Spark cannot prune columns a mapInPandas
    function emits, so callers that only need the assignment (e.g.
    semantic_dedup's id/cell frame, the ANN-index departing-rows
    re-location) would otherwise ship every vector Python -> JVM just
    to drop it (guide §4.1: control what crosses the boundary).
    """
    import numpy as np
    import pandas as pd

    cents = centroids.orderBy("cell").collect()
    cells = np.array([r["cell"] for r in cents], dtype=np.int64)
    cmat = np.array([r["cvec"] for r in cents], dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0] = np.inf
    # closure capture, not SparkContext.broadcast: the centroid matrix
    # is n_cells x dim doubles (KBs); per-plan-build broadcasts
    # accumulate un-unpersistable blocks across a long session
    cunit_t = np.ascontiguousarray((cmat / cn[:, None]).T)

    def gen(batches):
        b_cells, b_ct = cells, cunit_t
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
            out = pdf[[id_col, vec_col] if keep_vec else [id_col]].copy()
            out.columns = [out_id, vec_col] if keep_vec else [out_id]
            out["cell"] = picks
            yield out

    keep_cols = [out_id, vec_col] if keep_vec else [out_id]
    in_schema = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_col)
    ).select(*keep_cols).schema
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
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse index.

    Centroids seed from the first ``n_cells`` candidate vectors by id
    — deterministic (no RNG, reproducible across runs/engines) — and
    are optionally k-means-refined by ``refine_iters`` deterministic
    Lloyd iterations (see refined_centroids), which improves recall
    without changing the dataflow. Corpus vectors are assigned to their nearest
    centroid cell; each query probes its ``n_probe`` nearest cells and
    brute-forces only those. Both joins are equi-joins on ``cell``; at
    scale the assignment is precomputed and the corpus is written
    partitioned by cell, so a probe reads n_probe/n_cells of the data.
    Output: (query_id, neighbor_id, sim, rank).
    """
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cell").asc()
    )
    centroids = refined_centroids(
        candidates, n_cells, refine_iters, id_col, vec_col, vectorized
    )
    assign = assign_cells_vectorized if vectorized else assign_cells
    # Precompute each side's L2 norm ONCE before the probe join (the
    # brute_force_topk discipline): inline cosine() would re-derive
    # norm(__qv) for every candidate row and norm(candidate) for every
    # probe row — ~2/3 of the scored join's expression work. The op
    # sequence (dot / (norm*norm), NULL on zero denom) is unchanged, so
    # scores stay bit-identical to cosine() (oracle-pinned).
    assigned = assign(
        candidates, centroids, id_col, vec_col, "neighbor_id"
    ).withColumn("__cn", norm(F.col(vec_col)))

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
        .select("query_id", "__qv", norm(F.col("__qv")).alias("__qn"), "cell")
    )
    denom = F.col("__qn") * F.col("__cn")
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom == 0, F.lit(None))
            .otherwise(dot(F.col("__qv"), F.col(vec_col)) / denom)
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


def derive_n_cells(n_rows: int, floor: int = 16) -> int:
    """Cell count for sqrt-scaled coarse clustering: max(floor, ceil(sqrt(n))).

    With n_cells ~ sqrt(n) the within-cell pair space sum_c |cell|^2 =
    n^2/n_cells grows ~ n^1.5 instead of the fixed-cell n^2 (measured:
    exponent 0.24 vs 1.17 at 20x in tools/scale_probe.py). Integer
    ceil-sqrt (math.isqrt) so the result is exact at any corpus size.
    """
    if n_rows <= 0:
        return floor
    r = math.isqrt(n_rows)
    return max(floor, r if r * r == n_rows else r + 1)


def semantic_dedup(
    candidates: DataFrame,
    threshold: float,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus coarsely, then within each
    cluster drop every vector that has a kept (lower-id) near-duplicate
    above ``threshold`` cosine.

    Keep rule: a vector survives iff NO lower-id vector in the SAME
    cell (kept or dropped) has cosine >= threshold with it — one
    within-cell self-join plus an anti-join, no iteration. NOTE this
    is slightly MORE aggressive than a literal greedy sweep (which
    compares only against already-KEPT lower ids): in a chain
    a~b, b~c, a!~c the greedy sweep re-keeps c, this rule drops it.
    The relational form needs no sequential pass and guarantees the
    stronger invariant that no two SURVIVORS in a cell are within
    threshold. Duplicates are only sought inside a cluster, so the
    pair space is O(sum_c |cell|^2) like an LSH bucket join, never
    O(n^2); cross-cell near-dups are the (tunable) recall loss,
    exactly as in SemDeDup.

    Centroids are the first ``n_cells`` vectors by id (deterministic,
    mirrors ivf_topk); production would k-means-refine them. When
    ``n_cells`` is None (the default) it is DERIVED from a corpus
    count as max(16, ceil(sqrt(n))) — the sqrt-cells discipline is
    enforced, not just documented, so a naive caller cannot ship the
    quadratic fixed-cell shape (scale_probe: exponent 0.24 sqrt-cells
    vs 1.17 fixed at 20x). The count is one cheap count(*) job
    (parquet row-group metadata for file sources). At scale:
    ``vectorized=True`` for the blocked-BLAS cell assignment, write
    the corpus partitioned by cell, and the dedup is a per-partition
    self-join with no global shuffle.

    Output: surviving (``id_col``, cell) rows.
    """
    if n_cells is None:
        n_cells = derive_n_cells(candidates.count())
    centroids = refined_centroids(
        candidates, n_cells, refine_iters, id_col, vec_col, vectorized
    )
    # the assignment feeds THREE plan branches (both sides of the
    # within-cell pair join and the final anti-join), and every branch
    # needs only (id, cell) — the vectors come back via _exact_rescore
    # keyed by id. Without a barrier the cell assignment — a full
    # corpus x n_cells scoring pass — re-executes per branch (plan
    # audit: three MapInPandas nodes on the vectorized path). One
    # EAGER materialization of the narrow (id, cell) projection runs
    # it once; eager, not lazy, because the three consumers sit in the
    # SAME job and concurrent tasks of a lazy checkpoint each
    # recompute the partition they race on.
    assigned_ids = (
        # vectorized path: don't ship the vectors back across Arrow
        # just to drop them (mapInPandas output is never column-pruned)
        assign_cells_vectorized(
            candidates, centroids, id_col, vec_col, "__id", keep_vec=False
        )
        if vectorized
        else assign_cells(candidates, centroids, id_col, vec_col, "__id")
    )
    ids = assigned_ids.select("__id", "cell").localCheckpoint(eager=True)
    assigned = ids
    # candidate pairs carry IDS ONLY through the cell self-join; the
    # vectors and per-side cached norms come back via _exact_rescore
    # (one dot per pair instead of dot+2 norms — measured 5.2s -> 2.0s
    # at sf0.1 on the 1.5M within-cell pairs).
    cand_pairs = (
        ids.join(ids.select(F.col("__id").alias("__idb"), "cell"), on="cell")
        .filter(F.col("__idb") < F.col("__id"))
        .select(F.col("__idb").alias("vec_a"), F.col("__id").alias("vec_b"))
    )
    dup_ids = (
        _exact_rescore(candidates, cand_pairs, threshold, id_col, vec_col)
        .select(F.col("vec_b").alias("__id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids, on="__id", how="left_anti")
        .select(F.col("__id").alias(id_col), "cell")
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


def _exact_rescore(
    candidates: DataFrame,
    cand_pairs: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Phase 2 of near-dup: re-score candidate (vec_a, vec_b) pairs with
    the sequential-order zip_with/aggregate expression the oracle uses
    and apply the exact threshold — results are bit-identical to the
    naive all-pairs plan regardless of how candidates were generated.

    Norms are computed ONCE per vector on the (small) per-side
    projections rather than per pair: identical float64 expression on
    identical data → identical value, but the interpreted HOF work
    drops from 3 aggregates per candidate pair to 1 (the dot) plus
    O(vectors) — measured ~2x on the 72k-pair sf0.1 LSH path."""
    a = candidates.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = candidates.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    exact = F.when(denom == 0, F.lit(None)).otherwise(
        dot(F.col("__va"), F.col("__vb")) / denom
    )
    return (
        cand_pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("sim", exact)
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


def embedding_neardup_pairs(
    candidates: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All unordered pairs with cosine >= threshold, EXACTLY — fully
    distributed (no driver-side corpus materialization, no full-corpus
    broadcast).

    Two phases:

    1. PREFILTER (distributed block-pair BLAS): each row hashes to one
       of ``n_blocks`` stable blocks; every unordered block pair
       (i <= j) forms one shuffle group holding exactly blocks i and j.
       Each group computes its (|i| x |j|) normalized matmul in numpy
       (inner-blocked at 256 rows to stay on this container's
       small-buffer BLAS fast path) and keeps pairs above
       ``threshold - margin``. Every qualifying pair lives in exactly
       one group, so candidate generation is complete — this is exact,
       not LSH. Replication factor is n_blocks; peak task memory is
       O(2·corpus/n_blocks · dim), tuned by n_blocks, never O(corpus)
       on one node. (Round 1 collected the whole corpus on the driver
       and broadcast the matrix — correct at sf0.1, OOM at scale.)
       BLAS summation order differs from sequential, hence the margin,
       not the verdict.
    2. EXACT (expression): survivors (tiny) re-scored sequentially and
       thresholded — bit-identical to the naive plan.

    Total work is inherently O(n²/2) dot products (it is an exact
    operator); the scale lever is distribution, and for corpora where
    quadratic work itself is the problem, ``embedding_neardup_pairs_lsh``
    is the sub-quadratic approximate path.
    Output: (vec_a, vec_b, sim) with vec_a < vec_b.
    """
    import numpy as np
    import pandas as pd

    margin = 1e-9
    src = candidates.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("__blk"),
    )
    # Replicate each row into every block pair its block participates
    # in: group key (gi, gj) = (min(blk, p), max(blk, p)) over all p.
    # Block-i rows reach group (i, j) exactly once (p = j), so a pair
    # (a in i, b in j) is scored exactly once, in group (i, j).
    pairs_of = F.array(
        *[
            F.struct(
                F.least(F.col("__blk"), F.lit(p)).alias("gi"),
                F.greatest(F.col("__blk"), F.lit(p)).alias("gj"),
            )
            for p in range(n_blocks)
        ]
    )
    rep = src.select(
        "__id", "__v", "__blk", F.explode(pairs_of).alias("__g")
    ).select("__id", "__v", "__blk", F.col("__g.gi").alias("gi"), F.col("__g.gj").alias("gj"))

    def score_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        gi, gj = int(pdf["gi"].iat[0]), int(pdf["gj"].iat[0])

        def unit_of(frame):
            ids = frame["__id"].to_numpy(dtype=np.int64)
            M = np.stack(frame["__v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0] = np.inf  # zero vectors match nothing
            return ids, M / nrm[:, None]

        if gi == gj:
            l_ids, Lu = unit_of(pdf)
            r_ids, Ru = l_ids, Lu
        else:
            l_ids, Lu = unit_of(pdf[pdf["__blk"] == gi])
            r_ids, Ru = unit_of(pdf[pdf["__blk"] == gj])
        Rt = np.ascontiguousarray(Ru.T)
        outs = []
        for lo in range(0, Lu.shape[0], 256):
            sims = Lu[lo : lo + 256] @ Rt
            li, ri = np.nonzero(sims >= threshold - margin)
            a, b = l_ids[lo:][li], r_ids[ri]
            if gi == gj:
                # within-block: L x L scores each unordered pair twice
                # (and self-pairs once) — keep the a < b half only
                keep = a < b
                a, b = a[keep], b[keep]
            else:
                # cross-block: L x R scores each unordered pair exactly
                # once; id order is independent of block order, so
                # normalize instead of filtering (filtering here DROPS
                # the pairs whose id order opposes the block order)
                a, b = np.minimum(a, b), np.maximum(a, b)
            outs.append(pd.DataFrame({"vec_a": a, "vec_b": b}))
        return (
            pd.concat(outs)
            if outs
            else pd.DataFrame({"vec_a": [], "vec_b": []})
        )

    cand_pairs = rep.groupBy("gi", "gj").applyInPandas(
        score_group, "vec_a long, vec_b long"
    )
    return _exact_rescore(candidates, cand_pairs, threshold, id_col, vec_col)


def band_signatures_vectorized(
    src: DataFrame,
    n_bands: int,
    band_bits: int,
    dim: int,
    seed: int,
) -> DataFrame:
    """All band signatures in one blocked-BLAS pass: (__id, band, sig).

    The expression path inlines n_bands x band_bits dot-product
    aggregates — at 8x8 that is a 64-expression tree whose whole-stage
    codegen COMPILE dominates end-to-end time on small inputs (measured
    ~4.7s at sf0.1 for the plan, of which <1s is row work), and whose
    per-row interpreted cost still scales with bits x dim. Here the
    full plane matrix ((n_bands*band_bits) x dim, driver-built from the
    same seeds) is broadcast once and each Arrow batch computes its
    (batch x planes) sign block with one dgemm, blocked at 256 rows
    like ``assign_cells_vectorized`` so no call crosses the container's
    large-buffer stall. Bits pack per band exactly like the expression
    path (bit i set iff dot >= 0, weight 1<<i).

    Sign parity with the expression path: a BLAS dot and a sequential
    fold can disagree only when |dot| is within fp-summation error of
    zero (~1e-13 for unit-scale 64-dim data) — vanishingly rare and
    checked by the differential oracle, which reproduces the
    sequential order.
    """
    import numpy as np

    planes = []
    for band in range(n_bands):
        planes.extend(hyperplanes(dim, band_bits, seed + 1000 * band))
    # plane matrix rides the task closure, NOT a SparkContext broadcast:
    # it is ~(n_bands*band_bits*dim*8) bytes (tens of KB), and a
    # broadcast created at every plan build accumulates driver/executor
    # blocks for the session lifetime (bench --repeat, long sessions)
    # with no safe place to unpersist a lazily-consumed broadcast
    plane_mat = np.ascontiguousarray(np.array(planes, dtype=np.float64).T)
    weights_shape = (n_bands, band_bits)

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        P = plane_mat  # dim x (n_bands*band_bits)
        w = (_np.ones(weights_shape, dtype=_np.int64) << _np.arange(band_bits))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["__id"].to_numpy()
            B = _np.stack(pdf["__v"].to_numpy()).astype(_np.float64)
            sigs = _np.empty((len(pdf), weights_shape[0]), dtype=_np.int64)
            for lo in range(0, len(pdf), 256):
                bits = (B[lo : lo + 256] @ P) >= 0  # batch x planes
                bb = bits.reshape(len(bits), *weights_shape)
                sigs[lo : lo + len(bits)] = (bb * w).sum(axis=2)
            n = len(pdf)
            yield _pd.DataFrame(
                {
                    "__id": _np.repeat(ids, weights_shape[0]),
                    "band": _np.tile(
                        _np.arange(weights_shape[0], dtype=_np.int64), n
                    ),
                    "sig": sigs.reshape(-1),
                }
            )

    id_type = src.schema["__id"].dataType.simpleString()
    return src.mapInPandas(gen, f"__id {id_type}, band int, sig int")


def embedding_neardup_pairs_lsh(
    candidates: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    vectorized: bool = False,
) -> DataFrame:
    """Near-dup pairs via banded random-hyperplane LSH — the
    sub-quadratic 100 TB path (high recall, not guaranteed-exhaustive).

    ``n_bands`` independent sign-bit signatures of ``band_bits`` planes
    each; a pair becomes a candidate if it collides in ANY band (the
    MinHash-LSH banding scheme applied to the cosine family). For
    threshold t the per-pair candidate probability is
    1 - (1 - p^band_bits)^n_bands with p = 1 - arccos(t)/pi — at
    t = 0.95 and (8 bands x 8 bits) recall is ~0.99 and the pair space
    collapses to same-bucket pairs: O(sum_b |bucket|²) << O(n²) on
    real (non-degenerate) embedding distributions. Survivors get the
    same exact sequential re-score as the exact operator, so precision
    is 1 — only recall is approximate.
    Output: (vec_a, vec_b, sim) with vec_a < vec_b.
    """
    src = candidates.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    if vectorized:
        # blocked-BLAS signatures (see band_signatures_vectorized): one
        # dgemm per Arrow batch instead of n_bands*band_bits inlined
        # dot aggregates whose codegen compile dominates.
        tagged = band_signatures_vectorized(src, n_bands, band_bits, dim, seed)
    else:
        band_cols = []
        for band in range(n_bands):
            planes = hyperplanes(dim, band_bits, seed + 1000 * band)
            sig = None
            for i, p in enumerate(planes):
                plane = F.array(*[F.lit(x) for x in p])
                bit = F.when(dot(F.col("__v"), plane) >= 0, F.lit(1 << i)).otherwise(
                    F.lit(0)
                )
                sig = bit if sig is None else sig + bit
            band_cols.append(
                F.struct(F.lit(band).alias("band"), sig.cast("int").alias("sig"))
            )
        tagged = src.select(
            "__id", F.explode(F.array(*band_cols)).alias("__b")
        ).select(
            "__id",
            F.col("__b.band").alias("band"),
            F.col("__b.sig").alias("sig"),
        )
    # the signature table is BOTH sides of the bucket self-join; a lazy
    # barrier computes the n_bands x band_bits signatures once instead
    # of once per side (on the vectorized path that is a whole Arrow
    # dgemm pass over the corpus per side)
    tagged = tagged.localCheckpoint(eager=False)
    cand_pairs = (
        tagged.alias("a")
        .join(tagged.alias("b"), on=["band", "sig"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("vec_a"), F.col("b.__id").alias("vec_b")
        )
        .distinct()  # a pair may collide in several bands
    )
    return _exact_rescore(candidates, cand_pairs, threshold, id_col, vec_col)


# ---------------------------------------------------------------------------
# Product quantization (round 13 — VERDICT r12 next-round #4): the
# q115 code path factored into reusable pieces for the IVF-PQ
# compressed index (plans/ops.py create_ivfpq_index). Everything is
# deterministic — codebook = sub-slices of the first n_codes vectors
# by id (L2-NORMALIZED, so squared ADC distance ranks identically to
# cosine: |u-v|^2 = 2 - 2cos for unit vectors), L2 argmin ties to the
# smallest code — so even the compressed representation is
# oracle-checkable bit-exactly (q115's property). Codes PACK into one
# BIGINT (8 bits per subspace, m_subs <= 8, n_codes <= 256): the
# stored index row is (id, cell, code) — two longs and an int.
# ---------------------------------------------------------------------------


def _unit_expr(vec_col):
    """The L2-normalized copy of a vector column (zero vectors stay
    zero), as a pure expression. The norm is bound ONCE as a lambda
    variable of an outer single-element transform — inlining its
    aggregate subtree inside the per-element lambda re-runs the whole
    64-term fold for every element (dim^2 work per row; measured 1.4s
    for 2000 rows before the hoist, ~0.1s after). Same arithmetic,
    same values — only the evaluation count changes."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    nrm = F.sqrt(
        F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return F.element_at(
        F.transform(
            F.array(nrm),
            lambda n: F.transform(
                col,
                lambda x: F.when(n == 0, F.lit(0.0)).otherwise(
                    x.cast("double") / n
                ),
            ),
        ),
        1,
    )


def pq_codebook(
    vectors: DataFrame,
    n_codes: int,
    m_subs: int,
    id_col: str,
    vec_col: str,
    refine_iters: int = 0,
) -> list[list[list[float]]]:
    """Deterministic PQ codebook: ``codebook[m][c]`` = the m-th
    sub-slice of the c-th training vector AFTER L2 normalization,
    training vectors = the first ``n_codes`` rows by id
    (first_n_centroids' seeding rule), optionally Lloyd-refined per
    subspace over the full corpus (``refine_iters`` sweeps; fully
    reproducible — same seed, same argmin tie rule, means are
    order-insensitive sums). Refinement is what buys ADC its ranking
    quality on real data: the first-n seed quantizes with whatever
    spread those rows happen to have, while one or two Lloyd sweeps
    move the codewords onto the corpus' actual sub-space density
    (measured on the fixtures: probe recall at equal rescore_c jumps
    from ~random-keep to raw-probe parity). Cost: m_subs x iters
    corpus passes at BUILD time only. Control-plane sized output
    (n_codes x dim doubles) — rides table properties like the IVF
    centroids."""
    import math as _math

    # same deterministic seed rows as first_n_centroids (first n by id),
    # collected directly — no intermediate createDataFrame + second
    # collect job for what is already a driver-side list
    rows = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(n_codes)
        .select(id_col, vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebook: no training vectors")
    dim = len(rows[0][1])
    if dim % m_subs:
        raise ValueError(
            f"vector dim {dim} not divisible by m_subs={m_subs}"
        )
    if m_subs > 8 or n_codes > 256:
        raise ValueError(
            "packed codes hold 8 bits x 8 subspaces — m_subs <= 8 and "
            f"n_codes <= 256 (got {m_subs}, {n_codes})"
        )
    # the packed value is sum(code_m * 256^m); its maximum
    # (n_codes-1) * (256^m_subs - 1)/255 must fit a SIGNED bigint —
    # at m_subs=8 any code >= 128 in the top subspace crosses 2^63
    # and the encode job dies with ARITHMETIC_OVERFLOW under ANSI
    # mode (or silently wraps negative without it)
    if (n_codes - 1) * (256**m_subs - 1) // 255 > 2**63 - 1:
        raise ValueError(
            f"packed code overflows bigint: m_subs={m_subs} with "
            f"n_codes={n_codes} exceeds 63 bits — use n_codes <= 128 "
            "at m_subs=8 (or fewer subspaces)"
        )
    sub = dim // m_subs
    out = []
    for m in range(m_subs):
        words = []
        for r in rows:
            v = [float(x) for x in r[1]]
            nrm = _math.sqrt(sum(x * x for x in v))
            u = [x / nrm if nrm else 0.0 for x in v]
            words.append(u[m * sub : (m + 1) * sub])
        out.append(words)
    unit = _unit_expr(vec_col)
    # the normalized frame depends only on the input vectors, never on
    # the evolving codebook — materialize it ONCE, not per sweep
    normed = (
        vectors.select(unit.alias("__u")).localCheckpoint()
        if refine_iters
        else None
    )
    for _ in range(refine_iters):
        # ONE shuffle per sweep: explode every normalized dimension,
        # route it to (subspace, its row's code in that subspace,
        # position), mean per cell — all m_subs updates in one job
        m_col = (F.col("__pos") / sub).cast("int")
        means = (
            normed.select(
                _pq_codes_arr(out, "__u", pre_normalized=True).alias(
                    "__codes"
                ),
                F.posexplode("__u").alias("__pos", "__x"),
            )
            .select(
                m_col.alias("__m"),
                (F.col("__pos") % sub).alias("__p"),
                F.element_at("__codes", m_col + 1).alias("__c"),
                "__x",
            )
            .groupBy("__m", "__c", "__p")
            .agg(F.avg("__x").alias("__mu"))
            .collect()
        )
        new_out = [[list(w) for w in words] for words in out]  # empty codes keep old
        by_cell: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_cell.setdefault((int(r["__m"]), int(r["__c"])), {})[
                int(r["__p"])
            ] = float(r["__mu"])
        for (m, c), dims in by_cell.items():
            new_out[m][c] = [dims[p] for p in range(sub)]
        out = new_out
    return out


def _cb_flat_lit(codebook: list[list[list[float]]]):
    """The whole codebook as ONE flattened literal array —
    element (m, c, p) lives at ``(m * n_codes + c) * sub + p`` — built
    from a single string literal. One py4j round-trip instead of one
    F.lit call per element (512 of them cost ~2s of pure driver
    chatter in the old per-codeword tree), and one ANALYSIS node
    instead of 512 literal children re-traversed by every rule (the
    _json_arr_lit rationale); repr() doubles round-trip exactly
    through the correctly-rounded parser, so values are
    bit-identical."""
    return _json_arr_lit(
        [float(x) for words in codebook for w in words for x in w], "double"
    )


def _pq_dist_table(codebook: list[list[list[float]]], unit_col):
    """array<array<double>> of squared-L2 distances — ``d[m][c]`` =
    dist(m-th sub-slice of the pre-normalized vector, codeword c) —
    as one nested higher-order-function expression over the flattened
    codebook literal. Per (m, c) the arithmetic is the exact fold the
    old per-codeword tree ran (zip_with squared diffs, left fold from
    a 0.0 seed), so results are bit-identical; the expression tree is
    O(1) in m_subs x n_codes instead of O(m x c) subtrees, which is
    what removes the multi-second analysis/codegen cost q176 measured
    (guide §7.3: planning time on giant literal trees)."""
    sub = len(codebook[0][0])
    n_codes = len(codebook[0])
    m_subs = len(codebook)
    cbf = _cb_flat_lit(codebook)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m_subs - 1)),
        lambda m: F.transform(
            F.sequence(F.lit(0), F.lit(n_codes - 1)),
            lambda c: F.aggregate(
                F.zip_with(
                    F.slice(unit_col, m * sub + 1, sub),
                    F.slice(cbf, (m * n_codes + c) * sub + 1, sub),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )


def pq_encode_expr(
    codebook: list[list[list[float]]], vec_col: str,
    pre_normalized: bool = False,
):
    """Column expression: the PACKED PQ code (one BIGINT, 8 bits per
    subspace) of ``vec_col`` under a literal codebook — per subspace,
    argmin squared-L2 over the codewords of the NORMALIZED vector via
    min-struct (ties to the smallest code, q115's rule). Expression
    tree is m_subs x n_codes sub-distances — fine at the
    control-plane codebook sizes this lane uses (the band_signatures
    compile-cost lesson caps how far to push literal trees)."""
    codes = _pq_codes_arr(codebook, vec_col, pre_normalized)
    powers = F.array(
        *[F.lit(256 ** m).cast("bigint") for m in range(len(codebook))]
    )
    return F.aggregate(
        F.zip_with(codes, powers, lambda c, p: c.cast("bigint") * p),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _pq_codes_arr(
    codebook: list[list[list[float]]], vec_col: str,
    pre_normalized: bool = False,
):
    """Array of per-subspace codes (0-based ints) — the unpacked form
    ``pq_encode_expr`` folds into the bigint, shared by the codebook
    refinement sweep.

    ``pre_normalized``: the caller already materialized the
    L2-normalized vector into ``vec_col`` — REQUIRED on hot paths:
    inlining ``_unit_expr`` here copies the 64-term norm aggregate
    into every one of the m_subs x n_codes sub-distances and codegen
    time explodes (measured 400+s builds before the split; seconds
    after)."""
    unit = F.col(vec_col) if pre_normalized else _unit_expr(vec_col)
    # argmin with ties to the smallest code: array_position finds the
    # FIRST element equal to the min (1-based) — q115's min-struct
    # rule without struct-field access, which loses its aliases under
    # some analysis contexts. The transform binds each per-subspace
    # distance row ONCE, so min and position read the same array.
    return F.transform(
        _pq_dist_table(codebook, unit),
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )


def pq_adc_expr(
    codebook: list[list[list[float]]], vec_col: str,
    pre_normalized: bool = False,
):
    """Column expression: the asymmetric-distance LOOKUP TABLE of a
    query vector — ``adc[m][c]`` = squared L2 between the NORMALIZED
    query's m-th sub-slice and codeword c. Computed ONCE per query
    row; a candidate's ADC distance is then a pure table-lookup fold
    (``pq_adc_distance``), never a vector op per candidate. Unit
    vectors make the summed distance rank identically to cosine."""
    unit = F.col(vec_col) if pre_normalized else _unit_expr(vec_col)
    return _pq_dist_table(codebook, unit)


def pq_adc_distance(code_col, adc_col, m_subs: int):
    """Fold a candidate's PACKED code against a query's ADC table:
    sum_m adc[m][(code >> 8m) & 255] — O(m_subs) shift/mask/lookup
    steps, zero arithmetic on vectors (the IVFADC inner loop, Jégou
    et al. 2011, as a codegen expression over the packed bigint)."""
    code = code_col if not isinstance(code_col, str) else F.col(code_col)
    adc = adc_col if not isinstance(adc_col, str) else F.col(adc_col)
    total = F.lit(0.0)
    for m in range(m_subs):
        c_m = F.shiftright(code, 8 * m).bitwiseAND(F.lit(255)).cast("int")
        total = total + F.element_at(adc, m + 1)[c_m]
    return total
