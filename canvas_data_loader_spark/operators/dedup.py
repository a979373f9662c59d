"""Deduplication family for large-scale text corpora.

All variants are pure DataFrame compositions (no Python UDFs), so they
run JVM-side and scale by shuffle on content-derived keys:

- exact:       hash-groupBy on a normalized-text fingerprint
- n-gram Jaccard: shingle -> explode -> self-join on shingle -> ratio
- MinHash+LSH: shingle -> K minhashes -> band -> bucket self-join
- SimHash:     token hash sign-vote -> hamming-bucket join

Scale notes: the explode(shingles) self-join is the classic
near-dup-mining shape (one shuffle on shingle, one aggregation); hot
shingles (stopword n-grams) are the skew risk — mitigated by dropping
shingles with document frequency above ``max_df`` before the join,
which is both a perf and a quality measure (ubiquitous shingles carry
no signal). MinHash-LSH replaces the quadratic candidate space with
band-bucket collisions: cost O(docs * bands).

Hash choice: md5 (not xxhash64) so every step is reproducible in ANSI
SQL oracles across engines; at production scale swap for xxhash64 via
the ``hash_fn`` hook (same topology, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    normalize_text,
    shingles_from_tokens,
    tokens,
    word_shingles,
)


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group exact duplicates by normalized-text fingerprint.

    Returns (fp, n_docs, keep_id): one row per distinct content, the
    kept representative being the smallest id — the deterministic
    analog of the reference's keyed last-writer-wins (importer.rs:345-390)
    applied to content instead of a declared key.
    """
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col).alias("__id"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__id").alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Drop exact duplicates, keeping the smallest-id representative."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def shingle_table(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, max_df: int | None = None
) -> DataFrame:
    """Distinct (id, shingle) pairs; optionally drop shingles appearing
    in more than ``max_df`` docs (skew + signal control)."""
    from .skew import ensure_scan_parallelism

    # single-row-group inputs scan as ONE task; spread the tokenize +
    # shingle-explode map before it runs (no-op on multi-file inputs)
    df = ensure_scan_parallelism(df)
    # Tokenize in its own projection so the shingle lambda slices a
    # materialized array instead of re-running split+regexp per element.
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__t"))
    sh = (
        toks.select("doc", F.explode(shingles_from_tokens(F.col("__t"), n)).alias("s"))
        .distinct()
    )
    if max_df is not None:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.filter(F.col("df") <= max_df).select("s"), on="s", how="left_semi")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_jaccard: float = 0.0,
    max_df: int | None = None,
    hash_shingles: bool = False,
) -> DataFrame:
    """All candidate pairs with their n-gram Jaccard similarity.

    Plan shape: explode shingles -> self-equi-join on shingle (shuffle
    on shingle) -> per-pair intersection count -> join per-doc shingle
    counts (broadcastable) -> |A∩B| / (|A|+|B|-|A∩B|).
    Output: (doc_a, doc_b, common, jaccard) with doc_a < doc_b.

    ``hash_shingles=True`` joins on xxhash64 fingerprints instead of
    raw shingle strings — the standard production choice: the shuffle
    carries 8-byte longs instead of ~n-word strings and key compares
    are integer (measured 3.2s -> 2.5s at sf0.1). Counts become exact
    MODULO 64-bit collisions: for S distinct shingles the chance any
    collision exists is ~S²/2^65 (~3e-8 at 1M shingles) — negligible,
    but the strict default stays collision-free for oracle work.
    """
    # The shingle table feeds three consumers (both self-join sides and
    # the per-doc sizes); without pinning it, the tokenize+explode+
    # distinct subtree re-executes per consumer (plan audit showed 4
    # document scans). localCheckpoint (not persist): one
    # materialization, three reads, and the blocks are RDD-level so the
    # ContextCleaner frees them once the result is unreachable — a
    # CacheManager persist() here would outlive the query and
    # accumulate across calls on a shared session.
    sh = shingle_table(df, text_col, id_col, n, max_df)
    if hash_shingles:
        sh = sh.withColumn("s", F.xxhash64("s"))
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # per-doc sizes are corpus-sized: no broadcast hint (AQE decides
    # at test scale; a forced broadcast is a driver OOM at 100 TB)
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "common", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    md5(i || '|' || shingle). String-min over hex digests is a valid
    uniform min-hash and is engine-portable. Output: (doc, sig:array),
    sig NULL for docs with no shingles (< n tokens) — bit-identical to
    the original nested-HOF formulation and to the q35 oracle.

    Plan shape: the shingle array is EXPLODED to rows and each seed's
    min-hash is one ``min(md5('i|' || shingle))`` aggregate — all
    num_hashes mins in ONE map-side-combined groupBy(doc) pass (one
    exchange of doc-keyed partials). The previous formulation
    (transform over seeds of array_min over transform of shingles)
    ran INTERPRETED — higher-order functions are outside whole-stage
    codegen — and measured 9.6s for the sf0.1 band table where this
    aggregate runs it in ~1s (the q116 lesson again: q116's fix was
    blocked-BLAS mapInPandas because hyperplane dots want a dgemm;
    md5 minima want exactly this row-explode + codegen'd agg, no
    Python). explode_outer keeps empty docs as a NULL-shingle row so
    every input doc still gets an output row (md5 of NULL is NULL,
    min(NULL) is NULL, and the __h1-guard folds all-NULL to sig NULL
    — otherwise empty docs would hash to md5('') and all collide)."""
    # tokens MATERIALIZED in their own projection first (the
    # shingles_from_tokens contract): inlining tokens() re-runs the
    # regex split per array element inside the HOF — measured 3.9s vs
    # 0.7s for this aggregate at sf0.1
    from .skew import ensure_scan_parallelism

    # single-row-group inputs scan as ONE task; spread the tokenize +
    # explode + md5-min map side before it runs (no-op on multi-file
    # inputs)
    df = ensure_scan_parallelism(df)
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__t"))
    sh = toks.select(
        "doc",
        F.explode_outer(
            shingles_from_tokens(F.col("__t"), shingle_n)
        ).alias("__s"),
    )
    # each aggregate as ONE parsed SQL string: the per-piece Column
    # API (min/md5/concat/lit/alias per seed) cost ~100 py4j round
    # trips per tower build, and the tower is rebuilt per consumer
    # query (same driver-chatter discipline as argmax_cell_expr; the
    # parsed trees are identical, so results stay bit-exact)
    agg = sh.groupBy("doc").agg(
        *[
            F.expr(f"min(md5(concat('{i}|', __s))) AS __h{i}")
            for i in range(1, num_hashes + 1)
        ]
    )
    cols = ", ".join(f"__h{i}" for i in range(1, num_hashes + 1))
    return agg.select(
        "doc",
        F.expr(
            f"CASE WHEN __h1 IS NOT NULL THEN array({cols}) END AS sig"
        ),
    )


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: (doc, band, band_hash), one row per band.

    band_hash = md5 of the band's concatenated signature slice; docs
    colliding on (band, band_hash) are near-dup candidates.
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    # one parsed expression (no per-band lambda construction chatter)
    bands = F.expr(
        f"transform(sequence(0, {n_bands - 1}), b -> struct("
        "b AS band,"
        f" md5(concat_ws('', slice(sig, b * {band_size} + 1, {band_size})))"
        " AS band_hash))"
    )
    return (
        sigs.filter(F.col("sig").isNotNull())
        .select("doc", F.explode(bands).alias("bh"))
        .select("doc", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct candidate near-dup pairs from LSH bucket collisions.

    Shuffle is on (band, band_hash) — O(docs·bands) rows, never the
    quadratic pair space. Output: (doc_a, doc_b)."""
    # the minhash tower (shingle explode + K hashes + band agg) feeds
    # BOTH self-join sides — materialize it once (b96566e discipline;
    # eager because the self-join's two scans race within one job)
    bands = minhash_bands(
        df, text_col, id_col, num_hashes, band_size, shingle_n
    ).localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def incremental_neardup_candidates(
    index_bands: DataFrame, new_bands: DataFrame
) -> DataFrame:
    """Dedup a NEW dump against a PERSISTED banded-signature index at
    O(batch): candidates = new-vs-index bucket collisions plus
    new-vs-new collisions, as distinct ordered pairs (doc_a < doc_b).
    The old corpus is never re-shingled or re-hashed — only its
    (doc, band, band_hash) rows participate, and only through an
    equi-join on (band, band_hash).

    This is the reference's dump model (A24/A25: process each new
    dump once, idempotently) applied to the LLM dedup pillar: the
    signature table is maintained by APPENDING the new dump's bands
    after the probe (a pure union — MinHash bands are per-doc facts,
    so index maintenance is the same O(batch) as the probe). At
    100 TB, persist the index bucketed by band_hash (warehouse
    ``bucket=("band_hash", N)``): the probe then co-locates without
    shuffling the index side, and the index update is a changed-bucket
    merge. Maintained == rebuilt is pinned by
    tests/test_operators.py::TestIncrementalNeardupIndex and the q167
    oracle (full-corpus recompute restricted to new-dump pairs)."""
    probe = (
        new_bands.alias("n")
        .join(index_bands.alias("x"), on=["band", "band_hash"])
        .select(
            F.least(F.col("n.doc"), F.col("x.doc")).alias("doc_a"),
            F.greatest(F.col("n.doc"), F.col("x.doc")).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    nn = (
        new_bands.alias("a")
        .join(new_bands.alias("b"), on=["band", "band_hash"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
    )
    return probe.unionByName(nn).distinct()


def rescore_candidates(
    docs: DataFrame,
    cand_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sizes: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard re-score of near-dup CANDIDATE pairs,
    candidate-bounded: ``docs`` is semi-joined to the distinct
    candidate doc ids BEFORE tokenization, so the shingle explode —
    the expensive step — costs O(candidate docs), never the corpus.
    This is the second half of the incremental dedup lane
    (incremental_neardup_candidates / probe_neardup_index generate
    the pairs; this scores them), packaged so per-dump dedup cost
    tracks the dump END TO END (VERDICT r10 What's-wrong #1).

    Input: ``cand_pairs`` with (doc_a, doc_b); ``docs`` with
    (id_col, text_col). Output: (doc_a, doc_b, common BIGINT,
    jaccard_r DOUBLE rounded 6dp). Pairs whose docs have < n tokens
    (empty shingle set) drop, as in every exact-Jaccard lane here.

    ``sizes`` optionally supplies persisted per-doc distinct-shingle
    counts (id_col, n_sh) — an index sidecar maintained like the band
    table — so only the INTERSECTION is computed from text; when
    None, sizes are derived from the candidate-bounded shingles (same
    values: a doc's shingle count is a per-doc fact).

    Scale shape: the id semi-join broadcasts the candidate id set
    (bounded by 2x|pairs|) against the docs scan — with the docs
    table bucketed by id the scan itself prunes to candidate buckets
    (the cdl_warehouse source pushes key-IN filters); the intersection
    join shuffles only candidate shingles. ``checkpoint=False`` keeps
    full lineage (used by the plan pin that proves the explode sits
    ABOVE the semi-join)."""
    cand = cand_pairs.select("doc_a", "doc_b")
    if checkpoint:
        # consumed twice (id derivation + the intersection join) and
        # typically the output of a probe join worth not re-running
        cand = cand.localCheckpoint(eager=False)
    ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = (
        docs.join(ids, id_col, "left_semi")  # BEFORE tokenize/shingle
        .select(F.col(id_col).alias("doc"), tokens(text_col).alias("__t"))
        .select(
            "doc",
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("__t"), n))
            ).alias("s"),
        )
    )
    if checkpoint:
        sh = sh.localCheckpoint(eager=False)  # consumed three times
    if sizes is None:
        sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        sizes = sizes.select(F.col(id_col).alias("doc"), "n_sh")
    common = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc"))
            & (F.col("sa.s") == F.col("sb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    return (
        common.join(
            sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "common",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ).alias("jaccard_r"),
        )
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """SimHash per doc over unigram tokens, as a pure expression.

    For each bit b: sum over distinct tokens of (+1 if bit b of
    md5(token) set else -1); bit set in the result iff the vote is
    positive. 16 bits keeps the expression tree small; production
    scale would use 64 via xxhash64.
    Output: (doc, simhash BIGINT).
    """
    toks = F.array_distinct(F.split(normalize_text(text_col), " "))
    # bit b of md5: use hex digit parity — conv(substr(md5,k,1),16,10) & 1.
    # The md5 is projected ONCE per token row (__h): leaving F.md5
    # inline in each of the 16 vote expressions re-hashes every token
    # 16x (Catalyst does not CSE across aggregate expressions).
    def bit_vote(b: int) -> Column:
        digit = F.conv(F.substring(F.col("__h"), b + 1, 1), 16, 10).cast("int")
        return F.when(digit % 2 == 1, 1).otherwise(-1)

    exploded = df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("__t"))
    hashed = exploded.select("doc", F.md5(F.col("__t")).alias("__h"))
    votes = hashed.groupBy("doc").agg(
        *[F.sum(bit_vote(b)).alias(f"v{b}") for b in range(bits)]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc", sim.cast("long").alias("simhash"))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Input: an edge list (undirected; each pair may appear in either or
    both orientations). Output: (node, component) where component is
    the smallest node id reachable from ``node``.

    Algorithm: label(v) starts as v; each round
    label(v) <- min(label(v), min over neighbors u of label(u)); stop
    when no label changes. Round count is bounded by the graph
    diameter; near-dup graphs are unions of small cliques/chains, so
    a handful of rounds suffice. Each round is one shuffle on the edge
    key plus one on node — the DataFrame translation of the
    large-star/small-star CC algorithm (Kiveris et al.), which is the
    production upgrade path if diameters get large.

    ``localCheckpoint`` truncates the lineage each round so the plan
    does not grow unboundedly (iterative-algorithm hygiene on Spark).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("__nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the at-scale upgrade over min-label propagation.

    Min-label propagation needs O(diameter) rounds: a 1M-node chain is
    1M shuffles. The star operations contract the graph toward each
    component's minimum in O(log²) rounds regardless of diameter, with
    the same per-round cost (one groupBy-min + one join):

      large-star(u): m = min(Γ(u) ∪ {u}); connect every neighbor
                     v > u directly to m.
      small-star(u): over Γ≤(u) = {v ∈ Γ(u): v < u}:
                     m = min(Γ≤(u) ∪ {u}); connect u and each
                     v ∈ Γ≤(u) to m.

    At the fixed point the edge set is a union of stars centered at
    component minima, so component(v) = min(v, min neighbor).
    Output: (node, component) — identical to ``connected_components``
    (property-tested against union-find on random graphs).
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    nodes = (
        e.select(F.col("x").alias("node"))
        .union(e.select(F.col("y").alias("node")))
        .distinct()
    )

    def canon(df: DataFrame) -> DataFrame:
        """Undirected canonical (a < b) edge set, self-loops dropped."""
        return (
            df.select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def sym(df: DataFrame) -> DataFrame:
        return df.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            df.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    cur = canon(e).localCheckpoint(eager=True)
    cur_count = cur.count()
    for _ in range(max_iter):
        adj = sym(cur)
        # large-star: every strictly-greater neighbor re-attaches to the
        # neighborhood minimum
        mins = adj.groupBy("u").agg(F.min("v").alias("__mn")).select(
            "u", F.least(F.col("u"), F.col("__mn")).alias("m")
        )
        ls = canon(
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        # small-star: the not-greater neighborhood (plus u itself)
        # collapses onto its minimum
        adj2 = sym(ls)
        le = adj2.filter(F.col("v") < F.col("u"))
        mins2 = le.groupBy("u").agg(F.min("v").alias("m"))
        ss = canon(
            le.join(mins2, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .union(mins2.select(F.col("u").alias("x"), F.col("m").alias("y")))
        ).localCheckpoint(eager=True)
        # convergence check: one count job per round (the previous
        # round's count is carried forward), the exceptAll probe only
        # when the counts already match
        ss_count = ss.count()
        same = (
            ss_count == cur_count
            and cur.exceptAll(ss).limit(1).count() == 0
        )
        cur, cur_count = ss, ss_count
        if same:
            break
    # fixed point = stars centered at minima: label(v) = min(v, min nbr)
    nbr_min = (
        sym(cur).groupBy(F.col("u").alias("node")).agg(F.min("v").alias("__mn"))
    )
    return nodes.join(nbr_min, "node", "left").select(
        "node",
        F.least(F.col("node"), F.coalesce(F.col("__mn"), F.col("node"))).alias(
            "component"
        ),
    )


def setsim_prefix_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """EXACT Jaccard similarity join with lossless prefix filtering
    (the PPJoin/AllPairs candidate-pruning scheme, Xiao et al. WWW'08 /
    Bayardo et al. WWW'07) over n-gram shingle sets.

    Returns every pair with J(A, B) >= t (t = t_num/t_den, held as a
    RATIONAL so the threshold comparison and the prefix length are
    exact integer arithmetic — no float ceil() whose rounding could
    make the prefix one element too short and silently drop pairs).

    Why this instead of the plain shingle self-join
    (``ngram_jaccard_pairs``): that join explodes EVERY shared shingle
    into the shuffle. Prefix filtering orders each doc's shingles
    rarest-globally-first and joins only on each doc's first
    |d| - ceil(t*|d|) + 1 shingles. Losslessness: J >= t implies
    |A∩B| >= t*|A| (since the union is at least |A|), so the
    intersection cannot fit entirely inside the ceil(t*|A|) - 1
    suffix — some shared shingle must sit in A's prefix. Rarest-first
    ordering puts the highest-df (boilerplate) shingles at the END of
    every doc, so the join keys that survive are the low-df ones:
    candidate buckets stay small by construction rather than by a
    lossy ``max_df`` cap. At 100 TB this is the exact-result
    alternative to MinHash-LSH: one global df aggregate (map-side
    combinable), one doc-partitioned rank window, a self-join whose
    key distribution is explicitly skew-inverted, and a
    candidate-bounded verify join.

    Output: (doc_a, doc_b, inter, un, jacc_r) with doc_a < doc_b,
    jacc_r rounded to 6dp.
    """
    sh = shingle_table(df, text_col, id_col, n).localCheckpoint(eager=False)
    # df and sz as WINDOW counts over the checkpointed shingle table:
    # the old groupBy(s)+join / groupBy(doc)+join pair built each
    # aggregate as its own subtree and the planner re-derived the
    # whole (sh ⋈ dfreq ⋈ sizes → window) tower once per consumer —
    # the before-plan carried TWO copies of the ranking tower and
    # THREE of the sizes aggregate (plans/r13/q138_*_before.txt). Two
    # window passes need one exchange each (the rk window reuses the
    # doc partitioning the sz window establishes), and the counts are
    # definitionally the same numbers the groupBys produced.
    ranked = (
        sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(
                    F.col("df").asc(), F.col("s").asc()
                )
            ),
        )
    )
    # prefix length |d| - ceil(t*|d|) + 1 via exact integer ceil:
    # ceil(t_num*sz/t_den) = (t_num*sz + t_den - 1) div t_den, computed
    # with SQL `div` (true integral division on bigints) — NOT `/` +
    # cast, whose double intermediate is only exact below 2^53 and
    # would quietly break the lossless-pruning proof past it.
    # Checkpointed EAGERLY: the self-join's two scans race within one
    # job, and a lazy checkpoint would let each stage recompute the
    # partitions it reaches first (the b96566e discipline).
    prefix = (
        ranked.filter(
            F.col("rk")
            <= F.col("sz")
            - F.expr(f"(CAST({t_num} AS BIGINT) * sz + {t_den - 1}) div {t_den}")
            + F.lit(1)
        )
        .select("doc", "s", "sz")
        .localCheckpoint(eager=True)
    )
    # every doc's prefix is non-empty (len >= 1 for t <= 1), so sz
    # rides the candidate pair from here — the two per-side size joins
    # the old plan ran against a third sizes aggregate are gone; the
    # distinct key gains only columns functionally dependent on the
    # doc ids, so the candidate set is unchanged.
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), on="s")
        .filter(F.col("pa.doc") < F.col("pb.doc"))
        .select(
            F.col("pa.doc").alias("doc_a"),
            F.col("pb.doc").alias("doc_b"),
            F.col("pa.sz").alias("n_a"),
            F.col("pb.sz").alias("n_b"),
        )
        .distinct()
    )
    # candidate-bounded exact verify: explode candidates by A's
    # shingles, count matches in B — |cands| * |A| rows, never the
    # full shingle-pair space
    inter = (
        cand.join(sh.select(F.col("doc").alias("doc_a"), "s"), "doc_a")
        .join(
            sh.select(F.col("doc").alias("doc_b"), "s"),
            ["doc_b", "s"],
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn("un", (F.col("n_a") + F.col("n_b") - F.col("inter")))
        # exact rational threshold: inter/un >= t_num/t_den
        .filter(F.col("inter") * F.lit(t_den) >= F.col("un") * F.lit(t_num))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("bigint").alias("inter"),
            F.col("un").cast("bigint").alias("un"),
            F.round(F.col("inter") / F.col("un"), 6).alias("jacc_r"),
        )
    )


def exactsubstr_grams(toks: DataFrame, n: int = 8) -> DataFrame:
    """ExactSubstr gram table (Lee et al. 2022 machinery, shared by
    q141/q145/q148 — one definition so the three consumers cannot
    drift): from (doc_id, t token-array) rows, every n-gram as
    (doc_id, i, g) with 1-based position i and md5-hashed gram g (the
    shuffle carries 32-byte keys, never n-word strings). Callers
    typically localCheckpoint the result — it feeds both the
    duplicate-gram aggregate and the position join.

    Deliberately NOT spread via ensure_scan_parallelism: ``toks``
    carries the full token ARRAY, so a round-robin exchange here
    ships the widest rows in the pipeline (guide §2.3 — shuffle fewer
    bytes). Measured on the r13 driver bench: the repartition was a
    1.56x/1.67x LOSS on q164/q171 (two invocations per query, arrays
    shuffled both times) against a ~2x win on narrow-row lanes.
    Callers that want the explode spread repartition their NARROW
    text rows upstream, before the token projection."""
    return (
        toks.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.posexplode(shingles_from_tokens(F.col("t"), n)).alias("i0", "s"),
        )
        .select("doc_id", (F.col("i0") + 1).alias("i"), F.md5("s").alias("g"))
    )


def cross_doc_dup_grams(grams: DataFrame) -> DataFrame:
    """Grams occurring in more than one distinct document — the
    duplication definition all ExactSubstr consumers share. Gram-keyed
    aggregate with map-side combine."""
    return (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("g")
    )


def exactsubstr_covered_positions(
    grams: DataFrame, dupg: DataFrame, n: int = 8
) -> DataFrame:
    """Distinct (doc_id, j) token positions covered by any
    cross-document duplicated n-gram. Positions explode only from
    DUPLICATED gram positions — span-bounded, not corpus-bounded."""
    return (
        grams.join(dupg, "g")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (n - 1))).alias("j"),
        )
        .distinct()
    )


def bloom_bits(
    df: DataFrame,
    text_col: str,
    k: int = 3,
    hex_chars: int = 3,
    salt: str = "bff",
) -> DataFrame:
    """Deterministic Bloom-filter bit set over document CONTENT
    fingerprints — the Dolma/BFF-shaped membership pre-pass for exact
    dedup where the exact fingerprint table is too big to join every
    dump against: the filter is O(k·16^hex_chars) SET BITS no matter
    the corpus size. Output: distinct (row_id, b) — ``k`` salted hash
    rows, each bit id the first ``hex_chars`` hex chars of the salted
    md5 of the content fingerprint (functions.text.fingerprint, the
    q30 truth key). Bit ids stay HEX STRINGS end-to-end (engines
    disagree on hex->int parsing — the q119/q142 cross-engine rule),
    and the whole construction is md5-deterministic, which is what
    makes an approximate structure oracle-checkable.

    MERGEABLE by construction: bloom_bits(A ∪ B) == bloom_bits(A) ∪
    bloom_bits(B) as sets — so per-snapshot sidecars union into the
    corpus filter without rescanning (pinned in TestBloomPrepass).

    Scale shape: one projection + a distinct whose key space is
    bounded by k·16^hex_chars (4096 per row at the default) — map-side
    combine ships at most the FILTER per executor, the mergeable-
    sketch property (q62/q142's class)."""
    return _bloom_doc_bits(df, text_col, k, hex_chars, salt).distinct()


def _bloom_doc_bits(
    df: DataFrame,
    text_col: str,
    k: int = 3,
    hex_chars: int = 3,
    salt: str = "bff",
) -> DataFrame:
    """Per-document Bloom bit rows (row_id, b) — ``bloom_bits`` BEFORE
    its corpus-wide distinct: every source row contributes exactly one
    row per hash index (its k (row_id, bit) pairs are unique within
    the doc by construction — row_id differs), so counting these rows
    per (row_id, b) yields the COUNTING-filter cell values
    ``bloom_bit_counts`` maintains.

    NULL fingerprints (NULL text) contribute NO bits: a NULL bit id
    can never satisfy the all-k probe join anyway (SQL equality), and
    in the COUNTING index a NULL cell key would be unmaintainable —
    delete_keys equality joins never match NULL, so a retired
    NULL-text doc's cell could never be retracted."""
    fp = fingerprint(text_col)
    rows = F.array(*[F.lit(i) for i in range(k)])
    return df.filter(fp.isNotNull()).select(
        F.explode(rows).alias("row_id"), fp.alias("__fp")
    ).select(
        "row_id",
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt),
                    F.col("row_id"),
                    F.lit(":"),
                    F.col("__fp"),
                )
            ),
            1,
            hex_chars,
        ).alias("b"),
    )


def bloom_bit_counts(
    df: DataFrame,
    text_col: str,
    k: int = 3,
    hex_chars: int = 3,
    salt: str = "bff",
) -> DataFrame:
    """COUNTING Bloom filter cells over document content fingerprints:
    (row_id, b, cnt) where cnt = how many source rows hash a bit into
    that cell. The counting form is what makes the filter a
    MAINTAINABLE index (plans/ops.py register_bloom_index): a plain
    bit set cannot honor deletes (unsetting a bit a surviving doc
    still needs breaks the no-false-negative contract), while counts
    support the full insert/update/delete motion — a delete
    decrements, and the bit stays set while cnt > 0. ``cnt > 0`` rows
    project to exactly ``bloom_bits`` (pinned in tests), so every
    probe consumer is unchanged.

    Scale shape: same bounded key space as bloom_bits (≤ k·16^hex_chars
    cells regardless of corpus size); the count agg map-side combines,
    so at most the filter ships per executor."""
    return (
        _bloom_doc_bits(df, text_col, k, hex_chars, salt)
        .groupBy("row_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bloom_maybe_member(
    df: DataFrame,
    bits: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    hex_chars: int = 3,
    salt: str = "bff",
) -> DataFrame:
    """Probe documents against a ``bloom_bits`` filter: (id, maybe_dup)
    where maybe_dup = 1 iff ALL k salted bits of the doc's content
    fingerprint are set. Guarantees the Bloom contract: a true
    duplicate is NEVER missed (its bits were set by the original);
    a hit is only 'maybe' (false-positive rate ~ (set_fraction)^k,
    bounded in pytest). The filter side is fixed-size, so each probe
    join is a broadcast hash join at any corpus scale."""
    fp = fingerprint(text_col)
    probe = df.select(F.col(id_col), fp.alias("__fp"))
    # dedup the filter ONCE: the documented sidecar-union usage passes
    # bits(A) ∪ bits(B) WITHOUT dedup — a bit set in both snapshots
    # would otherwise match twice per join and multiply the probe's
    # rows (up to 2^k duplicates per doc). One distinct over the
    # ≤ k·16^hex_chars filter rows, not one per hash row.
    bits = bits.select("row_id", "b").distinct().localCheckpoint(eager=False)
    for i in range(k):
        bit = F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(i), F.lit(":"), F.col("__fp"))),
            1,
            hex_chars,
        )
        side = (
            bits.filter(F.col("row_id") == i)
            .select(F.col("b").alias(f"__b{i}"))
        )
        probe = probe.withColumn(f"__bit{i}", bit).join(
            F.broadcast(side.withColumn(f"__hit{i}", F.lit(1))),
            F.col(f"__bit{i}") == F.col(f"__b{i}"),
            "left",
        ).drop(f"__b{i}")
    hit = None
    for i in range(k):
        h = F.col(f"__hit{i}").isNotNull()
        hit = h if hit is None else (hit & h)
    return probe.select(
        id_col, hit.cast("int").alias("maybe_dup")
    )


def cut_covered(j: DataFrame, include_text: bool = False) -> DataFrame:
    """Positional span-cut rewrite shared by q145/q164/q170/q171 and
    the CLI decontamination verb: from rows (doc_id, t token-array,
    cov covered-1-based-positions array), drop every covered token and
    emit (doc_id, n_tokens, n_removed, clean_md5[, clean_text]).

    The rewrite is O(|t| + |cov|) per row: kept POSITIONS come from
    ``array_except(sequence(1, n), cov)`` — Spark's ArrayExcept builds
    a hash set over the right operand and streams the left in order —
    then each kept token is an O(1) array index. An array_contains
    scan per position (or a map_from_entries probe — Spark maps have
    no hash index, GetMapValue is a linear scan) makes a
    fully-contaminated long doc pay |t|·|cov| in one task: the
    round-9 quadratic cliff, pinned by the 200k-token tripwire test
    (284s -> <5s).

    n_removed is size(t) - size(kept), NOT size(cov): for a NULL text
    both sides of the subtraction are NULL, matching the oracles'
    LEN(t) - n_kept (size(cov) would emit 0 and hash-mismatch).
    sequence(1, 0) is DESCENDING [1, 0], so empty/NULL text routes to
    the empty-array branch (md5('') like the oracles)."""
    pos = F.when(
        F.size("t") > 0,
        F.sequence(F.lit(1).cast("bigint"), F.size("t").cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    kept_pos = F.array_except(pos, F.col("cov"))
    kept_arr = F.transform(
        kept_pos, lambda p: F.element_at(F.col("t"), p.cast("int"))
    )
    cols = [
        F.col("doc_id"),
        F.size("t").cast("bigint").alias("n_tokens"),
        (F.size("t") - F.size(kept_arr)).cast("bigint").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept_arr)).alias("clean_md5"),
    ]
    if include_text:
        cols.append(F.concat_ws(" ", kept_arr).alias("clean_text"))
    return j.select(*cols)
