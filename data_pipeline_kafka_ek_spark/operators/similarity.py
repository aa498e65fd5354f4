"""Similarity search over embedding columns (``array<float>``).

Five top-k tiers, trading exactness for scale, plus the pair (near-dup)
variants ``cosine_pairs`` / ``cosine_pairs_lsh``:

* ``cosine_topk``        — exact brute force, pure DataFrame ops (zip_with
                           dot product in whole-stage codegen). The oracle
                           baseline and correct for any data.
* ``cosine_topk_blocked``— exact, Arrow/numpy matmul via ``mapInPandas``
                           with the query matrix broadcast: the fast exact
                           path when queries are few and the corpus is huge
                           (each executor scans its partitions once).
* ``lsh_bucket_topk``    — approximate: sign-random-projection buckets
                           prune the corpus before exact re-ranking
                           (candidates per query ~ corpus / 2^bits).
* ``ivf_topk``           — approximate: inverted-file cells + n_probe
                           probing + exact re-rank; cells are the natural
                           on-disk bucketing key for pruned scans.
* ``pq_topk``            — approximate: product-quantization codes (m
                           bytes per vector) + ADC lookup scan + exact
                           re-rank; the memory-bound tier — the code
                           table is 64x smaller than the vectors.

Every tier is deterministic (seeded planes / fixed pivots), so each has a
DuckDB oracle replaying the identical structure.

All cosine math is in float64 over the original element order so results
are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.caching import track

from data_pipeline_kafka_ek_spark.operators.parallelism import spread, spread_if_narrow


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def _cosine(a, b):
    """Cosine similarity with the ANSI divide-by-zero guard: a zero-norm
    vector has no direction, so its similarity to anything is defined as
    0.0 (it can never pass a positive threshold or win a top-k rank)
    instead of raising DIVIDE_BY_ZERO under ANSI mode. Embedding fixtures
    contain no zero vectors, so the oracle twins (plain division) agree
    on every checked row; real corpora DO contain zero vectors (empty
    documents, dead encoder outputs), which is why the engine side
    guards. Implemented with ``try_divide`` (NULL on zero, coalesced to
    0.0) rather than a ``when`` branch so the two norm aggregates are
    evaluated exactly once per row — a conditional would re-evaluate the
    higher-order-function denominator in both the predicate and the
    branch (measured ~8%% slower on the LSH verify stage)."""
    return F.coalesce(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(0.0)
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine_sim") -> DataFrame:
    av = F.transform(F.col(a), lambda x: x.cast("double"))
    bv = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _cosine(av, bv))


def _guard_broadcast_side(queries: DataFrame, max_query_rows: "int | None",
                          op: str, alternative: str) -> None:
    """The exact similarity paths broadcast the query side; a large query
    set OOMs executors instead of failing fast. Refuse at plan-build time
    with a bounded ``limit(n+1).count()`` probe (the guard never scans the
    full table) — the same contract as ``cosine_pairs``.

    NOTE the probe is EAGER: it runs a (bounded) Spark job when the plan
    is BUILT, not when it executes — callers composing plans lazily pay
    that job up front; pass ``max_query_rows=None`` to skip it and keep
    the build side-effect-free. A STREAMING query side is REFUSED
    outright (``count()`` is unsupported there, and an unbounded stream
    can never satisfy a row-count budget by definition): the curated
    error below names the bucketed twin instead of letting the
    broadcast-cross-join plan fail downstream with an opaque
    unsupported-operation error — route streaming query sides through
    the bucketed paths, which never broadcast."""
    if max_query_rows is None:
        return
    if queries.isStreaming:
        raise ValueError(
            f"{op} broadcasts the query side and a STREAMING query side "
            f"is unbounded by definition — use {alternative} (the "
            f"bucketed scale path, a plain equi-join that streams)"
        )
    if queries.limit(max_query_rows + 1).count() > max_query_rows:
        raise ValueError(
            f"{op} broadcasts the query side and refuses query sets over "
            f"{max_query_rows} rows — use {alternative} (the bucketed "
            f"scale path) or pass max_query_rows=None to override"
        )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: "int | None" = 100_000,
) -> DataFrame:
    """Exact top-k neighbors per query vector, brute force.

    The query side is broadcast (queries are few); the corpus is scanned
    once per partition with the dot product fused into codegen. Ranking is
    a per-query window — state is k rows per query. Query sets past
    ``max_query_rows`` are refused at plan-build time — route them through
    ``lsh_bucket_topk`` / ``ivf_topk`` instead (NOT
    ``cosine_topk_blocked``: it ships the query matrix in the task
    closure, the same broadcast-side failure mode at a large query set).
    """
    _guard_broadcast_side(
        queries, max_query_rows, "cosine_topk",
        "lsh_bucket_topk / ivf_topk",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # single-file corpora serialize the narrow broadcast-cross-join stage —
    # spread them; cluster-scale scans pass through (see parallelism.py)
    c = spread_if_narrow(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(
                F.transform("__qv", lambda x: x.cast("double")),
                F.transform("__cv", lambda x: x.cast("double")),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via per-partition numpy matmul (Arrow batches).

    ``query_rows`` is a small driver-side list (id, vector) — broadcast in
    the closure as a dense matrix. Each Arrow batch computes
    ``corpus_block @ Q.T`` and emits only its local top-k per query, so the
    shuffle into the final global top-k carries k rows per (partition,
    query) instead of the whole corpus.
    """
    import numpy as np

    qids = [int(i) for i, _ in query_rows]
    qmat = np.asarray([v for _, v in query_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    out_schema = "query_id long, neighbor_id long, cosine_sim double"

    def block_topk(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # zero-norm guard mirroring _cosine: sim is 0, never nan/inf
            denom = np.linalg.norm(mat, axis=1)[:, None] * qnorm[None, :]
            sims = (mat @ qmat.T) / np.where(denom > 0, denom, np.inf)
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                mask = ids != qid
                cids, csims = ids[mask], col[mask]
                if len(cids) > k:
                    part = np.argpartition(-csims, k)[:k]
                    cids, csims = cids[part], csims[part]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids, "cosine_sim": csims}
                )

    local = corpus.select(id_col, vec_col).mapInPandas(block_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def srp_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic sign-random-projection hyperplanes (seeded numpy),
    shared by the Spark operators and the generated DuckDB oracle SQL so
    both engines bucket identically."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.randn(n_planes, dim)]


def _bucket_expr(vec_col_expr, planes_rows: list[list[float]]):
    """'0101...' sign-bit string of a vector against literal hyperplanes —
    pure built-in expressions, fused into codegen (no UDF)."""
    planes_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes_rows])
    v = F.transform(vec_col_expr, lambda x: x.cast("double"))
    bits = F.transform(
        planes_lit,
        lambda plane: F.when(_dot(plane, v) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold.

    Brute-force O(n^2) formulation — the oracle-gate baseline, NOT the
    scale path (``cosine_pairs_lsh`` is). Because a quadratic cross join
    silently submitted against a production corpus is an outage, the
    operator refuses corpora larger than ``max_rows`` at plan-build time
    (a bounded ``limit(max_rows+1).count()`` probe, so the guard itself
    never scans the full table); pass ``max_rows=None`` to bypass
    deliberately.
    """
    if max_rows is not None and vectors.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"cosine_pairs is the O(n^2) brute-force baseline and refuses "
            f"corpora over {max_rows} rows — use cosine_pairs_lsh (the "
            f"bucketed scale path) or pass max_rows=None to override"
        )
    a = spread_if_narrow(
        vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va"))
    )
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb"))
    av = F.transform("__va", lambda x: x.cast("double"))
    bv = F.transform("__vb", lambda x: x.cast("double"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_sim", _cosine(av, bv))
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def cosine_pairs_lsh(
    vectors: DataFrame,
    threshold: float,
    n_bands: int = 4,
    planes_per_band: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Embedding near-dup at scale: banded sign-random-projection LSH.

    Each vector gets ``n_bands`` bucket keys (one per band of
    ``planes_per_band`` hyperplanes); candidate pairs agree on at least one
    band's bucket (equi-join on (band_idx, band_val) — never a cross join);
    candidates are verified with exact float64 cosine >= threshold. The
    candidate join's fan-out is sum of squared bucket sizes with ~2^planes
    buckets per band, vs n^2 for ``cosine_pairs`` — this is the 100 TB
    path, trading recall (more bands => higher recall, more candidates)
    for never materializing the full pair matrix. Precision is exact (the
    verify step); recall vs brute force is asserted in tests. Deterministic
    planes => deterministic output, so the generated DuckDB oracle
    reproduces it exactly.
    """
    all_planes = srp_planes(n_bands * planes_per_band, dim, seed)
    band_vals = [
        _bucket_expr(
            F.col(vec_col),
            all_planes[i * planes_per_band : (i + 1) * planes_per_band],
        ).alias(f"bv{i}")
        for i in range(n_bands)
    ]
    # candidates stay SLIM (id pairs only): the band self-join never
    # carries the vectors — payloads re-join after candidate generation.
    # At scale this is the difference between shuffling id pairs (~16 B)
    # and shuffling two embeddings (~0.5 KB) per candidate. Every band's
    # bucket string rides along so the join can emit each pair from its
    # FIRST agreeing band only (guide §2.4 — the dropDuplicates exchange
    # + aggregate that used to collapse multi-band agreements carried
    # every duplicate candidate row; the first-band rule is a map-side
    # filter inside the join with the identical pair set).
    # materialize the per-vector band buckets ONCE before the self-join
    # (guide §2.4; same duplicated-subtree fix as minhash_lsh_pairs /
    # simhash_pairs): without it the optimizer plans the SRP signature
    # projection — n_bands·planes_per_band dot products over every
    # embedding — once PER JOIN SIDE. persist, not localCheckpoint, so
    # the InMemoryRelation keeps the child's size estimates and the
    # band self-join's broadcast choice is unchanged (see jaccard_pairs).
    # Rows are slim: id + n_bands bucket strings per vector, exploded
    # only afterwards.
    sig = track(
        vectors.select(F.col(id_col).alias("vid"), *band_vals).persist(),
        caches,
    )
    banded = sig.select(
        "vid",
        *[f"bv{j}" for j in range(n_bands)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"bv{i}").alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(
        "vid", *[f"bv{j}" for j in range(n_bands)],
        "b.band_idx", "b.band_val",
    )
    a, b = banded.alias("a"), banded.alias("b")
    first_band = F.lit(True)
    for i in range(1, n_bands):
        earlier_differ = F.lit(True)
        for j in range(i):
            earlier_differ = earlier_differ & (
                F.col(f"a.bv{j}") != F.col(f"b.bv{j}")
            )
        first_band = F.when(
            F.col("a.band_idx") == i, earlier_differ
        ).otherwise(first_band)
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vid") < F.col("b.vid"))
            & first_band,
        )
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
    )
    va = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va"))
    vb = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb"))
    av = F.transform("__va", lambda x: x.cast("double"))
    bv = F.transform("__vb", lambda x: x.cast("double"))
    # pin the CPU-bound cosine-verify stage (see parallelism.py)
    return (
        spread(cand, "vec_a")
        .join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine_sim", _cosine(av, bv))
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-random-projection (SimHash-for-vectors)
    buckets, exact cosine re-rank within the query's bucket.

    Deterministic planes from a seeded RNG (``srp_planes``) — so although
    the result is approximate relative to exact top-k, it is reproducible,
    and the generated DuckDB oracle (same plane literals) checks it
    exactly; recall vs ``cosine_topk`` is additionally tested in tests.
    """
    planes_rows = srp_planes(n_planes, dim, seed)

    def bucket_of(vec_col_expr):
        return _bucket_expr(vec_col_expr, planes_rows)

    c = spread_if_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            bucket_of(F.col(vec_col)).alias("bucket"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        bucket_of(F.col(vec_col)).alias("bucket"),
    )
    av = F.transform("__qv", lambda x: x.cast("double"))
    bv = F.transform("__cv", lambda x: x.cast("double"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _cosine(av, bv))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: inverted-file cells + probe + re-rank.

    Coarse quantizer: the ``n_cells`` lowest-id corpus vectors serve as
    fixed pivots — selected by ordering on the id (works for any id
    space, sparse or offset), deterministic, so the DuckDB oracle
    reproduces the identical cell structure with a plain self-join; in
    production you swap in trained centroids (KMeans) and every other part
    of the plumbing is unchanged. Each corpus vector is assigned to its
    max-cosine pivot; a query probes its ``n_probe`` nearest cells; exact
    float64 re-rank within the probed cells.

    Scale shape: assignment is one broadcast join against n_cells pivots +
    a per-vector argmax (window over n_cells rows); the probe join is an
    equi-join on cell id, so candidates per query ~ corpus * n_probe /
    n_cells. Cells are the unit you'd co-partition/bucket the corpus by on
    disk, which turns the probe into a pruned scan.
    """
    piv = (
        corpus.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("__pv"))
        .orderBy("pid")
        .limit(n_cells)
    )
    return _ivf_core(corpus, queries, piv, k, n_probe, id_col, vec_col)


def ivf_centroids_lloyd(
    corpus: DataFrame,
    n_cells: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    max_cells: int = 1024,
    oversample: int = 5,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: DETERMINISTIC spherical k-means —
    oversampled-pool maximin (farthest-first) seeding from the lowest-id
    vector, then ``n_iter`` fixed Lloyd iterations over the
    L2-normalized corpus, with centroids rounded to ``round_dp``
    decimals after every step.

    Determinism is the point: the same algorithm is replayable as plain
    SQL (unrolled CTEs — see plans/extensions.py::_lloyd_centroids_cte),
    so the trained tier gets a full cross-engine value-hash oracle like
    every other tier. The per-step rounding pins both engines to identical
    centroid values (raw float64 means differ in the last ulps because
    partial-aggregation order differs). pyspark.ml KMeans is the drop-in
    replacement when cross-engine determinism is not required; every other
    part of the IVF plumbing is unchanged either way.

    Scale shape: seeding is O(1) JOBS regardless of ``n_cells`` (the
    k-means||-style shape, Bahmani et al., VLDB 2012): ONE distributed
    job collects a deterministic oversampled candidate pool — the
    ``oversample * n_cells`` vectors with the lowest ``md5(vec_id)``, a
    seeded pseudo-random draw both engines can replay — and the
    farthest-first maximin refinement then runs DRIVER-SIDE over that
    pool (n_cells x pool_size float ops on ~n_cells*oversample*dim
    floats). The r15 shape was one full-corpus argmin scan PER SEED —
    the classic k-means-init scale trap: n_cells=1024 meant 1023
    sequential corpus scans. Each Lloyd iteration is one assignment
    scan against broadcast centroid literals plus one (cell, dim)-keyed
    partial-aggregated shuffle; only ``n_cells x dim`` floats ever
    reach the driver. At 100 TB you train on a bounded ``.sample()`` of
    the corpus — exactly how production IVF quantizers are trained —
    and the same jobs run on the sample.

    ``max_cells`` bounds the driver-side refinement (pool_size *
    n_cells similarity evaluations) and the centroid-literal width of
    the Lloyd scans, not a per-seed job count anymore.
    """
    import math

    if n_cells > max_cells:
        raise ValueError(
            f"n_cells={n_cells} exceeds max_cells={max_cells}: the "
            "driver-side maximin refinement is O(oversample * n_cells^2) "
            "similarity evaluations and the Lloyd scans carry "
            "n_cells x dim centroid literals — raise max_cells "
            "deliberately and train on a sample"
        )
    nv = normalize_embeddings(corpus, vec_col, "__u").select(
        F.col(id_col).alias("__vid"), F.col("__u").alias("__u")
    )
    nv = nv.persist()
    try:
        def unit_lit(vals: list[float]):
            return F.array(*[F.lit(v) for v in vals])

        def rounded(vals) -> list[float]:
            return [round(float(x), round_dp) for x in vals]

        # --- oversampled maximin seeding: seed 0 = lowest-id vector;
        # each next seed is the POOL vector least similar to its nearest
        # chosen seed (ties: lowest id) — covers well-separated clusters
        # one seed each, which plain lowest-id seeding does not. The
        # pool (one job: the oversample*n_cells lowest-md5(vec_id)
        # vectors — a deterministic pseudo-random draw DuckDB replays
        # with the same expression) stands in for the full corpus the
        # way k-means||'s oversampled pass does; the sequential
        # farthest-first refinement then costs zero Spark jobs.
        seed_rows = nv.orderBy("__vid").limit(1).collect()
        if not seed_rows:
            raise ValueError("cannot train a quantizer on an empty corpus")
        first = seed_rows[0]
        cents: list[list[float]] = [rounded(first["__u"])]

        def cos_py(a: "list[float]", b: "list[float]") -> float:
            # mirrors _cosine / DuckDB list_dot_product bit-for-bit:
            # left-to-right folds from 0.0, zero-norm guarded to 0.0
            num = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(a, b):
                num = num + x * y
                na = na + x * x
                nb = nb + y * y
            den = math.sqrt(na) * math.sqrt(nb)
            return num / den if den != 0.0 else 0.0

        pool_rows = (
            nv.orderBy(F.md5(F.col("__vid").cast("string")), "__vid")
            .limit(oversample * n_cells)
            .collect()
        )
        pool = [(r["__vid"], list(r["__u"])) for r in pool_rows]
        best_py = {vid: cos_py(u, cents[0]) for vid, u in pool}
        for _ in range(1, n_cells):
            pick_vid, pick_u = min(
                pool, key=lambda t: (best_py[t[0]], t[0])
            )
            cents.append(rounded(pick_u))
            for vid, u in pool:
                s = cos_py(u, cents[-1])
                if s > best_py[vid]:
                    best_py[vid] = s

        # --- fixed Lloyd iterations: assign to max-cosine centroid (ties:
        # lowest cell), recompute centroids as the normalized mean
        for _ in range(n_iter):
            cent_arr = F.array(*[unit_lit(c) for c in cents])
            u = F.col("__u")
            sims = F.transform(
                cent_arr, lambda c: _cosine(c, u)
            )
            # array_position returns the FIRST match (1-based) -> lowest cell
            assigned = nv.select(
                (F.array_position(sims, F.array_max(sims)) - 1).alias("__cell"),
                "__u",
            )
            mean_rows = (
                assigned.select("__cell", F.posexplode("__u").alias("__idx", "__val"))
                .groupBy("__cell", "__idx")
                .agg(F.avg("__val").alias("__mval"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in mean_rows:
                by_cell.setdefault(int(r["__cell"]), {})[int(r["__idx"])] = float(
                    r["__mval"]
                )
            new_cents = []
            for cid in range(n_cells):
                if cid not in by_cell:  # empty cell: carry the previous centroid
                    new_cents.append(cents[cid])
                    continue
                vals = [by_cell[cid][i] for i in range(len(cents[cid]))]
                nrm = math.sqrt(sum(v * v for v in vals))
                if nrm == 0:
                    new_cents.append(cents[cid])
                else:
                    new_cents.append(rounded(v / nrm for v in vals))
            cents = new_cents
        return cents
    finally:
        nv.unpersist()


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF-flat with a TRAINED coarse quantizer: identical probe/re-rank
    plumbing as ``ivf_topk``, but cells come from deterministic spherical
    k-means centroids (``ivf_centroids_lloyd``) instead of fixed pivots —
    data-adaptive cells cover the corpus evenly, so the same candidate
    budget (n_probe/n_cells) buys higher recall (asserted in tests). The
    deterministic trainer makes this tier fully oracle-checkable: the
    DuckDB oracle replays seeding + Lloyd iterations as unrolled CTEs.
    ``centroids`` short-circuits training when the caller already holds
    the (deterministic) trained quantizer."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = ivf_centroids_lloyd(corpus, n_cells, n_iter, id_col, vec_col)
    piv = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "pid long, __pv array<double>"
    )
    return _ivf_core(corpus, queries, piv, k, n_probe, id_col, vec_col)


def _ivf_core(
    corpus: DataFrame,
    queries: DataFrame,
    pivots: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF machinery: assign corpus to max-cosine cells, probe the
    query's ``n_probe`` nearest cells, exact float64 re-rank. ``pivots``
    is any small (pid, __pv) relation — fixed ids or trained centroids."""
    piv = F.broadcast(pivots)

    def ranked_cells(side: DataFrame, out_id: str) -> DataFrame:
        sim = _cosine(
            F.transform("__pv", lambda x: x.cast("double")),
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("__psim"), F.asc("pid"))
        return (
            side.select(F.col(id_col).alias(out_id), vec_col)
            .join(piv)
            .withColumn("__psim", sim)
            .withColumn("__rn", F.row_number().over(w))
        )

    assign = ranked_cells(corpus, "neighbor_id").filter(F.col("__rn") == 1).select(
        "neighbor_id", F.col("pid").alias("cell")
    )
    probes = ranked_cells(queries, "query_id").filter(F.col("__rn") <= n_probe).select(
        "query_id", F.col("pid").alias("cell")
    )
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # re-rank joins: query vectors come from the QUERY side (queries need
    # not be a subset of the corpus), neighbor vectors from the corpus
    vq = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    vn = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sim = _cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        spread(cand, "query_id")
        .join(vq, "query_id")
        .join(vn, "neighbor_id")
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def pq_codebooks_fixed(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Product-quantization codebooks from the ``k_sub`` lowest-id
    NORMALIZED corpus vectors, split into ``m`` contiguous subspaces —
    the fixed-pivot analog of ``ivf_topk``'s coarse quantizer:
    deterministic (so the DuckDB oracle rebuilds the identical codebooks
    from the same rows), with trained per-subspace k-means as the
    production swap-in. Entries are rounded to ``round_dp`` decimals on
    BOTH engines so codebook values are bit-aligned cross-engine.

    Returns ``cb[subspace][code][component]`` — m * k_sub * (dim/m)
    floats, a few KB: codebooks always live driver-side and enter plans
    as broadcast literals, never as a join side.
    """
    d = dim // m
    rows = (
        normalize_embeddings(corpus, vec_col, "__u")
        .select(F.col(id_col).alias("__vid"), "__u")
        .orderBy("__vid")
        .limit(k_sub)
        .collect()
    )
    return [
        [
            [round(float(x), round_dp) for x in r["__u"][mi * d : (mi + 1) * d]]
            for r in rows
        ]
        for mi in range(m)
    ]


def _l2(a, b):
    """Euclidean distance, mirroring DuckDB ``list_distance`` exactly:
    sequential left-to-right sum of squared diffs, then one sqrt."""
    return F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x)
    )


class _NegOrd:
    """Order-reversing wrapper: ``max(key=lambda t: (score, _NegOrd(id)))``
    breaks score ties by the SMALLEST id — the engines' deterministic
    ``ORDER BY best DESC, vec_id ASC`` pick, replayed driver-side."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __eq__(self, other):
        return self.v == other.v

    def __lt__(self, other):
        return other.v < self.v

    def __gt__(self, other):
        return other.v > self.v


def pq_codebooks_trained(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 2,
    round_dp: int = 6,
    oversample: int = 5,
) -> list[list[list[float]]]:
    """TRAINED product-quantization codebooks: deterministic per-subspace
    L2 k-means — oversampled-pool maximin seeding from the lowest-id
    vector's subvectors, then ``n_iter`` fixed Lloyd iterations with
    plain (unnormalized) means, every codeword rounded to ``round_dp``
    decimals after every step so both engines stay bit-aligned. The same
    trainer recipe as ``ivf_centroids_lloyd`` (cosine there, L2 here —
    PQ's encode metric), so the DuckDB oracle can replay seeding +
    training as unrolled CTEs.

    Scale shape: all ``m`` subspaces train IN THE SAME JOBS on a
    long-form ``(vec_id, subspace, subvector)`` relation, and seeding is
    O(1) jobs regardless of ``k_sub`` (the k-means||-style shape): ONE
    job collects the subvectors of the ``oversample * k_sub``
    lowest-md5(vec_id) vectors (a deterministic pseudo-random draw both
    engines replay), and the per-subspace farthest-first refinement
    runs driver-side over that pool — the r15 shape was one scan per
    seed step. Each Lloyd iteration is one assignment scan against
    broadcast codeword literals plus one (subspace, code, dim)-keyed
    partial-agg shuffle; only ``m x k_sub x dim/m`` floats reach the
    driver. At 100 TB, train on a bounded ``.sample()`` — standard
    quantizer practice — and keep this out of any per-query path (it
    is).
    """
    d = dim // m
    subs = (
        normalize_embeddings(corpus, vec_col, "__u")
        .select(
            F.col(id_col).alias("__vid"),
            F.posexplode(
                F.array(
                    *[
                        F.transform(
                            F.slice("__u", mi * d + 1, d),
                            lambda x: x.cast("double"),
                        )
                        for mi in range(m)
                    ]
                )
            ).alias("__sid", "__su"),
        )
        .persist()
    )
    try:
        def rounded(vals) -> list[float]:
            return [round(float(x), round_dp) for x in vals]

        def lit_vec(vals: list[float]):
            return F.array(*[F.lit(v) for v in vals])

        w0 = Window.partitionBy("__sid").orderBy(F.asc("__vid"))
        first = (
            subs.withColumn("__rn", F.row_number().over(w0))
            .filter(F.col("__rn") == 1)
            .select("__sid", "__su")
            .collect()
        )
        # cents[sid] = list of codewords for that subspace, in code order
        cents: list[list[list[float]]] = [None] * m  # type: ignore[list-item]
        for r in first:
            cents[int(r["__sid"])] = [rounded(r["__su"])]

        # oversampled maximin: next seed per subspace = POOL subvector
        # FARTHEST from its nearest chosen seed (ties: lowest id). The
        # pool is ONE job — the subvectors of the oversample*k_sub
        # lowest-md5(vec_id) vectors (deterministic, oracle-replayable);
        # the farthest-first refinement is then driver-side per
        # subspace, zero further jobs (the r15 shape was one scan per
        # seed step).
        import math as _math

        def l2_py(a: "list[float]", b: "list[float]") -> float:
            # mirrors _l2 / DuckDB list_distance bit-for-bit:
            # left-to-right fold of squared diffs from 0.0, one sqrt
            s = 0.0
            for x, y in zip(a, b):
                d_ = x - y
                s = s + d_ * d_
            return _math.sqrt(s)

        pool_ids = (
            subs.select("__vid")
            .distinct()
            .orderBy(F.md5(F.col("__vid").cast("string")), "__vid")
            .limit(oversample * k_sub)
        )
        pool_rows = (
            subs.join(F.broadcast(pool_ids), "__vid")
            .select("__vid", "__sid", "__su")
            .collect()
        )
        pools: dict[int, list[tuple]] = {sid: [] for sid in range(m)}
        for r in pool_rows:
            pools[int(r["__sid"])].append((r["__vid"], list(r["__su"])))
        best_py = {
            sid: {vid: l2_py(su, cents[sid][0]) for vid, su in pools[sid]}
            for sid in range(m)
        }
        for _ in range(1, k_sub):
            for sid in range(m):
                pick_vid, pick_su = max(
                    pools[sid],
                    key=lambda t: (best_py[sid][t[0]], _NegOrd(t[0])),
                )
                cents[sid].append(rounded(pick_su))
                for vid, su in pools[sid]:
                    d_ = l2_py(su, cents[sid][-1])
                    if d_ < best_py[sid][vid]:
                        best_py[sid][vid] = d_

        # fixed Lloyd iterations: assign to argmin-L2 codeword (ties:
        # lowest code), recompute codewords as plain rounded means
        for _ in range(n_iter):
            cent_arr = F.element_at(
                F.array(
                    *[F.array(*[lit_vec(c) for c in cents[sid]]) for sid in range(m)]
                ),
                F.col("__sid") + 1,
            )
            dists = F.transform(cent_arr, lambda c: _l2(F.col("__su"), c))
            # array_position returns the FIRST match (1-based) -> lowest code
            assigned = subs.select(
                "__sid",
                (F.array_position(dists, F.array_min(dists)) - 1).alias("__cell"),
                "__su",
            )
            mean_rows = (
                assigned.select(
                    "__sid", "__cell", F.posexplode("__su").alias("__idx", "__val")
                )
                .groupBy("__sid", "__cell", "__idx")
                .agg(F.avg("__val").alias("__mval"))
                .collect()
            )
            by_cell: dict[tuple[int, int], dict[int, float]] = {}
            for r in mean_rows:
                by_cell.setdefault(
                    (int(r["__sid"]), int(r["__cell"])), {}
                )[int(r["__idx"])] = float(r["__mval"])
            for sid in range(m):
                new_words = []
                for cid in range(k_sub):
                    if (sid, cid) not in by_cell:  # empty cell: carry previous
                        new_words.append(cents[sid][cid])
                        continue
                    vals = by_cell[(sid, cid)]
                    new_words.append(rounded(vals[i] for i in range(d)))
                cents[sid] = new_words
        return cents
    finally:
        subs.unpersist()


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    k_sub: int = 16,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN: encode the corpus as ``m`` one-byte codes
    (argmin-L2 subspace centroid), scan codes with an asymmetric-distance
    (ADC) lookup per query, exact cosine re-rank of the top
    ``n_candidates``.

    This is the memory-bound scale tier the IVF/LSH tiers don't cover: a
    64-dim float32 vector is 256 B, its PQ code is ``m`` bytes (64x
    compression at m=4), so the candidate scan streams codes, not
    vectors — at 100 TB of embeddings the code table is ~1.6 TB and fits
    the page cache of a modest cluster. The plan stays entirely in
    whole-stage codegen: encode is an argmin over codebook literals, the
    ADC distance is ``m`` array lookups into per-query distance tables
    (computed once per query row, broadcast), and only the n_candidates
    survivors touch full vectors again. Everything is deterministic
    (fixed codebooks, lowest-id tie-breaks), so the DuckDB oracle replays
    encode + ADC + re-rank bit-for-bit.
    """
    d = dim // m
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks_fixed(corpus, m, k_sub, id_col, vec_col, dim)
    )
    cb_lits = [
        F.array(*[F.array(*[F.lit(x) for x in code]) for code in cb[mi]])
        for mi in range(m)
    ]

    def dists_to_codebook(mi: int):
        # single-arg lambda: a two-arg lambda would make transform() pass
        # the element INDEX as the second argument
        sub = F.slice("__u", mi * d + 1, d)
        return F.transform(cb_lits[mi], lambda c: _l2(sub, c))

    norm_c = normalize_embeddings(corpus, vec_col, "__u")
    enc_cols = []
    for mi in range(m):
        dists = dists_to_codebook(mi)
        enc_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"__code{mi}")
        )
    codes = norm_c.select(F.col(id_col).alias("neighbor_id"), *enc_cols)

    norm_q = normalize_embeddings(queries, vec_col, "__u")
    q_enc = norm_q.select(
        F.col(id_col).alias("query_id"),
        *[dists_to_codebook(mi).alias(f"__dt{mi}") for mi in range(m)],
    )

    approx = None
    for mi in range(m):
        dm = F.element_at(F.col(f"__dt{mi}"), F.col(f"__code{mi}") + 1)
        term = dm * dm
        approx = term if approx is None else approx + term
    wc = Window.partitionBy("query_id").orderBy(F.asc("__approx"), F.asc("neighbor_id"))
    cand = (
        codes.crossJoin(F.broadcast(q_enc))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__approx", approx)
        .withColumn("__crn", F.row_number().over(wc))
        .filter(F.col("__crn") <= n_candidates)
        .select("query_id", "neighbor_id")
    )

    vq = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    vn = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    av = F.transform("__qv", lambda x: x.cast("double"))
    bv = F.transform("__cv", lambda x: x.cast("double"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        spread(cand, "query_id")
        .join(vq, "query_id")
        .join(vn, "neighbor_id")
        .withColumn("cosine_sim", _cosine(av, bv))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def pq_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    k_sub: int = 8,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 2,
) -> DataFrame:
    """PQ ANN with TRAINED codebooks: identical encode/ADC/re-rank
    plumbing as ``pq_topk``, but codewords come from deterministic
    per-subspace L2 k-means (``pq_codebooks_trained``) instead of fixed
    lowest-id pivots — data-adaptive codewords tile each subspace where
    the vectors actually live, so the same code budget (m x k_sub) buys
    lower quantization error and higher candidate recall. Deterministic
    training keeps even this tier fully oracle-checkable: the DuckDB
    oracle replays seeding + Lloyd as unrolled CTEs."""
    cb = pq_codebooks_trained(
        corpus, m, k_sub, id_col, vec_col, dim, n_iter
    )
    return pq_topk(
        corpus,
        queries,
        k=k,
        m=m,
        k_sub=k_sub,
        n_candidates=n_candidates,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        codebooks=cb,
    )


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_unit"
) -> DataFrame:
    """L2-normalize an embedding column (pure expressions, codegen'd) —
    the standard prep so downstream dot product == cosine and int8
    quantization has a fixed dynamic range. Zero vectors normalize to
    zeros (no NaN poisoning)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(
        out_col,
        F.when(n == 0, v).otherwise(F.transform(v, lambda x: x / n)),
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_q8"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x|)/127,
    q_i = round(x_i/scale) — cuts embedding storage 4x (the difference
    between 25 TB and 6 TB of vectors at corpus scale) with the scale
    kept alongside for dequantization. Pure expressions, no UDF."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    scale = amax / F.lit(127.0)
    return df.withColumn("q8_scale", scale).withColumn(
        out_col,
        F.when(amax == 0, F.transform(v, lambda x: x.cast("tinyint"))).otherwise(
            F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
        ),
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """Semantic (embedding-space) near-duplicate pairs, SemDeDup-style
    (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with the
    deterministic spherical k-means trainer (``ivf_centroids_lloyd``),
    then compare pairs ONLY within a cluster — the cluster-then-compare
    trick that replaces the O(n^2) all-pairs join with sum-of-|cell|^2
    work. Emits ``(left_id, right_id, cell, cosine_sim)`` for every
    same-cell pair with cosine >= ``threshold`` (full-precision compare,
    4-dp rounded output — same contract as ``cosine_pairs``).

    Scale shape: centroid training touches only n_cells x dim floats on
    the driver (sample-able at 100 TB); assignment is one broadcast-join
    scan; candidate generation is an equi-join on the cell id, so the
    only shuffle is hash-partitioning by cell. At 100 TB you raise
    n_cells so cells stay bounded; a skewed giant cell is AQE skew-join
    fodder or gets re-clustered recursively. Deliberately misses
    cross-cell pairs — that is SemDeDup's documented recall trade, and
    the all-pairs twin (``cosine_pairs``) stays the labeled oracle
    baseline.
    """
    if centroids is None:
        centroids = ivf_centroids_lloyd(corpus, n_cells, n_iter, id_col, vec_col)
    # assignment is the same shuffle-free literal-argmax expression as
    # ``assign_cells`` — centroids ride in as codegen literals and
    # array_position picks the FIRST max, i.e. the lowest cell id on
    # ties, exactly the oracle's (sim DESC, pid ASC) rank-1 row. (An
    # earlier version cross-joined an 8-row centroid table and ranked
    # with a per-id window: an n_cells-times row blow-up plus a full
    # shuffle for a decision one row-local expression makes.)
    cent_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sims = F.transform(
        cent_arr, lambda c: _cosine(c, vec_d)
    )
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("long")
    # persisted: both sides of the pair self-join read the assignment, so
    # without this the corpus would be scanned and assigned twice (the
    # same one-materialization pattern the token-set dedup ops use)
    assign = track(
        corpus.select(F.col(id_col), F.col(vec_col), cell.alias("cell"))
        .persist()
    )
    a = assign.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("__lv"), "cell"
    )
    b = assign.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("__rv"), "cell"
    )
    lv = F.transform("__lv", lambda x: x.cast("double"))
    rv = F.transform("__rv", lambda x: x.cast("double"))
    return (
        a.join(b, "cell")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("cosine_sim", _cosine(lv, rv))
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            "left_id",
            "right_id",
            "cell",
            F.round("cosine_sim", 4).alias("cosine_sim"),
        )
    )


def assign_cells(
    df: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine cell of a TRAINED coarse
    quantizer (ties: lowest cell id) — the maintenance half of an IVF
    index: at ingest time each new embedding needs exactly this stateless
    per-row decision to land in the right cell/partition. The centroid
    table rides in as codegen literals (n_cells x dim floats), so the
    operator is a map-only pass with no shuffle and no state — it runs
    identically over a batch corpus or a Structured Streaming source
    (see the t_streaming_ann_assign catalog query).

    Returns ``(id, cell, cell_sim)`` with the cosine to the winning
    centroid rounded to 4dp.
    """
    cent_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    u = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sims = F.transform(cent_arr, lambda c: _cosine(c, u))
    # array_position returns the FIRST max (1-based) -> lowest cell id wins
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("long")
    return df.select(
        F.col(id_col),
        cell.alias("cell"),
        F.round(F.array_max(sims), 4).alias("cell_sim"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_query_rows: "int | None" = 100_000,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k
    most cosine-similar corpus vectors carrying a DIFFERENT label — the
    negatives a contrastive trainer wants (similar in embedding space,
    disagreeing in supervision; random negatives are too easy to teach
    a margin).

    Same execution contract as :func:`cosine_topk` — the query side
    broadcasts (refused past ``max_query_rows`` at plan-build time),
    the corpus is scanned once with the dot product fused into codegen,
    the per-query ranking window holds k rows of state — plus the label
    disagreement folded into the join condition so same-label pairs
    never reach scoring. For corpora past the brute-force budget,
    ``hard_negatives_lsh`` mines within SRP buckets; this exact path is
    its oracle.
    """
    _guard_broadcast_side(
        queries, max_query_rows, "hard_negatives", "hard_negatives_lsh"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__qlabel"),
    )
    c = spread_if_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col(label_col).alias("__clabel"),
        )
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("__clabel") != F.col("__qlabel")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("__clabel").alias("neg_label"),
            _cosine(
                F.transform("__qv", lambda x: x.cast("double")),
                F.transform("__cv", lambda x: x.cast("double")),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def hard_negatives_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 8,
    n_planes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Bucketed hard-negative mining — the corpus-scale path for
    :func:`hard_negatives` (which is this operator's exact oracle).

    Sign-random-projection buckets (the ``lsh_bucket_topk`` machinery,
    same seeded deterministic planes) prune candidate generation to the
    query's bucket: candidates per query ~ corpus / 2^n_planes instead
    of the whole corpus. The label disagreement rides INSIDE the join
    condition so same-label pairs never reach scoring; exact float64
    cosine re-rank within the bucket, k rows of window state per query.

    Scale shape: a plain equi-join on the bucket key — never a
    broadcast of the query set (unlike the exact path) and never a
    nested loop over the corpus, so the query side may be arbitrarily
    large; AQE still broadcasts it when it happens to be small. Recall
    vs the exact miner is a first-class query
    (``x_ann_hard_negatives_recall``) — mine with more planes only
    after reading that number.
    """
    planes_rows = srp_planes(n_planes, dim, seed)
    c = spread_if_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col(label_col).alias("__clabel"),
            _bucket_expr(F.col(vec_col), planes_rows).alias("bucket"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__qlabel"),
        _bucket_expr(F.col(vec_col), planes_rows).alias("__qbucket"),
    )
    scored = (
        c.join(
            q,
            (F.col("bucket") == F.col("__qbucket"))
            & (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("__clabel") != F.col("__qlabel")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("__clabel").alias("neg_label"),
            _cosine(
                F.transform("__qv", lambda x: x.cast("double")),
                F.transform("__cv", lambda x: x.cast("double")),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def standardize_dims(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-12,
) -> DataFrame:
    """Per-dimension standardization (diagonal whitening): subtract the
    corpus mean and divide by the corpus standard deviation, dimension
    by dimension. The cheap version of PCA-whitening every embedding
    pipeline runs before quantization or cosine bucketing — dominant
    dimensions stop owning the distance metric.

    Two passes, both bounded: (1) posexplode to (dim, value) and
    aggregate mean/m2 per dimension — the shuffle carries |dims| keys
    (hundreds), each a partial-aggregated pair, NOT the corpus; (2) the
    |dims|-row stats table broadcasts back and the standardized vector
    rebuilds in one zip_with-style transform over the original rows —
    the corpus itself never shuffles. Population std (1/N), matching
    the oracle; near-constant dimensions clamp to std=1 below ``eps``
    so they standardize to ~0 instead of exploding.
    """
    stats = (
        emb.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("dim", "x")
        )
        .groupBy("dim")
        .agg(
            F.avg("x").alias("mu"),
            F.coalesce(F.stddev_pop("x"), F.lit(0.0)).alias("sigma"),
        )
        .withColumn(
            "sigma",
            F.when(F.col("sigma") < eps, F.lit(1.0)).otherwise(
                F.col("sigma")
            ),
        )
        # collect_list carries no ordering guarantee; sort_array over the
        # (dim, mu, sigma) structs orders by dim — the one-row stats
        # frame rebuilds the per-dimension arrays positionally
        .agg(
            F.sort_array(
                F.collect_list(F.struct("dim", "mu", "sigma"))
            ).alias("__st")
        )
        .select(
            F.col("__st.mu").alias("__mus"),
            F.col("__st.sigma").alias("__sigmas"),
        )
    )
    return (
        emb.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            # index the stats arrays by each vector's OWN positions (a
            # ragged short vector standardizes only its own dims; the
            # stats arrays always cover the corpus max, so the lookup
            # never runs past them — zip_with would null-pad instead)
            F.transform(
                F.col(vec_col),
                lambda x, i: (
                    x.cast("double")
                    - F.element_at(F.col("__mus"), i + 1)
                )
                / F.element_at(F.col("__sigmas"), i + 1),
            ).alias("standardized"),
        )
    )
