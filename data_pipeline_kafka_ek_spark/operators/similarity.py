"""Similarity search over embedding columns (``array<float>``).

Three tiers, trading exactness for scale:

* ``cosine_topk``        — exact brute force, pure DataFrame ops (zip_with
                           dot product in whole-stage codegen). The oracle
                           baseline and correct for any data.
* ``cosine_topk_blocked``— exact, Arrow/numpy matmul via ``mapInPandas``
                           with the query matrix broadcast: the fast exact
                           path when queries are few and the corpus is huge
                           (each executor scans its partitions once).
* ``lsh_bucket_topk``    — approximate: sign-random-projection buckets
                           prune the corpus before exact re-ranking; the
                           100 TB path (candidates per query ~ corpus /
                           2^bits instead of the full corpus).

All cosine math is in float64 over the original element order so results
are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine_sim") -> DataFrame:
    av = F.transform(F.col(a), lambda x: x.cast("double"))
    bv = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(av, bv) / (_norm(av) * _norm(bv)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector, brute force.

    The query side is broadcast (queries are few); the corpus is scanned
    once per partition with the dot product fused into codegen. Ranking is
    a per-query window — state is k rows per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(
                    F.transform("__qv", lambda x: x.cast("double")),
                    F.transform("__cv", lambda x: x.cast("double")),
                )
                / (
                    _norm(F.transform("__qv", lambda x: x.cast("double")))
                    * _norm(F.transform("__cv", lambda x: x.cast("double")))
                )
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
            sims = (mat @ qmat.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * qnorm[None, :]
            )
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


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold.

    Brute-force O(n^2) formulation for the oracle gate; at scale, route
    through ``lsh_bucket_topk``-style bucketing first (the threshold
    variant buckets both sides and only compares within buckets).
    """
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb"))
    av = F.transform("__va", lambda x: x.cast("double"))
    bv = F.transform("__vb", lambda x: x.cast("double"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_sim", _dot(av, bv) / (_norm(av) * _norm(bv)))
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

    Deterministic planes from a seeded RNG. Candidates per query shrink by
    ~2^n_planes; recall is tested against ``cosine_topk`` in tests (this is
    an approximation — it has no SQL oracle by design).
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).astype(np.float64)
    planes_rows = [[float(x) for x in row] for row in planes]
    planes_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in planes_rows]
    )

    def bucket_of(vec_col_expr):
        v = F.transform(vec_col_expr, lambda x: x.cast("double"))
        bits = F.transform(
            planes_lit,
            lambda plane: F.when(_dot(plane, v) >= 0, F.lit("1")).otherwise(F.lit("0")),
        )
        return F.array_join(bits, "")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        bucket_of(F.col(vec_col)).alias("bucket"),
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
        .withColumn("cosine_sim", _dot(av, bv) / (_norm(av) * _norm(bv)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )
