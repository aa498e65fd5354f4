"""Catalog entries for the large-scale extension operators (BASELINE.json
north star): dedup, similarity search, text analysis, multimodal plumbing.

Registered into the same QUERIES dict as the reference-parity set; oracle
conventions identical (see catalog.py header). The LSH/SimHash operators
are *approximate relative to brute force* but *deterministic* (seeded
hyperplanes / md5 token hashes), so their oracles are generated SQL that
replays the identical bucketing in DuckDB — every catalog entry is fully
value-hash-checked; recall vs brute force is additionally asserted in
tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.operators import (
    dedup,
    multimodal,
    packing,
    relational,
    similarity,
    temporal,
    text,
)
from data_pipeline_kafka_ek_spark.caching import track
from data_pipeline_kafka_ek_spark.plans.catalog import _t, register


def _sql_bucket(planes: list[list[float]], vec: str = "e") -> str:
    """DuckDB expression for the sign-bit bucket string of ``vec`` against
    literal hyperplanes — textual twin of similarity._bucket_expr."""
    bits = [
        f"(CASE WHEN list_dot_product([{', '.join(repr(x) for x in row)}], {vec})"
        f" >= 0 THEN '1' ELSE '0' END)"
        for row in planes
    ]
    return " || ".join(bits)

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@register(
    "x_dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY text
    """,
    bench=True,
    survey_ids=("EXT-dedup",),
    doc="exact dedup via content-digest groupBy: one shuffle keyed on "
    "md5(text), keep lowest doc_id per group",
)
def x_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


@register(
    "x_dedup_jaccard",
    """
    WITH sets AS (
      SELECT doc_id, list_distinct(string_split(text,' ')) s FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.s,b.s))*1.0
                 / len(list_distinct(list_concat(a.s,b.s))), 4) AS jaccard_sim
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s,b.s))*1.0
          / len(list_distinct(list_concat(a.s,b.s))) >= 0.9
    """,
    bench=True,  # the candidate-verify stage is the most regression-prone
    # plan in the repo (r1's AQE-collapse bug lived here) — keep it gated
    survey_ids=("EXT-dedup",),
    doc="token-set Jaccard >= 0.9 near-dup pairs; Spark side is a "
    "prefix-filtered inverted-index join (each doc posts only its "
    "n-ceil(t*n)+1 rarest tokens — exact, no recall loss), oracle is "
    "brute-force O(n^2)",
)
def x_dedup_jaccard(spark, sf_dir):
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.9)


# MinHash+LSH pair pipeline as reusable CTEs: the pair query below and the
# connected-components clustering oracle both consume mh_pairs
_MINHASH_CTES = """toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents
    ),
    hmin AS (
      SELECT doc_id,
        min(md5('0:'||tok)) h0, min(md5('1:'||tok)) h1,
        min(md5('2:'||tok)) h2, min(md5('3:'||tok)) h3,
        min(md5('4:'||tok)) h4, min(md5('5:'||tok)) h5,
        min(md5('6:'||tok)) h6, min(md5('7:'||tok)) h7
      FROM toks GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_idx, md5(h0||'|'||h1) AS band_val FROM hmin
      UNION ALL SELECT doc_id, 1, md5(h2||'|'||h3) FROM hmin
      UNION ALL SELECT doc_id, 2, md5(h4||'|'||h5) FROM hmin
      UNION ALL SELECT doc_id, 3, md5(h6||'|'||h7) FROM hmin
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                   AND a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(string_split(text,' ')) s FROM documents),
    mh_pairs AS (
      SELECT c.doc_a, c.doc_b,
             round(len(list_intersect(x.s,y.s))*1.0
                   / len(list_distinct(list_concat(x.s,y.s))), 4) AS jaccard_sim
      FROM cand c JOIN sets x ON c.doc_a = x.doc_id JOIN sets y ON c.doc_b = y.doc_id
      WHERE len(list_intersect(x.s,y.s))*1.0
            / len(list_distinct(list_concat(x.s,y.s))) >= 0.8
    )"""


@register(
    "x_dedup_minhash_lsh",
    f"""
    WITH {_MINHASH_CTES}
    SELECT doc_a, doc_b, jaccard_sim FROM mh_pairs
    """,
    bench=True,  # same rationale as x_dedup_jaccard: band-join candidate
    # explosion + verify stage must stay under the round-over-round gate
    survey_ids=("EXT-dedup",),
    doc="MinHash(8 hashes) + LSH(4 bands of 2): md5-minhash signatures -> "
    "band bucket-join candidates -> exact-Jaccard verify >= 0.8; fully "
    "deterministic so both engines reproduce the identical candidate set",
)
def x_dedup_minhash(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "x_dedup_minhash_xxh",
    None,  # xxhash64 has no plain-SQL DuckDB twin, so the DRIVER check stays
    # rows-only — but the LOCAL gate hash-checks it end to end via a DuckDB
    # Python UDF replaying Spark's xxhash64 bit-for-bit
    # (tools/check_correctness.py LOCAL_ONLY_ORACLES + tools/spark_xxh64.py,
    # pinned against Spark in tests/test_xxh64_twin.py); the md5 variant
    # above is the driver-checkable oracle-parity twin, and
    # tests/test_extensions.py proves this one's exact precision in-engine
    survey_ids=("EXT-dedup",),
    doc="MinHash+LSH near-dup pairs on the 100 TB hot path: seeded "
    "xxhash64 signatures and band keys (8-byte integers, JVM codegen) "
    "instead of md5 strings — ~5x cheaper to compute and shuffle; "
    "identical banding architecture and exact-Jaccard verify as "
    "x_dedup_minhash_lsh, so precision is exact by construction and only "
    "candidate recall depends on the hash family",
)
def x_dedup_minhash_xxh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, hash_fn="xxhash64"
    )


@register(
    "x_dedup_components",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM mh_pairs
      UNION
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
    ),
    sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS component_size
      FROM comp GROUP BY component
    )
    SELECT c.doc_id, c.component, s.component_size
    FROM comp c JOIN sizes s ON c.component = s.component
    """,
    survey_ids=("EXT-dedup",),
    doc="dedup CLUSTERING: near-dup pairs (MinHash+LSH >= 0.8) are only "
    "half the job — training pipelines need the connected components of "
    "the pair graph to keep one representative per duplicate cluster. "
    "Spark side is iterative min-label propagation over slim (node, label) "
    "joins (the join-based Hash-to-Min shape; O(log diameter) rounds, "
    "2-3 in practice on dense dup clusters); the unique fixpoint "
    "(min doc_id per component) makes it engine-independent, so the "
    "oracle replays it with a recursive transitive-closure CTE",
)
def x_dedup_components(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import graph

    pairs = dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)
    comp = graph.connected_components(pairs.select("doc_a", "doc_b"))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"), "component", "component_size"
    )


@register(
    "x_dedup_keep_list",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM mh_pairs
      UNION
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
    )
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS representative,
           CASE WHEN c.component IS NULL THEN 'unique'
                WHEN c.component = d.doc_id THEN 'representative'
                ELSE 'duplicate' END AS status
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
    survey_ids=("EXT-dedup", "EXT-pipeline"),
    doc="the dedup pipeline's END decision: every corpus doc labeled "
    "unique / representative / duplicate with its kept canonical id "
    "(cluster min = the component label, so no extra ranking pass); "
    "components run over the slim pair graph, the corpus pays one left "
    "join — `status != 'duplicate'` IS the dedup filter downstream",
)
def x_dedup_keep_list(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8)
    return dedup.dedup_keep_list(docs, pairs.select("doc_a", "doc_b"))


def _simhash_oracle_sql() -> str:
    """DuckDB replay of the 64-bit SimHash pipeline: md5-derived token
    hashes (('0x'||hex16)::UBIGINT == Python int.from_bytes(digest[:8],
    'big')), per-bit majority vote, 16-bit-chunk pigeonhole blocking,
    bit_count(xor) Hamming verify — bit-identical to dedup._simhash64."""
    acc = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS a{j}"
        for j in range(64)
    )
    # 2**j as literals: DuckDB's << overflow-checks (1::UBIGINT << 63 errors)
    sig = " + ".join(
        f"(CASE WHEN a{j} > 0 THEN {2**j}::UBIGINT ELSE 0::UBIGINT END)"
        for j in range(64)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok
      FROM documents
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
    ),
    acc AS (
      SELECT doc_id,
        {acc}
      FROM th GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, ({sig}) AS u FROM acc),
    chunks AS (
      SELECT doc_id, u, i.i AS chunk_idx,
             (u >> (16 * i.i)) & 65535::UBIGINT AS chunk_val
      FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) i
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.u AS ua, b.u AS ub
      FROM chunks a
      JOIN chunks b ON a.chunk_idx = b.chunk_idx
                   AND a.chunk_val = b.chunk_val
                   AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ua, ub)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ua, ub)) <= 3
    """


@register(
    "x_dedup_simhash",
    _simhash_oracle_sql(),
    bench=True,
    survey_ids=("EXT-dedup",),
    doc="SimHash64 near-dup pairs (hamming<=3) with 16-bit-chunk pigeonhole "
    "blocking; signature via Arrow-batched Pandas UDF; md5 token hashes "
    "make it deterministic, so the oracle replays the identical pipeline "
    "in DuckDB bit-for-bit (plus metamorphic tests in tests/)",
)
def x_dedup_simhash(spark, sf_dir):
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "x_dedup_editdistance",
    """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id
    WHERE abs(a.n_chars - b.n_chars) <= 5
      AND levenshtein(a.text, b.text) <= 5
    """,
    survey_ids=("EXT-dedup",),
    doc="Levenshtein <= 5 near-dup pairs; Spark side blocks by length "
    "bucket (width max_dist+1, each doc posts two buckets — exact, no "
    "cross join) and verifies with the built-in banded levenshtein "
    "(early-exit O(len*threshold)); oracle is brute-force O(n^2) with "
    "the same necessary length filter",
)
def x_dedup_editdistance(spark, sf_dir):
    return dedup.editdistance_pairs(_t(spark, sf_dir, "documents"), max_dist=5)


@register(
    "x_dedup_embedding",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 4) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    """,
    survey_ids=("EXT-dedup", "EXT-similarity"),
    doc="embedding-cosine near-dup pairs (>= 0.4; fixture vectors are "
    "near-orthogonal so higher thresholds are empty); float64 math over the "
    "original element order on both engines. This is the labeled O(n^2) "
    "oracle baseline — it now REFUSES corpora over 100k rows at plan-build "
    "time (x_dedup_embedding_lsh is the scale path)",
)
def x_dedup_embedding(spark, sf_dir):
    return similarity.cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def _embedding_lsh_oracle_sql(n_bands: int = 4, planes_per_band: int = 4) -> str:
    planes = similarity.srp_planes(n_bands * planes_per_band, 64, 42)
    bands = "\n      UNION ALL ".join(
        f"SELECT vec_id, e, {i} AS band_idx, "
        f"{_sql_bucket(planes[i * planes_per_band:(i + 1) * planes_per_band])}"
        f" AS band_val FROM v"
        for i in range(n_bands)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                   AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round(list_cosine_similarity(x.e, y.e), 4) AS cosine_sim
    FROM cand c JOIN v x ON c.vec_a = x.vec_id JOIN v y ON c.vec_b = y.vec_id
    WHERE list_cosine_similarity(x.e, y.e) >= 0.4
    """


@register(
    "x_dedup_embedding_lsh",
    _embedding_lsh_oracle_sql(),
    bench=True,
    survey_ids=("EXT-dedup", "EXT-similarity"),
    doc="embedding near-dup at scale: banded sign-random-projection LSH "
    "(4 bands x 4 planes) candidate equi-join + exact float64 cosine "
    "verify >= 0.4 — the 100 TB path that never materializes the n^2 pair "
    "matrix; deterministic seeded planes, so the oracle replays the same "
    "bucketing with plane literals; recall vs brute force tested in tests/",
)
def x_dedup_embedding_lsh(spark, sf_dir):
    return similarity.cosine_pairs_lsh(_t(spark, sf_dir, "embeddings"), threshold=0.4)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_ANN_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, c.e) AS sim
      FROM v c, q WHERE c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 10
"""


@register(
    "x_ann_cosine_topk",
    _ANN_ORACLE,
    survey_ids=("EXT-similarity",),
    doc="brute-force exact cosine top-10 per query vector (query set "
    "broadcast, dot product in whole-stage codegen, per-query window rank)",
)
def x_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register(
    "x_ann_topk_blocked",
    _ANN_ORACLE,
    survey_ids=("EXT-similarity",),
    bench=True,
    doc="same exact top-k via mapInPandas numpy matmul with per-partition "
    "local top-k (the fast exact path for huge corpora: shuffle carries "
    "k rows per partition per query, not the corpus); identical oracle",
)
def x_ann_blocked(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    return similarity.cosine_topk_blocked(emb, qrows, k=10)


def _ann_lsh_oracle_sql(n_planes: int = 4) -> str:
    planes = similarity.srp_planes(n_planes, 64, 42)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    b AS (SELECT vec_id, e, {_sql_bucket(planes)} AS bucket FROM v),
    q AS (SELECT * FROM b WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, c.e) AS sim
      FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """


@register(
    "x_ann_lsh_bucketed",
    _ann_lsh_oracle_sql(),
    survey_ids=("EXT-similarity",),
    doc="sign-random-projection LSH buckets + exact re-rank within bucket "
    "(the corpus-pruning scale path); deterministic seeded planes, so the "
    "oracle replays the identical bucketing with plane literals; recall vs "
    "exact top-k additionally asserted in tests/test_extensions.py",
)
def x_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_planes=4
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "x_text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text,' '))) AS BIGINT)
             AS n_distinct_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
             AS BIGINT) AS n_pretokens,
           CAST(ceil(length(text)/4.0) AS BIGINT) AS n_subword_est
    FROM documents
    """,
    survey_ids=("EXT-text",),
    doc="token counting: whitespace tokens, distinct tokens, chars, "
    "BPE-style pre-token count (letter/digit runs + punctuation regex), "
    "~4-chars-per-token subword estimate",
)
def x_text_tokens(spark, sf_dir):
    return text.token_stats(_t(spark, sf_dir, "documents"))


@register(
    "x_text_quality",
    """
    WITH t AS (
      SELECT doc_id, text,
             len(string_split(text,' ')) AS n,
             list_distinct(string_split(text,' ')) AS d
      FROM documents
    )
    SELECT doc_id,
           round(len(d)*1.0/n, 4) AS distinct_ratio,
           round(len(list_intersect(d,
                 ['the','a','an','and','or','of','to','in','is','it']))*1.0
                 / len(d), 4) AS stopword_ratio,
           round((length(text) - (n-1))*1.0/n, 4) AS mean_token_len,
           round(least(1.0,
                 (len(d)*1.0/n)*0.5
                 + (len(list_intersect(d,
                    ['the','a','an','and','or','of','to','in','is','it']))*1.0
                    / len(d))*0.2
                 + least((length(text)-(n-1))*1.0/n/8, 1.0)*0.3), 4)
             AS quality_score
    FROM t
    """,
    bench=True,
    survey_ids=("EXT-text",),
    doc="document quality heuristics: repetition (distinct ratio), stopword "
    "ratio, mean token length, composite [0,1] score",
)
def x_text_quality(spark, sf_dir):
    return text.quality_score(_t(spark, sf_dir, "documents"))


@register(
    "x_text_langid",
    """
    WITH t AS (
      SELECT doc_id, lang, list_distinct(string_split(text,' ')) AS d
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
             len(list_intersect(d, ['der','die','und','das','ist'])) AS h_de,
             len(list_intersect(d, ['the','and','of','to','is'])) AS h_en,
             len(list_intersect(d, ['el','la','de','los','que'])) AS h_es,
             len(list_intersect(d, ['le','la','et','les','des'])) AS h_fr,
             len(list_intersect(d, ['de5','shi4','le5','zai4','he2'])) AS h_zh
      FROM t
    )
    SELECT doc_id, lang AS lang_declared,
           CASE WHEN greatest(h_de,h_en,h_es,h_fr,h_zh) = 0 THEN 'und'
                WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'de'
                WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'en'
                WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'es'
                WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'fr'
                ELSE 'zh' END AS lang_predicted,
           CAST(greatest(h_de,h_en,h_es,h_fr,h_zh) AS BIGINT) AS marker_hits
    FROM h
    """,
    survey_ids=("EXT-text",),
    doc="heuristic language ID: marker-word hits per language, argmax with "
    "alphabetical tiebreak, 'und' when no markers hit",
)
def x_text_langid(spark, sf_dir):
    return text.language_id(_t(spark, sf_dir, "documents"))


@register(
    "x_text_fingerprint",
    """
    SELECT doc_id,
           md5(list_aggregate(list_sort(list_distinct(
               string_split(lower(text),' '))), 'string_agg', ' ')) AS fp_key,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(generate_series(1, length(text)),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
             (a, b) -> (a * 31 + b) % 2147483647) AS fp_roll
    FROM documents
    """,
    survey_ids=("EXT-text",),
    doc="document fingerprinting: OpenRefine-style sorted-distinct-token "
    "md5 collision key + base-31 polynomial rolling hash over the chars",
)
def x_text_fingerprint(spark, sf_dir):
    return text.fingerprint(_t(spark, sf_dir, "documents"))


@register(
    "x_text_chunking",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(range(greatest(1,
               CAST(ceil((len(w) - 4) / 12.0) AS INT)))) AS chunk_idx
      FROM base
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           array_to_string(w[chunk_idx * 12 + 1 : chunk_idx * 12 + 16], ' ')
             AS chunk_text,
           CAST(len(w[chunk_idx * 12 + 1 : chunk_idx * 12 + 16]) AS BIGINT)
             AS n_tokens
    FROM idx
    """,
    survey_ids=("EXT-text",),
    doc="context-window chunking: each document's whitespace tokens split "
    "into 16-token windows with a 4-token overlap (stride 12) — the prep "
    "that turns variable-length documents into training-sequence-sized "
    "pieces; one posexplode over a generated index array, no shuffle, no "
    "UDF, fan-out bounded by doc length / stride",
)
def x_text_chunking(spark, sf_dir):
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), max_tokens=16, overlap=4
    )


@register(
    "x_pipeline_mixture_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          / 4294967296.0
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.9 WHEN 'de' THEN 0.9
                      WHEN 'es' THEN 0.9 WHEN 'zh' THEN 1.0 ELSE 0.05 END
    """,
    survey_ids=("EXT-text",),
    doc="deterministic data-mixing sampler: per-language keep rates "
    "(down-sample the dominant language, keep the rest) decided by an "
    "engine-independent md5 hash of doc_id instead of rand() — the sample "
    "is reproducible across runs/engines/partitionings and auditable row "
    "by row; the u < rate comparison is exact in float64 on both engines "
    "(32-bit hash prefix / 2^32), and the filter is stateless so it "
    "pushes down past everything",
)
def x_pipeline_mixture_sample(spark, sf_dir):
    sampled = text.mixture_sample(
        _t(spark, sf_dir, "documents"),
        rates={"en": 0.5, "fr": 0.9, "de": 0.9, "es": 0.9, "zh": 1.0},
        default_rate=0.05,
    )
    return sampled.select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# streaming (the reference's continuous-query semantics, run to completion)
# ---------------------------------------------------------------------------


@register(
    "t_streaming_windowed_counts",
    """
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count
    FROM events GROUP BY 1, 2
    """,
    survey_ids=("T1", "T2", "T5", "A3", "A4"),
    doc="a REAL Structured Streaming query (file stream -> watermark -> "
    "tumbling 15-min update-mode agg -> memory sink, availableNow trigger) "
    "whose final state must equal the batch oracle — the reference's "
    "EMIT CHANGES windowed CTAS (ksqldb-statements.sql:88-93) run to "
    "completion over the fixture as a bounded stream",
)
def t_streaming_windowed(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    stream = srt.stream_table(spark, sf_dir, "events")
    revisions = srt.run_available_now(
        srt.windowed_counts(stream, watermark="100 days"), output_mode="update"
    )
    # The update-mode memory sink appends one row per state REVISION; a
    # multi-file fixture yields multiple micro-batches and thus several
    # revisions per key. The final state is the last revision, and since a
    # windowed count only grows, last == max — reduce so the oracle match
    # doesn't depend on the fixture being a single file.
    return revisions.groupBy("window_start", "event_type").agg(
        F.max("event_count").alias("event_count")
    )


@register(
    "x_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'
    )
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS last_click_at,
           r.event_id AS click_event_id,
           round(l.value - r.value, 4) AS value_delta
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    survey_ids=("EXT-temporal",),
    doc="point-in-time (backward as-of) join — each purchase event picks "
    "the same user's latest click at-or-before it; implemented with the "
    "union + last-non-null-over-window trick (one key shuffle + sort, the "
    "same exchange a sort-merge join pays; no per-key inequality cross "
    "join), oracled against DuckDB's native ASOF LEFT JOIN",
)
def x_asof(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id"),
        "ts",
        F.col("value").alias("click_value"),
    )
    joined = temporal.asof_join(
        left, right, key="user_id", right_cols=["click_event_id", "click_value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_at"),
        "click_event_id",
        F.round(F.col("value") - F.col("click_value"), 4).alias("value_delta"),
    )


@register(
    "x_interval_join",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'view'
    )
    SELECT l.event_id, l.user_id, r.event_id AS view_event_id,
           round(epoch(l.ts) - epoch(r.ts), 3) AS seconds_before
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND epoch(r.ts) >= epoch(l.ts) - 1800
     AND epoch(r.ts) <= epoch(l.ts)
    """,
    survey_ids=("EXT-temporal",),
    doc="interval (range) join — views within the 30 minutes before each "
    "purchase by the same user; time-bin bucketing turns the range "
    "predicate into an equi-join on (key, bin) with the left side "
    "exploded into its 1-2 candidate bins, so fan-out is bin occupancy "
    "rather than a per-key cross product",
)
def x_interval(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), F.col("user_id"), "ts"
    )
    joined = temporal.interval_join(
        left,
        right,
        key="user_id",
        lower_seconds=-1800,
        upper_seconds=0,
        right_cols=["view_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "view_event_id",
        F.round(
            F.col("ts").cast("double") - F.col("right_ts").cast("double"), 3
        ).alias("seconds_before"),
    )


@register(
    "t_streaming_hopping_counts",
    """
    WITH w AS (
      SELECT event_type,
             unnest([CAST(floor(epoch(ts) / 900) * 900 AS BIGINT),
                     CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) - 900]) AS ws
      FROM events
    )
    SELECT strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count
    FROM w GROUP BY 1, 2
    """,
    survey_ids=("T3", "T1", "T5"),
    doc="T3 as a REAL streaming query: hopping 30m/15m update-mode agg "
    "through availableNow + memory sink, reduced to final state (counts "
    "per fixed window key are monotone across revisions, so last == max); "
    "must equal the batch/oracle result exactly",
)
def t_streaming_hopping(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    stream = srt.stream_table(spark, sf_dir, "events")
    revisions = srt.run_available_now(
        srt.windowed_counts(
            stream, "30 minutes", slide="15 minutes", watermark="100 days"
        ),
        output_mode="update",
    )
    return revisions.groupBy("window_start", "event_type").agg(
        F.max("event_count").alias("event_count")
    )


@register(
    "t_streaming_session_counts",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts)) >= 300
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    )
    SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 5 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS event_count
    FROM s GROUP BY user_id, sess_id
    """,
    survey_ids=("T4", "T1", "T5"),
    doc="T4 as a REAL streaming query: session windows (5-min gap) run in "
    "COMPLETE mode — sessions MERGE across micro-batches (their identity "
    "is not stable), so update-mode revisions cannot be reduced to final "
    "state after the fact; complete mode makes the memory sink hold "
    "exactly the final sessions, which must equal the batch/oracle result",
)
def t_streaming_session(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    stream = srt.stream_table(spark, sf_dir, "events")
    return srt.run_available_now(
        srt.session_windowed_counts(stream, gap="5 minutes", watermark="100 days"),
        output_mode="complete",
    )


@register(
    "t_streaming_session_append",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts)) >= 300
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ),
    g AS (
      SELECT user_id,
             min(ts) AS s_start,
             max(ts) + INTERVAL 5 MINUTE AS s_end,
             CAST(count(*) AS BIGINT) AS event_count
      FROM s GROUP BY user_id, sess_id
    )
    SELECT strftime(s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(s_end, '%Y-%m-%d %H:%M:%S') AS session_end,
           user_id, event_count
    FROM g
    WHERE s_end < make_timestamp(
        epoch_ms((SELECT max(ts) FROM events)) * 1000 - CAST(3600000000 AS BIGINT))
    """,
    survey_ids=("T4", "T1", "T5"),
    doc="T4 the SCALE-SAFE way: append-mode session windows with a finite "
    "1-hour watermark — each session is emitted exactly once after it "
    "closes (end < watermark), so state and output per micro-batch are "
    "bounded by the watermark horizon instead of complete-mode's full "
    "re-emission. The oracle truncates max(ts) to milliseconds before "
    "subtracting the delay because Spark tracks event-time watermarks at "
    "ms precision. The complete-mode twin above stays as the bounded-"
    "replay oracle over ALL sessions; this entry attests the standing-"
    "query shape a 100 TB stream actually runs.",
)
def t_streaming_session_append(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    stream = srt.stream_table(spark, sf_dir, "events")
    return srt.run_available_now(
        srt.session_windowed_counts(stream, gap="5 minutes", watermark="1 hour"),
        output_mode="append",
    )


@register(
    "t_streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    survey_ids=("T1", "T5", "EXT-dedup"),
    doc="streaming exact dedup as a standing query: a 4-micro-batch ordered "
    "replay of events through dropDuplicatesWithinWatermark on "
    "(user_id, event_type), append mode — the streaming twin of "
    "operators/dedup.py::exact_dedup. Only the key columns are projected "
    "because which duplicate arrives first is a partition-order accident; "
    "the key SET is the deterministic contract (= batch DISTINCT). State "
    "is bounded by the watermark horizon (runtime.py::stream_dedup), the "
    "property that separates this from plain dropDuplicates at 100 TB/day.",
)
def t_streaming_dedup(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    deduped = srt.stream_dedup(
        stream, ["user_id", "event_type"], watermark="365 days"
    )
    return srt.run_available_now(
        deduped.select("user_id", "event_type"), output_mode="append"
    )


@register(
    "t_streaming_stateful_counts",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS event_count,
           round(sum(value), 4) AS value_total
    FROM events GROUP BY user_id
    """,
    survey_ids=("T1", "T5", "EXT-streaming"),
    doc="custom stateful operator (applyInPandasWithState) run as a real "
    "4-micro-batch streaming query: per-user running (count, value total) "
    "with two-number state per key, update-mode emissions per touched key "
    "per batch. The final state — last revision per key, selected by max "
    "event_count since the count strictly grows on every emission — must "
    "equal the batch GROUP BY. This attests the arbitrary-stateful escape "
    "hatch (CUSUM alerts, pattern automata) against a SQL oracle, not just "
    "unit tests.",
)
def t_streaming_stateful_counts(spark, sf_dir):
    from pyspark.sql.window import Window

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    revisions = srt.run_available_now(
        srt.running_counts_stateful(stream, watermark="365 days"),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("event_count"))
    return (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_count",
            F.round("value_total", 4).alias("value_total"),
        )
    )


@register(
    "t_streaming_acid_changes",
    """
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 3 AS b
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT * FROM (
        SELECT p.*, row_number() OVER (
          PARTITION BY user_id, b ORDER BY ts DESC, event_id DESC) AS rn
        FROM p
      ) WHERE rn = 1
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes,
           round(sum(value), 4) AS value_total
    FROM u GROUP BY user_id
    """,
    survey_ids=("T1", "T5", "T7", "T11", "EXT-streaming"),
    bench=True,
    doc="the ACID change feed driving a stateful streaming operator, "
    "attested end to end: three deterministic CDC batches (purchases "
    "bucketed by epoch%3, deduped latest-per-user within each) are "
    "MERGEd into a change_feed TxnLogTable, its transaction log is "
    "consumed as a Structured Streaming source (stream_changes with "
    "commit-span batching: three commits in two micro-batches, state "
    "folding across the batch boundary), and a per-user applyInPandasWithState "
    "automaton folds the feed into running (n_changes, value_total). "
    "The oracle counts exactly one post-image per (user, batch "
    "present) — a match is only possible because the feed is ROW-LEVEL "
    "(a whole-file post-image feed would re-emit unchanged rows of "
    "rewritten files and over-count), so this query IS the end-to-end "
    "attestation of lineage ACID log -> row-level cdc -> stream -> "
    "stateful agg == batch SQL.",
)
def t_streaming_acid_changes(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.sources.acid import TxnLogTable
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    )
    wb = Window.partitionBy("user_id", "__b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upserts = (
        p.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # materialize the deduped upsert set ONCE: each of the three
        # merges below filters this checkpoint instead of re-running the
        # events scan + dedup window per batch
        .localCheckpoint(eager=True)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_feed_")
    try:
        t = TxnLogTable(
            spark,
            f"{scratch}/tbl",
            key="user_id",
            order_col="__b",
            files_per_commit=2,
            change_feed=True,
        )
        # batch 0 lands as a plain append (the table is empty — merge
        # machinery buys nothing); batches 1 and 2 are true upsert MERGEs
        # whose row-level change files the feed replays
        t.append(upserts.filter(F.col("__b") == 0))
        for b in (1, 2):
            # changes_stable: a filter over the eagerly-checkpointed
            # upserts is deterministic and cheap to recompute — merge's
            # defensive per-commit checkpoint is pure fixed cost here
            t.merge(upserts.filter(F.col("__b") == b), changes_stable=True)
        # commit-span batching (r13 verdict #5): the three commits replay
        # as TWO micro-batches — still a real multi-batch incremental run
        # (state folds across the batch boundary), but per-batch fixed
        # costs (state-store checkpoint files, planning) are paid twice,
        # not three times. The final revision per user is identical
        # because the stateful fold is order-invariant within a batch.
        feed = t.stream_changes(-1, commits_per_batch=2).select(
            "user_id", "ts", "value"
        )
        revisions = srt.run_available_now(
            srt.running_counts_stateful(feed, watermark="3650 days"),
            output_mode="update",
            # fixed-width (count, total) per key: the memory-backed
            # provider is the right state backend until keys ~ executor
            # memory; RocksDB's per-partition instances were pure fixed
            # cost here (see runtime.run_available_now docstring)
            small_state=True,
        )
    finally:
        # the streaming run completed inside this call and the memory-sink
        # result no longer reads the scratch table
        shutil.rmtree(scratch, ignore_errors=True)
    wf = Window.partitionBy("user_id").orderBy(F.desc("event_count"))
    return (
        revisions.withColumn("__rn", F.row_number().over(wf))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_count").alias("n_changes"),
            F.round("value_total", 4).alias("value_total"),
        )
    )


@register(
    "x_acid_incremental_mv",
    """
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(round(value * 10000) AS BIGINT) AS vq,
             user_id % 5 AS seg,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 3 AS b
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT * FROM (
        SELECT p.*, row_number() OVER (
          PARTITION BY user_id, b ORDER BY ts DESC, event_id DESC) AS rn
        FROM p
      ) WHERE rn = 1
    ),
    w AS (
      SELECT * FROM (
        SELECT u.*, row_number() OVER (
          PARTITION BY user_id ORDER BY b DESC, ts DESC, event_id DESC
        ) AS rw FROM u
      ) WHERE rw = 1
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM w GROUP BY seg
    """,
    survey_ids=("A4", "T7", "T11", "EXT-streaming"),
    bench=True,
    doc="the incrementally maintained materialized aggregate "
    "(sources/incremental.py) attested by a SQL oracle, end to end: the "
    "same three CDC batches as t_streaming_acid_changes land in a "
    "change_feed TxnLogTable (append + two MERGEs) with a refresh() "
    "after the append and ONE multi-commit span refresh over both "
    "merges (commit-span batching: the cursor machinery folds the "
    "whole span in one scan), so the aggregate is built purely from "
    "signed row-level delta folds — never a recompute — and its final "
    "snapshot "
    "must equal the oracle's groupBy over the table's end state "
    "(winner-per-user across batches). Values are pre-scaled to "
    "integer ten-thousandths so every incremental sum is exact in "
    "int64 range and the final division is the only float op — the "
    "fixed-point trick that makes an order-dependent incremental fold "
    "hash-identical to a one-shot SQL aggregate. The 5-row snapshot is "
    "collected eagerly so the scratch table is removed before returning "
    "(no tmp-dir leak across bench/correctness runs).",
)
def x_acid_incremental_mv(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.sources.acid import TxnLogTable
    from data_pipeline_kafka_ek_spark.sources.incremental import (
        IncrementalAggregate,
    )

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    )
    wb = Window.partitionBy("user_id", "__b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upserts = (
        p.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_mv_")
    try:
        src = TxnLogTable(
            spark,
            f"{scratch}/tbl",
            key="user_id",
            order_col="__b",
            files_per_commit=2,
            change_feed=True,
        )
        mv = IncrementalAggregate(
            src, f"{scratch}/mv", group_col="seg", sum_cols=["vq"],
            files_per_commit=2,
        )
        src.append(upserts.filter(F.col("__b") == 0))
        mv.refresh()
        for b in (1, 2):
            # changes_stable: filter over the checkpointed upserts (see
            # t_streaming_acid_changes)
            src.merge(upserts.filter(F.col("__b") == b), changes_stable=True)
        # one refresh folds BOTH merge commits in a single multi-commit
        # span scan (r13 verdict #5: group adjacent commits where the
        # cursor allows) — this exercises the span path the per-commit
        # cadence never did, still purely signed-delta folds (never a
        # recompute), and the final snapshot is identical because delta
        # folding is span-associative
        mv.refresh()
        snapshot = mv.read().select(
            "seg",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("sum_vq") / F.lit(10000.0), 4).alias("sum_value"),
        )
        # ≤5 rows (seg is user_id mod 5): collect eagerly and rebuild the
        # frame driver-side so the parquet-backed scratch MV can be
        # deleted HERE instead of leaking two tables per invocation
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_replica_convergence",
    """
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(round(value * 10000) AS BIGINT) AS vq,
             user_id % 5 AS seg,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 3 AS b
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT * FROM (
        SELECT p.*, row_number() OVER (
          PARTITION BY user_id, b ORDER BY ts DESC, event_id DESC) AS rn
        FROM p
      ) WHERE rn = 1
    ),
    w AS (
      SELECT * FROM (
        SELECT u.*, row_number() OVER (
          PARTITION BY user_id ORDER BY b DESC) AS rw
        FROM u
      ) WHERE rw = 1
    ),
    alive AS (
      SELECT * FROM w WHERE NOT (b = 2 AND user_id % 7 = 0)
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM alive GROUP BY seg
    """,
    survey_ids=("T7", "T11", "EXT-streaming"),
    doc="the ACID-to-ACID replication primitive "
    "(sources/incremental.py::TableReplicator / Engine.replicate_table) "
    "attested by a SQL oracle, end to end: three deterministic CDC "
    "batches (purchases bucketed by epoch%3, deduped latest-per-user "
    "within each) land in a change_feed TxnLogTable — an append, then "
    "two MERGEs, the last tombstoning every user_id % 7 == 0 it "
    "touches — with replicate() after EVERY commit, so the replica is "
    "built purely from incremental typed-feed spans (insert / "
    "update_postimage / delete row images merged by _commit_version), "
    "never a copy. Its final per-segment rollup must equal the oracle's "
    "winner-per-user fold of the same batches with the b=2 tombstones "
    "removed — deletes included, which a post-image-only feed could "
    "not replicate. Fixed-point vq keeps sums exact in int64.",
)
def x_acid_replica_convergence(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.sources.acid import TxnLogTable
    from data_pipeline_kafka_ek_spark.sources.incremental import (
        TableReplicator,
    )

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    )
    wb = Window.partitionBy("user_id", "__b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upserts = (
        p.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(
            "__dead",
            (F.col("__b") == 2) & (F.pmod(F.col("user_id"), F.lit(7)) == 0),
        )
        .localCheckpoint(eager=True)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_repl_")
    try:
        src = TxnLogTable(
            spark,
            f"{scratch}/src",
            key="user_id",
            order_col="__b",
            files_per_commit=2,
            change_feed=True,
        )
        rep = TableReplicator(
            src, f"{scratch}/replica", files_per_commit=2
        )
        src.append(upserts.filter(F.col("__b") == 0).drop("__dead"))
        rep.replicate()
        for b in (1, 2):
            src.merge(
                upserts.filter(F.col("__b") == b), delete_col="__dead"
            )
            rep.replicate()
        snapshot = (
            rep.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        # ≤5 rows: collect eagerly so the scratch tables are removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_dml_lifecycle",
    """
    WITH p AS (
      SELECT event_id, user_id % 5 AS seg,
             CAST(round(value * 10000) AS BIGINT) AS vq
      FROM events WHERE event_type = 'purchase'
    ),
    kept AS (SELECT * FROM p WHERE event_id % 10 >= 3),
    capped AS (
      SELECT seg,
             CASE WHEN vq > 1000000 THEN 1000000 ELSE vq END AS vq
      FROM kept
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM capped GROUP BY seg
    """,
    survey_ids=("T7", "§2.12", "EXT-streaming"),
    doc="predicate DELETE and UPDATE attested by a SQL oracle, end to "
    "end and THROUGH THE SQL STRING SURFACE: purchases land in an ACID "
    "table via three epoch-bucketed appends, then Engine.sql routes "
    "'DELETE FROM t WHERE event_id % 10 < 3' (a retention-style purge) "
    "and 'UPDATE t SET vq = 1000000 WHERE vq > 1000000' (outlier "
    "winsorization) to the transactional ops — pushdown-pruned file "
    "rewrites with row-level change images. The final per-segment "
    "rollup must equal the oracle's filter+cap over the same rows; "
    "fixed-point vq keeps sums exact in int64. A user can run the "
    "whole lakehouse lifecycle from SQL strings.",
)
def x_acid_dml_lifecycle(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.engine import Engine

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_dml_")
    try:
        eng = Engine(spark)
        t = eng.create_acid_table(
            "dml_t", f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=2, change_feed=True,
        )
        for b in (0, 1, 2):
            t.append(p.filter(F.col("__b") == b).drop("__b"))
        eng.sql("DELETE FROM dml_t WHERE event_id % 10 < 3")
        eng.sql("UPDATE dml_t SET vq = 1000000 WHERE vq > 1000000")
        snapshot = (
            t.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        # ≤5 rows: collect eagerly so the scratch table is removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_restore_rewind",
    """
    SELECT user_id % 5 AS seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0, 4)
             AS sum_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id % 5
    """,
    survey_ids=("§2.12", "EXT-streaming"),
    doc="RESTORE TO VERSION AS OF attested by a SQL oracle: purchases "
    "land in an ACID table over three appends, a destructive span runs "
    "— a retention DELETE, a winsorizing UPDATE and an OPTIMIZE "
    "rewrite — and then Engine.sql routes 'RESTORE TABLE t TO VERSION "
    "AS OF <pre-DML head>'. One metadata commit re-adds the pre-DML "
    "files and removes the rewritten ones (data files are immutable, "
    "so the undo moves no data), history keeps the bad span "
    "time-travelable, and the final per-segment rollup must equal the "
    "oracle's rollup over ALL purchases — only true if the revert is "
    "exact. Fixed-point vq keeps sums exact in int64.",
)
def x_acid_restore_rewind(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.engine import Engine

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_restore_")
    try:
        eng = Engine(spark)
        t = eng.create_acid_table(
            "rewind_t", f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=2,
        )
        for b in (0, 1, 2):
            t.append(p.filter(F.col("__b") == b).drop("__b"))
        head = t.latest_version()
        eng.sql("DELETE FROM rewind_t WHERE vq % 7 < 2")
        eng.sql("UPDATE rewind_t SET vq = 1000000 WHERE vq > 1000000")
        eng.sql("OPTIMIZE rewind_t")
        eng.sql(f"RESTORE TABLE rewind_t TO VERSION AS OF {head}")
        snapshot = (
            t.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        # ≤5 rows: collect eagerly so the scratch table is removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_stats_skipping",
    """
    WITH p AS (
      SELECT event_id, user_id % 5 AS seg,
             CAST(round(value * 10000) AS BIGINT) AS vq
      FROM events WHERE event_type = 'purchase'
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM p WHERE vq BETWEEN 200000 AND 600000
    GROUP BY seg
    """,
    survey_ids=("§2.12", "EXT-streaming"),
    doc="log-stats data skipping attested by a SQL oracle: purchases "
    "land in an ACID table, OPTIMIZE ZORDER BY (event_id, vq) tightens "
    "per-file vq ranges, and the rollup reads through read_pruned — "
    "the file list pruned DRIVER-SIDE from the per-column min/max "
    "stats every add action records (Delta's dataSkipping rule), zero "
    "Spark jobs for the prune, then the same predicate as a real row "
    "filter. The hash match proves the prune is a pure optimization; "
    "the unit test (test_log_stats_data_skipping) proves it actually "
    "skips files. At 100 TB this is what makes selective scans cheap: "
    "the scan's FILE LIST shrinks before any task is scheduled.",
)
def x_acid_stats_skipping(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.sources.acid import TxnLogTable

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_skip_")
    try:
        t = TxnLogTable(
            spark, f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=4,
        )
        for b in (0, 1, 2):
            t.append(p.filter(F.col("__b") == b).drop("__b"))
        t.optimize(cluster_by=["event_id", "vq"])
        snapshot = (
            t.read_pruned([("vq", "between", (200000, 600000))])
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        # ≤5 rows: collect eagerly so the scratch table is removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_time_travel_diff",
    """
    WITH p AS (
      SELECT event_id, user_id % 5 AS seg,
             CAST(round(value * 10000) AS BIGINT) AS vq
      FROM events WHERE event_type = 'purchase'
    ),
    now_state AS (
      SELECT seg,
             CASE WHEN vq > 1000000 THEN 1000000 ELSE vq END AS vq
      FROM p WHERE vq % 7 >= 2
    ),
    now_agg AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(vq) AS s
      FROM now_state GROUP BY seg
    ),
    before_agg AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(vq) AS s
      FROM p GROUP BY seg
    )
    SELECT b.seg AS seg,
           CAST(b.n - n.n AS BIGINT) AS rows_removed,
           round((b.s - n.s) / 10000.0, 4) AS value_removed
    FROM before_agg b JOIN now_agg n ON b.seg = n.seg
    """,
    survey_ids=("§2.12", "EXT-streaming"),
    doc="SELECT-side time travel through the SQL string surface "
    "(Delta's FROM t VERSION AS OF k syntax), attested by an oracle: "
    "after a retention DELETE and a winsorizing UPDATE, ONE SQL "
    "statement joins the current snapshot against the pre-DML version "
    "of the same table name and reports the per-segment rows/value the "
    "DML removed. The cross-version self-join is only possible because "
    "each travel clause pins its own snapshot (file lists resolved at "
    "rewrite time — snapshot isolation inside a single statement). "
    "Fixed-point vq keeps sums exact in int64.",
)
def x_acid_time_travel_diff(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.engine import Engine

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_tt_")
    try:
        eng = Engine(spark)
        t = eng.create_acid_table(
            "tt_t", f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=2,
        )
        for b in (0, 1, 2):
            t.append(p.filter(F.col("__b") == b).drop("__b"))
        head = t.latest_version()
        eng.sql("DELETE FROM tt_t WHERE vq % 7 < 2")
        eng.sql("UPDATE tt_t SET vq = 1000000 WHERE vq > 1000000")
        eng.refresh_acid_table("tt_t")
        snapshot = eng.sql(
            "WITH now_agg AS ("
            "  SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(vq) AS s"
            "  FROM tt_t GROUP BY seg"
            "), before_agg AS ("
            "  SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(vq) AS s"
            f"  FROM tt_t VERSION AS OF {head} GROUP BY seg"
            ") "
            "SELECT b.seg AS seg, CAST(b.n - n.n AS BIGINT) AS rows_removed,"
            # CAST to DOUBLE: Spark parses the 10000.0 literal as DECIMAL,
            # and a decimal round formats trailing zeros the oracle's
            # double does not
            "       CAST(round((b.s - n.s) / 10000.0, 4) AS DOUBLE)"
            "         AS value_removed "
            "FROM before_agg b JOIN now_agg n ON b.seg = n.seg"
        )
        # ≤5 rows: collect eagerly so the scratch table is removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "t_streaming_dml_replica",
    """
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(round(value * 10000) AS BIGINT) AS vq,
             user_id % 5 AS seg,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 3 AS b
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT * FROM (
        SELECT p.*, row_number() OVER (
          PARTITION BY user_id, b ORDER BY ts DESC, event_id DESC) AS rn
        FROM p
      ) WHERE rn = 1
    ),
    w AS (
      SELECT * FROM (
        SELECT u.*, row_number() OVER (
          PARTITION BY user_id ORDER BY b DESC) AS rw
        FROM u
      ) WHERE rw = 1
    ),
    alive AS (
      SELECT * FROM w WHERE NOT (b = 2 AND user_id % 7 = 0)
    ),
    kept AS (SELECT * FROM alive WHERE vq % 7 >= 2),
    capped AS (
      SELECT seg,
             CASE WHEN vq > 1000000 THEN 1000000 ELSE vq END AS vq
      FROM kept
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM capped GROUP BY seg
    """,
    survey_ids=("T1", "T7", "T11", "EXT-streaming"),
    doc="the full DML history — append, two MERGEs (the second "
    "tombstoning every user_id % 7 == 0 it touches), a retention-style "
    "predicate DELETE (vq % 7 < 2) and a winsorizing predicate UPDATE "
    "(vq capped at 1000000) — consumed by a replica as a STANDING "
    "streaming query: TableReplicator.replicate_stream reads the typed "
    "row-level change feed as a Structured Streaming source (commit-"
    "span batching: five commits in three micro-batches, a commit never "
    "splitting across batches) and merges each batch into the replica "
    "inside foreachBatch, exactly-once via the target-side txn cursor; "
    "per-key last-write-wins holds across the span because the merge "
    "ranks on _commit_version inside the batch. "
    "The replica's per-segment rollup must equal the oracle's "
    "winner-per-user fold with tombstoned users removed, the DELETE's "
    "rows dropped and the UPDATE's cap applied — only possible because "
    "delete and update_preimage/postimage row images flow through the "
    "stream (reference behavior twinned: the CDC update-propagation "
    "demo, README.md:204-210). Fixed-point vq keeps sums exact.",
)
def t_streaming_dml_replica(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.sources.acid import TxnLogTable
    from data_pipeline_kafka_ek_spark.sources.incremental import (
        TableReplicator,
    )

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.pmod(
            F.floor(F.col("ts").cast("double")).cast("long"), F.lit(3)
        ).alias("__b"),
    )
    wb = Window.partitionBy("user_id", "__b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upserts = (
        p.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(
            "__dead",
            (F.col("__b") == 2) & (F.pmod(F.col("user_id"), F.lit(7)) == 0),
        )
        .localCheckpoint(eager=True)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_dml_repl_")
    try:
        src = TxnLogTable(
            spark,
            f"{scratch}/src",
            key="user_id",
            order_col="__b",
            files_per_commit=2,
            change_feed=True,
        )
        src.append(upserts.filter(F.col("__b") == 0).drop("__dead"))
        for b in (1, 2):
            src.merge(
                upserts.filter(F.col("__b") == b), delete_col="__dead"
            )
        src.delete_where("vq % 7 < 2")
        src.update_where("vq > 1000000", {"vq": F.lit(1000000)})
        rep = TableReplicator(
            src, f"{scratch}/replica", files_per_commit=2
        )
        # the standing query follows all 5 commits, grouped into 3
        # micro-batches (commit-span batching, r13 verdict #5): each
        # micro-batch is a full transactional merge on the replica, so
        # grouping is the difference between 5 and 3 target merges on a
        # catch-up — identical converged state because the in-batch
        # ranking on _commit_version preserves per-key last-write-wins
        rep.replicate_stream(commits_per_batch=2)
        snapshot = (
            rep.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        # ≤5 rows: collect eagerly so the scratch tables are removed here
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "t_streaming_funnel",
    """
    WITH e AS (
      SELECT user_id AS u, event_type, CAST(ts AS TIMESTAMP) AS t FROM events
    ),
    s0 AS (
      SELECT u, min(t) AS t0 FROM e WHERE event_type = 'signup' GROUP BY u
    ),
    s1 AS (
      SELECT e.u, s0.t0, min(e.t) AS t_prev
      FROM e JOIN s0 ON e.u = s0.u
      WHERE e.event_type = 'view' AND e.t > s0.t0
        AND e.t <= s0.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s0.t0
    ),
    s2 AS (
      SELECT e.u, s1.t0, min(e.t) AS t_prev
      FROM e JOIN s1 ON e.u = s1.u
      WHERE e.event_type = 'purchase' AND e.t > s1.t_prev
        AND e.t <= s1.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s1.t0
    )
    SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step, count(*) AS users FROM s0
    UNION ALL
    SELECT CAST(1 AS INT), 'view', count(*) FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), 'purchase', count(*) FROM s2
    """,
    survey_ids=("T1", "T5", "EXT-streaming", "EXT-analytics"),
    doc="the funnel as a STANDING streaming query: a per-user pattern "
    "automaton (applyInPandasWithState) carrying the batch fold's exact "
    "(reached, t0, tp) state over a 4-micro-batch ordered replay, "
    "update-mode emissions per touched user per batch; reached is "
    "monotone so the final revision is max per user, and the step counts "
    "must equal the batch funnel / its SQL oracle. Attests that the "
    "greedy-chain semantics survive incremental execution with 3-number "
    "state per key.",
)
def t_streaming_funnel(spark, sf_dir):
    from pyspark.sql.window import Window

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    steps = ["signup", "view", "purchase"]
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(steps))
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    revisions = srt.run_available_now(
        srt.funnel_stateful(stream, steps, watermark="365 days"),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("reached"))
    final = (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("reached")
    )
    one_row = final.agg(
        *[
            F.coalesce(F.sum((F.col("reached") >= i + 1).cast("int")), F.lit(0))
            .cast("long")
            .alias(f"__c{i}")
            for i in range(len(steps))
        ]
    )
    return one_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"__c{i}").alias("users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.step_idx", "r.step", "r.users")


@register(
    "t_streaming_stream_stream_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT l.event_id AS purchase_id, r.event_id AS click_id, l.user_id,
           epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
    FROM l JOIN r ON l.user_id = r.user_id
     AND r.ts BETWEEN l.ts - INTERVAL 6 HOUR AND l.ts
    """,
    survey_ids=("T1", "T5", "EXT-streaming"),
    doc="fully-streaming interval join (purchases x preceding clicks within "
    "6 h, same user) — BOTH sides are replayed 3-micro-batch streams, so "
    "matches span micro-batch boundaries and exercise the buffered join "
    "state. Beyond the reference (ksqlDB demo joins stream-to-table only); "
    "the event-time bound + dual watermarks make join state evictable "
    "(runtime.py::stream_stream_interval_join), the condition under which "
    "stream-stream joins survive at scale. Lag is emitted in exact "
    "microseconds (unix_micros / epoch_us) to avoid cross-engine "
    "subsecond-truncation drift.",
)
def t_streaming_stream_stream_join(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    ls = srt.replayed_stream(spark, purchases, n_slices=3, order_col="ts")
    rs = srt.replayed_stream(spark, clicks, n_slices=3, order_col="ts")
    joined = srt.stream_stream_interval_join(
        ls, rs, key="user_id", lookback="6 hours", watermark="365 days"
    )
    out = joined.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
        (F.unix_micros(F.col("l.ts")) - F.unix_micros(F.col("r.ts"))).alias(
            "lag_us"
        ),
    )
    return srt.run_available_now(out, output_mode="append")


@register(
    "x_multimodal_features",
    """
    SELECT doc_id AS asset_id, 'text' AS modality,
           CAST(length(text) AS BIGINT) AS byte_len,
           md5(text) AS digest,
           array_to_string(
             list_transform(
               [ascii(substr(text, (0*length(text))//4 + 1, 1))/255.0,
                ascii(substr(text, (1*length(text))//4 + 1, 1))/255.0,
                ascii(substr(text, (2*length(text))//4 + 1, 1))/255.0,
                ascii(substr(text, (3*length(text))//4 + 1, 1))/255.0],
               x -> CAST(round(x * 10000) AS BIGINT)),
             ',') AS fake_embedding
    FROM documents
    """,
    survey_ids=("EXT-multimodal",),
    doc="multimodal plumbing: opaque binary payload column + typed metadata, "
    "feature extraction via Arrow-batched mapInPandas (byte length, digest, "
    "sampled-byte fake embedding standing in for the absent codecs); oracle "
    "valid because fixture text is pure ASCII (byte == char); the embedding "
    "is emitted as a comma-joined x1e4-integer string so the output schema "
    "stays atomic (driver canonicalizer can't hash array cells) and the "
    "comparison avoids cross-engine float-format drift",
)
def x_multimodal(spark, sf_dir):
    assets = multimodal.documents_as_assets(_t(spark, sf_dir, "documents"))
    feats = multimodal.fake_features(assets)
    return feats.withColumn(
        "fake_embedding",
        F.array_join(
            F.transform(
                F.col("fake_embedding"),
                lambda x: F.round(x * 10000).cast("bigint").cast("string"),
            ),
            ",",
        ),
    )


def _ivf_oracle_sql(piv_ctes: str) -> str:
    """The shared IVF probe/re-rank oracle, parameterized by the CTE chain
    that produces ``piv (pid, pe)`` — fixed pivots for x_ann_ivf_topk, the
    unrolled deterministic-Lloyd's chain for x_ann_ivf_trained_topk."""
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {piv_ctes},
    ca AS (
      SELECT v.vec_id, piv.pid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    ),
    assign AS (SELECT vec_id AS neighbor_id, pid AS cell FROM ca WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, pid AS cell FROM ca
               WHERE vec_id < 5 AND rn <= 2),
    cand AS (
      SELECT DISTINCT p.query_id, a.neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell
      WHERE a.neighbor_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(q.e, n.e) AS sim
      FROM cand c
      JOIN v q ON c.query_id = q.vec_id
      JOIN v n ON c.neighbor_id = n.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 10
"""


@register(
    "x_multimodal_stdlib_codecs",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 300 + 1 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 200 + 1 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 3 + 1 AS INT) END AS channels,
           CASE WHEN doc_id % 2 = 1 THEN CAST(8000 + (doc_id % 5) * 1000 AS INT)
             END AS sample_rate,
           CASE WHEN doc_id % 2 = 1 THEN CAST((doc_id % 4 + 1) * 10 AS BIGINT)
             END AS duration_ms
    FROM documents
    """,
    survey_ids=("EXT-multimodal",),
    doc="REAL in-container codecs through the decode_payload seam: each doc "
    "synthesizes a spec-valid PNG (even ids) or RIFF/WAVE (odd ids) payload "
    "whose header fields derive from doc_id arithmetic, then "
    "stdlib_header_decoder parses the actual bytes (signature + CRC-checked "
    "IHDR / RIFF chunk walk) inside the Arrow-batched decode path; the "
    "oracle replays the arithmetic, so a decoder that misparses any field "
    "hash-mismatches — this closes the 'codec plumbing only' caveat with "
    "zero new dependencies",
)
def x_multimodal_stdlib(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    payload = multimodal.png_encode_header(
                        did % 300 + 1, did % 200 + 1
                    )
                    rows.append((did, "image", payload))
                else:
                    rate = 8000 + (did % 5) * 1000
                    payload = multimodal.wav_encode(
                        (rate // 100) * (did % 4 + 1), rate, channels=did % 3 + 1
                    )
                    rows.append((did, "audio", payload))
            yield pd.DataFrame(rows, columns=["asset_id", "modality", "payload"])

    assets = docs.mapInPandas(
        synth, schema="asset_id long, modality string, payload binary"
    )
    feats = multimodal.decode_payload(
        assets, decoder=multimodal.stdlib_header_decoder
    )
    return feats.select(
        "asset_id",
        F.from_json(
            "feature_json",
            "mime string, width int, height int, channels int, "
            "sample_rate int, duration_ms long",
        ).alias("f"),
    ).select("asset_id", "f.*")


_IVF_FIXED_PIV = "piv AS (SELECT vec_id AS pid, e AS pe FROM v WHERE vec_id < 8)"


def _lloyd_centroids_cte(
    n_cells: int = 8, n_iter: int = 2, round_dp: int = 6, oversample: int = 5
) -> str:
    """Unrolled-CTE DuckDB replay of ``similarity.ivf_centroids_lloyd``:
    oversampled-pool maximin seeding from the lowest-id vector (the pool
    is the ``oversample * n_cells`` lowest-md5(vec_id) vectors — the
    engine's one-job k-means||-style candidate draw, r15 verdict #5),
    then ``n_iter`` Lloyd iterations, centroids rounded to ``round_dp``
    decimals after every step (the rounding pins both engines to
    identical centroids — raw float64 means differ in the last ulps
    across engines). Produces the ``piv (pid, pe)`` relation the shared
    probe/re-rank oracle consumes."""
    r = round_dp
    cos = (
        "list_dot_product({u}, {c}) / (sqrt(list_dot_product({u}, {u}))"
        " * sqrt(list_dot_product({c}, {c})))"
    )
    parts = [
        # L2-normalized corpus (zero vectors pass through, like
        # similarity.normalize_embeddings)
        """nv AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(e, e)) = 0 THEN e
                  ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
             END AS u
      FROM v
    )""",
        f"""s0 AS MATERIALIZED (
      SELECT 0 AS cid, list_transform(u, x -> round(x, {r})) AS c
      FROM nv ORDER BY vec_id LIMIT 1
    )""",
        f"""spool AS MATERIALIZED (
      SELECT vec_id, u FROM nv
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {oversample * n_cells}
    )""",
        f"""m0 AS MATERIALIZED (
      SELECT spool.vec_id, spool.u, {cos.format(u='spool.u', c='s.c')} AS best
      FROM spool CROSS JOIN s0 s
    )""",
    ]
    for j in range(1, n_cells):
        parts.append(
            f"""p{j} AS MATERIALIZED (
      SELECT vec_id FROM m{j - 1} ORDER BY best ASC, vec_id ASC LIMIT 1
    )"""
        )
        parts.append(
            f"""s{j} AS MATERIALIZED (
      SELECT {j} AS cid, list_transform(u, x -> round(x, {r})) AS c
      FROM nv WHERE vec_id = (SELECT vec_id FROM p{j})
    )"""
        )
        if j < n_cells - 1:
            parts.append(
                f"""m{j} AS MATERIALIZED (
      SELECT m.vec_id, m.u,
             greatest(m.best, {cos.format(u='m.u', c='s.c')}) AS best
      FROM m{j - 1} m CROSS JOIN s{j} s
    )"""
            )
    seeds_union = "\n      UNION ALL ".join(
        f"SELECT cid, c FROM s{j}" for j in range(n_cells)
    )
    parts.append(f"""c0 AS MATERIALIZED (
      {seeds_union}
    )""")
    for t in range(1, n_iter + 1):
        parts.append(
            f"""a{t} AS MATERIALIZED (
      SELECT vec_id, u, cid FROM (
        SELECT nv.vec_id, nv.u, c.cid,
               row_number() OVER (
                 PARTITION BY nv.vec_id
                 ORDER BY {cos.format(u='nv.u', c='c.c')} DESC, c.cid ASC
               ) AS rn
        FROM nv CROSS JOIN c{t - 1} c)
      WHERE rn = 1
    )"""
        )
        parts.append(
            f"""mean{t} AS MATERIALIZED (
      SELECT cid, idx, avg(val) AS mval FROM (
        SELECT cid, unnest(range(len(u))) AS idx, unnest(u) AS val FROM a{t})
      GROUP BY cid, idx
    )"""
        )
        parts.append(
            f"mn{t} AS MATERIALIZED (SELECT cid, sqrt(sum(mval * mval)) AS n "
            f"FROM mean{t} GROUP BY cid)"
        )
        parts.append(
            f"""cm{t} AS MATERIALIZED (
      SELECT m.cid, list(round(m.mval / nullif(mn{t}.n, 0), {r}) ORDER BY m.idx) AS c
      FROM mean{t} m JOIN mn{t} ON m.cid = mn{t}.cid
      GROUP BY m.cid, mn{t}.n
    )"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (
      SELECT c{t - 1}.cid,
             CASE WHEN cm{t}.c IS NULL
                    OR list_dot_product(cm{t}.c, cm{t}.c) IS NULL
                    OR list_dot_product(cm{t}.c, cm{t}.c) = 0
                  THEN c{t - 1}.c ELSE cm{t}.c END AS c
      FROM c{t - 1} LEFT JOIN cm{t} ON c{t - 1}.cid = cm{t}.cid
    )"""
        )
    parts.append(f"piv AS MATERIALIZED (SELECT cid AS pid, c AS pe FROM c{n_iter})")
    return ",\n    ".join(parts)


@register(
    "x_ann_ivf_topk",
    _ivf_oracle_sql(_IVF_FIXED_PIV),
    survey_ids=("EXT-similarity",),
    doc="IVF-flat ANN: fixed deterministic pivots as the coarse quantizer "
    "(production swaps in trained centroids; plumbing identical), corpus "
    "assigned to max-cosine cells, queries probe their 2 nearest of 8 "
    "cells, exact float64 re-rank within probed cells — candidates per "
    "query ~ corpus * n_probe/n_cells; the oracle replays the identical "
    "cell structure in plain SQL",
)
def x_ann_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_cells=8, n_probe=2
    )


@register(
    "x_ann_ivf_trained_topk",
    _ivf_oracle_sql(_lloyd_centroids_cte(n_cells=8, n_iter=2)),
    survey_ids=("EXT-similarity",),
    doc="IVF-flat ANN with a TRAINED coarse quantizer — deterministic "
    "spherical k-means (maximin seeding + 2 fixed Lloyd iterations, "
    "centroids rounded each step so both engines stay bit-aligned): same "
    "probe/re-rank plumbing as x_ann_ivf_topk, data-adaptive cells buy "
    "higher recall at the same n_probe/n_cells candidate budget (asserted "
    "in tests); the oracle replays seeding + training as unrolled CTEs, "
    "making even the trained tier fully value-hash-checked",
)
def x_ann_ivf_trained(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk_trained(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_cells=8, n_probe=2,
        n_iter=2, centroids=_centroids_cached(spark, sf_dir),
    )


def _pq_oracle_sql(
    m: int = 4,
    k_sub: int = 16,
    dim: int = 64,
    n_cand: int = 50,
    cb_cte: str | None = None,
) -> str:
    """DuckDB replay of ``similarity.pq_topk``: same fixed codebooks (the
    k_sub lowest-id normalized vectors' subvectors, rounded 6dp), same
    argmin-L2 encode with lowest-code tie-break, same ADC candidate rank
    (sum of squared subspace ``list_distance``s — the Spark side mirrors
    list_distance exactly: sequential squared-diff sum, one sqrt), same
    exact-cosine re-rank of the top ``n_cand``. ``cb_cte`` swaps in an
    alternative chain producing ``cb (code, c0..c{m-1})`` — the unrolled
    per-subspace-Lloyd chain for x_ann_pq_trained_topk."""
    d = dim // m
    sub_cols = ", ".join(
        f"u[{mi * d + 1}:{(mi + 1) * d}] AS s{mi}" for mi in range(m)
    )
    cb_cols = ", ".join(
        f"list_transform(s{mi}, x -> round(x, 6)) AS c{mi}" for mi in range(m)
    )
    enc_ctes = ",\n    ".join(
        f"""e{mi} AS MATERIALIZED (
      SELECT vec_id, code FROM (
        SELECT s.vec_id, c.code,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY list_distance(s.s{mi}, c.c{mi}) ASC, c.code ASC
               ) AS rn
        FROM sub s CROSS JOIN cb c)
      WHERE rn = 1
    )"""
        for mi in range(m)
    )
    enc_joins = " ".join(f"JOIN e{mi} USING (vec_id)" for mi in range(1, m))
    code_cols = ", ".join(f"e{mi}.code AS code{mi}" for mi in range(m))
    cb_joins = " ".join(
        f"JOIN cb c{mi} ON c{mi}.code = n.code{mi}" for mi in range(m)
    )
    d_cols = ", ".join(
        f"list_distance(q.s{mi}, c{mi}.c{mi}) AS d{mi}" for mi in range(m)
    )
    approx = " + ".join(f"d{mi} * d{mi}" for mi in range(m))
    default_cb_cte = f"""cb AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, {cb_cols}
      FROM (SELECT * FROM sub ORDER BY vec_id LIMIT {k_sub})
    )"""
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    nv AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(e, e)) = 0 THEN e
                  ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
             END AS u
      FROM v
    ),
    sub AS MATERIALIZED (SELECT vec_id, {sub_cols} FROM nv),
    {cb_cte or default_cb_cte},
    {enc_ctes},
    enc AS MATERIALIZED (
      SELECT e0.vec_id, {code_cols} FROM e0 {enc_joins}
    ),
    q AS (SELECT * FROM sub WHERE vec_id < 5),
    adc AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {d_cols}
      FROM enc n CROSS JOIN q {cb_joins}
      WHERE n.vec_id <> q.vec_id
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY {approx} ASC, neighbor_id ASC
               ) AS crn
        FROM adc)
      WHERE crn <= {n_cand}
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(qv.e, nn.e) AS sim
      FROM cand c
      JOIN v qv ON c.query_id = qv.vec_id
      JOIN v nn ON c.neighbor_id = nn.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 10
    """


@register(
    "x_ann_pq_topk",
    _pq_oracle_sql(),
    survey_ids=("EXT-similarity",),
    doc="product-quantization ANN: corpus encoded as m=4 one-byte codes "
    "(argmin-L2 against fixed codebooks from the 16 lowest-id normalized "
    "vectors — deterministic, like the IVF fixed-pivot tier; trained "
    "per-subspace k-means is the production swap-in), ADC candidate scan "
    "via per-query distance-table lookups (codes are 64x smaller than the "
    "vectors — the memory-bound tier: at 100 TB of embeddings the code "
    "table is ~1.6 TB and streams from page cache), exact cosine re-rank "
    "of the top 50; the oracle replays encode + ADC + re-rank exactly",
)
def x_ann_pq(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, m=4, k_sub=16, n_candidates=50
    )


def _pq_lloyd_cb_cte(
    m: int = 4, k_sub: int = 8, n_iter: int = 2, round_dp: int = 6,
    oversample: int = 5,
) -> str:
    """Unrolled-CTE DuckDB replay of ``similarity.pq_codebooks_trained``:
    long-form (vec_id, sid, su) subvectors, oversampled-pool maximin L2
    seeding from the lowest-id vector (the pool is the subvectors of the
    ``oversample * k_sub`` lowest-md5(vec_id) vectors — the engine's
    one-job candidate draw, r15 verdict #5), ``n_iter`` Lloyd iterations
    with rounded plain means — every subspace trained in the same CTEs
    (grouped by sid), so the chain length is k_sub + n_iter deep,
    independent of m. Produces the ``cb (code, c0..c{m-1})`` relation
    the shared PQ encode/ADC oracle consumes (it assumes the ``sub``
    CTE is already defined)."""
    r = round_dp
    subl_union = "\n      UNION ALL ".join(
        f"SELECT vec_id, {mi} AS sid, s{mi} AS su FROM sub" for mi in range(m)
    )
    parts = [
        f"""subl AS MATERIALIZED (
      {subl_union}
    )""",
        f"""ps0 AS MATERIALIZED (
      SELECT sid, 0 AS cid, list_transform(su, x -> round(x, {r})) AS c
      FROM subl WHERE vec_id = (SELECT min(vec_id) FROM sub)
    )""",
        f"""ppool AS MATERIALIZED (
      SELECT vec_id FROM sub
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {oversample * k_sub}
    )""",
        """pm0 AS MATERIALIZED (
      SELECT l.sid, l.vec_id, l.su, list_distance(l.su, s.c) AS best
      FROM subl l JOIN ppool USING (vec_id) JOIN ps0 s ON l.sid = s.sid
    )""",
    ]
    for j in range(1, k_sub):
        parts.append(
            f"""pp{j} AS MATERIALIZED (
      SELECT sid, vec_id FROM (
        SELECT sid, vec_id, row_number() OVER (
          PARTITION BY sid ORDER BY best DESC, vec_id ASC) AS rn
        FROM pm{j - 1}) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""ps{j} AS MATERIALIZED (
      SELECT l.sid, {j} AS cid, list_transform(l.su, x -> round(x, {r})) AS c
      FROM subl l JOIN pp{j} p ON l.sid = p.sid AND l.vec_id = p.vec_id
    )"""
        )
        if j < k_sub - 1:
            parts.append(
                f"""pm{j} AS MATERIALIZED (
      SELECT m.sid, m.vec_id, m.su,
             least(m.best, list_distance(m.su, s.c)) AS best
      FROM pm{j - 1} m JOIN ps{j} s ON m.sid = s.sid
    )"""
            )
    seeds_union = "\n      UNION ALL ".join(
        f"SELECT sid, cid, c FROM ps{j}" for j in range(k_sub)
    )
    parts.append(f"""pc0 AS MATERIALIZED (
      {seeds_union}
    )""")
    for t in range(1, n_iter + 1):
        parts.append(
            f"""pa{t} AS MATERIALIZED (
      SELECT sid, vec_id, su, cid FROM (
        SELECT l.sid, l.vec_id, l.su, c.cid,
               row_number() OVER (
                 PARTITION BY l.sid, l.vec_id
                 ORDER BY list_distance(l.su, c.c) ASC, c.cid ASC) AS rn
        FROM subl l JOIN pc{t - 1} c ON l.sid = c.sid)
      WHERE rn = 1
    )"""
        )
        parts.append(
            f"""pmean{t} AS MATERIALIZED (
      SELECT sid, cid, idx, round(avg(val), {r}) AS mval FROM (
        SELECT sid, cid, unnest(range(len(su))) AS idx, unnest(su) AS val
        FROM pa{t})
      GROUP BY sid, cid, idx
    )"""
        )
        parts.append(
            f"""pcm{t} AS MATERIALIZED (
      SELECT sid, cid, list(mval ORDER BY idx) AS c
      FROM pmean{t} GROUP BY sid, cid
    )"""
        )
        parts.append(
            f"""pc{t} AS MATERIALIZED (
      SELECT p.sid, p.cid, CASE WHEN n.c IS NULL THEN p.c ELSE n.c END AS c
      FROM pc{t - 1} p LEFT JOIN pcm{t} n
        ON p.sid = n.sid AND p.cid = n.cid
    )"""
        )
    cb_joins = " ".join(
        f"JOIN (SELECT cid, c FROM pc{n_iter} WHERE sid = {mi}) t{mi} USING (cid)"
        for mi in range(1, m)
    )
    cb_cols = ", ".join(f"t{mi}.c AS c{mi}" for mi in range(m))
    parts.append(
        f"""cb AS MATERIALIZED (
      SELECT t0.cid AS code, {cb_cols}
      FROM (SELECT cid, c FROM pc{n_iter} WHERE sid = 0) t0 {cb_joins}
    )"""
    )
    return ",\n    ".join(parts)


@register(
    "x_ann_pq_trained_topk",
    _pq_oracle_sql(k_sub=8, cb_cte=_pq_lloyd_cb_cte(m=4, k_sub=8, n_iter=2)),
    survey_ids=("EXT-similarity",),
    doc="PQ ANN with TRAINED codebooks — deterministic per-subspace L2 "
    "k-means (maximin seeding from the lowest-id vector, 2 fixed Lloyd "
    "iterations, codewords rounded each step so both engines stay "
    "bit-aligned; all 4 subspaces train in the same jobs over a long-form "
    "(vec_id, subspace, subvector) relation): identical encode/ADC/"
    "re-rank plumbing as x_ann_pq_topk, but data-adaptive codewords tile "
    "each subspace where the vectors live, buying lower quantization "
    "error at the same m x k_sub code budget; the oracle replays seeding "
    "+ training as unrolled CTEs, so even the trained tier is fully "
    "value-hash-checked",
)
def x_ann_pq_trained(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_topk_trained(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        m=4,
        k_sub=8,
        n_candidates=50,
        n_iter=2,
    )


@register(
    "x_dedup_jaccard_3gram",
    """
    WITH base AS (
      SELECT doc_id, string_split(text,' ') AS w FROM documents
    ),
    sets AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
               END) AS s
      FROM base
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.s,b.s))*1.0
                 / len(list_distinct(list_concat(a.s,b.s))), 4) AS jaccard_sim
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s,b.s))*1.0
          / len(list_distinct(list_concat(a.s,b.s))) >= 0.8
    """,
    survey_ids=("EXT-dedup",),
    doc="word-3-gram (shingle) Jaccard >= 0.8 near-dup pairs: the shingled "
    "variant the near-dup literature minhashes — order-sensitive where "
    "token-set Jaccard is not; same prefix-filtered inverted-index "
    "architecture, shingling fused into codegen; oracle is brute-force "
    "O(n^2) over the identical shingle sets",
)
def x_dedup_jaccard_3gram(spark, sf_dir):
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8, ngram=3)


@register(
    "x_text_repetition",
    """
    WITH base AS (
      SELECT doc_id, string_split(text,' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) < 2 THEN []
                  ELSE list_transform(range(1, len(w)),
                                      i -> array_to_string(w[i:i+1], ' '))
             END AS g2,
             CASE WHEN len(w) < 3 THEN []
                  ELSE list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))
             END AS g3
      FROM base
    ),
    dup3 AS (
      SELECT doc_id,
             CASE WHEN len(g3) > 0
                  THEN round(1 - len(list_distinct(g3))*1.0/len(g3), 4)
                  ELSE 0.0 END AS dup_3gram_frac
      FROM g
    ),
    cnt AS (
      SELECT doc_id, gram, count(*) AS c
      FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
      GROUP BY doc_id, gram
    ),
    top2 AS (
      SELECT doc_id, round(max(c)*1.0/sum(c), 4) AS top_2gram_frac
      FROM cnt GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(t.top_2gram_frac, 0.0) AS top_2gram_frac,
           d.dup_3gram_frac
    FROM dup3 d LEFT JOIN top2 t ON d.doc_id = t.doc_id
    """,
    survey_ids=("EXT-text",),
    doc="Gopher-style repetition filters: most-frequent-2-gram fraction + "
    "duplicate-3-gram fraction per document — the standard pre-training "
    "boilerplate/degeneracy signals; 3-gram part is shuffle-free array "
    "expressions, 2-gram mode is two slim partial-aggregated shuffles",
)
def x_text_repetition(spark, sf_dir):
    return text.repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "x_pipeline_seq_packing",
    """
    WITH RECURSIVE base AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ord AS (
      SELECT doc_id, shard, n_tokens,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM base
    ),
    rec AS (
      SELECT shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_id, n_tokens AS fill
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN r.fill + o.n_tokens <= 128 THEN r.seq_id
                  ELSE r.seq_id + 1 END,
             CASE WHEN r.fill + o.n_tokens <= 128 THEN r.fill + o.n_tokens
                  ELSE o.n_tokens END
      FROM rec r JOIN ord o ON o.shard = r.shard AND o.rn = r.rn + 1
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq_id, n_tokens FROM rec
    """,
    survey_ids=("EXT-text",),
    doc="sequence packing: documents greedily packed in doc_id order into "
    "128-token training sequences, sharded by doc_id % 8 so shards pack "
    "independently in parallel (the parallelism unit at scale; only ids + "
    "token counts ride the shuffle, never text). Packing is inherently "
    "sequential per shard — the one corpus-prep op that cannot be a window "
    "or join — so it is an Arrow-batched applyInPandas fold per shard; the "
    "fixed order makes the fold deterministic, and the oracle replays it "
    "with a recursive CTE",
)
def x_pipeline_seq_packing(spark, sf_dir):
    return packing.pack_sequences(
        _t(spark, sf_dir, "documents"), max_tokens=128, n_shards=8
    )


@register(
    "x_pipeline_corpus_prep",
    """
    WITH t AS (
      SELECT doc_id, text, lang,
             len(string_split(text,' ')) AS n,
             list_distinct(string_split(text,' ')) AS d
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text, lang,
             round(least(1.0,
                   (len(d)*1.0/n)*0.5
                   + (len(list_intersect(d,
                      ['the','a','an','and','or','of','to','in','is','it']))*1.0
                      / len(d))*0.2
                   + least((length(text)-(n-1))*1.0/n/8, 1.0)*0.3), 4)
               AS quality_score,
             CAST(n AS BIGINT) AS n_tokens
      FROM t
    ),
    filtered AS (
      SELECT * FROM scored
      WHERE quality_score >= 0.5 AND lang = 'en' AND n_tokens >= 10
    )
    SELECT min(doc_id) AS doc_id,
           CAST(count(*) AS BIGINT) AS dup_count,
           round(min(quality_score), 4) AS quality_score,
           min(n_tokens) AS n_tokens
    FROM filtered GROUP BY text
    """,
    survey_ids=("EXT-text", "EXT-dedup"),
    doc="composite corpus-prep pipeline (the realistic LLM pre-training "
    "chain): quality-score filter >= 0.5 -> declared-language filter "
    "'en' -> min-length filter -> exact dedup keeping the lowest doc_id "
    "per distinct text; one scan, narrow filters, one dedup shuffle — "
    "composition of the engine's text + dedup operators in a single plan",
)
def x_pipeline_corpus_prep(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scored = text.quality_score(docs).select("doc_id", "quality_score")
    stats = text.token_stats(docs).select("doc_id", "n_tokens")
    enriched = (
        docs.join(scored, "doc_id")
        .join(stats, "doc_id")
        .filter(
            (F.col("quality_score") >= 0.5)
            & (F.col("lang") == "en")
            & (F.col("n_tokens") >= 10)
        )
    )
    return (
        enriched.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.round(F.min("quality_score"), 4).alias("quality_score"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("text")
        .select("doc_id", "dup_count", "quality_score", "n_tokens")
    )


@register(
    "x_embedding_quantize",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS q8_scale
      FROM v
    )
    SELECT vec_id, round(q8_scale, 6) AS q8_scale,
           array_to_string(
             CASE WHEN q8_scale = 0
                  THEN list_transform(e, x -> CAST(x AS TINYINT))
                  ELSE list_transform(e, x -> CAST(round(x / q8_scale) AS TINYINT))
             END, ',') AS embedding_q8
    FROM s
    """,
    survey_ids=("EXT-similarity",),
    doc="symmetric per-vector int8 quantization (scale = max|x|/127, kept "
    "for dequantization): 4x embedding storage reduction, pure "
    "expressions; oracle replays the same arithmetic; the int8 vector is "
    "emitted comma-joined so the output schema stays atomic for the "
    "driver canonicalizer",
)
def x_embedding_quantize(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(emb)
    return q.select(
        "vec_id",
        F.round("q8_scale", 6).alias("q8_scale"),
        F.array_join(
            F.transform(F.col("embedding_q8"), lambda x: x.cast("string")), ","
        ).alias("embedding_q8"),
    )


@register(
    "x_corpus_stats",
    """
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text,' ')) AS n_tokens,
             length(text) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_tokens), 4) AS avg_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY lang
    """,
    survey_ids=("EXT-text", "A1"),
    doc="corpus-level reporting rollup per language: doc/token/char "
    "totals and token-length stats — the dataset-card numbers every "
    "training-data pipeline publishes; one partial-aggregated shuffle",
)
def x_corpus_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        d.select(
            "lang",
            F.size(toks).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


@register(
    "x_text_bm25",
    """
    WITH tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM tok
      WHERE term IN ('spark', 'query', 'join') GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    corpus AS (
      SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
      FROM documents
    )
    SELECT t.doc_id,
           round(sum(
             ln(1 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
             * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / c.avgdl))
           ), 4) AS bm25
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN corpus c
    GROUP BY t.doc_id
    """,
    survey_ids=("EXT-text",),
    doc="Okapi BM25 (k1=1.2, b=0.75) of every doc against a 3-term query "
    "— corpus curation by topic relevance; term filter sits right after "
    "the tokenizing explode (map-side), df/N/avgdl are broadcast "
    "aggregates, the only per-doc shuffle carries matched (doc,term,tf) "
    "rows",
)
def x_text_bm25(spark, sf_dir):
    return text.bm25_scores(
        _t(spark, sf_dir, "documents"), ["spark", "query", "join"]
    )


@register(
    "x_events_funnel",
    """
    WITH e AS (
      SELECT user_id AS u, event_type, CAST(ts AS TIMESTAMP) AS t FROM events
    ),
    s0 AS (
      SELECT u, min(t) AS t0 FROM e WHERE event_type = 'signup' GROUP BY u
    ),
    s1 AS (
      SELECT e.u, s0.t0, min(e.t) AS t_prev
      FROM e JOIN s0 ON e.u = s0.u
      WHERE e.event_type = 'view' AND e.t > s0.t0
        AND e.t <= s0.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s0.t0
    ),
    s2 AS (
      SELECT e.u, s1.t0, min(e.t) AS t_prev
      FROM e JOIN s1 ON e.u = s1.u
      WHERE e.event_type = 'purchase' AND e.t > s1.t_prev
        AND e.t <= s1.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s1.t0
    )
    SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step, count(*) AS users FROM s0
    UNION ALL
    SELECT CAST(1 AS INT), 'view', count(*) FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), 'purchase', count(*) FROM s2
    """,
    survey_ids=("EXT-analytics", "A1"),
    doc="ordered signup->view->purchase funnel within 7 days of signup; "
    "greedy earliest-event-per-step is exact for existence, every shuffle "
    "keys on user_id so the exchanges reuse one partitioning, and each "
    "step's event-type predicate pushes to the parquet scan",
)
def x_events_funnel(spark, sf_dir):
    return relational.funnel(
        _t(spark, sf_dir, "events"), ["signup", "view", "purchase"]
    )


@register(
    "x_events_max_drawdown",
    """
    WITH p AS (
      SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events
    )
    SELECT user_id, round(max(peak - value), 4) AS max_drawdown
    FROM p GROUP BY user_id
    """,
    survey_ids=("EXT-analytics", "§2.6"),
    doc="largest peak-to-trough value drop per user (running-max window "
    "minus current, then a per-key max): one key-partitioned ordering "
    "window whose per-key rollup reuses the same exchange; event_id "
    "tiebreak makes equal-timestamp ordering engine-deterministic",
)
def x_events_max_drawdown(spark, sf_dir):
    return relational.max_drawdown(_t(spark, sf_dir, "events"))


@register(
    "x_events_anomaly_zscore",
    """
    WITH s0 AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    ),
    s AS (SELECT * FROM s0 WHERE sd > 0)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.m) / s.sd, 4) AS zscore
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) >= 1.8
    """,
    survey_ids=("EXT-analytics", "K5", "K6"),
    doc="per-group z-score outliers (|z| >= 1.8 sample stddevs of the "
    "event type): the adaptive statistical feed for the alert sinks "
    "(the reference alerts on a fixed rating cut); group moments are one "
    "map-side-combined aggregate broadcast into the scoring join — the "
    "fact stream is scanned once and never shuffled",
)
def x_events_anomaly_zscore(spark, sf_dir):
    return relational.zscore_outliers(_t(spark, sf_dir, "events"))


@register(
    "x_events_sessionize",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
    m AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                       OR CAST(floor(epoch(t)) AS BIGINT)
                          - CAST(floor(epoch(lag(t) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    s AS (
      SELECT user_id, t,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM m
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(t) AS session_start, max(t) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_idx
    """,
    survey_ids=("EXT-analytics", "T4"),
    doc="gap-based (30 min) batch sessionization with stable per-user "
    "session indexes — the batch twin of the T4 session_window; one "
    "user-keyed shuffle feeds the lag window, the running sum, and the "
    "per-session rollup (partitioning reused, no second exchange)",
)
def x_events_sessionize(spark, sf_dir):
    return relational.sessionize(_t(spark, sf_dir, "events"), gap_s=1800)


@register(
    "x_events_cohort_retention",
    """
    WITH c AS (
      SELECT user_id AS u, min(CAST(ts AS DATE)) AS cohort_date
      FROM events WHERE event_type = 'signup' GROUP BY u
    ),
    a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
    j AS (
      SELECT DISTINCT cohort_date,
             CAST(floor(date_diff('day', cohort_date, d) / 7) AS BIGINT)
               AS week_offset,
             u
      FROM a JOIN c USING (u)
      WHERE date_diff('day', cohort_date, d) >= 0
    )
    SELECT cohort_date, week_offset, count(*) AS active_users
    FROM j GROUP BY cohort_date, week_offset
    """,
    survey_ids=("EXT-analytics",),
    doc="retention triangle: day-level cohorts by first signup, active "
    "users per floor(days/7) offset; integer day arithmetic avoids "
    "engine week-truncation drift, and every shuffle before the terminal "
    "rollup is keyed on the user",
)
def x_events_cohort_retention(spark, sf_dir):
    return relational.cohort_retention(_t(spark, sf_dir, "events"))


@register(
    "x_pipeline_hash_split",
    """
    SELECT doc_id, lang,
           CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                     / 4294967296.0 < 0.9 THEN 'train'
                WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                     / 4294967296.0 < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    survey_ids=("EXT-pipeline",),
    doc="deterministic 90/5/5 train/val/test split via md5(salt:id) "
    "thresholds — reproducible across runs/engines/partitionings and "
    "auditable per row; a stateless map-side expression (contrast "
    "rand(), which is partitioning-dependent)",
)
def x_pipeline_hash_split(spark, sf_dir):
    return text.hash_split(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "split"
    )


# vocab CTEs shared by the vocab and encode oracles
_VOCAB_CTES = """counts AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (
      SELECT token, count(*) AS token_count FROM counts GROUP BY token
    ),
    v AS (
      SELECT token, CAST(token_count AS BIGINT) AS token_count,
             CAST(row_number() OVER (ORDER BY token_count DESC, token)
                  AS BIGINT) AS token_id
      FROM vocab
    )"""


@register(
    "x_pipeline_vocab",
    f"""
    WITH {_VOCAB_CTES}
    SELECT token, token_count, token_id FROM v
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="frequency-ranked vocabulary (count desc, token asc — a "
    "deterministic total order): map-side-combined token counting over "
    "the corpus, then a rank window over the vocab-sized aggregate only",
)
def x_pipeline_vocab(spark, sf_dir):
    return text.build_vocab(_t(spark, sf_dir, "documents")).select(
        "token", F.col("token_count").cast("long").alias("token_count"), "token_id"
    )


@register(
    "x_text_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    lm AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM lm)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln((COALESCE(l.c, 0) + 1.0)::DOUBLE
                        / (tot.total + tot.vocab)::DOUBLE)), 4)
             AS mean_logprob
    FROM tok t LEFT JOIN lm l USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    survey_ids=("EXT-text",),
    doc="mean unigram log-prob per doc under an add-one-smoothed corpus "
    "LM — the deterministic stand-in for CCNet's KenLM perplexity "
    "filter; vocab-sized LM broadcast into a map-side token join, one "
    "doc-keyed shuffle of slim rows",
)
def x_text_unigram_logprob(spark, sf_dir):
    return text.unigram_logprob(_t(spark, sf_dir, "documents"))


@register(
    "x_text_redact_pii",
    """
    WITH s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS n_email,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    s2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn,
             regexp_replace(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t2
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, n_email, n_ssn,
             len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
             regexp_replace(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t3
      FROM s2
    )
    SELECT doc_id, t3 AS text_redacted, n_email, n_ssn, n_phone FROM s3
    """,
    survey_ids=("EXT-text", "EXT-pipeline"),
    doc="PII scrub: email/SSN/phone spans replaced with typed tags plus "
    "per-doc redaction counts; pure regexp_replace chains (ASCII "
    "patterns so Java and RE2 agree), one map stage, zero shuffles — "
    "SSN applied before phone because the shapes overlap",
)
def x_text_redact_pii(spark, sf_dir):
    return text.redact_pii(_t(spark, sf_dir, "documents")).select(
        "doc_id", "text_redacted", "n_email", "n_ssn", "n_phone"
    )


@register(
    "x_pipeline_encode",
    f"""
    WITH {_VOCAB_CTES},
    base AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    tp AS (
      SELECT doc_id, unnest(range(1, len(arr) + 1)) AS pos, arr FROM base
    ),
    flat AS (SELECT doc_id, pos, arr[pos] AS tok FROM tp),
    enc AS (
      SELECT f.doc_id, f.pos, v.token_id FROM flat f
      JOIN v ON f.tok = v.token
    )
    SELECT doc_id,
           string_agg(CAST(token_id AS VARCHAR), ' ' ORDER BY pos)
             AS token_ids,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM enc GROUP BY doc_id
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="order-preserving token-id encoding of every document (the "
    "tokenize->encode step of LLM data prep): posexplode map-side, "
    "broadcast vocab lookup, one doc-keyed shuffle of (pos, id) pairs "
    "re-assembled with array_sort",
)
def x_pipeline_encode(spark, sf_dir):
    # the id sequence is serialized for the driver comparator (its pandas
    # canonicalization cannot sort list cells — see
    # test_no_complex_types_in_output_schema); the operator itself returns
    # a real array<long> column
    enc = text.encode_documents(_t(spark, sf_dir, "documents"))
    return enc.select(
        "doc_id",
        F.array_join("token_ids", " ").alias("token_ids"),
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# skew mitigation as a first-class query
# ---------------------------------------------------------------------------


@register(
    "x_salted_hotkey_collect",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           array_to_string(list_sort(list(event_id)), ',') AS event_ids
    FROM events GROUP BY event_type
    """,
    survey_ids=("EXT-skew", "A1", "A2"),
    doc="hot-key aggregation through skew.salted_agg: events has only 5 "
    "event_type values, so every group is a celebrity key whose "
    "collect_list state would otherwise funnel through one reducer. "
    "Phase 1 aggregates per (event_type, salt) spreading each key over "
    "16 reducers; phase 2 merges the 16 partials per key (lists merge by "
    "flatten, counts by sum). sort_array makes the flattened order "
    "deterministic for the oracle hash.",
)
def x_salted_hotkey_collect(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators.skew import salted_agg

    e = _t(spark, sf_dir, "events")
    out = salted_agg(
        e,
        key="event_type",
        agg_exprs={
            "event_count": "count(*)",
            "event_ids_raw": "collect_list(event_id)",
        },
        unique_col="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("event_count").cast("long").alias("event_count"),
        F.array_join(F.sort_array("event_ids_raw"), ",").alias("event_ids"),
    )


# ---------------------------------------------------------------------------
# train/eval contamination + distinct sketches
# ---------------------------------------------------------------------------


@register(
    "x_contamination_ngram",
    """
    WITH base AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 8 THEN [array_to_string(w,' ')]
                    ELSE list_transform(range(1, len(w) - 6),
                                        i -> array_to_string(w[i:i+7], ' '))
               END) AS g
      FROM base),
    eval_g AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 20 <> 0),
    hits AS (SELECT c.doc_id, count(*) AS n_contaminated
             FROM corpus c JOIN eval_g e USING (gram) GROUP BY 1),
    tot AS (SELECT doc_id, len(g) AS n_grams FROM grams WHERE doc_id % 20 <> 0)
    SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           round(coalesce(h.n_contaminated, 0) * 1.0 / t.n_grams, 4)
             AS contamination_rate
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
    survey_ids=("EXT-text",),
    doc="train/eval contamination check (text.contamination): docs with "
    "doc_id % 20 == 0 stand in as the eval set; every remaining corpus doc "
    "reports the fraction of its distinct word 8-grams (the PaLM "
    "decontamination n) found anywhere in the eval set. Eval-gram set is "
    "broadcast (eval benchmarks are MBs; the corpus is the 100 TB side); "
    "corpus shingles explode map-side into a broadcast left-semi join and "
    "only slim (doc_id, count) rows shuffle. Zero-rate rows are emitted so "
    "a clean corpus is positively attested.",
)
def x_contamination_ngram(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    eval_docs = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return text.contamination(corpus, eval_docs, n=8)


@register(
    "x_text_repeated_spans",
    """
    WITH base AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    spans AS (
      SELECT doc_id, unnest(
        CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 6),
                                 i -> array_to_string(w[i:i+7], ' '))
        END) AS gram
      FROM base),
    shared AS (
      SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS d FROM spans GROUP BY gram)
      WHERE d >= 2),
    flag AS (
      SELECT s.doc_id, CASE WHEN sh.gram IS NULL THEN 0 ELSE 1 END AS shared
      FROM spans s LEFT JOIN shared sh USING (gram))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(shared) AS BIGINT) AS n_shared_spans,
           round(sum(shared) * 1.0 / count(*), 4) AS shared_frac
    FROM flag GROUP BY doc_id
    """,
    survey_ids=("EXT-text", "EXT-dedup"),
    doc="intra-corpus repeated-span coverage (the Lee et al. exact-"
    "substring-dedup signal): per doc, the fraction of word 8-gram "
    "positions whose shingle occurs in ANOTHER doc — boilerplate "
    "detection below the whole-doc near-dup threshold; shared grams come "
    "from one map-side-combined distinct-doc count and flow back via an "
    "equi-join (hot boilerplate grams = AQE skew-join fodder)",
)
def x_text_repeated_spans(spark, sf_dir):
    return text.repeated_ngram_spans(_t(spark, sf_dir, "documents"), n=8)


@register(
    "x_pipeline_stratified_sample",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('strata:' || CAST(doc_id AS VARCHAR))) AS rn
      FROM documents) WHERE rn <= 20
    """,
    survey_ids=("EXT-pipeline",),
    doc="exactly-20-per-language deterministic stratified sample ranked "
    "by md5(salt:id) — the eval-set construction primitive; exact quotas "
    "and reproducible membership, unlike the probabilistic sampleBy; one "
    "stratum-keyed shuffle for the ranking window",
)
def x_pipeline_stratified_sample(spark, sf_dir):
    return text.stratified_fixed_n(
        _t(spark, sf_dir, "documents"), "lang", 20
    ).select("doc_id", "lang", "source")


@register(
    "x_sketch_kmv_distinct",
    """
    WITH vals AS (SELECT DISTINCT event_type AS grp, user_id AS v FROM events
                  WHERE user_id IS NOT NULL),
    hashed AS (SELECT grp, md5(CAST(v AS VARCHAR)) AS h FROM vals),
    topk AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashed)
      WHERE rn <= 64),
    pg AS (SELECT grp, count(*) AS n_sketch, max(h) AS hk FROM topk GROUP BY grp),
    mtop AS (SELECT h FROM (SELECT DISTINCT h FROM topk) ORDER BY h LIMIT 64),
    mg AS (SELECT '__all__' AS grp, count(*) AS n_sketch, max(h) AS hk FROM mtop),
    sk AS (SELECT * FROM pg UNION ALL SELECT * FROM mg),
    ex AS (
      SELECT grp, count(*) AS n_exact FROM vals GROUP BY grp
      UNION ALL
      SELECT '__all__', count(DISTINCT v) FROM vals),
    est AS (
      SELECT grp, n_sketch,
             CAST(round(CASE WHEN n_sketch < 64 THEN n_sketch * 1.0
                  ELSE 63.0 / (('0x' || substr(hk, 1, 15))::UBIGINT
                               / power(16, 15))
                  END) AS BIGINT) AS kmv_estimate
      FROM sk)
    SELECT e.grp AS grp, CAST(n_sketch AS BIGINT) AS n_sketch, kmv_estimate,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           round((kmv_estimate - x.n_exact) * 1.0 / x.n_exact, 4) AS rel_err
    FROM est e JOIN ex x ON e.grp IS NOT DISTINCT FROM x.grp
    """,
    survey_ids=("EXT-sketch", "A1"),
    doc="KMV (k-minimum-values) distinct-count sketch, k=64: distinct "
    "users per event_type plus a merged __all__ row computed by UNIONING "
    "the per-group sketches (k smallest of their deduped hashes) — the "
    "merge law that makes KMV one-pass and distributed. md5 + "
    "lexicographic order makes the sketch identical in every engine, so "
    "an approximate operator gets an exact value-hash oracle; n_exact / "
    "rel_err columns let the row attest its own accuracy. The sketch "
    "shuffle carries only (group, 32-char digest) rows.",
)
def x_sketch_kmv_distinct(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    return sketches.kmv_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id", k=64
    )


@register(
    "x_sketch_kmv_setops",
    """
    WITH tok AS (
      SELECT CAST(substr(source, 4) AS INT) % 2 AS g,
             unnest(list_distinct(string_split(text, ' '))) AS v
      FROM documents
    ),
    vals AS (SELECT DISTINCT g, v FROM tok),
    hashed AS (SELECT g, md5(v) AS h FROM vals),
    topk AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM hashed)
      WHERE rn <= 64),
    memb AS (
      SELECT h,
             max(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS in_b
      FROM topk GROUP BY h),
    u AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (ORDER BY h) AS rn FROM memb)
      WHERE rn <= 64),
    s AS (SELECT count(*) AS n_u, max(h) AS hk,
                 sum(in_a * in_b) AS n_both FROM u),
    exu AS (SELECT count(DISTINCT v) AS union_exact FROM vals),
    exi AS (SELECT count(*) AS inter_exact FROM (
      SELECT v FROM vals GROUP BY v HAVING count(DISTINCT g) = 2))
    SELECT CAST(n_u AS BIGINT) AS n_sketch_union,
           CAST(round(CASE WHEN n_u >= 64
                THEN 63.0 / (('0x' || substr(hk, 1, 15))::UBIGINT
                             / power(16, 15))
                ELSE n_u * 1.0 END) AS BIGINT) AS union_est,
           CASE WHEN n_u >= 64
                THEN CAST(round((63.0 / (('0x' || substr(hk, 1, 15))::UBIGINT
                                         / power(16, 15)))
                                * (n_both * 1.0 / n_u)) AS BIGINT)
                ELSE CAST(n_both AS BIGINT) END AS inter_est,
           round(n_both * 1.0 / n_u, 4) AS jaccard_est,
           CAST(union_exact AS BIGINT) AS union_exact,
           CAST(inter_exact AS BIGINT) AS inter_exact
    FROM s, exu, exi
    """,
    survey_ids=("EXT-sketch", "EXT-dedup", "A1"),
    bench=True,
    doc="KMV sketch SET OPERATIONS, k=64: distinct-token union, "
    "intersection and Jaccard between two corpus halves (sources split "
    "by parity) estimated from the k-minimum-value sketches alone — the "
    "cross-corpus overlap-cardinality question ('how much of source B "
    "is already in A?') answered without ever joining the full token "
    "sets. Any union-sketch element present in BOTH per-group sketches "
    "is an intersection witness, so J ~= n_both/k and |A∩B| ~= "
    "J*D_union — mergeable, one pass, sketch rows only after the "
    "distinct. Scale shape: per-group k-smallest runs as a salted local "
    "top-k then a global top-k over n_salt*k survivors, so no window "
    "ranks a full distinct-token set (operators/sketches.py::"
    "kmv_set_ops). md5 + lexicographic order + a mirrored rounded "
    "division chain make the approximate result exactly hash-checkable; "
    "exact union/intersection ride along so the row attests its own "
    "error.",
)
def x_sketch_kmv_setops(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.pmod(F.substring("source", 4, 10).cast("int"), F.lit(2)).alias("g"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("v"),
    )
    return sketches.kmv_set_ops(toks, "g", "v", ga=0, gb=1, k=64)


@register(
    "x_sketch_kmv_rollup",
    r"""
    WITH vals AS (
      SELECT DISTINCT event_type AS g1,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS g2,
             user_id AS v
      FROM events WHERE user_id IS NOT NULL
    ),
    hashed AS (SELECT g1, g2, md5(CAST(v AS VARCHAR)) AS h FROM vals),
    cell AS (
      SELECT g1, g2, h FROM (
        SELECT g1, g2, h,
               row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
        FROM hashed)
      WHERE rn <= 64),
    r1 AS (
      SELECT g1, h FROM (
        SELECT g1, h, row_number() OVER (PARTITION BY g1 ORDER BY h) AS rn
        FROM (SELECT DISTINCT g1, h FROM cell))
      WHERE rn <= 64),
    r2 AS (
      SELECT g2, h FROM (
        SELECT g2, h, row_number() OVER (PARTITION BY g2 ORDER BY h) AS rn
        FROM (SELECT DISTINCT g2, h FROM cell))
      WHERE rn <= 64),
    rall AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM cell))
      WHERE rn <= 64),
    sk AS (
      SELECT 'cell' AS gset,
             coalesce(replace(replace(replace(g1, '\', '\\'), '|', '\|'), '<', '\<'), '<null>') || '|' ||
             coalesce(replace(replace(replace(g2, '\', '\\'), '|', '\|'), '<', '\<'), '<null>') AS key,
             count(*) AS n_sketch, max(h) AS hk FROM cell GROUP BY g1, g2
      UNION ALL
      SELECT 'event_type', coalesce(replace(replace(replace(g1, '\', '\\'), '|', '\|'), '<', '\<'), '<null>'),
             count(*), max(h)
      FROM r1 GROUP BY g1
      UNION ALL
      SELECT 'day', coalesce(replace(replace(replace(g2, '\', '\\'), '|', '\|'), '<', '\<'), '<null>'),
             count(*), max(h)
      FROM r2 GROUP BY g2
      UNION ALL
      SELECT 'all', '*', count(*), max(h) FROM rall),
    ex AS (
      SELECT 'cell' AS gset,
             coalesce(replace(replace(replace(g1, '\', '\\'), '|', '\|'), '<', '\<'), '<null>') || '|' ||
             coalesce(replace(replace(replace(g2, '\', '\\'), '|', '\|'), '<', '\<'), '<null>') AS key,
             count(*) AS n_exact
      FROM vals GROUP BY g1, g2
      UNION ALL
      SELECT 'event_type', coalesce(replace(replace(replace(g1, '\', '\\'), '|', '\|'), '<', '\<'), '<null>'),
             count(DISTINCT v)
      FROM vals GROUP BY g1
      UNION ALL
      SELECT 'day', coalesce(replace(replace(replace(g2, '\', '\\'), '|', '\|'), '<', '\<'), '<null>'),
             count(DISTINCT v)
      FROM vals GROUP BY g2
      UNION ALL
      SELECT 'all', '*', count(DISTINCT v) FROM vals)
    SELECT s.gset, s.key, CAST(s.n_sketch AS BIGINT) AS n_sketch,
           CAST(round(CASE WHEN s.n_sketch < 64 THEN s.n_sketch * 1.0
                ELSE 63.0 / (('0x' || substr(s.hk, 1, 15))::UBIGINT
                             / power(16, 15)) END) AS BIGINT) AS kmv_estimate,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           round((kmv_estimate - e.n_exact) * 1.0 / e.n_exact, 4) AS rel_err
    FROM sk s JOIN ex e ON s.gset = e.gset AND s.key = e.key
    """,
    survey_ids=("EXT-sketch", "A1", "A4", "A6"),
    bench=True,
    doc="grouping-sets distinct counts from ONE raw pass: a KMV sketch "
    "per (event_type, day) base cell, then the per-event_type, per-day "
    "and grand-total sketches derived by MERGING cell sketches (k "
    "smallest of their deduped union) — the cascading-rollup shape "
    "(a_cascade_rollup) applied to a mergeable sketch, so every coarser "
    "level reads <= k rows per base cell and the raw table is scanned "
    "exactly once however many grouping sets are reported. Base-cell AND "
    "merge-level k-smallest are salted two-phase (operators/sketches.py::"
    "kmv_rollup — no window ever ranks #cells x k rows in one task); "
    "md5 + lexicographic order keep all four levels exactly "
    "hash-checkable, NULL dimension values render as the '<null>' "
    "sentinel on BOTH engines with real values escaped so a literal "
    "'<null>' or '|' can never collide, and each row carries its exact "
    "count + rel_err so the sketch attests its own accuracy per "
    "grouping set.",
)
def x_sketch_kmv_rollup(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return sketches.kmv_rollup(e, ["event_type", "day"], "user_id", k=64)


@register(
    "x_sketch_quantile_grid",
    """
    WITH b AS (
      SELECT event_type AS grp, min(value) AS lo, max(value) AS hi,
             count(value) AS n
      FROM events GROUP BY 1
    ),
    binned AS (
      SELECT e.event_type AS grp, b.lo, b.hi, b.n,
             CASE WHEN b.hi = b.lo THEN 0
                  ELSE CAST(least(floor((e.value - b.lo)
                                        / ((b.hi - b.lo) / 128.0)), 127)
                            AS BIGINT)
             END AS bin
      FROM events e JOIN b ON e.event_type = b.grp
    ),
    hist AS (
      SELECT grp, lo, hi, n, bin, count(*) AS c
      FROM binned GROUP BY grp, lo, hi, n, bin
    ),
    cum AS (
      SELECT *, sum(c) OVER (PARTITION BY grp ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cumc
      FROM hist
    ),
    probed AS (SELECT *, unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE])
                         AS quantile FROM cum),
    est AS (
      SELECT grp, quantile, CAST(n AS BIGINT) AS n,
             round(lo + (bin + 0.5) * ((hi - lo) / 128.0), 4) AS qestimate
      FROM probed
      WHERE cumc >= ceil(quantile * n) AND cumc - c < ceil(quantile * n)
    ),
    ex AS (
      SELECT event_type AS grp,
             unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS quantile,
             unnest([round(quantile_cont(value, 0.5), 4),
                     round(quantile_cont(value, 0.95), 4),
                     round(quantile_cont(value, 0.99), 4)]) AS exact
      FROM events GROUP BY event_type
    )
    SELECT e.grp, e.quantile, e.n, e.qestimate, x.exact,
           round(abs(e.qestimate - x.exact), 4) AS abs_err
    FROM est e JOIN ex x USING (grp, quantile)
    """,
    survey_ids=("EXT-sketch", "A5"),
    doc="fixed-grid (128-bin equi-width) quantile sketch per event type: "
    "one bounds pass + one groupBy(grp, bin) with map-side partial sums "
    "(the histogram's element-wise merge IS the partial agg; shuffle "
    "<= groups*bins counter rows); p50/p95/p99 read off the cumulative "
    "histogram at rank ceil(q*n), error bounded by half a bin width; "
    "exact percentiles joined for the error columns on the oracle path",
)
def x_sketch_quantile_grid(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    return sketches.quantile_grid(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


@register(
    "x_sketch_countmin_freq",
    """
    WITH counts AS (SELECT user_id AS v, count(*) AS c FROM events
                    WHERE user_id IS NOT NULL GROUP BY 1),
    gridrows AS (
      SELECT v, c, i.i AS i,
             CAST(('0x' || substr(md5(i.i::VARCHAR || ':' || CAST(v AS VARCHAR)),
                                  1, 15))::UBIGINT % 64 AS BIGINT) AS j
      FROM counts, (SELECT unnest(range(0, 4)) AS i) i),
    grid AS (SELECT i, j, sum(c) AS counter FROM gridrows GROUP BY 1, 2),
    est AS (
      SELECT v, min(counter) AS cms_estimate, min(c) AS c
      FROM gridrows JOIN grid USING (i, j) GROUP BY v)
    SELECT v AS user_id, CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(c AS BIGINT) AS n_exact,
           CAST(cms_estimate - c AS BIGINT) AS overestimate
    FROM est
    """,
    survey_ids=("EXT-sketch", "A1"),
    doc="Count-Min sketch frequency estimates (4x64 grid, md5 row hashes) "
    "for per-user event counts: estimate = min over the 4 bucket counters, "
    "always >= the true count. The grid is order-independent and merges by "
    "element-wise sum — the merge IS the map-side partial aggregation of "
    "one groupBy, and only depth*width counter rows shuffle regardless of "
    "input size; the estimate side joins d bucket keys per value against "
    "the broadcast grid. Deterministic md5 bucketing makes the approximate "
    "grid engine-identical, so the oracle hash-checks it exactly; the "
    "n_exact/overestimate columns attest the one-sided error in-row.",
)
def x_sketch_countmin_freq(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    out = sketches.countmin_freq(
        _t(spark, sf_dir, "events"), "user_id", depth=4, width=64
    )
    return out.withColumnRenamed("v", "user_id")


def _semantic_dedup_oracle_sql(threshold: float = 0.4) -> str:
    """DuckDB replay of similarity.semantic_dedup_pairs: the same unrolled
    deterministic-Lloyd centroid chain as x_ann_ivf_trained_topk, then
    max-cosine cell assignment and a within-cell pair join."""
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {_lloyd_centroids_cte(n_cells=8, n_iter=2)},
    ca AS (
      SELECT v.vec_id, v.e, piv.pid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    ),
    assign AS (SELECT vec_id, e, pid AS cell FROM ca WHERE rn = 1)
    SELECT a.vec_id AS left_id, b.vec_id AS right_id, a.cell,
           round(list_cosine_similarity(a.e, b.e), 4) AS cosine_sim
    FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
    """


@register(
    "x_dedup_semantic",
    _semantic_dedup_oracle_sql(),
    survey_ids=("EXT-dedup", "EXT-similarity"),
    doc="SemDeDup-style semantic dedup (cluster-then-compare, arXiv:"
    "2303.09540): deterministic spherical k-means cells (same trainer and "
    "unrolled-CTE oracle as the trained-IVF tier), pairwise cosine ONLY "
    "within a cell — the equi-join on cell id replaces the O(n^2) "
    "all-pairs join with sum-of-|cell|^2 work; threshold 0.4 matches the "
    "labeled all-pairs baseline x_dedup_embedding so the recall trade "
    "(cross-cell pairs are deliberately missed) is inspectable by "
    "diffing the two queries' outputs",
)
def x_dedup_semantic(spark, sf_dir):
    return similarity.semantic_dedup_pairs(
        _t(spark, sf_dir, "embeddings"), n_cells=8, n_iter=2, threshold=0.4,
        centroids=_centroids_cached(spark, sf_dir),
    )


@register(
    "t_streaming_neardup",
    f"""
    WITH {_MINHASH_CTES},
    firsts AS (
      SELECT band_idx, band_val, min(doc_id) AS f FROM bands GROUP BY 1, 2
    )
    SELECT b.doc_id, CAST(min(f.f) AS BIGINT) AS dup_of
    FROM bands b
    JOIN firsts f ON b.band_idx = f.band_idx AND b.band_val = f.band_val
    WHERE f.f < b.doc_id
    GROUP BY b.doc_id
    """,
    survey_ids=("T1", "EXT-dedup", "EXT-streaming"),
    doc="ingest-time near-dup detection as a standing query: documents "
    "replayed id-ordered through a first-wins applyInPandasWithState "
    "automaton keyed by MinHash band bucket (one long of state per "
    "bucket); a doc is a duplicate iff any of its 4 band buckets was "
    "claimed by an earlier doc, and dup_of is the smallest such claimant "
    "— the streaming twin of x_dedup_minhash_lsh's banding stage, "
    "oracle-checked because id-ordered replay makes every bucket's "
    "claimant its global min id (unreferenced CTEs in the shared minhash "
    "chain are ignored by the oracle engine)",
)
def t_streaming_neardup(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    d = _t(spark, sf_dir, "documents")
    stream = srt.replayed_stream(spark, d, n_slices=4, order_col="doc_id")
    hits = srt.run_available_now(
        srt.stream_neardup_minhash(stream), output_mode="append"
    )
    return hits.groupBy("doc_id").agg(F.min("first_doc_id").alias("dup_of"))


@register(
    "x_quality_gopher_rules",
    """
    WITH t AS (
      SELECT doc_id, text,
             string_split(text,' ') AS s,
             len(string_split(text,' ')) AS n
      FROM documents
    ), m AS (
      SELECT doc_id, n,
             (length(text) - (n-1))*1.0/n AS mean_len,
             len(list_filter(s, x -> regexp_matches(x, '[A-Za-z]')))*1.0/n
               AS alpha_frac,
             len(list_filter(s, x -> x IN ('#','...')))*1.0/n AS sym_frac,
             len(list_intersect(list_distinct(s),
                 ['the','a','an','and','or','of','to','in','is','it']))
               AS n_stop
      FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           round(mean_len, 4) AS mean_word_len,
           round(alpha_frac, 4) AS alpha_frac,
           round(sym_frac, 4) AS symbol_frac,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           (n >= 10 AND n <= 100000) AS rule_word_count,
           (mean_len >= 2.0 AND mean_len <= 12.0) AS rule_mean_len,
           (alpha_frac >= 0.7) AS rule_alpha_frac,
           (sym_frac <= 0.1) AS rule_symbol_frac,
           (n_stop >= 2) AS rule_stopwords,
           ((n >= 10 AND n <= 100000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
            AND alpha_frac >= 0.7 AND sym_frac <= 0.1 AND n_stop >= 2) AS keep
    FROM m
    """,
    bench=True,
    survey_ids=("EXT-text",),
    doc="Gopher-style rule-based quality filter (arXiv:2112.11446 A1.1): "
    "per-rule boolean verdicts (word-count bounds, mean-word-length "
    "bounds, alphabetic fraction, symbol fraction, stopword floor) plus "
    "the conjunctive keep decision — the auditable sibling of "
    "x_text_quality's composite score; one map-only expression pass",
)
def x_quality_gopher(spark, sf_dir):
    return text.gopher_rules(_t(spark, sf_dir, "documents"))


@register(
    "x_dedup_semantic_keep",
    f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {_lloyd_centroids_cte(n_cells=8, n_iter=2)},
    ca AS (
      SELECT v.vec_id, v.e, piv.pid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    ),
    assign AS (SELECT vec_id, e, pid AS cell FROM ca WHERE rn = 1),
    spairs AS (
      SELECT a.vec_id AS u, b.vec_id AS w
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    ),
    sym AS (
      SELECT u, w FROM spairs UNION SELECT w, u FROM spairs
    ),
    reach AS (
      SELECT u, w FROM sym
      UNION
      SELECT r.u, s.w FROM reach r JOIN sym s ON r.w = s.u
    ),
    comp AS (
      SELECT u AS vec_id, least(u, min(w)) AS component FROM reach GROUP BY u
    )
    SELECT d.vec_id,
           COALESCE(c.component, d.vec_id) AS representative,
           CASE WHEN c.component IS NULL THEN 'unique'
                WHEN c.component = d.vec_id THEN 'representative'
                ELSE 'duplicate' END AS status
    FROM embeddings d LEFT JOIN comp c ON d.vec_id = c.vec_id
    """,
    survey_ids=("EXT-dedup", "EXT-similarity", "EXT-pipeline"),
    doc="SemDeDup's END decision: semantic near-dup pairs (cluster-then-"
    "compare, x_dedup_semantic) -> connected components over the slim "
    "pair graph -> every vector labeled unique / representative / "
    "duplicate with its kept canonical id (component min) — "
    "`status != 'duplicate'` is the semantic-dedup filter a corpus "
    "pipeline applies before training; one corpus-side left join, "
    "identical machinery to the MinHash keep list (dedup_keep_list)",
)
def x_dedup_semantic_keep(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.semantic_dedup_pairs(
        emb, n_cells=8, n_iter=2, threshold=0.4,
        centroids=_centroids_cached(spark, sf_dir),
    )
    return dedup.dedup_keep_list(
        emb.select(F.col("vec_id").alias("doc_id")),
        pairs.select(
            F.col("left_id").alias("doc_a"), F.col("right_id").alias("doc_b")
        ),
    ).select(F.col("doc_id").alias("vec_id"), "representative", "status")


def _bpe_merge_ctes(n_merges: int = 8) -> str:
    """Unrolled-CTE DuckDB replay of ``text.bpe_train_merges``: the
    distinct-word frequency table with sentinel-delimited symbol strings,
    then per merge step a weighted adjacent-pair count, a (count DESC,
    pair ASC) argmax, and a boundary-safe string replace — byte-identical
    greedy semantics to Spark's ``F.replace`` chain. Produces ``b1..bk``
    (the winning pairs) and ``w0..wk`` (the evolving word table)."""
    parts = [
        """w0 AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt,
             ' ' || array_to_string(string_split(w,''),' ') || ' </w> ' AS sym
      FROM (SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
              AS w FROM documents)
      GROUP BY w
    )"""
    ]
    for t in range(1, n_merges + 1):
        prev = t - 1
        parts.append(
            f"""p{t} AS MATERIALIZED (
      SELECT p[1] AS l, p[2] AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
        SELECT cnt, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
        FROM (SELECT cnt, string_split(trim(sym),' ') AS a FROM w{prev})
      ) GROUP BY 1, 2
    )"""
        )
        parts.append(
            f"""b{t} AS MATERIALIZED (
      SELECT l, r, c FROM p{t} ORDER BY c DESC, l ASC, r ASC LIMIT 1
    )"""
        )
        parts.append(
            f"""w{t} AS MATERIALIZED (
      SELECT w, cnt, replace(sym,
        ' ' || (SELECT l FROM b{t}) || ' ' || (SELECT r FROM b{t}) || ' ',
        ' ' || (SELECT l FROM b{t}) || (SELECT r FROM b{t}) || ' ') AS sym
      FROM w{prev}
    )"""
        )
    return ",\n    ".join(parts)


_BPE_N_MERGES = 8

_BPE_MERGES_SELECT = " UNION ALL ".join(
    f"SELECT CAST({t} AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, "
    f"c AS pair_count FROM b{t}"
    for t in range(1, _BPE_N_MERGES + 1)
)

_BPE_ENCODE_STEPS = "".join(
    f""", e{t} AS (
      SELECT doc_id, base_sym, replace(sym,
        ' ' || (SELECT l FROM b{t}) || ' ' || (SELECT r FROM b{t}) || ' ',
        ' ' || (SELECT l FROM b{t}) || (SELECT r FROM b{t}) || ' ') AS sym
      FROM e{t - 1}
    )"""
    for t in range(1, _BPE_N_MERGES + 1)
)


@register(
    "x_pipeline_bpe_merges",
    f"""
    WITH {_bpe_merge_ctes(_BPE_N_MERGES)}
    {_BPE_MERGES_SELECT}
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="BPE tokenizer TRAINING (arXiv:1508.07909) as a catalog query: 8 "
    "deterministic merges learned from the distinct-word frequency table "
    "(chars + </w> marker, most-frequent adjacent pair, lexicographic "
    "ties) — each step is one bounded pair-count aggregation, only the "
    "winning pairs reach the driver; the oracle replays training as "
    "unrolled CTEs with byte-identical greedy replace semantics",
)
def x_pipeline_bpe_merges(spark, sf_dir):
    merges = _bpe_merges_cached(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, pair_count long"
    )


@register(
    "x_pipeline_bpe_encode",
    f"""
    WITH {_bpe_merge_ctes(_BPE_N_MERGES)},
    docsym AS (
      SELECT doc_id,
             ' ' || array_to_string(list_transform(
                 list_filter(string_split(text,' '), x -> x <> ''),
                 x -> array_to_string(string_split(x,''),' ') || ' </w>'
               ), ' ') || ' ' AS sym
      FROM documents
    ),
    e0 AS (SELECT doc_id, sym AS base_sym, sym FROM docsym)
    {_BPE_ENCODE_STEPS}
    SELECT doc_id,
           CAST(len(string_split(trim(base_sym),' ')) AS BIGINT)
             AS n_base_symbols,
           CAST(len(string_split(trim(sym),' ')) AS BIGINT) AS n_bpe_tokens
    FROM e{_BPE_N_MERGES}
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="BPE ENCODING with the trained merge table: every document's "
    "char+marker symbol string rewritten by the 8 learned rules (applied "
    "whole-doc; cross-word false matches are structurally impossible "
    "because no rule's left symbol is ever word-final), reporting base "
    "vs post-merge token counts — the corpus-accounting number a "
    "token-budgeted training run plans against",
)
def x_pipeline_bpe_encode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_token_counts(docs, _bpe_merges_cached(spark, sf_dir))


@register(
    "t_streaming_ann_assign",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {_lloyd_centroids_cte(n_cells=8, n_iter=2)},
    ca AS (
      SELECT v.vec_id, piv.pid,
             list_cosine_similarity(v.e, piv.pe) AS sim,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    )
    SELECT vec_id, CAST(pid AS BIGINT) AS cell, round(sim, 4) AS cell_sim
    FROM ca WHERE rn = 1
    """,
    survey_ids=("T1", "EXT-similarity", "EXT-streaming"),
    doc="IVF index MAINTENANCE as a standing query: embeddings replayed "
    "as a 4-micro-batch stream through the trained coarse quantizer "
    "(centroids broadcast as codegen literals), each arriving vector "
    "stateless-assigned to its max-cosine cell — the decision that "
    "routes continuous embedding ingestion into the right index "
    "partition; assignment is deterministic (lowest-cell ties), so the "
    "streaming result equals the batch assignment and the oracle "
    "replays it in SQL",
)
def t_streaming_ann_assign(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    emb = _t(spark, sf_dir, "embeddings")
    cents = _centroids_cached(spark, sf_dir)
    stream = srt.replayed_stream(spark, emb, n_slices=4, order_col="vec_id")
    assigned = similarity.assign_cells(stream, cents)
    return srt.run_available_now(assigned, output_mode="append")


# Deterministic trainer outputs are pure functions of (fixture dir, params):
# memoize them per process so the five quantizer-backed catalog queries the
# driver runs in one session train once, not once each. (The trainers are
# seeded/tie-broken deterministic — see ivf_centroids_lloyd / bpe_train_merges
# — so caching cannot change any query's result.)
_TRAINER_CACHE: dict = {}


def _centroids_cached(spark, sf_dir, n_cells: int = 8, n_iter: int = 2):
    key = ("lloyd", sf_dir, n_cells, n_iter)
    if key not in _TRAINER_CACHE:
        _TRAINER_CACHE[key] = similarity.ivf_centroids_lloyd(
            _t(spark, sf_dir, "embeddings"), n_cells, n_iter
        )
    return _TRAINER_CACHE[key]


def _bpe_merges_cached(spark, sf_dir, n_merges: int = _BPE_N_MERGES):
    key = ("bpe", sf_dir, n_merges)
    if key not in _TRAINER_CACHE:
        _TRAINER_CACHE[key] = text.bpe_train_merges(
            _t(spark, sf_dir, "documents"), n_merges=n_merges
        )
    return _TRAINER_CACHE[key]


@register(
    "x_text_bigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    big AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
        SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
        FROM tok
      )
    ),
    lm AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(c2) AS ctx FROM lm GROUP BY 1),
    voc AS (
      SELECT count(DISTINCT token) AS vocab
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    )
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((COALESCE(l.c2, 0) + 1.0)::DOUBLE
                        / (COALESCE(c.ctx, 0) + voc.vocab)::DOUBLE)), 4)
             AS mean_logprob
    FROM big b
    LEFT JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
    LEFT JOIN ctx c ON b.w1 = c.w1
    CROSS JOIN voc
    GROUP BY b.doc_id
    """,
    bench=True,
    survey_ids=("EXT-text",),
    doc="mean bigram conditional log-prob per doc under an add-one-"
    "smoothed corpus bigram LM — one order up the CCNet perplexity-"
    "filter ladder from x_text_unigram_logprob (word-order-sensitive "
    "where the unigram score is not); bigram/context tables broadcast "
    "into a map-side pair join, one doc-keyed shuffle of slim rows",
)
def x_text_bigram_logprob(spark, sf_dir):
    return text.bigram_logprob(_t(spark, sf_dir, "documents"))


@register(
    "x_window_sliding_stats",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER w, 4) AS moving_avg,
           round(min(value) OVER w, 4) AS moving_min,
           round(max(value) OVER w, 4) AS moving_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    bench=True,
    survey_ids=("A1", "§2.6"),
    doc="bounded sliding-frame analytics (trailing-4 moving average/min/"
    "max per key in event-time order) — the smoothing/alert-baseline "
    "companion to x_window_running_total's unbounded frame; same "
    "single-shuffle single-pass plan, the frame bound only changes the "
    "per-row state the window operator keeps",
)
def x_window_sliding(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
        F.round(F.min("value").over(w), 4).alias("moving_min"),
        F.round(F.max("value").over(w), 4).alias("moving_max"),
    )


@register(
    "j_full_outer_join",
    """
    SELECT COALESCE(e.user_id, s.s_suppkey) AS key_id, e.event_id, s.s_name
    FROM events e FULL OUTER JOIN supplier s ON e.user_id = s.s_suppkey
    """,
    survey_ids=("J1",),
    doc="FULL OUTER stream-table join (ksqlDB supports INNER/LEFT/FULL "
    "OUTER; the reference demo uses LEFT — this completes the join-type "
    "matrix): unmatched events keep NULL dimension columns, unmatched "
    "suppliers surface with NULL event columns, the coalesced key is "
    "total. Full outer cannot broadcast either side — it plans as a "
    "shuffle join on the key, which is the correct 100 TB shape",
)
def j_full_outer(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    s = _t(spark, sf_dir, "supplier")
    return (
        e.join(s, e["user_id"] == s["s_suppkey"], "full_outer")
        .select(
            F.coalesce(e["user_id"], s["s_suppkey"]).alias("key_id"),
            "event_id",
            "s_name",
        )
    )


@register(
    "x_pipeline_token_budget",
    """
    WITH counts AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    n AS (SELECT count(*) AS n_sources FROM counts)
    SELECT source, n_docs, n_tokens,
           round(1.0 / n.n_sources, 6) AS weight,
           round(100000.0 * (1.0 / n.n_sources), 4) AS token_allocation,
           round(least(1.0, 100000.0 * (1.0 / n.n_sources) / n_tokens), 6)
             AS sampling_rate,
           (n_tokens < 100000.0 * (1.0 / n.n_sources)) AS undersupplied
    FROM counts CROSS JOIN n
    """,
    survey_ids=("EXT-pipeline",),
    doc="token-budgeted mixture PLANNING: per-source inventory (docs, "
    "whitespace tokens), uniform-weight allocation of a 100k-token "
    "budget, and the sampling rate that hits it, with undersupplied "
    "sources flagged — the planning step that precedes "
    "x_pipeline_mixture_sample's hash-based execution; one scan, one "
    "source-keyed partial-aggregated shuffle",
)
def x_pipeline_token_budget(spark, sf_dir):
    return text.token_budget_plan(
        _t(spark, sf_dir, "documents"), budget_tokens=100_000
    )


@register(
    "t_streaming_kmv_distinct",
    """
    WITH vals AS (SELECT DISTINCT event_type AS grp, user_id AS v FROM events
                  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    hashed AS (SELECT grp, md5(CAST(v AS VARCHAR)) AS h FROM vals),
    topk AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashed)
      WHERE rn <= 64),
    pg AS (SELECT grp, count(*) AS n_sketch, max(h) AS hk FROM topk GROUP BY grp),
    nrows AS (SELECT event_type AS grp, count(*) AS rows_seen FROM events
              WHERE event_type IS NOT NULL AND user_id IS NOT NULL GROUP BY 1)
    SELECT pg.grp, CAST(pg.n_sketch AS BIGINT) AS n_sketch,
           CAST(round(CASE WHEN pg.n_sketch < 64 THEN pg.n_sketch * 1.0
                ELSE 63.0 / (('0x' || substr(pg.hk, 1, 15))::UBIGINT
                             / power(16, 15))
                END) AS BIGINT) AS kmv_estimate,
           CAST(nrows.rows_seen AS BIGINT) AS rows_seen
    FROM pg JOIN nrows ON pg.grp = nrows.grp
    """,
    survey_ids=("T1", "A1", "EXT-sketch", "EXT-streaming"),
    doc="streaming COUNT(DISTINCT) via a KMV sketch automaton: per "
    "event_type the state is the 64 smallest value hashes EVER — bounded "
    "forever regardless of stream volume, the mergeable-sketch answer to "
    "distinct counting that exact streaming state cannot give; the "
    "sketch merge is commutative and idempotent, so the final state is "
    "replay-order-invariant and hash-matches the batch SQL oracle "
    "(same estimator as x_sketch_kmv_distinct); final revision selected "
    "by max rows_seen, which strictly grows per emission",
)
def t_streaming_kmv(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    revisions = srt.run_available_now(
        srt.kmv_distinct_stateful(stream), output_mode="update"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("rows_seen"))
    return (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("grp", "n_sketch", "kmv_estimate", "rows_seen")
    )


_GOPHER_KEEP_CTE = """gq AS (
      SELECT doc_id,
             ((n >= 10 AND n <= 100000)
              AND (mean_len >= 2.0 AND mean_len <= 12.0)
              AND alpha_frac >= 0.7 AND sym_frac <= 0.1 AND n_stop >= 2)
               AS keep
      FROM (
        SELECT doc_id, n,
               (length(text) - (n-1))*1.0/n AS mean_len,
               len(list_filter(s, x -> regexp_matches(x, '[A-Za-z]')))*1.0/n
                 AS alpha_frac,
               len(list_filter(s, x -> x IN ('#','...')))*1.0/n AS sym_frac,
               len(list_intersect(list_distinct(s),
                   ['the','a','an','and','or','of','to','in','is','it']))
                 AS n_stop
        FROM (SELECT doc_id, text, string_split(text,' ') AS s,
                     len(string_split(text,' ')) AS n
              FROM documents)
      )
    )"""


@register(
    "x_pipeline_corpus_prep_v2",
    f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {_lloyd_centroids_cte(n_cells=8, n_iter=2)},
    ca AS (
      SELECT v.vec_id, v.e, piv.pid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    ),
    assign AS (SELECT vec_id, e, pid AS cell FROM ca WHERE rn = 1),
    spairs AS (
      SELECT a.vec_id AS u, b.vec_id AS w
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    ),
    sym AS (SELECT u, w FROM spairs UNION SELECT w, u FROM spairs),
    reach AS (
      SELECT u, w FROM sym
      UNION
      SELECT r.u, s.w FROM reach r JOIN sym s ON r.w = s.u
    ),
    comp AS (SELECT u AS vec_id, least(u, min(w)) AS component
             FROM reach GROUP BY u),
    keepstat AS (
      SELECT d.vec_id,
             CASE WHEN c.component IS NULL THEN 'unique'
                  WHEN c.component = d.vec_id THEN 'representative'
                  ELSE 'duplicate' END AS status
      FROM embeddings d LEFT JOIN comp c ON d.vec_id = c.vec_id
    ),
    {_GOPHER_KEEP_CTE},
    kept AS (
      SELECT doc.source, doc.text
      FROM documents doc
      JOIN gq ON doc.doc_id = gq.doc_id
      JOIN keepstat ks ON doc.doc_id = ks.vec_id
      WHERE gq.keep AND ks.status <> 'duplicate'
    ),
    counts AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM kept GROUP BY source
    ),
    n AS (SELECT count(*) AS n_sources FROM counts)
    SELECT source, n_docs, n_tokens,
           round(1.0 / n.n_sources, 6) AS weight,
           round(50000.0 * (1.0 / n.n_sources), 4) AS token_allocation,
           round(least(1.0, 50000.0 * (1.0 / n.n_sources) / n_tokens), 6)
             AS sampling_rate,
           (n_tokens < 50000.0 * (1.0 / n.n_sources)) AS undersupplied
    FROM counts CROSS JOIN n
    """,
    survey_ids=("EXT-pipeline", "EXT-dedup", "EXT-text"),
    doc="the round-6 corpus-prep composition, end to end in ONE oracle-"
    "checked query: Gopher rule filtering (keep only) -> SemDeDup keep "
    "list over the documents' embeddings (drop semantic duplicates, "
    "doc_id = vec_id in the fixture) -> token-budgeted mixture plan for "
    "the surviving corpus (50k budget, uniform source weights). "
    "Cross-modal join rides the shared id; every stage is an operator "
    "already attested in isolation, and the composition stays one plan",
)
def x_pipeline_corpus_prep_v2(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    g = text.gopher_rules(docs).select("doc_id", "keep")
    pairs = similarity.semantic_dedup_pairs(
        emb, n_cells=8, n_iter=2, threshold=0.4,
        centroids=_centroids_cached(spark, sf_dir),
    )
    sem = dedup.dedup_keep_list(
        emb.select(F.col("vec_id").alias("doc_id")),
        pairs.select(
            F.col("left_id").alias("doc_a"), F.col("right_id").alias("doc_b")
        ),
    ).select("doc_id", "status")
    kept = (
        docs.join(g, "doc_id")
        .join(sem, "doc_id")
        .filter(F.col("keep") & (F.col("status") != "duplicate"))
        .select("doc_id", "source", "text")
    )
    return text.token_budget_plan(kept, budget_tokens=50_000)


@register(
    "x_pipeline_dsir_select",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tlm AS (
      SELECT token, count(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE lang = 'en') GROUP BY token
    ),
    ttot AS (SELECT sum(c) AS total, count(*) AS vocab FROM tlm),
    clm AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    ctot AS (SELECT sum(c) AS total, count(*) AS vocab FROM clm),
    tscore AS (
      SELECT t.doc_id,
             round(avg(ln((COALESCE(l.c, 0) + 1.0)::DOUBLE
                          / (ttot.total + ttot.vocab)::DOUBLE)), 4)
               AS target_logprob
      FROM tok t LEFT JOIN tlm l USING (token) CROSS JOIN ttot
      GROUP BY t.doc_id
    ),
    cscore AS (
      SELECT t.doc_id,
             round(avg(ln((COALESCE(l.c, 0) + 1.0)::DOUBLE
                          / (ctot.total + ctot.vocab)::DOUBLE)), 4)
               AS corpus_logprob
      FROM tok t LEFT JOIN clm l USING (token) CROSS JOIN ctot
      GROUP BY t.doc_id
    )
    SELECT t.doc_id, t.target_logprob, c.corpus_logprob,
           round(t.target_logprob - c.corpus_logprob, 4) AS log_ratio,
           (round(t.target_logprob - c.corpus_logprob, 4) > 0) AS selected
    FROM tscore t JOIN cscore c ON t.doc_id = c.doc_id
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="DSIR-style data selection (arXiv:2302.03169): every document "
    "scored by the log importance ratio between a target-domain unigram "
    "LM (here: the lang='en' subset) and the general-corpus LM — "
    "positive ratio means more target-like than corpus-typical, the "
    "signal importance resampling selects on; two broadcast LM joins, "
    "two doc-keyed shuffles, deterministic end to end",
)
def x_pipeline_dsir(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.dsir_importance(docs, docs.filter(F.col("lang") == "en"))


@register(
    "x_text_langid_confusion",
    """
    WITH t AS (
      SELECT doc_id, lang, list_distinct(string_split(text,' ')) AS d
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
             len(list_intersect(d, ['der','die','und','das','ist'])) AS h_de,
             len(list_intersect(d, ['the','and','of','to','is'])) AS h_en,
             len(list_intersect(d, ['el','la','de','los','que'])) AS h_es,
             len(list_intersect(d, ['le','la','et','les','des'])) AS h_fr,
             len(list_intersect(d, ['de5','shi4','le5','zai4','he2'])) AS h_zh
      FROM t
    ),
    pred AS (
      SELECT lang AS lang_declared,
             CASE WHEN greatest(h_de,h_en,h_es,h_fr,h_zh) = 0 THEN 'und'
                  WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'de'
                  WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'en'
                  WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'es'
                  WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_zh) THEN 'fr'
                  ELSE 'zh' END AS lang_predicted
      FROM h
    )
    SELECT lang_declared, lang_predicted,
           CAST(count(*) AS BIGINT) AS n_docs,
           (lang_declared = lang_predicted) AS agreement
    FROM pred GROUP BY lang_declared, lang_predicted
    """,
    survey_ids=("EXT-text",),
    doc="corpus QA view over the language-ID heuristic: the declared-vs-"
    "predicted confusion summary (one row per label pair with doc count "
    "and an agreement flag) — the number a curation run watches to "
    "decide whether declared metadata or the detector is lying; pure "
    "aggregation over the x_text_langid operator, one extra shuffle",
)
def x_text_langid_confusion(spark, sf_dir):
    pred = text.language_id(_t(spark, sf_dir, "documents"))
    return (
        pred.groupBy("lang_declared", "lang_predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn(
            "agreement", F.col("lang_declared") == F.col("lang_predicted")
        )
    )


# ---------------------------------------------------------------------------
# round 7: HLL sketch, hashed quality classifier, CCNet perplexity buckets,
# embedding topic clusters, and three more TPC-H-shaped scale proofs
# ---------------------------------------------------------------------------

# alpha_m * m^2 * 2^61 for m = 256 — the same Python-computed literal is
# spliced into both engines so the single double division is bit-identical
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 61)


# shared oracle pieces for the HLL sketch: the register build is ONE
# definition (src/rr/regs) and the fold/estimate chain is parameterized by
# which relation holds the sketch rows — the batch query folds the union
# of per-group + merged registers, the streaming twin folds regs directly
_HLL_REGS_CTE = """src AS (
      SELECT event_type AS grp, md5(CAST(user_id AS VARCHAR)) AS h FROM events
      WHERE user_id IS NOT NULL
    ), rr AS (
      SELECT grp,
             CAST(('0x' || substr(h, 1, 2))::UBIGINT AS BIGINT) AS reg,
             CAST(('0x' || substr(h, 3, 15))::UBIGINT AS BIGINT) AS wv
      FROM src
    ), regs AS (
      SELECT grp, reg,
             max(CASE WHEN wv = 0 THEN 61
                      ELSE 60 - length(bin(wv)) + 1 END) AS mj
      FROM rr GROUP BY 1, 2
    )"""


def _hll_fold_ctes(rel: str) -> str:
    return f"""folded AS (
      SELECT grp, count(*) AS n_present,
             sum((1::BIGINT << (61 - mj))::HUGEINT) AS present_sum
      FROM {rel} GROUP BY 1
    ), est AS (
      SELECT grp, n_present,
             {_HLL_NUM!r} / CAST(present_sum
               + ({_HLL_M} - n_present)::HUGEINT * (1::HUGEINT << 61)
               AS DOUBLE) AS e_raw,
             {_HLL_M} - n_present AS v
      FROM folded
    )"""


_HLL_EST_CASE = (
    f"CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND v > 0 "
    f"THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / v) ELSE e_raw END"
)


@register(
    "x_sketch_hll_distinct",
    f"""
    WITH {_HLL_REGS_CTE}, sk AS (
      SELECT * FROM regs
      UNION ALL
      SELECT '__all__' AS grp, reg, max(mj) FROM regs GROUP BY 2
    ), {_hll_fold_ctes("sk")}, hll AS (
      SELECT grp, CAST(n_present AS BIGINT) AS n_registers,
             CAST(round({_HLL_EST_CASE}) AS BIGINT) AS hll_estimate
      FROM est
    ), ex AS (
      SELECT event_type AS grp, count(DISTINCT user_id) AS n_exact
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
      UNION ALL
      SELECT '__all__', count(DISTINCT user_id)
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT e.grp AS grp, n_registers, hll_estimate,
           CAST(x.n_exact AS BIGINT) AS n_exact,
           round((hll_estimate - x.n_exact) * 1.0 / x.n_exact, 4) AS rel_err
    FROM hll e JOIN ex x ON e.grp IS NOT DISTINCT FROM x.grp
    """,
    survey_ids=("EXT-sketch", "A1"),
    doc="HyperLogLog distinct-count sketch (p=8, 256 registers): distinct "
    "users per event_type plus a merged __all__ row computed by element-"
    "wise register MAX over the per-group sketches — the merge law that "
    "makes HLL the canonical 100 TB COUNT(DISTINCT). Open twin of "
    "Spark's engine-private approx_count_distinct: md5-derived registers "
    "and an exact DECIMAL fixed-point harmonic denominator make the "
    "sketch and estimate identical in every engine, so the approximate "
    "operator is exactly value-hash-checked (same stance as KMV, but "
    "needing no up-front distinct — the register build is one map-side-"
    "combined groupBy MAX whose shuffle carries at most groups*256 rows).",
)
def x_sketch_hll(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import sketches

    return sketches.hll_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id", p=_HLL_P
    )


# shared oracle CTEs for the feature-hashed classifier: one definition of
# the bucket->weight->exact-sum pipeline, ending in the UNROUNDED score
# (`raw`) — keep decisions must compare raw, never the rounded display
# column, or documents scoring in (0, 5e-7) flip between engines
_CLF_RAW_CTE = """clf_toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), clf_w AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('w#' || substr(md5(tok), 1, 4)), 1, 15))
                  ::UBIGINT AS BIGINT) - 576460752303423488 AS ws
      FROM clf_toks
    ), clf_raw AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(ws) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1152921504606846976.0) AS raw
      FROM clf_w GROUP BY doc_id
    )"""


@register(
    "x_quality_clf_score",
    f"""
    WITH {_CLF_RAW_CTE}
    SELECT doc_id, n_tokens, round(raw, 6) AS clf_score, raw > 0.0 AS keep
    FROM clf_raw
    """,
    survey_ids=("EXT-text", "EXT-pipeline"),
    doc="feature-hashed linear classifier scoring (fastText-style quality "
    "filter compute shape, hashing trick included): token -> 16-bit md5 "
    "feature bucket -> fixed-point hash-derived weight -> exact "
    "DECIMAL(38,0) per-doc sum -> one double division; keep = score>0. "
    "Swap the weight derivation for a broadcast of trained weights and "
    "the plan is unchanged: one scan, map-side explode, one doc-keyed "
    "shuffle of combine-reduced partials. No UDF anywhere.",
)
def x_quality_clf(spark, sf_dir):
    return text.hashed_classifier_score(_t(spark, sf_dir, "documents"))


# shared oracle CTEs for CCNet perplexity bucketing: bigram-LM score per
# doc, then the per-language equal-count third (1=head, 2=middle, 3=tail)
_PPL_RANK_CTE = """ppl_tok AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ), ppl_big AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
        SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
        FROM ppl_tok
      )
    ), ppl_lm AS (SELECT w1, w2, count(*) AS c2 FROM ppl_big GROUP BY 1, 2),
    ppl_ctx AS (SELECT w1, sum(c2) AS ctx FROM ppl_lm GROUP BY 1),
    ppl_voc AS (
      SELECT count(DISTINCT token) AS vocab
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    ), ppl_scored AS (
      SELECT b.doc_id,
             round(avg(ln((COALESCE(l.c2, 0) + 1.0)::DOUBLE
                          / (COALESCE(c.ctx, 0) + ppl_voc.vocab)::DOUBLE)), 4)
               AS mean_logprob
      FROM ppl_big b
      LEFT JOIN ppl_lm l ON b.w1 = l.w1 AND b.w2 = l.w2
      LEFT JOIN ppl_ctx c ON b.w1 = c.w1
      CROSS JOIN ppl_voc
      GROUP BY b.doc_id
    ), ppl_ranked AS (
      SELECT s.doc_id, d.lang, s.mean_logprob,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.mean_logprob DESC, s.doc_id) AS b
      FROM ppl_scored s JOIN documents d ON s.doc_id = d.doc_id
    )"""


@register(
    "x_quality_ppl_buckets",
    f"""
    WITH {_PPL_RANK_CTE}
    SELECT doc_id, lang, mean_logprob,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
    FROM ppl_ranked
    """,
    survey_ids=("EXT-text", "EXT-pipeline"),
    doc="CCNet-style per-language perplexity bucketing: bigram-LM score "
    "-> per-language equal-count head/middle/tail split (train on head+"
    "middle, drop tail). Per-language windows because perplexity scales "
    "are not comparable across languages; ties broken by doc_id so the "
    "ntile assignment is engine-independent. Plan = bigram_logprob's "
    "broadcast-LM scoring + one low-cardinality window shuffle.",
)
def x_quality_ppl(spark, sf_dir):
    return text.perplexity_buckets(_t(spark, sf_dir, "documents"))


@register(
    "x_cluster_topics",
    f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    {_lloyd_centroids_cte(n_cells=8, n_iter=2)},
    ca AS (
      SELECT v.vec_id, piv.pid,
             list_cosine_similarity(v.e, piv.pe) AS sim,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, piv.pe) DESC, piv.pid ASC
             ) AS rn
      FROM v CROSS JOIN piv
    ),
    asn AS (
      SELECT ca.vec_id, ca.pid AS cell, round(ca.sim, 4) AS cell_sim, d.label
      FROM ca JOIN embeddings d ON ca.vec_id = d.vec_id
      WHERE ca.rn = 1
    ),
    per AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
             round(avg(cell_sim), 4) AS mean_cell_sim,
             min(vec_id) AS exemplar_vec_id
      FROM asn GROUP BY 1
    ),
    lab AS (
      SELECT cell, label, count(*) AS n,
             row_number() OVER (PARTITION BY cell
                                ORDER BY count(*) DESC, label ASC) AS rn
      FROM asn GROUP BY 1, 2
    )
    SELECT p.cell, p.n_members, p.mean_cell_sim, p.exemplar_vec_id,
           l.label AS top_label, CAST(l.n AS BIGINT) AS top_label_n
    FROM per p JOIN lab l ON p.cell = l.cell AND l.rn = 1
    """,
    survey_ids=("EXT-similarity", "EXT-pipeline"),
    doc="topic-cluster summary over the trained spherical k-means "
    "quantizer (the curation view behind cluster-based mixing and "
    "SemDeDup auditing): every embedding assigned to its max-cosine "
    "cell (shuffle-free codegen-literal argmax, shared cached trainer "
    "with the IVF/semantic-dedup queries), then per cell: member count, "
    "mean cosine-to-centroid (cluster coherence), lowest-id exemplar, "
    "and the majority metadata label with its count (cluster purity). "
    "Two low-cardinality aggregations over slim rows; at 100 TB the "
    "per-cell stats are the monitoring signal for re-clustering.",
)
def x_cluster_topics(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    asn = similarity.assign_cells(
        emb, _centroids_cached(spark, sf_dir)
    ).join(emb.select("vec_id", "label"), "vec_id")
    per = asn.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.avg("cell_sim"), 4).alias("mean_cell_sim"),
        F.min("vec_id").alias("exemplar_vec_id"),
    )
    lab = (
        asn.groupBy("cell", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(
                    F.desc("n"), F.asc("label")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cell",
            F.col("label").alias("top_label"),
            F.col("n").cast("long").alias("top_label_n"),
        )
    )
    return per.join(lab, "cell")


@register(
    "h4_late_shipment_priority",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
    bench=True,
    survey_ids=("J1", "A1"),
    doc="TPC-H Q4-shaped order-priority check: orders with at least one "
    "line item shipped >60 days after the order date, counted per "
    "priority. The EXISTS becomes a LEFT SEMI join with a mixed "
    "equi + non-equi condition — the semi join dedups order-side rows "
    "inside the join operator (no distinct stage), and the fact tables "
    "shuffle once on the order key; the 60-day lag predicate rides the "
    "join, not a post-filter, so matched-row state stays bounded.",
)
def h4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@register(
    "h10_returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    bench=True,
    survey_ids=("J1", "A1", "L4"),
    doc="TPC-H Q10-shaped returned-item revenue: who returned the most "
    "value in a quarter-year window. Fact side: lineitem filtered to "
    "returnflag='R' (pushed to the scan) shuffle-joins the date-pruned "
    "orders on the order key — the only big exchange; customer and "
    "nation broadcast; then a customer-keyed partial agg and a global "
    "top-20. The revenue-owner pattern for any 100 TB 'top offenders' "
    "report.",
)
def h10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "revenue"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "h14_promo_revenue_share",
    """
    SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    bench=True,
    survey_ids=("J1", "A1"),
    doc="TPC-H Q14-shaped promo revenue share: one conditional aggregate "
    "over a date-pruned fact scan broadcast-joined to the part "
    "dimension — the numerator/denominator CASE-sum pattern that "
    "computes a ratio in a single pass instead of two queries. The "
    "fact side never shuffles (dim broadcast, then a global partial "
    "agg of two running sums + a count).",
)
def h14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy()
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


@register(
    "t_streaming_quality_gate",
    f"""
    WITH {_CLF_RAW_CTE}
    SELECT doc_id, n_tokens, round(raw, 6) AS clf_score
    FROM clf_raw WHERE raw > 0.0
    """,
    survey_ids=("EXT-pipeline", "T1", "F3"),
    doc="ingest-time quality gate: the feature-hashed classifier "
    "(x_quality_clf_score) applied INSIDE a streaming micro-batch "
    "pipeline — documents replayed as a 4-micro-batch stream, each "
    "batch scored map-side and filtered to keep-only before it would "
    "reach a sink. The scorer is per-document (stateless across rows "
    "within the aggregate-per-doc-id, which arrives whole in a batch), "
    "so the streaming result equals the batch result and the oracle "
    "replays it in SQL — the pattern for filtering a firehose BEFORE "
    "paying to store it. Keep-side only (score > 0); the drop side "
    "would route to a quarantine sink in production.",
)
def t_streaming_quality(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    d = _t(spark, sf_dir, "documents")
    stream = srt.replayed_stream(spark, d, n_slices=4, order_col="doc_id")
    scored = text.hashed_classifier_score(stream)
    gated = scored.filter(F.col("keep")).select(
        "doc_id", "n_tokens", "clf_score"
    )
    return srt.run_available_now(gated, output_mode="update")


@register(
    "x_corpus_overlap_minhash",
    """
    WITH d AS (
      SELECT source AS grp, string_split(text, ' ') AS a FROM documents
    ), g AS (
      SELECT DISTINCT grp, t[1] || ' ' || t[2] || ' ' || t[3] AS sh
      FROM (
        SELECT grp,
               unnest(list_zip(a[1:len(a)-2], a[2:len(a)-1], a[3:len(a)])) AS t
        FROM d WHERE len(a) >= 3
      )
    ), slots AS (SELECT unnest(range(32)) AS i),
    h AS (
      SELECT grp, i, md5(CAST(i AS VARCHAR) || '#' || sh) AS hh
      FROM g CROSS JOIN slots
    ), sigs AS (
      SELECT grp, i, min(hh) AS sig FROM h GROUP BY 1, 2
    ), est AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             CAST(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match
      FROM sigs a JOIN sigs b ON a.i = b.i AND a.grp < b.grp
      GROUP BY 1, 2
    ), sizes AS (SELECT grp, count(*) AS sz FROM g GROUP BY 1),
    inter AS (
      SELECT x.grp AS group_a, y.grp AS group_b, count(*) AS n_inter
      FROM g x JOIN g y ON x.sh = y.sh AND x.grp < y.grp
      GROUP BY 1, 2
    )
    SELECT e.group_a, e.group_b, e.n_match,
           round(e.n_match / 32.0, 4) AS jaccard_est,
           round(COALESCE(i.n_inter * 1.0
                          / (sa.sz + sb.sz - i.n_inter), 0.0), 4)
             AS jaccard_exact,
           round(abs(round(e.n_match / 32.0, 4)
                     - round(COALESCE(i.n_inter * 1.0
                                      / (sa.sz + sb.sz - i.n_inter), 0.0), 4)),
                 4) AS abs_err
    FROM est e
    LEFT JOIN inter i ON e.group_a = i.group_a AND e.group_b = i.group_b
    JOIN sizes sa ON e.group_a = sa.grp
    JOIN sizes sb ON e.group_b = sb.grp
    """,
    survey_ids=("EXT-dedup", "EXT-sketch", "EXT-pipeline"),
    doc="pairwise corpus-overlap matrix between sources: each source's "
    "distinct 3-gram shingle set MinHash-sketched (32 md5 permutations), "
    "every source pair's Jaccard estimated as the agreeing-slot fraction "
    "(Broder 1997) — the 'how much of this new dump do I already have' "
    "answer that precedes mixing a source into training data. Signature "
    "build = map-side-combined groupBy MIN (<= groups*32 shuffled rows); "
    "pair compare = self-join of that tiny table. Exact-Jaccard columns "
    "attest each row's error; production drops them.",
)
def x_corpus_overlap(spark, sf_dir):
    return dedup.corpus_overlap_minhash(_t(spark, sf_dir, "documents"))


@register(
    "x_pipeline_tokenizer_fertility",
    f"""
    WITH {_bpe_merge_ctes(_BPE_N_MERGES)},
    docsym AS (
      SELECT doc_id,
             ' ' || array_to_string(list_transform(
                 list_filter(string_split(text,' '), x -> x <> ''),
                 x -> array_to_string(string_split(x,''),' ') || ' </w>'
               ), ' ') || ' ' AS sym
      FROM documents
    ),
    e0 AS (SELECT doc_id, sym AS base_sym, sym FROM docsym)
    {_BPE_ENCODE_STEPS},
    counts AS (
      SELECT doc_id,
             len(string_split(trim(base_sym),' ')) AS n_base_symbols,
             len(string_split(trim(sym),' ')) AS n_bpe_tokens
      FROM e{_BPE_N_MERGES}
    ),
    words AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS n_words
      FROM documents
    )
    SELECT w.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w.n_words) AS BIGINT) AS n_words,
           CAST(sum(c.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           round(CASE WHEN sum(w.n_words) > 0
                      THEN sum(c.n_bpe_tokens) / CAST(sum(w.n_words) AS DOUBLE)
                      END, 4) AS fertility,
           round(sum(c.n_base_symbols) / CAST(sum(c.n_bpe_tokens) AS DOUBLE), 4)
             AS compression
    FROM counts c JOIN words w USING (doc_id)
    GROUP BY w.lang
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="per-language tokenizer fertility audit over the trained BPE "
    "table: tokens-per-word (the multilingual-fairness number — a "
    "language at 2x fertility pays 2x context and compute for the same "
    "text) and base-symbol compression, aggregated from the one-scan "
    "encode chain by a low-cardinality language-keyed shuffle — the "
    "check a vocab-training run makes before freezing the tokenizer",
)
def x_pipeline_fertility(spark, sf_dir):
    return text.tokenizer_fertility(
        _t(spark, sf_dir, "documents"), _bpe_merges_cached(spark, sf_dir)
    )


@register(
    "x_text_remove_dup_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ), pos AS (
      SELECT doc_id, unnest(generate_series(1, len(a) - 3)) AS i, a FROM toks
    ), g AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(a[i:i+3], ' ') AS gram
      FROM pos
    ), dup AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
      GROUP BY gram HAVING count(*) >= 2
    ), starts AS (
      SELECT doc_id, list_sort(list(pos)) AS st
      FROM g JOIN dup USING (gram) GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.a) AS BIGINT) AS n_words,
           CAST(len(t.a) - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(list_transform(kept, j -> t.a[j + 1]), ' '),
                    '') AS text_deduped
    FROM (
      SELECT t.doc_id, t.a,
             list_filter(
               generate_series(0, len(t.a) - 1),
               j -> len(list_filter(COALESCE(s.st, []),
                                    x -> j >= x AND j < x + 4)) = 0
             ) AS kept
      FROM toks t LEFT JOIN starts s USING (doc_id)
    ) t
    """,
    survey_ids=("EXT-dedup", "EXT-text", "EXT-pipeline"),
    doc="exact-substring dedup as a TRANSFORM (Lee et al. 2021 "
    "ExactSubstr, word-granular, n=4): every word position covered by a "
    "4-gram occurring in >= 2 distinct docs is deleted, rewriting the "
    "text — boilerplate/template spans vanish while unique content "
    "survives. Duplicated-gram set via one distinct+groupBy; matches "
    "collapse to one (doc, sorted-starts) row per affected doc; the "
    "rewrite is a per-row codegen expression (text never rides the "
    "join). The removal sibling of x_text_repeated_spans' report.",
)
def x_text_remove_dup(spark, sf_dir):
    return text.remove_duplicate_spans(_t(spark, sf_dir, "documents"), n=4)


# shared oracle pieces for the PSI drift monitor: one definition of the
# baseline/current split, the baseline-fixed binning, the zero-filled
# grid and the per-group totals; the two queries differ only in their
# final projection (batch verdicts vs streaming revisions)
_PSI_CELLS_CTES = """base AS (
      SELECT event_type AS grp, value FROM events
      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
    ), cur AS (
      SELECT event_type AS grp, value FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
    ), bounds AS (
      SELECT grp, min(value) AS lo, max(value) AS hi FROM base GROUP BY 1
    ), hb AS (
      SELECT b.grp,
             CASE WHEN o.hi = o.lo THEN
                    (CASE WHEN b.value = o.lo THEN 0 ELSE 9 END)
                  ELSE CAST(least(greatest(floor((b.value - o.lo)
                         / ((o.hi - o.lo) / 10.0)), 0), 9) AS INT) END AS bin,
             count(*) AS cb
      FROM base b JOIN bounds o USING (grp) GROUP BY 1, 2
    ), hc AS (
      SELECT c.grp,
             CASE WHEN o.hi = o.lo THEN
                    (CASE WHEN c.value = o.lo THEN 0 ELSE 9 END)
                  ELSE CAST(least(greatest(floor((c.value - o.lo)
                         / ((o.hi - o.lo) / 10.0)), 0), 9) AS INT) END AS bin,
             count(*) AS cc
      FROM cur c JOIN bounds o USING (grp) GROUP BY 1, 2
    ), grid AS (
      SELECT grp, unnest(generate_series(0, 9)) AS bin FROM bounds
    ), cells AS (
      SELECT g.grp, g.bin,
             COALESCE(hb.cb, 0) AS cb, COALESCE(hc.cc, 0) AS cc
      FROM grid g
      LEFT JOIN hb ON g.grp = hb.grp AND g.bin = hb.bin
      LEFT JOIN hc ON g.grp = hc.grp AND g.bin = hc.bin
    ), tot AS (
      SELECT grp, bin, cb, cc,
             sum(cb) OVER (PARTITION BY grp) AS nb,
             sum(cc) OVER (PARTITION BY grp) AS nc
      FROM cells
    )"""

_PSI_SUM = """round(sum(((cb + 1) * 1.0 / (nb + 10) - (cc + 1) * 1.0 / (nc + 10))
                 * ln(((cb + 1) * 1.0 / (nb + 10))
                      / ((cc + 1) * 1.0 / (nc + 10)))), 4)"""


@register(
    "x_events_distribution_drift",
    f"""
    WITH {_PSI_CELLS_CTES}, psi AS (
      SELECT grp, nb, nc, {_PSI_SUM} AS psi
      FROM tot GROUP BY grp, nb, nc
    )
    SELECT grp, CAST(nb AS BIGINT) AS n_baseline,
           CAST(nc AS BIGINT) AS n_current, psi, psi > 0.2 AS drifted
    FROM psi WHERE nc > 0
    """,
    survey_ids=("A1", "EXT-streaming", "K5"),
    doc="Population-Stability-Index drift monitor per event type: the "
    "month's second half histogrammed against bins fixed by the first "
    "half's per-group range, PSI with add-one smoothing, drifted = "
    "psi > 0.2 (the conventional investigate threshold) — the "
    "distribution-level companion to the z-score row alerts feeding "
    "the same alert sinks. Bounds broadcast into both histogram "
    "passes; only counter rows shuffle; the PSI fold runs over "
    "groups*10 slim rows.",
)
def x_events_drift(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    return relational.distribution_drift(
        e.filter(F.col("ts") < split), e.filter(F.col("ts") >= split)
    )


@register(
    "t_streaming_hll_distinct",
    f"""
    WITH {_HLL_REGS_CTE}, {_hll_fold_ctes("regs")}, rows_per AS (
      SELECT event_type AS grp, count(*) AS rows_seen FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL GROUP BY 1
    )
    SELECT e.grp, CAST(e.n_present AS BIGINT) AS n_registers,
           CAST(round({_HLL_EST_CASE}) AS BIGINT) AS hll_estimate,
           CAST(r.rows_seen AS BIGINT) AS rows_seen
    FROM est e JOIN rows_per r USING (grp)
    """,
    survey_ids=("T1", "EXT-sketch", "EXT-streaming"),
    doc="streaming HLL distinct-count: events replayed as a 4-micro-batch "
    "stream through an applyInPandasWithState automaton whose per-key "
    "state is exactly 256 max-rho registers + a row counter — fixed "
    "size forever, smaller and flatter than streaming KMV's sorted "
    "digests, and the element-wise-max update makes the final state "
    "replay-order-invariant, so the last revision per key hash-matches "
    "the batch SQL oracle (register derivation and the exact fixed-"
    "point estimator are byte-identical to x_sketch_hll_distinct)",
)
def t_streaming_hll(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    revisions = srt.run_available_now(
        srt.hll_distinct_stateful(stream), output_mode="update"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("rows_seen"))
    return (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("grp", "n_registers", "hll_estimate", "rows_seen")
    )


@register(
    "x_pipeline_corpus_prep_v3",
    f"""
    WITH {_GOPHER_KEEP_CTE},
    {_CLF_RAW_CTE},
    clf AS (SELECT doc_id, raw > 0.0 AS keep FROM clf_raw),
    {_PPL_RANK_CTE},
    ppl AS (SELECT doc_id, b FROM ppl_ranked),
    kept AS (
      SELECT doc.source, doc.text
      FROM documents doc
      JOIN gq ON doc.doc_id = gq.doc_id
      JOIN clf ON doc.doc_id = clf.doc_id
      JOIN ppl ON doc.doc_id = ppl.doc_id
      WHERE gq.keep AND clf.keep AND ppl.b < 3
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM kept GROUP BY source
    """,
    survey_ids=("EXT-pipeline", "EXT-text"),
    doc="the LATE-round curation composition, end to end in one oracle-"
    "checked query: Gopher rule verdicts AND the feature-hashed "
    "classifier's keep AND CCNet perplexity bucket != tail (per-"
    "language thirds under the corpus bigram LM) -> surviving per-"
    "source inventory (docs + whitespace tokens), the input to the "
    "token-budget mixture planner. Each signal is an operator attested "
    "in isolation and makes its own pass over the corpus (the measured "
    "plan scans documents once per signal stage); what crosses stages "
    "is only slim (doc_id, boolean) columns joined into the final "
    "inventory scan. At 100 TB the fusion lever is materializing the "
    "per-doc verdict table once (it is thousands of times smaller than "
    "the text) or computing the map-only Gopher rules inline on the "
    "final scan — the join shape stays identical either way",
)
def x_pipeline_corpus_prep_v3(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    gq = text.gopher_rules(docs).select("doc_id", F.col("keep").alias("__g"))
    clf = text.hashed_classifier_score(docs).select(
        "doc_id", F.col("keep").alias("__c")
    )
    ppl = text.perplexity_buckets(docs).select(
        "doc_id", (F.col("ppl_bucket") != "tail").alias("__p")
    )
    kept = (
        docs.join(gq, "doc_id")
        .join(clf, "doc_id")
        .join(ppl, "doc_id")
        .filter(F.col("__g") & F.col("__c") & F.col("__p"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )


def _px_chan_sql(c: int) -> str:
    """DuckDB expression for channel ``c`` of the md5-derived pixel."""
    return (
        f"CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || "
        f"CAST(k.k AS VARCHAR)), {2 * c + 1}, 2))::UBIGINT AS INT)"
    )


@register(
    "x_multimodal_pixel_stats",
    f"""
    WITH k AS (SELECT unnest(generate_series(0, 15)) AS k),
    px AS (
      SELECT d.doc_id, k.k,
             {_px_chan_sql(0)} AS r, {_px_chan_sql(1)} AS g,
             {_px_chan_sql(2)} AS b, {_px_chan_sql(3)} AS a
      FROM documents d CROSS JOIN k
    )
    SELECT doc_id AS asset_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           round(sum(r) / 16.0, 4) AS mean_r,
           round(sum(g) / 16.0, 4) AS mean_g,
           round(sum(b) / 16.0, 4) AS mean_b,
           round(sum(a) / 16.0, 4) AS mean_a,
           round(sum(r*r) / 16.0 - (sum(r) / 16.0) * (sum(r) / 16.0), 4) AS var_r,
           round(sum(g*g) / 16.0 - (sum(g) / 16.0) * (sum(g) / 16.0), 4) AS var_g,
           round(sum(b*b) / 16.0 - (sum(b) / 16.0) * (sum(b) / 16.0), 4) AS var_b,
           round(sum(a*a) / 16.0 - (sum(a) / 16.0) * (sum(a) / 16.0), 4) AS var_a
    FROM px GROUP BY doc_id
    """,
    bench=True,
    survey_ids=("EXT-multimodal",),
    doc="REAL image decode, oracle-checked: every document gets a "
    "deterministic 4x4 RGBA PNG (pixel channels = md5(doc_id#k) hex "
    "pairs), and the Spark side must survive the full stdlib codec "
    "round trip — zlib IDAT, CRC checks, scanline un-filtering — to "
    "produce per-channel mean/variance that the oracle computes "
    "directly from the md5 rule with no codec at all: a wrong byte "
    "anywhere in the decoder breaks the hash match. Arrow-batched "
    "mapInPandas, one scan, no shuffle until the stats row. The "
    "resize/feature stages downstream of decode_png_pixels consume "
    "ordinary rows; image libs, when present, replace only the codec "
    "body.",
)
def x_multimodal_pixels(spark, sf_dir):
    assets = multimodal.synthetic_png_assets(_t(spark, sf_dir, "documents"))
    return multimodal.image_pixel_features(assets)


@register(
    "x_multimodal_audio_stats",
    """
    WITH i AS (SELECT unnest(generate_series(0, 63)) AS i),
    s AS (
      SELECT d.doc_id, i.i,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '~'
                   || CAST(i.i AS VARCHAR)), 1, 4))::UBIGINT AS INT) - 32768
               AS v
      FROM documents d CROSS JOIN i
    ), lagged AS (
      SELECT doc_id, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id AS asset_id,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(16000 AS BIGINT) AS sample_rate,
           round(sum(v) / 64.0, 4) AS mean_amp,
           round(sum(v * v) / 64.0, 4) AS mean_energy,
           CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM lagged GROUP BY doc_id
    """,
    survey_ids=("EXT-multimodal",),
    doc="REAL audio decode, oracle-checked (the WAV sibling of "
    "x_multimodal_pixel_stats): every document gets a deterministic "
    "64-sample 16-bit PCM clip (sample = md5(doc_id~i) hex - 32768); "
    "Spark survives the full RIFF encode -> chunk-walk -> PCM parse "
    "round trip to produce mean amplitude, mean energy (the silence/"
    "clipping-filter number) and strict zero crossings, while the "
    "oracle computes the same stats straight from the hash rule with "
    "no codec. Arrow-batched mapInPandas, one scan, no shuffle.",
)
def x_multimodal_audio(spark, sf_dir):
    assets = multimodal.synthetic_wav_assets(_t(spark, sf_dir, "documents"))
    return multimodal.audio_sample_features(assets)


def _vpx_chan_sql(c: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '@' || "
        f"CAST(f.f AS VARCHAR) || '#' || CAST(k.k AS VARCHAR)), "
        f"{2 * c + 1}, 2))::UBIGINT AS INT)"
    )


@register(
    "x_multimodal_video_motion",
    f"""
    WITH f AS (SELECT unnest(generate_series(0, 3)) AS f),
    k AS (SELECT unnest(generate_series(0, 15)) AS k),
    px AS (
      SELECT d.doc_id, f.f, k.k,
             {_vpx_chan_sql(0)} AS r, {_vpx_chan_sql(1)} AS g,
             {_vpx_chan_sql(2)} AS b, {_vpx_chan_sql(3)} AS a
      FROM documents d CROSS JOIN f CROSS JOIN k
    ), lagged AS (
      SELECT doc_id, f, r, g, b, a,
             lag(r) OVER w AS pr, lag(g) OVER w AS pg,
             lag(b) OVER w AS pb, lag(a) OVER w AS pa
      FROM px WINDOW w AS (PARTITION BY doc_id, k ORDER BY f)
    ), motion AS (
      SELECT doc_id,
             sum(abs(r - pr) + abs(g - pg) + abs(b - pb) + abs(a - pa))
               AS diffs
      FROM lagged WHERE f > 0 GROUP BY doc_id
    ), bright AS (
      SELECT doc_id, sum(r + g + b) AS s FROM px WHERE f = 0 GROUP BY doc_id
    )
    SELECT m.doc_id AS asset_id,
           CAST(4 AS INT) AS n_frames,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           round(m.diffs / 192.0, 4) AS motion_energy,
           round(br.s / 48.0, 4) AS first_frame_brightness
    FROM motion m JOIN bright br USING (doc_id)
    """,
    survey_ids=("EXT-multimodal",),
    doc="REAL video-shaped decode, oracle-checked: each document gets a "
    "4-frame clip in the repo's minimal container (whole PNGs back to "
    "back, frame pixels = md5(doc_id@f#k)); Spark must parse the "
    "container by walking chunk structure to each IEND, pixel-decode "
    "every frame, and fold frame-to-frame absolute differences into "
    "motion_energy (the static-clip/scene-change signal) — while the "
    "oracle computes the same numbers from the hash rule alone. The "
    "frame explode lives inside the Arrow batch iterator: peak memory "
    "is one clip's frames, the frame_sample geometry at real-decode "
    "fidelity.",
)
def x_multimodal_video(spark, sf_dir):
    assets = multimodal.synthetic_video_assets(_t(spark, sf_dir, "documents"))
    return multimodal.video_motion_features(assets)


def _ann_recall_oracle_sql(n_planes: int = 4) -> str:
    planes = similarity.srp_planes(n_planes, 64, 42)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id ASC
               ) AS rank
        FROM v c, q WHERE c.vec_id <> q.vec_id
      ) WHERE rank <= 10
    ),
    b AS (SELECT vec_id, e, {_sql_bucket(planes)} AS bucket FROM v),
    qb AS (SELECT * FROM b WHERE vec_id < 5),
    ap AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qb.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY qb.vec_id
                 ORDER BY list_cosine_similarity(qb.e, c.e) DESC, c.vec_id ASC
               ) AS rank
        FROM b c JOIN qb ON c.bucket = qb.bucket AND c.vec_id <> qb.vec_id
      ) WHERE rank <= 10
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(any_value(na.n) AS BIGINT) AS n_approx,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS recall
    FROM ex e
    LEFT JOIN ap a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    JOIN (SELECT query_id, count(*) AS n FROM ap GROUP BY 1) na
      ON e.query_id = na.query_id
    GROUP BY e.query_id
    """


@register(
    "x_ann_recall_eval",
    _ann_recall_oracle_sql(),
    survey_ids=("EXT-similarity", "EXT-pipeline"),
    doc="index-quality evaluation as a first-class query: recall@10 of "
    "the LSH-bucketed ANN tier against the exact brute-force top-10, "
    "per query — the number an embedding-index deployment monitors to "
    "decide when to add planes/probes or rebuild. Both tiers are the "
    "already-attested operators; the eval is one (query, neighbor) "
    "equi-join of two k-row-per-query sets, so evaluating the index "
    "costs the price of running it, not of re-deriving ground truth "
    "(at 100 TB: sample the query set, keep the same join shape).",
)
def x_ann_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.lsh_bucket_topk(emb, queries, k=10, n_planes=4).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor")
    )
    na = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["a_neighbor"]),
        "left",
    ).select(exact["query_id"], "neighbor_id", "a_neighbor")
    hit = F.sum(F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0))
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            hit.cast("long").alias("n_hits"),
            F.round(hit / F.count(F.lit(1)), 4).alias("recall"),
        )
        .join(F.broadcast(na), "query_id")
        .select(
            "query_id",
            "n_exact",
            F.col("n_approx").cast("long").alias("n_approx"),
            "n_hits",
            "recall",
        )
    )


@register(
    "t_streaming_psi_drift",
    f"""
    WITH {_PSI_CELLS_CTES}, psi AS (
      SELECT grp, nb, nc, {_PSI_SUM} AS psi
      FROM tot GROUP BY grp, nb, nc HAVING nc > 0
    )
    SELECT grp, CAST(nb AS BIGINT) AS n_baseline,
           CAST(nc AS BIGINT) AS n_current, psi, psi > 0.2 AS drifted,
           CAST(nc AS BIGINT) AS rows_seen
    FROM psi
    """,
    survey_ids=("T1", "EXT-streaming", "K5"),
    doc="the PSI drift monitor as a STANDING query: the baseline "
    "histogram (first half-month) broadcast as a literal, the second "
    "half replayed as a 4-micro-batch stream through an "
    "applyInPandasWithState automaton whose per-key state is 10 bin "
    "counters — fixed size forever; every batch emits the key's "
    "current PSI revision (the live alert feed), and because counter "
    "accumulation is order-invariant the final revision hash-matches "
    "the batch oracle. Bin math, smoothing and rounding identical to "
    "x_events_distribution_drift.",
)
def t_streaming_psi(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    # a NULL routing key has no stream identity (same convention as the
    # KMV/HLL/CMS twins); the oracle drops NULL groups structurally via
    # its USING (grp) bounds join, the driver-side baseline map here
    # cannot hold a NULL key — filter explicitly so both sides agree
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    split = F.lit("2024-01-16").cast("timestamp")
    base = e.filter(F.col("ts") < split)
    bounds = {
        r.grp: (r.lo, r.hi)
        for r in base.groupBy(F.col("event_type").alias("grp"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    width = {g: (hi - lo) / 10.0 for g, (lo, hi) in bounds.items()}
    # degenerate hi==lo baselines: every BASELINE value equals lo, so the
    # width-1.0 floor puts them all in bin 0 — identical to the equality
    # rule (value == lo -> 0) the batch operator and the streaming
    # automaton apply; only CURRENT values can differ from lo, and those
    # are binned inside psi_drift_stateful with the edge-bin rule
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("value") - F.col("__lo")) / F.col("__w")),
            F.lit(0),
        ),
        F.lit(9),
    )
    import itertools

    base_counts: dict = {g: [0] * 10 for g in bounds}
    lo_map = F.create_map(
        *itertools.chain(*[(F.lit(g), F.lit(v[0])) for g, v in bounds.items()])
    )
    w_map = F.create_map(
        *itertools.chain(*[(F.lit(g), F.lit(w if w > 0 else 1.0)) for g, w in width.items()])
    )
    counted = (
        base.withColumn("__lo", lo_map[F.col("event_type")])
        .withColumn("__w", w_map[F.col("event_type")])
        .select(
            F.col("event_type").alias("grp"),
            bin_col.cast("int").alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    for r in counted:
        base_counts[r.grp][r.bin] = r.c
    baseline = {
        g: (bounds[g][0], bounds[g][1], base_counts[g]) for g in bounds
    }
    stream = srt.replayed_stream(
        spark, e.filter(F.col("ts") >= split), n_slices=4, order_col="ts"
    )
    revisions = srt.run_available_now(
        srt.psi_drift_stateful(stream, baseline), output_mode="update"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("rows_seen"))
    return (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@register(
    "x_corpus_source_scorecard",
    f"""
    WITH {_GOPHER_KEEP_CTE},
    {_CLF_RAW_CTE},
    {_PPL_RANK_CTE}
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(CASE WHEN gq.keep THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS gopher_pass_rate,
           round(sum(CASE WHEN c.raw > 0.0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS clf_keep_rate,
           round(avg(c.raw), 4) AS mean_clf_score,
           round(sum(CASE WHEN p.b = 3 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS ppl_tail_rate,
           round(avg(p.mean_logprob), 4) AS mean_logprob
    FROM documents d
    JOIN gq ON d.doc_id = gq.doc_id
    JOIN clf_raw c ON d.doc_id = c.doc_id
    JOIN ppl_ranked p ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
    survey_ids=("EXT-pipeline", "EXT-text", "A1"),
    doc="per-source quality scorecard — the dashboard a curation team "
    "reads to decide which sources to keep, re-weight or drop: Gopher "
    "pass rate, classifier keep rate and mean score, CCNet "
    "perplexity-tail rate and mean LM log-prob, all per source. Pure "
    "composition of the three shared per-doc signal CTEs joined on the "
    "id and folded by one low-cardinality source-keyed aggregation; at "
    "100 TB the per-doc verdict table (thousands of times smaller than "
    "the text) is what feeds this rollup.",
)
def x_corpus_scorecard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    gq = text.gopher_rules(docs).select("doc_id", F.col("keep").alias("__g"))
    clf = text.hashed_classifier_score(docs, include_raw=True).select(
        "doc_id", F.col("clf_raw").alias("__score"), F.col("keep").alias("__c")
    )
    ppl = text.perplexity_buckets(docs).select(
        "doc_id",
        (F.col("ppl_bucket") == "tail").alias("__tail"),
        "mean_logprob",
    )
    joined = (
        docs.select("doc_id", "source")
        .join(gq, "doc_id")
        .join(clf, "doc_id")
        .join(ppl, "doc_id")
    )
    n = F.count(F.lit(1))
    return joined.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.round(F.sum(F.col("__g").cast("int")) / n, 4).alias(
            "gopher_pass_rate"
        ),
        F.round(F.sum(F.col("__c").cast("int")) / n, 4).alias("clf_keep_rate"),
        F.round(F.avg("__score"), 4).alias("mean_clf_score"),
        F.round(F.sum(F.col("__tail").cast("int")) / n, 4).alias(
            "ppl_tail_rate"
        ),
        F.round(F.avg("mean_logprob"), 4).alias("mean_logprob"),
    )


@register(
    "t_streaming_cms_freq",
    """
    WITH counts AS (SELECT user_id AS v, count(*) AS c FROM events
                    WHERE user_id IS NOT NULL GROUP BY 1),
    gridrows AS (
      SELECT v, c, i.i AS i,
             CAST(('0x' || substr(md5(i.i::VARCHAR || ':' || CAST(v AS VARCHAR)),
                                  1, 15))::UBIGINT % 64 AS BIGINT) AS j
      FROM counts, (SELECT unnest(range(0, 4)) AS i) i),
    grid AS (SELECT i, j, sum(c) AS counter FROM gridrows GROUP BY 1, 2),
    est AS (
      SELECT v, min(counter) AS cms_estimate, min(c) AS c
      FROM gridrows JOIN grid USING (i, j) GROUP BY v)
    SELECT v AS user_id, CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(c AS BIGINT) AS n_exact,
           CAST(cms_estimate - c AS BIGINT) AS overestimate
    FROM est
    """,
    survey_ids=("T1", "EXT-sketch", "EXT-streaming"),
    doc="streaming Count-Min frequencies — the third streaming sketch "
    "(after KMV and HLL): events replayed as a 4-micro-batch stream, "
    "each row fanned out map-side (JVM md5 bucketing identical to the "
    "batch sketch) to its depth grid coordinates, and the grid run as "
    "depth parallel keyed automata of width counters each — fixed "
    "state forever, order-invariant addition, so the final grid "
    "revision equals the batch grid and per-value estimates (min over "
    "a value's d bucket counters) hash-match the batch oracle exactly.",
)
def t_streaming_cms(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events")
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    revisions = srt.run_available_now(
        srt.cms_grid_stateful(stream), output_mode="update"
    )
    w = Window.partitionBy("i", "j").orderBy(F.desc("rows_seen"))
    grid = (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("i", "j", "counter")
    )
    # read the final grid: bucket every distinct value and take the min
    # over its depth counters; exact counts join in for the error columns
    # (same shape as the batch countmin_freq oracle path)
    vals = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    bucketed = vals.select(
        "v",
        "n_exact",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
    ).withColumn(
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit(":"),
                            F.col("v").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 64
        ).cast("int"),
    )
    return (
        bucketed.join(F.broadcast(grid), ["i", "j"])
        .groupBy("v", "n_exact")
        .agg(F.min("counter").cast("long").alias("cms_estimate"))
        .select(
            F.col("v").alias("user_id"),
            "cms_estimate",
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.col("cms_estimate") - F.col("n_exact"))
            .cast("long")
            .alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# round 7: calibration / profiling trio — the queries a pipeline operator
# runs BEFORE committing to filter thresholds, partition plans and storage
# layouts (registered after the r7 driver window filled; see the
# REGISTERED_AFTER_WINDOW note in plans/catalog.py)
# ---------------------------------------------------------------------------


@register(
    "x_quality_threshold_sweep",
    f"""
    WITH {_CLF_RAW_CTE},
    grid AS (SELECT unnest([-0.1, -0.05, 0.0, 0.05, 0.1]::DOUBLE[])
             AS threshold)
    SELECT g.threshold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c.raw > g.threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN c.raw > g.threshold THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS keep_rate
    FROM clf_raw c CROSS JOIN grid g
    GROUP BY g.threshold
    """,
    bench=True,  # r7 headline addition (added_in_r07 subtotal)
    survey_ids=("EXT-text", "EXT-pipeline", "A1"),
    doc="classifier-threshold calibration curve: keep rate of the hashed "
    "quality classifier at each of five candidate thresholds — the sweep "
    "a curation run reads to pick the cut that hits a target retention "
    "(e.g. 'keep ~30%%'). One scan scores every doc (the same exact "
    "fixed-point pipeline as x_quality_clf_score), the 5-row threshold "
    "grid broadcasts into a cross join, and one 5-group aggregation "
    "folds it; comparisons use the UNROUNDED score against identical "
    "double literals in both engines, so boundary rows cannot flip. At "
    "100 TB the sweep costs one classifier pass regardless of how many "
    "thresholds are probed.",
)
def x_quality_threshold_sweep(spark, sf_dir):
    thresholds = [-0.1, -0.05, 0.0, 0.05, 0.1]
    scored = text.hashed_classifier_score(
        _t(spark, sf_dir, "documents"), include_raw=True
    ).select("doc_id", "clf_raw")
    grid = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    n = F.count(F.lit(1))
    kept = F.sum((F.col("clf_raw") > F.col("threshold")).cast("int"))
    return (
        scored.select("clf_raw", grid)
        .groupBy("threshold")
        .agg(
            n.cast("long").alias("n_docs"),
            kept.cast("long").alias("n_kept"),
            F.round(kept / n, 4).alias("keep_rate"),
        )
    )


@register(
    "x_corpus_length_histogram",
    """
    SELECT source,
           CAST(CASE WHEN n_chars = 0 THEN 0
                ELSE length(bin(n_chars)) END AS INT) AS bucket,
           CAST(CASE WHEN n_chars = 0 THEN 0
                ELSE (1::BIGINT << (length(bin(n_chars)) - 1)) END AS BIGINT)
             AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2, 3
    """,
    survey_ids=("EXT-pipeline", "A6"),
    doc="per-source power-of-two document-length histogram: bucket = bit "
    "length of n_chars (doc in [2^(b-1), 2^b)), the corpus profile that "
    "drives sequence-packing bin sizes, maxPartitionBytes tuning and "
    "truncation policy. Integer-exact by construction — the bucket is "
    "the length of the binary string both engines print for n_chars, so "
    "no float log2 boundary can flip a power-of-two doc. One scan, one "
    "low-cardinality partial-aggregated shuffle.",
)
def x_corpus_length_histogram(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bits = F.length(F.bin(F.col("n_chars")))
    bucket = F.when(F.col("n_chars") == 0, F.lit(0)).otherwise(bits).cast("int")
    lo = (
        F.when(F.col("n_chars") == 0, F.lit(0))
        .otherwise(
            F.expr("shiftleft(cast(1 as bigint), cast(length(bin(n_chars)) - 1 as int))")
        )
        .cast("long")
    )
    return (
        d.select("source", bucket.alias("bucket"), lo.alias("bucket_lo"), "n_chars")
        .groupBy("source", "bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "x_events_key_skew_profile",
    """
    WITH counts AS (
      SELECT event_type AS grp, user_id AS k, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT grp, c,
             row_number() OVER (PARTITION BY grp ORDER BY c DESC, k ASC) AS rn
      FROM counts
    )
    SELECT grp,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(max(CASE WHEN rn = 1 THEN c ELSE 0 END) * 1.0 / sum(c), 4)
             AS top1_share,
           round(sum(CASE WHEN rn <= 10 THEN c ELSE 0 END) * 1.0 / sum(c), 4)
             AS top10_share,
           (max(CASE WHEN rn = 1 THEN c ELSE 0 END) * 1.0 / sum(c)) > 0.2
             AS salt_recommended
    FROM ranked
    GROUP BY grp
    """,
    bench=True,  # r7 headline addition (added_in_r07 subtotal)
    survey_ids=("EXT-pipeline", "A1", "A7"),
    doc="join/agg-key skew diagnostics per stream: distinct-key count and "
    "the row share of the hottest 1 and 10 keys, plus the salt flag the "
    "skew playbook (operators/skew.py, SCALE.md) keys off — the profile "
    "you run BEFORE choosing partitioning for a new 100 TB feed. All "
    "shares are single divisions of exact integer counts (deterministic "
    "across engines); the plan is one key-count aggregation plus a "
    "per-group top-k fold over count rows, never raw rows.",
)
def x_events_key_skew_profile(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy(
        F.col("event_type").alias("grp"), F.col("user_id").alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc("k"))
    ranked = counts.withColumn("rn", F.row_number().over(w))
    total = F.sum("c")
    top1 = F.max(F.when(F.col("rn") == 1, F.col("c")).otherwise(F.lit(0)))
    top10 = F.sum(F.when(F.col("rn") <= 10, F.col("c")).otherwise(F.lit(0)))
    return ranked.groupBy("grp").agg(
        total.cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(top1 / total, 4).alias("top1_share"),
        F.round(top10 / total, 4).alias("top10_share"),
        ((top1 / total) > 0.2).alias("salt_recommended"),
    )


@register(
    "h16_supplier_part_breadth",
    """
    WITH excluded AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 20
    """,
    bench=True,  # r7 headline addition (added_in_r07 subtotal)
    survey_ids=("A1", "J1", "L4"),
    doc="TPC-H Q16-shaped supplier-breadth report: distinct suppliers per "
    "(brand, type, size) after excluding a blocklisted supplier set — "
    "the NOT-IN anti-join + DISTINCT-aggregation + multi-column-group "
    "plan family Q16 exists to exercise. Scale shape: the exclusion "
    "list and the part dimension BROADCAST (anti-join and equi-join "
    "pay no fact shuffle); the fact then shuffles once for the "
    "two-phase distinct (partial dedup map-side), and the top-20 is a "
    "TakeOrdered, never a global sort.",
)
def h16_supplier_breadth(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    excluded = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(
            F.broadcast(excluded),
            l["l_suppkey"] == excluded["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(20)
    )


@register(
    "x_pipeline_epoch_shuffle",
    """
    WITH ranked AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
               AS rk
      FROM documents d, (SELECT unnest(range(0, 2)) AS epoch) e
    ),
    pos AS (
      SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch ORDER BY rk) AS position
      FROM ranked
    )
    SELECT CAST(epoch AS INT) AS epoch, CAST(position AS BIGINT) AS position,
           doc_id
    FROM pos WHERE position <= 50
    ORDER BY epoch, position
    """,
    survey_ids=("EXT-pipeline", "L3"),
    doc="deterministic per-epoch corpus shuffle: training order for epoch "
    "e is the sort of md5(e || ':' || doc_id) — reshuffled every epoch, "
    "reproducible from (seed, id) alone, no RNG state to checkpoint. "
    "The query materializes the first 50 positions of two epochs as "
    "proof. At 100 TB you never globally sort: repartitionByRange on "
    "the hash key gives ~uniform shards whose concatenation IS the "
    "epoch order, and the window here becomes a per-shard "
    "monotonically_increasing position — the hash ordering is the "
    "whole trick.",
)
def x_pipeline_epoch_shuffle(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    epochs = F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    ranked = d.select("doc_id").select(epochs, "doc_id").withColumn(
        "rk",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
            )
        ),
    )
    w = Window.partitionBy("epoch").orderBy("rk")
    return (
        ranked.withColumn("position", F.row_number().over(w).cast("long"))
        .filter(F.col("position") <= 50)
        .select(F.col("epoch").cast("int").alias("epoch"), "position", "doc_id")
    )


@register(
    "x_dedup_recall_eval",
    f"""
    WITH {_MINHASH_CTES},
    exact AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_pairs,
           CAST((SELECT count(*) FROM mh_pairs) AS BIGINT) AS n_lsh_pairs,
           round((SELECT count(*) FROM mh_pairs) * 1.0
                 / greatest((SELECT count(*) FROM exact), 1), 4) AS recall
    """,
    survey_ids=("EXT-dedup", "A1"),
    doc="dedup-index quality eval as a first-class query (the dedup twin "
    "of x_ann_recall_eval): recall of the MinHash+LSH banding against "
    "exact all-pairs Jaccard >= 0.8 ground truth. LSH precision is 1.0 "
    "by construction (the verify stage recomputes true Jaccard), so "
    "banding recall is the one number that monitors the index — run it "
    "on a sample after every signature/banding change. greatest(.,1) "
    "guards the empty-corpus division (ANSI-safe on both engines). The "
    "eval self-samples: above sample_cap docs, a deterministic "
    "xxhash64 id-sample (operators/dedup.py::hash_sample) bounds BOTH "
    "sides before any pair join, so a naive invocation on a full-size "
    "corpus can never go quadratic. ORACLE PARITY BOUNDARY: the SQL "
    "oracle has no xxhash64, so it always evaluates the FULL corpus — "
    "the hash contract therefore holds exactly for corpora within "
    "sample_cap (every checked fixture: sf0.01 is ~5k docs, the fuzz "
    "corpora ~120); above the cap the query is BY DESIGN a sampled "
    "estimate of the same recall, and the oracle is not comparable.",
)
def x_dedup_recall_eval(spark, sf_dir, sample_cap=50_000):
    docs = dedup.hash_sample(_t(spark, sf_dir, "documents"), sample_cap)
    exact = dedup.jaccard_pairs(docs, threshold=0.8)
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.8)
    n_exact = exact.count()
    n_lsh = lsh.count()
    # two bounded counts -> one literal row (the eval is a scalar report;
    # counts are distributed, only the 2 totals reach the driver)
    return _t(spark, sf_dir, "region").limit(1).select(
        F.lit(n_exact).cast("long").alias("n_exact_pairs"),
        F.lit(n_lsh).cast("long").alias("n_lsh_pairs"),
        F.round(F.lit(float(n_lsh) / max(n_exact, 1)), 4).alias("recall"),
    )


@register(
    "x_events_heavy_hitters",
    """
    WITH counts AS (
      SELECT event_type AS grp, user_id AS val, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT grp, val, c,
             sum(c) OVER (PARTITION BY grp) AS n,
             row_number() OVER (PARTITION BY grp
                                ORDER BY c DESC, val ASC NULLS LAST)
               AS rnk
      FROM counts
    )
    SELECT grp, CAST(rnk AS INT) AS rnk, val, CAST(c AS BIGINT) AS cnt,
           round(c * 1.0 / n, 4) AS share,
           (c * 9 > n) AS mg_guaranteed
    FROM ranked
    WHERE rnk <= 8
    """,
    survey_ids=("EXT-pipeline", "A7", "L4"),
    doc="exact per-stream heavy hitters: the batch twin of the streaming "
    "Misra-Gries automaton (streaming/runtime.py heavy_hitters_stateful, "
    "k=8) — top-8 values per key with exact counts, row share, and the "
    "mg_guaranteed flag marking values the MG summary PROVABLY retains "
    "(true frequency > N/(k+1), i.e. 9c > N in exact integers — no "
    "float compare crosses the engine boundary). The stream keeps "
    "bounded state forever; this query is the exact answer you "
    "reconcile it against, and the only heavy-hitter form a hash "
    "oracle can check (the MG survivor SET is arrival-order-dependent "
    "in tie cases). Plan: one key-count aggregation, then window "
    "top-k + share over COUNT rows only, never raw rows.",
)
def x_events_heavy_hitters(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy(
        F.col("event_type").alias("grp"), F.col("user_id").alias("val")
    ).agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("grp")
    # explicit NULLS LAST: Spark's asc default is nulls-first, DuckDB's
    # is nulls-last — a NULL group key tying on count would swap ranks
    wr = Window.partitionBy("grp").orderBy(F.desc("c"), F.asc_nulls_last("val"))
    return (
        counts.withColumn("n", F.sum("c").over(wn))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 8)
        .select(
            "grp",
            F.col("rnk").cast("int").alias("rnk"),
            "val",
            F.col("c").cast("long").alias("cnt"),
            F.round(F.col("c") * 1.0 / F.col("n"), 4).alias("share"),
            (F.col("c") * 9 > F.col("n")).alias("mg_guaranteed"),
        )
    )


@register(
    "h18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN big b ON o.o_orderkey = b.l_orderkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    bench=True,  # r8 headline addition (added_in_r08 subtotal)
    survey_ids=("A1", "J1", "L4"),
    doc="TPC-H Q18-shaped large-volume-customer report: aggregate the "
    "fact, HAVING-filter to the rare heavy orders, then join the "
    "survivors BACK to orders and customer — the "
    "aggregate-then-semi-join-back plan family Q18 exists to exercise. "
    "Scale shape: one fact shuffle for the per-order quantity sum "
    "(partial map-side), after which the HAVING survivors are tiny and "
    "BROADCAST into orders, and the resulting rare-order set is in turn "
    "broadcast into customer (the DIMENSION is never the broadcast side "
    "— at SF100k customer is billions of rows), so no second fact-sized "
    "shuffle exists and the top-20 is a TakeOrdered. Quantities are "
    "integer-valued doubles, so the sums and the >200 threshold are "
    "exact on both engines. The survivor set grows O(SF), so the "
    "broadcast is SIZE-GUARDED by design rather than by AQE surprise: "
    "the survivors are localCheckpoint-ed (one fact shuffle, reused by "
    "both the count and the join), and above broadcast_limit rows the "
    "hint is dropped so the plan degrades to a shuffle join on the "
    "already-tiny-relative-to-fact survivor set.",
)
def h18_large_volume(spark, sf_dir, broadcast_limit=5_000_000):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
        # materialize the survivors ONCE: the count below and the join
        # both read the checkpoint, never a second fact-sized shuffle
        .localCheckpoint(eager=True)
    )
    n_big = big.count()  # O(survivors), served from the checkpoint

    def _rare(df):
        # explicit guard, not AQE: survivors are O(SF), so past the limit
        # the broadcast hint is dropped and Spark plans a shuffle join
        return F.broadcast(df) if n_big <= broadcast_limit else df

    # broadcast DIRECTION matters at scale: the HAVING survivors (and the
    # orders they select) are the rare side — broadcast THEM into the
    # full-size customer dimension, never the dimension itself
    ob = o.join(_rare(big), o["o_orderkey"] == big["l_orderkey"])
    return (
        c.join(_rare(ob), ob["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "h21_waiting_supplier",
    """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey IS DISTINCT FROM l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey IS DISTINCT FROM l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    bench=True,  # r8 headline addition (added_in_r08 subtotal)
    survey_ids=("A1", "J1", "F5", "L4"),
    doc="TPC-H Q21-shaped waiting-supplier report (l_shipdate 30+ days "
    "past order date stands in for the receipt-commit lateness; the "
    "reference schema has no receiptdate): suppliers who were the SOLE "
    "late supplier on a multi-supplier finished order. The oracle keeps "
    "Q21's literal double correlation (EXISTS + NOT EXISTS against the "
    "same fact); the Spark plan REFORMULATES it as one per-order "
    "aggregation — distinct suppliers, distinct LATE suppliers, and "
    "the single late suppkey captured in the same pass — because two "
    "correlated re-scans of a 100 TB fact is exactly the plan you "
    "cannot run. One orderkey join + one grouped shuffle replaces both "
    "correlations; rows with NULL suppkey count via the null-safe "
    "distinct-from in the oracle and a when() guard here. Supplier "
    "lookup broadcasts; top-10 is a TakeOrdered.",
)
def h21_waiting_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", late.alias("__late")
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("__ns"),
        (F.max(F.col("l_suppkey").isNull().cast("int")) == 1).alias("__has_null"),
        F.count_distinct(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).alias("__nl"),
        (
            F.max((F.col("__late") & F.col("l_suppkey").isNull()).cast("int")) == 1
        ).alias("__null_late"),
        F.max(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__late_supp"),
        # Q21's count(*) counts qualifying LINE ITEMS, not orders: when
        # the sole late supplier shipped several late lines in one order,
        # each line waits
        F.sum(F.col("__late").cast("int")).alias("__n_late_rows"),
    )
    # the sole late supplier of a multi-supplier order: distinct-supplier
    # count must include the NULL "supplier" (IS DISTINCT FROM semantics
    # in the oracle), and a late NULL row disqualifies soleness
    waiting = per_order.filter(
        ((F.col("__ns") + F.col("__has_null").cast("int")) > 1)
        & (F.col("__nl") == 1)
        & ~F.col("__null_late")
    )
    return (
        waiting.join(
            F.broadcast(s), waiting["__late_supp"] == s["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.sum("__n_late_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §3.5/§2.12 the deployable statements file as an ORACLE-CHECKED plan: both
# queries below build their ENTIRE plan from SQL text through Engine.sql_script
# — the reference's ksqldb-statements.sql flow (source declarations with a
# column-list contract, CSAS chain, windowed CTAS with the reference's WINDOW
# clause), no Python DataFrame construction anywhere
# ---------------------------------------------------------------------------


@register(
    "q_sql_csas_unhappy",
    """
    SELECT e.event_id, e.user_id, e.event_type, e.value,
           c.c_name || ' ' || c.c_mktsegment AS customer_label
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE lower(e.event_type) NOT LIKE '%err%'
      AND e.value < 50.0 AND c.c_mktsegment = 'BUILDING'
    """,
    survey_ids=("J1", "F3", "F4", "F5", "T6", "§2.12"),
    doc="UNHAPPY_PLATINUM_CUSTOMERS built PURELY from SQL text: a "
    "transliterated ksqldb-statements.sql (source STREAM/TABLE "
    "declarations over the test parquet, the RATINGS_LIVE split, the "
    "enrichment CSAS, the unhappy CSAS with PARTITION BY re-key and "
    "EMIT CHANGES) replayed through Engine.sql_script (reference: "
    "ksqldb-statements.sql:13-17,42-45,50-68). The plan Catalyst sees "
    "is identical to the Python-API twin (unhappy_vip_customers): the "
    "dimension broadcasts, the fact side never shuffles for the join.",
)
def q_sql_csas_unhappy(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.engine import Engine

    eng = Engine(spark)
    return eng.sql_script(
        f"""
        SET 'auto.offset.reset' = 'earliest';

        CREATE STREAM SQLF_RATINGS (event_id BIGINT, ts TIMESTAMP,
                                    user_id BIGINT, event_type STRING,
                                    value DOUBLE)
          WITH (path='{sf_dir}/events.parquet', format='parquet',
                timestamp='ts');

        CREATE TABLE SQLF_CUSTOMERS (c_custkey BIGINT PRIMARY KEY,
                                     c_name STRING, c_mktsegment STRING)
          WITH (path='{sf_dir}/customer.parquet', format='parquet');

        -- RATINGS_LIVE: drop test-like traffic (statements.sql:13-14)
        CREATE STREAM SQLF_RATINGS_LIVE AS
          SELECT event_id, ts, user_id, event_type, value
          FROM SQLF_RATINGS
          WHERE lcase(event_type) NOT LIKE '%err%' EMIT CHANGES;

        -- the enrichment join (statements.sql:50-60)
        CREATE STREAM SQLF_ENRICHED WITH (timestamp='ts') AS
          SELECT r.event_id, r.user_id, r.event_type, r.value,
                 c.c_name, c.c_mktsegment,
                 c.c_name || ' ' || c.c_mktsegment AS customer_label
          FROM SQLF_RATINGS_LIVE r
          LEFT JOIN SQLF_CUSTOMERS c ON r.user_id = c.c_custkey
          WHERE c.c_name IS NOT NULL EMIT CHANGES;

        -- the alert slice, re-keyed (statements.sql:63-68)
        CREATE STREAM SQLF_UNHAPPY AS
          SELECT event_id, user_id, event_type, value, customer_label
          FROM SQLF_ENRICHED
          WHERE value < 50.0 AND c_mktsegment = 'BUILDING'
          PARTITION BY customer_label;
        """
    )[-1]


@register(
    "q_sql_windowed_ctas",
    """
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS event_count
    FROM events GROUP BY 1, 2
    """,
    survey_ids=("A3", "T2", "X5", "§2.12"),
    doc="the reference's windowed CTAS as SQL TEXT: CREATE TABLE ... "
    "WINDOW TUMBLING (SIZE 15 MINUTE) GROUP BY ... (reference: "
    "ksqldb-statements.sql:88-93) rewritten mechanically to Spark's "
    "window() grouping with WINDOWSTART exposed as a column, then "
    "formatted with the TIMESTAMPTOSTRING twin (statements.sql:96). "
    "Same single-shuffle partial+final aggregate as the a3 Python twin.",
)
def q_sql_windowed_ctas(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.engine import Engine

    eng = Engine(spark)
    return eng.sql_script(
        f"""
        CREATE STREAM SQLF_RATINGS_W (event_id BIGINT, ts TIMESTAMP,
                                      event_type STRING)
          WITH (path='{sf_dir}/events.parquet', format='parquet',
                timestamp='ts');

        CREATE TABLE SQLF_PER_TYPE_15M AS
          SELECT event_type, count(*) AS event_count
          FROM SQLF_RATINGS_W
          WINDOW TUMBLING (SIZE 15 MINUTE)
          GROUP BY event_type EMIT CHANGES;

        SELECT date_format(windowstart, 'yyyy-MM-dd HH:mm:ss')
                 AS window_start,
               event_type, event_count
        FROM SQLF_PER_TYPE_15M EMIT CHANGES;
        """
    )[-1]


@register(
    "x_acid_sized_compaction",
    """
    WITH p AS (
      SELECT event_id, user_id % 5 AS seg,
             CAST(round(value * 10000) AS BIGINT) AS vq
      FROM events WHERE event_type = 'purchase'
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM p GROUP BY seg
    """,
    survey_ids=("§2.12", "EXT-streaming"),
    doc="size-targeted bin-packed compaction attested by a SQL oracle: "
    "one bulk append plus a tail of tiny appends fragment the table, "
    "the recorded optimize.target_file_bytes policy routes a plain "
    "OPTIMIZE statement through the bounded pass (only the small-file "
    "debt rewrites — the bulk file is asserted untouched in the body, "
    "the Delta OPTIMIZE shape), and the final rollup must equal the "
    "oracle over the raw rows: maintenance is a pure layout change. "
    "At 100 TB this is the difference between an O(small-debt) "
    "maintenance pass and an O(table) rewrite.",
)
def x_acid_sized_compaction(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.engine import Engine

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_sized_")
    try:
        eng = Engine(spark)
        t = eng.create_acid_table(
            "szc_t", f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=1,
        )
        # bulk file + a fragmented tail of tiny appends
        t.append(p.filter(F.col("event_id") % 10 < 8))
        for b in (8, 9):
            t.append(p.filter(F.col("event_id") % 10 == b))
        bulk = max(t._snapshot_adds(), key=lambda a: a["bytes"])
        t.set_property("optimize.target_file_bytes", str(bulk["bytes"]))
        v = eng.sql("OPTIMIZE szc_t").first().version
        live = {a["path"] for a in t._snapshot_adds()}
        assert v is not None and bulk["path"] in live, (
            "bounded compaction must rewrite only the small-file debt"
        )
        snapshot = (
            t.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "x_acid_merge_sql",
    """
    WITH p AS (
      SELECT event_id, user_id % 5 AS seg,
             CAST(round(value * 10000) AS BIGINT) AS vq,
             event_id % 10 AS b
      FROM events WHERE event_type = 'purchase'
    ),
    merged AS (
      SELECT event_id, seg,
             CASE WHEN b >= 8 THEN vq + 10000 ELSE vq END AS vq
      FROM p WHERE NOT (b >= 8 AND vq > 900000)
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(vq) / 10000.0, 4) AS sum_value
    FROM merged GROUP BY seg
    """,
    survey_ids=("T7", "§2.12", "EXT-streaming"),
    doc="MERGE INTO through the SQL string surface, oracle-attested: "
    "the base purchases land in an ACID table, then one MERGE INTO "
    "statement (USING a derived view, keyed ON, tombstone clause) "
    "upserts the b>=8 slice with vq+1.0 and deletes its vq>90 outliers "
    "— the keyed transactional merge with stats-pruned file rewrites. "
    "The rollup must equal the oracle's CASE/anti-filter over raw rows. "
    "Column types cast to the recorded schema (Delta's MERGE rule); "
    "the tombstone flag is control metadata and never lands.",
)
def x_acid_merge_sql(spark, sf_dir):
    import shutil
    import tempfile

    from data_pipeline_kafka_ek_spark.engine import Engine

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(5)).alias("seg"),
        F.round(F.col("value") * 10000).cast("long").alias("vq"),
    ).localCheckpoint(eager=True)
    scratch = tempfile.mkdtemp(prefix="spark_graft_acid_msql_")
    try:
        eng = Engine(spark)
        t = eng.create_acid_table(
            "msql_t", f"{scratch}/tbl", key="event_id", order_col="vq",
            files_per_commit=2,
        )
        t.append(p)
        p.filter(F.pmod(F.col("event_id"), F.lit(10)) >= 8).select(
            "event_id",
            "seg",
            (F.col("vq") + 10000).alias("vq"),
            (F.col("vq") > 900000).alias("gone"),
        ).createOrReplaceTempView("msql_changes")
        eng.sql(
            "MERGE INTO msql_t USING msql_changes AS s "
            "ON msql_t.event_id = s.event_id "
            "WHEN MATCHED AND s.gone THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        snapshot = (
            t.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("vq") / F.lit(10000.0), 4).alias("sum_value"),
            )
        )
        return spark.createDataFrame(snapshot.collect(), snapshot.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# §2.5 three more TPC-H plan FAMILIES the engine should speak (each a shape
# the prior h-queries do not cover: correlated aggregate threshold,
# disjunctive mixed-table predicates, distribution-of-counts over an outer
# join with an ON-clause filter)
# ---------------------------------------------------------------------------


@register(
    "h17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 5
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    survey_ids=("J1", "A1"),
    doc="TPC-H Q17-shaped correlated aggregate threshold: revenue from "
    "orders below 20% of the part's average quantity. Spark shape: the "
    "filtered part slice BROADCASTS into the fact scan, the per-part "
    "average is computed once over that joined subset (the correlation "
    "key is the join key, so the correlated subquery decorrelates to a "
    "per-partkey window average over the SAME joined slice) — the "
    "100 TB fact is scanned ONCE; the only exchange re-keys the "
    "brand-filtered slice by part for the window, never the full fact.",
)
def h17_small_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5)
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .withColumn("__qty_cap", F.avg("l_quantity").over(w) * 0.2)
        .filter(F.col("l_quantity") < F.col("__qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "h19_disjunctive_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    survey_ids=("J1", "F5", "A1"),
    doc="TPC-H Q19-shaped disjunctive mixed-table predicate: three OR "
    "branches, each constraining BOTH sides of the join. Catalyst "
    "factors the per-table implications of the disjunction out of the "
    "OR (constraint propagation): the part scan prunes to the three "
    "brands and the fact scan to the union quantity range BEFORE the "
    "join, with the residual OR evaluated on the joined row — the "
    "plan-shape test for 'does a disjunction still push down'. Part "
    "slice broadcasts; the fact never shuffles.",
)
def h19_disjunctive(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "h13_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority NOT LIKE '%URGENT%'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    survey_ids=("J1", "A1", "F1"),
    doc="TPC-H Q13-shaped distribution of counts: how many customers "
    "placed k qualifying orders, INCLUDING the zero-order customers — "
    "which is exactly why the priority filter lives in the LEFT JOIN's "
    "ON clause, not WHERE (a WHERE would silently drop the k=0 row, "
    "the classic Q13 bug). Spark shape: the customer side broadcasts "
    "at fixture scale (at 100 TB both sides bucket on the customer key "
    "and the join+count share one exchange); the distribution aggregate "
    "and its sort run over the tiny distinct-count-values table. "
    "count(o_orderkey) counts non-NULL matches only, per SQL.",
)
def h13_order_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & ~F.col("o_orderpriority").like("%URGENT%"),
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# §2.5 r13: the remaining TPC-H plan families expressible over this dataset
# (no partsupp table exists in the fixtures, so Q2/Q9/Q11/Q20 adapt their
# supplier-part linkage through lineitem — the PLAN SHAPES are the point:
# zero-shuffle scan-agg, nation-pair volume, market share, decorrelated
# min, scalar-threshold HAVING, max-revenue view, grouped semi-join,
# anti-join + scalar avg)
# ---------------------------------------------------------------------------


@register(
    "h6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    survey_ids=("F3", "F5", "A8"),
    doc="TPC-H Q6-shaped forecast revenue: a pure filter+aggregate with "
    "no hash exchange — every predicate (date range, discount band, "
    "quantity cap) pushes to the parquet scan as a PushedFilter, the "
    "sum folds map-side into one partial per partition and the only "
    "exchange is the single-partition final merge. The canonical 'is the scan doing the work' probe: at "
    "100 TB this reads only row groups whose min/max overlap the one "
    "ship-year and never moves a row between executors.",
)
def h6_forecast(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # h9's exact-grid idiom: snap each row to an integer 1e-4 grid
            # so the SUM is order-independent and the one final division
            # is bit-identical across engines (no engine-side round)
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.col("l_discount") * 10000
                        + 0.5
                    ).cast("long")
                ).cast("double")
                / F.lit(10000.0)
            ).alias("revenue")
        )
    )


@register(
    "h7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_e4) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
               AS BIGINT) AS volume_e4
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    bench=True,
    survey_ids=("J1", "A1", "F5"),
    doc="TPC-H Q7-shaped bilateral shipping volume: revenue between two "
    "nations by direction and ship year. Spark shape: the big-big "
    "lineitem-orders join shuffles ONCE on the order key; supplier, "
    "customer, and both nation probes broadcast (the nation-pair "
    "disjunction cannot pre-prune either big side alone — it resolves "
    "on the joined row, the same constraint-propagation family as "
    "h19); the final rollup groups a handful of (nation, nation, "
    "year) cells. At 100 TB the orderkey shuffle is the one "
    "unavoidable exchange; everything else rides broadcasts.",
)
def h7_volume_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.withColumn(
            "l_year", F.year("l_shipdate").cast("long")
        )
        .withColumn(
            # h9's exact-grid idiom: per-row 1e-4 integer snap makes the
            # SUM order-independent across engines
            "volume_e4",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                + 0.5
            ).cast("long"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum("volume_e4").cast("double") / F.lit(10000.0)).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "h8_market_share",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4
                         ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume_e4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
               AS BIGINT) AS volume_e4,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    survey_ids=("J1", "A1", "X6"),
    doc="TPC-H Q8-shaped market share: one nation's fraction of regional "
    "revenue for a part type, by order year. Spark shape: the share is "
    "a conditional-sum-over-sum inside ONE aggregation (never two "
    "passes); part/supplier/customer/nation/region all broadcast into "
    "the fact, the lineitem-orders shuffle on the order key is the "
    "single big exchange. The region and part-type predicates prune "
    "their broadcast sides before the join, so the fact rows that "
    "survive are the regional slice only.",
)
def h8_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
    )
    # h9's exact-grid idiom: integer 1e-4 snaps make both sums order-
    # independent; the single long/long-as-double division is then
    # bit-identical across engines, so no engine-side round is needed
    vol_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume_e4", vol_e4)
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3",
                        F.col("volume_e4"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume_e4").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "h9_product_profit",
    """
    SELECT nation, o_year,
           CAST(sum(amount_e4) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(floor((l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity) * 10000 + 0.5)
               AS BIGINT) AS amount_e4
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    survey_ids=("J1", "A1", "F2"),
    doc="TPC-H Q9-shaped product-line profit by supplier nation and "
    "order year (no partsupp table exists in the fixtures, so supply "
    "cost adapts to a retail-price fraction — the PLAN is the point). "
    "Spark shape: the name-LIKE pruned part slice, supplier, and "
    "nation broadcast; lineitem-orders shuffle once on the order key; "
    "the profit expression folds into the scan projection. The classic "
    "Q9 killer — joining the fact to itself per dimension — never "
    "appears: one fact pass, one exchange, |nations|x|years| output "
    "cells.",
)
def h9_product_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    # exact-grid amounts: engines summing doubles in different orders (and
    # rounding ties differently) can land a cent apart, so each row snaps
    # to an integer 1e-4 grid with floor(x*1e4 + 0.5) — identical IEEE ops
    # on identical inputs — and the SUM is an order-independent integer
    amount = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000
        + 0.5
    ).cast("long")
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("amount_e4").cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "h2_min_acctbal_supplier",
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM (
      SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name,
             p.p_partkey, p.p_type,
             min(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size <= 5 AND r.r_name = 'ASIA'
    )
    WHERE s_acctbal = min_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    bench=True,
    survey_ids=("J1", "F3", "L4"),
    doc="TPC-H Q2-shaped minimum-cost supplier (adapted: the part-"
    "supplier linkage rides lineitem because no partsupp table exists; "
    "the correlated MIN subquery is the shape under test). The "
    "correlation key IS the join key, so the subquery decorrelates to "
    "a per-partkey window MIN over the same joined slice — the h17 "
    "rule — after DISTINCT-ing the (part, supplier) pairs the shipment "
    "fan-out duplicates. One fact scan; the size-pruned part slice and "
    "the region-pruned supplier side broadcast; the only exchanges are "
    "the distinct and the window re-key, both on the part key.",
)
def h2_min_acctbal_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    pairs = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(sn), sn["s_suppkey"] == li["l_suppkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .distinct()
    )
    w = Window.partitionBy("p_partkey")
    return (
        pairs.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .drop("min_bal")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "h11_important_parts",
    """
    WITH v AS (
      SELECT l.l_partkey,
             sum(l.l_extendedprice * l.l_quantity) AS raw_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey = 2
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(raw_value, 2) AS value
    FROM v
    WHERE raw_value > (SELECT sum(raw_value) * 0.005 FROM v)
    ORDER BY value DESC, l_partkey
    """,
    survey_ids=("A1", "F3", "L3"),
    doc="TPC-H Q11-shaped important stock: parts whose shipped value "
    "through one region's suppliers exceeds a fraction of the regional "
    "total (partsupp adapts to lineitem). The threshold is a scalar of "
    "the SAME aggregation, so the per-part rollup computes ONCE and is "
    "persisted (it is |parts|-bounded — KB per million parts), the "
    "grand total reduces from the persisted slice, and the filter is a "
    "broadcast scalar join — the fact is scanned exactly once at any "
    "scale. Raw (un-rounded) values feed both the threshold comparison "
    "and the total so rounding never flips a boundary row.",
)
def h11_important_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    per_part = (
        li.join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * F.col("l_quantity")
            ).alias("raw_value")
        )
        # returned-plan persist (same convention as dedup.py's token
        # sets): tracked for release — the consumer that materializes
        # the query drains the pending-cache list (caching.py)
        .persist()
    )
    per_part = track(per_part)
    cap = per_part.agg(
        (F.sum("raw_value") * F.lit(0.005)).alias("__cap")
    )
    return (
        per_part.crossJoin(F.broadcast(cap))
        .filter(F.col("raw_value") > F.col("__cap"))
        .select(
            "l_partkey", F.round("raw_value", 2).alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "h15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS raw_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(r.raw_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.raw_revenue = (SELECT max(raw_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    survey_ids=("A1", "J1", "L4"),
    doc="TPC-H Q15-shaped top supplier: the supplier(s) whose quarterly "
    "revenue equals the maximum (ties all return — equality against a "
    "scalar, not top-1). The revenue view is |suppliers|-bounded, so "
    "it computes once from a date-pruned fact scan, PERSISTS, and both "
    "consumers (the max scalar and the equality filter) read the "
    "persisted slice; the supplier dimension broadcasts. Raw revenue "
    "feeds the comparison so rounding cannot split a tie.",
)
def h15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("raw_revenue")
        )
        .persist()
    )
    revenue = track(revenue)
    top = revenue.agg(F.max("raw_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("raw_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round("raw_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "h20_promotion_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%widget%'
        AND l.l_shipdate >= DATE '1996-01-01'
        AND l.l_shipdate < DATE '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50
    )
    ORDER BY s.s_suppkey
    """,
    survey_ids=("J1", "A1", "F2"),
    doc="TPC-H Q20-shaped promotion candidates: suppliers who moved "
    "more than a threshold quantity of any matching part in the year "
    "(partsupp availability adapts to shipped quantity). Spark shape: "
    "the name-pruned part slice broadcasts into the date-pruned fact "
    "scan, the (supplier, part) rollup is the one exchange, the HAVING "
    "filters it, and the supplier probe is a LEFT SEMI join against "
    "the distinct qualifying keys — no supplier row ever duplicates, "
    "no subquery re-scan.",
)
def h20_promotion_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    qualifying = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(qualifying),
            s["s_suppkey"] == qualifying["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "h22_dormant_customers",
    """
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    bench=True,
    survey_ids=("J1", "A1", "F3"),
    doc="TPC-H Q22-shaped dormant high-balance customers: above the "
    "average positive balance and no orders since the cutoff (the "
    "phone-prefix country code adapts to the nation key — the fixtures "
    "carry no phone column, and every customer has SOME order, so "
    "dormancy is date-scoped). Spark shape: the scalar average "
    "broadcasts into the customer scan; the NOT EXISTS is a LEFT ANTI "
    "join against the date-pruned orders projection (two columns leave "
    "the scan), shuffling on the customer key; the final rollup is "
    "|nations| cells. The anti-join's pruned side is the 100 TB "
    "concern and the date predicate pushes to its scan.",
)
def h22_dormant_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# r13 training-pipeline additions: contrastive mining, diagonal whitening,
# per-domain quotas, vocabulary coverage
# ---------------------------------------------------------------------------


@register(
    "x_ann_hard_negatives",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e, label FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS neg_label,
             list_cosine_similarity(q.e, c.e) AS sim
      FROM v c JOIN q ON c.vec_id <> q.vec_id AND c.label <> q.label
    ),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, neg_label,
           round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 8
    """,
    survey_ids=("EXT-similarity",),
    doc="contrastive hard-negative mining: per query vector, the 8 most "
    "cosine-similar corpus vectors with a DIFFERENT label — similar in "
    "embedding space, disagreeing in supervision, exactly the negatives "
    "a contrastive trainer wants. Query side broadcasts with the label "
    "disagreement folded into the join condition (same-label pairs "
    "never reach scoring); corpus scanned once, dot product in "
    "codegen, k rows of window state per query. Bucket first via LSH/"
    "IVF at corpus scale — this exact path is those paths' oracle.",
)
def x_ann_hard_negatives(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") < 5), k=8
    )


def _hard_neg_lsh_oracle_sql(n_planes: int = 4) -> str:
    planes = similarity.srp_planes(n_planes, 64, 42)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e, label FROM embeddings
    ),
    b AS (SELECT vec_id, e, label, {_sql_bucket(planes)} AS bucket FROM v),
    q AS (SELECT * FROM b WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS neg_label,
             list_cosine_similarity(q.e, c.e) AS sim
      FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
                     AND c.label <> q.label
    ),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, neg_label,
           round(sim, 4) AS cosine_sim, rank
    FROM ranked WHERE rank <= 8
    """


@register(
    "x_ann_hard_negatives_bucketed",
    _hard_neg_lsh_oracle_sql(),
    survey_ids=("EXT-similarity",),
    doc="the corpus-scale form of hard-negative mining (closes the r13 "
    "verdict's missing #2): SRP buckets prune candidate generation to "
    "the query's bucket before the label-disagreement filter and exact "
    "re-rank — candidates per query ~ corpus / 2^planes. A plain "
    "equi-join on the bucket key (the query side is NOT broadcast, so "
    "it may be arbitrarily large; AQE still broadcasts small sides); "
    "deterministic seeded planes, so the oracle replays the identical "
    "bucketing with plane literals. Recall vs the exact miner is the "
    "x_ann_hard_negatives_recall query.",
)
def x_ann_hard_negatives_bucketed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives_lsh(
        emb, emb.filter(F.col("vec_id") < 5), k=8, n_planes=4
    )


def _hard_neg_recall_oracle_sql(n_planes: int = 4) -> str:
    planes = similarity.srp_planes(n_planes, 64, 42)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e, label FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id ASC
               ) AS rank
        FROM v c, q
        WHERE c.vec_id <> q.vec_id AND c.label <> q.label
      ) WHERE rank <= 8
    ),
    b AS (SELECT vec_id, e, label, {_sql_bucket(planes)} AS bucket FROM v),
    qb AS (SELECT * FROM b WHERE vec_id < 5),
    ap AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qb.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY qb.vec_id
                 ORDER BY list_cosine_similarity(qb.e, c.e) DESC, c.vec_id ASC
               ) AS rank
        FROM b c JOIN qb ON c.bucket = qb.bucket AND c.vec_id <> qb.vec_id
                        AND c.label <> qb.label
      ) WHERE rank <= 8
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(any_value(na.n) AS BIGINT) AS n_approx,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS recall
    FROM ex e
    LEFT JOIN ap a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    JOIN (SELECT query_id, count(*) AS n FROM ap GROUP BY 1) na
      ON e.query_id = na.query_id
    GROUP BY e.query_id
    """


@register(
    "x_ann_hard_negatives_recall",
    _hard_neg_recall_oracle_sql(),
    survey_ids=("EXT-similarity", "EXT-pipeline"),
    doc="recall@8 of the SRP-bucketed hard-negative miner against the "
    "exact brute-force miner, per query — the same eval pattern "
    "x_ann_recall_eval establishes for the ANN tier: both tiers are "
    "already-registered operators, the eval is one (query, neighbor) "
    "equi-join of two k-row-per-query sets, so evaluating the index "
    "costs the price of running it. A recall floor is additionally "
    "asserted in tests/test_extensions.py.",
)
def x_ann_hard_negatives_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.hard_negatives(emb, queries, k=8).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.hard_negatives_lsh(
        emb, queries, k=8, n_planes=4
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    na = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["a_neighbor"]),
        "left",
    ).select(exact["query_id"], "neighbor_id", "a_neighbor")
    hit = F.sum(F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0))
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            hit.cast("long").alias("n_hits"),
            F.round(hit / F.count(F.lit(1)), 4).alias("recall"),
        )
        .join(F.broadcast(na), "query_id")
        .select(
            "query_id",
            "n_exact",
            F.col("n_approx").cast("long").alias("n_approx"),
            "n_hits",
            "recall",
        )
    )


@register(
    "x_embedding_whitening",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
    ),
    d AS (
      SELECT vec_id, unnest(e) AS x,
             unnest(generate_series(1, len(e))) AS dim
      FROM v
    ),
    st AS (
      SELECT dim, avg(x) AS mu,
             CASE WHEN coalesce(stddev_pop(x), 0) < 1e-12 THEN 1.0
                  ELSE stddev_pop(x) END AS sigma
      FROM d GROUP BY dim
    ),
    z AS (
      SELECT d.vec_id, (d.x - st.mu) / st.sigma AS zx
      FROM d JOIN st USING (dim)
    )
    SELECT vec_id,
           floor(sqrt(sum(zx * zx)) * 10000 + 0.5) / 10000.0 AS std_norm,
           floor(min(zx) * 10000 + 0.5) / 10000.0 AS std_min,
           floor(max(zx) * 10000 + 0.5) / 10000.0 AS std_max
    FROM z GROUP BY vec_id
    """,
    survey_ids=("EXT-similarity",),
    doc="per-dimension standardization (diagonal whitening) before "
    "quantization/bucketing: dominant dimensions stop owning the "
    "distance metric. Plan: posexplode -> |dims|-key partial-aggregated "
    "shuffle (hundreds of keys, never the corpus), the one-row stats "
    "frame broadcasts back, the standardized vector rebuilds in a "
    "zip_with transform — the corpus itself never shuffles. The "
    "oracle-visible projection is per-vector scalars (norm/min/max) "
    "snapped to a 1e-4 floor-grid, because cross-engine aggregation "
    "order perturbs the last ulp.",
)
def x_embedding_whitening(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    std = similarity.standardize_dims(emb)
    grid = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    sumsq = F.aggregate(
        F.col("standardized"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return std.select(
        "vec_id",
        grid(F.sqrt(sumsq)).alias("std_norm"),
        grid(F.array_min("standardized")).alias("std_min"),
        grid(F.array_max("standardized")).alias("std_max"),
    )


@register(
    "x_pipeline_domain_quota",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY ((doc_id % 2147483647) * 2654435761)
                        % 4294967296, doc_id
             ) AS BIGINT) AS quota_rank
      FROM documents
    )
    SELECT doc_id, source, quota_rank
    FROM ranked WHERE quota_rank <= 50
    """,
    bench=True,
    survey_ids=("EXT-pipeline",),
    doc="per-domain quota sampling: keep at most 50 documents per "
    "source, chosen by a deterministic multiplicative hash of the doc "
    "id (stable across runs and machines — no RNG). Spark plan is the "
    "exact TWO-PHASE quota: phase one ranks within (source, "
    "hash-salt-bucket) and keeps 50 per bucket — correct because a "
    "source's global 50 smallest hash keys each sit among their own "
    "bucket's 50 smallest — so the per-source window in phase two sees "
    "at most 50x16 survivors per source instead of the source's whole "
    "corpus; a hot domain (half the web is one CDN) caps its window "
    "input at 800 rows regardless of its true size.",
)
def x_pipeline_domain_quota(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # reduce mod 2^31-1 BEFORE the multiply so the product stays inside
    # int64 for any doc_id (4e9 * 2654435761 would silently wrap
    # negative in non-ANSI Spark and overflow-error in the oracle)
    key = (
        (F.col("doc_id") % F.lit(2147483647)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    salted = Window.partitionBy(
        "source", F.pmod(F.col("__qkey"), F.lit(16))
    ).orderBy("__qkey", "doc_id")
    final = Window.partitionBy("source").orderBy("__qkey", "doc_id")
    return (
        d.select("doc_id", "source", key.alias("__qkey"))
        .withColumn("__r1", F.row_number().over(salted))
        .filter(F.col("__r1") <= 50)
        .withColumn("quota_rank", F.row_number().over(final).cast("long"))
        .filter(F.col("quota_rank") <= 50)
        .select("doc_id", "source", "quota_rank")
    )


@register(
    "x_text_vocab_coverage",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS rn
      FROM counts
    ),
    tot AS (SELECT sum(c) AS t FROM counts)
    SELECT CAST(k AS BIGINT) AS top_k,
           CAST((SELECT sum(c) FROM ranked WHERE rn <= k) AS BIGINT)
             AS covered_tokens,
           floor((SELECT sum(c) FROM ranked WHERE rn <= k) * 1000000.0
                 / (SELECT t FROM tot) + 0.5) / 1000000.0 AS coverage
    FROM (VALUES (10), (100), (1000)) AS ks(k)
    """,
    survey_ids=("EXT-text", "EXT-pipeline"),
    doc="vocabulary coverage curve: the fraction of all token "
    "occurrences covered by the top-10/100/1000 most frequent tokens — "
    "the Zipf diagnostic that sizes a tokenizer's vocab before "
    "training one. Plan: ONE token-count shuffle feeds a persisted "
    "|vocab|-bounded table; each curve point is a TakeOrderedAndProject "
    "(limit-k heap, NEVER a global partition-less rank window) reduced "
    "to a scalar and unioned; the grand total enters as a broadcast. "
    "Integer token counts keep every division exact-identical across "
    "engines; the final ratio snaps to a 1e-6 floor-grid.",
)
def x_text_vocab_coverage(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    counts = track(counts)
    total = counts.agg(F.sum("c").alias("__t"))
    slices = None
    for k in (10, 100, 1000):
        top = (
            counts.orderBy(F.desc("c"), F.asc("token"))
            .limit(k)
            .agg(
                F.lit(k).cast("long").alias("top_k"),
                F.sum("c").cast("long").alias("covered_tokens"),
            )
        )
        slices = top if slices is None else slices.unionByName(top)
    return slices.crossJoin(F.broadcast(total)).select(
        "top_k",
        "covered_tokens",
        (
            F.floor(
                F.col("covered_tokens") * F.lit(1000000.0) / F.col("__t")
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("coverage"),
    )


@register(
    "x_events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (
      SELECT from_type, sum(n) AS row_total FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           floor(t.n * 1000000.0 / x.row_total + 0.5) / 1000000.0 AS p
    FROM trans t JOIN tot x USING (from_type)
    ORDER BY from_type, to_type
    """,
    survey_ids=("EXT-events", "A1"),
    doc="first-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current), the navigation/behavior "
    "profile a product-analytics stack derives from any clickstream. "
    "Plan: ONE user-keyed exchange feeds the lead() window (the same "
    "partitioning discipline as sessionize), the transition rollup is "
    "|event_types|^2 cells, and the row-normalizing totals join back "
    "as a broadcast over that tiny matrix — the event log is scanned "
    "once and shuffled once at any scale. Probabilities divide exact "
    "integer counts and snap to a 1e-6 floor-grid.",
)
def x_events_markov_transitions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # |event_types|^2 cells — persist so the row-total branch reads
        # the matrix instead of re-scanning the event log
        .persist()
    )
    trans = track(trans)
    totals = trans.groupBy("from_type").agg(
        F.sum("n").alias("__row_total")
    )
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (
                F.floor(
                    F.col("n") * F.lit(1000000.0) / F.col("__row_total")
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "x_text_tfidf_keywords",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE token <> '' GROUP BY source, token
    ),
    df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources
          FROM documents),
    scored AS (
      SELECT tf.source, tf.token, tf.tf,
             floor(tf.tf * ln((n.n_sources + 1.0) / (df.df + 1.0))
                   * 10000 + 0.5) / 10000.0 AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT source, token, tf, tfidf,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY tfidf DESC, token ASC
             ) AS BIGINT) AS rank
      FROM scored
    )
    SELECT source, token, tf, tfidf, rank
    FROM ranked WHERE rank <= 5
    """,
    survey_ids=("EXT-text",),
    doc="per-source TF-IDF keyword profile: the 5 terms most "
    "characteristic of each source (df over SOURCES, smoothed "
    "ln((N+1)/(df+1)) — corpus profiling for mixture design and "
    "source-quality review, distinct from BM25's query-relevance "
    "scoring). Plan: the (source, token) rollup is the one corpus-"
    "keyed exchange; source-level df aggregates off that rollup (never "
    "a second scan); the source-count scalar and the per-source top-5 "
    "window both run over |vocab|-bounded tables. The idf product "
    "snaps to a 1e-4 floor-grid for cross-engine hash identity.",
)
def x_text_tfidf_keywords(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .persist()
    )
    tf = track(tf)
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = d.agg(
        F.countDistinct("source").cast("long").alias("__n_sources")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "token",
            "tf",
            (
                F.floor(
                    F.col("tf")
                    * F.log(
                        (F.col("__n_sources") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("source", "token", "tf", "tfidf", "rank")
    )


@register(
    "t_streaming_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (
      SELECT from_type, sum(n) AS row_total FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           floor(t.n * 1000000.0 / x.row_total + 0.5) / 1000000.0 AS p
    FROM trans t JOIN tot x USING (from_type)
    ORDER BY from_type, to_type
    """,
    survey_ids=("T1", "T5", "EXT-streaming", "EXT-events"),
    doc="streaming twin of x_events_markov_transitions: the per-user "
    "last-event automaton (markov_transitions_stateful, one string of "
    "state per key) run as a real 4-micro-batch replay, emitting one "
    "append-mode row per observed transition; the transition matrix and "
    "row-normalized probabilities aggregate over its output and must "
    "hash-equal the batch lead() oracle — the same oracle as the batch "
    "twin, attesting that a live clickstream and a one-shot scan derive "
    "the IDENTICAL behavior profile.",
)
def t_streaming_markov_transitions(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    stream = srt.replayed_stream(spark, e, n_slices=4, order_col="ts")
    emitted = srt.run_available_now(
        srt.markov_transitions_stateful(stream, watermark="365 days"),
        output_mode="append",
    )
    trans = (
        emitted.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    trans = track(trans)
    # rename the self-join key: both branches descend from the one memory
    # sink view, whose reused expr-ids trip Spark's conflicting-reference
    # check if the totals side keeps the same attribute
    totals = (
        trans.select(F.col("from_type").alias("__ft"), "n")
        .groupBy("__ft")
        .agg(F.sum("n").alias("__row_total"))
    )
    return (
        trans.join(
            F.broadcast(totals), trans["from_type"] == totals["__ft"]
        )
        .select(
            "from_type",
            "to_type",
            "n",
            (
                F.floor(
                    F.col("n") * F.lit(1000000.0) / F.col("__row_total")
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "t_streaming_markov_buffered",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (
      SELECT from_type, sum(n) AS row_total FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           floor(t.n * 1000000.0 / x.row_total + 0.5) / 1000000.0 AS p
    FROM trans t JOIN tot x USING (from_type)
    ORDER BY from_type, to_type
    """,
    survey_ids=("T1", "T5", "EXT-streaming", "EXT-events"),
    doc="the ENFORCED-ordering Markov automaton under an ADVERSARIAL "
    "replay (r14 verdict #2): adjacent event-time ranges arrive "
    "SWAPPED (batch order 1,0,3,2,... via "
    "runtime.disordered_replayed_stream), so whole ranges of events "
    "land a micro-batch after strictly later ones — a feed on which "
    "the immediate automaton (t_streaming_markov_transitions' "
    "machinery) emits provably wrong transitions "
    "(tests/test_streaming.py pins that). The watermark-bounded "
    "reorder buffer (markov_transitions_buffered) holds events inside "
    "the horizon and folds only the strictly-expired prefix in "
    "event-time order, so this hash can match the batch lead() oracle "
    "ONLY because the buffer re-sorts across batch boundaries. A "
    "high-ts null-typed sentinel drains the final horizon.",
)
def t_streaming_markov_buffered(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sentinel = e.limit(1).select(
        F.lit(10**12).alias("user_id"),
        F.col("ts"),
        F.lit(10**12).alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    stream, wm = srt.disordered_replayed_stream(spark, e, sentinel)
    emitted = srt.run_available_now(
        srt.markov_transitions_buffered(stream, watermark=wm),
        output_mode="append",
    )
    trans = (
        emitted.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    trans = track(trans)
    # rename the self-join key: both branches descend from the one memory
    # sink view (see t_streaming_markov_transitions)
    totals = (
        trans.select(F.col("from_type").alias("__ft"), "n")
        .groupBy("__ft")
        .agg(F.sum("n").alias("__row_total"))
    )
    return (
        trans.join(
            F.broadcast(totals), trans["from_type"] == totals["__ft"]
        )
        .select(
            "from_type",
            "to_type",
            "n",
            (
                F.floor(
                    F.col("n") * F.lit(1000000.0) / F.col("__row_total")
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "t_streaming_funnel_buffered",
    """
    WITH e AS (
      SELECT user_id AS u, event_type, CAST(ts AS TIMESTAMP) AS t FROM events
    ),
    s0 AS (
      SELECT u, min(t) AS t0 FROM e WHERE event_type = 'signup' GROUP BY u
    ),
    s1 AS (
      SELECT e.u, s0.t0, min(e.t) AS t_prev
      FROM e JOIN s0 ON e.u = s0.u
      WHERE e.event_type = 'view' AND e.t > s0.t0
        AND e.t <= s0.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s0.t0
    ),
    s2 AS (
      SELECT e.u, s1.t0, min(e.t) AS t_prev
      FROM e JOIN s1 ON e.u = s1.u
      WHERE e.event_type = 'purchase' AND e.t > s1.t_prev
        AND e.t <= s1.t0 + INTERVAL 7 DAY
      GROUP BY e.u, s1.t0
    )
    SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step, count(*) AS users FROM s0
    UNION ALL
    SELECT CAST(1 AS INT), 'view', count(*) FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), 'purchase', count(*) FROM s2
    """,
    survey_ids=("T1", "T5", "EXT-streaming", "EXT-analytics"),
    doc="the order-SENSITIVE funnel automaton under the same "
    "adversarial swapped-range replay as t_streaming_markov_buffered: "
    "step k must precede step k+1 in EVENT time, so the immediate "
    "automaton misses or fakes conversions when ranges arrive out of "
    "order; the buffered form (funnel_stateful_buffered) folds only "
    "the watermark-expired prefix in event-time order and its step "
    "counts hash-equal the batch funnel's SQL oracle only because the "
    "buffer does its job. reached is monotone, so max revision per "
    "user is the final state; the null-typed sentinel drains the tail.",
)
def t_streaming_funnel_buffered(spark, sf_dir):
    from pyspark.sql.window import Window

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    steps = ["signup", "view", "purchase"]
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(steps)
    ).select("user_id", "ts", "event_id", "event_type")
    sentinel = e.limit(1).select(
        F.lit(10**12).alias("user_id"),
        F.col("ts"),
        F.lit(10**12).alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    stream, wm = srt.disordered_replayed_stream(spark, e, sentinel)
    revisions = srt.run_available_now(
        srt.funnel_stateful_buffered(
            stream.drop("event_id"), steps, watermark=wm
        ),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("reached"))
    final = (
        revisions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("reached")
    )
    one_row = final.agg(
        *[
            F.coalesce(F.sum((F.col("reached") >= i + 1).cast("int")), F.lit(0))
            .cast("long")
            .alias(f"__c{i}")
            for i in range(len(steps))
        ]
    )
    return one_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"__c{i}").alias("users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.step_idx", "r.step", "r.users")


@register(
    "x_dedup_containment",
    """
    WITH base AS (
      SELECT doc_id, string_split(text,' ') AS w FROM documents
    ),
    sets AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
               END) AS s
      FROM base
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.s,b.s))*1.0 / len(a.s), 4)
             AS containment
    FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.s,b.s))*1.0 / len(a.s) >= 0.8
    """,
    survey_ids=("EXT-dedup",),
    doc="directional 3-gram-shingle containment >= 0.8: |A-shingles in "
    "B| / |A| — the asymmetric near-dup Jaccard misses (a short doc "
    "quoted whole inside a long one dilutes the union), i.e. the "
    "boilerplate / quote-inclusion case. Spark side prefix-prunes only "
    "the CONTAINED side (pigeonhole over the rarest shingles — exact) "
    "with the one admissible size filter |B| >= t*|A| inside the join "
    "condition; the containing side posts its full shingle set. Oracle "
    "is brute-force O(n^2).",
)
def x_dedup_containment(spark, sf_dir):
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, ngram=3
    )


@register(
    "x_dedup_containment_keep",
    """
    WITH RECURSIVE base AS (
      SELECT doc_id, string_split(text,' ') AS w FROM documents
    ),
    sets AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
               END) AS s
      FROM base
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(len(list_intersect(a.s,b.s))*1.0 / len(a.s), 4) AS c
      FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
      WHERE len(list_intersect(a.s,b.s))*1.0 / len(a.s) >= 0.8
    ),
    mutual AS (
      SELECT p.doc_a, p.doc_b FROM prs p
      WHERE EXISTS (SELECT 1 FROM prs r
                    WHERE r.doc_a = p.doc_b AND r.doc_b = p.doc_a)
    ),
    strict AS (
      SELECT * FROM prs p
      WHERE NOT EXISTS (SELECT 1 FROM mutual m
                        WHERE m.doc_a = p.doc_a AND m.doc_b = p.doc_b)
    ),
    reach AS (
      SELECT doc_a AS u, doc_b AS v FROM mutual
      UNION
      SELECT r.u, s.doc_b FROM reach r JOIN mutual s ON r.v = s.doc_a
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
    ),
    xstrict AS (
      SELECT s.* FROM strict s
      LEFT JOIN comp pa ON s.doc_a = pa.doc_id
      LEFT JOIN comp pb ON s.doc_b = pb.doc_id
      WHERE pa.component IS NULL OR pb.component IS NULL
         OR pa.component <> pb.component
    ),
    best AS (
      SELECT doc_a AS doc_id, doc_b AS container FROM (
        SELECT doc_a, doc_b,
               row_number() OVER (
                 PARTITION BY doc_a ORDER BY c DESC, doc_b ASC
               ) AS rn
        FROM xstrict
      ) WHERE rn = 1
    )
    SELECT d.doc_id,
           CASE WHEN cp.component IS NOT NULL AND cp.component <> d.doc_id
                  THEN coalesce(bc.container, cp.component)
                WHEN b.container IS NOT NULL THEN b.container
                ELSE d.doc_id END AS representative,
           CASE WHEN cp.component IS NOT NULL AND cp.component <> d.doc_id
                  THEN 'duplicate'
                WHEN b.container IS NOT NULL THEN 'contained'
                WHEN cp.component IS NOT NULL THEN 'representative'
                ELSE 'unique' END AS status
    FROM documents d
    LEFT JOIN comp cp ON d.doc_id = cp.doc_id
    LEFT JOIN best b ON d.doc_id = b.doc_id
    LEFT JOIN best bc ON cp.component = bc.doc_id
    """,
    survey_ids=("EXT-dedup",),
    doc="the containment pipeline ACTION (closes the r13 verdict's "
    "missing #3): directional pairs resolve to drop-the-contained / "
    "keep-the-container, with mutual containment (>= t both ways — the "
    "Jaccard-dup case) routed through the same connected-components "
    "machinery as the symmetric dedup paths (min-id representative) "
    "and strict containment resolved to the best container (highest "
    "containment, then lowest id — deterministic; strict edges inside "
    "one mutual component are excluded — the component already "
    "resolved them). A cluster min contained in an OUTSIDE doc drops "
    "as contained, and its duplicates re-point one level to the min's "
    "container, never at a dropped cluster-mate (r15). status NOT IN "
    "('duplicate','contained') is the keep filter. The mutual "
    "subgraph is tiny, so the recursive oracle replays components "
    "exactly; the corpus pays one left join per slim decision table.",
)
def x_dedup_containment_keep(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.containment_pairs(docs, threshold=0.8, ngram=3)
    return dedup.containment_keep(docs, pairs)


@register(
    "x_dedup_sorted_neighborhood",
    """
    WITH sets AS (
      SELECT doc_id, list_distinct(string_split(text,' ')) s FROM documents
    ),
    ranked AS (
      SELECT doc_id, row_number() OVER (
        ORDER BY list_aggregate(list_transform(s, x -> md5(x)), 'min'),
                 doc_id
      ) AS r
      FROM sets
    )
    SELECT ra.doc_id AS doc_a, rb.doc_id AS doc_b,
           round(len(list_intersect(sa.s, sb.s))*1.0
                 / len(list_distinct(list_concat(sa.s, sb.s))), 4)
             AS jaccard_sim
    FROM ranked ra JOIN ranked rb ON rb.r > ra.r AND rb.r - ra.r <= 10
    JOIN sets sa ON sa.doc_id = ra.doc_id
    JOIN sets sb ON sb.doc_id = rb.doc_id
    WHERE len(list_intersect(sa.s, sb.s))*1.0
          / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8
    """,
    survey_ids=("EXT-dedup",),
    doc="sorted-neighborhood (SNM) near-dup detection — the classic "
    "record-linkage candidate generation the dedup family lacked: sort "
    "by a cheap blocking key (the doc's min md5(token) — its first "
    "minhash component, shared by a qualifying pair with probability "
    ">= its Jaccard), slide a 10-rank window, exact-Jaccard-verify the "
    "O(n*w) candidates. The complementary trade to the posting-list "
    "paths: candidate count never depends on token statistics (no "
    "hot-shingle explosion), at an explicit recall price the window "
    "parameter names (x_dedup_snm_recall reads it). Spark side gets "
    "the global rank from range partitions + broadcast per-partition "
    "offsets (never a single-task ORDER BY window) and the "
    "neighborhood from a 2-adjacent-blocks equi-join; the oracle "
    "replays the rank with a plain window function.",
)
def x_dedup_sorted_neighborhood(spark, sf_dir):
    return dedup.sorted_neighborhood_pairs(
        _t(spark, sf_dir, "documents"), window=10, threshold=0.8
    )


@register(
    "x_dedup_snm_multipass",
    """
    WITH sets AS (
      SELECT doc_id, list_distinct(string_split(text,' ')) s FROM documents
    ),
    rmh AS (
      SELECT doc_id, row_number() OVER (
        ORDER BY list_aggregate(list_transform(s, x -> md5(x)), 'min'),
                 doc_id
      ) AS r
      FROM sets
    ),
    rpx AS (
      SELECT doc_id, row_number() OVER (
        ORDER BY substring(lower(text), 1, 40), doc_id
      ) AS r
      FROM documents
    ),
    cand AS (
      SELECT least(ra.doc_id, rb.doc_id) AS doc_a,
             greatest(ra.doc_id, rb.doc_id) AS doc_b
      FROM rmh ra JOIN rmh rb ON rb.r > ra.r AND rb.r - ra.r <= 10
      UNION
      SELECT least(ra.doc_id, rb.doc_id), greatest(ra.doc_id, rb.doc_id)
      FROM rpx ra JOIN rpx rb ON rb.r > ra.r AND rb.r - ra.r <= 10
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(sa.s, sb.s))*1.0
                 / len(list_distinct(list_concat(sa.s, sb.s))), 4)
             AS jaccard_sim
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.doc_a
    JOIN sets sb ON sb.doc_id = c.doc_b
    WHERE len(list_intersect(sa.s, sb.s))*1.0
          / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8
    """,
    survey_ids=("EXT-dedup",),
    doc="multi-pass sorted-neighborhood dedup (r16): one rank+block "
    "candidate pass per blocking key — the minhash key catches "
    "near-dups that differ anywhere in the text, the 40-char "
    "lowercased prefix key catches shared openings the minhash sorts "
    "apart — candidates unioned in canonical (low id, high id) "
    "orientation and exact-Jaccard-verified ONCE over the deduplicated "
    "union (Hernandez/Stolfo's own multi-pass prescription; "
    "x_dedup_snm_recall prices the recall each pass buys). Candidates "
    "stay O(n * window * passes), independent of token statistics. "
    "The oracle unions the two rank-window joins in plain SQL "
    "(top-level UNION is safe here: no WITH RECURSIVE in this query).",
)
def x_dedup_snm_multipass(spark, sf_dir):
    return dedup.sorted_neighborhood_pairs_multi(
        _t(spark, sf_dir, "documents"), window=10, threshold=0.8
    )


@register(
    "x_dedup_snm_recall",
    """
    WITH RECURSIVE sets AS (
      SELECT doc_id, list_distinct(string_split(text,' ')) s FROM documents
    ),
    full_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s,b.s))*1.0
            / len(list_distinct(list_concat(a.s,b.s))) >= 0.8
    ),
    ranked AS (
      SELECT doc_id, row_number() OVER (
        ORDER BY list_aggregate(list_transform(s, x -> md5(x)), 'min'),
                 doc_id
      ) AS r
      FROM sets
    ),
    snm AS (
      SELECT least(ra.doc_id, rb.doc_id) AS doc_a,
             greatest(ra.doc_id, rb.doc_id) AS doc_b
      FROM ranked ra JOIN ranked rb ON rb.r > ra.r AND rb.r - ra.r <= 10
      JOIN sets sa ON sa.doc_id = ra.doc_id
      JOIN sets sb ON sb.doc_id = rb.doc_id
      WHERE len(list_intersect(sa.s, sb.s))*1.0
            / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8
    ),
    fe AS (
      SELECT doc_a AS u, doc_b AS v FROM full_pairs
      UNION SELECT doc_b, doc_a FROM full_pairs
    ),
    freach AS (
      SELECT u, v FROM fe
      UNION SELECT r.u, e.v FROM freach r JOIN fe e ON r.v = e.u
    ),
    fdup AS (
      SELECT u AS node FROM freach GROUP BY u HAVING min(v) < u
    ),
    se AS (
      SELECT doc_a AS u, doc_b AS v FROM snm
      UNION SELECT doc_b, doc_a FROM snm
    ),
    sreach AS (
      SELECT u, v FROM se
      UNION SELECT r.u, e.v FROM sreach r JOIN se e ON r.v = e.u
    ),
    sdup AS (
      SELECT u AS node FROM sreach GROUP BY u HAVING min(v) < u
    ),
    rpx AS (
      SELECT doc_id, row_number() OVER (
        ORDER BY substring(lower(text), 1, 40), doc_id
      ) AS r
      FROM documents
    ),
    snm_px AS (
      SELECT least(ra.doc_id, rb.doc_id) AS doc_a,
             greatest(ra.doc_id, rb.doc_id) AS doc_b
      FROM rpx ra JOIN rpx rb ON rb.r > ra.r AND rb.r - ra.r <= 10
      JOIN sets sa ON sa.doc_id = ra.doc_id
      JOIN sets sb ON sb.doc_id = rb.doc_id
      WHERE len(list_intersect(sa.s, sb.s))*1.0
            / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8
    ),
    comb AS (
      -- DISTINCT over UNION ALL, not a bare UNION: inside a WITH
      -- RECURSIVE block DuckDB 1.0 gives ANY top-level UNION the
      -- recursive-union treatment even without a self-reference,
      -- which re-runs the second branch and DOUBLES the rows (the
      -- fe/se closures above survive it only because their dups
      -- wash out in GROUP BY)
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT doc_a, doc_b FROM snm
        UNION ALL SELECT doc_a, doc_b FROM snm_px)
    ),
    ce AS (
      SELECT doc_a AS u, doc_b AS v FROM comb
      UNION SELECT doc_b, doc_a FROM comb
    ),
    creach AS (
      SELECT u, v FROM ce
      UNION SELECT r.u, e.v FROM creach r JOIN ce e ON r.v = e.u
    ),
    cdup AS (
      SELECT u AS node FROM creach GROUP BY u HAVING min(v) < u
    )
    SELECT CAST((SELECT count(*) FROM full_pairs) AS BIGINT) AS n_full,
           CAST((SELECT count(*) FROM snm) AS BIGINT) AS n_snm,
           CAST((SELECT count(*) FROM snm_px) AS BIGINT) AS n_snm_prefix,
           round((SELECT count(*) FROM snm f
                  WHERE EXISTS (SELECT 1 FROM full_pairs p
                                WHERE p.doc_a = f.doc_a
                                  AND p.doc_b = f.doc_b)) * 1.0
                 / greatest((SELECT count(*) FROM full_pairs), 1), 4)
             AS pair_recall,
           round((SELECT count(*) FROM snm_px f
                  WHERE EXISTS (SELECT 1 FROM full_pairs p
                                WHERE p.doc_a = f.doc_a
                                  AND p.doc_b = f.doc_b)) * 1.0
                 / greatest((SELECT count(*) FROM full_pairs), 1), 4)
             AS pair_recall_prefix,
           round((SELECT count(*) FROM comb f
                  WHERE EXISTS (SELECT 1 FROM full_pairs p
                                WHERE p.doc_a = f.doc_a
                                  AND p.doc_b = f.doc_b)) * 1.0
                 / greatest((SELECT count(*) FROM full_pairs), 1), 4)
             AS pair_recall_combined,
           round((SELECT count(*) FROM sdup s
                  WHERE EXISTS (SELECT 1 FROM fdup f
                                WHERE f.node = s.node)) * 1.0
                 / greatest(
                     (SELECT count(*) FROM fdup)
                     + (SELECT count(*) FROM sdup)
                     - (SELECT count(*) FROM sdup s
                        WHERE EXISTS (SELECT 1 FROM fdup f
                                      WHERE f.node = s.node)), 1), 4)
             AS dup_set_agreement,
           round((SELECT count(*) FROM cdup s
                  WHERE EXISTS (SELECT 1 FROM fdup f
                                WHERE f.node = s.node)) * 1.0
                 / greatest(
                     (SELECT count(*) FROM fdup)
                     + (SELECT count(*) FROM cdup)
                     - (SELECT count(*) FROM cdup s
                        WHERE EXISTS (SELECT 1 FROM fdup f
                                      WHERE f.node = s.node)), 1), 4)
             AS dup_set_agreement_combined
    """,
    survey_ids=("EXT-dedup",),
    doc="recall monitor for the explicitly-lossy sorted-neighborhood "
    "path (the x_ann_hard_negatives_recall pattern: the trade is a "
    "number you read, not a guess): SNM pairs at (window=10, t=0.8) "
    "vs the exact inverted-index jaccard_pairs ground truth over the "
    "same token sets — one row (n_full, n_snm, pair_recall, "
    "dup_set_agreement), now with the standard multi-pass mitigation "
    "priced alongside (r16): a second pass under the prefix key, "
    "per-pass pair_recall_prefix and the union's pair_recall_combined "
    ">= pair_recall (SNM's own prescription: different keys sort "
    "different near-dups adjacent), plus dup_set_agreement_combined "
    "for the dedup-action view. pair_recall is low BY CONSTRUCTION on "
    "cliquey corpora (a rank window finds a CHAIN through a "
    "near-dup cluster, ~w pairs per doc, never the full clique) — "
    "the number that matters for the dedup ACTION is "
    "dup_set_agreement: whether SNM chains reconstruct the same "
    "min-id keep/drop partition through connected components that "
    "the full pair set does (SNM edges are a subset of full edges, "
    "so its dup set is a subset too — agreement is the Jaccard of "
    "the two dup sets). The oracle replays both closures with "
    "recursive CTEs; the engine runs the same pointer-jumping "
    "components as every other dedup resolution.",
)
def x_dedup_snm_recall(spark, sf_dir):
    from data_pipeline_kafka_ek_spark.operators.graph import (
        connected_components,
    )

    docs = _t(spark, sf_dir, "documents")
    # one tokenize AND one dictionary-encode for BOTH dedup paths (they
    # share the corpus and the token unit; r15 ADVICE — sharing only
    # ``sets`` still ran the salted vocab-rank encode once per path),
    # with every intermediate persist collected for release below
    caches: list = []
    shared_sets = dedup._token_sets(docs, "doc_id", "text", 1).persist()
    shared_isets = dedup._int_token_sets(shared_sets).persist()
    caches += [shared_sets, shared_isets]
    full = (
        dedup.jaccard_pairs(
            docs, threshold=0.8, sets=shared_sets, isets=shared_isets,
            # caches: jaccard_pairs persists its prefix-filtered posting
            # relation (r16) — route it into the release list below
            caches=caches,
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    def _canon_pairs(df):
        return df.select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )

    snm = _canon_pairs(
        dedup.sorted_neighborhood_pairs(
            docs, window=10, threshold=0.8,
            sets=shared_sets, isets=shared_isets, caches=caches,
        )
    ).persist()
    # second pass under the prefix key (r15 verdict #6 — the standard
    # multi-pass mitigation the SNM docstring prescribes: near-dups
    # whose minhash keys sort far apart often share openings, and vice
    # versa), same shared token relations, canonical orientation
    snm_px = _canon_pairs(
        dedup.sorted_neighborhood_pairs(
            docs, window=10, threshold=0.8, key_mode="prefix",
            sets=shared_sets, isets=shared_isets, caches=caches,
        )
    ).persist()
    combined = (
        snm.unionByName(snm_px).dropDuplicates(["doc_a", "doc_b"]).persist()
    )
    caches += [full, snm, snm_px, combined]
    hit = snm.join(full, ["doc_a", "doc_b"], "left_semi")
    hit_px = snm_px.join(full, ["doc_a", "doc_b"], "left_semi")
    hit_c = combined.join(full, ["doc_a", "doc_b"], "left_semi")
    fdup = connected_components(full).filter(
        F.col("component") != F.col("node")
    ).select("node").persist()
    sdup = connected_components(snm).filter(
        F.col("component") != F.col("node")
    ).select("node").persist()
    cdup = connected_components(combined).filter(
        F.col("component") != F.col("node")
    ).select("node").persist()
    caches += [fdup, sdup, cdup]
    dup_inter = sdup.join(fdup, "node", "left_semi")
    cdup_inter = cdup.join(fdup, "node", "left_semi")
    # materialize the scalar counts NOW, then release every cached
    # relation (r15 ADVICE: one monitor run pinned ~8 relations —
    # including two full token-set encodes — in executor memory for the
    # session lifetime). The result is rebuilt from the counted
    # literals with the SAME Spark-side round() the lazy form used, so
    # the oracle hash is unchanged.
    n_full, n_snm, n_hit = full.count(), snm.count(), hit.count()
    n_snm_px, n_hit_px, n_hit_c = snm_px.count(), hit_px.count(), hit_c.count()
    n_fdup, n_sdup, n_dinter = fdup.count(), sdup.count(), dup_inter.count()
    n_cdup, n_cinter = cdup.count(), cdup_inter.count()
    for c in caches:
        c.unpersist()

    def _ratio(num: int, den: int):
        return F.round(F.lit(num) / F.greatest(F.lit(den), F.lit(1)), 4)

    return spark.range(1).select(
        F.lit(n_full).cast("long").alias("n_full"),
        F.lit(n_snm).cast("long").alias("n_snm"),
        F.lit(n_snm_px).cast("long").alias("n_snm_prefix"),
        _ratio(n_hit, n_full).alias("pair_recall"),
        _ratio(n_hit_px, n_full).alias("pair_recall_prefix"),
        _ratio(n_hit_c, n_full).alias("pair_recall_combined"),
        _ratio(n_dinter, n_fdup + n_sdup - n_dinter).alias(
            "dup_set_agreement"
        ),
        _ratio(n_cinter, n_fdup + n_cdup - n_cinter).alias(
            "dup_set_agreement_combined"
        ),
    )
