"""Text-analysis operators over the ``documents`` table.

All four are pure built-in-function pipelines (JVM-side, codegen'd) — the
shapes a 100 TB corpus-prep pipeline runs on every document, so the hot
path must never drop into per-row Python:

* token stats    — counts/length features from a whitespace+regex split
* quality score  — length / stopword-ratio / repetition heuristics
* language ID    — marker-word n-gram heuristic (argmax over languages)
* fingerprint    — normalized sorted-token digest (OpenRefine-style
                   collision key) + a polynomial rolling hash
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.caching import track

# a small English stopword set (public-domain list prefix)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# marker words per language for the heuristic language-ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


# GPT-style pre-tokenizer: letter runs, digit runs, and single punctuation
# marks — the units a BPE tokenizer merges from. ASCII classes so Java
# (Spark) and RE2 (DuckDB) agree byte-for-byte.
PRETOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting for LLM corpus accounting: whitespace tokens,
    distinct tokens, char lengths, a BPE-style pre-token count (regex:
    letter runs / digit runs / punctuation — what a BPE tokenizer merges
    from), and the ~4-chars/token subword estimate."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(text_col).cast("long").alias("n_chars_computed"),
        F.size(F.regexp_extract_all(text_col, F.lit(PRETOKEN_RE), 0))
        .cast("long")
        .alias("n_pretokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subword_est"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: distinct-token ratio (repetition), stopword
    ratio, mean token length, and a composite [0,1] score. Thresholds are
    the usual corpus-filtering shape (e.g. drop if repetition is extreme or
    tokens are degenerate)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)) / F.size(
        F.array_distinct(toks)
    )
    mean_tok_len = (F.length(F.col(text_col)) - (n - 1)) / n  # chars minus spaces
    score = F.least(
        F.lit(1.0),
        (distinct_ratio * 0.5 + stop_ratio * 0.2 + F.least(mean_tok_len / 8, F.lit(1.0)) * 0.3),
    )
    return docs.select(
        "doc_id",
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language over the
    distinct token set; argmax with deterministic (alphabetical) tiebreak,
    'und' (undetermined) when nothing matches. ``lang_declared`` echoes
    the corpus's declared-language column when present, NULL otherwise
    (the operator works on any schema, not just the fixture's)."""
    toks = F.array_distinct(_tokens(F.col(text_col)))
    scores = [
        (
            lang,
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed so the alphabetically-first language wins ties
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    declared = (
        F.col(lang_col) if lang_col in docs.columns else F.lit(None).cast("string")
    )
    return docs.select(
        "doc_id",
        declared.alias("lang_declared"),
        pred.alias("lang_predicted"),
        best.cast("long").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting:

    * ``fp_key``  — OpenRefine-style collision key: md5 of the sorted
      distinct lowercase tokens (order/dup-insensitive content identity);
    * ``fp_roll`` — polynomial rolling hash over the raw bytes,
      base 31 mod 2^31-1 (positional content identity), computed JVM-side
      with ``aggregate`` over the char codepoints.
    """
    toks = F.array_sort(F.array_distinct(_tokens(F.lower(F.col(text_col)))))
    key = F.md5(F.array_join(toks, " "))
    codes = F.transform(
        F.split(F.col(text_col), ""), lambda c: F.ascii(c).cast("long")
    )
    roll = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(2147483647).cast("long"),
    )
    return docs.select(
        "doc_id",
        key.alias("fp_key"),
        roll.alias("fp_roll"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's whitespace tokens
    into fixed-size windows of ``max_tokens`` with ``overlap`` tokens
    shared between consecutive chunks (stride = max_tokens - overlap) —
    the standard prep that turns variable-length documents into
    training-sequence-sized pieces.

    One row in, ``ceil((n - overlap) / stride)`` rows out, all inside a
    single ``posexplode`` over a generated index array — no shuffle, no
    UDF, and the explode's fan-out is bounded by document length over
    stride. Emits (doc_id, chunk_idx, chunk_text, n_tokens)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(w, i * stride + 1, max_tokens),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "__c")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join("__c", " ").alias("chunk_text"),
            F.size("__c").cast("long").alias("n_tokens"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixing sampler: keep each row with a per-group
    probability (``rates[group]``, e.g. up-/down-sampling languages or
    sources when composing a training mixture), decided by an
    engine-independent hash of the row id — NOT ``rand()``, so the sample
    is reproducible across runs, engines, and partitionings, and any
    engine can audit exactly which rows were kept.

    u = first 8 md5 hex digits of the id as an integer / 2^32 — uniform
    in [0,1); keep iff u < rate. Pure expressions; at scale this is a
    stateless filter that pushes down past everything."""
    # exact in float64 on every engine: the 32-bit hash prefix is exactly
    # representable and the divisor is a power of two
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(rate)
    return docs.filter(u < rate)


def hash_split(
    docs: DataFrame,
    splits: "tuple[tuple[str, float], ...]" = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the first
    split whose cumulative weight exceeds an engine-independent hash of
    its id — NOT ``rand()``, so the partition is reproducible across
    runs, engines, and partitionings, and membership is auditable
    row-by-row. ``salt`` decorrelates multiple splits over the same ids.

    u = first 8 md5 hex digits of ``salt:id`` / 2^32, uniform in [0,1);
    exact in float64 on every engine (32-bit prefix, power-of-two
    divisor — same arithmetic as :func:`mixture_sample`). Appends a
    ``split`` column; a stateless map-side expression at any scale.
    """
    weights = [w for _, w in splits]
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split weights must be >= 0 and sum to 1: {splits}")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    # last split is the unconditional fallback so float edge cases at the
    # top boundary (u == cum) can never produce a NULL label
    expr = F.lit(splits[-1][0])
    cum = 0.0
    conds = []
    for name, w in splits[:-1]:
        cum += w
        conds.append((name, cum))
    for name, threshold in reversed(conds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def build_vocab(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Frequency-ranked vocabulary over whitespace tokens:
    ``(token, token_count, token_id)`` with 1-based ids assigned by
    (count desc, token asc) — the deterministic total order every engine
    reproduces.

    Scale shape: token counting is one map-side-combined groupBy over the
    corpus; the ranking window then runs over the already-aggregated
    vocabulary — cardinality = distinct tokens (millions at the very
    worst), NOT corpus rows, so the single-partition rank is bounded the
    same way k-means' driver-side training sample is.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
        .filter(F.col("token_count") >= min_count)
    )
    w = Window.orderBy(F.desc("token_count"), F.asc("token"))
    return counts.withColumn("token_id", F.row_number().over(w).cast("long"))


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> DataFrame:
    """Encode every document as its order-preserving token-id sequence —
    the tokenize→encode step of an LLM data pipeline. Returns
    ``(doc_id, token_ids, n_tokens)``; tokens missing from ``vocab`` map
    to ``oov_id``. With ``vocab=None`` the vocabulary is built from the
    corpus itself (so no OOV by construction).

    Scale shape: ``posexplode`` is map-side; the vocab lookup is a
    BROADCAST join (vocabularies are MBs while the corpus is the 100 TB
    side); re-assembly is one doc-keyed shuffle whose rows carry
    (pos, id) pairs, sorted per doc with ``array_sort`` on the collected
    structs (pos is unique per doc, so the sort is total).
    """
    if vocab is None:
        vocab = build_vocab(docs, text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "token"),
    )
    enc = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    )
    return enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
            lambda s: F.coalesce(s["token_id"], F.lit(oov_id)),
        ).alias("token_ids"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )


def unigram_logprob(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Per-document mean unigram log-probability under a corpus-trained
    unigram LM — the deterministic stand-in for the KenLM-style
    perplexity filter (CCNet) that ranks documents by how "language-like"
    they are. ``lm_docs`` is the training side (defaults to the scored
    corpus itself); OOV tokens get a +1-smoothed floor probability so the
    score is total.

    score(d) = (1/|d|) * sum over tokens of ln p(tok),
    p(tok) = (count(tok) + 1) / (total_tokens + vocab_size)   (add-one)

    Scale shape: the LM is one map-side-combined token count (vocab-sized
    result, broadcast into the scoring join); scoring explodes tokens
    map-side, joins the broadcast LM, and aggregates per doc — one
    doc-keyed shuffle of slim (doc, logp) rows. Returns
    ``(doc_id, n_tokens, mean_logprob)`` (higher = more corpus-typical).
    """
    if lm_docs is None:
        lm_docs = docs
    counts = (
        lm_docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(counts), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("total") + F.col("vocab"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("__logp"), 4).alias("mean_logprob"),
    )


# deliberately simple ASCII patterns so the Java (Spark) and RE2 (DuckDB)
# regex engines agree byte-for-byte; real deployments would swap in
# stricter validated patterns behind the same operator
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace email / SSN / phone-shaped spans with typed placeholder
    tags and count the redactions per document — the compliance scrub
    every training-data pipeline runs before anything else sees the text.

    Pure ``regexp_replace`` / ``regexp_count`` chains (JVM-side, one map
    stage, no shuffle at all); SSN is applied before the phone pattern
    because the two overlap and the more specific tag must win. Appends
    ``out_col`` plus one ``n_<kind>`` count column per pattern.
    """
    # order: email, then ssn, then phone (ssn shapes are a subset of what
    # phone would otherwise match)
    ordered = [PII_PATTERNS[0], PII_PATTERNS[2], PII_PATTERNS[1]]
    out = docs.withColumn(out_col, F.col(text_col))
    for kind, pat, tag in ordered:
        out = out.withColumn(
            f"n_{kind}",
            F.regexp_count(F.col(out_col), F.lit(pat)).cast("long"),
        ).withColumn(out_col, F.regexp_replace(F.col(out_col), pat, tag))
    return out


def stratified_fixed_n(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: within each stratum,
    rank rows by an engine-independent hash of their id and keep the
    first ``n``. The eval-set construction primitive — unlike
    ``sampleBy`` (probabilistic, partitioning-dependent) the quota is
    exact and the membership reproducible/auditable.

    Scale shape: one shuffle on the stratum key for the ranking window;
    rows carry only (stratum, id, hash) until the final project. Strata
    are typically few and balanced; a pathologically hot stratum is the
    same skew problem every per-group top-k has (AQE, or pre-filter with
    an approximate per-partition top-n if it ever matters).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-corpus repeated-span signal (the exact-substring-dedup
    statistic of Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): for every document, how many of its word n-gram
    positions carry a shingle that also occurs in ANOTHER document, and
    the fraction of positions so covered. High ``shared_frac`` docs are
    boilerplate/template suspects even when no whole-doc near-dup fires.

    Scale shape: positions explode map-side from the shingle array; the
    shared-shingle set comes from one map-side-combined groupBy counting
    DISTINCT docs per gram (grams seen by >= 2 docs), and flows back via
    an equi-join on the gram — hot boilerplate grams are AQE skew-join
    fodder. Returns ``(doc_id, n_spans, n_shared_spans, shared_frac)``;
    docs shorter than n contribute their whole text as one shingle (the
    corpus-wide shingling convention).
    """
    toks = F.split(F.col(text_col), " ")
    shingles = F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    pos = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(shingles).alias("pos", "gram")
    )
    shared = (
        pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .filter(F.col("__docs") >= 2)
        .select("gram")
    )
    flagged = pos.join(shared.withColumn("__shared", F.lit(1)), "gram", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.coalesce("__shared", F.lit(0))).cast("long").alias("n_shared_spans"),
        F.round(
            F.sum(F.coalesce("__shared", F.lit(0))) / F.count(F.lit(1)), 4
        ).alias("shared_frac"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: the fraction of word 2-grams taken
    by the single most frequent 2-gram, and the duplicate fraction of word
    3-grams (1 - distinct/total). High values flag boilerplate/degenerate
    text — the standard pre-training repetition filters.

    The 3-gram duplicate fraction is pure array expressions (no shuffle);
    the top-2-gram mode needs a (doc, gram) count -> per-doc max: two
    partial-aggregated shuffles on slim rows. Docs with < 2 tokens have no
    2-grams and report 0.0 for both signals.
    """
    w = F.split(F.col(text_col), " ")

    def grams(n: int):
        return F.when(F.size(w) < n, F.array()).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        grams(2).alias("g2"),
        grams(3).alias("g3"),
    )
    dup3 = base.select(
        "doc_id",
        F.when(
            F.size("g3") > 0,
            F.round(1 - F.size(F.array_distinct("g3")) / F.size("g3"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )
    counts = (
        base.select("doc_id", F.explode("g2").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .select("doc_id", F.round(F.col("mx") / F.col("tot"), 4).alias("top_2gram_frac"))
    )
    return (
        dup3.join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
            "dup_3gram_frac",
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: "list[str]",
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag-of-words query
    (Robertson/Spärck Jones; the classic IR ranking function, used here
    for corpus curation — e.g. scoring documents against a topic seed).

    score(d) = sum over query terms t of
        idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))
    with idf(t) = ln(1 + (N - df(t) + 0.5)/(df(t) + 0.5)).

    Scale shape: the term filter lands right after the tokenizing explode
    (map-side, before any shuffle), so the only per-doc shuffle carries
    (doc, term, tf) rows for MATCHED terms only. Corpus-level constants
    (N, avgdl) and the per-term document frequencies are tiny aggregates,
    broadcast into the scoring join. No windows, no UDFs. Returns one row
    per matching doc: ``(doc_id, bm25)``, score rounded to 4 places.
    """
    toks = _tokens(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    tf = (
        exploded.filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size(toks)).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 4).alias("bm25"))
    )


def contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination check: for every corpus document, the
    fraction of its distinct word n-grams that also occur anywhere in the
    eval set (the GPT-3/PaLM-style decontamination test; n=8 is the
    PaLM choice, GPT-3 used 13). Returns one row per corpus doc:
    ``(doc_id, n_grams, n_contaminated, contamination_rate)`` — zero rows
    are kept so a clean corpus is positively attested, not silently empty.

    Scale shape: eval sets are millions of n-grams while the corpus is
    100 TB, so the distinct eval-gram set is built once and BROADCAST;
    the corpus side explodes its shingles map-side (no shuffle) into a
    broadcast left-semi join, and the only shuffle is the per-doc hit
    count on slim (doc_id, count) rows with map-side partial aggregation.
    Documents shorter than n contribute their whole text as one shingle
    (same convention as the dedup shinglers) so nothing silently vanishes.
    """
    from data_pipeline_kafka_ek_spark.operators.dedup import _token_sets

    eval_grams = (
        _token_sets(eval_docs, id_col, text_col, ngram=n)
        .select(F.explode("toks").alias("gram"))
        .distinct()
    )
    corpus_grams = _token_sets(corpus, id_col, text_col, ngram=n).select(
        F.col("doc_id"), F.explode("toks").alias("gram")
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = _token_sets(corpus, id_col, text_col, ngram=n).select(
        "doc_id", F.size("toks").alias("n_grams")
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_grams"), 4
            ).alias("contamination_rate"),
        )
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    min_alpha_frac: float = 0.7,
    max_symbol_frac: float = 0.1,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality filtering (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the composite ``quality_score`` ranks
    documents, this emits the per-rule boolean verdicts a curation
    pipeline audits — word-count bounds, mean-word-length bounds,
    alphabetic-word fraction, symbol-token fraction, and a minimum
    distinct-stopword count — plus the conjunctive ``keep`` decision.
    Pure built-in expressions over one scan (no UDF, no shuffle): at
    100 TB this is a map-only pass that fuses into whatever scan feeds
    it. Thresholds are sized for the fixture corpus; production uses the
    paper's (50-word floor, 0.8 alpha fraction, etc.) via the kwargs.
    """
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    mean_len = (F.length(F.col(text_col)) - (n - 1)) / n
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n
    sym_frac = F.size(F.filter(toks, lambda t: t.isin("#", "..."))) / n
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    r_words = (n >= min_words) & (n <= max_words)
    r_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    r_alpha = alpha_frac >= min_alpha_frac
    r_sym = sym_frac <= max_symbol_frac
    r_stop = n_stop >= min_stopwords
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        F.round(sym_frac, 4).alias("symbol_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        r_words.alias("rule_word_count"),
        r_mean.alias("rule_mean_len"),
        r_alpha.alias("rule_alpha_frac"),
        r_sym.alias("rule_symbol_frac"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mean & r_alpha & r_sym & r_stop).alias("keep"),
    )


def _doc_symbol_string(text_col: str) -> Column:
    """Sentinel-delimited BPE symbol string for a whole document: every
    word becomes its characters plus a word-end marker, all space-joined
    and space-wrapped (`` c a t </w> h a t </w> ``) — the representation
    merge rules rewrite with boundary-safe string replace."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    per_word = F.transform(
        words,
        lambda w: F.concat(F.concat_ws(" ", F.split(w, "")), F.lit(" </w>")),
    )
    return F.concat(F.lit(" "), F.array_join(per_word, " "), F.lit(" "))


def _bpe_train_driver(
    rows: "list[tuple[int, str]]", n_merges: int
) -> "list[tuple[int, str, str, int]]":
    """Sequential BPE merge training over an already-aggregated
    ``(count, symbol-string)`` word table, entirely driver-side — the
    textbook implementation (Sennrich's reference trains exactly this
    way: the corpus collapses to a vocab-sized frequency dict, then the
    merge loop is single-machine). Incremental pair-count maintenance
    with a lazy-deletion heap: choosing a merge re-counts only the words
    that contain it, and the argmax never rescans the full pair table.
    Byte-identical to the Spark per-rank loop and the DuckDB oracle:
    same sentinel-delimited strings, same left-to-right non-overlapping
    ``str.replace`` (Python, Spark ``F.replace`` and DuckDB ``replace``
    all share that contract), same (count DESC, l ASC, r ASC) argmax."""
    import heapq
    from collections import Counter, defaultdict

    cnts = [int(c) for c, _ in rows]
    syms = [s for _, s in rows]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, sym in enumerate(syms):
        toks = sym.split()
        for p in zip(toks, toks[1:]):
            pair_counts[p] += cnts[i]
            pair_words[p].add(i)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)

    merges: "list[tuple[int, str, str, int]]" = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, l, r = heapq.heappop(heap)
            if pair_counts.get((l, r), 0) == -negc and -negc > 0:
                best = (l, r, -negc)
                break
        if best is None:
            break
        l, r, c = best
        merges.append((rank, l, r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        touched: Counter = Counter()
        for wi in list(pair_words.get((l, r), ())):
            old = syms[wi]
            new = old.replace(pat, rep)
            if new == old:
                pair_words[(l, r)].discard(wi)  # stale index entry
                continue
            w = cnts[wi]
            ot, nt = old.split(), new.split()
            for p in zip(ot, ot[1:]):
                pair_counts[p] -= w
                touched[p] += 1
            for p in zip(nt, nt[1:]):
                pair_counts[p] += w
                pair_words[p].add(wi)
                touched[p] += 1
            syms[wi] = new
        for p in touched:
            cp = pair_counts.get(p, 0)
            if cp > 0:
                heapq.heappush(heap, (-cp, p[0], p[1]))
            # zero/negative-free by construction; exhausted entries are
            # skipped by the lazy-deletion check above
    return merges


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    max_ranks: int = 512,
    sample_words: "int | None" = None,
    batch_candidates: int = 64,
    driver_vocab_limit: int = 200_000,
    stats: "dict | None" = None,
) -> "list[tuple[int, str, str, int]]":
    """Deterministic BPE merge training (Sennrich et al. 2016,
    arXiv:1508.07909): start from characters plus a ``</w>`` word-end
    marker, repeatedly merge the corpus-wide most frequent adjacent symbol
    pair (ties: lexicographically smallest pair), ``n_merges`` times.
    Returns the learned table ``[(rank, left, right, pair_count)]``.

    Trains on the DISTINCT-word frequency table (one corpus scan + one
    groupBy), the standard trick that makes BPE training corpus-size-
    independent: each merge step is one pair-count aggregation over the
    word table (bounded by vocabulary size, not tokens) plus a 1-row
    argmax collect — only the ``n_merges`` winning pairs ever reach the
    driver. Merge APPLICATION is left-to-right non-overlapping string
    replace on the sentinel-delimited symbol string — standard greedy
    BPE, with one documented convention: an occurrence that shares a
    delimiter space with a just-replaced occurrence waits for the next
    rule application pass (deterministic, and DuckDB's ``replace`` agrees
    byte-for-byte, which is what makes the whole trainer oracle-checkable
    — see plans/extensions.py::_bpe_merge_ctes).

    COST CONTRACT (the part a 30k-vocab production run must read): the
    algorithm sequences on the driver (rank k's counts depend on merge
    k-1), so the distributed work is bounded two ways:

    * DEFAULT PATH — when the distinct-word table fits
      ``driver_vocab_limit`` rows (or ``sample_words`` bounds it), the
      table is collected ONCE and the whole merge loop runs driver-side
      (``_bpe_train_driver``): 512 ranks cost one Spark job. This is
      the textbook architecture — the corpus collapses to a vocab-sized
      frequency dict, and training is single-machine from there — and
      it is byte-identical to the distributed loop and the oracle.
    * FALLBACK — a vocabulary too large to collect trains through the
      distributed per-round loop below, which still BATCHES ranks: the
      top ``batch_candidates`` pairs are collected together and
      accepted greedily, in order, while provably identical to
      sequential training:

    * a candidate must be SYMBOL-DISJOINT from every pair accepted this
      round (a merge never changes the count of a pair it shares no
      symbol with, so disjoint counts stay exact), and must not name a
      symbol an accepted merge is about to create;
    * a candidate's count must strictly exceed every accepted merge's
      CREATED-PAIR BOUND: a merge (l, r) can only create pairs
      ``(x, lr)`` / ``(lr, y)`` with counts bounded by the current
      ``count(x, l)`` / ``count(r, y)`` (every created occurrence
      consumes one such occurrence), so the max of those counts — plus
      the truncation floor for pairs outside the collected head — is a
      sound ceiling on anything the accepted merges can newly promote.

    The learned table is therefore EXACTLY the sequential one (the
    oracle CTEs replay it byte-for-byte), but 512 ranks cost a few tens
    of count rounds instead of 512 driver round-trips. ``stats``, when
    a dict is passed, records ``{"rounds": <count jobs>, "ranks": N}``
    so callers (and the regression test) can see the batching factor.
    The cost knobs stay explicit:

    * ``max_ranks`` — hard ceiling on ``n_merges`` (default 512). A
      larger vocabulary is a deliberate act: raise the ceiling AND size
      the word table with ``sample_words``.
    * ``sample_words`` — train on the top-``sample_words`` distinct
      words by corpus frequency (ties broken by word, so the sample is
      deterministic). This is the standard sample-training trick: the
      per-rank job touches a fixed-size table regardless of corpus
      scale, and high-frequency words dominate pair counts, so the
      learned table converges to the full-vocab one long before the
      sample stops covering the mass. ``None`` trains on the full
      distinct-word table (exact; right whenever vocab << corpus).
    """
    if n_merges > max_ranks:
        raise ValueError(
            f"n_merges={n_merges} exceeds max_ranks={max_ranks}: a "
            "larger vocabulary is a deliberate act — raise max_ranks "
            "AND bound the word table with sample_words (past "
            "driver_vocab_limit the loop degrades to one distributed "
            "count round per few ranks)"
        )
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if sample_words is not None:
        # deterministic head of the frequency table: exact top-N with a
        # total order (count desc, word asc) — not a random sample, so
        # retraining is reproducible
        words = words.orderBy(F.desc("cnt"), F.asc("w")).limit(sample_words)
    words = (
        words.withColumn(
            "sym",
            F.concat(
                F.lit(" "), F.concat_ws(" ", F.split("w", "")), F.lit(" </w> ")
            ),
        )
        .persist()
    )
    try:
        if driver_vocab_limit and driver_vocab_limit > 0:
            # the standard architecture: the corpus collapses to a
            # vocab-sized frequency table (ONE distributed job), and the
            # merge loop runs driver-side over it — 512 ranks cost one
            # Spark job, not 512. collect(limit+1) is the completeness
            # probe: fewer rows back means the WHOLE table is in hand
            # (deterministic); more means fall through to the
            # distributed per-round loop below.
            rows = [
                (r["cnt"], r["sym"])
                for r in words.select("cnt", "sym")
                .limit(driver_vocab_limit + 1)
                .collect()
            ]
            if len(rows) <= driver_vocab_limit:
                merges = _bpe_train_driver(rows, n_merges)
                if stats is not None:
                    stats["rounds"] = 1
                    stats["ranks"] = len(merges)
                return merges
        cur = words
        merges: list[tuple[int, str, str, int]] = []
        rounds = 0
        while len(merges) < n_merges:
            arr = F.split(F.trim(F.col("sym")), " ")
            n = F.size(arr)
            pair = F.explode(
                F.zip_with(
                    F.slice(arr, 1, n - 1),
                    F.slice(arr, 2, n - 1),
                    lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                )
            )
            k = max(2, batch_candidates)
            head = (
                cur.select("cnt", pair.alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("cnt").cast("long").alias("c"))
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(k)
                .collect()
            )
            rounds += 1
            if not head:
                break
            exhausted = len(head) < k  # full pair table fits the head
            # pairs outside the collected head can count at most this
            floor = 0 if exhausted else int(head[-1]["c"])

            def _hmax(pred):
                return max(
                    (int(p["c"]) for p in head if pred(p)), default=floor
                )

            accepted: "list[tuple[str, str, int]]" = []
            used: set[str] = set()      # symbols consumed by accepted merges
            created: set[str] = set()   # symbols the accepted merges create
            bound = floor               # ceiling on any count an accepted
            #                             merge could newly promote
            for row in head:
                l, r, c = row["l"], row["r"], int(row["c"])
                if len(merges) + len(accepted) >= n_merges:
                    break
                if accepted and c <= bound:
                    break  # a created pair could outrank everything below
                if l in used or r in used or l in created or r in created:
                    # STRICT PREFIX RULE: this candidate's count is no
                    # longer exact after the earlier accepts, and every
                    # candidate below it could lose to its updated count
                    # — stop the batch here, recount next round
                    break
                accepted.append((l, r, c))
                used.update((l, r))
                concat = l + r
                created.add(concat)
                # a merge (l, r) can only raise counts of pairs touching
                # its new symbol: (x, lr) gains at most the current
                # count(x, l) on top of any pre-existing count(x, lr)
                # (the symbol may already exist from an earlier round),
                # and symmetrically (lr, y) from count(r, y). Pairs not
                # in the collected head are bounded by the truncation
                # floor. The sum of both terms is a sound ceiling.
                cb_right = _hmax(lambda p: p["r"] == l) + _hmax(
                    lambda p: p["r"] == concat
                )
                cb_left = _hmax(lambda p: p["l"] == r) + _hmax(
                    lambda p: p["l"] == concat
                )
                bound = max(bound, cb_right, cb_left)
            for l, r, c in accepted:
                merges.append((len(merges) + 1, l, r, c))
                cur = cur.withColumn(
                    "sym",
                    F.replace("sym", F.lit(f" {l} {r} "), F.lit(f" {l}{r} ")),
                )
            # truncate the replace-chain lineage: without this the plan
            # grows one F.replace deeper per rank and Catalyst analysis
            # cost goes quadratic in n_merges; the table is vocab-sized
            # (distinct words), so the materialization is trivial
            cur = cur.localCheckpoint()
        if stats is not None:
            stats["rounds"] = rounds
            stats["ranks"] = len(merges)
        return merges
    finally:
        words.unpersist()


def bpe_token_counts(
    docs: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table to every document and report the
    compression: ``(doc_id, n_base_symbols, n_bpe_tokens)``. Encoding is
    the same replace chain the trainer used, applied to the whole-doc
    symbol string — cross-word false matches are impossible because no
    merge rule's left symbol can contain the word-end marker (a symbol
    with a right neighbor is never word-final). Pure expressions over one
    scan; the merge table rides into codegen as literals."""
    base = _doc_symbol_string(text_col)
    sym = base
    for _, l, r, _ in merges:
        sym = F.replace(sym, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(base), " ")).cast("long").alias("n_base_symbols"),
        F.size(F.split(F.trim(sym), " ")).cast("long").alias("n_bpe_tokens"),
    )


def bigram_logprob(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Per-document mean bigram conditional log-probability under a
    corpus-trained add-one-smoothed bigram LM — one order up from
    ``unigram_logprob`` on the CCNet-style perplexity-filter ladder:
    word-order-scrambled or boilerplate-stitched text scores near the
    unigram model but collapses under the bigram model.

    score(d) = (1/n_bigrams) * sum over adjacent pairs of ln p(w2 | w1),
    p(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V), ctx(w1) = bigram
    occurrences with left w1, V = unigram vocabulary size. Documents with
    fewer than two tokens have no bigrams and are absent from the output
    (same rule in the oracle).

    Scale shape: the bigram and context tables are map-side-combined
    counts bounded by observed-bigram cardinality, broadcast into the
    scoring join; scoring explodes adjacent pairs map-side and aggregates
    per doc — one doc-keyed shuffle of slim rows, no UDF.
    """
    shared = lm_docs is None or lm_docs is docs
    if lm_docs is None:
        lm_docs = docs

    def bigrams(df: DataFrame, *extra):
        arr = _tokens(F.col(text_col))
        n = F.size(arr)
        pair = F.explode(
            F.zip_with(
                F.slice(arr, 1, n - 1),
                F.slice(arr, 2, n - 1),
                lambda l, r: F.struct(l.alias("w1"), r.alias("w2")),
            )
        )
        return df.select(*extra, pair.alias("p")).select(
            *extra, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )

    doc_big = bigrams(docs, F.col(id_col).alias("doc_id"))
    if shared:
        # scoring corpus == LM corpus (the common single-corpus shape):
        # one persisted tokenize+explode pass feeds BOTH the LM count
        # table and the scoring join, instead of re-tokenizing the whole
        # corpus for each (guide §2.4 — the doc_id column is dropped by
        # the groupBy, so the counts are identical)
        doc_big = track(doc_big.persist(), caches)
        lm_big = doc_big.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c2")
        )
    else:
        lm_big = bigrams(lm_docs).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c2")
        )
    ctx = lm_big.groupBy("w1").agg(F.sum("c2").alias("ctx"))
    vocab = lm_docs.select(
        F.explode(_tokens(F.col(text_col))).alias("token")
    ).agg(F.countDistinct("token").alias("vocab"))
    scored = (
        doc_big
        .join(F.broadcast(lm_big), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("ctx"), F.lit(0)) + F.col("vocab"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("__logp"), 4).alias("mean_logprob"),
    )


def token_budget_plan(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    weights: "dict[str, float] | None" = None,
) -> DataFrame:
    """Token-budgeted mixture planning: given a target training budget and
    per-source mixture weights (default: uniform across observed sources),
    report for each source its inventory (docs, whitespace tokens), its
    budget allocation, and the deterministic sampling rate that hits it —
    ``rate = min(1, allocation / available)``, with ``undersupplied``
    flagging sources whose inventory cannot fill their allocation (the
    signal to re-weight or up-sample). Sources absent from an explicit
    ``weights`` table get weight 0 (excluded on purpose, visibly). This is the planning step that
    precedes ``mixture_sample``'s hash-based execution.

    Scale shape: one scan, one source-keyed partial-aggregated shuffle of
    (source, count, sum) partials; the weight table is a literal map. No
    UDF, no collect.
    """
    counts = (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " ")))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    if weights is None:
        n_sources = F.count(F.lit(1)).over(Window.partitionBy())
        weight_exact = F.lit(1.0) / n_sources
    else:
        # a source the caller left out of an explicit weight table gets a
        # ZERO allocation (deliberately excluded), never a silent NULL row
        weight_exact = F.lit(0.0)
        for src, wgt in sorted(weights.items()):
            weight_exact = F.when(
                F.col("source") == src, F.lit(float(wgt))
            ).otherwise(weight_exact)
    # derive everything from the EXACT weight; rounding is display-only
    # (deriving from the rounded weight drifts whenever 1/n_sources does
    # not terminate at 6 decimals)
    alloc_exact = F.lit(float(budget_tokens)) * weight_exact
    return (
        counts.withColumn("weight", F.round(weight_exact, 6))
        .withColumn("token_allocation", F.round(alloc_exact, 4))
        .withColumn(
            "sampling_rate",
            F.round(F.least(F.lit(1.0), alloc_exact / F.col("n_tokens")), 6),
        )
        .withColumn("undersupplied", F.col("n_tokens") < alloc_exact)
        .select(
            "source", "n_docs", "n_tokens", "weight", "token_allocation",
            "sampling_rate", "undersupplied",
        )
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weighting for data selection (Xie et al.
    2023, arXiv:2302.03169): score every document by the log importance
    ratio between a TARGET-domain unigram LM and the general-corpus LM,
    ``log_ratio = mean ln p_target(tok) - mean ln p_corpus(tok)`` — 
    documents that look more like the target domain than like the corpus
    at large score positive and are preferentially selected. Both LMs are
    the same add-one-smoothed estimator as ``unigram_logprob``, so the
    whole scorer inherits its determinism and scale shape (vocab-bounded
    count tables broadcast into one token-explode join each; two
    doc-keyed shuffles of slim rows, joined on the doc id).

    Returns ``(doc_id, target_logprob, corpus_logprob, log_ratio,
    selected)`` with ``selected = log_ratio > 0`` (the hard-threshold
    variant; production DSIR samples proportionally to the ratio).
    """
    under_target = unigram_logprob(docs, lm_docs=target, text_col=text_col, id_col=id_col).select(
        "doc_id", F.col("mean_logprob").alias("target_logprob")
    )
    under_corpus = unigram_logprob(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", F.col("mean_logprob").alias("corpus_logprob")
    )
    lr = F.round(F.col("target_logprob") - F.col("corpus_logprob"), 4)
    return (
        under_target.join(under_corpus, "doc_id")
        .withColumn("log_ratio", lr)
        .withColumn("selected", F.col("log_ratio") > 0)
    )


# fixed-point scale for the hash-derived classifier weights: md5's first
# 15 hex chars are 60 bits, so weights live in [-2^59, 2^59) and the
# per-document sum is exact in DECIMAL(38,0) up to ~3e17 tokens/doc
_CLF_HALF = 1 << 59
_CLF_DENOM = float(1 << 60)


def hashed_classifier_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bucket_hex: int = 4,
    threshold: float = 0.0,
    include_raw: bool = False,
) -> DataFrame:
    """Feature-hashed linear classifier scoring — the compute shape of the
    fastText-style quality filter every web-corpus pipeline runs (Joulin
    et al. 2016, arXiv:1607.01759; hashing trick per Weinberger et al.
    2009): each token is hashed into one of ``16^n_bucket_hex`` feature
    buckets (collisions and all — that IS the hashing trick), the
    bucket's weight is looked up, and the document score is the mean
    bucket weight, thresholded into a keep/drop verdict.

    Here the "trained" weight vector is derived, not stored: bucket b's
    weight is ``frac(md5('w#' || b)) - 1/2``, a deterministic hash in
    [-1/2, 1/2). That keeps the operator self-contained and exactly
    oracle-checkable while preserving the production plan SHAPE — swap
    the derivation for a broadcast lookup of real trained weights and
    nothing else in the plan changes (explode -> per-token weight ->
    one doc-keyed aggregation).

    Determinism: weights are 60-bit fixed-point INTEGERS (md5 value minus
    2^59), the per-doc accumulation is an exact DECIMAL(38,0) sum, and
    the score is one double division of exact integers — bit-identical
    in every engine, no float-sum order dependence (the same fixed-point
    stance as hll_distinct / h_window_cumulative_revenue).

    Scale shape: ONE scan, map-side token explode and weight derivation
    (pure codegen expressions, no UDF, no broadcast needed), ONE
    doc-keyed shuffle of (doc_id, partial count, partial DECIMAL sum)
    after map-side combine. At 100 TB this is the cheapest possible
    per-document scorer: linear in tokens, embarrassingly parallel.

    Returns ``(doc_id, n_tokens, clf_score, keep)`` with
    ``clf_score = sum(w)/n`` rounded to 6 dp and
    ``keep = score > threshold``. With ``include_raw=True`` a trailing
    ``clf_raw`` column carries the UNROUNDED score — downstream
    aggregations (e.g. a per-source mean) must consume that, never the
    rounded display column, or the per-doc rounding offset (up to
    5e-7) systematically shifts the aggregate relative to an oracle
    that averages the raw score.
    """
    toks = _tokens(F.col(text_col))
    tok = F.explode(toks).alias("tok")
    bucket = F.substring(F.md5(F.col("tok")), 1, n_bucket_hex)
    w_scaled = (
        F.conv(F.substring(F.md5(F.concat(F.lit("w#"), bucket)), 1, 15), 16, 10)
        .cast("long")
        - F.lit(_CLF_HALF)
    )
    per_tok = docs.select(F.col(id_col).alias("doc_id"), tok).select(
        "doc_id", w_scaled.cast("decimal(38,0)").alias("ws")
    )
    n = F.count(F.lit(1))
    score = F.col("s").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(_CLF_DENOM)
    )
    cols = [
        F.col("doc_id"),
        F.col("n_tokens"),
        F.round(score, 6).alias("clf_score"),
        (score > F.lit(threshold)).alias("keep"),
    ]
    if include_raw:
        cols.append(score.alias("clf_raw"))
    return (
        per_tok.groupBy("doc_id")
        .agg(n.cast("long").alias("n_tokens"), F.sum("ws").alias("s"))
        .select(*cols)
    )


def perplexity_buckets(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): score every document under the corpus bigram LM
    (:func:`bigram_logprob` — higher mean log-prob = lower perplexity =
    more fluent), then split each language into equal-count thirds:
    ``head`` (most fluent), ``middle``, ``tail``. CCNet trains on head+
    middle and drops tail; the bucket column here is exactly that
    decision, attached per document.

    Per-language (not global) bucketing is the point — perplexity scales
    differ across languages, so a global threshold would keep one
    language's tail over another's head.

    Determinism: the LM score is bigram_logprob's (rounded to 4 dp before
    ranking, identical cross-engine); ties broken by doc_id, so ntile's
    assignment is a pure function of the sorted order in both engines.
    Documents with <2 tokens have no bigram score and are absent (same
    rule as bigram_logprob, mirrored in the oracle).

    Scale shape: bigram_logprob's plan (broadcast LM tables, one
    doc-keyed shuffle) plus one language-keyed window over slim
    (doc, lang, score) rows. Languages are few and docs-per-language
    large — exactly the partition-by-low-cardinality window Spark
    handles with a single hash shuffle; skewed language sizes are AQE
    fodder, and a quantile-sketch split (quantile_grid) replaces ntile
    verbatim when a language's rows exceed one partition's sort budget.
    """
    scored = bigram_logprob(docs, lm_docs=lm_docs, text_col=text_col, id_col=id_col)
    labeled = scored.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("mean_logprob"), F.asc("doc_id")
    )
    b = F.ntile(3).over(w)
    label = (
        F.when(b == 1, F.lit("head"))
        .when(b == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return labeled.select(
        "doc_id", "lang", "mean_logprob", label.alias("ppl_bucket")
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer fertility audit: after applying a trained
    BPE merge table (:func:`bpe_token_counts`), report for each language
    the corpus word count, BPE token count, **fertility** (tokens per
    word — the standard multilingual-tokenizer-fairness number: a
    language whose fertility is 2x another's pays 2x the context-window
    and compute for the same text) and the base-symbol compression
    ratio. This is the report a tokenizer-training run checks before
    freezing a vocab.

    Determinism: integer sums (exact) and a single double division per
    output row. Scale shape: bpe_token_counts' one-scan codegen replace
    chain, then one low-cardinality language-keyed partial-agg shuffle.

    ANSI hazard guard: a language whose documents are all empty has
    ``sum(n_words) = 0``; its fertility is reported as NULL (no words to
    measure tokens-per-word against) instead of raising DIVIDE_BY_ZERO.
    Compression's denominator cannot be zero (every document contributes
    at least one BPE symbol, even the empty one).

    Returns ``(lang, n_docs, n_words, n_bpe_tokens, fertility,
    compression)``.
    """
    counts = bpe_token_counts(docs, merges, text_col=text_col)
    words = docs.select(
        "doc_id",
        F.col(lang_col).alias("lang"),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda w: w != ""))
        .cast("long")
        .alias("n_words"),
    )
    return (
        counts.join(words, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.when(
                    F.sum("n_words") > 0,
                    F.sum("n_bpe_tokens") / F.sum("n_words").cast("double"),
                ),
                4,
            ).alias("fertility"),
            F.round(
                F.sum("n_base_symbols") / F.sum("n_bpe_tokens").cast("double"),
                4,
            ).alias("compression"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring deduplication as a TRANSFORM (the removal step of
    Lee et al. 2021, arXiv:2107.06499 §ExactSubstr, word-granular): any
    word n-gram that occurs in two or more distinct documents is
    corpus-duplicated, and every word position covered by a duplicated
    n-gram is DELETED from the document — boilerplate, licenses and
    templated spans vanish while the unique remainder survives, which is
    exactly why ExactSubstr beats whole-doc dedup on real web corpora.
    The reporting sibling is :func:`repeated_ngram_spans`; this one
    rewrites the text.

    Documents shorter than ``n`` words carry no n-gram and pass through
    unchanged (they can still be caught by the whole-doc near-dup ops).

    Scale shape: positions explode map-side; the duplicated-gram set is
    one map-side-combined groupBy over DISTINCT (doc, gram); matches
    flow back via a gram equi-join (hot boilerplate grams = AQE
    skew-join fodder) and collapse to ONE slim (doc_id, sorted start
    list) row per affected doc — the text itself never rides through
    the join; the rewrite is a per-row codegen expression over the
    original text column. Suffix-array ExactSubstr does this at byte
    granularity; the word-granular formulation keeps it a pure
    DataFrame pipeline with the same deletion semantics.

    Returns ``(doc_id, n_words, n_removed, text_deduped)``.
    """
    toks = F.split(F.col(text_col), " ")
    # guard BEFORE sequence(): Spark's sequence(1, 0) descends rather
    # than yielding empty, so a doc shorter than n needs the explicit
    # empty-gram branch
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<struct<pos:int,gram:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.struct(
                (i - 1).alias("pos"),
                F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
            ),
        )
    )
    pos = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("pg")
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup = (
        pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .filter(F.col("__docs") >= 2)
        .select("gram")
    )
    starts = (
        pos.join(dup, "gram")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    joined = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)).join(
        starts, "doc_id", "left"
    )
    st = F.coalesce(F.col("starts"), F.array().cast("array<bigint>"))
    kept = F.filter(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda j: ~F.exists(st, lambda s: (j >= s) & (j < s + n)),
    )
    kept_words = F.transform(kept, lambda j: F.element_at(toks, j + 1))
    return joined.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept_words, " ").alias("text_deduped"),
    )
