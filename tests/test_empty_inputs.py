"""Empty-input robustness: every operator family must return an empty
(schema-correct) result on empty tables rather than crash — empty Arrow
batches, empty windows, and empty candidate sets are routine at scale
(empty partitions, all-filtered micro-batches)."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_kafka_ek_spark.operators import dedup, multimodal, similarity, text
from data_pipeline_kafka_ek_spark.operators.relational import cascade_rollup, latest_per_key
from data_pipeline_kafka_ek_spark.operators.skew import salted_agg, salted_join
from data_pipeline_kafka_ek_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def empty_docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return spark.createDataFrame([], d.schema)


@pytest.fixture(scope="module")
def empty_emb(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return spark.createDataFrame([], e.schema)


@pytest.fixture(scope="module")
def empty_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return spark.createDataFrame([], e.schema)


def test_dedup_family_empty(empty_docs):
    assert dedup.exact_dedup(empty_docs, ["text"], "doc_id").count() == 0
    assert dedup.jaccard_pairs(empty_docs, threshold=0.9).count() == 0
    assert dedup.jaccard_pairs(empty_docs, threshold=0.8, ngram=3).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs, threshold=0.8).count() == 0
    assert dedup.simhash_pairs(empty_docs, max_hamming=3).count() == 0
    assert dedup.containment_pairs(empty_docs, threshold=0.8).count() == 0


def test_similarity_family_empty(empty_emb):
    assert similarity.cosine_pairs(empty_emb, threshold=0.4).count() == 0
    assert similarity.cosine_pairs_lsh(empty_emb, threshold=0.4).count() == 0
    assert similarity.cosine_topk(empty_emb, empty_emb, k=5).count() == 0
    assert (
        similarity.cosine_topk_blocked(empty_emb, [(0, [0.0] * 64)], k=5).count() == 0
    )
    assert similarity.lsh_bucket_topk(empty_emb, empty_emb, k=5, n_planes=4).count() == 0
    assert similarity.ivf_topk(empty_emb, empty_emb, k=5).count() == 0
    assert similarity.normalize_embeddings(empty_emb).count() == 0
    assert similarity.quantize_int8(empty_emb).count() == 0


def test_text_family_empty(empty_docs):
    assert text.token_stats(empty_docs).count() == 0
    assert text.quality_score(empty_docs).count() == 0
    assert text.language_id(empty_docs).count() == 0
    assert text.fingerprint(empty_docs).count() == 0
    assert text.repetition_stats(empty_docs).count() == 0


def test_multimodal_empty(empty_docs):
    assets = multimodal.documents_as_assets(empty_docs)
    assert multimodal.fake_features(assets).count() == 0
    assert multimodal.frame_sample(assets).count() == 0


def test_relational_and_skew_empty(spark, empty_events):
    assert latest_per_key(empty_events, "user_id", [F.desc("ts")]).count() == 0
    assert cascade_rollup(empty_events, "event_type").count() == 0
    assert (
        salted_agg(
            empty_events, "event_type", {"n": "count(event_id)"}, unique_col="event_id"
        ).count()
        == 0
    )
    other = empty_events.select(F.col("user_id"), F.lit("x").alias("tag"))
    assert (
        salted_join(
            empty_events.select("event_id", "user_id"),
            other,
            key="user_id",
            unique_col="event_id",
        ).count()
        == 0
    )


def test_streaming_windowed_empty(spark, empty_events):
    from data_pipeline_kafka_ek_spark.streaming import runtime

    assert runtime.windowed_counts(empty_events).count() == 0
    assert runtime.session_windowed_counts(empty_events).count() == 0


def test_round6_operators_empty(spark, empty_docs, empty_emb):
    from data_pipeline_kafka_ek_spark.operators import text as text_ops

    # quality rules / LM scoring / BPE degrade to empty results
    assert text_ops.gopher_rules(empty_docs).count() == 0
    assert text_ops.bigram_logprob(empty_docs).count() == 0
    assert text_ops.bpe_train_merges(empty_docs, n_merges=4) == []
    assert text_ops.bpe_token_counts(empty_docs, []).count() == 0
    # cell assignment with given centroids is a pure map — empty in/out
    cents = [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62]
    assert similarity.assign_cells(empty_emb, cents).count() == 0
    assert (
        similarity.semantic_dedup_pairs(empty_emb, centroids=cents).count() == 0
    )
    # the quantizer TRAINER on an empty corpus fails loud, not cryptic
    with pytest.raises(ValueError, match="empty corpus"):
        similarity.ivf_centroids_lloyd(empty_emb, n_cells=2)


def test_round6_late_additions_empty(spark, empty_docs, empty_events):
    from data_pipeline_kafka_ek_spark.operators import sketches
    from data_pipeline_kafka_ek_spark.operators.relational import distribution_drift

    assert sketches.hll_distinct(empty_events, "event_type", "user_id").count() == 0
    assert text.hashed_classifier_score(empty_docs).count() == 0
    assert text.perplexity_buckets(empty_docs).count() == 0
    assert text.remove_duplicate_spans(empty_docs, n=4).count() == 0
    assert dedup.corpus_overlap_minhash(empty_docs).count() == 0
    assert distribution_drift(empty_events, empty_events).count() == 0
    # empty BASELINE with a real current side must also be empty (no
    # reference distribution), not a crash
    one = spark.createDataFrame(
        [("click", 1.0)], "event_type string, value double"
    )
    assert distribution_drift(
        spark.createDataFrame([], one.schema), one
    ).count() == 0


def test_multimodal_codec_pipeline_empty(empty_docs):
    assets = multimodal.synthetic_png_assets(empty_docs)
    assert multimodal.image_pixel_features(assets).count() == 0
    assert multimodal.resize_images(assets, 2, 2).count() == 0
    wavs = multimodal.synthetic_wav_assets(empty_docs)
    assert multimodal.audio_sample_features(wavs).count() == 0
    clips = multimodal.synthetic_video_assets(empty_docs)
    assert multimodal.video_motion_features(clips).count() == 0


def test_round9_sketch_setops_and_rollup_empty(spark, empty_docs, empty_events):
    from data_pipeline_kafka_ek_spark.operators import sketches

    toks = empty_docs.select(
        F.lit(0).alias("g"), F.explode(F.split("text", " ")).alias("v")
    )
    r = sketches.kmv_set_ops(toks, "g", "v", ga=0, gb=1, k=8).collect()
    assert len(r) == 1
    assert r[0].n_sketch_union == 0 and r[0].union_est == 0
    assert r[0].union_exact == 0 and r[0].inter_exact == 0

    e = empty_events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    rows = sketches.kmv_rollup(e, ["event_type", "day"], "user_id", k=8).collect()
    # only the grand-total grouping set exists on an empty input
    assert {(r.gset, r.key) for r in rows} == {("all", "*")}
    assert rows[0].n_sketch == 0 and rows[0].kmv_estimate == 0
    assert rows[0].n_exact == 0 and rows[0].rel_err is None


def test_r13_additions_empty(empty_emb):
    assert similarity.hard_negatives(empty_emb, empty_emb, k=5).count() == 0
    std = similarity.standardize_dims(empty_emb)
    assert std.count() == 0
    assert std.columns == ["vec_id", "standardized"]


def test_containment_keep_empty(empty_docs, spark):
    from data_pipeline_kafka_ek_spark.operators import dedup

    pairs = dedup.containment_pairs(empty_docs, threshold=0.8)
    assert dedup.containment_keep(empty_docs, pairs).count() == 0
    # a corpus with no qualifying pairs is all-unique, nothing dropped
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")], "doc_id long, text string"
    )
    got = dedup.containment_keep(
        docs, dedup.containment_pairs(docs, threshold=0.8, ngram=3)
    ).collect()
    assert {r.status for r in got} == {"unique"}
    assert all(r.representative == r.doc_id for r in got)
