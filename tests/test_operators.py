"""Semantic unit tests for the core operator library (SURVEY.md §5.2
layer 3): NULL concat parity, latest-per-key supersede semantics, the
live/test split round trip."""

import datetime

from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.functions.scalars import concat_strict
from data_pipeline_kafka_ek_spark.operators.relational import (
    latest_per_key,
    split_by_pattern,
    top_k_terms,
)
from data_pipeline_kafka_ek_spark.sources.tables import load_table


def test_concat_strict_null_propagates(spark):
    """ksqlDB '+' yields NULL on NULL operand (SURVEY.md §7.3) — concat_ws
    would silently skip; verify we kept the strict contract."""
    df = spark.createDataFrame(
        [("Rica", "Blaisdell"), (None, "Astley")], ["first_name", "last_name"]
    )
    out = df.select(
        concat_strict(F.col("first_name"), F.lit(" "), F.col("last_name")).alias("fn")
    ).collect()
    assert out[0].fn == "Rica Blaisdell"
    assert out[1].fn is None


def test_latest_per_key_supersedes(spark):
    """The reference's UPDATE-then-read experiment (README.md:204-210): the
    newest change per key wins."""
    rows = [
        (42, "bronze", datetime.datetime(2024, 1, 1)),
        (42, "platinum", datetime.datetime(2024, 1, 2)),
        (1, "silver", datetime.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["id", "club_status", "update_ts"])
    latest = latest_per_key(df, "id", [F.desc("update_ts")])
    got = {r.id: r.club_status for r in latest.collect()}
    assert got == {42: "platinum", 1: "silver"}


def test_split_roundtrip(spark, sf_dir):
    """live ∪ test == source and live ∩ test == ∅ (SURVEY.md §2.8)."""
    events = load_table(spark, sf_dir, "events")
    live, test = split_by_pattern(events, "event_type", "%err%")
    assert live.count() + test.count() == events.count()
    assert live.join(test, "event_id", "inner").count() == 0


def test_top_k_terms_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], ["term_col"]
    )
    got = top_k_terms(df, "term_col", 2).collect()
    assert [(r.term, r.term_count) for r in got] == [("a", 2), ("b", 2)]


def test_broadcast_join_in_plan(spark, sf_dir):
    """The enrichment join must broadcast the dimension side — at 100 TB the
    fact stream must not shuffle for this join."""
    from data_pipeline_kafka_ek_spark.plans.reference import enriched_events

    df = enriched_events(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_join_semantics(spark):
    from data_pipeline_kafka_ek_spark.operators.temporal import asof_join

    def ts(s):
        import datetime
        return datetime.datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, ts(10), "l10"), (1, ts(20), "l20"), (2, ts(5), "l5")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(8), "r8"), (1, ts(10), "r10"), (1, ts(15), "r15"), (3, ts(1), "r1")],
        "k int, ts timestamp, rv string",
    )
    got = {
        (r.k, r.lv): (r.rv, r.asof_ts)
        for r in asof_join(left, right, key="k").collect()
    }
    # non-strict: left@10 sees right@10 (<=); left@20 sees r15; k=2 no match
    assert got[(1, "l10")][0] == "r10"
    assert got[(1, "l20")][0] == "r15"
    assert got[(2, "l5")] == (None, None)

    strict = {
        (r.k, r.lv): r.rv
        for r in asof_join(left, right, key="k", strict=True).collect()
    }
    assert strict[(1, "l10")] == "r8"  # < excludes the same-instant row

    tol = {
        (r.k, r.lv): r.rv
        for r in asof_join(
            left, right, key="k", tolerance_seconds=3
        ).collect()
    }
    assert tol[(1, "l10")] == "r10"   # 0s back, inside tolerance
    assert tol[(1, "l20")] is None    # r15 is 5s back, outside tolerance


def test_asof_join_map_typed_right_column(spark):
    """A non-orderable (map) right column must be carried through without
    joining the window ORDER BY — previously this failed sort analysis."""
    from data_pipeline_kafka_ek_spark.operators.temporal import asof_join

    def ts(s):
        import datetime
        return datetime.datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, ts(10), "l10")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, ts(8), {"a": "x"}), (1, ts(8), {"a": "y"})],
        "k int, ts timestamp, props map<string,string>",
    )
    rows = asof_join(left, right, key="k").collect()
    assert len(rows) == 1
    assert rows[0].asof_ts == ts(8)
    # the map column itself came back (whichever duplicate won)
    assert rows[0].props in ({"a": "x"}, {"a": "y"})


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Duplicate (key, right_ts) rows resolve to the greatest orderable
    right row — stable across runs/partitionings."""
    from data_pipeline_kafka_ek_spark.operators.temporal import asof_join

    def ts(s):
        import datetime
        return datetime.datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame([(1, ts(10), "l")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, ts(8), "rv_a"), (1, ts(8), "rv_b"), (1, ts(8), "rv_c")],
        "k int, ts timestamp, rv string",
    )
    for n_part in (1, 3):
        got = asof_join(
            left.repartition(n_part), right.repartition(n_part), key="k"
        ).collect()
        assert [r.rv for r in got] == ["rv_c"]


def test_interval_join_edges_and_duplicates(spark):
    from data_pipeline_kafka_ek_spark.operators.temporal import interval_join

    def ts(s):
        import datetime
        return datetime.datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        # duplicate left row: both copies must survive (no over-dedup)
        [(1, ts(30), "a"), (1, ts(30), "a"), (1, ts(50), "b")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(20), "r20"), (1, ts(30), "r30"), (1, ts(31), "r31"), (1, ts(45), "r45")],
        "k int, ts timestamp, rv string",
    )
    got = sorted(
        (r.lv, r.rv)
        for r in interval_join(
            left, right, key="k", lower_seconds=-10, upper_seconds=0
        ).collect()
    )
    # window [-10s, 0s]: boundaries inclusive on both ends; bin-crossing
    # matches (r45 for b@50 spans a bin edge at width 10) must be found
    assert got == sorted(
        [("a", "r20"), ("a", "r30"), ("a", "r20"), ("a", "r30"), ("b", "r45")]
    )

    fwd = sorted(
        (r.lv, r.rv)
        for r in interval_join(
            left, right, key="k", lower_seconds=1, upper_seconds=20
        ).collect()
    )
    assert fwd == sorted(
        [("a", "r31"), ("a", "r45"), ("a", "r31"), ("a", "r45")]
    )


def test_contamination_planted_and_clean(spark):
    from data_pipeline_kafka_ek_spark.operators.text import contamination

    # eval doc shares a verbatim 8-gram run with corpus doc 1; doc 2 is
    # clean; doc 3 is shorter than n so its whole text is one shingle
    eval_docs = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x a b c d e f g h y"),   # contains 8-gram "a b c d e f g h"
            (2, "q w e r t y u i o p"),   # no overlap
            (3, "a b c"),                 # < n tokens -> one whole-text shingle
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in contamination(corpus, eval_docs, n=8).collect()
    }
    assert set(rows) == {1, 2, 3}
    # doc 1: 3 distinct 8-grams (windows at x..h, a..y shifted), exactly one hit
    assert rows[1].n_contaminated == 1
    assert rows[1].n_grams == 3
    assert abs(rows[1].contamination_rate - round(1 / 3, 4)) < 1e-9
    assert rows[2].n_contaminated == 0 and rows[2].contamination_rate == 0.0
    assert rows[3].n_grams == 1 and rows[3].n_contaminated == 0


def test_kmv_distinct_exact_when_underfilled_and_merge_law(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(5, 25)],
        "grp string, v long",
    )
    # k larger than every group: sketches never fill, estimates are exact
    out = {r.grp: r for r in kmv_distinct(df, "grp", "v", k=64).collect()}
    assert out["a"].kmv_estimate == 10 and out["a"].rel_err == 0.0
    assert out["b"].kmv_estimate == 20
    # merge law: __all__ is distinct of the union (values 0..24), exact here
    assert out["__all__"].kmv_estimate == 25 and out["__all__"].n_exact == 25

    # k smaller than the groups: the estimator engages; it must stay within
    # a loose 3/sqrt(k) relative band (k=16 -> 75%) of the truth, and the
    # merged sketch must equal the sketch of the unioned values
    est = {r.grp: r for r in kmv_distinct(df, "grp", "v", k=16).collect()}
    assert abs(est["__all__"].rel_err) <= 0.75
    direct = {
        r.grp: r
        for r in kmv_distinct(
            df.withColumn("grp", F.lit("z")), "grp", "v", k=16
        ).collect()
    }
    assert est["__all__"].kmv_estimate == direct["z"].kmv_estimate


def test_countmin_overestimates_only_and_merge_by_sum(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import countmin_freq

    df = spark.createDataFrame(
        [(f"u{i % 7}",) for i in range(100)], "v string"
    )
    out = countmin_freq(df, "v", depth=4, width=8).collect()
    assert len(out) == 7
    for r in out:
        # CMS error is one-sided: never underestimates
        assert r.overestimate >= 0
        assert r.cms_estimate == r.n_exact + r.overestimate
    # a huge grid has no collisions: estimates exact
    exact = countmin_freq(df, "v", depth=4, width=4096).collect()
    assert all(r.overestimate == 0 for r in exact)


def test_hll_distinct_accuracy_and_merge_law(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("a", i) for i in range(300)] + [("b", i) for i in range(200, 600)],
        "grp string, v long",
    )
    out = {r.grp: r for r in hll_distinct(df, "grp", "v", p=8).collect()}
    # standard error for m=256 is ~1.04/16 = 6.5%; allow 3 sigma
    assert abs(out["a"].rel_err) <= 0.20 and out["a"].n_exact == 300
    assert abs(out["b"].rel_err) <= 0.20 and out["b"].n_exact == 400
    assert abs(out["__all__"].rel_err) <= 0.20 and out["__all__"].n_exact == 600
    # merge law: the __all__ registers are the element-wise max of the
    # group registers, so the merged estimate must equal the estimate of
    # the same values sketched under one group
    direct = {
        r.grp: r
        for r in hll_distinct(
            df.withColumn("grp", F.lit("z")), "grp", "v", p=8
        ).collect()
    }
    assert out["__all__"].hll_estimate == direct["z"].hll_estimate
    # duplicates cannot move a register (max is idempotent): tripling the
    # input changes nothing
    tripled = df.union(df).union(df)
    again = {r.grp: r for r in hll_distinct(tripled, "grp", "v", p=8).collect()}
    assert {g: r.hll_estimate for g, r in again.items()} == {
        g: r.hll_estimate for g, r in out.items()
    }


def test_hll_small_range_correction_is_near_exact(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame([("a", i) for i in range(8)], "grp string, v long")
    out = {r.grp: r for r in hll_distinct(df, "grp", "v", p=8).collect()}
    # 8 distinct into 256 registers: linear counting regime, tight
    assert abs(out["a"].hll_estimate - 8) <= 1


def test_hashed_classifier_score_shape_and_determinism(spark):
    from data_pipeline_kafka_ek_spark.operators.text import hashed_classifier_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha alpha"), (3, "delta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in hashed_classifier_score(df).collect()}
    assert rows[1].n_tokens == 3 and rows[3].n_tokens == 1
    # repeated token => score is exactly the single-token score
    single = {
        r.doc_id: r
        for r in hashed_classifier_score(
            spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
        ).collect()
    }
    assert rows[2].clf_score == single[9].clf_score
    # deterministic across runs and keep agrees with the sign
    again = {r.doc_id: r for r in hashed_classifier_score(df).collect()}
    for d in rows:
        assert rows[d].clf_score == again[d].clf_score
        assert rows[d].keep == (rows[d].clf_score > 0) or abs(rows[d].clf_score) < 1e-6


def test_perplexity_buckets_per_lang_thirds(spark):
    from data_pipeline_kafka_ek_spark.operators.text import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, "en" if i < 9 else "de", f"w{i} common tail common w{i}") for i in range(12)],
        "doc_id long, lang string, text string",
    )
    rows = perplexity_buckets(docs).collect()
    assert len(rows) == 12
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.ppl_bucket)
    # 9 en docs -> exactly 3 per bucket; 3 de docs -> 1 per bucket
    assert sorted(by_lang["en"]) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert sorted(by_lang["de"]) == ["head", "middle", "tail"]
    # within a language, every head score >= every tail score
    en = [(r.mean_logprob, r.ppl_bucket) for r in rows if r.lang == "en"]
    head_min = min(s for s, b in en if b == "head")
    tail_max = max(s for s, b in en if b == "tail")
    assert head_min >= tail_max


def test_corpus_overlap_minhash_estimates_and_bounds(spark):
    from data_pipeline_kafka_ek_spark.operators.dedup import corpus_overlap_minhash

    # identical corpora -> Jaccard 1.0; disjoint -> 0.0
    docs = spark.createDataFrame(
        [
            ("a", 1, "one two three four five"),
            ("b", 2, "one two three four five"),
            ("c", 3, "six seven eight nine ten"),
        ],
        "source string, doc_id long, text string",
    )
    rows = {
        (r.group_a, r.group_b): r
        for r in corpus_overlap_minhash(docs, n_hashes=16).collect()
    }
    assert rows[("a", "b")].jaccard_est == 1.0
    assert rows[("a", "b")].jaccard_exact == 1.0
    assert rows[("a", "c")].jaccard_est == 0.0
    assert rows[("a", "c")].jaccard_exact == 0.0
    assert rows[("b", "c")].n_match == 0
    # a group whose docs are all shorter than one shingle has no
    # signature and is absent from the matrix (an empty set cannot be
    # sketched); the other group alone forms no pair -> empty result,
    # and nothing crashes on the negative-length slice path
    short = spark.createDataFrame(
        [("a", 1, "just two"), ("b", 2, "x y z w")],
        "source string, doc_id long, text string",
    )
    assert corpus_overlap_minhash(short, n_hashes=8).collect() == []


def test_remove_duplicate_spans_deletes_shared_ngrams_only(spark):
    from data_pipeline_kafka_ek_spark.operators.text import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e unique one here"),
            (2, "x y a b c d e z w q"),
            (3, "totally different words here friend"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in remove_duplicate_spans(df, n=4).collect()}
    # "a b c d e" is shared: its two 4-grams cover 5 positions in each doc
    assert rows[1].text_deduped == "unique one here" and rows[1].n_removed == 5
    assert rows[2].text_deduped == "x y z w q" and rows[2].n_removed == 5
    # untouched doc passes through verbatim
    assert rows[3].n_removed == 0
    assert rows[3].text_deduped == "totally different words here friend"
    # a doc shorter than n carries no n-gram and passes through
    short = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(short, n=4).collect()}
    assert out[1].n_removed == 0 and out[1].text_deduped == "a b"


def test_tokenizer_fertility_exact_on_known_vocab(spark):
    from data_pipeline_kafka_ek_spark.operators.text import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "en", "ab ab"), (2, "de", "cd")], "doc_id long, lang string, text string"
    )
    # one merge rule: a+b -> ab; en words become 1 token each, de stays 2
    merges = [(1, "a", "b", 2)]
    rows = {r.lang: r for r in tokenizer_fertility(docs, merges).collect()}
    # en: 2 words, each "a b </w>" -> "ab </w>" = 2 tokens per word
    assert rows["en"].n_words == 2 and rows["en"].n_bpe_tokens == 4
    assert rows["en"].fertility == 2.0
    # de: 1 word "c d </w>" unmerged = 3 tokens
    assert rows["de"].n_words == 1 and rows["de"].n_bpe_tokens == 3
    assert rows["de"].fertility == 3.0
    assert rows["de"].compression == 1.0


def test_distribution_drift_detects_shift_and_ignores_stable(spark):
    from data_pipeline_kafka_ek_spark.operators.relational import distribution_drift

    base = spark.createDataFrame(
        [("stable", float(i % 10)) for i in range(100)]
        + [("moved", float(i % 10)) for i in range(100)],
        "event_type string, value double",
    )
    cur = spark.createDataFrame(
        [("stable", float(i % 10)) for i in range(100)]
        + [("moved", float(i % 10) + 50.0) for i in range(100)]  # clamps to top bin
        + [("newgroup", 1.0)],
        "event_type string, value double",
    )
    rows = {r.grp: r for r in distribution_drift(base, cur).collect()}
    assert not rows["stable"].drifted and abs(rows["stable"].psi) < 0.01
    assert rows["moved"].drifted and rows["moved"].psi > 1.0
    # groups without a baseline distribution are absent, not fabricated
    assert "newgroup" not in rows
    # identical distributions -> psi exactly 0 after rounding
    assert rows["stable"].n_baseline == 100 and rows["stable"].n_current == 100


def test_kmv_set_ops_exact_when_underfilled_and_estimates_when_full(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_set_ops

    # |A|=30, |B|=25, |A∩B|=15 (values 15..29), |A∪B|=40
    df = spark.createDataFrame(
        [("a", i) for i in range(30)] + [("b", i) for i in range(15, 40)],
        "grp string, v long",
    )
    # k above the union size: everything is exact by construction
    r = kmv_set_ops(df, "grp", "v", ga="a", gb="b", k=64).collect()[0]
    assert r.n_sketch_union == 40
    assert r.union_est == 40 and r.union_exact == 40
    assert r.inter_est == 15 and r.inter_exact == 15
    assert abs(r.jaccard_est - round(15 / 40, 4)) < 1e-9

    # k below the union size: estimator engages; loose 3/sqrt(k) bands
    r2 = kmv_set_ops(df, "grp", "v", ga="a", gb="b", k=16).collect()[0]
    assert r2.n_sketch_union == 16
    assert abs(r2.union_est - 40) <= 0.75 * 40
    assert 0.0 <= r2.jaccard_est <= 1.0

    # one side empty: union collapses to A, intersection is zero
    r3 = kmv_set_ops(
        df.filter(F.col("grp") == "a"), "grp", "v", ga="a", gb="b", k=64
    ).collect()[0]
    assert r3.union_est == 30 and r3.inter_est == 0 and r3.jaccard_est == 0.0
    assert r3.inter_exact == 0


def test_kmv_rollup_preserves_null_dimension_groups(spark):
    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_rollup

    df = spark.createDataFrame(
        [("a", None, 1), ("a", None, 2), (None, "d1", 2), ("a", "d1", 3)],
        "g1 string, g2 string, v long",
    )
    rows = {(r.gset, r.key): r for r in kmv_rollup(df, ["g1", "g2"], "v", k=8).collect()}
    # NULL coordinates render as the sentinel and are never dropped
    assert rows[("cell", "a|<null>")].n_exact == 2
    assert rows[("cell", "<null>|d1")].n_exact == 1
    assert rows[("g1", "<null>")].n_exact == 1
    assert rows[("g2", "<null>")].n_exact == 2
    assert rows[("g1", "a")].n_exact == 3
    assert rows[("g2", "d1")].n_exact == 2
    assert rows[("all", "*")].n_exact == 3
    # sketches did not fill (k=8 > distinct counts): estimates are exact
    assert all(r.kmv_estimate == r.n_exact for r in rows.values())


def test_kmv_rollup_merge_levels_match_bruteforce_when_full(spark):
    """r16 optimization: the marginal/grand-total levels moved from the
    3-exchange dropDuplicates + double-window chain to a 2-exchange
    dense_rank group-limit + collect_set merge. The sketch CONTENT must
    be unchanged — for every level, n_sketch and the estimate must equal
    a brute-force k-smallest-distinct-md5 computation, including when the
    sketches FILL (the estimator branch that reads the k-th hash)."""
    import hashlib

    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_rollup

    k = 8
    # 3 g1 values x 4 g2 values x values 0..39 with per-cell offsets:
    # every level holds far more than k distinct values, so all sketches
    # fill and the (k-1)/frac(h_k) branch is exercised everywhere
    rows = [
        (f"a{i}", f"b{j}", (i * 131 + j * 17 + v) % 97)
        for i in range(3)
        for j in range(4)
        for v in range(40)
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string, v long")
    got = {
        (r.gset, r.key): r
        for r in kmv_rollup(df, ["g1", "g2"], "v", k=k).collect()
    }

    def expected(values):
        hs = sorted({hashlib.md5(str(v).encode()).hexdigest() for v in values})
        sk = hs[:k]
        n_sketch = len(sk)
        if n_sketch < k:
            return n_sketch, n_sketch
        frac = int(sk[-1][:15], 16) / float(16**15)
        return n_sketch, int(round((k - 1) / frac))

    by_g1: dict = {}
    by_g2: dict = {}
    allv: set = set()
    for g1, g2, v in rows:
        by_g1.setdefault(g1, set()).add(v)
        by_g2.setdefault(g2, set()).add(v)
        allv.add(v)
    for g1, vals in by_g1.items():
        n_sk, est = expected(vals)
        assert (got[("g1", g1)].n_sketch, got[("g1", g1)].kmv_estimate) == (
            n_sk, est,
        ), f"g1={g1}"
    for g2, vals in by_g2.items():
        n_sk, est = expected(vals)
        assert (got[("g2", g2)].n_sketch, got[("g2", g2)].kmv_estimate) == (
            n_sk, est,
        ), f"g2={g2}"
    n_sk, est = expected(allv)
    assert (got[("all", "*")].n_sketch, got[("all", "*")].kmv_estimate) == (
        n_sk, est,
    )
    # exact counts still ride along and the sketches genuinely filled
    assert got[("all", "*")].n_exact == len(allv)
    assert got[("all", "*")].n_sketch == k


def test_kmv_rollup_escapes_sentinel_and_separator_collisions(spark):
    """A literal "<null>" string and a real NULL are DISTINCT groups, and
    a literal '|' inside a dimension value cannot shift the cell-key
    split — real values are escaped before rendering. Verified
    cross-engine: DuckDB runs the mirrored replace chain on the same
    rows and the (gset, key, n_exact) sets must be identical."""
    import duckdb

    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_rollup

    rows = [
        ("<null>", "x", 1),
        ("<null>", "x", 2),
        (None, "x", 3),
        ("a|b", None, 4),
        ("a", "|b", 4),
        ("back\\slash", "x", 5),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string, v long")
    got = {
        (r.gset, r.key): r.n_exact
        for r in kmv_rollup(df, ["g1", "g2"], "v", k=8).collect()
    }
    # the literal string and the real NULL are separate groups
    assert got[("g1", "\\<null>")] == 2
    assert got[("g1", "<null>")] == 1
    # escaped separator: the two distinct cells cannot merge
    assert got[("cell", "a\\|b|<null>")] == 1
    assert got[("cell", "a|\\|b")] == 1
    assert got[("g1", "back\\\\slash")] == 1

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (g1 VARCHAR, g2 VARCHAR, v BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    esc = (
        "coalesce(replace(replace(replace({c}, '\\', '\\\\'), "
        "'|', '\\|'), '<', '\\<'), '<null>')"
    )
    oracle = con.execute(
        f"""
        WITH vals AS (SELECT DISTINCT g1, g2, v FROM t WHERE v IS NOT NULL)
        SELECT 'cell' AS gset,
               {esc.format(c='g1')} || '|' || {esc.format(c='g2')} AS key,
               count(*) AS n FROM vals GROUP BY g1, g2
        UNION ALL
        SELECT 'g1', {esc.format(c='g1')}, count(DISTINCT v)
        FROM vals GROUP BY g1
        UNION ALL
        SELECT 'g2', {esc.format(c='g2')}, count(DISTINCT v)
        FROM vals GROUP BY g2
        UNION ALL
        SELECT 'all', '*', count(DISTINCT v) FROM vals
        """
    ).fetchall()
    assert {(g, k): n for (g, k, n) in oracle} == got
