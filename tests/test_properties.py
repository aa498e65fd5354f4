"""Property-based tests (hypothesis) for the algorithmic kernels.

The reference has no automated tests at all (SURVEY.md §5.1); these go
beyond example-based parity: each property asserts an *invariant* of an
operator over generated inputs. Spark jobs are expensive per example, so
properties that need a cluster run one job over a generated batch;
pure-Python kernels (_simhash64) are tested per-example.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_kafka_ek_spark.operators import dedup

TOKENS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=12
)


@given(TOKENS)
@settings(max_examples=200, deadline=None)
def test_simhash_is_permutation_and_duplication_invariant(toks):
    """SimHash is a function of the token *set* — order and repetition of
    tokens must not change the signature."""
    text = " ".join(toks)
    shuffled = " ".join(reversed(toks))
    doubled = " ".join(toks + toks)
    assert dedup._simhash64(text) == dedup._simhash64(shuffled) == dedup._simhash64(doubled)


@given(TOKENS, TOKENS)
@settings(max_examples=200, deadline=None)
def test_simhash_hamming_bounded_by_symmetric_difference(a, b):
    """Each token flips at most its own md5 bit-votes: the Hamming distance
    between two signatures can only stem from tokens in the symmetric
    difference — identical sets give distance 0."""
    if set(a) == set(b):
        ha, hb = dedup._simhash64(" ".join(a)), dedup._simhash64(" ".join(b))
        assert ha == hb


@given(st.lists(st.tuples(st.integers(0, 50), st.floats(0, 100)), min_size=1, max_size=30))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_latest_per_key_matches_python_reduction(spark, rows):
    """latest_per_key == a driver-side dict replay of the changelog."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from data_pipeline_kafka_ek_spark.operators.relational import latest_per_key

    df = spark.createDataFrame(
        [Row(k=k, seq=i, v=v) for i, (k, v) in enumerate(rows)]
    )
    got = {
        r["k"]: (r["seq"], r["v"])
        for r in latest_per_key(df, "k", [F.desc("seq")]).collect()
    }
    want: dict[int, tuple[int, float]] = {}
    for i, (k, v) in enumerate(rows):
        want[k] = (i, v)
    assert got == want


@given(
    st.lists(TOKENS, min_size=2, max_size=8),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_jaccard_pairs_match_python_bruteforce(spark, docs, threshold):
    """jaccard_pairs (prefix-filtered candidate join + verify) == python
    brute force over all pairs, at any threshold."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(docs)]
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard_sim
        for r in dedup.jaccard_pairs(df, threshold=threshold).collect()
    }
    want = {}
    sets = [set(t) for t in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            if jac >= threshold:
                want[(i, j)] = round(jac, 4)
    assert got == want


@given(st.text(alphabet="abcdef ", min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_simhash_matches_oracle_formula(text):
    """The Python kernel equals an independent recomputation using the
    same md5-big-endian convention the DuckDB oracle SQL uses."""
    toks = set(text.split())
    acc = [0] * 64
    for tok in toks:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for j in range(64):
            acc[j] += 1 if (h >> j) & 1 else -1
    u = sum(1 << j for j in range(64) if acc[j] > 0)
    signed = u - (1 << 64) if u >= (1 << 63) else u
    assert dedup._simhash64(text) == signed


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_simhash_batch_equals_scalar(texts):
    assert dedup._simhash64_batch(texts) == [dedup._simhash64(t) for t in texts]


_BSON_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)


@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh_", min_size=1, max_size=8),
        st.one_of(
            _BSON_SCALARS,
            st.lists(_BSON_SCALARS, max_size=4),
            st.dictionaries(
                st.text(alphabet="xyz", min_size=1, max_size=4),
                _BSON_SCALARS,
                max_size=3,
            ),
        ),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_bson_codec_roundtrips_generated_documents(doc):
    """encode->decode is the identity for every document shape the Mongo
    sink can emit (scalars, lists, nested docs, unicode keys/values)."""
    from data_pipeline_kafka_ek_spark.streaming import mongo_wire as mw

    assert mw.bson_decode_doc(mw.bson_encode_doc(doc)) == doc


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=3),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_merges_never_expand_and_rank_monotone(spark, word_docs):
    """BPE invariants over generated corpora: merge counts are
    non-increasing with rank (a later merge can never be more frequent
    than an earlier one was at selection time... weaker but always true:
    every selected count is >= 1), and encoding with the learned table
    never increases any document's token count."""
    from data_pipeline_kafka_ek_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_docs)],
        "doc_id long, text string",
    )
    merges = text_ops.bpe_train_merges(docs, n_merges=3)
    assert all(m[3] >= 1 for m in merges)
    rows = text_ops.bpe_token_counts(docs, merges).collect()
    assert all(r.n_bpe_tokens <= r.n_base_symbols for r in rows)
    assert all(r.n_bpe_tokens >= 1 for r in rows)


@given(st.sets(st.integers(0, 10_000_000), min_size=1, max_size=400))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_python_model_error_bound_and_merge(vals):
    """Pure-Python twin of the HLL register/estimator math (identical to
    operators/sketches.py::hll_distinct and the streaming automaton):
    the estimate stays inside 5 standard errors for arbitrary value
    sets, and splitting the set into two sketches then max-merging the
    registers reproduces the single-sketch registers exactly."""
    import math

    m, hex_b = 256, 2
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << 61)

    def registers(vs):
        regs = [0] * m
        for v in vs:
            h = hashlib.md5(str(v).encode()).hexdigest()
            reg = int(h[:hex_b], 16)
            wv = int(h[hex_b : hex_b + 15], 16)
            rho = 61 if wv == 0 else 60 - wv.bit_length() + 1
            regs[reg] = max(regs[reg], rho)
        return regs

    def estimate(regs):
        n_present = sum(1 for r in regs if r > 0)
        total = sum(1 << (61 - r) for r in regs if r > 0) + (m - n_present) * (
            1 << 61
        )
        e = num / float(total)
        v_empty = m - n_present
        if e <= 2.5 * m and v_empty > 0:
            e = float(m) * math.log(float(m) / v_empty)
        return int(math.floor(e + 0.5))

    regs = registers(vals)
    est = estimate(regs)
    se = 1.04 / math.sqrt(m) * len(vals)
    assert abs(est - len(vals)) <= max(5 * se, 3)
    # merge law: element-wise max of two half-sketches == whole sketch
    vl = sorted(vals)
    half = len(vl) // 2
    merged = [max(a, b) for a, b in zip(registers(vl[:half]), registers(vl[half:]))]
    assert merged == regs


@given(st.lists(st.sampled_from("alpha beta gamma delta eps".split()), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_classifier_score_is_token_order_invariant(spark, toks):
    """The feature-hashed score is a mean over per-token weights, so any
    permutation of the same multiset must score identically (exact
    fixed-point accumulation makes this bit-exact, not approximate)."""
    from data_pipeline_kafka_ek_spark.operators.text import hashed_classifier_score

    fwd = " ".join(toks)
    rev = " ".join(reversed(toks))
    df = spark.createDataFrame(
        [(1, fwd), (2, rev)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in hashed_classifier_score(df).collect()}
    assert rows[1].clf_score == rows[2].clf_score
    assert rows[1].n_tokens == rows[2].n_tokens == len(toks)


def test_psi_degenerate_baseline_detects_moved_constant(spark):
    """A constant baseline (hi == lo) must still detect drift: the
    degenerate branch bins on equality (value == lo -> bin 0, else the
    edge bin), so a feed that moves to a DIFFERENT constant reports a
    large PSI instead of silently mapping everything to bin 0 and
    claiming PSI = 0 (the monitoring blind spot fixed in round 7)."""
    import math

    from data_pipeline_kafka_ek_spark.operators.relational import (
        distribution_drift,
    )

    n = 100
    base = spark.createDataFrame(
        [("a", 5.0)] * n, "event_type string, value double"
    )
    moved = spark.createDataFrame(
        [("a", 9.0)] * n, "event_type string, value double"
    )
    same = spark.createDataFrame(
        [("a", 5.0)] * n, "event_type string, value double"
    )

    got = distribution_drift(base, moved).collect()
    assert len(got) == 1 and got[0].grp == "a"
    # all baseline mass in bin 0, all current mass in bin 9:
    # psi = 2 * (n/(n+10)) * ln(n+1) with add-one smoothing
    expected = 2 * (n / (n + 10.0)) * math.log(n + 1.0)
    assert abs(got[0].psi - expected) < 1e-3
    assert got[0].drifted is True

    unchanged = distribution_drift(base, same).collect()
    assert unchanged[0].psi == 0.0 and unchanged[0].drifted is False


def test_psi_degenerate_baseline_streaming_matches_batch(spark):
    """The streaming PSI automaton applies the same degenerate-baseline
    equality rule, so its final revision equals the batch verdict."""
    from data_pipeline_kafka_ek_spark.operators.relational import (
        distribution_drift,
    )
    from data_pipeline_kafka_ek_spark.streaming import runtime

    n = 60
    base = spark.createDataFrame(
        [("a", 5.0, i) for i in range(n)],
        "event_type string, value double, seq long",
    )
    cur = spark.createDataFrame(
        [("a", 9.0 if i % 2 else 5.0, i) for i in range(n)],
        "event_type string, value double, seq long",
    )
    batch = distribution_drift(base, cur).collect()[0]

    baseline = {"a": (5.0, 5.0, [n] + [0] * 9)}
    stream = runtime.replayed_stream(spark, cur, n_slices=3, order_col="seq")
    rev = runtime.run_available_now(
        runtime.psi_drift_stateful(stream, baseline), output_mode="update"
    )
    last = max(rev.collect(), key=lambda r: r.rows_seen)
    assert (last.psi, last.drifted) == (batch.psi, batch.drifted)
    assert last.n_current == batch.n_current == n


def test_sketches_null_values_excluded_null_groups_kept(spark):
    """COUNT(DISTINCT) convention across every sketch: NULL *values*
    never enter a sketch (they used to hash to NULL digests whose sort
    position differed between engines); NULL *groups* keep their own
    output row (GROUP BY semantics, eqNullSafe exact join)."""
    from data_pipeline_kafka_ek_spark.operators import sketches

    rows = [
        ("a", 1),
        ("a", None),
        (None, 2),
        (None, None),
        ("b", 3),
        ("b", 3),
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")

    kmv = {r.grp: r for r in sketches.kmv_distinct(df, "event_type", "user_id").collect()}
    assert set(kmv) == {"a", None, "b", "__all__"}
    assert kmv["a"].n_exact == 1 and kmv["a"].kmv_estimate == 1
    assert kmv[None].n_exact == 1 and kmv[None].kmv_estimate == 1
    assert kmv["__all__"].n_exact == 3  # distinct non-NULL values {1,2,3}

    hll = {r.grp: r for r in sketches.hll_distinct(df, "event_type", "user_id").collect()}
    assert set(hll) == {"a", None, "b", "__all__"}
    assert hll[None].n_exact == 1
    assert hll["__all__"].n_exact == 3

    cms = sketches.countmin_freq(df, "user_id").collect()
    assert {r.v for r in cms} == {1, 2, 3}  # no NULL-value row
    assert {r.v: r.n_exact for r in cms}[3] == 2


def test_ansi_ratio_operators_survive_degenerate_inputs(spark):
    """ANSI-hazard sweep (round-7): every ratio-emitting operator must
    either guard its denominator or provably never see zero. Degenerate
    corpus: empty text, whitespace-only text, single-token docs, a
    language whose docs are ALL empty (sum(n_words)=0 — the fertility
    hazard), plus a zero embedding vector (the cosine hazard). Under
    ANSI mode (Spark 4 default) an unguarded division crashes with
    DIVIDE_BY_ZERO rather than returning NULL, so completing at all IS
    the assertion; value checks pin the documented degenerate semantics."""
    from data_pipeline_kafka_ek_spark.operators import similarity, text

    docs = spark.createDataFrame(
        [
            (1, "", "xx", "s1"),
            (2, " ", "xx", "s1"),
            (3, "one", "en", "s2"),
            (4, "the cat sat on the mat", "en", "s2"),
            (5, "", "xx", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )

    # fertility: lang 'xx' has zero words -> NULL fertility, no crash
    merges = text.bpe_train_merges(docs, n_merges=2)
    fert = {r.lang: r for r in text.tokenizer_fertility(docs, merges).collect()}
    assert fert["xx"].fertility is None
    assert fert["xx"].n_words == 0
    assert fert["en"].fertility is not None and fert["en"].fertility > 0

    # quality / gopher / repetition / token budget / dsir / clf: complete
    # without error on the same degenerate docs
    assert text.quality_score(docs).count() == 5
    assert text.gopher_rules(docs).count() == 5
    assert text.repetition_stats(docs).count() == 5
    assert text.token_budget_plan(docs, 1000).count() == 2
    assert text.dsir_importance(docs, docs.limit(2)).count() == 5
    assert text.hashed_classifier_score(docs).count() == 5
    # perplexity buckets: docs with < 2 split-tokens have no bigram to
    # score and are dropped (the CCNet convention: unscorable -> not
    # bucketed). '' yields one empty token (dropped); ' ' yields two
    # empty tokens = one bigram (scored); 'one' yields one token (dropped)
    assert text.perplexity_buckets(docs).count() == 2
    assert text.contamination(docs, docs.limit(1)).count() == 5

    # cosine with a zero vector: defined as 0.0, never DIVIDE_BY_ZERO
    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    top = similarity.cosine_topk(vecs, vecs, k=2).collect()
    zero_sims = [r.cosine_sim for r in top if 1 in (r.query_id, r.neighbor_id)]
    assert zero_sims and all(s == 0.0 for s in zero_sims)
    blocked = similarity.cosine_topk_blocked(
        vecs, [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])], k=2
    ).collect()
    zb = [r.cosine_sim for r in blocked if 1 in (r.query_id, r.neighbor_id)]
    assert zb and all(s == 0.0 for s in zb)


@given(
    st.sets(st.integers(0, 10_000_000), max_size=300),
    st.sets(st.integers(0, 10_000_000), max_size=300),
)
@settings(max_examples=100, deadline=None)
def test_kmv_setops_merge_law_and_estimator_sanity(a, b):
    """Pure-Python model of kmv_set_ops' math: (1) the MERGE LAW is
    exact — the union sketch built from the two per-side sketches
    equals the sketch of the union set, always; (2) when the union
    sketch did not fill, every reported number is exactly the truth;
    (3) when it filled, the estimates stay inside generous 3-sigma-ish
    bands (md5 behaves as a uniform hash)."""
    k = 64

    def h(x):
        return hashlib.md5(str(x).encode()).hexdigest()

    sa = sorted(h(x) for x in a)[:k]
    sb = sorted(h(x) for x in b)[:k]
    u = sorted(set(sa) | set(sb))[:k]
    # (1) merge law: k smallest of the sketch union == k smallest of the
    # union's full hash set
    assert u == sorted({h(x) for x in a | b})[:k]
    n_u = len(u)
    n_both = sum(1 for x in u if x in set(sa) and x in set(sb))
    if n_u < k:
        # (2) under-filled sketch IS the exact union
        assert n_u == len(a | b)
        assert n_both == len(a & b)
    else:
        frac = int(u[-1][:15], 16) / 16**15
        d_u = (k - 1) / frac
        est_inter = d_u * (n_both / n_u)
        true_u, true_i = len(a | b), len(a & b)
        # (3) loose bands, same convention as the Spark-side tests
        assert abs(d_u - true_u) <= 0.75 * true_u + 8
        assert est_inter <= d_u + 1e-9
        assert abs(est_inter - true_i) <= 0.75 * true_u + 8


def test_zvalue_expression_matches_python_twin(spark):
    """The z-order clustering key's bit math, validated value-for-value
    against a pure-Python interleave twin on every (bucket, bucket)
    pair, plus the property OPTIMIZE relies on: the z-curve preserves
    per-dimension dominance (a <= b in EVERY dimension implies
    z(a) <= z(b)), which is what makes contiguous z-ranges cover
    axis-aligned rectangles and per-file min/max stats tight on every
    dimension."""
    from pyspark.sql import functions as F

    bits = 4
    n = 1 << bits
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a int, b int")
    # drive the interleave construction directly on pre-bucketed ints
    # (identity quantile mapping: bucket == value), mirroring
    # TxnLogTable._with_zvalue's staged-column form exactly
    zdf = df.withColumn("__zorder_b0", F.col("a").cast("long")).withColumn(
        "__zorder_b1", F.col("b").cast("long")
    )
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, name in enumerate(["__zorder_b0", "__zorder_b1"]):
            pos = bit * 2 + i
            z = z + F.shiftleft(F.shiftright(F.col(name), bit) % 2, pos)
    got = {
        (r.a, r.b): r.z
        for r in zdf.withColumn("z", z).select("a", "b", "z").collect()
    }

    def twin(a, b):
        out = 0
        for bit in range(bits):
            out |= ((a >> bit) & 1) << (bit * 2)
            out |= ((b >> bit) & 1) << (bit * 2 + 1)
        return out

    assert got == {(a, b): twin(a, b) for a, b in rows}
    # dominance: a1<=a2 and b1<=b2 -> z1<=z2 (checked on a lattice slice)
    for a1 in range(0, n, 3):
        for b1 in range(0, n, 3):
            for a2 in range(a1, n, 5):
                for b2 in range(b1, n, 5):
                    assert got[(a1, b1)] <= got[(a2, b2)]


# -- derived prune-conjunct soundness (acid.conjuncts_from_condition) --------

_LIT_STR = st.text(
    alphabet="ab 'c%AND_OR", min_size=0, max_size=8
).map(lambda s: "'" + s.replace("'", "''") + "'")
_LIT_NUM = st.integers(min_value=-50, max_value=50).map(str)


@st.composite
def _atoms(draw):
    col = draw(st.sampled_from(["k", "x", "grp"]))
    lit = {"k": _LIT_NUM, "x": _LIT_NUM, "grp": _LIT_STR}[col]
    kind = draw(st.integers(0, 5))
    if kind == 0 and col != "grp":
        lo = draw(st.integers(-50, 50))
        hi = lo + draw(st.integers(0, 30))
        return f"{col} BETWEEN {lo} AND {hi}"
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">="]))
    atom = f"{col} {op} {draw(lit)}"
    if kind == 1:
        return f"NOT ({atom})"
    if kind == 2:
        other = f"{col} {draw(st.sampled_from(['=', '>']))} {draw(lit)}"
        return f"({atom} OR {other})"
    return atom


@st.composite
def _conditions(draw):
    cond = " AND ".join(draw(st.lists(_atoms(), min_size=1, max_size=4)))
    # sometimes a TOP-LEVEL unparenthesized OR tail — AND binds tighter,
    # so "a AND b OR c" is "(a AND b) OR c" and NO conjunct is implied;
    # the deriver must return [] (the r12 soundness regression)
    if draw(st.booleans()):
        cond = cond + " OR " + draw(_atoms())
    return cond


_CONDITIONS = _conditions()


def _conj_sql(c):
    col, op, val = c
    if op == "between":
        lo, hi = val

        def q(v):
            return f"'{str(v).replace(chr(39), chr(39) * 2)}'" if isinstance(v, str) else str(v)

        return f"{col} BETWEEN {q(lo)} AND {q(hi)}"
    v = f"'{str(val).replace(chr(39), chr(39) * 2)}'" if isinstance(val, str) else str(val)
    return f"{col} {op} {v}"


@given(
    _CONDITIONS,
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-60, 60)),
            st.one_of(st.none(), st.integers(-60, 60)),
            st.one_of(st.none(), st.text(alphabet="ab c%", max_size=6)),
        ),
        min_size=1,
        max_size=24,
    ),
)
@settings(max_examples=150, deadline=None)
def test_derived_conjuncts_are_implied_and_prune_soundly(cond, rows):
    """The mechanical conjunct deriver's SAFETY property, end to end:
    (1) every derived conjunct is IMPLIED by the condition — no row
    satisfying the condition fails a conjunct (checked in DuckDB over
    generated rows, NULLs included); (2) log-stats pruning with the
    derived conjuncts never drops a file that contains a matching row
    (chunked rows -> per-chunk min/max/null stats exactly as
    _write_data_files records them -> _stats_may_match)."""
    import duckdb

    from data_pipeline_kafka_ek_spark.sources.acid import (
        _stats_may_match,
        conjuncts_from_condition,
    )

    derived = conjuncts_from_condition(cond)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, x BIGINT, grp VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    # (1) implication, SQL three-valued logic: violation = cond TRUE
    # while the conjunct is not TRUE
    for c in derived:
        n = con.execute(
            f"SELECT count(*) FROM t WHERE ({cond}) "
            f"AND (NOT ({_conj_sql(c)}) OR ({_conj_sql(c)}) IS NULL)"
        ).fetchone()[0]
        assert n == 0, (cond, c)
    # (2) pruning soundness over synthetic per-file stats
    chunk = max(1, len(rows) // 3)
    for i in range(0, len(rows), chunk):
        part = rows[i : i + chunk]
        stats = {}
        for ci, col in enumerate(("k", "x", "grp")):
            vals = [r[ci] for r in part if r[ci] is not None]
            stats[col] = {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "nulls": sum(1 for r in part if r[ci] is None),
            }
        add = {"rows": len(part), "stats": stats}
        if not _stats_may_match(add, derived):
            con.execute("DELETE FROM t")
            con.executemany("INSERT INTO t VALUES (?, ?, ?)", part)
            n = con.execute(
                f"SELECT count(*) FROM t WHERE {cond}"
            ).fetchone()[0]
            assert n == 0, (cond, derived, part)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s.flag", "note", "x = 1", "AND", "t.v > 2"]),
            st.sampled_from(["'s.lit'", '"s.dq"', "`s.bq`", "''", "'it''s.x'"]),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_sub_outside_quotes_never_touches_literals(segments):
    """Interleave identifier text with quoted literals; the alias rewrite
    must hit every unquoted 's.' and none of the quoted ones (all three
    Spark quoting forms, including doubled-quote escapes)."""
    from data_pipeline_kafka_ek_spark.functions.sqltext import (
        quoted_spans,
        sub_outside_quotes,
    )

    text = " ".join(x for pair in segments for x in pair)
    got = sub_outside_quotes(text, r"\bs\.", "")
    # rebuild the expectation straight from the span scanner
    spans = quoted_spans(text)
    import re

    expect, last = [], 0
    for m in re.finditer(r"\bs\.", text):
        if any(lo <= m.start() < hi for lo, hi in spans):
            continue
        expect.append(text[last : m.start()])
        last = m.end()
    expect.append(text[last:])
    assert got == "".join(expect)
    # every quoted region survives verbatim
    for lo, hi in spans:
        assert text[lo:hi] in got
