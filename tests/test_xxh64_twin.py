"""Bit-for-bit validation of the pure-Python Spark-xxhash64 twin.

tools/spark_xxh64.py exists so the DuckDB local oracle can replay
``x_dedup_minhash_xxh`` hash-for-hash (Spark's xxhash64 has no plain-SQL
twin). These tests pin the twin against Spark itself across every code
path the minhash pipeline exercises: the INT 4-byte tail, the LONG 8-byte
path, and the UTF-8 byte-stream path at every length-class boundary
(empty, <4, 4, <8, 8, <32, 32, >32, multi-stripe, multibyte UTF-8), plus
the seed-chaining used for multi-column calls.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from spark_xxh64 import xxhash64_int_str, xxhash64_longs  # noqa: E402

# length-class boundary strings + multibyte + realistic tokens
BOUNDARY_TOKENS = [
    "", "a", "ab", "abc", "abcd", "abcde", "1234567", "12345678",
    "123456789012", "x" * 16, "x" * 31, "x" * 32, "x" * 33, "x" * 63,
    "x" * 64, "x" * 100, "üñïçødé", "日本語トークン", "tok_42", "the",
]


def test_twin_matches_spark_int_string_chain(spark):
    import pyspark.sql.functions as F

    rows = [(i, t) for i in range(8) for t in BOUNDARY_TOKENS]
    df = spark.createDataFrame(rows, "i int, tok string")
    got = df.select(
        "i", "tok", F.xxhash64(F.col("i"), F.col("tok")).alias("h")
    ).collect()
    for r in got:
        assert xxhash64_int_str(r.i, r.tok) == r.h, (r.i, r.tok)


def test_twin_matches_spark_long_pairs(spark):
    import pyspark.sql.functions as F

    pairs = [
        (0, 0), (1, 2), (-1, -2), (-5, 7),
        (2**62, -(2**62)), (2**63 - 1, -(2**63)),
        (123456789012345, -98765),
    ]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    for r in got:
        assert xxhash64_longs(r.a, r.b) == r.h, (r.a, r.b)


@given(st.lists(st.tuples(st.integers(0, 7), st.text(max_size=80)), min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_twin_matches_spark_on_generated_tokens(spark, rows):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "i int, tok string")
    got = df.select(
        "i", "tok", F.xxhash64(F.col("i"), F.col("tok")).alias("h")
    ).collect()
    for r in got:
        assert xxhash64_int_str(r.i, r.tok) == r.h, (r.i, r.tok)


def test_duckdb_udf_registration_roundtrip():
    """The two UDFs check_correctness registers must be callable from SQL
    and agree with the Python twin (the exact seam the oracle uses)."""
    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import check_correctness as cc

    con = duckdb.connect()
    cc.register_local_udfs(con)
    (h_tok,) = con.execute("SELECT spark_xxh64_tok(3, 'hello')").fetchone()
    assert h_tok == xxhash64_int_str(3, "hello")
    (h_band,) = con.execute("SELECT spark_xxh64_band(-5, 7)").fetchone()
    assert h_band == xxhash64_longs(-5, 7)
    assert "x_dedup_minhash_xxh" in cc.LOCAL_ONLY_ORACLES
