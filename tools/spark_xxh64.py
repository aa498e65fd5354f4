"""Pure-Python twin of Spark's ``xxhash64`` expression (XXH64, seed-chained).

Spark's ``F.xxhash64(c1, c2, ...)`` starts from seed 42 and folds each
column in order: ``seed = XXH64(value_bytes, seed)``, where an INT hashes
through the 4-byte tail path, a LONG through the 8-byte path, and a STRING
through the general byte-stream algorithm over its UTF-8 bytes (words read
little-endian). This module reimplements exactly that so a DuckDB Python
UDF can replay Spark's xxhash64-based operators hash-for-hash — it is what
gives ``x_dedup_minhash_xxh`` (the only catalog entry whose Spark plan uses
a hash family DuckDB lacks) a value-level local oracle.

Port of the published XXH64 specification (Yann Collet, BSD 2-clause,
github.com/Cyan4973/xxHash) as specialized by Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64``; validated bit-for-bit
against Spark in tests/test_xxh64_twin.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — the 4-byte tail path (INT columns)."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — the 8-byte path (LONG columns)."""
    seed &= _M
    value &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes — the byte-stream path (STRING columns
    hash their UTF-8 bytes; words are read little-endian)."""
    seed &= _M
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while off <= n - 32:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v = (_rotl((v + k * _P2) & _M, 31) * _P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off <= n - 8:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off <= n - 4:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def xxhash64_int_str(i: int, s: str, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(F.lit(i), F.col(s))`` — INT literal then STRING column,
    seed-chained from 42. Returns Spark's signed 64-bit value."""
    h = hash_int(i, seed)
    return _signed(hash_bytes(s.encode("utf-8"), h))

def xxhash64_longs(*values: int, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(c1, c2, ...)`` over LONG columns, seed-chained from 42.
    Returns Spark's signed 64-bit value."""
    h = seed
    for v in values:
        h = hash_long(v, h)
    return _signed(h)
