"""Vectorized Spark-compatible xxHash64 chaining (numpy, no Python loops
over rows).

Why this exists: the deterministic-walk operators (graph/walks.py) drive
every transition with Spark ``xxhash64(...)`` column expressions, which
makes corpora pure functions of (edges, seed) on any partitioning. Their
single-task replay kernels need the SAME hash values inside numpy. For
first-order walks the kernel ships the finished hashes in (one Spark
projection); the second-order node2vec kernel would need A attempts x 3
channels x L steps hashes per walker — too wide to ship. Instead it
ships ONE base hash per walker and re-derives the rest, exploiting how
Spark computes multi-argument hashes:

    xxhash64(c1, c2, ..., cn)  ==  fold left over the columns with the
    running hash as the next seed, starting from seed 42:
        h = hash(c1, 42); h = hash(c2, h); ...

so ``xxhash64(walk_id, t, att, seed)`` ==
``hash_int(seed, hash_int(att, hash_int(t, xxhash64(walk_id))))`` — the
string prefix is computed ONCE by Spark (`F.xxhash64("walk_id")`), and
the integer/constant-string suffix steps are re-derived here, vectorized
over uint64 arrays.

The step functions mirror Spark's XXH64 (xxHash64 finalization spec —
public domain; same algorithm in every implementation):

- ``hash_int(i, seed)``: 4-byte branch (IntegerType literals/columns)
- ``hash_long(v, seed)``: 8-byte branch (LongType)
- ``hash_bytes_const(bs, seed)``: variable-length branch for a CONSTANT
  byte string (the 'coin' / 'alias' / 'accept' channel separators) with
  a VECTOR of seeds — chunk loops run over the constant's length, not
  over rows.

Bit-exactness against Spark's expressions is pinned by
tests/test_xxh64.py property tests (random ints/longs/strings compared
to ``F.xxhash64`` column output).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_DEFAULT_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _u64(x) -> np.ndarray:
    """int64-ish input -> uint64 bit pattern (vector or scalar)."""
    return np.asarray(x).astype(np.int64).view(np.uint64)


def hash_int(i, seed) -> np.ndarray:
    """XXH64 of one 4-byte int, seed may be a uint64 vector.

    Matches Spark's hash of an IntegerType value (the 4-byte tail
    branch of the xxHash64 spec)."""
    with np.errstate(over="ignore"):
        h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(4)
        k = np.uint64(np.int64(i) & np.int64(0xFFFFFFFF)) if np.isscalar(i) else (
            _u64(i) & np.uint64(0xFFFFFFFF)
        )
        h = h ^ (k * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def hash_long(v, seed) -> np.ndarray:
    """XXH64 of one 8-byte long, seed may be a uint64 vector."""
    with np.errstate(over="ignore"):
        h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
        k = _u64(v)
        h = h ^ (_rotl(k * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def hash_bytes_const(bs: bytes, seed) -> np.ndarray:
    """XXH64 of a constant byte string (< 32 bytes) under a seed vector.

    The chunk loops iterate over the CONSTANT's bytes, so the work is
    O(len(bs)) vector operations regardless of row count. Lengths >= 32
    would enter the four-lane stripe loop, which constant channel
    separators never reach — guarded explicitly."""
    if len(bs) >= 32:
        raise ValueError("hash_bytes_const supports < 32-byte constants")
    with np.errstate(over="ignore"):
        h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(len(bs))
        i = 0
        while len(bs) - i >= 8:
            k1 = np.uint64(int.from_bytes(bs[i:i + 8], "little"))
            h = h ^ (_rotl(k1 * _P2, 31) * _P1)
            h = _rotl(h, 27) * _P1 + _P4
            i += 8
        if len(bs) - i >= 4:
            k = np.uint64(int.from_bytes(bs[i:i + 4], "little"))
            h = h ^ (k * _P1)
            h = _rotl(h, 23) * _P2 + _P3
            i += 4
        while i < len(bs):
            h = h ^ (np.uint64(bs[i]) * _P5)
            h = _rotl(h, 11) * _P1
            i += 1
        return _fmix(h)


def hash_py_int(i: int, seed) -> np.ndarray:
    """The chain step Spark's ``F.lit(i)`` contributes for a Python
    int: a literal within int32 range becomes IntegerType (4-byte
    branch), anything larger LongType (8-byte branch). Kernels that
    re-derive ``xxhash64(..., lit(seed), ...)`` chains must mirror
    that typing or diverge for seeds outside int32 (pinned by
    tests/test_xxh64.py)."""
    if -(2 ** 31) <= i < 2 ** 31:
        return hash_int(i, seed)
    return hash_long(i, seed)


def to_spark_long(h: np.ndarray) -> np.ndarray:
    """uint64 hash state -> the signed int64 Spark exposes."""
    return h.view(np.int64)


def pmod_u64(h: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Spark ``pmod(hash, m)`` for positive m over the SIGNED view of
    the hash (Spark's pmod operates on the long value; numpy's ``%`` on
    int64 already yields the divisor's sign, which equals pmod for
    positive divisors)."""
    return h.view(np.int64) % np.asarray(m, dtype=np.int64)
