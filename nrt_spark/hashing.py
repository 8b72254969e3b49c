"""Pure-Python XXH64 (xxHash, 64-bit variant).

Implements the public xxHash64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — algorithm spec is public domain)
so that the single-process numpy oracle can reproduce Spark's
``xxhash64`` expression (Spark hashes a string column's UTF-8 bytes
with seed 42) without a SparkSession.  Parity with the JVM expression
is pinned in tests/test_oracle_pipeline.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, word: int) -> int:
    acc = (acc + word * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data`` (unsigned 64-bit result).  Default seed 42
    matches Spark's ``xxhash64`` SQL function."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed-int64 twin of Spark's ``xxhash64(string_col)``."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_long(v: int, seed: int = 42) -> int:
    """Signed-int64 twin of Spark's ``xxhash64(bigint_col)``: the value
    is hashed as its 8-byte little-endian two's-complement encoding
    (parity pinned in tests/test_oracle_pipeline.py)."""
    h = xxh64(struct.pack("<q", v), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_strs(*parts: str, seed: int = 42) -> int:
    """Signed-int64 twin of Spark's multi-argument ``xxhash64(c1, c2,
    ...)``: each argument is hashed with the previous result as seed
    (parity pinned in tests/test_oracle_pipeline.py)."""
    h = seed
    for p in parts:
        h = xxh64(p.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h
