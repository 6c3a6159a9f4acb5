"""64-bit URL identity hashing.

The engine keys the frontier, the seen-set, and the partitioned Bloom
filters on a 64-bit hash of the canonical URL (SURVEY.md §2.8 X7). Engine
side this is Spark's built-in ``F.xxhash64`` (JVM, codegen, seed 42);
oracle/test side we need the *same* value from pure Python, so this module
implements the public XXH64 algorithm (https://github.com/Cyan4973/xxHash
spec, BSD) from scratch. A unit test pins Python==Spark for a corpus of
strings, which is what lets the golden `expected_seen` fixture carry
url_hash values the engine must reproduce exactly.

The reference has no URL hashing (identity is the canonical clone URL
string plus a per-key mutex, crawler/crawler.go:620-632); hashing is the
scale substitute: 8-byte keys shuffle and compare ~10x cheaper than URL
strings at a 10^10-row frontier.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42  # Spark's fixed seed for F.xxhash64


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of raw bytes, returned as a SIGNED 64-bit int (Spark LongType)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M

    h = (h + n) & _M

    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8

    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
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

    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of a string's UTF-8 bytes — equals Spark ``F.xxhash64(col)``."""
    return xxhash64_bytes(s.encode("utf-8"), seed)
