"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Why the engine needs its own driver-side hash: per-file BLOOM FILTER
sidecars (sources/txlog.py) are BUILT executor-side with the JVM
``xxhash64`` expression — the only way the build stays whole-stage-
codegen at 100 TB — but PROBED driver-side during metadata pruning,
where spinning up a Spark job to hash three literal probe values would
cost more than reading the files. The two sides must agree on every
bit or pruning silently drops live files, so this module re-implements
the PUBLIC xxHash64 algorithm (Yann Collet, BSD-licensed spec) plus
Spark's column-chaining convention (seed 42; each column's hash seeds
the next; int/short/byte → 4-byte LE, long → 8-byte LE, string → UTF-8
bytes). Bit-exactness against ``F.xxhash64`` is pinned in
tests/test_txlog_bloom.py across types, seeds and chain shapes.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def spark_xxhash64(*operands, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(*cols)`` bit-exact: seed 42, each operand's
    hash seeds the next. Operands: ``("int", v)`` / ``("long", v)`` for
    explicitly-typed integers (Spark hashes byte/short/int as 4-byte LE
    and long as 8-byte LE), a bare ``str`` for UTF-8 string columns, or
    a bare ``int`` typed by int32 range the way Spark types literals.
    Returns the SIGNED 64-bit value the column would hold."""
    h = seed & _M64
    for op in operands:
        forced = None
        if isinstance(op, tuple):
            forced, op = op
        if isinstance(op, str):
            h = xxh64(op.encode("utf-8"), h)
        elif isinstance(op, bool):
            raise TypeError("bool operands are not supported")
        elif isinstance(op, int):
            nbytes = (
                8
                if forced == "long" or not (-(1 << 31) <= op < (1 << 31))
                else 4
            )
            h = xxh64(op.to_bytes(nbytes, "little", signed=True), h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(op)}")
    return h - (1 << 64) if h >= (1 << 63) else h
