"""Pure-Python xxHash64 matching Spark's ``F.xxhash64`` on strings.

Spark hashes a string column as xxHash64 (seed 42) over its UTF-8 bytes
and returns the result as a SIGNED 64-bit long; the bucketed table
layouts key on ``pmod(xxhash64(col), n_buckets)``. Re-implementing the
(public, specified) xxHash64 algorithm here lets the serving sidecars
resolve a key's bucket locally — without this, a NeighborServer point
read on a new document pays a whole Spark job just to learn which
directory to open. Verified bit-for-bit against ``F.xxhash64`` by
property test (tests/test_vector_serve.py)."""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data`` as Spark returns it: a SIGNED 64-bit long."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    # Spark's long is signed
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(key: str, n_buckets: int, seed: int = 42) -> int:
    """``pmod(xxhash64(key), n_buckets)`` — the bucket the Spark-written
    layouts route ``key`` to (plans/ingest.write_chunks, plans/fts)."""
    h = xxhash64(key.encode("utf-8"), seed)
    return h % n_buckets if h >= 0 else (h % n_buckets + n_buckets) % n_buckets


def spark_string_of(value) -> str:
    """``CAST(value AS STRING)`` exactly as Spark evaluates it, for the
    value types the bucketed layouts actually key on — lets a point read
    route to its bucket driver-locally (bucket_of) instead of paying a
    whole Spark job for one hash. Raises TypeError for types whose JVM
    string rendering this mirror does not reproduce bit-exactly (floats:
    Java Double.toString is not Python repr; timestamps: zone/format),
    so callers can fall back to the Spark-side expression."""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "true" if value else "false"
    if isinstance(value, str):
        return value
    if isinstance(value, int):
        return str(value)
    raise TypeError(
        f"no exact Spark string-cast mirror for {type(value).__name__}"
    )
