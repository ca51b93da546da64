"""Vectorized MurmurHash3 x64-128 over Arrow string/binary columns.

The reference (kwertop/gostatix) uses two hash functions:

* murmur3 x64-128, zero seed, h1 only — for the cuckoo filter
  (``/root/reference/murmur.go:134-141``, ``base_cuckoo_filter.go:90-94``);
* metrohash128, seed 1373 — for bloom / HLL / CMS
  (``bloom_filter.go:322-325``, ``base_hyperloglog.go:85``,
  ``base_count_min_sketch.go:54``).

The engine's NATIVE sketch hash is **murmur3 x64-128 with a
per-structure seed** (pinned by public test vectors).  For state-level
compatibility with Go gostatix deployments, bloom/HLL/CMS/top-k specs
also accept ``hash="metro"``, which routes through the vectorized
MetroHash128 implementation in ``gostatix_ray.metro`` (seed 1373, the
reference's call signature) — see ``sketch_hash128`` below and
tests/test_metro.py.  All estimate-quality oracles from the reference's
tests (HLL 100±2, CMS exact small counts, bloom FPP grid, top-k
ranking) are statements about *hash-statistical* behavior and are
validated under BOTH hashes.  The cuckoo filter is bit-compatible with
the reference in all modes (same murmur3 h1, seed 0).

Two implementations, pinned against each other and against published
murmur3 test vectors in ``tests/test_hashing.py``:

* ``murmur3_x64_128(data, seed)`` — scalar, pure Python on one ``bytes``.
* ``hash128(values, seed)`` — vectorized NumPy over an Arrow
  string/binary array (or list of bytes): pads values into an
  ``(n, ceil/16+1)*16`` uint8 matrix, views it as little-endian uint64
  words, and runs the block/tail/finalize phases with boolean masks.
  Python-level loop count is ``max_len/16`` (per batch, not per row).

Everything downstream (bloom / HLL / CMS / top-k / cuckoo / minhash /
simhash) consumes ``(h1, h2)`` uint64 arrays from here.
"""

from __future__ import annotations

import numpy as np

try:  # pyarrow is always present in this environment, but keep kernels importable without it
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_N1 = np.uint64(0x52DCE729)
_N2 = np.uint64(0x38495AB5)
_MASK64 = 0xFFFFFFFFFFFFFFFF

# Seeds per structure (compat note: cuckoo seed 0 matches the reference).
SEED_BLOOM = 1373
SEED_HLL = 1373
SEED_CMS = 1373
SEED_CUCKOO = 0
SEED_MINHASH = 77
SEED_SIMHASH = 99
SEED_FEATURE = 7


# ---------------------------------------------------------------------------
# scalar reference implementation
# ---------------------------------------------------------------------------

def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar murmur3 x64-128; mirrors /root/reference/murmur.go:19-141."""
    h1 = h2 = seed & _MASK64
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    length = len(data)
    nblocks = length // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16 :]
    if tail:
        pad = tail + b"\x00" * (16 - len(tail))
        k1 = int.from_bytes(pad[0:8], "little")
        k2 = int.from_bytes(pad[8:16], "little")
        if k2:
            k2 = (k2 * c2) & _MASK64
            k2 = _rotl64(k2, 33)
            k2 = (k2 * c1) & _MASK64
            h2 ^= k2
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


# ---------------------------------------------------------------------------
# vectorized implementation
# ---------------------------------------------------------------------------

def to_padded_bytes(values) -> tuple[np.ndarray, np.ndarray]:
    """Convert a column of strings/bytes into (padded uint8 matrix, lengths).

    The matrix width is a multiple of 16 with at least one full trailing
    zero block, so block and tail words can be read with a plain view.
    Accepts a pyarrow (Chunked)Array of string/large_string/binary types,
    a numpy object array, or a Python list of str/bytes.  Nulls hash as
    empty strings.
    """
    offsets = None
    if pa is not None and isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa is not None and isinstance(values, pa.Array):
        typ = values.type
        if pa.types.is_string(typ) or pa.types.is_binary(typ):
            odtype = np.int32
        elif pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
            odtype = np.int64
        else:  # dictionary, int, etc: cast through string
            values = values.cast(pa.string())
            odtype = np.int32
        if values.null_count:
            fill = "" if (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)) else b""
            values = values.fill_null(fill)
        bufs = values.buffers()
        off = np.frombuffer(bufs[1], dtype=odtype)[values.offset : values.offset + len(values) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        lengths = np.diff(off).astype(np.int64)
        flat = data[off[0] : off[-1]]
        offsets = off - off[0]
    else:
        vals = [v.encode() if isinstance(v, str) else (bytes(v) if v is not None else b"") for v in values]
        lengths = np.array([len(v) for v in vals], dtype=np.int64)
        flat = np.frombuffer(b"".join(vals), dtype=np.uint8)
        offsets = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])

    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    width = (maxlen // 16 + 1) * 16
    mat = np.zeros((n, width), dtype=np.uint8)
    if flat.size:
        starts = offsets[:-1].astype(np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        col = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lengths)
        mat[row, col] = flat
    return mat, lengths


def _vfmix(k: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        k = k ^ (k >> np.uint64(33))
        k = k * _F1
        k = k ^ (k >> np.uint64(33))
        k = k * _F2
        k = k ^ (k >> np.uint64(33))
    return k


def hash128(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3 x64-128 of a column; returns (h1, h2) uint64 arrays."""
    mat, lengths = to_padded_bytes(values)
    return _hash128_core(mat, lengths, seed)


def hash128_keyed(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """hash128 for REPEATED-KEY columns (join keys, partition keys,
    bucket/salt keys): dictionary-encode, hash only the distinct values,
    gather.  Bit-identical to ``hash128(values, seed)``.

    hash128's padded-bytes matrix is the memory-bandwidth hot spot under
    concurrent workers (CLAUDE.md; _shingle_hashes measured 115 cpu-s ->
    ~3 s per task on zipf token streams).  Key columns repeat even
    harder — a 4M-row conv_id column with 240k distinct values measured
    23.7 s raw vs 0.20 s encoded on this host.  Worst case (all
    distinct) the encode pass is a small constant on top of the same
    hashing work — a wash, never a loss at column sizes where it
    matters.  Only use where a plain Arrow array/chunked array comes in;
    token list-flattened streams already do this inline.
    """
    import pyarrow as _pa

    if isinstance(values, _pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, _pa.Array) or len(values) < 4096:
        return hash128(values, seed)
    if _pa.types.is_dictionary(values.type):
        enc = values
    else:
        enc = values.dictionary_encode()
    d1, d2 = hash128(enc.dictionary, seed)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    if enc.indices.null_count:
        # nulls hash like hash128's padded empty rows: fill with the
        # hash of b"" so the gather stays bit-identical
        e1, e2 = hash128(_pa.array([""]), seed)
        d1 = np.concatenate([d1, e1])
        d2 = np.concatenate([d2, e2])
        idx = np.where(np.isnan(idx), len(d1) - 1, idx).astype(np.int64)
    else:
        idx = idx.astype(np.int64, copy=False)
    return d1[idx], d2[idx]


def _rotl_ip(x: np.ndarray, r: int, tmp: np.ndarray) -> None:
    """x = rotl64(x, r) in place, using tmp as scratch."""
    np.right_shift(x, np.uint64(64 - r), out=tmp)
    np.left_shift(x, np.uint64(r), out=x)
    np.bitwise_or(x, tmp, out=x)


def _vfmix_ip(k: np.ndarray, tmp: np.ndarray) -> None:
    np.right_shift(k, np.uint64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _F1, out=k)
    np.right_shift(k, np.uint64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _F2, out=k)
    np.right_shift(k, np.uint64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)


def _hash128_core(mat: np.ndarray, lengths: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """In-place formulation: ~4 scratch arrays total instead of ~30
    temporaries per block — keeps the kernel compute-bound instead of
    DRAM-bound when many workers hash concurrently."""
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    words = mat.view("<u8")
    ulen = lengths.astype(np.uint64)
    h1 = np.full(n, np.uint64(seed & _MASK64), dtype=np.uint64)
    h2 = h1.copy()
    nblocks = (lengths // 16).astype(np.int64)
    max_blocks = int(nblocks.max())
    k = np.empty(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    nh = np.empty(n, dtype=np.uint64)

    with np.errstate(over="ignore"):
        for b in range(max_blocks):
            m = nblocks > b
            # k1 round
            np.copyto(k, words[:, 2 * b])
            np.multiply(k, _C1, out=k)
            _rotl_ip(k, 31, tmp)
            np.multiply(k, _C2, out=k)
            np.bitwise_xor(h1, k, out=nh)
            _rotl_ip(nh, 27, tmp)
            np.add(nh, h2, out=nh)
            np.multiply(nh, _M5, out=nh)
            np.add(nh, _N1, out=nh)
            np.copyto(h1, nh, where=m)
            # k2 round
            np.copyto(k, words[:, 2 * b + 1])
            np.multiply(k, _C2, out=k)
            _rotl_ip(k, 33, tmp)
            np.multiply(k, _C1, out=k)
            np.bitwise_xor(h2, k, out=nh)
            _rotl_ip(nh, 31, tmp)
            np.add(nh, h1, out=nh, where=m)  # h1 already updated where m
            np.multiply(nh, _M5, out=nh)
            np.add(nh, _N2, out=nh)
            np.copyto(h2, nh, where=m)

        has_tail = (ulen & np.uint64(15)) != 0
        if has_tail.any():
            rows = np.arange(n)
            # k2 tail first (murmur tail order)
            np.copyto(k, words[rows, 2 * nblocks + 1])
            m2 = has_tail & (k != 0)
            np.multiply(k, _C2, out=k)
            _rotl_ip(k, 33, tmp)
            np.multiply(k, _C1, out=k)
            np.bitwise_xor(h2, k, out=nh)
            np.copyto(h2, nh, where=m2)
            # k1 tail
            np.copyto(k, words[rows, 2 * nblocks])
            np.multiply(k, _C1, out=k)
            _rotl_ip(k, 31, tmp)
            np.multiply(k, _C2, out=k)
            np.bitwise_xor(h1, k, out=nh)
            np.copyto(h1, nh, where=has_tail)

        np.bitwise_xor(h1, ulen, out=h1)
        np.bitwise_xor(h2, ulen, out=h2)
        np.add(h1, h2, out=h1)
        np.add(h2, h1, out=h2)
        _vfmix_ip(h1, tmp)
        _vfmix_ip(h2, tmp)
        np.add(h1, h2, out=h1)
        np.add(h2, h1, out=h2)
    return h1, h2


def hash64(values, seed: int = 0) -> np.ndarray:
    """h1 only — what the reference's cuckoo `getHash` returns."""
    return hash128(values, seed)[0]


# ---------------------------------------------------------------------------
# vectorized hex presentation (no per-row Python format() loops)
# ---------------------------------------------------------------------------

def hex64(arr: np.ndarray) -> np.ndarray:
    """uint64 array -> 16-char lowercase hex strings, one C call
    (big-endian byte view + binascii.hexlify + fixed-width numpy view)."""
    import binascii

    if arr.size == 0:
        return np.empty(0, dtype="U16")
    hx = binascii.hexlify(np.ascontiguousarray(arr, dtype=">u8").tobytes())
    return np.frombuffer(hx, dtype="S16").astype("U16")


def hex128(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(h1, h2) uint64 arrays -> 32-char lowercase hex strings (h1 || h2)."""
    import binascii

    if h1.size == 0:
        return np.empty(0, dtype="U32")
    pair = np.empty((h1.size, 2), dtype=">u8")
    pair[:, 0] = h1
    pair[:, 1] = h2
    hx = binascii.hexlify(pair.tobytes())
    return np.frombuffer(hx, dtype="S32").astype("U32")


def sketch_hash128(values, seed: int, hash_mode: str = "murmur"):
    """Dispatch the sketch hash by spec-declared mode.

    ``murmur`` (default): vectorized murmur3 x64-128 — the engine's
    native hash.  ``metro``: MetroHash128 per the published algorithm —
    the reference's hash (``metro.Hash128(data, 1373)``,
    bloom_filter.go:322-325), for state-level compatibility with Go
    gostatix deployments.  The mode lives ON THE SPEC so it serializes
    with states and ships inside SketchRequests (a process-global switch
    would not survive distribution).
    """
    if hash_mode == "metro":
        from .metro import metro_hash128

        return metro_hash128(values, seed)
    return hash128(values, seed)
