"""Pin the murmur3 x64-128 kernel: published vectors + vectorized == scalar.

Pins against /root/reference/murmur.go:1-141 (the vendored canonical
murmur3 the cuckoo filter uses via getHash, base_cuckoo_filter.go:90-94).
"""

import numpy as np
import pyarrow as pa
import pytest

from gostatix_ray.hashing import hash128, murmur3_x64_128, to_padded_bytes

# Published murmur3 x64-128 outputs (seed 0)
KNOWN = {
    b"": (0, 0),
    b"hello": (0xCBD8A7B341BD9B02, 0x5B1E906A48AE1D19),
    b"hello, world": (0x342FAC623A5EBC8E, 0x4CDCBC079642414D),
    b"The quick brown fox jumps over the lazy dog": (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
    ),
}


def test_known_vectors_scalar():
    for data, expect in KNOWN.items():
        assert murmur3_x64_128(data) == expect


def test_known_vectors_vectorized():
    vals = list(KNOWN.keys())
    h1, h2 = hash128(vals, 0)
    for (e1, e2), a, b in zip(KNOWN.values(), h1, h2):
        assert (int(a), int(b)) == (e1, e2)


@pytest.mark.parametrize("seed", [0, 1373, 77])
def test_vectorized_matches_scalar_all_lengths(seed):
    # lengths 0..40 cross both the 16-byte block boundary and the k2-tail branch
    vals = [bytes((i * 7 + j) % 256 for j in range(i)) for i in range(41)]
    h1, h2 = hash128(vals, seed)
    for v, a, b in zip(vals, h1, h2):
        assert (int(a), int(b)) == murmur3_x64_128(v, seed), (len(v), seed)


def test_arrow_inputs_and_nulls():
    arr = pa.array(["foo", None, "bar", ""], type=pa.string())
    h1, _ = hash128(arr, 0)
    assert int(h1[0]) == murmur3_x64_128(b"foo")[0]
    assert int(h1[1]) == murmur3_x64_128(b"")[0]  # nulls hash as empty
    assert int(h1[3]) == murmur3_x64_128(b"")[0]

    large = pa.array(["x" * 100, "y"], type=pa.large_string())
    h1l, _ = hash128(large, 0)
    assert int(h1l[0]) == murmur3_x64_128(b"x" * 100)[0]

    # sliced arrays must respect offsets
    sliced = pa.array(["aa", "bb", "cc"]).slice(1, 2)
    h1s, _ = hash128(sliced, 0)
    assert int(h1s[0]) == murmur3_x64_128(b"bb")[0]

    chunked = pa.chunked_array([["aa"], ["bb"]])
    h1c, _ = hash128(chunked, 0)
    assert int(h1c[1]) == murmur3_x64_128(b"bb")[0]


def test_padded_layout():
    mat, lengths = to_padded_bytes([b"abc", b""])
    assert mat.shape[1] % 16 == 0
    assert list(lengths) == [3, 0]
    assert bytes(mat[0, :3]) == b"abc"
    assert mat[0, 3:].sum() == 0


def test_hash128_keyed_bit_identical():
    """hash128_keyed (dictionary-encode -> hash distinct -> gather) must be
    bit-identical to hash128 on every input family it's used for: repeated
    string keys, nulls, integers, pre-dictionary-encoded columns, below-
    threshold small arrays, and empty arrays."""
    import numpy as np
    import pyarrow as pa

    from gostatix_ray.hashing import hash128, hash128_keyed

    rng = np.random.default_rng(7)
    cases = [
        pa.array((["conv-%05d" % i for i in rng.integers(0, 300, 20000)])),
        pa.array(["a", "b", None, ""] * 3000),
        pa.array(rng.integers(0, 50, 10000)),
        pa.array(["x"] * 10000).dictionary_encode(),
        pa.array(["tiny", "array"]),  # below the 4096 fast-path floor
        pa.array([], type=pa.string()),
        pa.chunked_array([pa.array(["k1", "k2"] * 3000), pa.array(["k1"] * 2000)]),
    ]
    for arr in cases:
        plain = arr
        if isinstance(plain, pa.ChunkedArray):
            plain = plain.combine_chunks()
        if pa.types.is_dictionary(plain.type):
            plain = plain.cast(pa.string())
        h1, h2 = hash128(plain, 31)
        k1, k2 = hash128_keyed(arr, 31)
        assert (h1 == k1).all() and (h2 == k2).all(), arr.type
