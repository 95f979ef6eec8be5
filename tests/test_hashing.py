import numpy as np

from cffm_tpu.data.hashing import bucketize_log2, fnv1a_bytes_matrix, hash_strings


def _fnv1a_ref(s: bytes) -> int:
    h = 0xCBF29CE484222325
    for c in s:
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv_matches_scalar_reference():
    strs = [b"", b"a", b"hello", b"0a1b2c3d", b"ffffffff", b"x" * 15]
    vals = np.array(strs, dtype="S16")
    mat = vals.view(np.uint8).reshape(len(strs), 16)
    lengths = np.array([len(s) for s in strs])
    got = fnv1a_bytes_matrix(mat, lengths)
    want = np.array([_fnv1a_ref(s) for s in strs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_hash_strings_range_and_determinism():
    vals = np.array([f"{i:08x}".encode() for i in range(1000)], dtype="S16")
    h1 = hash_strings(vals, 997)
    h2 = hash_strings(vals, 997)
    np.testing.assert_array_equal(h1, h2)
    assert h1.min() >= 0 and h1.max() < 997
    # decent spread
    assert len(np.unique(h1)) > 500


def test_bucketize_log2():
    v = np.array([-1, 0, 1, 2, 3, 10, 100, 10**6])
    out = bucketize_log2(v, 64)
    assert out.tolist()[:5] == [0, 1, 2, 3, 4]
    assert (np.diff(out) >= 0).all()
    assert out.max() < 64
