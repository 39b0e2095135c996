"""Hash-family invariants (EfficientH3Functions / EH3 / XORShiftRandom)."""

import numpy as np

from condor_ray.hashing import (
    EH3HashFunction,
    H3HashFunctions,
    XORShiftRandom,
    java_mod,
    java_string_hash,
    java_string_hash_array,
    murmur_hash_int,
)


def test_xorshift_deterministic_and_int32():
    r1, r2 = XORShiftRandom(7), XORShiftRandom(7)
    seq1 = [r1.next_int() for _ in range(100)]
    seq2 = [r2.next_int() for _ in range(100)]
    assert seq1 == seq2
    assert all(-(2**31) <= x < 2**31 for x in seq1)
    # different seed, different stream
    assert [XORShiftRandom(8).next_int() for _ in range(10)] != seq1[:10]


def test_xorshift_next_long_double_bounds():
    r = XORShiftRandom(42)
    for _ in range(100):
        assert -(2**63) <= r.next_long() < 2**63
    for _ in range(100):
        d = r.next_double()
        assert 0.0 <= d < 1.0
    for bound in (2, 7, 16, 1000, 1610612741):
        for _ in range(50):
            v = r.next_int_bound(bound)
            assert 0 <= v < bound


def test_murmur_nonnegative():
    for x in (0, 1, -1, 2**31 - 1, -(2**31), 123456789):
        assert murmur_hash_int(x) >= 0


def test_h3_properties():
    h3 = H3HashFunctions(5, 7)
    vals = np.arange(-1000, 1000, dtype=np.int32)
    out = h3.hash_batch(vals)
    assert out.shape == (2000, 5)
    # abs-valued except possible int32 MIN edge
    assert (out >= 0).sum() >= out.size - 1
    # deterministic
    assert (out == H3HashFunctions(5, 7).hash_batch(vals)).all()
    # input 0 XORs nothing -> hash 0 for all functions (reference behavior)
    assert (h3.hash_batch(np.asarray([0], dtype=np.int32)) == 0).all()
    # equality semantics = (numFunctions, seed)
    assert h3 == H3HashFunctions(5, 7)
    assert h3 != H3HashFunctions(5, 8)


def test_h3_linear_over_xor():
    # H3 is linear: h(a ^ b) == h(a) ^ h(b) BEFORE the abs; verify via zero input
    h3 = H3HashFunctions(3, 11)
    a = np.asarray([12345], dtype=np.int32)
    b = np.asarray([67890], dtype=np.int32)
    ab = np.asarray([12345 ^ 67890], dtype=np.int32)
    # recompute un-abs'd values by re-deriving from the q matrix
    q = h3._q
    def raw(x):
        acc = np.zeros(3, dtype=np.int32)
        for j in range(32):
            if (int(x) >> j) & 1:
                acc ^= q[:, j]
        return acc
    assert (raw(12345) ^ raw(67890) == raw(12345 ^ 67890)).all()


def test_eh3_deterministic_balanced():
    eh3 = EH3HashFunction(7, 5)
    vals = np.arange(0, 4096, dtype=np.int32)
    out = eh3.rand_batch(vals)
    assert out.shape == (4096, 5)
    assert (out == EH3HashFunction(7, 5).rand_batch(vals)).all()
    # roughly balanced ±1 per function
    frac = out.mean(axis=0)
    assert ((frac > 0.3) & (frac < 0.7)).all()


def test_java_string_hash():
    # values verified against java.lang.String.hashCode semantics
    assert java_string_hash("") == 0
    assert java_string_hash("a") == 97
    assert java_string_hash("ab") == 97 * 31 + 98
    assert java_string_hash("hello") == 99162322
    arr = java_string_hash_array(["hello", "a", "hello"])
    assert arr.tolist() == [99162322, 97, 99162322]


def test_java_mod_nonnegative():
    a = np.asarray([0, 5, 100, 2**31 - 1], dtype=np.int64)
    assert (java_mod(a, 7) == a % 7).all()
