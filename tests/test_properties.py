"""Merge-algebra property tests (SURVEY §5 plan item b): split the input
K ways, build partial synopses, merge them in a RANDOM binary tree order —
the result must equal the sequential single-synopsis build (commutative /
mergeable contract, core:synopsis/CommutativeSynopsis.java:5-8), except
for Bloom where the preserved AND-merge quirk makes the invariant
"intersection of partials, independent of tree shape" instead.

No Ray involved: these are pure kernel-algebra properties — the driver
gate and engine tests cover the distributed plumbing that relies on them.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from condor_ray.synopses import (
    BloomFilter,
    CountMinSketch,
    EquiWidthHistogram,
    FastAGMS,
    HyperLogLogSketch,
)

_KEYS = st.lists(
    st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=300
)
_SPLITS = st.integers(2, 5)
_SEED = st.integers(0, 2**32 - 1)


def _split(values: np.ndarray, k: int, rng: np.random.Generator):
    """Random contiguous-free partition of values into k (possibly empty)
    slices — mirrors arbitrary block boundaries."""
    assign = rng.integers(0, k, len(values))
    return [values[assign == i] for i in range(k)]


def _tree_merge(partials: list, rng: np.random.Generator):
    """Merge the partials in a random binary tree order (mutating merges,
    like the engine's groupby reduce)."""
    parts = list(partials)
    while len(parts) > 1:
        i, j = sorted(rng.choice(len(parts), 2, replace=False))
        b = parts.pop(j)
        a = parts.pop(i)
        parts.append(a.merge(b))
    return parts[0]


def _check_tree_equals_sequential(make, values: np.ndarray, k: int, seed: int,
                                  state):
    rng = np.random.default_rng(seed)
    partials = []
    for chunk in _split(values, k, rng):
        s = make()
        s.update_batch(chunk)
        partials.append(s)
    merged = _tree_merge(partials, rng)
    sequential = make()
    sequential.update_batch(values)
    assert np.array_equal(state(merged), state(sequential))


@settings(max_examples=15, deadline=None)
@given(_KEYS, _SPLITS, _SEED)
def test_count_min_merge_tree_order_free(keys, k, seed):
    values = np.asarray(keys, dtype=np.int32)
    _check_tree_equals_sequential(
        lambda: CountMinSketch(256, 3, 7), values, k, seed, lambda s: s.array
    )


@settings(max_examples=15, deadline=None)
@given(_KEYS, _SPLITS, _SEED)
def test_hll_merge_tree_order_free(keys, k, seed):
    values = np.asarray(keys, dtype=np.int32)
    _check_tree_equals_sequential(
        lambda: HyperLogLogSketch(10, 7), values, k, seed,
        lambda s: s.registers,
    )


@settings(max_examples=15, deadline=None)
@given(_KEYS, _SPLITS, _SEED)
def test_agms_merge_tree_order_free(keys, k, seed):
    values = np.asarray(keys, dtype=np.int32)
    _check_tree_equals_sequential(
        lambda: FastAGMS(64, 5, 7), values, k, seed, lambda s: s.array
    )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.floats(0.0, 127.9, allow_nan=False), min_size=1, max_size=300),
    _SPLITS,
    _SEED,
)
def test_equiwidth_merge_tree_order_free(vals, k, seed):
    values = np.asarray(vals, dtype=np.float64)
    _check_tree_equals_sequential(
        lambda: EquiWidthHistogram(0.0, 128.0, 16), values, k, seed,
        lambda s: s.frequency,
    )


@settings(max_examples=15, deadline=None)
@given(_KEYS, _SPLITS, st.tuples(_SEED, _SEED))
def test_bloom_and_merge_is_intersection_any_tree(keys, k, seeds):
    """The preserved AND-merge quirk (BloomFilter.java:121): a merge tree
    over partials yields the bitwise intersection of ALL partial bit sets,
    whatever the tree shape."""
    values = np.asarray(keys, dtype=np.int32)
    seed_a, seed_b = seeds

    def partials(seed):
        rng = np.random.default_rng(seed)
        out = []
        chunks = _split(values, k, rng)
        for chunk in chunks:
            s = BloomFilter(64, 1024, 7)
            s.update_batch(chunk)
            out.append(s)
        return out, rng

    parts_a, rng_a = partials(seed_a)
    expected = parts_a[0].bits.copy()
    for p in parts_a[1:]:
        expected &= p.bits
    merged_a = _tree_merge(parts_a, rng_a)
    assert np.array_equal(merged_a.bits, expected)

    # a DIFFERENT tree shape over the same split gives the same bits
    rng_b = np.random.default_rng(seed_a)
    parts_b = []
    for chunk in _split(values, k, rng_b):
        s = BloomFilter(64, 1024, 7)
        s.update_batch(chunk)
        parts_b.append(s)
    merged_b = _tree_merge(parts_b, np.random.default_rng(seed_b))
    assert np.array_equal(merged_b.bits, expected)


@settings(max_examples=15, deadline=None)
@given(_KEYS, _KEYS, _SEED)
def test_invertible_merge_then_invert_recovers(keys_a, keys_b, seed):
    """Invertible contract the sliding-window slide-out eviction relies on
    (InvertibleSynopsisFunction.java:63-71): merge(A, B).invert(B) == A."""
    from condor_ray.synopses import CountMinSketch, FastAGMS

    a_vals = np.asarray(keys_a, dtype=np.int32)
    b_vals = np.asarray(keys_b, dtype=np.int32)
    for make in (lambda: CountMinSketch(256, 3, 7), lambda: FastAGMS(64, 5, 7)):
        a = make()
        a.update_batch(a_vals)
        expected = a.array.copy()
        b = make()
        b.update_batch(b_vals)
        a.merge(b)
        b2 = make()
        b2.update_batch(b_vals)
        a.invert(b2)
        assert np.array_equal(a.array, expected)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(0.5, 1000.0, allow_nan=False), min_size=1, max_size=200
    ),
    _SPLITS,
    _SEED,
)
def test_ddsketch_merge_tree_order_free_without_collapse(vals, k, seed):
    """Below the bin cap, DDSketch bin counts add — a random merge tree
    equals the sequential build (DDSketch.java:324-346)."""
    from condor_ray.synopses import DDSketch

    values = np.asarray(vals, dtype=np.float64)

    def state(s):
        return (s.global_count, sorted(s.counts.items()))

    rng = np.random.default_rng(seed)
    partials = []
    for chunk in _split(values, k, rng):
        s = DDSketch(0.01, 4096)
        s.update_batch(chunk)
        partials.append(s)
    merged = _tree_merge(partials, rng)
    sequential = DDSketch(0.01, 4096)
    sequential.update_batch(values)
    assert state(merged) == state(sequential)
