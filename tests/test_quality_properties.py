"""Property tests for the quality-filter kernels (SURVEY §5 plan item b
applied to the training-data family): random small corpora vs independent
pure-Python brute forces.

No Ray involved — the kernels take a polars Series and return numpy
arrays; the driver gate and SQL twins cover the distributed plumbing.
The text alphabet is ASCII plus two safe non-ASCII letters: both the
polars (Rust-regex) side and the Python ``re`` brute force are
Unicode-aware, but pinning the alphabet avoids Unicode-version skew on
exotic whitespace.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import polars as pl
import pytest
from hypothesis import given, settings, strategies as st

from condor_ray.pipelines.textstats import (
    _C4_BOILER_RE,
    _C4_TERMINAL_RE,
    _C4_WORD_RE,
    _PII_PATTERNS,
    _c4_kernel,
    _pii_kernel,
    _repetition_kernel,
)

_ALPHABET = "ab .!?\n\t-@0123456789éZ"
_TEXTS = st.lists(
    st.one_of(st.none(), st.text(_ALPHABET, max_size=80)),
    min_size=1,
    max_size=12,
)


def _series(texts) -> pl.Series:
    return pl.Series([t if t is None else str(t) for t in texts], dtype=pl.String).fill_null("")


@settings(max_examples=60, deadline=None)
@given(_TEXTS)
def test_repetition_kernel_matches_brute_force(texts):
    r = _repetition_kernel(pl, _series(texts))
    for i, t in enumerate(texts):
        t = t or ""
        lines = t.split("\n")
        cnt = Counter(lines)
        dup = sum(c for c in cnt.values() if c > 1)
        assert r["dup_line_frac"][i] == dup / len(lines)
        tc = sum(c * len(line) for line, c in cnt.items())
        dc = sum(c * len(line) for line, c in cnt.items() if c > 1)
        assert r["dup_line_char_frac"][i] == (dc / tc if tc > 0 else 0.0)
        words = re.findall(r"[^\t\n\f\r ]+", t)
        if len(words) < 2:
            want_top = 0.0
        else:
            bigrams = Counter(zip(words, words[1:]))
            want_top = max(bigrams.values()) / (len(words) - 1)
        assert r["top_bigram_frac"][i] == want_top


@settings(max_examples=60, deadline=None)
@given(_TEXTS)
def test_pii_kernel_matches_sequential_re(texts):
    r = _pii_kernel(pl, _series(texts))
    red = r["text"].to_pylist()
    for i, t in enumerate(texts):
        s = t or ""
        for name, pat, token in _PII_PATTERNS:
            assert r[f"n_{name}"][i] == len(re.findall(pat, s))
            s = re.sub(pat, token, s)
        assert red[i] == s


@settings(max_examples=60, deadline=None)
@given(_TEXTS, st.integers(1, 4))
def test_c4_kernel_matches_per_line_re(texts, min_words):
    r = _c4_kernel(pl, _series(texts), min_words)
    kept_texts = r["text"].to_pylist()
    for i, t in enumerate(texts):
        t = t or ""
        lines = t.split("\n")
        kept = [
            line
            for line in lines
            if len(re.findall(_C4_WORD_RE, line)) >= min_words
            and re.search(_C4_TERMINAL_RE, line)
            and not re.search(_C4_BOILER_RE, line.lower())
        ]
        assert kept_texts[i] == "\n".join(kept)
        assert r["n_lines_kept"][i] == len(kept)
        assert r["n_lines_dropped"][i] == len(lines) - len(kept)


@settings(max_examples=60, deadline=None)
@given(_TEXTS, _TEXTS, st.integers(1, 4))
def test_contam_counts_match_string_gram_sets(corpus, bench, n):
    from condor_ray.pipelines.dedup import _contam_counts, benchmark_ngram_hashes

    def grams(t: str) -> list[tuple]:
        words = re.findall(r"[^\t\n\f\r ]+", t or "")
        if not words:
            return []
        if len(words) < n:
            return [tuple(words)]
        return [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]

    bench_set = set()
    for t in bench:
        bench_set.update(grams(t or ""))
    counts, totals = _contam_counts(
        _series(corpus), benchmark_ngram_hashes(_series(bench), n), n
    )
    for i, t in enumerate(corpus):
        g = grams(t or "")
        assert totals[i] == max(len(g), 1)
        assert counts[i] == sum(1 for x in g if x in bench_set)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50))
def test_splitmix64_matches_scalar_reference(keys):
    from condor_ray.pipelines.mixing import splitmix64

    def scalar(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) % 2**64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % 2**64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % 2**64
        return z ^ (z >> 31)

    arr = np.array(keys, dtype=np.int64).view(np.uint64)
    got = splitmix64(arr)
    for k, g in zip(keys, got):
        assert int(g) == scalar(k % 2**64)
