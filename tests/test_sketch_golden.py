"""Golden pin for the MinHash / SimHash sketch kernels.

The round-2 vectorization (uint64 fold-reduction mod 2^61-1, batched
crc32 + reduceat bit-votes) must produce BYTE-IDENTICAL signatures to
the round-1 definition. The reference implementations below are the
original per-document Python-int algorithms, restated verbatim as the
specification."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vtzero_spark.engine import textops


def _ref_minhash(text: str) -> list[int]:
    a, b = textops._minhash_params()
    p = text[:64]
    shingles = {p[i:i + 3] for i in range(max(1, len(p) - 2))}
    hv = [zlib.crc32(s.encode("utf-8")) for s in shingles]
    sig = []
    for j in range(textops._N_HASH):
        sig.append(min((int(a[j]) * h + int(b[j])) % textops._MINHASH_P
                       for h in hv))
    return sig


def _ref_simhash(text: str) -> int:
    tokens = text.split()
    acc = [0] * 32
    for t in tokens:
        h = zlib.crc32(t.encode("utf-8"))
        for k in range(32):
            acc[k] += 1 if (h >> k) & 1 else -1
    return sum((1 << k) for k in range(32) if acc[k] > 0)


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "ab",
    "a" * 200,
    "unicode éè€ text with 中文 tokens",
    "x y z " * 40,
    "single",
    "  leading and   irregular   whitespace  ",
    "\t\n mixed\nwhitespace\ttokens \n",
    "punct!!! ??? ,,, ... ;;;",
]


def _run_batch(fn, docs):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    outs = list(fn(iter([pdf])))
    assert len(outs) == 1
    return outs[0].sort_values("doc_id").reset_index(drop=True)


def test_minhash_golden():
    got = _run_batch(textops._minhash_batch, DOCS)
    for i, text in enumerate(DOCS):
        want = _ref_minhash(text)
        assert list(got["sig"].iloc[i]) == want, f"doc {i}: {text!r}"


def test_simhash_golden():
    got = _run_batch(textops._simhash_batch, DOCS)
    for i, text in enumerate(DOCS):
        assert int(got["simhash"].iloc[i]) == _ref_simhash(text), \
            f"doc {i}: {text!r}"


@given(st.lists(st.text(max_size=120), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_minhash_golden_hypothesis(texts):
    got = _run_batch(textops._minhash_batch, texts)
    for i, text in enumerate(texts):
        assert list(got["sig"].iloc[i]) == _ref_minhash(text)


@given(st.lists(st.text(max_size=120), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_simhash_golden_hypothesis(texts):
    got = _run_batch(textops._simhash_batch, texts)
    for i, text in enumerate(texts):
        assert int(got["simhash"].iloc[i]) == _ref_simhash(text)


@given(st.integers(0, textops._MINHASH_P - 1),
       st.integers(0, textops._MINHASH_P - 1),
       st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_affine_mod_p61_exact(a, b, hs):
    h = np.array(hs, dtype=np.uint64)
    got = textops._affine_mod_p61(a, b, h)
    want = [(a * int(x) + b) % textops._MINHASH_P for x in hs]
    assert got.tolist() == want


def test_minhash_throughput_vs_reference():
    """The vectorized kernel must beat the per-doc Python-int spec by
    >=10x on a realistic batch (round-1 advisory 'done' criterion)."""
    import time

    docs = [f"document number {i} with some shared text payload "
            f"{'lorem ipsum dolor sit amet ' * 3}{i % 7}" for i in range(2000)]
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    t0 = time.perf_counter()
    list(textops._minhash_batch(iter([pdf])))
    fast = time.perf_counter() - t0

    t0 = time.perf_counter()
    for text in docs[:200]:  # reference on a 10% slice
        _ref_minhash(text)
    slow = (time.perf_counter() - t0) * 10

    assert slow / fast >= 10, f"only {slow / fast:.1f}x faster"
