"""Codec round-trip invariants (numpy + hypothesis property tests +
distributed Spark check) and compression effectiveness."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fforma_spark.functions.compress import (
    compressed_blocks,
    dod_decode,
    dod_encode,
    roundtrip_check,
    xor_decode,
    xor_decode_fast,
    xor_encode,
)
from fforma_spark.sources.synth import synth_sequences


@given(
    st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=600
    )
)
@settings(max_examples=200, deadline=None)
def test_dod_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


@given(
    st.lists(
        st.floats(allow_nan=False, width=64), max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_xor_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.float64)
    got = xor_decode(xor_encode(arr))
    assert np.array_equal(got.view(np.uint64), arr.view(np.uint64))
    got2 = xor_decode_fast(xor_encode(arr))
    assert np.array_equal(got2.view(np.uint64), arr.view(np.uint64))


def test_xor_roundtrip_nan_bits():
    arr = np.array([1.5, np.nan, np.inf, -0.0, 3.7e300], dtype=np.float64)
    got = xor_decode_fast(xor_encode(arr))
    assert np.array_equal(got.view(np.uint64), arr.view(np.uint64))


def test_dod_edges():
    for arr in ([], [5], [5, -7], [5, 5, 5, 5], list(range(1000))):
        a = np.array(arr, dtype=np.int64)
        assert np.array_equal(dod_decode(dod_encode(a)), a)


def test_dod_compresses_smooth_series():
    """Linear-trend series → constant delta → d2 all zero → ~n/256
    width bytes; must beat raw massively."""
    arr = (100 + 3 * np.arange(100_000)).astype(np.int64)
    enc = dod_encode(arr)
    assert len(enc) < 100_000 * 4 / 50


def test_xor_compresses_repeated():
    arr = np.full(10_000, 42.5)
    enc = xor_encode(arr)
    assert len(enc) < 10_000 * 8 / 5


def test_spark_roundtrip_invariant(spark):
    seq = synth_sequences(spark, n_docs=40, seed=21)
    res = roundtrip_check(seq)
    assert res.filter("NOT ok").count() == 0
    assert res.count() == 40


def test_spark_compression_ratio(spark):
    seq = synth_sequences(spark, n_docs=40, seed=21)
    from pyspark.sql import functions as F

    row = compressed_blocks(seq).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("comp_bytes").alias("comp")
    ).collect()[0]
    assert row["comp"] < row["raw"]  # synthetic M4-ish data must shrink
