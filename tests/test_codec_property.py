"""Property-based codec pins (pure numpy — no Spark session needed):
the SQ encode/decode roundtrip error bound holds for arbitrary inputs,
matching the reference's quantization error contract
(quantization.py:108-139: one step per dimension max)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from fastpyvectordb_spark.operators.quantization import sq_encode_queries

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@settings(max_examples=200, deadline=None)
@given(arrays(np.float64, (5, 8), elements=finite))
def test_sq_roundtrip_error_bounded(mat):
    mins = mat.min(axis=0)
    maxs = mat.max(axis=0)
    scales = np.where(maxs - mins == 0, 1.0, maxs - mins)
    codes = sq_encode_queries(mat, mins, scales)
    assert codes.dtype == np.uint8
    decoded = codes.astype(np.float64) / 255.0 * scales + mins
    # max error = one quantization step per dim (+ fp slack)
    step = scales / 255.0
    assert (np.abs(decoded - mat) <= step + 1e-6).all()


@settings(max_examples=200, deadline=None)
@given(arrays(np.float64, (4, 6), elements=finite))
def test_sq_codes_in_range_and_deterministic(mat):
    mins = mat.min(axis=0)
    maxs = mat.max(axis=0)
    scales = np.where(maxs - mins == 0, 1.0, maxs - mins)
    a = sq_encode_queries(mat, mins, scales)
    b = sq_encode_queries(mat, mins, scales)
    assert (a == b).all()
    # rows at the per-dim min/max encode to the extremes
    assert (a >= 0).all() and (a <= 255).all()
    col_max_rows = mat.argmax(axis=0)
    for d, r in enumerate(col_max_rows):
        if maxs[d] > mins[d]:
            assert a[r, d] == 255
