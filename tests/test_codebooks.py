"""Codebook tables: structure and exact values."""

import numpy as np

from quantizations_tpu.quant.codebooks import (
    FP4_CODE,
    NF4_CODE,
    code_midpoints,
    create_dynamic_map,
)


def test_fp4_code_values():
    # reference core.py:218 normalized by 12 (core.py:225).
    raw = np.array(
        [0, 0.0625, 8, 12, 4, 6, 2, 3, -0.0, -0.0625, -8, -12, -4, -6, -2, -3],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(FP4_CODE, (raw / np.float32(12)).astype(np.float32))
    assert FP4_CODE.dtype == np.float32
    assert np.abs(FP4_CODE).max() == 1.0


def test_nf4_code_values():
    # reference kernels.cu:851 (q_data).
    assert NF4_CODE.shape == (16,)
    assert NF4_CODE[0] == -1.0 and NF4_CODE[15] == 1.0 and NF4_CODE[7] == 0.0
    assert np.all(np.diff(NF4_CODE) > 0)  # sorted ascending
    # Midpoints match the bitsandbytes dQuantizeNF4 ladder constants.
    mids = code_midpoints(NF4_CODE)
    np.testing.assert_allclose(mids[7], 0.03979014977812767, rtol=1e-7)
    np.testing.assert_allclose(mids[14], 0.8614784181118011, rtol=1e-7)
    np.testing.assert_allclose(mids[0], -0.8480964004993439, rtol=1e-7)


def test_dynamic_map_structure():
    # reference core.py:251-314: 256 sorted values in [-1, 1], symmetric,
    # containing 0 and the endpoints.
    m = create_dynamic_map()
    assert m.shape == (256,)
    assert m.dtype == np.float32
    assert np.all(np.diff(m) >= 0)
    # bnb's signed dynamic map appends +1.0 but not -1.0 (reference
    # core.py:300-302): the most negative entry is -0.9929687.
    assert m[-1] == 1.0
    np.testing.assert_allclose(m[0], -0.99296874, rtol=1e-6)
    assert (m == 0.0).any()
    # values symmetric except the unpaired +1.0
    pos = np.sort(m[m > 0])
    neg = np.sort(-m[m < 0])
    np.testing.assert_allclose(pos[:-1], neg, rtol=1e-7)
    assert pos[-1] == 1.0
    # dynamic-exponent structure: smallest positive value = 1e-6 * 0.55
    np.testing.assert_allclose(pos[0], 5.5e-7, rtol=1e-5)


def test_dynamic_map_is_cached():
    assert create_dynamic_map() is create_dynamic_map()
