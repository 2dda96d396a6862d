"""Pallas bilateral kernel == the lax stencil (interpret mode).

The kernel runs the identical tap loop in VMEM (kernels/bilateral.py);
outputs must be bit-equal for any image size, dtype, and hole pattern.
Semantics reference: ops/bilateral.py (intended math of
ref: src/BilateralFilter.cpp:15-121).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu.kernels.bilateral import bilateral_filter_pallas
from tsdf_tpu.ops.bilateral import bilateral_filter


@pytest.mark.parametrize("shape", [(120, 160), (64, 128), (37, 91)])
@pytest.mark.parametrize("dtype", [np.float32, np.uint16])
def test_matches_lax(shape, dtype):
    rng = np.random.default_rng(7)
    d = rng.uniform(400.0, 4000.0, shape)
    d[rng.uniform(size=shape) < 0.15] = 0.0  # holes stay holes
    d = d.astype(dtype)
    a = np.asarray(bilateral_filter(jnp.asarray(d)))
    b = np.asarray(
        bilateral_filter_pallas(jnp.asarray(d), interpret=True)
    )
    assert a.dtype == b.dtype == dtype
    np.testing.assert_array_equal(a, b)


def test_nondefault_sigmas():
    rng = np.random.default_rng(3)
    d = rng.uniform(400.0, 4000.0, (48, 64)).astype(np.float32)
    a = np.asarray(
        bilateral_filter(jnp.asarray(d), sigma_colour=35.0, sigma_space=2.0)
    )
    b = np.asarray(
        bilateral_filter_pallas(
            jnp.asarray(d), sigma_colour=35.0, sigma_space=2.0,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(a, b)


def test_all_holes_stay_zero():
    d = jnp.zeros((32, 128), jnp.float32)
    out = bilateral_filter_pallas(d, interpret=True)
    assert float(jnp.abs(out).max()) == 0.0
