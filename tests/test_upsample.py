"""Upsampler: subpixel phase-matmul implementation must bit-match the XLA
conv_transpose path (which is itself TF-golden-verified in
tests/test_tf_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.models.upsample import (_dense_upsample,
                                            _subpixel_upsample,
                                            apply_upsample, init_upsample)


@pytest.mark.parametrize("s,H,W", [(4, 6, 5), (16, 7, 80), (8, 5, 3),
                                   (12, 4, 9)])
def test_subpixel_matches_conv_transpose(rng, s, H, W):
    x = jnp.asarray(rng.randn(2, H, W), jnp.float32)
    kern = jnp.asarray(rng.randn(2 * s, 3), jnp.float32)

    y_sub = _subpixel_upsample(x, kern, s)

    k4 = kern[:, :, None, None]  # (kh, 3, out=1, in=1)
    y_ref = jax.lax.conv_transpose(
        x[..., None], k4, strides=(s, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        transpose_kernel=True)[..., 0]

    assert y_sub.shape == (2, H * s, W)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scales", [(4, 4), (16, 16), (8, 12)])
def test_apply_upsample_impls_agree(key, rng, scales):
    params = init_upsample(key, scales)
    params = jax.tree.map(
        lambda l: l + jnp.asarray(0.3 * rng.randn(*l.shape), l.dtype),
        params)
    c = jnp.asarray(rng.randn(2, 5, 7), jnp.float32)
    a = apply_upsample(params, c, scales, impl="subpixel")
    b = apply_upsample(params, c, scales, impl="conv_transpose")
    d = apply_upsample(params, c, scales, impl="dense")
    hop = int(np.prod(scales))
    assert a.shape == (2, 5 * hop, 7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("s,H,W", [(4, 6, 5), (16, 7, 80), (12, 4, 9)])
def test_dense_matches_conv_transpose(rng, s, H, W):
    """The dense-matmul form (default on TPU) == XLA conv_transpose."""
    x = jnp.asarray(rng.randn(2, H, W), jnp.float32)
    kern = jnp.asarray(rng.randn(2 * s, 3), jnp.float32)
    y = _dense_upsample(x, kern, s)
    k4 = kern[:, :, None, None]
    y_ref = jax.lax.conv_transpose(
        x[..., None], k4, strides=(s, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        transpose_kernel=True)[..., 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
