"""Unit tests for flow primitives: invertibility, logdet, layouts.

Covers SURVEY.md §4 items 1-2: reverse(forward(x)) == x per layer, and
analytic logdet vs autodiff Jacobian on tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.models.flowavenet import (
    actnorm_ddi, actnorm_forward, actnorm_reverse, coupling_forward,
    coupling_reverse)
from flowavenet_tpu.models.modules import init_wavenet
from flowavenet_tpu.ops.squeeze import (change_order, squeeze,
                                        squeeze_level_cond_perm,
                                        squeeze_to_level, unsqueeze)


def test_squeeze_layout():
    # channel 2c+p must come from input (t=2*t2+p, c)  (model.py:224-228)
    B, T, C = 1, 6, 3
    x = jnp.arange(B * T * C, dtype=jnp.float32).reshape(B, T, C)
    y = squeeze(x)
    assert y.shape == (B, T // 2, 2 * C)
    for t2 in range(T // 2):
        for c in range(C):
            for p in range(2):
                assert y[0, t2, 2 * c + p] == x[0, 2 * t2 + p, c]


def test_squeeze_to_level_matches_chain(rng):
    """One-gather level extraction == k chained squeezes (the reverse
    pass's conditioning path relies on this closed form)."""
    x = np.asarray(rng.randn(2, 64, 3), np.float32)
    y = x
    for k in range(1, 5):
        y = np.asarray(squeeze(y))
        np.testing.assert_array_equal(np.asarray(squeeze_to_level(x, k)), y)
    np.testing.assert_array_equal(np.asarray(squeeze_to_level(x, 0)), x)


def test_squeeze_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 16, 4), jnp.float32)
    np.testing.assert_array_equal(unsqueeze(squeeze(x)), x)
    np.testing.assert_array_equal(squeeze(unsqueeze(x)), x)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_squeeze_level_cond_perm_identity(rng, k):
    """squeeze_to_level(x,k) @ W == reshape(x) @ W[perm] — the identity
    the synthesis cond route uses to replace the per-block extraction
    copy with a weight-row permutation."""
    B, C = 2, 5
    T = 32 << k
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    w = jnp.asarray(rng.randn((1 << k) * C, 7), jnp.float32)
    want = squeeze_to_level(x, k) @ w
    perm = squeeze_level_cond_perm(k, C)
    got = x.reshape(B, T >> k, C << k) @ w[perm]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_change_order_involution(rng):
    x = jnp.asarray(rng.randn(2, 8, 6), jnp.float32)
    np.testing.assert_array_equal(change_order(change_order(x)), x)
    np.testing.assert_array_equal(change_order(x)[..., :3], x[..., 3:])


def test_actnorm_roundtrip(rng):
    p = {"b": jnp.asarray(rng.randn(1, 1, 4), jnp.float32),
         "logs": jnp.asarray(0.3 * rng.randn(1, 1, 4), jnp.float32)}
    x = jnp.asarray(rng.randn(2, 8, 4), jnp.float32)
    y, _ = actnorm_forward(p, x)
    np.testing.assert_allclose(actnorm_reverse(p, y), x, atol=1e-5)


def test_actnorm_logdet_vs_jacobian(rng):
    # logdet is reported in "nats per dimension": sum(log|ds/dx|)/(B*T*C).
    C, B, T = 3, 2, 4
    p = {"b": jnp.asarray(rng.randn(1, 1, C), jnp.float32),
         "logs": jnp.asarray(0.2 * rng.randn(1, 1, C), jnp.float32)}
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)

    flat = lambda v: actnorm_forward(p, v.reshape(B, T, C))[0].ravel()
    J = jax.jacrev(flat)(x.ravel())
    _, logdet = actnorm_forward(p, x)
    expected = np.linalg.slogdet(np.array(J))[1] / (B * T * C)
    np.testing.assert_allclose(logdet, expected, rtol=1e-5)


def test_actnorm_ddi_normalizes(rng):
    x = jnp.asarray(2.5 * rng.randn(4, 32, 6) + 1.7, jnp.float32)
    p = actnorm_ddi(x)
    y, _ = actnorm_forward(p, x)
    np.testing.assert_allclose(jnp.mean(y, axis=(0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.std(y, axis=(0, 1)), 1.0, atol=1e-3)


@pytest.mark.parametrize("affine", [True, False])
def test_coupling_roundtrip(key, rng, affine):
    C, Cc = 8, 12
    p = init_wavenet(key, in_channels=C // 2,
                     out_channels=C if affine else C // 2,
                     num_layers=2, residual_channels=16, cin_channels=Cc // 2)
    x = jnp.asarray(rng.randn(2, 16, C), jnp.float32)
    c = jnp.asarray(rng.randn(2, 16, Cc), jnp.float32)
    y, _ = coupling_forward(p, x, c, None, affine=affine, causal=False)
    x2 = coupling_reverse(p, y, c, None, affine=affine, causal=False)
    np.testing.assert_allclose(x2, x, atol=2e-5)


def test_coupling_identity_at_init(key, rng):
    # Zero-init last conv makes the fresh coupling an exact identity
    # (modules.py:39-59) — the property the DDI pass relies on.
    C, Cc = 4, 6
    p = init_wavenet(key, C // 2, C, num_layers=2, residual_channels=8,
                     cin_channels=Cc // 2)
    x = jnp.asarray(rng.randn(2, 8, C), jnp.float32)
    c = jnp.asarray(rng.randn(2, 8, Cc), jnp.float32)
    y, logdet = coupling_forward(p, x, c, None, affine=True, causal=False)
    np.testing.assert_array_equal(y, x)
    assert logdet == 0.0


def test_coupling_logdet_vs_jacobian(key, rng):
    B, T, C, Cc = 1, 8, 4, 6
    p = init_wavenet(key, C // 2, C, num_layers=1, residual_channels=8,
                     cin_channels=Cc // 2)
    # randomize the zero conv so log_s is non-trivial
    p["zero"]["w"] = jnp.asarray(0.1 * rng.randn(1, 8, C), jnp.float32)
    p["zero"]["scale"] = jnp.asarray(0.05 * rng.randn(C), jnp.float32)
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, Cc), jnp.float32)

    flat = lambda v: coupling_forward(p, v.reshape(B, T, C), c, None,
                                      affine=True, causal=False)[0].ravel()
    J = jax.jacrev(flat)(x.ravel())
    _, logdet = coupling_forward(p, x, c, None, affine=True, causal=False)
    expected = np.linalg.slogdet(np.array(J))[1] / (B * T * C)
    np.testing.assert_allclose(logdet, expected, rtol=1e-4, atol=1e-6)


def test_causal_conv_is_causal(key, rng):
    from flowavenet_tpu.ops.conv import init_wn_conv1d, wn_conv1d
    p = init_wn_conv1d(key, 3, 5, kernel_size=3)
    x = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
    y1 = wn_conv1d(x, p, dilation=2, causal=True)
    x2 = x.at[0, 10].set(99.0)  # perturb t=10
    y2 = wn_conv1d(x2, p, dilation=2, causal=True)
    diff = np.abs(np.array(y1 - y2)).sum(axis=(0, 2))
    assert diff[:10].sum() == 0          # no effect before t=10
    assert diff[10] > 0                  # effect at/after t=10


def test_noncausal_conv_shape_and_center(key, rng):
    from flowavenet_tpu.ops.conv import init_wn_conv1d, wn_conv1d
    p = init_wn_conv1d(key, 3, 5, kernel_size=3)
    x = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
    y = wn_conv1d(x, p, dilation=3, causal=False)
    assert y.shape == (1, 16, 5)


def test_conv_custom_vjp_matches_autodiff(key, rng):
    """The hand-written conv backward (needed for f32-accumulate + bf16)
    must match autodiff through the im2col formulation."""
    from flowavenet_tpu.ops import conv as convmod
    from flowavenet_tpu.ops.conv import dilated_conv1d, init_wn_conv1d, wn_kernel

    p = init_wn_conv1d(key, 4, 6, kernel_size=3)
    kern = wn_kernel(p)
    x = jnp.asarray(rng.randn(2, 24, 4), jnp.float32)

    for causal, dil in [(False, 1), (False, 3), (True, 1), (True, 3)]:
        def loss_conv(args, impl):
            x_, k_ = args
            convmod.set_conv_impl(impl)
            try:
                y = dilated_conv1d(x_, k_, None, dilation=dil, causal=causal)
            finally:
                convmod.set_conv_impl("conv")
            return jnp.sum(jnp.sin(y))

        va, ga = jax.value_and_grad(lambda a: loss_conv(a, "conv"))((x, kern))
        vb, gb = jax.value_and_grad(lambda a: loss_conv(a, "matmul"))((x, kern))
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"causal={causal} d={dil}")
