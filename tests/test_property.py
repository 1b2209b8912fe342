"""Property-based tests (hypothesis): invertibility and logdet hold across
randomized shapes, dilations, and parameter draws — not just the fixtures
the example-based tests pin.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from flowavenet_tpu.models.flowavenet import (actnorm_forward,
                                              actnorm_reverse,
                                              coupling_forward,
                                              coupling_reverse)
from flowavenet_tpu.models.modules import init_wavenet
from flowavenet_tpu.ops.squeeze import change_order, squeeze, unsqueeze

_SETTINGS = dict(max_examples=20, deadline=None)


@given(b=st.integers(1, 3), t=st.integers(1, 16), c=st.integers(1, 8),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_squeeze_unsqueeze_roundtrip(b, t, c, seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, 2 * t, c), jnp.float32)
    np.testing.assert_array_equal(unsqueeze(squeeze(x)), x)


@given(b=st.integers(1, 3), t=st.integers(1, 16), c=st.integers(1, 8),
       seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_actnorm_roundtrip_property(b, t, c, seed):
    rng = np.random.RandomState(seed)
    p = {"b": jnp.asarray(rng.randn(1, 1, c), jnp.float32),
         "logs": jnp.asarray(0.3 * rng.randn(1, 1, c), jnp.float32)}
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    y, _ = actnorm_forward(p, x)
    np.testing.assert_allclose(np.asarray(actnorm_reverse(p, y)),
                               np.asarray(x), atol=1e-4)


@given(chalf=st.sampled_from([2, 4, 8]), layers=st.integers(1, 3),
       dil_base=st.sampled_from([2, 3]), causal=st.booleans(),
       affine=st.booleans(), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_coupling_roundtrip_property(chalf, layers, dil_base, causal,
                                     affine, seed):
    rng = np.random.RandomState(seed)
    C, Cc = 2 * chalf, 4
    p = init_wavenet(jax.random.PRNGKey(seed % 1000), chalf,
                     C if affine else chalf, num_layers=layers,
                     residual_channels=8, cin_channels=Cc // 2,
                     kernel_size=3)
    p = jax.tree.map(
        lambda l: l + jnp.asarray(0.2 * rng.randn(*l.shape), l.dtype), p)
    x = jnp.asarray(rng.randn(2, 32, C), jnp.float32)
    c = jnp.asarray(rng.randn(2, 32, Cc), jnp.float32)
    y, _ = coupling_forward(p, x, c, None, affine=affine, causal=causal)
    x2 = coupling_reverse(p, y, c, None, affine=affine, causal=causal)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-4)


@given(seed=st.integers(0, 2**31 - 1), c=st.sampled_from([2, 4, 6, 8]))
@settings(**_SETTINGS)
def test_change_order_property(seed, c):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, 4, c), jnp.float32)
    np.testing.assert_array_equal(change_order(change_order(x)), x)
