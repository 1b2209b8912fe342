"""Parity vs TF golden values (SURVEY.md §4 item 5).

Fixtures are generated once by tools/gen_tf_fixtures.py against TF 2.21,
reproducing the reference's exact conv semantics
(/root/reference/convolutional.py, model.py:301-311).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing (run tools/gen_tf_fixtures.py)")
    return np.load(path)


def test_upsample_matches_tf():
    fx = _load("upsample_golden.npz")
    from flowavenet_tpu.models.upsample import apply_upsample
    scales = tuple(int(s) for s in fx["scales"])
    params = [{"v": jnp.asarray(fx[f"v{i}"]), "g": jnp.asarray(fx[f"g{i}"]),
               "b": jnp.asarray(fx[f"b{i}"])} for i in range(len(scales))]
    out = apply_upsample(params, jnp.asarray(fx["c"]), scales)
    np.testing.assert_allclose(np.array(out), fx["out"], atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_wn_conv_matches_tf(causal):
    fx = _load("wnconv_golden.npz")
    from flowavenet_tpu.ops.conv import wn_conv1d
    p = {"v": jnp.asarray(fx["v"]), "g": jnp.asarray(fx["g"]),
         "b": jnp.asarray(fx["b"])}
    out = wn_conv1d(jnp.asarray(fx["x"]), p, dilation=int(fx["d"]),
                    causal=causal)
    ref = fx["out_causal"] if causal else fx["out_noncausal"]
    np.testing.assert_allclose(np.array(out), ref, atol=2e-5)
