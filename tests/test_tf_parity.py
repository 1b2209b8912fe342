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


@pytest.mark.parametrize("variant", ["", "causal", "additive", "gin",
                                     "mid"])
def test_full_model_nll_matches_tf(variant):
    """Full-model parity across the reference's variant matrix: the
    composed model (upsample -> squeeze -> ActNorm -> coupling/WaveNet ->
    change_order -> log_p/logdet) computed by TF 2.21 with reference
    semantics (tools/gen_tf_full_model_fixture.py, citing
    /root/reference/model.py:317-347) must be reproduced by our forward
    THROUGH THE REAL CHECKPOINT IMPORTER — the north-star NLL bits/dim
    parity check (BASELINE.md).

    Variants: causal convs (model.py:297 -> modules.py:13,30-31), additive
    coupling (affine=False, model.py:137-139), and global conditioning with
    the reference's g-drop semantics (model.py:313-336 + modules.py:189;
    parity_drop_global_cond=True)."""
    suffix = f"_{variant}" if variant else ""
    fx = _load(f"full_model_golden{suffix}.npz")
    from flowavenet_tpu.checkpoint.tf_import import import_tf_checkpoint
    from flowavenet_tpu.config import ModelConfig
    from flowavenet_tpu.models.flowavenet import forward, reverse

    # geometry rides in the fixture since the "mid" variant (4 blocks,
    # filter 64, 32 mels — the importer-stress width where the four
    # same-prefix 1x1s share shapes) differs from the tiny default
    if "geom" in fx.files:
        nb, nf, nl, fs, nm = (int(v) for v in fx["geom"])
        scales = tuple(int(v) for v in fx["scales"])
    else:
        nb, nf, nl, fs, nm, scales = 2, 2, 2, 16, 8, (4, 4)
    cfg = ModelConfig(n_block=nb, n_flow=nf, n_layer=nl, filter_size=fs,
                      num_mels=nm, upsample_scales=scales,
                      causal=(variant == "causal"),
                      affine=(variant != "additive"),
                      gin_channels=4 if variant == "gin" else -1,
                      n_speakers=3,
                      parity_drop_global_cond=(variant == "gin"))
    tf_vars = {k[len("var:"):]: fx[k] for k in fx.files
               if k.startswith("var:")}
    params = import_tf_checkpoint(tf_vars, cfg)

    x, c = jnp.asarray(fx["x"]), jnp.asarray(fx["c"])
    g = jnp.asarray(fx["g"]) if variant == "gin" else None
    log_p, logdet = forward(params, cfg, x, c, g, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(log_p), float(fx["log_p"]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(logdet), float(fx["logdet"]),
                               rtol=2e-5, atol=2e-6)

    # the imported model must also invert TF's latent back to the audio
    # (reverse takes z at full rate and re-derives the squeezes)
    from flowavenet_tpu.ops.squeeze import unsqueeze
    z_full = jnp.asarray(fx["z"])
    for _ in range(cfg.n_block):
        z_full = unsqueeze(z_full)
    x_rec = reverse(params, cfg, z_full, c, g, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(x_rec), fx["x"], atol=5e-4)


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
