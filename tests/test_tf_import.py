"""TF-checkpoint importer test.

Without a trained reference checkpoint on disk, validate the mapping by
round-trip: export our params under the reference's variable-naming scheme
(deterministic scopes + auto-numbered keras layer names in creation order,
model.py/modules.py), then import and require bit-identical pytrees, and a
bit-identical NLL.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowavenet_tpu.checkpoint.tf_import import import_tf_checkpoint
from flowavenet_tpu.config import ModelConfig
from flowavenet_tpu.models.flowavenet import forward, init_flowavenet


def export_reference_names(params: dict, cfg: ModelConfig,
                           scope="vocoder/FloWaveNet") -> dict:
    """Emit {tf_name: array} exactly as the reference graph would create it
    (creation order drives the keras auto-numbering)."""
    out = {}
    counter = {"conv1d": 0, "conv2d_transpose": 0}

    def keras_name(kind):
        i = counter[kind]
        counter[kind] += 1
        return kind if i == 0 else f"{kind}_{i}"

    def put_wn(prefix, p, kind="conv1d"):
        name = keras_name(kind)
        out[f"{prefix}/{name}/kernel"] = np.asarray(p["v"])
        out[f"{prefix}/{name}/wn/g"] = np.asarray(p["g"])
        out[f"{prefix}/{name}/bias"] = np.asarray(p["b"])

    # creation order in FloWaveNet.__init__ (model.py:287-314): blocks first,
    # then upsample convs, then speaker embeddings
    for i, bp in enumerate(params["blocks"]):
        flows = bp["flows"]
        for j in range(jax.tree.leaves(flows)[0].shape[0]):
            fp = f"{scope}/Block_{i}/Flow_{j}"
            f = jax.tree.map(lambda x: np.asarray(x[j]), flows)
            out[f"{fp}/ActNorm/b"] = f["actnorm"]["b"]
            out[f"{fp}/ActNorm/logs"] = f["actnorm"]["logs"]
            wp = f"{fp}/AffineCoupling/WaveNet"
            c = f["coupling"]
            put_wn(f"{wp}/Conv_front", c["front"])
            for n, layer in enumerate(c["layers"]):
                rp = f"{wp}/ResBlock_0_{n}"
                put_wn(f"{rp}/Conv_filter", layer["filter"])
                put_wn(f"{rp}/Conv_gate", layer["gate"])
                put_wn(rp, layer["res"])       # creation order
                put_wn(rp, layer["skip"])      # (modules.py:77-97)
                put_wn(rp, layer["filter_c"])
                put_wn(rp, layer["gate_c"])
            put_wn(f"{wp}/Conv_final", c["final"])
            zname = keras_name("conv1d")
            out[f"{wp}/ZeroConv1d/{zname}/kernel"] = c["zero"]["w"]
            out[f"{wp}/ZeroConv1d/{zname}/bias"] = c["zero"]["b"]
            out[f"{wp}/ZeroConv1d/scale"] = c["zero"]["scale"].reshape(
                1, 1, -1)
    for p in params["upsample"]:
        put_wn(scope, p, "conv2d_transpose")
    if "speaker_emb" in params:
        out[f"{scope}/speaker_embeddings"] = np.asarray(params["speaker_emb"])
    # fake optimizer slots the importer must ignore
    out[f"{scope}/Block_0/Flow_0/ActNorm/b/Adam"] = np.zeros(1)
    return out


def test_import_roundtrip(key):
    cfg = ModelConfig(n_block=2, n_flow=2, n_layer=2, filter_size=16,
                      num_mels=8, upsample_scales=(4, 4))
    rng = np.random.RandomState(0)
    params = init_flowavenet(key, cfg)
    params = jax.tree.map(
        lambda l: np.asarray(l + 0.1 * rng.randn(*l.shape).astype(l.dtype)),
        params)

    tf_vars = export_reference_names(params, cfg)
    imported = import_tf_checkpoint(tf_vars, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(imported)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))

    # NLL is bit-identical through the imported weights
    x = jnp.asarray(rng.randn(1, 256, 1), jnp.float32)
    c = jnp.asarray(rng.rand(1, 16, 8), jnp.float32)
    lp_a, ld_a = forward(params, cfg, x, c)
    lp_b, ld_b = forward(imported, cfg, x, c)
    assert float(lp_a) == float(lp_b) and float(ld_a) == float(ld_b)


def test_import_with_speaker_embeddings(key):
    cfg = ModelConfig(n_block=2, n_flow=1, n_layer=1, filter_size=8,
                      num_mels=4, upsample_scales=(2, 2), gin_channels=6,
                      n_speakers=3)
    params = init_flowavenet(key, cfg)
    params = jax.tree.map(np.asarray, params)
    tf_vars = export_reference_names(params, cfg)
    # reference checkpoints lack the never-called g-convs (modules.py:189);
    # drop them from the export to simulate that
    imported = import_tf_checkpoint(tf_vars, cfg)
    np.testing.assert_array_equal(imported["speaker_emb"],
                                  params["speaker_emb"])
