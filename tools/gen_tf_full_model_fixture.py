"""Generate FULL-MODEL TF golden fixtures for NLL parity — variant matrix.

Builds tiny (2 blocks x 2 flows x 2 layers) models with the REFERENCE's
exact semantics in TF 2.21 — upsample head (conv2d_transpose, WN axes [0,2],
leaky_relu 0.4; /root/reference/model.py:301-311,398-404), squeeze layout
2c+p (model.py:224-239), ActNorm (model.py:55-80), affine OR additive
coupling + WaveNet coupling net (model.py:108-164, modules.py:62-189),
causal or non-causal convs (modules.py:12-15,30-31: pad d*(k-1) both sides
then crop right == left pad), change_order (model.py:166-174), optional
speaker embedding (model.py:313-314,330-334) WITH the reference's g-drop
(modules.py:188-189: WaveNet.__call__ forwards only (x, c), so g shapes
flow through squeeze/change_order but never reach the nets), loss heads
(model.py:342-347) — under the reference's variable naming scheme
(vocoder/FloWaveNet/Block_i/Flow_j/...), and saves per variant:

  tests/fixtures/full_model_golden[_<variant>].npz
    x, c [, g]                inputs
    log_p, logdet             TF-computed golden values
    z                         TF latent (for reverse-parity)
    var:<name>                every model variable, importer-consumable

Variants: base (affine, non-causal, no gin), causal, additive
(affine=False: out_b = in_b + net, logdet from ActNorms only,
model.py:137-139), gin (gin_channels=4, n_speakers=3, g-drop parity).

The parity test (tests/test_tf_parity.py) feeds each var: mapping through
checkpoint/tf_import.py and asserts our forward reproduces (log_p, logdet).

Run: python tools/gen_tf_full_model_fixture.py
"""

import math
import os

import numpy as np

os.environ["CUDA_VISIBLE_DEVICES"] = ""
import tensorflow as tf  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
SCOPE = "vocoder/FloWaveNet"

# tiny geometry (matches the cfg in the parity test)
N_BLOCK, N_FLOW, N_LAYER = 2, 2, 2
FILTER_SIZE = 16
NUM_MELS = 8
UPSAMPLE_SCALES = (4, 4)          # hop = 16
B, FRAMES = 2, 4
HOP = int(np.prod(UPSAMPLE_SCALES))
T = FRAMES * HOP
GIN_CHANNELS, N_SPEAKERS = 4, 3

VARIANTS = {
    # name -> (affine, causal, gin)
    "": (True, False, 0),
    "causal": (True, True, 0),
    "additive": (False, False, 0),
    "gin": (True, False, GIN_CHANNELS),
    # MID-WIDTH geometry (VERDICT r3 "importer stress"): 4 blocks,
    # filter 64, 32 mels — at block 1 the cond half sq_c/2 = 64 equals
    # filter_size, so filter_c/gate_c [1,64,64] share shapes with
    # res/skip [1,64,64] inside every ResBlock prefix and the importer's
    # keras-creation-order tie-break (tf_import.py) is load-bearing in a
    # way the tiny fixture structurally cannot exercise.
    "mid": (True, False, 0),
}

GEOMETRY = {
    # name -> (n_block, filter_size, num_mels, frames)
    "mid": (4, 64, 32, 8),
}
DEFAULT_GEOM = (N_BLOCK, FILTER_SIZE, NUM_MELS, FRAMES)

rng = np.random.RandomState(2024)
VARS: dict[str, np.ndarray] = {}
_conv1d_counter = [0]


def _reset_state(seed: int):
    global rng
    rng = np.random.RandomState(seed)
    VARS.clear()
    _conv1d_counter[0] = 0


def _conv1d_name() -> str:
    i = _conv1d_counter[0]
    _conv1d_counter[0] += 1
    return "conv1d" if i == 0 else f"conv1d_{i}"


def make_wn_conv(prefix: str, k: int, cin: int, cout: int,
                 scale: float = 0.3):
    """Register a weight-normalized conv's raw vars under reference names."""
    name = f"{prefix}/{_conv1d_name()}"
    v = (scale * rng.randn(k, cin, cout)).astype(np.float32)
    g = (1.0 + 0.1 * rng.randn(cout)).astype(np.float32)
    b = (0.1 * rng.randn(cout)).astype(np.float32)
    VARS[f"{name}/kernel"] = v
    VARS[f"{name}/wn/g"] = g
    VARS[f"{name}/bias"] = b
    return v, g, b


def wn_kernel(v, g):
    """convolutional.py:80: l2_normalize(v, axis=[0,1]) * g."""
    n = v / np.sqrt(np.maximum((v ** 2).sum(axis=(0, 1), keepdims=True),
                               1e-12))
    return (n * g).astype(np.float32)


def conv1d(x, kern, bias, dilation=1, causal=False):
    """Reference Conv wrapper (modules.py:12-15,27-31): non-causal pads
    d*(k-1)//2 both sides; causal pads d*(k-1) both sides then crops the
    right overhang (== left pad)."""
    k = kern.shape[0]
    if causal:
        pad = dilation * (k - 1)
    else:
        pad = dilation * (k - 1) // 2
    xp = tf.pad(x, [[0, 0], [pad, pad], [0, 0]])
    out = tf.nn.conv1d(xp, kern, stride=1, padding="VALID",
                       dilations=dilation) + bias
    if causal and pad != 0:
        out = out[:, :-pad]
    return out


def conv1x1(x, kern, bias):
    return tf.nn.conv1d(x, kern, stride=1, padding="VALID") + bias


def squeeze(x):
    """model.py:224-239: [B,T,C] -> [B,T/2,2C], out channel 2c+p."""
    b, t, c = x.shape
    x = tf.reshape(x, [b, t // 2, 2, c])
    x = tf.transpose(x, [0, 1, 3, 2])
    return tf.reshape(x, [b, t // 2, 2 * c])


def change_order(x):
    c = int(x.shape[-1])
    return tf.concat([x[..., c // 2:], x[..., : c // 2]], axis=-1)


# --------------------------------------------------------------------------
# Build variables + forward, block by block (creation order mirrors the
# reference: upsample first, then blocks/flows; within a WaveNet: front,
# per-ResBlock [filter, gate, res, skip, filter_c, gate_c], final, zero —
# the order the importer's keras-index tie-break assumes.  The reference's
# filter_g/gate_g convs are declared (modules.py:99-108) but NEVER BUILT:
# WaveNet.__call__ drops g (modules.py:189) so their lazy Conv1D build never
# runs and trained checkpoints contain no variables for them — the gin
# fixture matches that).
# --------------------------------------------------------------------------

def make_upsample():
    stages = []
    for i, s in enumerate(UPSAMPLE_SCALES):
        name = "conv2d_transpose" if i == 0 else f"conv2d_transpose_{i}"
        v = (0.3 * rng.randn(2 * s, 3, 1, 1)).astype(np.float32)
        g = np.array([1.1], np.float32)
        b = (0.1 * rng.randn(1)).astype(np.float32)
        VARS[f"{SCOPE}/{name}/kernel"] = v
        VARS[f"{SCOPE}/{name}/wn/g"] = g
        VARS[f"{SCOPE}/{name}/bias"] = b
        stages.append((v, g, b, s))
    return stages


def apply_upsample(c, stages):
    h = tf.constant(c[..., None])          # [B, Tm, M, 1]
    for v, g, b, s in stages:
        # convolutional.py:186: l2_normalize(kernel, axis=[0,2]) * g
        n = v / np.sqrt(np.maximum((v ** 2).sum(axis=(0, 2), keepdims=True),
                                   1e-12))
        kern = (n * g).astype(np.float32)
        out_shape = [int(h.shape[0]), int(h.shape[1]) * s, int(h.shape[2]), 1]
        h = tf.nn.conv2d_transpose(h, kern, output_shape=out_shape,
                                   strides=[1, s, 1, 1], padding="SAME")
        h = tf.nn.leaky_relu(h + b, 0.4)   # model.py:307
    return tf.squeeze(h, 3)                # [B, T, M]


def make_wavenet(prefix: str, in_ch: int, out_ch: int, cin_ch: int):
    w = {"front": make_wn_conv(f"{prefix}/Conv_front", 3, in_ch, FILTER_SIZE),
         "layers": []}
    for n in range(N_LAYER):
        rp = f"{prefix}/ResBlock_0_{n}"
        layer = {
            "filter": make_wn_conv(f"{rp}/Conv_filter", 3, FILTER_SIZE,
                                   FILTER_SIZE),
            "gate": make_wn_conv(f"{rp}/Conv_gate", 3, FILTER_SIZE,
                                 FILTER_SIZE),
            # creation order: res, skip, filter_c, gate_c (modules.py:77-97)
            "res": make_wn_conv(rp, 1, FILTER_SIZE, FILTER_SIZE),
            "skip": make_wn_conv(rp, 1, FILTER_SIZE, FILTER_SIZE),
            "filter_c": make_wn_conv(rp, 1, cin_ch, FILTER_SIZE),
            "gate_c": make_wn_conv(rp, 1, cin_ch, FILTER_SIZE),
        }
        w["layers"].append(layer)
    w["final"] = make_wn_conv(f"{prefix}/Conv_final", 1, FILTER_SIZE,
                              FILTER_SIZE)
    zp = f"{prefix}/ZeroConv1d/{_conv1d_name()}"
    # non-zero "zero" conv so log_s/t are non-trivial in the fixture
    zw = (0.3 * rng.randn(1, FILTER_SIZE, out_ch)).astype(np.float32)
    zb = (0.1 * rng.randn(out_ch)).astype(np.float32)
    zs = (0.2 * rng.randn(1, 1, out_ch)).astype(np.float32)
    VARS[f"{zp}/kernel"] = zw
    VARS[f"{zp}/bias"] = zb
    VARS[f"{prefix}/ZeroConv1d/scale"] = zs
    w["zero"] = (zw, zb, zs)
    return w


def apply_wavenet(w, x, c, causal=False):
    """modules.py:161-186 (gated units modules.py:110-128).  No g argument
    on purpose: the reference's WaveNet.__call__ drops it (modules.py:189)."""
    fv, fgain, fb = w["front"]
    h = tf.nn.relu(conv1d(x, wn_kernel(fv, fgain), fb, dilation=1,
                          causal=causal))
    skip_sum = None
    for n, layer in enumerate(w["layers"]):
        d = 3 ** n                                     # modules.py:152
        filt = conv1d(h, wn_kernel(*layer["filter"][:2]),
                      layer["filter"][2], dilation=d, causal=causal)
        gate = conv1d(h, wn_kernel(*layer["gate"][:2]),
                      layer["gate"][2], dilation=d, causal=causal)
        filt += conv1x1(c, wn_kernel(*layer["filter_c"][:2]),
                        layer["filter_c"][2])
        gate += conv1x1(c, wn_kernel(*layer["gate_c"][:2]),
                        layer["gate_c"][2])
        out = tf.tanh(filt) * tf.sigmoid(gate)         # modules.py:124
        res = conv1x1(out, wn_kernel(*layer["res"][:2]), layer["res"][2])
        h = (h + res) * math.sqrt(0.5)                 # modules.py:128
        s = conv1x1(out, wn_kernel(*layer["skip"][:2]), layer["skip"][2])
        skip_sum = s if skip_sum is None else skip_sum + s
    out = tf.nn.relu(skip_sum)
    out = tf.nn.relu(conv1x1(out, wn_kernel(*w["final"][:2]), w["final"][2]))
    zw, zb, zs = w["zero"]
    return (conv1x1(out, zw, zb)) * tf.exp(zs * 3.0)   # modules.py:55-57


def generate(variant: str):
    global N_BLOCK, FILTER_SIZE, NUM_MELS, FRAMES, T
    affine, causal, gin = VARIANTS[variant]
    N_BLOCK, FILTER_SIZE, NUM_MELS, FRAMES = GEOMETRY.get(variant,
                                                          DEFAULT_GEOM)
    T = FRAMES * HOP
    _reset_state(2024 + sum(map(ord, variant)))

    x_np = (0.3 * rng.randn(B, T, 1)).astype(np.float32)
    c_np = rng.rand(B, FRAMES, NUM_MELS).astype(np.float32)
    g_np = rng.randint(0, N_SPEAKERS, size=(B,)).astype(np.int32)

    up = make_upsample()
    if gin > 0:
        emb = (0.3 * rng.randn(N_SPEAKERS, gin)).astype(np.float32)
        VARS[f"{SCOPE}/speaker_embeddings"] = emb

    # variables for all blocks/flows (creation order = reference order)
    blocks = []
    in_ch, cin_ch = 1, NUM_MELS
    for i in range(N_BLOCK):
        sq, sq_c = 2 * in_ch, 2 * cin_ch
        out_ch = sq if affine else sq // 2   # model.py:115-116
        flows = []
        for j in range(N_FLOW):
            fp = f"{SCOPE}/Block_{i}/Flow_{j}"
            an_b = (0.1 * rng.randn(1, 1, sq)).astype(np.float32)
            an_logs = (0.1 * rng.randn(1, 1, sq)).astype(np.float32)
            VARS[f"{fp}/ActNorm/b"] = an_b
            VARS[f"{fp}/ActNorm/logs"] = an_logs
            wn = make_wavenet(f"{fp}/AffineCoupling/WaveNet",
                              sq // 2, out_ch, sq_c // 2)
            flows.append((an_b, an_logs, wn))
        blocks.append(flows)
        in_ch, cin_ch = in_ch * 2, cin_ch * 2

    # ---- forward (model.py:317-347) ------------------------------------
    x = tf.constant(x_np)
    c = apply_upsample(c_np, up)
    if gin > 0:
        # model.py:330-334: lookup + tile over time
        g = tf.nn.embedding_lookup(tf.constant(emb), tf.constant(g_np))
        g = tf.tile(tf.expand_dims(g, 1), (1, int(c.shape[1]), 1))
    else:
        g = None
    logdet = tf.constant(0.0)
    for flows in blocks:
        x, c = squeeze(x), squeeze(c)                  # model.py:224-239
        if g is not None:
            g = squeeze(g)
        for an_b, an_logs, wn in flows:
            # ActNorm (model.py:55-80)
            x = (x + an_b) * tf.exp(an_logs * 3.0)
            logdet += tf.reduce_mean(an_logs * 3.0)
            # AffineCoupling (model.py:121-139); g_a is split off
            # (model.py:127-130) but NEVER consumed — WaveNet.__call__
            # drops it (modules.py:189)
            ch = int(x.shape[-1])
            in_a, in_b = x[..., : ch // 2], x[..., ch // 2:]
            c_a = c[..., : int(c.shape[-1]) // 2]
            net = apply_wavenet(wn, in_a, c_a, causal=causal)
            if affine:
                log_s, t = net[..., : ch // 2], net[..., ch // 2:]
                out_b = (in_b - t) * tf.exp(-log_s)
                logdet += tf.reduce_mean(-log_s) / 2.0
            else:
                out_b = in_b + net                     # model.py:137-139
            x = tf.concat([in_a, out_b], axis=-1)
            # change_order (model.py:166-174, applied to x, c and g)
            x, c = change_order(x), change_order(c)
            if g is not None:
                g = change_order(g)
    z = x
    log_p = tf.reduce_mean(0.5 * (-math.log(2 * math.pi) - z ** 2))

    out = {"x": x_np, "c": c_np,
           "log_p": np.float32(log_p.numpy()),
           "logdet": np.float32(logdet.numpy()),
           "z": z.numpy(),
           "geom": np.array([N_BLOCK, N_FLOW, N_LAYER, FILTER_SIZE,
                             NUM_MELS], np.int64),
           "scales": np.array(UPSAMPLE_SCALES, np.int64)}
    if gin > 0:
        out["g"] = g_np
    for k, v in VARS.items():
        out[f"var:{k}"] = v
    suffix = f"_{variant}" if variant else ""
    path = os.path.join(FIXDIR, f"full_model_golden{suffix}.npz")
    np.savez(path, **out)
    print(f"full_model_golden{suffix}: log_p={out['log_p']:.6f} "
          f"logdet={out['logdet']:.6f} vars={len(VARS)} -> {path}")


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    for variant in VARIANTS:
        generate(variant)


if __name__ == "__main__":
    main()
