"""Generate TF golden-value fixtures for parity tests.

Run once (requires tensorflow, which is not a runtime dependency of the
framework) to produce tests/fixtures/*.npz.  The fixtures pin our upsampler
and weight-normalized convs to the reference's TF semantics
(/root/reference/convolutional.py, model.py:301-311,398-404).
"""

import os

import numpy as np

os.environ["CUDA_VISIBLE_DEVICES"] = ""
import tensorflow as tf  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(FIXDIR, exist_ok=True)
rng = np.random.RandomState(42)


def l2_normalize(v, axis):
    return v / np.sqrt(np.maximum((v ** 2).sum(axis=axis, keepdims=True),
                                  1e-12))


def gen_upsample():
    """Reference upsample head: two Conv2DTranspose(filters=1, k=(2s,3),
    strides=(s,1), SAME, leaky_relu 0.4) with weight norm on axes [0,2]."""
    scales = (4, 4)  # small scales for a fast fixture; same code path as 16
    B, Tm, M = 2, 6, 5
    c = rng.randn(B, Tm, M).astype(np.float32)
    h = tf.constant(c[..., None])
    ks, gs, bs = [], [], []
    for s in scales:
        v = rng.randn(2 * s, 3, 1, 1).astype(np.float32)  # (H,W,out,in)
        g = rng.randn(1).astype(np.float32)
        b = rng.randn(1).astype(np.float32)
        # convolutional.py:186: l2_normalize(kernel, axis=[0,2]) * g
        kern = l2_normalize(v, axis=(0, 2)) * g
        bshape = tf.shape(h)
        out_shape = [int(h.shape[0]), int(h.shape[1]) * s, int(h.shape[2]), 1]
        h = tf.nn.conv2d_transpose(h, kern, output_shape=out_shape,
                                   strides=[1, s, 1, 1], padding="SAME")
        h = tf.nn.leaky_relu(h + b, 0.4)
        ks.append(v); gs.append(g); bs.append(b)
    out = tf.squeeze(h, 3).numpy()
    np.savez(os.path.join(FIXDIR, "upsample_golden.npz"),
             c=c, out=out, scales=np.array(scales),
             **{f"v{i}": v for i, v in enumerate(ks)},
             **{f"g{i}": g for i, g in enumerate(gs)},
             **{f"b{i}": b for i, b in enumerate(bs)})
    print("upsample_golden:", out.shape)


def gen_wn_conv():
    """Weight-normalized dilated conv1d vs tf.nn.conv1d with explicit pad
    (modules.py:24-33 + convolutional.py:73-80)."""
    B, T, Cin, Cout, K, d = 2, 16, 3, 5, 3, 2
    x = rng.randn(B, T, Cin).astype(np.float32)
    v = rng.randn(K, Cin, Cout).astype(np.float32)
    g = rng.randn(Cout).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    kern = l2_normalize(v, axis=(0, 1)) * g
    outs = {}
    for causal in (True, False):
        pad = d * (K - 1) if causal else d * (K - 1) // 2
        xp = tf.pad(tf.constant(x), [[0, 0], [pad, pad], [0, 0]])
        y = tf.nn.conv1d(xp, kern, stride=1, padding="VALID", dilations=d) + b
        if causal and pad != 0:
            y = y[:, :-pad]
        outs["out_causal" if causal else "out_noncausal"] = y.numpy()
    np.savez(os.path.join(FIXDIR, "wnconv_golden.npz"),
             x=x, v=v, g=g, b=b, K=K, d=d, **outs)
    print("wnconv_golden:", outs["out_causal"].shape)


if __name__ == "__main__":
    gen_upsample()
    gen_wn_conv()
    print("fixtures written to", os.path.abspath(FIXDIR))
