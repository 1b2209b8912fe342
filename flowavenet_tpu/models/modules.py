"""WaveNet-style coupling network: the compute-hot core of every flow step.

TPU-native re-design of the reference's gated dilated ResBlock stack
(/root/reference/modules.py:62-189).  Differences from the reference that do
NOT change numerics:

* filter+gate convolutions are fused into one conv with 2*C output channels
  (the effective weight-normalized kernels are concatenated on the output
  axis) — one MXU pass instead of two.
* The local-conditioning 1x1 projections are likewise fused.
* Causal padding is a single left-pad instead of pad-both-sides-and-crop
  (modules.py:27-31) — identical output.

The reference's ``WaveNet.__call__`` drops global conditioning on the floor
(modules.py:188-189 forwards only ``(x, c)``).  We plumb ``g`` correctly;
``parity_drop_global_cond`` in the model config restores the reference bug.

Parameter pytree for one WaveNet (leaf shapes; a leading flow axis is added
by the Block for ``lax.scan``):

    front:      wn conv  [3, in, R]
    layers[i]:  fg:   wn conv [3, R, G] x2 (filter, gate) stored separately
                fg_c: wn 1x1  [1, Cc, G] x2
                fg_g: wn 1x1  [1, Cg, G] x2 (only if gin_channels > 0)
                res:  wn 1x1  [1, G, R]
                skip: wn 1x1  [1, G, S]
    final:      wn 1x1  [1, S, S]
    zero:       zero-init 1x1 [1, S, out] + per-channel scale
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import (conv1x1, conv1x1_int8, dilated_conv1d,
                        init_wn_conv1d, init_zero_conv1d, wn_conv1d,
                        wn_kernel, zero_conv1d)

SQRT_HALF = math.sqrt(0.5)


def init_wavenet(key: jax.Array, in_channels: int, out_channels: int,
                 num_layers: int, residual_channels: int, cin_channels: int,
                 gin_channels: int = 0, kernel_size: int = 3) -> dict:
    """Init one coupling net (reference modules.py:134-159: num_blocks=1,
    residual == gate == skip == filter_size, dilation = kernel_size**n)."""
    r = residual_channels
    keys = jax.random.split(key, 2 * num_layers + 2)
    params: dict = {
        "front": init_wn_conv1d(keys[0], in_channels, r, kernel_size),
        "layers": [],
        "final": init_wn_conv1d(keys[1], r, r, 1),
        "zero": init_zero_conv1d(r, out_channels),
    }
    for n in range(num_layers):
        lk = jax.random.split(keys[2 + n], 8)
        layer = {
            "filter": init_wn_conv1d(lk[0], r, r, kernel_size),
            "gate": init_wn_conv1d(lk[1], r, r, kernel_size),
            "filter_c": init_wn_conv1d(lk[2], cin_channels, r, 1),
            "gate_c": init_wn_conv1d(lk[3], cin_channels, r, 1),
            "res": init_wn_conv1d(lk[4], r, r, 1),
            "skip": init_wn_conv1d(lk[5], r, r, 1),
        }
        if gin_channels > 0:
            layer["filter_g"] = init_wn_conv1d(lk[6], gin_channels, r, 1)
            layer["gate_g"] = init_wn_conv1d(lk[7], gin_channels, r, 1)
        params["layers"].append(layer)
    return params


def _fused_fg_kernel(pf: dict, pg: dict) -> tuple[jax.Array, jax.Array]:
    """Concatenate filter & gate effective kernels on the output axis so one
    conv feeds both halves of the gated unit."""
    k = jnp.concatenate([wn_kernel(pf), wn_kernel(pg)], axis=-1)
    b = jnp.concatenate([pf["b"], pg["b"]], axis=-1)
    return k, b


def _cond_fg(c, g: Optional[jax.Array], layer: dict,
             conv_bias: jax.Array, out_dtype=None) -> jax.Array:
    """Conditioning pre-activations + the dilated conv's bias, fused into
    one [B, T, 2R] tensor added before the gate.

    ``c`` may be a pre-quantized ``(q_int8, fp32_scale)`` pair (see
    ops/conv.py quantize_act): the 1x1 then runs on the int8 MXU — the
    deep blocks' synthesis route under FWN_INT8, where this matmul's
    K = Cc/2 reaches 10240 and dominates the block (docs/benchmarks.md)."""
    kc, bc = _fused_fg_kernel(layer["filter_c"], layer["gate_c"])
    if isinstance(c, tuple):
        assert g is None, "int8 cond path has no global-conditioning route"
        c_q, c_scale = c
        return conv1x1_int8(c_q, c_scale, kc,
                            bc + conv_bias.astype(bc.dtype), out_dtype)
    fg = conv1x1(c, kc, bc + conv_bias.astype(bc.dtype))
    if g is not None and "filter_g" in layer:
        kg, bg = _fused_fg_kernel(layer["filter_g"], layer["gate_g"])
        fg = fg + conv1x1(g, kg, bg)
    return fg


def _res_layer(h: jax.Array, c: jax.Array, g: Optional[jax.Array],
               layer: dict, dilation: int, causal: bool,
               compute_dtype, use_pallas: bool = False,
               need_residual: bool = True
               ) -> tuple[Optional[jax.Array], jax.Array]:
    """One gated residual unit (modules.py:110-128).

    Returns (residual_out, skip).  residual_out = (h + res)*sqrt(0.5).
    ``need_residual=False`` (last layer of the stack) skips the res
    projection entirely — its output is discarded by the WaveNet head, the
    reference just computes it anyway (modules.py:126-128).
    ``use_pallas`` routes through the fused TPU kernel
    (ops/pallas_resblock.py); numerics match the XLA path to bf16 rounding.
    """
    r = layer["res"]["b"].shape[0]
    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])

    if use_pallas and need_residual:
        assert not isinstance(c, tuple), \
            "pre-quantized cond is an XLA-route contract (use_pallas=False)"
        from ..ops.pallas_resblock import (V2_MAX_CC, fused_gated_resblock,
                                           fused_gated_resblock_v2)

        if g is None and c.shape[-1] <= V2_MAX_CC:
            # v2: conditioning matmul fused into the kernel
            kc, bc = _fused_fg_kernel(layer["filter_c"], layer["gate_c"])
            return fused_gated_resblock_v2(
                h, c, k, kc[0], bc + b,
                wn_kernel(layer["res"])[0], layer["res"]["b"],
                wn_kernel(layer["skip"])[0], layer["skip"]["b"],
                dilation=dilation, causal=causal)

        cond = _cond_fg(c, g, layer, b)
        return fused_gated_resblock(
            h, cond, k, wn_kernel(layer["res"])[0], layer["res"]["b"],
            wn_kernel(layer["skip"])[0], layer["skip"]["b"],
            dilation=dilation, causal=causal)

    fg = dilated_conv1d(h, k, b, dilation=dilation, causal=causal)
    fg = fg + _cond_fg(c, g, layer, jnp.zeros_like(b), out_dtype=h.dtype)

    h_f, h_g = fg[..., :r], fg[..., r:]
    out = jnp.tanh(h_f) * jax.nn.sigmoid(h_g)

    skip = conv1x1(out, wn_kernel(layer["skip"]), layer["skip"]["b"])
    if not need_residual:
        return None, skip
    res = conv1x1(out, wn_kernel(layer["res"]), layer["res"]["b"])
    h = (h + res) * jnp.asarray(SQRT_HALF, dtype=h.dtype)
    return h, skip


def apply_wavenet(params: dict, x: jax.Array, c: jax.Array,
                  g: Optional[jax.Array] = None, *, causal: bool,
                  kernel_size: int = 3, use_pallas: bool = False
                  ) -> jax.Array:
    """Coupling net forward (modules.py:161-186).

    x: [B, T, in] half-tensor; c: [B, T, Cc] half-condition.
    Returns [B, T, out] (log_s ‖ t for affine couplings).
    """
    h = wn_conv1d(x, params["front"], dilation=1, causal=causal)
    h = jax.nn.relu(h)

    skip_sum = None
    n_layers = len(params["layers"])
    for n, layer in enumerate(params["layers"]):
        h, s = _res_layer(h, c, g, layer, dilation=kernel_size ** n,
                          causal=causal, compute_dtype=h.dtype,
                          use_pallas=use_pallas,
                          need_residual=n + 1 < n_layers)
        skip_sum = s if skip_sum is None else skip_sum + s

    out = jax.nn.relu(skip_sum)
    out = conv1x1(out, wn_kernel(params["final"]), params["final"]["b"])
    out = jax.nn.relu(out)
    return zero_conv1d(out, params["zero"])
