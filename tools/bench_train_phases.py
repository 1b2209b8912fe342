"""Train-step speed-of-light accounting (VERDICT r3 item 1).

Times three jits on device-generated batches — forward-only (loss_fn),
forward+backward (value_and_grad), and the FULL donated train step
(grads + clip + Adam + metrics) — against an ANALYTIC forward-FLOP
model (2 x MAC, the same convention as the synthesis SOL table in
docs/benchmarks.md).  Prints a markdown table plus one JSON line.

Accounting:
  fwd FLOPs    = analytic model FLOPs of one forward pass
  useful       = 3 x fwd (forward + backward's dx & dk, no recompute)
  executed     = useful + 1 x fwd recompute under full per-flow remat
  MFU          = useful / time / peak;  exec util = executed / time / peak

XLA's own cost_analysis 'flops' is printed as a footnote only: it
counts a MAC as one flop and skips some fused ops, so it is NOT
comparable with the hand model or the synthesis table.

Env knobs: BENCH_BATCH (128) | BENCH_CONFIG (lj22k) | BENCH_ITERS (4)
         | BENCH_PEAK_TFLOPS (197 — v5e bf16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def forward_flops(cfg, batch: int, T: int) -> float:
    """Analytic forward-pass FLOPs (2 x MAC) for a [batch, T, 1] crop.

    Per block k (level k+1, T_k = T / 2^(k+1) steps, R = filter_size,
    half channels r_in = 2^k, cond half Cc = num_mels * 2^k), per flow:
      front conv   3 * r_in * R
      fg convs     n_layer * 3 * R * 2R
      cond 1x1s    n_layer * Cc * 2R
      res + skips  (1 + n_layer) * R * R
      final        R * R
      zero conv    R * 2 * r_in
    plus the upsampler's dense matmuls (as executed, models/upsample.py).
    """
    m = cfg.model
    R = m.filter_size
    fl = 0.0
    for k in range(m.n_block):
        T_k = T >> (k + 1)
        r_in = 1 << k
        cc = m.num_mels * (1 << k)
        per_flow = (3 * r_in * R + m.n_layer * 3 * R * 2 * R
                    + m.n_layer * cc * 2 * R
                    + (1 + m.n_layer) * R * R + R * R + R * 2 * r_in)
        fl += 2.0 * m.n_flow * T_k * per_flow
    # dense upsampler: per scale one [B*H, D*(W+2)] x [D*(W+2), s*W] matmul
    W = m.num_mels
    t_mel = T // m.hop_size
    h = t_mel
    for s in m.upsample_scales:
        kh = 2 * s
        d = len({(p + (kh - s) // 2 - hh) // s for p in range(s)
                 for hh in range((p + (kh - s) // 2) % s, kh, s)})
        fl += 2.0 * h * d * (W + 2) * s * W
        h *= s
    return fl * batch


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import loss_fn
    from flowavenet_tpu.training.train_state import (create_state,
                                                     make_train_step)

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    T = cfg.data.max_time_steps
    frames = T // cfg.audio.hop_size

    state = jax.jit(lambda k: create_state(k, cfg))(jax.random.PRNGKey(0))
    float(jax.tree.leaves(state.params)[0].sum())

    def dev_batch(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "audio": jax.random.normal(k1, (batch, T, 1), jnp.float32) * 0.1,
            "mel": jax.random.uniform(k2, (batch, frames,
                                           cfg.model.num_mels), jnp.float32),
        }
    batches = [jax.jit(dev_batch)(i) for i in range(iters + 1)]
    jax.block_until_ready(batches)

    dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" \
        else jnp.float32

    def fwd(params, b):
        loss, _ = loss_fn(params, cfg.model, b["audio"], b["mel"], None,
                          compute_dtype=dt)
        return loss

    def fwdbwd(params, b):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg.model, b["audio"], b["mel"], None,
                              compute_dtype=dt), has_aux=True)(params)
        # fold grads to a scalar so timing fences on one readback
        return loss, jax.tree.reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l).astype(jnp.float32)),
            grads, jnp.asarray(0.0, jnp.float32))

    def xla_flops(fn, *args):
        try:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            return float((ca or {}).get("flops", float("nan")))
        except Exception:
            return float("nan")

    def timeit(fn, name):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(state.params, batches[0])
        jax.block_until_ready(out)
        print(f"# {name}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for i in range(iters):
            t0 = time.time()
            out = f(state.params, batches[i + 1])
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        return min(times)

    f_fwd = forward_flops(cfg, batch, T)
    f_useful = 3.0 * f_fwd
    remat_on = cfg.model.remat
    f_exec = (4.0 if remat_on else 3.0) * f_fwd

    t_fwd = timeit(fwd, "forward")
    t_fb = timeit(fwdbwd, "forward+backward")

    # full step, donated state, like production (training/train.py)
    step_full = jax.jit(make_train_step(cfg), donate_argnums=0)
    t0 = time.time()
    st, m = step_full(state, batches[0])
    jax.block_until_ready(m["loss"])
    print(f"# full step: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    times = []
    for i in range(iters):
        t0 = time.time()
        st, m = step_full(st, batches[i + 1])
        jax.block_until_ready(m["loss"])
        times.append(time.time() - t0)
    t_full = min(times)

    def row(name, t, useful, execd):
        print(f"| {name} | {t*1e3:8.1f} | {useful/1e12:6.2f} | "
              f"{execd/1e12:6.2f} | {execd/t/1e12:6.1f} | "
              f"{execd/t/peak*100:5.1f}% | {useful/t/peak*100:5.1f}% |")

    print(f"\nb{batch} x {T} crop ({batch*T/cfg.audio.sample_rate:.1f} "
          f"audio-s/step), peak {peak/1e12:.0f} TFLOP/s bf16, analytic "
          f"2xMAC FLOPs (fwd = {f_fwd/1e12:.2f} TFLOP"
          f" = {f_fwd/(batch*T/cfg.audio.sample_rate)/1e12:.3f}"
          f" TFLOP/audio-s), remat={'on' if remat_on else 'off'}")
    print("| Phase | ms | useful TF | exec TF | TF/s | exec util | "
          "useful MFU |")
    print("|---|---|---|---|---|---|---|")
    row("forward", t_fwd, f_fwd, f_fwd)
    row("forward+backward", t_fb, f_useful, f_exec)
    row("backward (delta)", t_fb - t_fwd, f_useful - f_fwd, f_exec - f_fwd)
    row("full step", t_full, f_useful, f_exec)
    print(f"| optimizer+metrics (delta) | {(t_full-t_fb)*1e3:8.1f} | "
          f"- | - | - | - | - |")
    xf = xla_flops(fwd, state.params, batches[0])
    print(f"# footnote: XLA cost_analysis fwd flops = {xf/1e12:.2f} TF "
          f"(MAC=1 convention; not comparable)", file=sys.stderr)

    print(json.dumps({
        "metric": "train_step_mfu",
        "value": round(f_useful / t_full / peak * 100, 1),
        "unit": "%",
        "vs_baseline": round(batch * T / t_full / (8 * 6400 / 0.324), 2),
    }))


if __name__ == "__main__":
    main()
