"""Train-step speed-of-light accounting (VERDICT r3 item 1).

Times three nested jits on device-generated batches — forward-only
(loss_fn), forward+backward (value_and_grad), and the FULL train step
(grads + clip + Adam + metrics) — and reads each program's FLOPs from
XLA's own cost analysis, so the published MFU numbers use the
compiler's op count, not a hand model.  Prints a markdown table for
docs/benchmarks.md plus one JSON line.

Definitions:
  useful FLOPs = the fwd+bwd program's XLA flops WITHOUT remat recompute
                 (measured by compiling the model with remat disabled —
                 same math, no recompute in the HLO);
  executed     = the as-run program's flops (remat recompute included);
  MFU          = useful / time / peak;  executed util = executed / time / peak.

Env knobs: BENCH_BATCH (128) | BENCH_CONFIG (lj22k) | BENCH_ITERS (4)
         | BENCH_PEAK_TFLOPS (197 — v5e bf16)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    step_full = jax.jit(make_train_step(cfg))

    def flops_of(fn, *args):
        try:
            c = jax.jit(fn).lower(*args).compile()
            ca = c.cost_analysis()
            return float((ca or {}).get("flops", float("nan")))
        except Exception as e:  # cost analysis can be backend-dependent
            print(f"# cost_analysis failed: {e}", file=sys.stderr)
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

    # useful-FLOP reference: same program, remat off (no recompute in HLO)
    cfg_norem = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=False))

    def fwdbwd_norem(params, b):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg_norem.model, b["audio"], b["mel"],
                              None, compute_dtype=dt), has_aux=True)(params)
        return loss, jax.tree.reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l).astype(jnp.float32)),
            grads, jnp.asarray(0.0, jnp.float32))

    f_fwd = flops_of(fwd, state.params, batches[0])
    f_fb = flops_of(fwdbwd, state.params, batches[0])
    f_useful = flops_of(fwdbwd_norem, state.params, batches[0])

    t_fwd = timeit(fwd, "forward")
    t_fb = timeit(fwdbwd, "forward+backward")

    # full step (donated state; time includes optimizer + metrics)
    t0 = time.time()
    st, m = step_full(state, batches[0])
    jax.block_until_ready(m["loss"])
    print(f"# full step: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    times = []
    for i in range(iters):
        t0 = time.time()
        st, m = step_full(st._replace(step=st.step * 0), batches[i + 1])
        jax.block_until_ready(m["loss"])
        times.append(time.time() - t0)
    t_full = min(times)

    def row(name, t, fl, useful):
        tf = fl / t / 1e12 if fl == fl else float("nan")
        mfu = useful / t / peak * 100 if useful == useful else float("nan")
        ex = fl / t / peak * 100 if fl == fl else float("nan")
        print(f"| {name} | {t*1e3:8.1f} | {fl/1e12:7.2f} | {tf:6.1f} | "
              f"{ex:5.1f}% | {mfu:5.1f}% |")

    print(f"\nb{batch} x {T} crop, peak {peak/1e12:.0f} TFLOP/s "
          f"(bf16), XLA-counted FLOPs")
    print("| Phase | ms | TFLOP (executed) | TFLOP/s | exec util | "
          "useful MFU |")
    print("|---|---|---|---|---|---|")
    row("forward", t_fwd, f_fwd, f_fwd)  # fwd has no recompute
    row("forward+backward", t_fb, f_fb, f_useful)
    row("backward (delta)", t_fb - t_fwd, f_fb - f_fwd, f_useful - f_fwd)
    row("full step", t_full, f_fb, f_useful)
    print(f"| optimizer+metrics (delta) | {(t_full-t_fb)*1e3:8.1f} | "
          f"- | - | - | - |")

    print(json.dumps({
        "metric": "train_step_mfu",
        "value": round(f_useful / t_full / peak * 100, 1),
        "unit": "%",
        "vs_baseline": round(batch * T / t_full / (8 * 6400 / 0.324), 2),
    }))


if __name__ == "__main__":
    main()
