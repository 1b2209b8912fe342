"""Micro-bench: one block's reverse pair-flows through each kernel variant
at swept tile sizes, on the current backend.

Times the full set of n_flow/2 sequential pair applications (as the model
runs them) inside one jit, scalar-readback fenced.  Inputs are generated on
device.  The XLA pair-scan runs as the reference row.

Usage: python tools/bench_pair_kernel.py [block ...]
Env: BENCH_BATCH (96) | BENCH_SECONDS (4) | BENCH_ITERS (3)
     FWN_VARIANTS (comma list of xla,direct,wino,wino4,hoisted,hoisted4)
     FWN_TILES (comma list of t_tile values to sweep; 0 = full T)
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models import flowavenet as fwn
    from flowavenet_tpu.ops import pallas_flow as pf

    cfg = get_config("lj22k").model
    batch = int(os.environ.get("BENCH_BATCH", "96"))
    seconds = float(os.environ.get("BENCH_SECONDS", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    variants = os.environ.get(
        "FWN_VARIANTS", "xla,direct,wino,wino4,hoisted").split(",")
    tiles = [int(t) for t in os.environ.get("FWN_TILES", "0").split(",")]
    blocks = [int(a) for a in sys.argv[1:]] or [0]

    sr = 22050
    T_full = int(seconds * sr) // cfg.squeeze_factor * cfg.squeeze_factor

    for b in blocks:
        Tb = T_full // (2 ** (b + 1))
        r_in = 2 ** b                      # u/v channels (half of squeezed)
        cc_half = cfg.num_mels * (2 ** b)
        key = jax.random.PRNGKey(b)
        bp = fwn.init_block(key, 2 ** b, cfg.num_mels * (2 ** b), cfg, 0)
        # randomize so couplings are not identities
        leaves, treedef = jax.tree.flatten(bp)
        r = np.random.RandomState(7)
        bp = jax.tree.unflatten(
            treedef, [l + jnp.asarray(0.05 * r.randn(*l.shape), l.dtype)
                      for l in leaves])
        pp = fwn._pair_params(bp)
        n_pair = cfg.n_flow // 2
        print(f"# block {b}: T={Tb} r_in={r_in} cc_half={cc_half} "
              f"batch={batch}", flush=True)

        def timed(fn):
            t0 = time.time()
            float(fn(0))
            comp = time.time() - t0
            best = float("inf")
            for i in range(iters):
                t0 = time.time()
                float(fn(i + 1))
                best = min(best, time.time() - t0)
            return best, comp

        def inputs(seed):
            ks = jax.random.split(jax.random.PRNGKey(seed), 4)
            u = jax.random.normal(ks[0], (batch, Tb, r_in), jnp.bfloat16)
            v = jax.random.normal(ks[1], (batch, Tb, r_in), jnp.bfloat16)
            ca = jax.random.normal(ks[2], (batch, Tb, cc_half), jnp.bfloat16)
            cb = jax.random.normal(ks[3], (batch, Tb, cc_half), jnp.bfloat16)
            return u, v, ca, cb

        def run_variant(variant, t_tile):
            tt = t_tile if t_tile > 0 else Tb

            @jax.jit
            def f(seed):
                u, v, ca, cb = inputs(seed)
                if variant == "xla":
                    (u, v), _ = jax.lax.scan(
                        fwn._pair_step_rev(cfg, ca, cb, None, None), (u, v),
                        pp, reverse=True)
                elif variant in ("hoisted", "hoisted4"):
                    wino = variant == "hoisted4"
                    for i in reversed(range(n_pair)):
                        pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                        if wino:
                            o, (we, wo) = pf.pair_reverse_operands_wino4(
                                pair, dtype=jnp.bfloat16, hoisted=True)
                        else:
                            o, (we, wo) = pf.pair_reverse_operands_hoisted(
                                pair, dtype=jnp.bfloat16)
                        ce = jnp.dot(ca, we, preferred_element_type=
                                     jnp.float32).astype(jnp.bfloat16)
                        co = jnp.dot(cb, wo, preferred_element_type=
                                     jnp.float32).astype(jnp.bfloat16)
                        if wino:
                            u, v = pf.fused_pair_reverse_wino(
                                u, v, ce, co, o, phases=12, hoisted=True)
                        else:
                            u, v = pf.fused_pair_reverse(
                                u, v, ce, co, o, t_tile=tt, hoisted=True)
                else:
                    for i in reversed(range(n_pair)):
                        pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                        if variant == "direct":
                            o = pf.pair_reverse_operands(
                                pair, dtype=jnp.bfloat16)
                            u, v = pf.fused_pair_reverse(u, v, ca, cb, o,
                                                         t_tile=tt)
                        elif variant == "wino":
                            o = pf.pair_reverse_operands_wino(
                                pair, dtype=jnp.bfloat16)
                            u, v = pf.fused_pair_reverse_wino(u, v, ca, cb,
                                                              o)
                        elif variant == "wino4":
                            o = pf.pair_reverse_operands_wino4(
                                pair, dtype=jnp.bfloat16)
                            u, v = pf.fused_pair_reverse_wino(
                                u, v, ca, cb, o, phases=12)
                        else:
                            raise ValueError(variant)
                uf = u.astype(jnp.float32)
                return jnp.sum(uf * uf) + jnp.sum(v.astype(jnp.float32))

            return timed(f)

        for variant in variants:
            sweep = ([0] if variant == "xla" else tiles)
            for t_tile in sweep:
                # wino tile sizes are module constants
                if variant in ("wino", "wino4", "hoisted4") and t_tile > 0:
                    old6, old12 = pf.WINO_T_TILE, pf.WINO4_T_TILE
                    pf.WINO_T_TILE = pf.WINO4_T_TILE = t_tile
                try:
                    best, comp = run_variant(variant, t_tile)
                    print(f"  {variant:9s} tt={t_tile:<5d} "
                          f"{best * 1e3:8.1f} ms  (compile {comp:.0f}s)",
                          flush=True)
                except Exception as e:
                    msg = str(e).split("\n")[0][:140]
                    print(f"  {variant:9s} tt={t_tile:<5d}   FAIL: {msg}",
                          flush=True)
                finally:
                    if (variant in ("wino", "wino4", "hoisted4")
                            and t_tile > 0):
                        pf.WINO_T_TILE, pf.WINO4_T_TILE = old6, old12


if __name__ == "__main__":
    main()
