"""Training orchestration CLI.

Reference surface: /root/reference/train.py:153-278.  TPU-native changes:
* SPMD over a (data, model) mesh instead of GPU towers (§2.5): batch sharded
  on 'data', params replicated (large cond convs optionally TP-sharded),
  gradient psum inserted by GSPMD over ICI.
* bf16 compute / fp32 state, no loss scaling.
* Deterministic resume: {params, opt_state, step} checkpoint + counter-based
  data sampling; restore-or-DDI logic mirrors train.py:211-230.
* Synthesis probe picks a fresh random test utterance per eval (the
  reference bakes one sample into the graph at build time, train.py:125).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.checkpoint import (latest_checkpoint, restore_checkpoint,
                                     save_checkpoint)
from ..config import Config, get_config
from ..data.dataset import CropDataset
from ..data.records import FwRecordReader
from ..models.flowavenet import reverse
from ..parallel.mesh import batch_sharding, make_mesh, param_sharding
from .metrics import MetricsWriter, format_step
from .train_state import (TrainState, create_state, ddi_initialize,
                          make_eval_step, make_train_step)


def state_sharding(state: TrainState, mesh, mesh_cfg):
    """Sharding pytree for the whole train state: params via the TP rules,
    optimizer moments follow their matching param leaves, scalars replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    params_sh = param_sharding(state.params, mesh, mesh_cfg)
    # adam mu/nu mirror the params tree leaf-for-leaf, so the same
    # shape-based rule shards them consistently; counters replicate.
    opt_sh = param_sharding(state.opt_state, mesh, mesh_cfg)
    return TrainState(step=rep, params=params_sh, opt_state=opt_sh)


def train(cfg: Config, data_dir: str, logdir: str, *, restore: bool = True,
          train_steps: int | None = None, summary_interval: int | None = None,
          checkpoint_interval: int | None = None,
          eval_interval: int | None = None, devices=None,
          probe_synthesis: bool = True, loader: str = "python",
          tensorboard: bool = False, profile_steps: int = 0) -> str:
    t_cfg = cfg.train
    train_steps = train_steps or t_cfg.train_steps
    summary_interval = summary_interval or t_cfg.summary_interval
    checkpoint_interval = checkpoint_interval or t_cfg.checkpoint_interval
    eval_interval = eval_interval or t_cfg.eval_interval

    save_dir = os.path.join(logdir, "pretrained")
    writer = MetricsWriter(os.path.join(logdir, "train"))
    test_writer = MetricsWriter(os.path.join(logdir, "test"))
    tb = None
    if tensorboard:
        from .tb_writer import maybe_tb_writer
        tb = maybe_tb_writer(os.path.join(logdir, "train"))
        if tb is None:
            print("tensorboard writer unavailable (no tensorflow); "
                  "JSONL metrics only")

    mesh = make_mesh(cfg.mesh, devices)
    n_data = mesh.shape[cfg.mesh.data_axis]
    global_batch = cfg.data.batch_size * n_data

    with_speaker = cfg.model.gin_channels > 0
    if loader == "native":
        from ..data.native_loader import NativeCropDataset as DatasetCls
    else:
        DatasetCls = CropDataset
    dataset = DatasetCls(
        os.path.join(data_dir, "train.fwrec"),
        hop_size=cfg.audio.hop_size, max_time_steps=cfg.data.max_time_steps,
        batch_size=global_batch, seed=t_cfg.seed, with_speaker=with_speaker)
    test_path = os.path.join(data_dir, "test.fwrec")
    test_dataset = CropDataset(
        test_path, hop_size=cfg.audio.hop_size,
        max_time_steps=cfg.data.max_time_steps, batch_size=global_batch,
        seed=t_cfg.seed + 1, with_speaker=with_speaker) \
        if os.path.exists(test_path) else None

    state = create_state(jax.random.PRNGKey(t_cfg.seed), cfg)
    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(state.params))
    print(f"Model: {n_params / 1e6:.1f} M params | mesh {dict(mesh.shape)} "
          f"| global batch {global_batch}")

    st_sharding = state_sharding(state, mesh, cfg.mesh)
    batch_keys = ("audio", "mel", "speaker") if with_speaker \
        else ("audio", "mel")
    b_sharding = batch_sharding(mesh, cfg.mesh, batch_keys)

    def put_batch(b):
        return {k: jax.device_put(v, b_sharding[k]) for k, v in b.items()}

    # ---- restore or DDI-init (train.py:211-230) -------------------------
    start_step = 0
    ckpt = latest_checkpoint(save_dir) if restore else None
    if ckpt is not None:
        print(f"Loading checkpoint {ckpt}")
        state, start_step = restore_checkpoint(ckpt, state)
        state = TrainState(jnp.asarray(start_step, jnp.int32), state.params,
                           state.opt_state)
    else:
        print("Init ActNorm layers (DDI)...", end="", flush=True)
        state = ddi_initialize(state, cfg, dataset.batch_at(0))
        print(" OK")
    state = jax.device_put(state, st_sharding)

    train_step = jax.jit(make_train_step(cfg), donate_argnums=0,
                         in_shardings=(st_sharding, b_sharding),
                         out_shardings=(st_sharding, None))
    eval_step = jax.jit(make_eval_step(cfg))

    # ---- loop (train.py:233-257) ---------------------------------------
    with mesh:
        step = start_step
        data_iter = dataset.iterate(start_step=start_step)
        profiling = False
        while step < train_steps:
            if profile_steps and step == start_step + 1 and not profiling:
                # skip the compile step, then trace a few steady-state steps
                jax.profiler.start_trace(os.path.join(logdir, "profile"))
                profiling = True
            t0 = time.time()
            batch = put_batch(next(data_iter))
            state, metrics = train_step(state, batch)
            step = int(state.step)
            dt = time.time() - t0
            if profiling and step >= start_step + 1 + profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                print(f"\nprofile trace written to {logdir}/profile")
            print(format_step(step, dt, metrics), end="\r")

            if step % summary_interval == 0 or step == 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["sec_per_step"] = dt
                metrics["samples_per_sec"] = (global_batch
                                              * dataset.time_crop / dt)
                writer.scalars(step, metrics)
                if tb is not None:
                    tb.scalars(step, metrics)
                if test_dataset is not None:
                    eval_batch = put_batch(test_dataset.batch_at(step))
                    test_writer.scalars(
                        step, eval_step(state.params, eval_batch))
                print()

            if step % checkpoint_interval == 0 or step == train_steps:
                save_checkpoint(save_dir, step, jax.device_get(state))

            if probe_synthesis and step % eval_interval == 0:
                _synthesis_probe(state, cfg, data_dir, writer, step)
    print()
    return save_dir


def _synthesis_probe(state: TrainState, cfg: Config, data_dir: str,
                     writer: MetricsWriter, step: int) -> None:
    """In-training synthesis of a random test utterance (train.py:118-150).
    Unlike the reference, the sample is re-drawn every eval."""
    path = os.path.join(data_dir, "test.fwrec")
    if not os.path.exists(path):
        path = os.path.join(data_dir, "train.fwrec")
    reader = FwRecordReader(path)
    rng = np.random.RandomState(cfg.train.seed + step)
    i = int(rng.randint(len(reader)))
    audio, mel, sid = reader.read(i)
    reader.close()

    max_frames = cfg.data.eval_max_time_steps // cfg.audio.hop_size
    sq = cfg.model.squeeze_factor
    frames = min(mel.shape[0], max_frames)
    # T = frames*hop must divide by 2**n_block
    while (frames * cfg.audio.hop_size) % sq != 0 and frames > 1:
        frames -= 1
    mel = mel[:frames][None]
    t = frames * cfg.audio.hop_size
    z = rng.randn(1, t, 1).astype(np.float32) * cfg.train.temp

    g = np.asarray([sid], np.int32) if cfg.model.gin_channels > 0 else None
    wav = reverse(state.params, cfg.model, jnp.asarray(z), jnp.asarray(mel),
                  g, compute_dtype=jnp.float32)
    writer.wav(step, "prediction", np.asarray(wav), cfg.audio.sample_rate)
    writer.wav(step, "target", audio[:t], cfg.audio.sample_rate)


def main(argv=None):
    parser = argparse.ArgumentParser(description="FloWaveNet-TPU training")
    parser.add_argument("--base_dir", default="")
    parser.add_argument("--data_dir", default="training_data",
                        help="dir with train.fwrec/test.fwrec (from "
                             "flowavenet-preprocess)")
    parser.add_argument("--logdir", default="logs")
    parser.add_argument("--config", default="lj22k")
    parser.add_argument("--restore", type=lambda s: s.lower() != "false",
                        default=True,
                        help="set False for a fresh run (reference "
                             "train.py:266)")
    parser.add_argument("--summary_interval", type=int, default=None)
    parser.add_argument("--checkpoint_interval", type=int, default=None)
    parser.add_argument("--eval_interval", type=int, default=None)
    parser.add_argument("--train_steps", type=int, default=None)
    parser.add_argument("--loader", choices=["python", "native"],
                        default="python",
                        help="host input pipeline: pure-python or the C++ "
                             "fwrec loader (native/)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also mirror metrics into TB event files "
                             "(needs tensorflow)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="trace N steady-state steps with jax.profiler")
    args = parser.parse_args(argv)

    cfg = get_config(args.config)
    data_dir = os.path.join(args.base_dir, args.data_dir)
    logdir = os.path.join(args.base_dir, args.logdir)
    os.makedirs(logdir, exist_ok=True)
    train(cfg, data_dir, logdir, restore=args.restore,
          train_steps=args.train_steps,
          summary_interval=args.summary_interval,
          checkpoint_interval=args.checkpoint_interval,
          eval_interval=args.eval_interval, loader=args.loader,
          tensorboard=args.tensorboard, profile_steps=args.profile_steps)


if __name__ == "__main__":
    main()
