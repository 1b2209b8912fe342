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
import contextlib
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.checkpoint import (latest_checkpoint, read_meta,
                                     restore_checkpoint, save_checkpoint)
from ..config import Config, get_config
from ..data.dataset import CropDataset
from ..data.records import FwRecordReader
from ..parallel.mesh import batch_sharding, make_mesh, param_sharding
from ..parallel.multihost import (host_batch_slice, initialize_distributed,
                                  make_global_batch, put_tree)
from .metrics import MetricsWriter, format_step
from .train_state import (TrainState, create_state, ddi_initialize,
                          make_eval_step, make_train_step)


@contextlib.contextmanager
def _restore_sigterm(prev_handler):
    """Reinstate the pre-train() SIGTERM disposition on ANY exit —
    a crashed run must not leave the process swallowing SIGTERM."""
    try:
        yield
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


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
          allow_loader_switch: bool = False,
          tensorboard: bool = False, profile_steps: int = 0,
          log_every: int = 50) -> str:
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

    # Multi-host input path: every process computes the same global batch
    # deterministically (counter-based sampling), keeps only its own rows,
    # and assembles the global sharded arrays from process-local data —
    # a plain device_put of the global batch is wrong on a pod
    # (/root/reference/train.py:42-55 rebuild; SURVEY §5.8).
    rows = host_batch_slice(global_batch)

    def put_batch(b):
        local = {k: v[rows] for k, v in b.items()} \
            if jax.process_count() > 1 else b
        return make_global_batch(local, b_sharding)

    # ---- restore or DDI-init (train.py:211-230) -------------------------
    start_step = 0
    ckpt = latest_checkpoint(save_dir) if restore else None
    if ckpt is not None:
        print(f"Loading checkpoint {ckpt}")
        # The python and native loaders are each deterministic but use
        # different PRNGs (Philox vs splitmix64): switching loaders mid-run
        # silently changes the data stream, so refuse unless asked.
        ckpt_loader = read_meta(ckpt).get("loader")
        if ckpt_loader is not None and ckpt_loader != loader:
            if allow_loader_switch:
                print(f"WARNING: resuming a --loader={ckpt_loader} run with "
                      f"--loader={loader}; the data stream will differ")
            else:
                raise ValueError(
                    f"checkpoint {ckpt} was trained with --loader="
                    f"{ckpt_loader} but this run uses --loader={loader}; "
                    f"their PRNGs differ so the data stream would silently "
                    f"change. Pass --allow_loader_switch to proceed.")
        state, start_step = restore_checkpoint(ckpt, state)
        state = TrainState(jnp.asarray(start_step, jnp.int32), state.params,
                           state.opt_state)
    else:
        print("Init ActNorm layers (DDI)...", end="", flush=True)
        # DDI on the full global batch on every process (identical stats
        # everywhere, so params stay replicated-consistent)
        state = ddi_initialize(state, cfg, dataset.batch_at(0))
        print(" OK")
    state = put_tree(state, st_sharding)

    train_step = jax.jit(make_train_step(cfg), donate_argnums=0,
                         in_shardings=(st_sharding, b_sharding),
                         out_shardings=(st_sharding, None))
    eval_step = jax.jit(make_eval_step(cfg))

    # Preemption: SIGTERM (what TPU maintenance / batch schedulers send)
    # finishes the in-flight step, checkpoints, and exits cleanly — the
    # deterministic-resume machinery then continues the run bit-exactly.
    # Signal handlers only install from the main thread; library callers
    # on worker threads keep default delivery.  On a pod the scheduler
    # signals every process, so each breaks at the same step boundary.
    preempt = threading.Event()
    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        prev_handler = signal.signal(
            signal.SIGTERM, lambda signum, frame: preempt.set())

    # ---- loop (train.py:233-257) ---------------------------------------
    # The loop runs ASYNCHRONOUSLY between sync points: train_step and
    # put_batch only dispatch, and the python counter (not a device
    # readback) tracks the step, so upload of batch k+1 overlaps device
    # compute of batch k.  Every host readback through this environment's
    # tunnel costs a full round trip PER SCALAR — the original
    # per-step console line (a handful of float()s each iteration)
    # measured ~2x on the whole train step (206 -> ~105 ms/step at the
    # reference b8 config).  All host reads now happen in ONE batched
    # device_get at heartbeat/summary/checkpoint steps, which also
    # bounds host run-ahead to ``log_every`` dispatched steps.
    with mesh, _restore_sigterm(prev_handler):
        step = start_step
        data_iter = dataset.iterate(start_step=start_step)
        profiling = False
        win_t0, win_steps = time.time(), 0
        while step < train_steps:
            if profile_steps and step == start_step + 1 and not profiling:
                # skip the compile step, then trace a few steady-state steps
                jax.profiler.start_trace(os.path.join(logdir, "profile"))
                profiling = True
            batch = put_batch(next(data_iter))
            state, metrics = train_step(state, batch)
            step += 1
            win_steps += 1
            if profiling and step >= start_step + 1 + profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                print(f"\nprofile trace written to {logdir}/profile")

            # one preempt read per iteration: a signal landing between a
            # split checkpoint-check and break-check would exit WITHOUT
            # saving.  Acting on it waits at most the in-flight window.
            preempted = preempt.is_set()
            summarize = step % summary_interval == 0 or step == 1
            ckpt_due = (step % checkpoint_interval == 0
                        or step == train_steps or preempted)
            probe_due = (probe_synthesis and step % eval_interval == 0
                         and jax.process_index() == 0)
            if not (step % log_every == 0 or summarize or ckpt_due
                    or probe_due):
                continue

            # sync point: ONE batched readback of every metric
            metrics = {k: float(v)
                       for k, v in jax.device_get(metrics).items()}
            dt = (time.time() - win_t0) / max(win_steps, 1)
            win_t0, win_steps = time.time(), 0
            print(format_step(step, dt, metrics), end="\r")

            is_lead = jax.process_index() == 0
            if summarize:
                metrics["sec_per_step"] = dt
                metrics["samples_per_sec"] = (global_batch
                                              * dataset.time_crop / dt)
                if is_lead:
                    writer.scalars(step, metrics)
                    if tb is not None:
                        tb.scalars(step, metrics)
                if test_dataset is not None:
                    eval_batch = put_batch(test_dataset.batch_at(step))
                    eval_metrics = eval_step(state.params, eval_batch)
                    if is_lead:
                        test_writer.scalars(step, eval_metrics)
                print()

            if ckpt_due:
                # params/opt are replicated (or addressable-shard-complete
                # on a single host), so device_get is process-local; only
                # the lead process writes.
                if is_lead:
                    save_checkpoint(save_dir, step, jax.device_get(state),
                                    extra_meta={"loader": loader})

            if preempted:
                if profiling:
                    jax.profiler.stop_trace()
                print(f"\nSIGTERM: checkpointed step {step}, exiting "
                      "(resume restores this run bit-exactly)")
                break

            if probe_due:
                _synthesis_probe(state, cfg, data_dir, writer, step,
                                 tb=tb)
    print()
    return save_dir


def _synthesis_probe(state: TrainState, cfg: Config, data_dir: str,
                     writer: MetricsWriter, step: int,
                     tb=None) -> None:
    """In-training synthesis of a random test utterance (train.py:118-150).
    Unlike the reference, the sample is re-drawn every eval.  Goes through
    ``synthesize_mels`` so clip lengths are bucketed and the jitted reverse
    is shared across evals — a new clip length does NOT recompile."""
    from ..synthesis.synthesize import synthesize_mels

    path = os.path.join(data_dir, "test.fwrec")
    if not os.path.exists(path):
        path = os.path.join(data_dir, "train.fwrec")
    reader = FwRecordReader(path)
    rng = np.random.RandomState(cfg.train.seed + step)
    i = int(rng.randint(len(reader)))
    audio, mel, sid = reader.read(i)
    reader.close()

    max_frames = cfg.data.eval_max_time_steps // cfg.audio.hop_size
    frames = min(mel.shape[0], max_frames)
    sids = [sid] if cfg.model.gin_channels > 0 else None
    # On a pod the probe runs on the lead process only, so pull the
    # (replicated) params to host first — computing on the global arrays
    # from one process would require all processes to participate.
    params = jax.device_get(state.params) if jax.process_count() > 1 \
        else state.params
    wavs = synthesize_mels(params, cfg, [mel[:frames]],
                           seed=int(rng.randint(2 ** 31)),
                           speaker_ids=sids)
    writer.wav(step, "prediction", wavs[0], cfg.audio.sample_rate)
    writer.wav(step, "target", audio[: len(wavs[0])], cfg.audio.sample_rate)
    if tb is not None:  # TB audio summaries (reference train.py:142-150)
        tb.wav(step, "eval/prediction", wavs[0], cfg.audio.sample_rate)
        tb.wav(step, "eval/target", audio[: len(wavs[0])],
               cfg.audio.sample_rate)


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
    parser.add_argument("--allow_loader_switch", action="store_true",
                        help="resume a checkpoint trained with the other "
                             "--loader (the data stream WILL differ; their "
                             "PRNGs are not bit-compatible)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also mirror metrics into TB event files "
                             "(needs tensorflow)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="trace N steady-state steps with jax.profiler")
    parser.add_argument("--log_every", type=int, default=50,
                        help="console heartbeat + host-sync interval in "
                             "steps; each sync is one batched metric "
                             "readback (per-step readbacks through a "
                             "host<->device tunnel double the step time)")
    parser.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 for multi-host runs "
                             "(auto-detected on TPU pods; see "
                             "parallel/multihost.py)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() with "
                             "auto-detection (TPU pod environments)")
    args = parser.parse_args(argv)

    if args.distributed or args.coordinator_address is not None:
        initialize_distributed(args.coordinator_address,
                               args.num_processes, args.process_id)

    # Persistent compile cache: a preempted-and-resumed run (SIGTERM ->
    # checkpoint -> restart, the §5.3 elastic path) must not pay the full
    # multi-minute train-step compile twice.  Env vars win if set.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = get_config(args.config)
    data_dir = os.path.join(args.base_dir, args.data_dir)
    logdir = os.path.join(args.base_dir, args.logdir)
    os.makedirs(logdir, exist_ok=True)
    train(cfg, data_dir, logdir, restore=args.restore,
          train_steps=args.train_steps,
          summary_interval=args.summary_interval,
          checkpoint_interval=args.checkpoint_interval,
          eval_interval=args.eval_interval, loader=args.loader,
          allow_loader_switch=args.allow_loader_switch,
          tensorboard=args.tensorboard, profile_steps=args.profile_steps,
          log_every=args.log_every)


if __name__ == "__main__":
    main()
