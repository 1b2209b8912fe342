"""Batch synthesis CLI: mel .npy dir -> .wav dir.

Reference surface: /root/reference/synthesize.py:10-63.  Additions over the
reference: optional batched synthesis (pad-to-bucket, batch>1), speaker-id
support (the reference CLI cannot pass g), bf16 compute, and RTF reporting.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.checkpoint import latest_checkpoint, restore_checkpoint
from ..config import Config, ModelConfig, get_config
from ..models.flowavenet import reverse
from ..training.train_state import create_state


@functools.lru_cache(maxsize=None)
def _jitted_reverse(model_cfg: ModelConfig, dt):
    """One jitted reverse per (model config, compute dtype); shapes are
    bucketed by the caller so the jit cache stays small.

    z and c are DONATED: both are dead after the pass's first ops (z is
    squeezed, c is upsampled), every caller builds them fresh per call,
    and together they are tens of MB x batch of HBM the pass can reuse
    (VERDICT r3: the b128 headline sweep died at the HBM ceiling with
    these buffers held live for nothing).  g is NOT donated — streaming
    callers upload it once and reuse it across windows."""
    def f(params, z, c, g=None):
        return reverse(params, model_cfg, z, c, g, compute_dtype=dt)
    return jax.jit(f, donate_argnums=(1, 2))


@functools.lru_cache(maxsize=None)
def _jitted_reverse_devnoise(model_cfg: ModelConfig, dt, hop: int,
                             pcm16: bool):
    """Reverse with the noise drawn ON DEVICE from per-row seeds/temps
    (threefry), instead of uploading a host-generated z.  Halves the
    per-batch host->device payload for the serving path — z is as large
    as the returned audio — at the cost of a DIFFERENT (still fully
    seed-deterministic) noise stream than the host RandomState one.

    ``pcm16`` additionally quantizes the audio to 16-bit PCM ON DEVICE
    (round-half-even, clipped) — the serving layer emits 16-bit WAV
    anyway, so this halves the device->host result bytes at zero loss
    relative to the served format."""
    def f(params, seeds, temps, c, g=None):
        T = c.shape[1] * hop

        def row(s, t):
            return jax.random.normal(
                jax.random.PRNGKey(s), (T, 1), jnp.float32) * t

        z = jax.vmap(row)(seeds, temps)
        wav = reverse(params, model_cfg, z, c, g, compute_dtype=dt)
        if pcm16:
            wav = jnp.clip(jnp.round(wav.astype(jnp.float32) * 32768.0),
                           -32768, 32767).astype(jnp.int16)
        return wav
    # donate c (fresh per dispatch, dead after the upsample); seeds/temps
    # are tiny and g may be caller-reused — not donated
    return jax.jit(f, donate_argnums=(3,))


@functools.lru_cache(maxsize=None)
def _jitted_reverse_posnoise(model_cfg: ModelConfig, dt, hop: int,
                             pcm16: bool, keep: int | None = None):
    """Reverse with POSITIONAL device noise: z for absolute mel frame f
    is ``normal(fold_in(PRNGKey(seed), f)) * temp`` — a pure function of
    (seed, absolute position), NOT of the window that computes it.
    Overlapping halo windows therefore see identical noise in their
    shared receptive fields, so chunked synthesis stays SEAMLESS and the
    audio is invariant to the chunk plan entirely (asserted in
    tests/test_streaming.py), while the z upload — as large as the audio
    itself — disappears.  A different (still fully seed-deterministic)
    stream than the host RandomState one, exactly like the serving
    path's per-row device noise (_jitted_reverse_devnoise).

    Rows carry their window's first absolute frame ``w0``; ``pcm16``
    quantizes on device as in the serving path (halves readback).

    ``keep`` (static, samples) trims each row's halo ON DEVICE: the fn
    gains a per-row start-sample arg ``k0s`` and returns
    ``[rows, keep, 1]`` — only each window's CENTER crosses the wire,
    cutting readback by the window/chunk overlap ratio (the halo is
    context, never output).  Callers must pre-clamp k0 to
    ``W*hop - keep`` (lax.dynamic_slice clamps silently, which would
    shift the content)."""
    def f(params, seed, w0s, temps, c, g=None, k0s=None):
        if keep is not None and k0s is None:
            # caught at trace time — vmapping dynamic_slice over None
            # would otherwise raise an opaque tree-structure error
            raise ValueError("keep (device-side halo trim) requires "
                             "per-row start samples k0s")
        W = c.shape[1]

        def row(w0, t):
            def frame(i):
                k = jax.random.fold_in(jax.random.PRNGKey(seed), w0 + i)
                return jax.random.normal(k, (hop,), jnp.float32) * t
            return jax.vmap(frame)(jnp.arange(W)).reshape(W * hop, 1)

        z = jax.vmap(row)(w0s, temps)
        wav = reverse(params, model_cfg, z, c, g, compute_dtype=dt)
        if keep is not None:
            wav = jax.vmap(
                lambda w, k0: jax.lax.dynamic_slice_in_dim(w, k0, keep))(
                    wav, k0s)
        if pcm16:
            wav = jnp.clip(jnp.round(wav.astype(jnp.float32) * 32768.0),
                           -32768, 32767).astype(jnp.int16)
        return wav
    # donate c only: seed/w0s/temps/k0s are tiny, and the time-parallel
    # caller reuses seed_arr/temps/g device arrays across passes
    return jax.jit(f, donate_argnums=(4,))


@functools.lru_cache(maxsize=None)
def _jitted_reverse_trim(model_cfg: ModelConfig, dt, keep: int):
    """Reverse that returns only ``[B, keep, 1]`` starting at sample
    ``k0`` (traced scalar): the streaming path's halo is context, not
    output, so trimming it ON DEVICE cuts the result readback by the
    window/chunk overlap ratio (2x at the TTFA-default plan).  The
    caller pre-clamps k0 so the slice is in bounds — dynamic_slice
    clamps silently, which would shift the content."""
    def f(params, z, c, g=None, k0=0):
        wav = reverse(params, model_cfg, z, c, g, compute_dtype=dt)
        return jax.lax.dynamic_slice_in_dim(wav, k0, keep, axis=1)
    # donate the per-window z/c (fresh uploads every window); g is
    # uploaded once by stream_reverse and reused — not donated
    return jax.jit(f, donate_argnums=(1, 2))


def resolve_compute_dtype(cfg: Config, compute_dtype=None):
    """The dtype synthesis will actually run in: an explicit request wins,
    else cfg.train.compute_dtype decides."""
    if compute_dtype is not None:
        return jnp.dtype(compute_dtype)
    return (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
            else jnp.float32)


def load_params(saved_dir: str, cfg: Config, compute_dtype=None):
    """Restore model params from the newest train checkpoint
    (synthesize.py:29-37).

    When inference computes in bf16, the tree is cast ONCE here: a
    resident fp32 master tree costs 362 MB of HBM for nothing at the
    flagship size (weight-norm folding still runs in fp32 on the bf16
    leaves), which at large synthesis batches is the difference between
    fitting and OOM (docs/benchmarks.md).  ``compute_dtype`` overrides the
    config — a caller that will synthesize in fp32 keeps fp32 weights even
    when cfg.train.compute_dtype is bfloat16."""
    ckpt = latest_checkpoint(saved_dir)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint found in {saved_dir}")
    print(f"Loading checkpoint {ckpt}")
    template = create_state(jax.random.PRNGKey(0), cfg)
    state, step = restore_checkpoint(ckpt, template)
    params = state.params
    if resolve_compute_dtype(cfg, compute_dtype) == jnp.bfloat16:
        params = jax.tree.map(lambda l: l.astype(jnp.bfloat16), params)
    return params, step


def _usable_frames(frames: int, cfg: Config) -> int:
    """Largest frame count whose audio length divides 2**n_block."""
    sq = cfg.model.squeeze_factor
    hop = cfg.audio.hop_size
    while frames > 0 and (frames * hop) % sq != 0:
        frames -= 1
    return frames


def padded_frames(frames: int, cfg: Config, bucket_frames: int = 60) -> int:
    """Bucketed padded frame count a mel of ``frames`` usable frames will
    synthesize at: rounded up to ``bucket_frames`` (so repeated calls reuse
    compiled shapes) then to squeeze-factor alignment.  Shared by the batch
    CLI and the serving batcher — the bucket key MUST be this exact value
    or batch grouping and the compiled-shape cache drift apart."""
    pad = frames
    if bucket_frames > 1:
        pad = -(-pad // bucket_frames) * bucket_frames
    hop = cfg.audio.hop_size
    while (pad * hop) % cfg.model.squeeze_factor != 0:
        pad += 1
    return pad


def dispatch_mels(params, cfg: Config, mels: list[np.ndarray],
                  seed: int | list[int] = 0, speaker_ids=None,
                  compute_dtype=None,
                  temp: float | list[float] | None = None,
                  bucket_frames: int = 60,
                  pad_batch: bool = False,
                  noise: str = "host",
                  pcm16: bool = False,
                  data_sharding=None,
                  batch_multiple: int = 1):
    """Asynchronously dispatch one batched reverse pass; returns
    ``(wav_device_array, frames)`` WITHOUT blocking on the device.

    The caller materializes audio with :func:`materialize_wavs` — keeping
    the two halves separate lets a serving worker prepare and dispatch
    batch k+1 while batch k still computes and its result streams back
    (serving/server.py pipelines exactly this way).

    ``noise='device'`` draws each row's z on device from its seed
    (threefry) instead of uploading host RandomState noise — a different
    but equally seed-deterministic stream, and half the upload bytes.
    ``pcm16`` (device-noise path only) quantizes to 16-bit PCM on device,
    halving the result readback; rows come back int16.

    ``data_sharding`` (a ``NamedSharding`` over a data-parallel mesh axis)
    batch-parallelizes the reverse across devices: every batch-leading
    input lands sharded and GSPMD partitions the SAME jitted reverse —
    params should already be placed with ``parallel.param_sharding``.
    ``batch_multiple`` rounds the (possibly pow2-padded) row count up to
    a multiple of the mesh's data extent so every device gets whole rows.
    """
    if noise not in ("host", "device"):
        raise ValueError(f"noise must be 'host' or 'device', got {noise!r}")
    if pcm16 and noise != "device":
        raise ValueError("pcm16=True requires noise='device'")
    dt = resolve_compute_dtype(cfg, compute_dtype)
    n = len(mels)
    seeds = [seed + i for i in range(n)] if isinstance(seed, int) else seed
    if temp is None or isinstance(temp, (int, float)):
        t0 = cfg.train.temp if temp is None else float(temp)
        temps = [t0] * n
    else:
        temps = [cfg.train.temp if t is None else float(t) for t in temp]
    if len(seeds) != n or len(temps) != n:
        raise ValueError(f"need {n} seeds/temps, got {len(seeds)}/{len(temps)}")

    hop = cfg.audio.hop_size
    frames = [_usable_frames(m.shape[0], cfg) for m in mels]
    pad_frames = padded_frames(max(frames), cfg, bucket_frames)

    n_rows = 1 << (n - 1).bit_length() if pad_batch else n
    if batch_multiple > 1:
        n_rows = -(-n_rows // batch_multiple) * batch_multiple
    batch = np.zeros((n_rows, pad_frames, cfg.audio.num_mels), np.float32)
    for i, m in enumerate(mels):
        batch[i, : frames[i]] = m[: frames[i]]
    if dt == jnp.bfloat16:
        # reverse()'s first op casts c (and z) to the compute dtype on
        # device; casting on host FIRST is bit-identical (numpy/ml_dtypes
        # and XLA both round-to-nearest-even, tests/test_synthesize.py::
        # test_bf16_upload_bit_identical) and halves the dominant
        # host->device transfer — on tunnel/PCIe-attached chips the
        # serving pipeline's host-prep stage is what caps max_batch
        # (docs/benchmarks.md serving table).
        batch = batch.astype(jnp.bfloat16)

    if data_sharding is None:
        put = jnp.asarray
    else:
        def put(a):
            return jax.device_put(np.asarray(a), data_sharding)

    g = None
    if cfg.model.gin_channels > 0 and speaker_ids is not None:
        g = np.zeros((n_rows,), np.int32)
        g[:n] = np.asarray(speaker_ids, np.int32)
        g = put(g)

    if noise == "device":
        s_arr = np.zeros((n_rows,), np.uint32)
        t_arr = np.zeros((n_rows,), np.float32)
        # mod, not dtype-cast: arbitrary Python ints must keep working
        # exactly like the host path's `s % 2**32` (overflow-free)
        s_arr[:n] = [s % (2 ** 32) for s in seeds]
        t_arr[:n] = temps
        wav = _jitted_reverse_devnoise(cfg.model, dt, hop, pcm16)(
            params, put(s_arr), put(t_arr), put(batch), g)
    else:
        z = np.zeros((n_rows, pad_frames * hop, 1), np.float32)
        for i, (s, t) in enumerate(zip(seeds, temps)):
            z[i, :, 0] = np.random.RandomState(s % (2 ** 32)).randn(
                pad_frames * hop) * t
        if dt == jnp.bfloat16:  # same bit-identical pre-cast as the mels
            z = z.astype(jnp.bfloat16)
        wav = _jitted_reverse(cfg.model, dt)(
            params, put(z), put(batch), g)
    return wav, frames


def _sharded_keep(n_real: int, batch: int, shard_rows: int) -> int:
    """Pad rows to keep on device when the batch axis is sharded: the
    real-row count rounded UP to the per-shard row extent (a finer device
    slice would force a cross-device reshard just to drop pad rows)."""
    return min(-(-n_real // shard_rows) * shard_rows, batch)


def materialize_wavs(wav, frames, cfg: Config) -> list[np.ndarray]:
    """Block on a :func:`dispatch_mels` result and crop each row back to
    its true length.  Rows are float32, or int16 when the dispatch used
    ``pcm16=True`` (the bytes come back already PCM-quantized).

    Zero-padded batch rows (``pad_batch`` / ``batch_multiple`` round the
    row count up, 2x worst case) are sliced off ON DEVICE before the
    transfer — only real rows cross the wire.  Row counts are bounded by
    the pow2 bucketing, so the per-count slice kernels stay few.  When
    the batch axis is sharded (multi-device serving), the device slice
    is rounded UP to the shard extent — a finer cut would force a
    cross-device reshard just to drop pad rows; the remainder is cropped
    by the per-row host slices below."""
    hop = cfg.audio.hop_size
    n_keep = len(frames)
    shard0 = getattr(wav, "sharding", None)
    if shard0 is not None and not shard0.is_fully_replicated:
        n_keep = _sharded_keep(n_keep, wav.shape[0],
                               shard0.shard_shape(wav.shape)[0])
    if wav.shape[0] > n_keep:
        wav = wav[:n_keep]
    if wav.dtype == jnp.int16:
        wav = np.asarray(wav)
    else:
        wav = np.asarray(wav.astype(jnp.float32))
    return [wav[i, : frames[i] * hop, 0] for i in range(len(frames))]


def synthesize_mels(params, cfg: Config, mels: list[np.ndarray],
                    seed: int | list[int] = 0, speaker_ids=None,
                    compute_dtype=None,
                    temp: float | list[float] | None = None,
                    bucket_frames: int = 60,
                    pad_batch: bool = False,
                    noise: str = "host",
                    pcm16: bool = False) -> list[np.ndarray]:
    """Synthesize a list of [T_mel, num_mels] mels; returns float32 wavs
    (int16 with ``pcm16=True`` — see :func:`dispatch_mels`).

    Mels are padded to the longest item (rounded up to ``bucket_frames`` so
    repeated calls reuse compiled shapes) and batched through one jitted
    reverse pass; outputs are cropped back to each true length.

    ``pad_batch=True`` additionally pads the BATCH dimension up to the next
    power of two (zero rows, cropped from the output), so the set of
    compiled batch shapes is {1,2,4,...} instead of every group size a
    caller happens to produce.  The serving worker relies on this: its
    micro-batch sizes fluctuate with load, and an un-bucketed batch dim
    would recompile the flagship reverse (minutes) on each new size for at
    most 2x padding compute.

    ``seed`` / ``temp`` may be per-item lists: each item's noise is drawn
    from its OWN seed at the padded length, so an item's audio depends only
    on (mel, seed, temp, padded length, noise mode) — never on its batch
    companions.  A scalar seed expands to ``seed + i`` per item so batch
    rows still get distinct noise.  ``noise``: see :func:`dispatch_mels`.
    """
    wav, frames = dispatch_mels(
        params, cfg, mels, seed=seed, speaker_ids=speaker_ids,
        compute_dtype=compute_dtype, temp=temp,
        bucket_frames=bucket_frames, pad_batch=pad_batch, noise=noise,
        pcm16=pcm16)
    return materialize_wavs(wav, frames, cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(description="FloWaveNet-TPU synthesis")
    parser.add_argument("--saved_dir", default="logs/pretrained/")
    parser.add_argument("--mels_dir", default="mels/")
    parser.add_argument("--output_dir", default="output/")
    parser.add_argument("--config", default="lj22k")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="mels synthesized per reverse pass")
    parser.add_argument("--temp", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bucket_frames", type=int, default=60,
                        help="pad mel lengths up to multiples of this so "
                             "batches reuse compiled shapes")
    parser.add_argument("--stream", action="store_true",
                        help="chunked streaming synthesis (streaming.py): "
                             "one compiled window shape for ANY length, "
                             "bounded memory; exact vs one-shot")
    parser.add_argument("--chunk_frames", type=int, default=None,
                        help="--stream / --time_parallel window advance, "
                             "in mel frames")
    parser.add_argument("--time_parallel", type=int, default=0,
                        help="sequence-parallel long-form synthesis: "
                             "batch each utterance's halo windows and "
                             "shard them over N devices (-1: all). "
                             "Exact vs --stream; bounded memory; "
                             "one-shot batch throughput per utterance")
    args = parser.parse_args(argv)
    if args.stream and args.time_parallel:
        parser.error("--stream and --time_parallel are exclusive")

    cfg = get_config(args.config)
    params, step = load_params(args.saved_dir, cfg)
    os.makedirs(args.output_dir, exist_ok=True)

    tp_sharding, tp_multiple = None, 1
    if args.time_parallel:
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import make_mesh, param_sharding
        n = (len(jax.devices()) if args.time_parallel < 0
             else args.time_parallel)
        if n > 1:
            mesh = make_mesh(dataclasses.replace(
                cfg.mesh, data_parallel=n, model_parallel=1))
            params = jax.device_put(
                params, param_sharding(params, mesh, cfg.mesh))
            tp_sharding = NamedSharding(mesh,
                                        PartitionSpec(cfg.mesh.data_axis))
            tp_multiple = n

    from ..audio.wavio import write_wav

    names = sorted(f for f in os.listdir(args.mels_dir)
                   if f.endswith(".npy"))
    if not names:
        raise FileNotFoundError(f"no .npy mels in {args.mels_dir}")
    total_samples, total_time = 0, 0.0
    for i in range(0, len(names), args.batch_size):
        chunk = names[i : i + args.batch_size]
        mels = [np.load(os.path.join(args.mels_dir, n)) for n in chunk]
        t0 = time.time()
        if args.stream:
            from .streaming import synthesize_streaming
            wavs = [synthesize_streaming(
                        params, cfg, m.astype(np.float32),
                        seed=args.seed + i + j, temp=args.temp,
                        chunk_frames=args.chunk_frames)
                    for j, m in enumerate(mels)]
        elif args.time_parallel:
            from .streaming import synthesize_time_parallel
            wavs = [synthesize_time_parallel(
                        params, cfg, m.astype(np.float32),
                        seed=args.seed + i + j, temp=args.temp,
                        chunk_frames=args.chunk_frames,
                        data_sharding=tp_sharding,
                        batch_multiple=tp_multiple)
                    for j, m in enumerate(mels)]
        else:
            wavs = synthesize_mels(params, cfg, mels, seed=args.seed + i,
                                   temp=args.temp,
                                   bucket_frames=args.bucket_frames)
        dt = time.time() - t0
        for n, w in zip(chunk, wavs):
            write_wav(os.path.join(args.output_dir, n[:-4] + ".wav"), w,
                      cfg.audio.sample_rate)
            total_samples += len(w)
        total_time += dt
        print(f"[{i + len(chunk)}/{len(names)}] {dt:.3f}s")
    rtf = total_samples / cfg.audio.sample_rate / max(total_time, 1e-9)
    print(f"Synthesized {total_samples / cfg.audio.sample_rate:.1f}s of "
          f"audio in {total_time:.2f}s — {rtf:.1f}x real-time "
          f"(incl. compile)")


if __name__ == "__main__":
    main()
