"""Exact chunked / streaming synthesis.

The reverse pass is a finite-receptive-field convolutional map: ActNorms
are pointwise in time, every coupling net is a stack of dilated convs,
squeeze/change_order are local reshapes, and nothing normalizes across
the full sequence.  Audio sample t therefore depends on (z, mel) only
within a window whose one-sided extent is computable from the config
(:func:`reverse_halo`).  That makes EXACT streaming possible — something
the reference's one-shot synthesize.py (synthesize.py:10-49) cannot do:

* slide a fixed-size window over the utterance, synthesize each window,
  and keep only the center — interior samples match the full-utterance
  reverse to compiled-shape numerics (tests/test_streaming.py asserts
  bit-equality on TPU-shaped CPU runs at tolerance 0).  That exactness
  statement is about the quality-exact route; the int8 kernel route
  (FWN_INT8, TPU default) computes max-abs activation scales over
  window/tile extents, so a streamed window's codes can differ from the
  full-length run's — a deviation measured at the bf16
  reduction-reorder noise floor (docs/benchmarks.md int8 gate), not an
  audible seam;
* ONE compiled shape serves ANY utterance length (no length buckets at
  all), and HBM stays bounded by the window, not the utterance;
* time-to-first-audio is one window's synthesis, independent of total
  length — the streaming-TTS latency metric.

Receptive-field accounting (one-sided, in audio samples):

* block b runs at 2^(b+1) audio samples per squeezed step (each block
  squeezes time by 2 on entry);
* one flow's coupling net: front conv (kernel 3, one-sided extent 1)
  plus n_layer dilated convs (kernel 3, dilation 3^i → extent 3^i),
  so  rf_flow = 1 + (3^n_layer - 1) / 2  squeezed steps;
* per block: n_flow * rf_flow squeezed steps; summed over blocks:
  halo = n_flow * rf_flow * (2^(n_block+1) - 2)  audio samples.

The conditioning path adds the upsampler's reach on the mel side: each
Conv2DTranspose(kernel 2s, stride s, SAME) reads <=1 neighbor frame per
level (models/upsample.py), bounded by +4 mel frames total.

Windows must start at absolute positions that are multiples of the
squeeze factor so the chunk's squeeze grouping matches the full-length
one; :func:`plan_chunks` rounds the halo up to make every window
aligned.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from .synthesize import (_jitted_reverse, _jitted_reverse_trim,
                         _usable_frames, resolve_compute_dtype)


def reverse_halo(m: ModelConfig) -> int:
    """One-sided receptive-field extent of reverse() in AUDIO samples
    (z and upsampled-conditioning reach; mel-frame reach is this / hop
    plus the upsampler's own +4 frames).

    Causal convs left-pad the FULL kernel extent (2*d per conv,
    ops/conv.py) instead of d per side, so their one-sided reach — all
    of it to the left — is exactly twice the symmetric case; the
    symmetric window then over-covers on the right, which costs a little
    compute but keeps exactness."""
    rf_flow = 1 + (3 ** m.n_layer - 1) // 2
    if m.causal:
        rf_flow *= 2
    return m.n_flow * rf_flow * (2 ** (m.n_block + 1) - 2)


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Static geometry of a streaming run: every window is the same
    shape, so the jitted reverse compiles exactly once."""
    chunk_frames: int      # mel frames of NEW audio per chunk
    halo_frames: int       # one-sided context frames (aligned)
    window_frames: int     # chunk_frames + 2 * halo_frames
    n_chunks: int
    total_frames: int      # usable frames of the utterance


def plan_chunks(cfg: Config, mel_frames: int,
                chunk_frames: Optional[int] = None,
                halo_frames: Optional[int] = None) -> ChunkPlan:
    """Choose an aligned (chunk, halo) geometry for an utterance.

    Both the chunk and the halo are rounded so that frames * hop is a
    multiple of the squeeze factor — then every window start k*chunk -
    halo is aligned and the window's squeeze grouping matches the
    full-utterance one (exactness requirement, see module docstring).
    """
    if chunk_frames is not None and chunk_frames <= 0:
        raise ValueError(f"chunk_frames must be positive, got {chunk_frames}")
    if halo_frames is not None and halo_frames < 0:
        raise ValueError(f"halo_frames must be >= 0, got {halo_frames}")
    hop = cfg.audio.hop_size
    sq = cfg.model.squeeze_factor
    align = sq // math.gcd(sq, hop)  # frames per aligned boundary

    total = _usable_frames(mel_frames, cfg)
    if halo_frames is None:
        halo_frames = -(-reverse_halo(cfg.model) // hop) + 4
    halo_frames = -(-halo_frames // align) * align
    if chunk_frames is None:
        chunk_frames = max(2 * halo_frames, 4 * align)
    chunk_frames = -(-chunk_frames // align) * align
    window = chunk_frames + 2 * halo_frames
    if window >= total:
        # utterance fits one window: a single full-length "chunk"
        return ChunkPlan(total, 0, total, 1, total)
    n_chunks = -(-total // chunk_frames)
    return ChunkPlan(chunk_frames, halo_frames, window, n_chunks, total)


def stream_reverse(params, cfg: Config, mel: np.ndarray,
                   seed: int = 0, temp: Optional[float] = None,
                   chunk_frames: Optional[int] = None,
                   halo_frames: Optional[int] = None,
                   compute_dtype=None,
                   speaker_id: Optional[int] = None,
                   put=None,
                   ) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(start_sample, float32 audio chunk)`` pairs for one
    [T_mel, num_mels] mel, left to right, exactly reproducing the
    full-utterance reverse for the same (seed, temp).

    The noise is the SAME full-length host RandomState stream the
    offline path draws (one sequential generation, sliced per window),
    so concatenating the chunks is bit-comparable to
    ``synthesize_mels(..., bucket_frames=1)`` on an aligned length.

    ``put`` (optional callable) is applied to every device input before
    the jitted call — serving uses it to replicate batch-1 windows onto
    a multi-device mesh whose params are already placed there (mixed
    placements would otherwise fail to dispatch).
    """
    if mel.ndim != 2 or mel.shape[1] != cfg.audio.num_mels:
        raise ValueError(
            f"mel must be [T, {cfg.audio.num_mels}], got {mel.shape}")
    dt = resolve_compute_dtype(cfg, compute_dtype)
    hop = cfg.audio.hop_size
    t0 = cfg.train.temp if temp is None else float(temp)
    plan = plan_chunks(cfg, mel.shape[0], chunk_frames, halo_frames)
    g = None
    if cfg.model.gin_channels > 0 and speaker_id is not None:
        # global conditioning is pointwise in time — same id every window.
        # speaker_id=None keeps g=None (the g term is skipped entirely),
        # matching the one-shot path's speaker_ids=None semantics so
        # --stream stays exact against it.
        g = jnp.asarray([speaker_id], jnp.int32)
    if put is not None and g is not None:
        g = put(g)

    # One sequential noise stream for the whole utterance, as offline —
    # drawn INCREMENTALLY as windows advance (RandomState's gaussian
    # stream is split-consistent across calls, including its cached
    # Box-Muller second value), so time-to-first-audio does not pay an
    # O(length) upfront generation.
    n_total = plan.total_frames * hop
    rs = np.random.RandomState(seed % (2 ** 32))
    z_full = np.empty(n_total, np.float32)
    z_end = 0
    mel = np.ascontiguousarray(mel[: plan.total_frames], np.float32)

    # The halo is context, never output: trim it ON DEVICE so only each
    # window's center crosses the wire (readback shrinks by window/chunk
    # = 2x at the default TTFA plan).  Pure data movement — the yielded
    # samples are bit-identical to slicing the full window on host.
    keep = plan.chunk_frames * hop
    wf_hop = plan.window_frames * hop
    fn = _jitted_reverse_trim(cfg.model, dt, keep)

    def materialize(dev_wav, start, stop, off):
        wav = np.asarray(dev_wav[0, :, 0].astype(jnp.float32))
        return start * hop, wav[off: off + (stop - start) * hop]

    # One window stays IN FLIGHT: window k+1 is prepared and dispatched
    # before window k's result is materialized, so the device computes
    # k+1 while k's readback + the next host prep run — the same overlap
    # synthesize_time_parallel uses.  jax dispatch is asynchronous, so
    # fn() returns immediately and only np.asarray blocks.  Yield order
    # (and every yielded byte) is unchanged.  The FIRST window is NOT
    # pipelined: time-to-first-audio is this path's reason to exist, and
    # queueing window 2's upload before window 1's readback measured
    # +27 ms of TTFA through the tunnel (100.4 vs 73.8 ms) for nothing —
    # the overlap only pays from window 2 onward.
    pending = None
    first = True
    # aligned fixed-size windows, clamped into the utterance — geometry
    # shared with synthesize_time_parallel via _window_starts
    for start, stop, w0 in _window_starts(plan):
        c = mel[w0: w0 + plan.window_frames]
        w_end = (w0 + plan.window_frames) * hop
        if w_end > z_end:
            z_full[z_end:w_end] = rs.randn(w_end - z_end) * t0
            z_end = w_end
        z = z_full[w0 * hop: w_end]
        if dt == jnp.bfloat16:
            # host-side pre-cast: bit-identical to reverse()'s own entry
            # cast (both RNE), half the per-window upload bytes — see
            # synthesize.dispatch_mels
            z, c = z.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
        zj = jnp.asarray(z)[None, :, None]
        cj = jnp.asarray(c)[None]
        if put is not None:
            zj, cj = put(zj), put(cj)
        k0 = min((start - w0) * hop, wf_hop - keep)
        wav = fn(params, zj, cj, g, k0)
        off = (start - w0) * hop - k0
        if first:
            yield materialize(wav, start, stop, off)
            first = False
            continue
        if pending is not None:
            yield materialize(*pending)
        pending = (wav, start, stop, off)
    if pending is not None:
        yield materialize(*pending)


def synthesize_streaming(params, cfg: Config, mel: np.ndarray,
                         **kw) -> np.ndarray:
    """Convenience: run :func:`stream_reverse` to completion and return
    the concatenated utterance (float32)."""
    return np.concatenate([a for _, a in
                           stream_reverse(params, cfg, mel, **kw)])


def _window_starts(plan: ChunkPlan) -> Iterator[tuple[int, int, int]]:
    """(start, stop, w0) per chunk — the exact window geometry
    :func:`stream_reverse` uses, factored so the parallel path below
    cannot drift from the sequential one."""
    for k in range(plan.n_chunks):
        start = k * plan.chunk_frames                  # first NEW frame
        stop = min(start + plan.chunk_frames, plan.total_frames)
        w0 = min(max(start - plan.halo_frames, 0),
                 plan.total_frames - plan.window_frames)
        yield start, stop, w0


def synthesize_time_parallel(params, cfg: Config, mel: np.ndarray,
                             seed: int = 0, temp: Optional[float] = None,
                             chunk_frames: Optional[int] = None,
                             halo_frames: Optional[int] = None,
                             compute_dtype=None,
                             speaker_id: Optional[int] = None,
                             rows_per_pass: Optional[int] = None,
                             data_sharding=None,
                             batch_multiple: int = 1,
                             noise: str = "host",
                             pcm16: bool = False) -> np.ndarray:
    """Sequence-parallel synthesis of ONE long utterance: the same exact
    halo windows :func:`stream_reverse` walks serially are BATCHED and
    (optionally) sharded across a device mesh, so one utterance's time
    axis is synthesized by many chips at once.

    This is the TPU-native context-parallel path SURVEY.md §5.7 calls
    for: the reverse pass has a tiny finite receptive field
    (:func:`reverse_halo`), so sharding time degenerates to
    batch-parallelism over overlapping windows — each window reads its
    halo from the (host-resident) mel and the deterministic noise
    stream, which means ZERO device collectives; XLA/GSPMD only gathers
    the outputs.  The output is bit-identical to
    :func:`synthesize_streaming` for the same (seed, temp, plan) — same
    windows, same noise stream, same trims (asserted in
    tests/test_streaming.py) — with HBM bounded by ``rows_per_pass``
    windows instead of the utterance.

    Compared to the serial stream (~23x real-time single-stream on the
    flagship), batching the windows recovers one-shot BATCH throughput
    for offline long-form jobs at the cost of the halo overlap's ~2x
    compute (docs/benchmarks.md streaming section).

    ``data_sharding`` is a ``NamedSharding`` over a data-parallel mesh
    axis (see serving/server.py's ``data_parallel``); params should
    already be placed with ``parallel.param_sharding``.
    ``batch_multiple`` (the mesh's data extent) rounds the fixed row
    count so every device gets whole rows.  ``rows_per_pass`` fixes the
    batch of every dispatch — ONE compiled shape regardless of
    utterance length (default: 16, rounded up to ``batch_multiple``).

    ``noise='device'`` replaces the host RandomState stream with
    POSITIONAL device noise — z for absolute frame f is a pure function
    of (seed, f) (see synthesize._jitted_reverse_posnoise) — deleting
    the z upload, which is as large as the audio itself.  Overlapping
    windows still see identical noise in shared receptive fields, so
    chunking stays seamless and the audio is invariant to the chunk
    plan; the stream differs from (but is exactly as deterministic as)
    the host one, mirroring the serving path's device noise.  ``pcm16``
    (device noise only) quantizes to 16-bit PCM on device with the WAV
    layer's exact rounding, halving readback; the return dtype is then
    int16.
    """
    if mel.ndim != 2 or mel.shape[1] != cfg.audio.num_mels:
        raise ValueError(
            f"mel must be [T, {cfg.audio.num_mels}], got {mel.shape}")
    if noise not in ("host", "device"):
        raise ValueError(f"noise must be 'host' or 'device', got {noise!r}")
    if pcm16 and noise != "device":
        raise ValueError("pcm16=True requires noise='device'")
    import jax

    dt = resolve_compute_dtype(cfg, compute_dtype)
    hop = cfg.audio.hop_size
    t0 = cfg.train.temp if temp is None else float(temp)
    plan = plan_chunks(cfg, mel.shape[0], chunk_frames, halo_frames)
    mel = np.ascontiguousarray(mel[: plan.total_frames], np.float32)

    if rows_per_pass is None:
        rows_per_pass = min(16, plan.n_chunks)
    if rows_per_pass <= 0:
        raise ValueError(f"rows_per_pass must be positive, got "
                         f"{rows_per_pass}")
    rows = -(-rows_per_pass // batch_multiple) * batch_multiple

    n_total = plan.total_frames * hop
    z_full = None
    if noise == "host":
        # One sequential noise stream for the whole utterance — identical
        # to stream_reverse's incremental draw (RandomState streams are
        # split-consistent), sliced per window.
        z_full = np.random.RandomState(seed % (2 ** 32)).randn(
            n_total).astype(np.float32) * t0

    g = None
    if cfg.model.gin_channels > 0 and speaker_id is not None:
        g = np.full((rows,), speaker_id, np.int32)

    if data_sharding is None:
        put = put_rep = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec
        _rep = NamedSharding(data_sharding.mesh, PartitionSpec())

        def put(a):
            return jax.device_put(np.asarray(a), data_sharding)

        def put_rep(a):
            return jax.device_put(np.asarray(a), _rep)
        if g is not None:
            g = put(g)

    wf = plan.window_frames
    if noise == "device":
        from .synthesize import _jitted_reverse_posnoise
        # Device-side halo trim: each row returns only its CENTER
        # (chunk_frames * hop samples), so the halo overlap — pure
        # context — never crosses the wire.  Readback shrinks by
        # window/chunk (2x at the TTFA-default plan, 1.25x at the
        # long-form chunk-512 plan).
        keep = plan.chunk_frames * hop
        fn_dev = _jitted_reverse_posnoise(cfg.model, dt, hop, pcm16, keep)
        seed_arr = put_rep(np.uint32(seed % (2 ** 32)))
        temps = put(np.full((rows,), t0, np.float32))
    else:
        fn = _jitted_reverse(cfg.model, dt)
    out = np.empty(n_total, np.int16 if pcm16 else np.float32)
    windows = list(_window_starts(plan))
    pending = None  # (device wav, geometry, row offsets) — one in flight

    def materialize(dev_wav, geom, offs):
        if pcm16:
            wav = np.asarray(dev_wav)
        else:
            wav = np.asarray(dev_wav.astype(jnp.float32))
        for i, (start, stop, w0) in enumerate(geom):
            out[start * hop: stop * hop] = (
                wav[i, offs[i]: offs[i] + (stop - start) * hop, 0])

    for p0 in range(0, len(windows), rows):
        geom = windows[p0: p0 + rows]
        cb = np.zeros((rows, wf, cfg.audio.num_mels), np.float32)
        for i, (_, _, w0) in enumerate(geom):
            cb[i] = mel[w0: w0 + wf]
        if dt == jnp.bfloat16:  # bit-identical host pre-cast, half bytes
            cb = cb.astype(jnp.bfloat16)
        if noise == "device":
            w0s = np.zeros((rows,), np.int32)
            w0s[: len(geom)] = [w for _, _, w in geom]
            # per-row trim start, pre-clamped so the final (over-long)
            # window's slice stays in bounds — dynamic_slice would clamp
            # silently and shift the content
            k0s = np.zeros((rows,), np.int32)
            k0s[: len(geom)] = [min((s - w) * hop, wf * hop - keep)
                                for s, _, w in geom]
            dev_wav = fn_dev(params, seed_arr, put(w0s), temps,
                             put(cb), g, put(k0s))
            offs = [(s - w) * hop - int(k0s[i])
                    for i, (s, _, w) in enumerate(geom)]
        else:
            zb = np.zeros((rows, wf * hop, 1), np.float32)
            for i, (_, _, w0) in enumerate(geom):
                zb[i, :, 0] = z_full[w0 * hop: (w0 + wf) * hop]
            if dt == jnp.bfloat16:
                zb = zb.astype(jnp.bfloat16)
            dev_wav = fn(params, put(zb), put(cb), g)
            offs = [(s - w) * hop for s, _, w in geom]
        if pending is not None:  # overlap host assembly with device work
            materialize(*pending)
        pending = (dev_wav, geom, offs)
    materialize(*pending)
    return out
