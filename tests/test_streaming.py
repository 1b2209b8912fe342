"""Streaming synthesis: exactness vs the full-utterance reverse, halo
bound validity (empirical receptive field), plan geometry."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.config import tiny
from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse
from flowavenet_tpu.synthesis.streaming import (ChunkPlan, plan_chunks,
                                                reverse_halo,
                                                stream_reverse,
                                                synthesize_streaming)

CFG = tiny()


def _damped_params(key, cfg, scale=0.05):
    """Randomized-but-damped params: nonzero couplings (so the receptive
    field is real) without the chaotic amplification of full-scale random
    weights (memory: reorder noise alone decorrelates those)."""
    params = init_flowavenet(key, cfg)
    leaves, treedef = jax.tree.flatten(params)
    r = np.random.RandomState(3)
    out = [l + jnp.asarray(scale * r.randn(*l.shape), l.dtype)
           for l in leaves]
    return jax.tree.unflatten(treedef, out)


def test_plan_alignment_and_fallback():
    plan = plan_chunks(CFG, 64)
    hop = CFG.audio.hop_size
    sq = CFG.model.squeeze_factor
    assert (plan.chunk_frames * hop) % sq == 0
    assert (plan.halo_frames * hop) % sq == 0
    assert plan.window_frames == plan.chunk_frames + 2 * plan.halo_frames
    assert plan.window_frames < plan.total_frames
    assert plan.n_chunks * plan.chunk_frames >= plan.total_frames
    # short utterance: one full-length chunk, no halo
    short = plan_chunks(CFG, 8)
    assert short == ChunkPlan(8, 0, 8, 1, 8)


def test_streaming_matches_full_reverse():
    """Chunked synthesis must reproduce the one-shot reverse: same seed,
    same noise stream, interior windows keep only samples >= halo from
    any window edge."""
    params = _damped_params(jax.random.PRNGKey(0), CFG.model)
    rng = np.random.RandomState(1)
    frames = 64
    mel = rng.rand(frames, CFG.audio.num_mels).astype(np.float32)
    hop = CFG.audio.hop_size

    chunks = list(stream_reverse(params, CFG, mel, seed=11, temp=0.7))
    assert len(chunks) > 3  # actually exercised chunking
    starts = [s for s, _ in chunks]
    assert starts[0] == 0
    assert all(b - a == chunks[0][1].shape[0]
               for a, b in zip(starts, starts[1:-1]))
    audio = np.concatenate([a for _, a in chunks])

    z = np.random.RandomState(11).randn(frames * hop).astype(np.float32)
    z = z * 0.7
    full = reverse(params, CFG.model, jnp.asarray(z)[None, :, None],
                   jnp.asarray(mel)[None])
    full = np.asarray(full[0, :, 0], np.float32)

    assert audio.shape == full.shape
    scale = np.abs(full).max()
    np.testing.assert_allclose(audio, full, atol=1e-4 * scale, rtol=0)


def test_synthesize_streaming_wrapper():
    params = _damped_params(jax.random.PRNGKey(2), CFG.model)
    mel = np.random.RandomState(5).rand(48, CFG.audio.num_mels)
    a = synthesize_streaming(params, CFG, mel.astype(np.float32), seed=1)
    assert a.shape == (48 * CFG.audio.hop_size,)
    assert np.all(np.isfinite(a))


def test_empirical_receptive_field_within_halo():
    """Perturb one z sample / one mel frame in the middle of an utterance
    and measure how far the output actually changes — the analytic
    reverse_halo (+ upsampler frames on the mel side) must bound it."""
    params = _damped_params(jax.random.PRNGKey(4), CFG.model)
    frames = 48
    hop = CFG.audio.hop_size
    T = frames * hop
    rng = np.random.RandomState(9)
    mel = rng.rand(frames, CFG.audio.num_mels).astype(np.float32)
    z = rng.randn(T).astype(np.float32) * 0.7

    def run(zv, mv):
        out = reverse(params, CFG.model, jnp.asarray(zv)[None, :, None],
                      jnp.asarray(mv)[None])
        return np.asarray(out[0, :, 0], np.float32)

    base = run(z, mel)
    halo = reverse_halo(CFG.model)

    z2 = z.copy()
    z2[T // 2] += 1.0
    diff = np.abs(run(z2, mel) - base)
    hit = np.nonzero(diff > 1e-6 * max(1.0, np.abs(base).max()))[0]
    assert hit.size  # the perturbation did something
    assert hit.min() >= T // 2 - halo and hit.max() <= T // 2 + halo, (
        f"z receptive field [{T//2 - hit.min()}, {hit.max() - T//2}] "
        f"exceeds analytic halo {halo}")

    m2 = mel.copy()
    m2[frames // 2] += 1.0
    diff = np.abs(run(z, m2) - base)
    hit = np.nonzero(diff > 1e-6 * max(1.0, np.abs(base).max()))[0]
    assert hit.size
    mel_halo_samples = halo + (4 + 1) * hop  # +upsampler reach, +own frame
    lo = frames // 2 * hop - mel_halo_samples
    hi = (frames // 2 + 1) * hop + mel_halo_samples
    assert hit.min() >= lo and hit.max() <= hi, (
        f"mel receptive field [{hit.min()}, {hit.max()}] exceeds "
        f"[{lo}, {hi}]")


def test_streaming_with_speaker_conditioning():
    """gin models stream too: global conditioning is pointwise in time,
    so the same speaker id rides every window; chunked == one-shot."""
    cfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, gin_channels=16,
                                       n_speakers=4))
    params = _damped_params(jax.random.PRNGKey(6), cfg.model)
    rng = np.random.RandomState(21)
    frames = 64
    mel = rng.rand(frames, cfg.audio.num_mels).astype(np.float32)
    hop = cfg.audio.hop_size

    audio = synthesize_streaming(params, cfg, mel, seed=7, temp=0.7,
                                 speaker_id=2)
    z = np.random.RandomState(7).randn(frames * hop).astype(np.float32)
    z = z * 0.7
    full = reverse(params, cfg.model, jnp.asarray(z)[None, :, None],
                   jnp.asarray(mel)[None], jnp.asarray([2], jnp.int32))
    full = np.asarray(full[0, :, 0], np.float32)
    scale = np.abs(full).max()
    np.testing.assert_allclose(audio, full, atol=1e-4 * scale, rtol=0)
    other = synthesize_streaming(params, cfg, mel, seed=7, temp=0.7,
                                 speaker_id=1)
    assert not np.allclose(audio, other)


def test_time_parallel_matches_streaming():
    """Batched window synthesis must reproduce the serial stream
    sample-for-sample: same plan, same noise stream, same trims — only
    the dispatch shape differs (here rows_per_pass=3 forces multiple
    passes plus zero-padded tail rows)."""
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    params = _damped_params(jax.random.PRNGKey(8), CFG.model)
    rng = np.random.RandomState(31)
    frames = 64
    mel = rng.rand(frames, CFG.audio.num_mels).astype(np.float32)

    serial = synthesize_streaming(params, CFG, mel, seed=11, temp=0.7)
    par = synthesize_time_parallel(params, CFG, mel, seed=11, temp=0.7,
                                   rows_per_pass=3)
    assert par.shape == serial.shape
    scale = np.abs(serial).max()
    np.testing.assert_allclose(par, serial, atol=1e-5 * scale, rtol=0)

    # and therefore matches the one-shot reverse too
    hop = CFG.audio.hop_size
    z = np.random.RandomState(11).randn(frames * hop).astype(np.float32)
    full = reverse(params, CFG.model, jnp.asarray(z * 0.7)[None, :, None],
                   jnp.asarray(mel)[None])
    np.testing.assert_allclose(
        par, np.asarray(full[0, :, 0], np.float32),
        atol=1e-4 * scale, rtol=0)


def test_time_parallel_sharded_over_mesh():
    """The same windows sharded over an 8-device data mesh (the SURVEY
    §5.7 context-parallel path: time shards -> batch rows, zero
    collectives) must equal the unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec

    from flowavenet_tpu.config import MeshConfig
    from flowavenet_tpu.parallel.mesh import make_mesh, param_sharding
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    params = _damped_params(jax.random.PRNGKey(9), CFG.model)
    rng = np.random.RandomState(41)
    mel = rng.rand(96, CFG.audio.num_mels).astype(np.float32)

    base = synthesize_time_parallel(params, CFG, mel, seed=5, temp=0.7,
                                    rows_per_pass=8)

    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    mesh = make_mesh(mesh_cfg)
    p_sh = param_sharding(params, mesh, mesh_cfg)
    import jax as _jax
    params_m = _jax.device_put(params, p_sh)
    sharded = synthesize_time_parallel(
        params_m, CFG, mel, seed=5, temp=0.7, rows_per_pass=8,
        data_sharding=NamedSharding(mesh,
                                    PartitionSpec(mesh_cfg.data_axis)),
        batch_multiple=8)
    scale = np.abs(base).max()
    np.testing.assert_allclose(sharded, base, atol=1e-5 * scale, rtol=0)


def test_time_parallel_speaker_conditioning():
    """gin models ride the parallel path too (same id on every row)."""
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    cfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, gin_channels=16,
                                       n_speakers=4))
    params = _damped_params(jax.random.PRNGKey(10), cfg.model)
    mel = np.random.RandomState(51).rand(
        64, cfg.audio.num_mels).astype(np.float32)
    serial = synthesize_streaming(params, cfg, mel, seed=3, temp=0.7,
                                  speaker_id=2)
    par = synthesize_time_parallel(params, cfg, mel, seed=3, temp=0.7,
                                   speaker_id=2, rows_per_pass=4)
    scale = np.abs(serial).max()
    np.testing.assert_allclose(par, serial, atol=1e-5 * scale, rtol=0)


def test_time_parallel_device_noise_plan_invariant():
    """Positional device noise: z is a pure function of (seed, absolute
    frame), so the audio must be invariant to the chunk plan — different
    chunk sizes, same waveform (the seamlessness property) — and
    deterministic across calls."""
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    params = _damped_params(jax.random.PRNGKey(12), CFG.model)
    mel = np.random.RandomState(61).rand(
        96, CFG.audio.num_mels).astype(np.float32)

    a = synthesize_time_parallel(params, CFG, mel, seed=9, temp=0.7,
                                 noise="device", rows_per_pass=4)
    b = synthesize_time_parallel(params, CFG, mel, seed=9, temp=0.7,
                                 noise="device", rows_per_pass=4)
    np.testing.assert_array_equal(a, b)  # deterministic

    other_plan = synthesize_time_parallel(
        params, CFG, mel, seed=9, temp=0.7, noise="device",
        rows_per_pass=8,
        chunk_frames=2 * (96 // 6))  # a different aligned chunking
    scale = np.abs(a).max()
    np.testing.assert_allclose(other_plan, a, atol=1e-4 * scale, rtol=0)

    # different seed -> different audio
    c = synthesize_time_parallel(params, CFG, mel, seed=10, temp=0.7,
                                 noise="device", rows_per_pass=4)
    assert not np.allclose(a, c)


def test_time_parallel_pcm16():
    """pcm16 returns int16 quantized ON DEVICE with the WAV layer's exact
    rounding: within 1 LSB of quantizing the float route on host."""
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    params = _damped_params(jax.random.PRNGKey(13), CFG.model)
    mel = np.random.RandomState(71).rand(
        64, CFG.audio.num_mels).astype(np.float32)

    f = synthesize_time_parallel(params, CFG, mel, seed=4, temp=0.7,
                                 noise="device", rows_per_pass=4)
    q = synthesize_time_parallel(params, CFG, mel, seed=4, temp=0.7,
                                 noise="device", rows_per_pass=4,
                                 pcm16=True)
    assert q.dtype == np.int16
    ref = np.clip(np.round(f.astype(np.float64) * 32768.0),
                  -32768, 32767).astype(np.int16)
    assert np.abs(q.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="pcm16"):
        synthesize_time_parallel(params, CFG, mel, pcm16=True)


def test_streaming_rejects_bad_mel():
    params = init_flowavenet(jax.random.PRNGKey(0), CFG.model)
    with pytest.raises(ValueError, match="mel must be"):
        next(stream_reverse(params, CFG, np.zeros((8, 3), np.float32)))


def test_streaming_matches_full_reverse_causal():
    """Causal convs put their WHOLE receptive field to the left (left-pad
    2*d, ops/conv.py), twice the symmetric one-sided reach — reverse_halo
    must account for it or chunk boundaries seam.  Same exactness
    contract as the non-causal test, on a causal config."""
    import dataclasses

    cfg = dataclasses.replace(CFG, model=dataclasses.replace(
        CFG.model, causal=True))
    assert reverse_halo(cfg.model) == 2 * reverse_halo(CFG.model)

    params = _damped_params(jax.random.PRNGKey(6), cfg.model)
    rng = np.random.RandomState(17)
    frames = 96  # causal halo doubles, so a longer clip keeps >1 chunk
    mel = rng.rand(frames, cfg.audio.num_mels).astype(np.float32)
    hop = cfg.audio.hop_size

    chunks = list(stream_reverse(params, cfg, mel, seed=13, temp=0.7))
    assert len(chunks) > 1
    audio = np.concatenate([a for _, a in chunks])

    z = np.random.RandomState(13).randn(frames * hop).astype(np.float32)
    z = z * 0.7
    full = reverse(params, cfg.model, jnp.asarray(z)[None, :, None],
                   jnp.asarray(mel)[None])
    full = np.asarray(full[0, :, 0], np.float32)
    assert audio.shape == full.shape
    scale = np.abs(full).max()
    np.testing.assert_allclose(audio, full, atol=1e-4 * scale, rtol=0)


def test_device_trim_clamped_final_window():
    """Both trimmed paths slice each window's center ON DEVICE with a
    pre-clamped start (synthesize._jitted_reverse_trim / the posnoise
    kernel's k0s): when the final chunk over-runs the utterance
    (total % chunk != 0), k0 hits its clamp (window*hop - keep) and the
    host compensates with a shifted offset.  Pin that geometry against
    the one-shot reverse explicitly."""
    from flowavenet_tpu.synthesis.streaming import synthesize_time_parallel

    params = _damped_params(jax.random.PRNGKey(12), CFG.model)
    rng = np.random.RandomState(61)
    frames = 50
    mel = rng.rand(frames, CFG.audio.num_mels).astype(np.float32)
    hop = CFG.audio.hop_size

    # chunk 12 -> plan rounds to alignment; pick one where the last
    # window is over-long (start + chunk > total)
    plan = plan_chunks(CFG, frames, chunk_frames=12)
    assert plan.n_chunks * plan.chunk_frames > plan.total_frames, plan

    serial = synthesize_streaming(params, CFG, mel, seed=21, temp=0.7,
                                  chunk_frames=12)
    par = synthesize_time_parallel(params, CFG, mel, seed=21, temp=0.7,
                                   chunk_frames=12, rows_per_pass=3)
    # device-noise route: the posnoise kernel's per-row k0s clamp is a
    # separate code path (vmapped dynamic_slice) — assert it directly on
    # the same over-long-final-window geometry, with pcm16=True so the
    # on-device quantization sits downstream of the clamped trim (the
    # serving long-form path's exact configuration).  Positional noise
    # is a different stream than the host one but plan-INVARIANT, so its
    # one-shot reference is a single-window plan (chunk >= total: one
    # untrimmed window, k0 = 0, no clamp anywhere).
    dev_chunked = synthesize_time_parallel(
        params, CFG, mel, seed=21, temp=0.7, chunk_frames=12,
        rows_per_pass=2, noise="device", pcm16=True)
    dev_oneshot = synthesize_time_parallel(
        params, CFG, mel, seed=21, temp=0.7,
        chunk_frames=plan.total_frames, noise="device", pcm16=True)
    assert dev_chunked.dtype == np.int16 and dev_oneshot.dtype == np.int16
    # float paths agree to 1e-4*scale << 1 PCM step; allow the 1-LSB
    # boundary flips quantization can add on top
    np.testing.assert_allclose(dev_chunked.astype(np.int32),
                               dev_oneshot.astype(np.int32), atol=1, rtol=0)
    z = np.random.RandomState(21).randn(
        plan.total_frames * hop).astype(np.float32) * 0.7
    full = reverse(params, CFG.model, jnp.asarray(z)[None, :, None],
                   jnp.asarray(mel[: plan.total_frames])[None])
    full = np.asarray(full[0, :, 0], np.float32)
    scale = np.abs(full).max()
    np.testing.assert_allclose(serial, full, atol=1e-4 * scale, rtol=0)
    np.testing.assert_allclose(par, full, atol=1e-4 * scale, rtol=0)
