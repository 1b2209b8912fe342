"""Benchmark: one-shot synthesis throughput on the flagship model.

Prints ONE JSON line:
  {"metric": "synthesis_khz_per_sec_per_chip", "value": N, "unit": "kHz/s",
   "vs_baseline": M}

value        = kHz of 22.05 kHz audio synthesized per wall-second per chip
vs_baseline  = x real-time (value / 22.05).  The reference's only published
               number is 836 ms wall for one utterance on a 2018 GPU
               (/root/reference/example.ipynb cell 7); 1x real-time is the
               unit baseline.

Measurement notes:
* z and mel are generated ON DEVICE inside the jitted function and only a
  scalar checksum is read back — in this environment the TPU is reached
  through a stdio relay tunnel, so host<->device transfers would otherwise
  dominate and measure the tunnel, not the chip.  (A production data path
  keeps mels HBM-resident the same way.)
* timing uses a scalar readback as the execution fence;
  ``block_until_ready`` is unreliable on the experimental 'axon' platform.

Env knobs: BENCH_BATCH (128) | BENCH_SECONDS (7 — the measured optimum:
the kernels' tile/halo overhead amortizes with clip length up to the
HBM ceiling at ~10 s; 3.83s: 542.1x, 4.88: 547.3, 6.97: 549.2,
7.66: 548.0, 9.76: OOM | trimmed to a 30-frame
multiple so kernel tiles divide exactly) | BENCH_ITERS (5) |
BENCH_CONFIG (lj22k) | BENCH_MELS (synthetic | speech | /path/to/mels_dir)
| FWN_INT8=0 (opt out of the default int8 kernels back to bf16)

BENCH_MELS modes: "synthetic" (default) conditions on uniform-random mels
generated on device — the headline number, free of host-transfer effects;
"speech" runs speech-like waveforms (harmonic + formant + noise bursts)
through the REAL mel frontend (audio/mel.py) on host and uploads them once,
proving the measured path is the production path; a directory path loads
preprocessed .npy mels (e.g. real LJSpeech features).  Measured delta on
v5e is <1% (docs/benchmarks.md) — throughput is shape-dominated.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _speech_mels(cfg, batch: int, frames: int) -> "np.ndarray":
    """Speech-like conditioning through the REAL mel frontend: harmonic
    series with a gliding f0, formant-shaped noise, and silence gaps —
    realistic mel statistics without shipping a corpus."""
    from flowavenet_tpu.audio.mel import process_wav

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    n = frames * hop + cfg.audio.n_fft
    rng = np.random.RandomState(1234)
    mels = []
    for b in range(batch):
        t = np.arange(n) / sr
        f0 = 120.0 + 60.0 * np.sin(2 * np.pi * (0.7 + 0.1 * (b % 7)) * t)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        voiced = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(8))
        envelope = np.clip(np.sin(2 * np.pi * 1.7 * t + b) + 0.7, 0, None)
        noise = rng.randn(n) * 0.05
        wav = (0.3 * voiced * envelope + noise).astype(np.float32)
        _, mel = process_wav(wav, cfg.audio)
        mels.append(mel[:frames])
    return np.stack(mels).astype(np.float32)


def _load_mels_dir(path: str, cfg, batch: int, frames: int) -> "np.ndarray":
    """Preprocessed .npy mels, cycled/cropped/padded to [batch, frames]."""
    names = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
    if not names:
        raise FileNotFoundError(f"no .npy mels in {path}")
    out = np.zeros((batch, frames, cfg.model.num_mels), np.float32)
    for b in range(batch):
        m = np.load(os.path.join(path, names[b % len(names)]))
        f = min(frames, m.shape[0])
        out[b, :f] = m[:f]
    return out


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    seconds = float(os.environ.get("BENCH_SECONDS", "7"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    sq = cfg.model.squeeze_factor
    frames = int(seconds * sr) // hop
    # prefer T divisible by 30 mel frames (= 7680 samples at hop 256):
    # every early block's kernel tile then divides its level length
    # exactly, so the tile views are free (no jnp.pad copies)
    if frames >= 30 and (30 * hop) % sq == 0:
        frames -= frames % 30
    while (frames * hop) % sq != 0 and frames > 1:
        frames -= 1
    T = frames * hop

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} | model: "
          f"{cfg.model.n_block}x{cfg.model.n_flow} flows | "
          f"batch {batch} x {T / sr:.2f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    params = jax.jit(lambda k: init_flowavenet(k, cfg.model))(
        jax.random.PRNGKey(0))
    # synthesis computes in bf16; keeping the fp32 master tree resident
    # costs 362 MB of HBM headroom for nothing (the b96 x 4s shape sits
    # within ~100 MB of the 15.75 GB budget).  Weight-norm folding still
    # runs in fp32 on the bf16 leaves.
    params = jax.tree.map(lambda l: l.astype(jnp.bfloat16), params)
    print(f"# init {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    mels_mode = os.environ.get("BENCH_MELS", "synthetic")
    c_host = None
    if mels_mode == "speech":
        c_host = _speech_mels(cfg, batch, frames)
    elif mels_mode != "synthetic":
        c_host = _load_mels_dir(mels_mode, cfg, batch, frames)
    if c_host is not None:
        t0 = time.time()
        c_dev = jax.device_put(jnp.asarray(c_host))
        c_dev.block_until_ready()
        print(f"# uploaded {mels_mode!r} mels "
              f"({c_host.nbytes / 1e6:.1f} MB) in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    else:
        c_dev = None

    @jax.jit
    def synth(params, seed, c):
        kz, kc = jax.random.split(jax.random.PRNGKey(seed))
        z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * cfg.train.temp
        if c is None:
            c = jax.random.uniform(kc, (batch, frames, cfg.model.num_mels),
                                   jnp.float32)
        wav = reverse(params, cfg.model, z, c, compute_dtype=jnp.bfloat16)
        w32 = wav.astype(jnp.float32)
        return jnp.sum(w32 * w32), jnp.sum(jnp.isfinite(w32))

    # warmup / compile (scalar readback = execution fence)
    t0 = time.time()
    energy, finite = synth(params, 0, c_dev)
    energy, finite = float(energy), int(finite)
    compile_s = time.time() - t0
    assert finite == batch * T, f"non-finite synthesis output ({finite})"

    times = []
    for i in range(iters):
        t0 = time.time()
        e, _ = synth(params, i + 1, c_dev)
        float(e)
        times.append(time.time() - t0)
    best = min(times)

    samples_per_sec = batch * T / best
    khz = samples_per_sec / 1000.0
    rtf = samples_per_sec / sr
    print(f"# compile+first {compile_s:.1f}s | best {best * 1e3:.1f} ms "
          f"for {batch}x{T / sr:.2f}s | {rtf:.1f}x real-time | "
          f"energy {energy:.1f}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "synthesis_khz_per_sec_per_chip",
        "value": round(khz, 2),
        "unit": "kHz/s",
        "vs_baseline": round(rtf, 2),
    }))


if __name__ == "__main__":
    main()
