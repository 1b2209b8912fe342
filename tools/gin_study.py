"""Train a speaker-conditioned (gin) model and prove the pathway LEARNS
(VERDICT r4 item 4).

Global speaker conditioning is an advertised reference capability
(/root/reference/README.md:33, model.py:313-334) that the reference
itself silently breaks (g dropped in modules.py:188-189) and this repo
deliberately fixes.  Until now the fixed path had init/parity/streaming
tests but had never been TRAINED.  This tool:

1. builds a pseudo-multi-speaker corpus from the 6 reference utterances
   in the multi-speaker layout (speaker_a = originals; speaker_b = the
   same audio polyphase-resampled 6:5 and played at the original rate —
   ~1.2x pitch+tempo, an acoustically distinct "voice"),
2. preprocesses it with the lj8k_gin preset (multi-speaker walk ->
   speakers.txt -> speaker ids in FwRecords),
3. trains through the production train() path for --steps steps,
4. reports the three learning signals:
   a. per-speaker conditioning mel-corr (does synthesis still track the
      mel for BOTH speakers),
   b. the speaker-SWAP delta: synthesize the same (mel, z) under both
      speaker ids; the waveform delta must exceed the numerical noise
      floor (same (mel, z, g) run at bf16 vs fp32 compute) by a wide
      margin — this is the direct evidence the embedding reaches the
      couplings (it cannot in the reference),
   c. embedding separation ||emb[a] - emb[b]|| trained vs init,
5. serves the trained gin model through SynthesisService.submit AND
   .stream with explicit speaker ids (the serving surface check).

Usage: python tools/gin_study.py [workdir] [--steps N] [--cpu]
       [--config lj8k_gin] [--report docs/runs/gin_study.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("workdir", nargs="?", default=None)
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--config", default="lj8k_gin")
    p.add_argument("--ref_wavs",
                   default="/root/reference/examples/original")
    p.add_argument("--report", default=None)
    p.add_argument("--frames", type=int, default=200)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.audio.mel import process_wav
    from flowavenet_tpu.audio.preprocessing import preprocess
    from flowavenet_tpu.audio.wavio import load_audio, write_wav
    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import (init_flowavenet,
                                                  reverse)
    from flowavenet_tpu.synthesis.synthesize import (_usable_frames,
                                                     load_params)
    from flowavenet_tpu.training.train import train

    cfg = get_config(args.config)
    sr = cfg.audio.sample_rate
    work = args.workdir or tempfile.mkdtemp(prefix="fwn_gin_")
    os.makedirs(work, exist_ok=True)
    print(f"workdir: {work}")

    # ---- 1. two-"speaker" corpus in the multi-speaker layout ---------
    corpus = os.path.join(work, "corpus")
    names = sorted(glob.glob(os.path.join(args.ref_wavs, "*.wav")))
    assert names, f"no wavs in {args.ref_wavs}"
    if not os.path.exists(os.path.join(corpus, "spk_b")):
        from scipy.signal import resample_poly
        for spk in ("spk_a", "spk_b"):
            os.makedirs(os.path.join(corpus, spk, "book1", "wavs"),
                        exist_ok=True)
        lines_a, lines_b = [], []
        for i, src in enumerate(names):
            wav = load_audio(src, sr)
            write_wav(os.path.join(corpus, "spk_a", "book1", "wavs",
                                  f"u{i:03d}.wav"), wav, sr)
            # 6:5 polyphase at the same nominal rate: ~1.2x pitch+tempo
            shifted = resample_poly(wav, 5, 6).astype(np.float32)
            write_wav(os.path.join(corpus, "spk_b", "book1", "wavs",
                                  f"u{i:03d}.wav"), shifted, sr)
            lines_a.append(f"u{i:03d}|x|ref {os.path.basename(src)}")
            lines_b.append(f"u{i:03d}|x|shifted {os.path.basename(src)}")
        with open(os.path.join(corpus, "spk_a", "book1",
                               "metadata.csv"), "w") as f:
            f.write("\n".join(lines_a))
        with open(os.path.join(corpus, "spk_b", "book1",
                               "metadata.csv"), "w") as f:
            f.write("\n".join(lines_b))

    data_dir = os.path.join(work, "training_data")
    if not os.path.exists(os.path.join(data_dir, "train.txt")):
        preprocess(corpus, data_dir, cfg, num_workers=2)
        print(open(os.path.join(data_dir, "speakers.txt")).read().strip())

    # ---- 2-3. production training path -------------------------------
    logdir = os.path.join(work, "logs")
    emb_init = np.asarray(init_flowavenet(
        jax.random.PRNGKey(cfg.train.seed), cfg.model)["speaker_emb"])
    train(cfg, data_dir, logdir, restore=True, train_steps=args.steps,
          summary_interval=max(1, args.steps // 20),
          checkpoint_interval=max(1, args.steps // 3),
          eval_interval=10 ** 9)

    params, step = load_params(os.path.join(logdir, "pretrained"), cfg)
    print(f"trained to step {step}")
    emb = np.asarray(params["speaker_emb"], np.float32)

    # ---- 4. learning signals ------------------------------------------
    # per-speaker mels straight from the preprocessed corpus (train.txt
    # rows carry speaker ids: audio|mel|timesteps|speaker|text)
    rows = [l.split("|") for l in
            open(os.path.join(data_dir, "train.txt"), encoding="utf-8")]
    by_spk = {0: [], 1: []}
    for r in rows:
        by_spk[int(r[3])].append(np.load(
            os.path.join(data_dir, "mels", r[1])))
    frames = _usable_frames(
        min(args.frames, min(m.shape[0] for ms in by_spk.values()
                             for m in ms)), cfg)
    T = frames * cfg.audio.hop_size

    bf16 = jnp.bfloat16
    params16 = jax.tree.map(lambda a: a.astype(bf16), params)

    def synth(mels, sids, dtype, prm):
        c = jnp.asarray(np.stack([m[:frames] for m in mels]), jnp.float32)
        z = jax.random.normal(jax.random.PRNGKey(7),
                              (c.shape[0], T, 1), jnp.float32) * 0.7
        g = jnp.asarray(sids, jnp.int32)
        out = jax.jit(lambda p, z, c, g: reverse(
            p, cfg.model, z, c, g, compute_dtype=dtype))(prm, z, c, g)
        return np.asarray(out.astype(jnp.float32))

    def corr(a, b):
        return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

    def mel_corr(wavs, mels):
        cs = []
        for i in range(wavs.shape[0]):
            _, m = process_wav(wavs[i, :, 0], cfg.audio)
            n = min(m.shape[0], frames)
            cs.append(corr(m[:n], mels[i][:n]))
        return float(np.mean(cs))

    report = {"step": int(step), "config": args.config,
              "emb_sep_init": float(np.linalg.norm(emb_init[0]
                                                   - emb_init[1])),
              "emb_sep_trained": float(np.linalg.norm(emb[0] - emb[1]))}

    # (a) per-speaker conditioning fidelity
    for spk in (0, 1):
        mels = by_spk[spk]
        wavs = synth(mels, [spk] * len(mels), bf16, params16)
        report[f"mel_corr_spk{spk}"] = mel_corr(wavs, mels)
        write_wav(os.path.join(work, f"spk{spk}_sample.wav"),
                 wavs[0, :, 0], sr)

    # (b) speaker swap on FIXED (mel, z) vs the numerical noise floor
    mels = by_spk[0][:4]
    w_g0 = synth(mels, [0] * len(mels), bf16, params16)
    w_g1 = synth(mels, [1] * len(mels), bf16, params16)
    w_g0_f32 = synth(mels, [0] * len(mels), jnp.float32, params)
    swap_rms = float(np.sqrt(np.mean((w_g1 - w_g0) ** 2)))
    noise_rms = float(np.sqrt(np.mean((w_g0_f32 - w_g0) ** 2)))
    report["swap_delta_rms"] = swap_rms
    report["route_noise_rms"] = noise_rms
    report["swap_over_noise"] = swap_rms / max(noise_rms, 1e-12)
    report["swap_corr"] = corr(w_g1, w_g0)

    # (c) does the wrong speaker id hurt conditioning fidelity?
    report["mel_corr_spk0_mels_wrong_g"] = mel_corr(w_g1, mels)
    report["mel_corr_spk0_mels_right_g"] = mel_corr(w_g0, mels)

    # ---- 5. serving surface with explicit speaker ids -----------------
    from flowavenet_tpu.serving.server import SynthesisService
    svc = SynthesisService(params16, cfg)
    try:
        wav0 = svc.submit(by_spk[0][0][:frames], seed=3, speaker_id=0)
        wav1 = svc.submit(by_spk[0][0][:frames], seed=3, speaker_id=1)
        report["serving_swap_rms"] = float(np.sqrt(np.mean(
            (wav0.astype(np.float32) - wav1.astype(np.float32)) ** 2)))
        n, chunks = svc.stream(by_spk[1][0][:frames], seed=4,
                               speaker_id=1)
        got = sum(len(b) for b in chunks) // 2
        report["stream_gin_ok"] = bool(got == n)
    finally:
        svc.close()

    print(json.dumps(report, indent=1))
    with open(os.path.join(work, "gin_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    if args.report:
        _write_md(args.report, report, args)
        print(f"wrote {args.report}")


def _write_md(path: str, r: dict, args) -> None:
    ok = r["swap_over_noise"] > 10 and r["stream_gin_ok"]
    with open(path, "w") as f:
        f.write(f"""# Speaker-conditioned (gin) training study

`tools/gin_study.py --steps {args.steps} --config {args.config}` —
2-"speaker" corpus (originals + 6:5-resampled variants) through the
PRODUCTION preprocess -> train -> synthesize path.  The reference
advertises global conditioning but silently drops g inside the coupling
nets (modules.py:188-189); this repo fixes the pathway — this study is
the first TRAINED evidence the fix learns.

| signal | value |
|---|---|
| trained steps | {r['step']} |
| per-speaker mel-corr (spk0 / spk1) | {r['mel_corr_spk0']:.4f} / {r['mel_corr_spk1']:.4f} |
| embedding separation init -> trained | {r['emb_sep_init']:.3f} -> {r['emb_sep_trained']:.3f} |
| speaker-swap waveform RMS (fixed mel, z) | {r['swap_delta_rms']:.4f} |
| numerical route-noise RMS (bf16 vs fp32, same g) | {r['route_noise_rms']:.6f} |
| swap / noise ratio | **{r['swap_over_noise']:.0f}x** |
| swap waveform corr (1.0 = g ignored) | {r['swap_corr']:.4f} |
| spk0 mels: mel-corr right-g / wrong-g | {r['mel_corr_spk0_mels_right_g']:.4f} / {r['mel_corr_spk0_mels_wrong_g']:.4f} |
| serving submit swap RMS / stream(gin) complete | {r['serving_swap_rms']:.4f} / {r['stream_gin_ok']} |

Verdict: {'the gin pathway LEARNS - swapping the speaker id on fixed '
          '(mel, z) changes the audio far above numerical noise, and '
          'both serving surfaces honor explicit speaker ids'
          if ok else 'INCONCLUSIVE - see gin_report.json'}.
""")


if __name__ == "__main__":
    main()
