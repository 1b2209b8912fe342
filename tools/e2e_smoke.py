"""End-to-end smoke drive: synthetic corpus -> preprocess -> train (tiny)
-> checkpoint -> synthesize wav.  The whole reference workflow
(preprocessing.py -> train.py -> synthesize.py) on one machine in ~a minute.

Usage: python tools/e2e_smoke.py [workdir] [--cpu]
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import tempfile

import numpy as np


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    work = args[0] if args else tempfile.mkdtemp(prefix="fwn_smoke_")
    os.makedirs(work, exist_ok=True)
    print(f"workdir: {work}")

    from flowavenet_tpu.audio.preprocessing import preprocess
    from flowavenet_tpu.audio.wavio import write_wav
    from flowavenet_tpu.config import tiny
    from flowavenet_tpu.synthesis.synthesize import main as synth_main
    from flowavenet_tpu.training.train import train

    cfg = tiny()
    sr = cfg.audio.sample_rate

    # 1. synthetic corpus in the reference's layout
    corpus = os.path.join(work, "corpus", "book1")
    os.makedirs(os.path.join(corpus, "wavs"), exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        n = sr // 2 + 1111 * i
        t = np.arange(n) / sr
        wav = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)
               + 0.03 * rng.randn(n)).astype(np.float32)
        write_wav(os.path.join(corpus, "wavs", f"u{i:03d}.wav"), wav, sr)
        lines.append(f"u{i:03d}|x|text {i}")
    with open(os.path.join(corpus, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))

    # 2. preprocess
    data_dir = os.path.join(work, "training_data")
    preprocess(os.path.join(work, "corpus"), data_dir, cfg, num_workers=2)

    # 3. train a few steps (fresh; then resume 2 more to prove restore)
    logdir = os.path.join(work, "logs")
    train(cfg, data_dir, logdir, restore=False, train_steps=5,
          summary_interval=2, checkpoint_interval=5, eval_interval=4)
    print("resume run:")
    train(cfg, data_dir, logdir, restore=True, train_steps=7,
          summary_interval=2, checkpoint_interval=7, eval_interval=100)

    # 4. synthesize from the preprocessed mels via the CLI surface
    mels_dir = os.path.join(data_dir, "mels")
    out_dir = os.path.join(work, "wav_out")
    synth_main(["--saved_dir", os.path.join(logdir, "pretrained"),
                "--mels_dir", mels_dir, "--output_dir", out_dir,
                "--config", "tiny", "--batch_size", "4"])

    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 8, f"expected 8 wavs, got {len(wavs)}"
    from flowavenet_tpu.audio.wavio import read_wav
    y, wsr = read_wav(os.path.join(out_dir, wavs[0]))
    assert wsr == sr and len(y) > 0 and np.all(np.isfinite(y))

    # 5. the streaming CLI surface on the longest mel (exact chunked path)
    stream_dir = os.path.join(work, "wav_stream")
    synth_main(["--saved_dir", os.path.join(logdir, "pretrained"),
                "--mels_dir", mels_dir, "--output_dir", stream_dir,
                "--config", "tiny", "--stream", "--chunk_frames", "8"])
    ys, _ = read_wav(os.path.join(stream_dir, wavs[0]))
    assert len(ys) > 0 and np.all(np.isfinite(ys))

    print(f"SMOKE OK: {len(wavs)} wavs in {out_dir}, "
          f"e.g. {wavs[0]}: {len(y) / sr:.2f}s rms={np.sqrt((y**2).mean()):.3f}")


if __name__ == "__main__":
    main()
