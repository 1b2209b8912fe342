"""Optional TensorBoard event writer (parity with the reference's TB
summaries, train.py:93-150).

The framework's primary metrics stream is JSONL (metrics.py); this mirrors
scalars and audio into TB event files when TensorFlow is importable.  TF is
NOT a dependency — construction fails softly and the trainer continues with
JSONL only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class TensorBoardWriter:
    def __init__(self, logdir: str):
        try:
            import tensorflow as tf  # noqa: F401
        except Exception as e:  # pragma: no cover - env without TF
            raise ImportError(f"tensorboard writer needs tensorflow: {e}")
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def scalars(self, step: int, values: dict) -> None:
        with self._writer.as_default(step=step):
            for k, v in values.items():
                self._tf.summary.scalar(k, float(v))
        self._writer.flush()

    def wav(self, step: int, name: str, audio: np.ndarray,
            sample_rate: int) -> None:
        data = np.asarray(audio, np.float32).reshape(1, -1, 1)
        with self._writer.as_default(step=step):
            self._tf.summary.audio(name, data, sample_rate, max_outputs=1)
        self._writer.flush()


def maybe_tb_writer(logdir: str) -> Optional[TensorBoardWriter]:
    try:
        return TensorBoardWriter(logdir)
    except ImportError:
        return None
