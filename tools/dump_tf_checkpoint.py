"""Dump a reference TF checkpoint to .npz for the importer.

Usage: python tools/dump_tf_checkpoint.py <ckpt_prefix_or_dir> <out.npz>

Keeps TensorFlow out of the framework's runtime: run this once wherever TF
is available, then feed the .npz to
``flowavenet_tpu.checkpoint.tf_import.import_tf_checkpoint`` via np.load.
"""

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import numpy as np


def main() -> None:
    ckpt, out = sys.argv[1], sys.argv[2]
    import tensorflow as tf

    if os.path.isdir(ckpt):
        state = tf.train.get_checkpoint_state(ckpt)
        ckpt = state.model_checkpoint_path
    reader = tf.train.load_checkpoint(ckpt)
    shapes = reader.get_variable_to_shape_map()
    arrays = {}
    for name in shapes:
        if "Adam" in name or name.startswith("beta"):
            continue
        arrays[name] = np.asarray(reader.get_tensor(name))
    np.savez(out, **arrays)
    print(f"wrote {len(arrays)} variables to {out}")


if __name__ == "__main__":
    main()
