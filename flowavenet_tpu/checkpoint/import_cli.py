"""CLI: convert a dumped reference TF checkpoint into a framework
checkpoint usable by flowavenet-synthesize / flowavenet-train --restore.

Pipeline: tools/dump_tf_checkpoint.py (TF env) -> .npz ->
flowavenet-import-tf -> logs/pretrained/ckpt-<step>.npz.
Optimizer state is initialized fresh (reference Adam slots are skipped).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..checkpoint.checkpoint import save_checkpoint
from ..checkpoint.tf_import import import_tf_checkpoint
from ..config import get_config
from ..training.train_state import TrainState, create_state


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Import a reference TF checkpoint (dumped to .npz)")
    p.add_argument("--npz", required=True,
                   help="output of tools/dump_tf_checkpoint.py")
    p.add_argument("--out_dir", required=True,
                   help="checkpoint dir (e.g. logs/pretrained)")
    p.add_argument("--config", default="lj22k")
    p.add_argument("--step", type=int, default=0,
                   help="step to record (reference global_step)")
    args = p.parse_args(argv)

    cfg = get_config(args.config)
    with np.load(args.npz, allow_pickle=False) as data:
        variables = {k: data[k] for k in data.files}
    params = import_tf_checkpoint(variables, cfg.model)

    state = create_state(jax.random.PRNGKey(0), cfg)
    # template validates structure: imported tree must match init tree
    a = jax.tree_util.tree_structure(state.params)
    b = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, params))
    if a != b:
        raise ValueError("imported parameter tree does not match the "
                         f"{args.config} model structure")
    state = TrainState(step=np.asarray(args.step, np.int32), params=params,
                       opt_state=state.opt_state)
    path = save_checkpoint(args.out_dir, args.step, jax.device_get(state))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
