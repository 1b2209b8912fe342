"""Device mesh + sharding rules: SPMD replaces the reference's in-graph
tower replication (/root/reference/train.py:35-83, utils.py:34-60).

Design (SURVEY §2.5, §5.8):
* 2-D logical mesh ``(data, model)``.  Batch is sharded on ``data``;
  gradient reduction is an XLA ``psum`` over ICI inserted by GSPMD — no
  explicit tower averaging, no PS device, no loss scaling.
* Parameters are replicated except the late-block conditioning 1x1 convs,
  whose input channels grow to 10k+ (SURVEY: block 7 alone ~70 M params).
  Those are sharded on ``model`` along the contraction axis; XLA partitions
  the matmul and inserts the reduce over ICI (tensor parallelism).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

# Shard conditioning-conv inputs over 'model' once Cin reaches this size.
# Below it, the collective costs more than the matmul saves.
TP_MIN_CIN = 2048


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model_parallel)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model}")
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig,
                   keys=("audio", "mel")) -> dict:
    """Shard the batch dim over 'data' for every input field."""
    s = NamedSharding(mesh, P(cfg.data_axis))
    return {k: s for k in keys}


def param_sharding(params: Any, mesh: Mesh, cfg: MeshConfig) -> Any:
    """Replicate everything except big cond-conv kernels (TP on 'model').

    Leaves are matched structurally: a stacked wn-conv kernel ``v`` of shape
    [n_flow, K, Cin, Cout] with Cin >= TP_MIN_CIN is sharded on Cin.
    """
    replicated = NamedSharding(mesh, P())
    tp = NamedSharding(mesh, P(None, None, cfg.model_axis, None))

    def rule(path, leaf):
        if mesh.shape[cfg.model_axis] == 1:
            return replicated
        key = jax.tree_util.keystr(path)
        if (key.endswith("['v']") and np.ndim(leaf) == 4
                and leaf.shape[2] >= TP_MIN_CIN
                and leaf.shape[2] % mesh.shape[cfg.model_axis] == 0):
            return tp
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def replicated(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: s, tree)
