"""Multi-host / multi-slice initialization (SURVEY §5.8 TPU-native plan).

The reference is single-host only (no NCCL/MPI; in-graph copies,
train.py:42-55).  On TPU pods, JAX's distributed runtime + GSPMD give
multi-host data parallelism with the same train-step code: every host runs
the same program, `jax.devices()` spans the whole slice, and the (data,
model) mesh from parallel/mesh.py lays data-parallel gradient psums over
ICI (and DCN across slices).

Only the input pipeline is host-local: each host feeds the batch rows that
live on its addressable devices (``host_batch_slice``).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Bring up jax.distributed when running multi-host.

    No-ops on single-process.  On TPU pods the arguments are discovered from
    the environment, so bare ``initialize_distributed()`` works.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (RuntimeError, ValueError) as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def host_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch this host must produce.

    With the batch dim sharded over 'data', GSPMD expects each process to
    provide the shard for its addressable devices;
    jax.make_array_from_process_local_data handles layout given this slice.
    """
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def make_global_batch(batch: dict, sharding_tree: dict) -> dict:
    """Assemble host-local numpy rows into global sharded jax.Arrays.

    Each process passes ONLY the rows from ``host_batch_slice``; the global
    array spans all processes' shards (no cross-host data movement — each
    host's rows land on its own addressable devices)."""
    out = {}
    for k, v in batch.items():
        sh = sharding_tree[k]
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sh)
        else:
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sh, np.asarray(v), global_shape)
    return out


def put_tree(tree, sharding_tree):
    """Place a host-replicated pytree (train state, params) onto a global
    sharding.  Single-process: plain device_put.  Multi-process: every
    process holds the full (identical) value, and
    ``make_array_from_process_local_data`` maps it onto each process's
    addressable shards of the global (replicated or TP-sharded) layout."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding_tree)

    def place(leaf, sh):
        return jax.make_array_from_process_local_data(
            sh, np.asarray(leaf), np.shape(leaf))

    return jax.tree.map(place, tree, sharding_tree)
