"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process: 2 virtual CPU devices -> 4 global devices, data=4 mesh, one
SPMD train step fed through the real multi-host input path
(host_batch_slice + make_global_batch + put_tree).  Prints LOSS <value>.
"""

import dataclasses
import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np  # noqa: E402

from flowavenet_tpu.config import MeshConfig, tiny  # noqa: E402
from flowavenet_tpu.parallel.mesh import batch_sharding, make_mesh  # noqa: E402
from flowavenet_tpu.parallel.multihost import (host_batch_slice,  # noqa: E402
                                               make_global_batch, put_tree)
from flowavenet_tpu.training.train import state_sharding  # noqa: E402
from flowavenet_tpu.training.train_state import (create_state,  # noqa: E402
                                                 ddi_initialize,
                                                 make_train_step)

T, B = 512, 4
cfg = tiny()
cfg = cfg.replace(data=dataclasses.replace(cfg.data, max_time_steps=T,
                                           batch_size=1))
mesh_cfg = MeshConfig(data_parallel=4, model_parallel=1)
mesh = make_mesh(mesh_cfg)

rng = np.random.RandomState(0)  # same global batch on every process
batch = {
    "audio": (0.1 * rng.randn(B, T, 1)).astype(np.float32),
    "mel": rng.rand(B, T // cfg.audio.hop_size,
                    cfg.model.num_mels).astype(np.float32),
}

state = create_state(jax.random.PRNGKey(0), cfg)
state = ddi_initialize(state, cfg, batch)
st_sh = state_sharding(state, mesh, mesh_cfg)
b_sh = batch_sharding(mesh, mesh_cfg)
state = put_tree(state, st_sh)

rows = host_batch_slice(B)
gbatch = make_global_batch({k: v[rows] for k, v in batch.items()}, b_sh)

step = jax.jit(make_train_step(cfg), donate_argnums=0,
               in_shardings=(st_sh, b_sh), out_shardings=(st_sh, None))
state, metrics = step(state, gbatch)
state, metrics = step(state, gbatch)
print(f"LOSS {float(metrics['loss']):.6f} STEP {int(state.step)}",
      flush=True)
