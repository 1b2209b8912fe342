"""flowavenet_tpu: a TPU-native (JAX/XLA/Pallas) FloWaveNet framework.

Brand-new implementation with the capabilities of ryhorv/tf-flowavenet
(reference mounted read-only at /root/reference), designed TPU-first:
functional flow core, scanned flow steps, bf16 compute / fp32 state, SPMD
data parallelism over a device mesh, and Pallas kernels for the hot gated
ResBlock op.
"""

from .config import (AudioConfig, Config, DataConfig, MeshConfig,
                     ModelConfig, TrainConfig, get_config, lj22k, lj8k, tiny)
from .models.flowavenet import (FloWaveNet, ddi, forward, init_flowavenet,
                                loss_fn, reverse)

__version__ = "0.1.0"
