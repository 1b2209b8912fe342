from .flowavenet import (FloWaveNet, block_forward, block_reverse, ddi,
                         forward, init_flowavenet, loss_fn, reverse)
from .modules import apply_wavenet, init_wavenet
from .upsample import apply_upsample, init_upsample
