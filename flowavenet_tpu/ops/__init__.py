from .conv import (conv1x1, dilated_conv1d, he_uniform, init_wn_conv1d,
                   init_zero_conv1d, wn_conv1d, wn_conv1x1, wn_kernel,
                   zero_conv1d)
from .squeeze import change_order, squeeze, squeeze_n, unsqueeze
from .pallas_resblock import fused_gated_resblock, fused_gated_resblock_v2
