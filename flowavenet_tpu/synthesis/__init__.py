from .streaming import (plan_chunks, reverse_halo, stream_reverse,
                        synthesize_streaming, synthesize_time_parallel)
from .synthesize import load_params, synthesize_mels
