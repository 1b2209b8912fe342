from .metrics import MetricsWriter, format_step
from .optimizer import lr_schedule, make_optimizer
from .train_state import (TrainState, create_state, ddi_initialize,
                          make_eval_step, make_train_step)
