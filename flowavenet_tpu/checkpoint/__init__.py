from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         save_checkpoint)
from .tf_import import import_tf_checkpoint
