from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         save_checkpoint)
