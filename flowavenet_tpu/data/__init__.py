from .dataset import CropDataset
from .records import (FwRecordReader, FwRecordWriter,
                      train_test_split_indices)
