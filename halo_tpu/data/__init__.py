from .build import build_dataset, build_transform
from .catalog import DatasetCatalog
from .datasets import (CityscapesDataSet, GTAVDataSet, SynthiaDataSet,
                       remap_labels, balanced_file_list,
                       ID_TO_TRAINID_19, ID_TO_TRAINID_16)
from .loader import DataLoader, DevicePrefetcher, default_collate
from . import masks
from . import transforms
