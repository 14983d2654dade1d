from .defaults import DATASETS, DefaultDataset, ConcatDataset, build_dataset
from .transforms import TRANSFORMS, Compose
from .collate import collate_padded, pad_sample
from .loader import Loader, MultiDatasetLoader, prefetch_to_device
from . import gs_datasets  # noqa: F401 (registers GS datasets)
