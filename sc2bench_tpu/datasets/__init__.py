from .image import (ImageFolderDataset, SyntheticClassificationDataset,  # noqa: F401
                    DataLoader, build_dataset)
from . import coco, voc  # noqa: F401
