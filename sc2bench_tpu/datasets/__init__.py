from .image import (ImageFolderDataset, SyntheticClassificationDataset,  # noqa: F401
                    DataLoader, build_dataset)
