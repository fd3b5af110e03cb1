from .coco_sph import SphCocoDataset
from .pipeline import SphPipeline
from .loader import DataLoader, make_synthetic_dataset

__all__ = ["SphCocoDataset", "SphPipeline", "DataLoader",
           "make_synthetic_dataset"]
