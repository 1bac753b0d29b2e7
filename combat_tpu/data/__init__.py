from .datasets import ArrayDataset, get_dataset, synthetic_dataset
from .poison import poison_flags

__all__ = ["ArrayDataset", "get_dataset", "synthetic_dataset", "poison_flags"]
