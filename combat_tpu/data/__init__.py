from .datasets import ArrayDataset, get_dataset, get_mean_and_std, synthetic_dataset, with_indices
from .poison import poison_flags

__all__ = ["ArrayDataset", "get_dataset", "get_mean_and_std", "synthetic_dataset", "with_indices", "poison_flags"]
