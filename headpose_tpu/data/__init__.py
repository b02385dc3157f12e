"""Data layer: feature-map datasets, difficulty weights, canonical splits."""
from .datasets import (Dataset, load_dataset, load_dataset_with_weights,
                       difficulty_weights, train_val_split, standard_splits)

__all__ = [
    "Dataset", "load_dataset", "load_dataset_with_weights",
    "difficulty_weights", "train_val_split", "standard_splits",
]
