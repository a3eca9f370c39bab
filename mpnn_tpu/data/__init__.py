from .dataset import Dataset
from .augment import augmented_batch, rand_shift_batch, rand_flip_batch
from . import synth

__all__ = [
    "Dataset", "augmented_batch", "rand_shift_batch", "rand_flip_batch",
    "synth",
]
