from .io import HsiSample, load_mat_array, load_sample, load_mask, matricize, unmatricize
from .masks import bernoulli_mask, strip_mask, text_mask, corrupt
from .dictionary import learn_dictionary, column_normalize, random_dictionary

__all__ = [
    "HsiSample",
    "load_mat_array",
    "load_sample",
    "load_mask",
    "matricize",
    "unmatricize",
    "bernoulli_mask",
    "strip_mask",
    "text_mask",
    "corrupt",
    "learn_dictionary",
    "column_normalize",
    "random_dictionary",
]
