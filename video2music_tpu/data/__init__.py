from .parsers import (parse_chord_lab, parse_emotion_lab, parse_scalar_lab,
                      parse_instrument_csv, load_semantic_npy)
from .dataset import (VevoDataset, create_vevo_datasets, make_sample,
                      mixup_samples, batches)

__all__ = [
    "parse_chord_lab", "parse_emotion_lab", "parse_scalar_lab",
    "parse_instrument_csv", "load_semantic_npy",
    "VevoDataset", "create_vevo_datasets", "make_sample", "mixup_samples",
    "batches",
]
