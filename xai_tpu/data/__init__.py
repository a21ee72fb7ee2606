from .imagenet import ImageNetValStream, parse_val_index
from .classmaps import load_correct_mask, load_ground_truth

__all__ = ["ImageNetValStream", "parse_val_index", "load_correct_mask",
           "load_ground_truth"]
