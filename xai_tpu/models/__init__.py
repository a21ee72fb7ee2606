from .common import ModelBundle
from . import resnet, vgg, vit

__all__ = ["ModelBundle", "resnet", "vgg", "vit"]
