from .torch_import import (
    resnet_from_torch,
    vgg_from_torch,
    vit_from_torch,
)

__all__ = ["resnet_from_torch", "vgg_from_torch", "vit_from_torch"]
