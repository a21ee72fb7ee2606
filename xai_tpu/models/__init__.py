from .common import ModelBundle
from . import resnet, vgg, vit

__all__ = ["ModelBundle", "resnet", "vgg", "vit", "get_bundle",
           "EXTENDED_ZOO"]

# lazy factories for the extended image_finder zoo
# (findCorrectlyClassifiedImageNet.py supports 19 model choices)
EXTENDED_ZOO = {
    "R50": ("resnet", "R50"), "R101": ("resnet", "R101"),
    "R152": ("resnet", "R152"), "RNXT": ("resnet", "RNXT"),
    "VGG19": ("vgg", "vgg19"), "VGG16": ("vgg", "vgg16"),
    "VIT8": ("vit", "VIT8"), "VIT16": ("vit", "VIT16"),
    "VIT32": ("vit", "VIT32"),
    "VIT_tiny": ("vit", "vit_tiny_patch16_224"),
    "VIT_base": ("vit", "vit_base_patch16_224"),
    "VIT_large": ("vit", "vit_large_patch16_224"),
    "CONVNXT": ("convnext", "convnext_base"),
    "MAXVIT": ("maxvit", None),
    "IV3": ("inception", None),
    "swin_tiny": ("swin", "swin_tiny"), "swin_small": ("swin", "swin_small"),
    "swin_base": ("swin", "swin_base"),
    "pvt_tiny": ("pvt", "pvt_tiny"), "pvt_small": ("pvt", "pvt_small"),
    "pvt_med": ("pvt", "pvt_medium"),
    "CLIP16": ("clip", "CLIP16"), "CLIP32": ("clip", "CLIP32"),
}


def get_bundle(name: str, params=None, key=None) -> ModelBundle:
    """Construct any zoo bundle by its reference CLI / class-map name."""
    import importlib

    module_name, arch = EXTENDED_ZOO[name]
    mod = importlib.import_module(f".{module_name}", __package__)
    if arch is None:
        return mod.make_bundle(params=params, key=key)
    return mod.make_bundle(arch, params=params, key=key)
