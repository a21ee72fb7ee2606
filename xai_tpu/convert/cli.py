"""Weight-conversion CLI: torch checkpoint/state-dict file -> pickled Flax
pytree (the --params_path input of every runner).

Usage:
    python -m xai_tpu.convert.cli --arch R101 --torch resnet101.pth \
        --out r101_params.pkl
"""
from __future__ import annotations

import argparse
import pickle


ARCH_CONVERTERS = {
    "R50": ("resnet_from_torch", dict(layers=(3, 4, 6, 3))),
    "R101": ("resnet_from_torch", dict(layers=(3, 4, 23, 3))),
    "R152": ("resnet_from_torch", dict(layers=(3, 8, 36, 3))),
    "RNXT": ("resnet_from_torch", dict(layers=(3, 4, 23, 3))),
    "VGG16": ("vgg_from_torch", {}),
    "VGG19": ("vgg_from_torch", {}),
    "VIT16": ("vit_from_torch", dict(depth=12)),
    "VIT32": ("vit_from_torch", dict(depth=12)),
    "VIT16_torchvision": ("vit_from_torchvision", dict(depth=12)),
    "VIT32_torchvision": ("vit_from_torchvision", dict(depth=12)),
    "CONVNXT_large": ("convnext_from_torch", dict(depths=(3, 3, 27, 3))),
    "CLIP16": ("clip_from_torch", dict(vision_layers=12, text_layers=12)),
    "CLIP32": ("clip_from_torch", dict(vision_layers=12, text_layers=12)),
    "IV3": ("inception_from_torch", {}),
    "MAXVIT": ("maxvit_from_torch", dict(depths=(2, 2, 5, 2))),
    "CONVNXT": ("convnext_from_torch", dict(depths=(3, 3, 27, 3))),
    # HF checkpoints (microsoft/swin-*, Xrenya/pvt-*, Zetatech/pvt-medium)
    "swin_tiny": ("swin_from_hf", dict(depths=(2, 2, 6, 2))),
    "swin_small": ("swin_from_hf", dict(depths=(2, 2, 18, 2))),
    "swin_base": ("swin_from_hf", dict(depths=(2, 2, 18, 2))),
    "swin_tiny_torchvision": ("swin_from_torch", dict(depths=(2, 2, 6, 2))),
    "pvt_tiny": ("pvt_from_hf", dict(depths=(2, 2, 2, 2))),
    "pvt_small": ("pvt_from_hf", dict(depths=(3, 4, 6, 3))),
    "pvt_med": ("pvt_from_hf", dict(depths=(3, 4, 18, 3))),
}


def load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def main(argv=None):
    p = argparse.ArgumentParser("convert")
    p.add_argument("--arch", required=True,
                   help=", ".join(ARCH_CONVERTERS))
    p.add_argument("--torch", dest="torch_path", required=True)
    p.add_argument("--out", required=True)
    args, _ = p.parse_known_args(argv)

    from . import torch_import
    from ..models import convnext as _convnext
    from ..models import inception as _inception

    name, kwargs = ARCH_CONVERTERS[args.arch]
    from ..models import swin as _swin

    from ..models import pvt as _pvt

    fn = getattr(torch_import, name, None)
    if fn is None:
        fn = {"convnext_from_torch": _convnext.convnext_from_torch,
              "inception_from_torch": _inception.inception_from_torch,
              "swin_from_torch": _swin.swin_from_torch,
              "swin_from_hf": _swin.swin_from_hf,
              "pvt_from_hf": _pvt.pvt_from_hf}[name]

    sd = load_state_dict(args.torch_path)
    params = fn(sd, **kwargs)
    with open(args.out, "wb") as f:
        pickle.dump(params, f)
    n = sum(v.size for v in _leaves(params))
    print(f"wrote {args.out} ({n / 1e6:.1f}M params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
