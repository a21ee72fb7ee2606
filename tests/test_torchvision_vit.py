"""torchvision-naming ViT converter parity (key-mapped timm oracle)."""
import numpy as np
import torch

import jax.numpy as jnp

from xai_tpu.convert.torch_import import vit_from_torchvision
from xai_tpu.models.vit import ViTConfig, VisionTransformer

from torch_oracles import TorchViT


def _to_torchvision_keys(sd, depth):
    out = {
        "conv_proj.weight": sd["patch_embed.proj.weight"],
        "conv_proj.bias": sd["patch_embed.proj.bias"],
        "class_token": sd["cls_token"],
        "encoder.pos_embedding": sd["pos_embed"],
        "encoder.ln.weight": sd["norm.weight"],
        "encoder.ln.bias": sd["norm.bias"],
        "heads.head.weight": sd["head.weight"],
        "heads.head.bias": sd["head.bias"],
    }
    for i in range(depth):
        s = f"blocks.{i}"
        t = f"encoder.layers.encoder_layer_{i}"
        out[f"{t}.ln_1.weight"] = sd[f"{s}.norm1.weight"]
        out[f"{t}.ln_1.bias"] = sd[f"{s}.norm1.bias"]
        out[f"{t}.ln_2.weight"] = sd[f"{s}.norm2.weight"]
        out[f"{t}.ln_2.bias"] = sd[f"{s}.norm2.bias"]
        out[f"{t}.self_attention.in_proj_weight"] = sd[f"{s}.attn.qkv.weight"]
        out[f"{t}.self_attention.in_proj_bias"] = sd[f"{s}.attn.qkv.bias"]
        out[f"{t}.self_attention.out_proj.weight"] = \
            sd[f"{s}.attn.proj.weight"]
        out[f"{t}.self_attention.out_proj.bias"] = sd[f"{s}.attn.proj.bias"]
        out[f"{t}.mlp.0.weight"] = sd[f"{s}.mlp.fc1.weight"]
        out[f"{t}.mlp.0.bias"] = sd[f"{s}.mlp.fc1.bias"]
        out[f"{t}.mlp.3.weight"] = sd[f"{s}.mlp.fc2.weight"]
        out[f"{t}.mlp.3.bias"] = sd[f"{s}.mlp.fc2.bias"]
    return out


def test_torchvision_vit_converter_parity():
    torch.manual_seed(0)
    tm = TorchViT(patch=8, dim=64, depth=2, heads=4, img=32,
                  num_classes=11).eval()
    tv_sd = _to_torchvision_keys(tm.state_dict(), 2)
    params = vit_from_torchvision(tv_sd, depth=2)
    cfg = ViTConfig(patch=8, embed_dim=64, depth=2, num_heads=4,
                    num_classes=11, img_hw=32)
    jm = VisionTransformer(cfg)
    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 2e-4
