"""Swin converter parity vs a torchvision-naming torch oracle (shifted
window attention with relative position bias, patch merging)."""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from xai_tpu.models.swin import (SwinTransformer, swin_from_torch,
                                 _rel_position_index)


def shifted_window_attention_torch(x, qkv_w, qkv_b, proj_w, proj_b, table,
                                   ws, shift, heads):
    """Functional eval-mode shifted window attention (torchvision
    semantics, no padding needed for divisible inputs)."""
    B, H, W, C = x.shape
    if ws >= min(H, W):
        ws, shift = min(H, W), 0
    if shift:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    nH, nW = H // ws, W // ws
    xw = x.view(B, nH, ws, nW, ws, C).permute(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nH * nW, ws * ws, C)

    qkv = xw @ qkv_w.T + qkv_b
    q, k, v = qkv.chunk(3, -1)

    def heads_split(t):
        return t.view(-1, ws * ws, heads, C // heads).transpose(1, 2)

    q, k, v = map(heads_split, (q, k, v))
    attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    idx = torch.tensor(_rel_position_index(ws).reshape(-1))
    bias = table[idx].view(ws * ws, ws * ws, heads).permute(2, 0, 1)
    attn = attn + bias[None]

    if shift:
        img = torch.zeros(H, W)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wss in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img[hs, wss] = cnt
                cnt += 1
        wins = img.view(nH, ws, nW, ws).permute(0, 2, 1, 3)
        wins = wins.reshape(-1, ws * ws)
        mask = wins[:, None] - wins[:, :, None]
        mask = torch.where(mask != 0, torch.tensor(-100.0),
                           torch.tensor(0.0))
        attn = attn.view(B, nH * nW, heads, ws * ws, ws * ws)
        attn = attn + mask[None, :, None]
        attn = attn.view(-1, heads, ws * ws, ws * ws)

    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, ws * ws, C)
    out = out @ proj_w.T + proj_b
    out = out.view(B, nH, nW, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shift:
        out = torch.roll(out, (shift, shift), dims=(1, 2))
    return out


class OracleSwin(nn.Module):
    """torchvision naming/eval math: features.0 stem, odd stages, even
    merges; norm + head."""

    def __init__(self, depths=(1, 2), heads=(2, 4), dim=8, ws=4,
                 num_classes=5):
        super().__init__()
        self.depths, self.heads, self.ws = depths, heads, ws
        feats = []
        stem = nn.Sequential(nn.Conv2d(3, dim, 4, 4), nn.Identity(),
                             nn.LayerNorm(dim))
        feats.append(stem)
        d = dim
        for s in range(len(depths)):
            if s > 0:
                merge = nn.Module()
                merge.reduction = nn.Linear(4 * d, 2 * d, bias=False)
                merge.norm = nn.LayerNorm(4 * d)
                feats.append(merge)
                d *= 2
            stage = nn.ModuleList()
            for b in range(depths[s]):
                blk = nn.Module()
                blk.norm1 = nn.LayerNorm(d)
                blk.attn = nn.Module()
                blk.attn.qkv = nn.Linear(d, 3 * d)
                blk.attn.proj = nn.Linear(d, d)
                blk.attn.relative_position_bias_table = nn.Parameter(
                    torch.randn((2 * ws - 1) ** 2, heads[s]) * 0.02)
                blk.norm2 = nn.LayerNorm(d)
                blk.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                        nn.Identity(), nn.Linear(4 * d, d))
                stage.append(blk)
            feats.append(stage)
        self.features = nn.ModuleList(feats)
        self.norm = nn.LayerNorm(d)
        self.head = nn.Linear(d, num_classes)

    def forward(self, x):
        y = self.features[0][0](x).permute(0, 2, 3, 1)
        y = self.features[0][2](y)
        fi = 1
        for s in range(len(self.depths)):
            if s > 0:
                merge = self.features[fi]
                fi += 1
                x0 = y[:, 0::2, 0::2]
                x1 = y[:, 1::2, 0::2]
                x2 = y[:, 0::2, 1::2]
                x3 = y[:, 1::2, 1::2]
                y = torch.cat([x0, x1, x2, x3], -1)
                y = merge.reduction(merge.norm(y))
            for b, blk in enumerate(self.features[fi]):
                shift = 0 if b % 2 == 0 else self.ws // 2
                h = blk.norm1(y)
                a = shifted_window_attention_torch(
                    h, blk.attn.qkv.weight, blk.attn.qkv.bias,
                    blk.attn.proj.weight, blk.attn.proj.bias,
                    blk.attn.relative_position_bias_table, self.ws, shift,
                    self.heads[s])
                y = y + a
                y = y + blk.mlp(blk.norm2(y))
            fi += 1
        y = self.norm(y)
        y = y.mean(dim=(1, 2))
        return self.head(y)


def test_swin_converter_parity():
    torch.manual_seed(0)
    depths, heads = (1, 2), (2, 4)
    tm = OracleSwin(depths, heads, dim=8, ws=4, num_classes=5).eval()
    sd = tm.state_dict()
    # the stem conv lives at features.0.0 and LN at features.0.2; stages at
    # odd indices, merges at even — matching torchvision; rename Sequential
    # stage children to features.{2s+1}.{b}
    renamed = {}
    for k, v in sd.items():
        renamed[k] = v
    params = swin_from_torch(renamed, depths)
    jm = SwinTransformer(depths=depths, num_heads=heads, embed_dim=8,
                         window=4, num_classes=5)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) < 3e-4, np.max(np.abs(got - ref))
