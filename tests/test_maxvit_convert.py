"""MaxViT torchvision-converter parity vs a torchvision-naming torch oracle
(BN-MBConv + window/grid partition attention with relative position bias,
feat_dim**-0.5 attention scale, bias-free classifier head).

The oracle replicates torchvision/models/maxvit.py conventions (state-dict
key names and eval-time math) from the public architecture definition —
the weights behind the reference's correctly_classified_MAXVIT.txt
(util/class_maps/ImageNet/)."""
from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from xai_tpu.convert.torch_import import maxvit_from_torch
from xai_tpu.models.maxvit import MaxViTTV
from xai_tpu.models.swin import _rel_position_index

BN_EPS = 1e-3


class TVSqueezeExcitation(nn.Module):
    def __init__(self, input_c, squeeze_c):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_c, squeeze_c, 1)
        self.fc2 = nn.Conv2d(squeeze_c, input_c, 1)
        self.activation = nn.SiLU()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s


def _conv_norm_act(in_c, out_c, k, stride, padding, groups=1):
    return nn.Sequential(
        nn.Conv2d(in_c, out_c, k, stride, padding, groups=groups,
                  bias=False),
        nn.BatchNorm2d(out_c, eps=BN_EPS),
        nn.GELU(),
    )


class TVMBConv(nn.Module):
    def __init__(self, in_c, out_c, stride):
        super().__init__()
        if stride != 1 or in_c != out_c:
            proj = [nn.Conv2d(in_c, out_c, 1, bias=True)]
            if stride == 2:
                proj = [nn.AvgPool2d(3, stride=2, padding=1)] + proj
            self.proj = nn.Sequential(*proj)
        else:
            self.proj = nn.Identity()
        mid, sqz = out_c * 4, out_c // 4
        self.layers = nn.Sequential(OrderedDict(
            pre_norm=nn.BatchNorm2d(in_c, eps=BN_EPS),
            conv_a=_conv_norm_act(in_c, mid, 1, 1, 0),
            conv_b=_conv_norm_act(mid, mid, 3, stride, 1, groups=mid),
            squeeze_excitation=TVSqueezeExcitation(mid, sqz),
            conv_c=nn.Conv2d(mid, out_c, 1, bias=True),
        ))

    def forward(self, x):
        return self.proj(x) + self.layers(x)


class TVRelAttention(nn.Module):
    """RelativePositionalMultiHeadAttention: note the feat_dim**-0.5 scale
    (not head_dim**-0.5) — torchvision's convention."""

    def __init__(self, dim, head_dim, seq_len):
        super().__init__()
        self.n_heads = dim // head_dim
        self.head_dim = head_dim
        self.size = int(seq_len ** 0.5)
        self.to_qkv = nn.Linear(dim, 3 * dim)
        self.scale_factor = dim ** -0.5
        self.merge = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.empty(((2 * self.size - 1) ** 2, self.n_heads)))
        self.register_buffer(
            "relative_position_index",
            torch.tensor(_rel_position_index(self.size)))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)

    def forward(self, x):
        B, G, P, D = x.shape
        H, DH = self.n_heads, self.head_dim
        qkv = self.to_qkv(x)
        q, k, v = qkv.chunk(3, -1)
        q = q.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        k = k.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        v = v.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        k = k * self.scale_factor
        dp = torch.einsum("bghid,bghjd->bghij", q, k)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)]
        bias = bias.reshape(P, P, H).permute(2, 0, 1)
        dp = (dp + bias[None, None]).softmax(-1)
        out = torch.einsum("bghij,bghjd->bghid", dp, v)
        out = out.permute(0, 1, 3, 2, 4).reshape(B, G, P, D)
        return self.merge(out)


def _partition(x, p):
    """[B, C, H, W] -> [B, (H/p)*(W/p), p*p, C] (WindowPartition)."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // p, p, W // p, p)
    x = x.permute(0, 2, 4, 3, 5, 1)
    return x.reshape(B, (H // p) * (W // p), p * p, C)


def _departition(x, p, gh, gw):
    B, G, PP, C = x.shape
    x = x.reshape(B, gh, gw, p, p, C)
    x = x.permute(0, 5, 1, 3, 2, 4)
    return x.reshape(B, C, gh * p, gw * p)


class TVPartitionAttention(nn.Module):
    def __init__(self, dim, head_dim, partition_size, grid_size, kind):
        super().__init__()
        n_partitions = grid_size // partition_size
        self.p = partition_size if kind == "window" else n_partitions
        self.grid = kind == "grid"
        self.grid_size = grid_size
        self.attn_layer = nn.Sequential(
            nn.LayerNorm(dim),
            TVRelAttention(dim, head_dim, partition_size ** 2),
            nn.Dropout(0.0),
        )
        self.mlp_layer = nn.Sequential(
            nn.LayerNorm(dim),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        gh = gw = self.grid_size // self.p
        x = _partition(x, self.p)
        if self.grid:
            x = x.swapaxes(-2, -3)
        x = x + self.attn_layer(x)
        x = x + self.mlp_layer(x)
        if self.grid:
            x = x.swapaxes(-2, -3)
        return _departition(x, self.p, gh, gw)


class TVMaxVitLayer(nn.Module):
    def __init__(self, in_c, out_c, stride, head_dim, p, grid_size):
        super().__init__()
        self.layers = nn.Sequential(OrderedDict(
            MBconv=TVMBConv(in_c, out_c, stride),
            window_attention=TVPartitionAttention(
                out_c, head_dim, p, grid_size, "window"),
            grid_attention=TVPartitionAttention(
                out_c, head_dim, p, grid_size, "grid"),
        ))

    def forward(self, x):
        return self.layers(x)


class TVMaxVitBlock(nn.Module):
    def __init__(self, in_c, out_c, depth, head_dim, p, grid_size):
        super().__init__()
        self.layers = nn.ModuleList([
            TVMaxVitLayer(in_c if i == 0 else out_c, out_c,
                          2 if i == 0 else 1, head_dim, p, grid_size)
            for i in range(depth)])

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        return x


class TVMaxVit(nn.Module):
    def __init__(self, input_size=64, stem_c=16, dims=(16, 32),
                 depths=(1, 1), head_dim=8, p=4, num_classes=10):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Sequential(nn.Conv2d(3, stem_c, 3, 2, 1, bias=False),
                          nn.BatchNorm2d(stem_c, eps=BN_EPS), nn.GELU()),
            nn.Sequential(nn.Conv2d(stem_c, stem_c, 3, 1, 1, bias=True)),
        )
        self.blocks = nn.ModuleList()
        in_c, size = stem_c, input_size // 2
        for depth, dim in zip(depths, dims):
            size //= 2
            self.blocks.append(
                TVMaxVitBlock(in_c, dim, depth, head_dim, p, size))
            in_c = dim
        self.classifier = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Flatten(),
            nn.LayerNorm(dims[-1]),
            nn.Linear(dims[-1], dims[-1]), nn.Tanh(),
            nn.Linear(dims[-1], num_classes, bias=False),
        )

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.classifier(x)


def test_maxvit_converter_logits_match_oracle():
    torch.manual_seed(0)
    oracle = TVMaxVit().eval()
    # randomize BN running stats so the fold is actually exercised
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.6, 1.5)

    params = maxvit_from_torch(oracle.state_dict(), depths=(1, 1))
    model = MaxViTTV(depths=(1, 1), dims=(16, 32), stem_dim=16, window=4,
                     head_dim=8, num_classes=10)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


def test_maxvit_tv_param_structure_covers_state_dict():
    """Every torch weight lands somewhere in the converted tree (no silently
    dropped tensors) and the flax init tree has the same leaf set."""
    oracle = TVMaxVit().eval()
    sd = {k: v for k, v in oracle.state_dict().items()
          if "relative_position_index" not in k
          and "num_batches_tracked" not in k}
    params = maxvit_from_torch(sd, depths=(1, 1))

    def leaves(t, pre=""):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from leaves(v, pre + k + "/")
        else:
            yield pre, np.asarray(t)

    got = dict(leaves(params))
    # BN folding merges 4 tensors -> 2; all other torch params map 1:1
    n_bn = sum(1 for k in sd if k.endswith("running_mean"))
    assert len(got) == len(sd) - 2 * n_bn

    model = MaxViTTV(depths=(1, 1), dims=(16, 32), stem_dim=16, window=4,
                     head_dim=8, num_classes=10)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))["params"]
    init_leaves = dict(leaves(init))
    assert set(init_leaves) == set(got)
    for k in got:
        assert init_leaves[k].shape == got[k].shape, k
