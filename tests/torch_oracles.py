"""Minimal PyTorch oracle models used ONLY as numerical ground truth.

These replicate the *conventions* (layer names, shapes, eval-time math) of
torchvision ResNet and timm ViT so the weight converter and the Flax models
can be validated without network access to pretrained weights.  Written from
the public architecture definitions — not copied from the reference tree.
"""
import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, groups=1, base_width=64,
                 downsample=None):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=False)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """torchvision-compatible naming: conv1/bn1/layerN.M.*/fc."""

    def __init__(self, layers, num_classes=1000, groups=1, width_per_group=64):
        super().__init__()
        self.groups = groups
        self.base_width = width_per_group
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=False)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, self.groups,
                             self.base_width, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes, 1, self.groups,
                                     self.base_width))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        a = torch.softmax((q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5,
                          dim=-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        return x + h


class TorchViT(nn.Module):
    """timm-compatible naming: patch_embed.proj, cls_token, pos_embed,
    blocks.N.*, norm, head."""

    def __init__(self, patch=16, dim=64, depth=2, heads=4, img=224,
                 num_classes=10):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2 + 1
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        y = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        y = torch.cat([self.cls_token.expand(B, -1, -1), y], dim=1)
        y = y + self.pos_embed
        for blk in self.blocks:
            y = blk(y)
        y = self.norm(y)
        return self.head(y[:, 0])


class TorchVGG(nn.Module):
    """torchvision-compatible naming: features.N, classifier.{0,3,6}."""

    def __init__(self, cfg=(8, "M", 16, "M"), num_classes=10, img=32):
        super().__init__()
        layers = []
        c_in = 3
        for c in cfg:
            if c == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, c, 3, padding=1),
                           nn.ReLU(inplace=False)]
                c_in = c
        self.features = nn.Sequential(*layers)
        pools = sum(1 for c in cfg if c == "M")
        spatial = img // (2 ** pools)
        feat = c_in * spatial * spatial
        self.classifier = nn.Sequential(
            nn.Linear(feat, 32), nn.ReLU(inplace=False), nn.Dropout(0.0),
            nn.Linear(32, 32), nn.ReLU(inplace=False), nn.Dropout(0.0),
            nn.Linear(32, num_classes),
        )

    def forward(self, x):
        return self.classifier(self.features(x).flatten(1))
