"""Direct TIS oracle parity via shared injected centroids (VERDICT r2).

fast_pytorch_kmeans is absent from this image and kmeans outputs are not
comparable across libraries anyway — but everything AFTER the centroids
(top-k binary masks, token-drop forwards through pos_drop, score-weighted
coverage-corrected saliency, TIS.py:159-365) is deterministic.  So both
sides receive the SAME centroid matrix: the reference through a KMeans
stand-in whose .fit() installs it, ours through the ``centroids``
parameter, on shared converted weights.
"""
import sys

import numpy as np
import pytest
import torch

import reference_loader as rl


class _InjectedKMeans:
    centroids_to_inject = None

    def __init__(self, n_clusters, mode="euclidean", verbose=False):
        self.n_clusters = n_clusters

    def fit(self, X):
        c = _InjectedKMeans.centroids_to_inject
        assert c is not None and c.shape[0] == self.n_clusters
        self.centroids = torch.as_tensor(c, dtype=torch.float32)


def _load_ref_tis():
    rl._install_stubs()
    import torch.nn as nn
    tvm = sys.modules["torchvision.models"]
    if not hasattr(tvm, "VisionTransformer"):
        tvm.VisionTransformer = type("VisionTransformer", (nn.Module,), {})
    if "timm.models.vision_transformer" not in sys.modules:
        import types
        vt = types.ModuleType("timm.models.vision_transformer")
        vt.VisionTransformer = type("TimmVIT", (nn.Module,), {})
        sys.modules["timm.models.vision_transformer"] = vt
        sys.modules["timm.models"].vision_transformer = vt
        sys.modules["timm.models"].__path__ = []
    sys.modules["fast_pytorch_kmeans"].KMeans = _InjectedKMeans
    return rl.load_ref("util/attribution_methods/TIS.py", "_ref_tis")


def test_tis_matches_reference_with_shared_centroids():
    from xai_tpu.convert import vit_from_torch
    from xai_tpu.methods.tis import tis
    from xai_tpu.models import vit as jvit
    from xai_tpu.models.common import ModelBundle, ModelMeta

    tis_mod = _load_ref_tis()
    vn = rl.load_vit_new_timm()

    torch.manual_seed(2)
    tm = vn.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=2, num_heads=4, num_classes=13).eval()
    with torch.no_grad():
        tm.cls_token.normal_(0, 0.5)
        tm.pos_embed.normal_(0, 0.5)
        tm.head.weight.normal_(0, 0.2)
        tm.head.bias.normal_(0, 0.2)
    params = vit_from_torch(tm.state_dict(), depth=2)

    cfg = jvit.ViTConfig(patch=8, embed_dim=32, depth=2, num_heads=4,
                         num_classes=13, img_hw=32)
    jm = jvit.VisionTransformer(cfg)
    meta = ModelMeta(name="tiny_tis", family="vit", img_hw=32,
                     num_classes=13, num_patches=4, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=lambda p, x: jm.apply({"params": p}, x),
        apply_taps=lambda p, x: jm.apply({"params": p}, x, taps=True),
        apply_tokens=lambda p, x, ti: jm.apply({"params": p}, x,
                                               token_indices=ti),
        extras=cfg)

    rs = np.random.RandomState(4)
    x = rs.randn(1, 3, 32, 32).astype(np.float32)
    n_masks, n_tokens = 8, 16
    centroids = rs.rand(n_masks, n_tokens).astype(np.float32)
    _InjectedKMeans.centroids_to_inject = centroids

    ref = tis_mod.TIS(tm, n_masks=n_masks, batch_size=4, verbose=False)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    import jax.numpy as jnp
    got = np.asarray(tis(bundle, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         n_masks=n_masks, batch_size=4,
                         centroids=centroids))
    assert want.shape == got.shape == (4, 4)
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
