"""Load the ACTUAL reference modules from /root/reference as parity oracles.

Round-1 parity tests compared against builder-written transliterations; a
shared misreading would pass both.  These helpers import the reference's own
Python files so the oracle and the implementation no longer share an author.

The reference imports a few packages this image lacks (timm, torchvision,
cvxopt, fast_pytorch_kmeans).  ``_install_stubs`` registers minimal
API-compatible stand-ins — only for the surface the imported files touch in
the tested code paths; anything else raises loudly.  The timm layer stubs
(PatchEmbed / Mlp / DropPath) are real implementations of those public-API
layers because ViT_new_timm composes them into the forward math.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"


class _PatchEmbed(nn.Module):
    """timm.models.layers.PatchEmbed public behavior (conv proj -> tokens)."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768, norm_layer=None, flatten=True):
        super().__init__()
        self.img_size = (img_size, img_size)
        self.patch_size = (patch_size, patch_size)
        self.grid_size = (img_size // patch_size, img_size // patch_size)
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)
        return self.norm(x)


class _Mlp(nn.Module):
    """timm.models.layers.Mlp public behavior (fc1 -> act -> fc2)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):  # eval-time identity; tests never train
        return x


def _unavailable(name):
    def f(*a, **k):
        raise RuntimeError(f"stubbed {name} was called — the parity tests "
                           "must not reach this path")
    return f


def _unavailable_cls(name):
    """Constructible-but-unusable stub: modules build transform objects at
    import time (e.g. generate_emap's module-level Compose([ToTensor(), ..]));
    only *applying* them must fail."""
    class C:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError(f"stubbed {name} was applied — the parity "
                               "tests must not reach this path")
    C.__name__ = name
    return C


class _TorchResize:
    """Functional replica of torchvision.transforms.Resize for TENSOR
    inputs with an explicit (h, w) size: torchvision's tensor path calls
    the very same torch kernel (F.interpolate bilinear, half-pixel,
    antialias flag) — no torchvision needed."""

    def __init__(self, size, interpolation=None, antialias=None, **kw):
        # int = shorter-side resize; equals (s, s) for the square inputs
        # used throughout the reference
        self.size = [size, size] if isinstance(size, int) else list(size)
        self.mode = ("nearest-exact"
                     if str(interpolation) == "nearest-exact" else "bilinear")
        self.antialias = bool(antialias) and self.mode == "bilinear"

    def __call__(self, t):
        import torch.nn.functional as F
        if not torch.is_tensor(t):
            raise RuntimeError("_TorchResize supports tensors only")
        if self.size[0] == self.size[1] and t.shape[-1] != t.shape[-2]:
            raise RuntimeError("_TorchResize int-size needs square input")
        nd = t.dim()
        x = t[None] if nd == 3 else t
        kw = {"antialias": True} if self.antialias else {}
        out = F.interpolate(x, size=self.size, mode=self.mode,
                            **({"align_corners": False}
                               if self.mode == "bilinear" else {}), **kw)
        return out[0] if nd == 3 else out


class _Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, t):
        for f in self.fns:
            t = f(t)
        return t


def _cvx_matrix(data, size=None, tc=None):
    """cvxopt.matrix replica: dense float array, column-major reshape."""
    import numpy as _np
    arr = _np.asarray(data, dtype=float)
    if size is not None:
        arr = arr.reshape(size, order="F")
    return arr


def _cvx_qp(Q, c, G=None, h=None, A=None, b=None):
    """cvxopt.solvers.qp replica for the small dense QPs in the reference
    (min 1/2 x'Qx + c'x s.t. Gx<=h, Ax=b) — an INDEPENDENT oracle solver
    (scipy SLSQP), so parity tests of our projection code don't compare it
    against itself."""
    import numpy as _np
    from scipy import optimize
    Qm = _np.asarray(Q, float)
    cm = _np.asarray(c, float).reshape(-1)
    n = cm.size
    cons = []
    if G is not None:
        Gm = _np.asarray(G, float)
        hm = _np.asarray(h, float).reshape(-1)
        cons.append({"type": "ineq", "fun": lambda x: hm - Gm @ x,
                     "jac": lambda x: -Gm})
    if A is not None:
        Am = _np.asarray(A, float).reshape(-1, n)
        bm = _np.asarray(b, float).reshape(-1)
        cons.append({"type": "eq", "fun": lambda x: Am @ x - bm,
                     "jac": lambda x: Am})
    x0 = _np.clip(_np.linalg.lstsq(Qm, -cm, rcond=None)[0], 0.0, 1.0)
    res = optimize.minimize(
        lambda x: 0.5 * x @ Qm @ x + cm @ x, x0,
        jac=lambda x: Qm @ x + cm, constraints=cons, method="SLSQP",
        options={"maxiter": 1000, "ftol": 1e-14})
    return {"x": res.x.reshape(-1, 1),
            "status": "optimal" if res.success else str(res.message)}


def _mod(name, **attrs):
    import importlib.machinery
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() on the stub works
    # (transformers probes optional deps that way)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    if "timm" not in sys.modules:
        timm = _mod("timm")
        timm.data = _mod(
            "timm.data",
            IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
            IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225),
            IMAGENET_INCEPTION_MEAN=(0.5, 0.5, 0.5),
            IMAGENET_INCEPTION_STD=(0.5, 0.5, 0.5))
        timm.models = _mod("timm.models")
        timm.models.helpers = _mod(
            "timm.models.helpers",
            build_model_with_cfg=_unavailable("build_model_with_cfg"),
            named_apply=_unavailable("named_apply"),
            adapt_input_conv=_unavailable("adapt_input_conv"))
        timm.models.layers = _mod(
            "timm.models.layers",
            PatchEmbed=_PatchEmbed, Mlp=_Mlp, DropPath=_DropPath,
            trunc_normal_=nn.init.trunc_normal_,
            lecun_normal_=lambda w: nn.init.trunc_normal_(w, std=0.02))
        timm.models.registry = _mod(
            "timm.models.registry", register_model=lambda fn: fn)
    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        tv.transforms = _mod(
            "torchvision.transforms",
            Normalize=_unavailable_cls("tv.Normalize"),
            Compose=_Compose,
            InterpolationMode=types.SimpleNamespace(
                BICUBIC="bicubic", NEAREST_EXACT="nearest-exact",
                BILINEAR="bilinear"),
            ToTensor=_unavailable_cls("tv.ToTensor"),
            Resize=_TorchResize,
            CenterCrop=_unavailable_cls("tv.CenterCrop"),
            RandomResizedCrop=_unavailable_cls("tv.RandomResizedCrop"))
        tv.transforms.functional = _mod(
            "torchvision.transforms.functional",
            to_pil_image=_unavailable("tv.to_pil_image"))
        tv.models = _mod("torchvision.models")
    if "ttach" not in sys.modules:
        _mod("ttach",                   # test-time augmentation, only used
             Compose=_unavailable("ttach.Compose"),       # by base_cam's
             HorizontalFlip=_unavailable("ttach.HFlip"),  # aug_smooth path
             Multiply=_unavailable("ttach.Multiply"))
    if "cvxopt" not in sys.modules:
        _mod("cvxopt",
             matrix=_cvx_matrix,
             solvers=types.SimpleNamespace(qp=_cvx_qp, options={}))
    if "fast_pytorch_kmeans" not in sys.modules:
        _mod("fast_pytorch_kmeans", KMeans=_unavailable("KMeans"))
    if "skimage" not in sys.modules:
        # XRAIBuilder imports these at module top; the tested greedy core
        # (_xrai/_xrai_fast) receives precomputed masks and never calls them
        sk = _mod("skimage")
        sk.segmentation = _mod(
            "skimage.segmentation",
            felzenszwalb=_unavailable("skimage felzenszwalb"),
            slic=_unavailable("skimage slic"),
            quickshift=_unavailable("skimage quickshift"))
        sk.morphology = _mod(
            "skimage.morphology",
            dilation=_unavailable("skimage dilation"),
            disk=_unavailable("skimage disk"))
        sk.transform = _mod(
            "skimage.transform", resize=_unavailable("skimage resize"))
        sk.io = _mod("skimage.io", imsave=_unavailable("skimage imsave"))
        sk.feature = _mod("skimage.feature",
                          canny=_unavailable("skimage canny"))
        sk.filters = _mod("skimage.filters")
        sk.util = _mod(
            "skimage.util",
            # float images pass through unchanged (the only use here:
            # MDAFunctions.py:602 on an already-float transformed image)
            img_as_float=lambda a: np.asarray(a, dtype=np.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else np.asarray(a, dtype=np.float64) / 255.0)
        sk.color = _mod("skimage.color",
                        gray2rgb=_unavailable("skimage gray2rgb"))
        sk.feature = _mod("skimage.feature", hog=_unavailable("skimage hog"))
        sk.metrics = _mod(
            "skimage.metrics",
            structural_similarity=_unavailable("skimage ssim"))
    if "ftfy" not in sys.modules:
        # identity is exact for the ASCII class prompts under test
        _mod("ftfy", fix_text=lambda s: s)
    import matplotlib
    matplotlib.use("Agg")


_cache = {}


def load_ref(relpath: str, name: str):
    """Import a reference file by path under a private module name."""
    if name in _cache:
        return _cache[name]
    _install_stubs()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def load_saliency_methods():
    return load_ref("util/attribution_methods/saliencyMethods.py",
                    "_ref_saliency_methods")


def load_agi():
    return load_ref("util/attribution_methods/AGI.py", "_ref_agi")


def load_mas_test_functions():
    return load_ref("util/test_methods/MASTestFunctions.py", "_ref_mas")


def load_rise_test_functions():
    return load_ref("util/test_methods/RISETestFunctions.py", "_ref_rise")


def load_clip_tokenizer():
    mod = load_ref(
        "util/attribution_methods/CLIP/CLIP_Surgery/clip/simple_tokenizer.py",
        "_ref_clip_tokenizer")
    return mod


def load_gig():
    return load_ref("util/attribution_methods/GIGBuilder.py", "_ref_gig")


def load_xrai():
    return load_ref("util/attribution_methods/XRAIBuilder.py", "_ref_xrai")


def load_aic():
    return load_ref("util/test_methods/AICTestFunctions.py", "_ref_aic")


def load_monotonicity():
    return load_ref("util/test_methods/MonotonicityTest.py", "_ref_mono")


def load_posneg():
    return load_ref("util/test_methods/PosNegPertFunctions.py",
                    "_ref_posneg")


def load_pic():
    return load_ref("util/test_methods/PICTestFunctions.py", "_ref_pic")


def load_clip_surgery_model():
    """The vendored openai-naming CLIP model class (CLIP_Surgery fork)."""
    return load_ref(
        "util/attribution_methods/CLIP/CLIP_Surgery/clip/clip_model.py",
        "_ref_clip_surgery_model")


def load_generate_emap():
    """The CLIP explainer hub (eclip/maskclip/selfattn + dense encode) —
    loaded as a package: it relative-imports the vendored CLIP forks."""
    name = "_ref_clip_pkg"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    if "clip" not in sys.modules:
        _mod("clip", tokenize=_unavailable("clip.tokenize"),
             load=_unavailable("clip.load"))
    import importlib
    base = f"{REF}/util/attribution_methods/CLIP"
    pkg = types.ModuleType(name)          # no __init__.py in the folder:
    pkg.__path__ = [base]                 # synthesize a namespace package
    sys.modules[name] = pkg
    mod = importlib.import_module(f"{name}.generate_emap")
    _cache[name] = mod
    return mod


def load_mda():
    """MDAFunctions.py — needs `util.*` absolute imports (MASTestFunctions)
    resolvable, so /root/reference goes on sys.path for the import."""
    name = "_ref_mda"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        mod = load_ref("util/attribution_methods/MDAFunctions.py", name)
    finally:
        sys.path.remove(REF)
    return mod


def load_mas_calibrate():
    """MASCalibrate.py (differentiable MAS + refine_attribution) — same
    util.* absolute-import handling as MDAFunctions."""
    name = "_ref_mas_calibrate"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        mod = load_ref("util/attribution_methods/MASCalibrate.py", name)
    finally:
        sys.path.remove(REF)
    return mod


def load_lime():
    """The vendored LIME package (lime_image + lime_base) as a package for
    its relative imports.  skimage stays stubbed — callers must pass
    segmentation_fn (the golden shared-segment protocol does)."""
    name = "_ref_lime"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    import importlib
    pkg = types.ModuleType(name)
    pkg.__path__ = [f"{REF}/util/attribution_methods/lime"]
    sys.modules[name] = pkg
    mod = importlib.import_module(f"{name}.lime_image")
    _cache[name] = mod
    return mod


def load_tis(kmeans_cls=None):
    """TIS.py with an injectable KMeans class (the shared-centroid
    protocol, tests/test_reference_parity_tis.py).  The isinstance ladders
    in TIS need torchvision/timm VisionTransformer type symbols."""
    _install_stubs()
    import torch.nn as nn
    tvm = sys.modules["torchvision.models"]
    if not hasattr(tvm, "VisionTransformer"):
        tvm.VisionTransformer = type("VisionTransformer", (nn.Module,), {})
    if "timm.models.vision_transformer" not in sys.modules:
        vt = types.ModuleType("timm.models.vision_transformer")
        vt.VisionTransformer = type("TimmVIT", (nn.Module,), {})
        sys.modules["timm.models.vision_transformer"] = vt
        sys.modules["timm.models"].vision_transformer = vt
        sys.modules["timm.models"].__path__ = []
    if kmeans_cls is not None:
        sys.modules["fast_pytorch_kmeans"].KMeans = kmeans_cls
    return load_ref("util/attribution_methods/TIS.py", "_ref_tis")


def load_vit_cx():
    """The reference's ViT-CX package (clustered-mask causal scoring) —
    relative imports (.get_feature_map, .causal_score) need a package."""
    name = "_ref_vit_cx"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    import importlib
    pkg = types.ModuleType(name)
    pkg.__path__ = [f"{REF}/util/attribution_methods/ViT_CX"]
    sys.modules[name] = pkg
    mod = importlib.import_module(f"{name}.ViT_CX")
    _cache[name] = mod
    return mod


def load_mm_clip_model():
    """The Game_MM_CLIP fork's hookable CLIP model class (clip/model.py with
    auxilary.MultiheadAttention attn_probs capture)."""
    load_generate_emap()
    return sys.modules["_ref_clip_pkg.Game_MM_CLIP.clip.model"]


def load_vit_lrp_timm():
    """Load the reference's relprop LRP ViT (ViT_LRP_timm.py).  It uses
    relative imports (.util.layers_ours), so it is loaded as a proper
    package with submodule search locations."""
    name = "_ref_vit_lrp_pkg"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    import importlib
    base = f"{REF}/util/attribution_methods/VIT_LRP"
    spec = importlib.util.spec_from_file_location(
        name, f"{base}/__init__.py", submodule_search_locations=[base])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[name] = pkg
    spec.loader.exec_module(pkg)
    mod = importlib.import_module(f"{name}.ViT_LRP_timm")
    _cache[name] = mod
    return mod


def load_vit_new_timm():
    return load_ref("util/attribution_methods/VIT_LRP/ViT_new_timm.py",
                    "_ref_vit_new_timm")


def load_vit_explanation_generator():
    return load_ref(
        "util/attribution_methods/VIT_LRP/ViT_explanation_generator.py",
        "_ref_vit_explgen")


def load_util_module(dotted: str):
    """Import a module from the reference's real `util` package (for files
    with relative imports like MACBuilder's `from ..test_methods import`)."""
    if dotted in _cache:
        return _cache[dotted]
    _install_stubs()
    import importlib
    sys.path.insert(0, REF)
    try:
        mod = importlib.import_module(dotted)
    finally:
        sys.path.remove(REF)
    _cache[dotted] = mod
    return mod


def load_evaluate_perturbation(workdir: str):
    """Import the reference's FLAGSHIP DRIVER MODULE itself
    (XAI_Survey/evaluations/evaluatePerturbation.py) for driver-vs-driver
    wiring parity (gate order, per-class quota, Counter accumulation, CSV
    layout).

    ``workdir`` must mimic the reference layout: it becomes the cwd for the
    import AND must stay the cwd for evaluate_perturbation() calls —
    the module reads ``../../util/class_maps/ImageNet/*`` relative to cwd
    at import and run time, and writes ``pert_test_results/`` into cwd.
    Use :func:`make_driver_sandbox` to build it.
    """
    name = "_ref_eval_pert"
    if name in _cache:
        return _cache[name]
    _install_stubs()
    import torch.nn as nn

    # extra stubs only this module's import chain needs
    tvm = sys.modules["torchvision.models"]
    if not hasattr(tvm, "VisionTransformer"):
        tvm.VisionTransformer = type("VisionTransformer", (nn.Module,), {})
    if "timm.models.vision_transformer" not in sys.modules:
        vt = _mod("timm.models.vision_transformer")
        vt.VisionTransformer = type("TimmVIT", (nn.Module,), {})
        sys.modules["timm.models"].vision_transformer = vt
        sys.modules["timm.models"].__path__ = []
    if "captum" not in sys.modules:
        cap = _mod("captum")
        cap.attr = _mod(
            "captum.attr",
            **{n: _unavailable_cls(f"captum.{n}") for n in
               ("GuidedBackprop", "LayerGradCam", "GradientShap",
                "GuidedGradCam", "FeatureAblation", "Occlusion",
                "ShapleyValueSampling")})
    if "clip" not in sys.modules:
        _mod("clip", tokenize=_unavailable("clip.tokenize"),
             load=_unavailable("clip.load"))

    sys.path.insert(0, REF)
    old = os.getcwd()
    os.chdir(workdir)
    try:
        mod = load_ref("XAI_Survey/evaluations/evaluatePerturbation.py",
                       name)
    finally:
        os.chdir(old)
        sys.path.remove(REF)
    return mod


def make_driver_sandbox(tmp_path, model_name: str = "R50"):
    """Create the relative-path layout evaluatePerturbation.py expects:
    <tmp>/XAI_Survey/evaluations (the cwd) and
    <tmp>/util/class_maps/ImageNet with the three import-time text files
    (symlinked read-only from the reference) plus an all-ones
    correctly_classified_<model>.txt.  Returns the cwd path."""
    import numpy as np

    cwd = os.path.join(str(tmp_path), "XAI_Survey", "evaluations")
    maps = os.path.join(str(tmp_path), "util", "class_maps", "ImageNet")
    os.makedirs(cwd, exist_ok=True)
    os.makedirs(maps, exist_ok=True)
    for f in ("ILSVRC2012_validation_ground_truth.txt", "map_clsloc.txt",
              "imagenet_classes.txt"):
        dst = os.path.join(maps, f)
        if not os.path.exists(dst):
            os.symlink(f"{REF}/util/class_maps/ImageNet/{f}", dst)
    np.savetxt(os.path.join(maps,
                            f"correctly_classified_{model_name}.txt"),
               np.ones(50000, np.int64), fmt="%d")
    return cwd
