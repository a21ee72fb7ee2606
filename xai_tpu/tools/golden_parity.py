"""One-command real-pretrained-weights golden-parity workflow (VERDICT r3 #5).

Usage (on a machine that HAS the torch checkpoints)::

    python -m xai_tpu.tools.golden_parity \
        --checkpoints /path/to/ckpts --images /path/to/imagenet_val \
        --models R101,VIT16 --image_count 10 --out golden_report

For each model it

1. loads the torch checkpoint ``<checkpoints>/<MODEL>.{pth,pt,bin}`` (a
   state dict — the file torchvision/timm/openai-CLIP downloads resolve
   to; reference weight construction anchor:
   XAI_Survey/evaluations/evaluatePerturbation.py:627-677),
2. instantiates the REFERENCE's own model code from /root/reference
   (vendored torchvision resnet, ViT_new_timm + ViT_LRP_timm, the
   CLIP_Surgery openai-format CLIP) and loads the state dict into it,
3. converts the SAME loaded weights to a Flax pytree
   (xai_tpu.convert.torch_import) and builds the production bundle through
   the runners' own wiring (save_params + build_bundle),
4. per (method x image) runs the reference attribution and the rebuild on
   the identical preprocessed tensor,
5. scores relative L-inf and Spearman rank correlation of the driver's
   2-D maps against the documented per-method tolerances (PARITY.md).

Artifacts: ``<out>.jsonl`` (one row per model x method x image) and
``<out>.md`` (the per-(model x method) verdict table).  Exit code 1 if any
(model x method) violates its tolerance.

The tool needs the repo checkout: reference loading reuses the
``tests/reference_loader`` stub machinery (captum/cvxopt/skimage etc. are
not importable in minimal environments).  It is a verification tool, not a
serving path.  CI guards the tool itself with random-init twins
(tests/test_golden_parity_tool.py) because pretrained downloads are
unavailable in the build environment.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
from typing import Any, Callable, Dict, Optional

import numpy as np


def _repo_root() -> str:
    return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))


def _reference_loader():
    root = _repo_root()
    if root not in sys.path:
        sys.path.insert(0, root)
    from tests import reference_loader as rl
    return rl


class SkipMethod(Exception):
    """A method whose golden path is intentionally not runnable here; the
    report carries the row as SKIP with this reason (non-fatal)."""


# ---------------------------------------------------------------------------
# documented per-method tolerances (PARITY.md; fp16 CLIP gets wider bars).
# Keys are registry names; "family:name" entries override on collisions.
# ---------------------------------------------------------------------------

TOLERANCES: Dict[str, tuple] = {
    # method: (relative L-inf on the 2-D driver map, min Spearman rho)
    # --- cnn (registry.py names) ---
    "grad": (1e-3, 0.999),
    "inp_x_grad": (1e-3, 0.999),
    "ig": (1e-3, 0.999),
    "lig": (1e-3, 0.999),
    "idg": (5e-3, 0.99),      # tiny-magnitude maps; scale-relative
    "idgi": (1e-3, 0.999),
    "agi": (5e-3, 0.99),      # PGD trajectory is argmax-sensitive
    "sg": (2e-3, 0.999),      # injected reference noise; 25x50 f32 accum
    "gig": (5e-3, 0.99),      # adaptive path search: quantile-sensitive
    "xrai": (1e-3, 0.999),    # shared segments + shared base attribution
    "lime": (2e-3, 0.999),    # shared segments+samples; signed ridge coefs
    "gc": (2e-3, 0.999),
    "gbp": (1e-3, 0.999),
    "ggc": (2e-3, 0.999),
    "gs": (2e-3, 0.999),      # injected captum rand draws
    "fa": (1e-3, 0.999),
    "occ": (1e-3, 0.999),
    "shap": (2e-3, 0.999),    # injected captum permutations
    # --- vit (registry_vit.py names) ---
    "attn": (1e-3, 0.999),
    "vit:grad": (1e-3, 0.999),
    "n_rollout": (1e-3, 0.999),
    "rollout": (1e-3, 0.999),
    "cam_attn": (1e-3, 0.999),
    "t_attn": (2e-3, 0.999),
    "attn_ig": (2e-3, 0.999),
    "attn_attr": (2e-3, 0.999),
    "bi_attn": (2e-3, 0.999),
    "InFlow": (2e-3, 0.999),
    "t_attr": (5e-3, 0.99),   # LRP: long product chains amplify rounding
    "TIS": (1e-3, 0.999),     # shared centroids
    "VIT_CX": (5e-3, 0.99),   # shared noise; clustering near-ties
    "MDA": (2e-2, 0.95),      # greedy argmax over near-tie insertions
    "calibrate": (5e-3, 0.99),   # MASCalibrator.refine_attribution core
    "mac": (5e-3, 0.99),         # MACBuilder.Denoise.clean_attribution
    # --- clip (registry_clip.py names; reference runs fp16,
    # generate_emap.py:315 -> wider bars) ---
    "eclip": (2e-2, 0.98),
    "eclip_nograd": (2e-2, 0.98),
    "eclip_wo": (2e-2, 0.98),
    "maskclip": (2e-2, 0.98),
    "selfattn": (2e-2, 0.98),
    "grad_cam": (2e-2, 0.98),
    "game": (2e-3, 0.99),
    "lrp": (2e-3, 0.99),
    "surgery": (1e-3, 0.999),
    "rise": (2e-3, 0.999),    # shared masks
}

# legacy golden-report names -> registry names
ALIASES = {"raw_attn": "attn", "rave": "InFlow",
           "clip_grad_cam": "grad_cam"}


def tol_for(family: str, method: str) -> tuple:
    return TOLERANCES.get(f"{family}:{method}",
                          TOLERANCES.get(method, (0.0, 1.0)))


# full registry surface per family (registry.py / registry_vit.py /
# registry_clip.py); names not pair-runnable raise SkipMethod with the
# documented reason (PARITY.md "Golden-parity coverage")
DEFAULT_METHODS = {
    "cnn": ["grad", "inp_x_grad", "ig", "lig", "idg", "idgi", "sg", "gig",
            "agi", "gc", "gbp", "ggc", "gs", "fa", "occ", "shap", "xrai",
            "lime", "rise"],
    "vit": ["attn", "grad", "cam_attn", "n_rollout", "rollout", "t_attn",
            "attn_ig", "attn_attr", "bi_attn", "InFlow", "t_attr", "TIS",
            "VIT_CX", "MDA", "MDA_dense", "calibrate", "mac"],
    "clip": ["eclip", "eclip_nograd", "eclip_wo", "maskclip", "selfattn",
             "game", "rollout", "lrp", "grad_cam", "rise", "surgery",
             "m2ib"],
}


# ---------------------------------------------------------------------------
# model pair construction (reference torch model + converted bundle)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Pair:
    name: str
    family: str
    img_hw: int
    tm: Any                       # reference torch model (main)
    bundle: Any                   # converted Flax bundle
    lrp_tm: Any = None            # ViT_LRP_timm model (t_attr)
    ge: Any = None                # generate_emap module (clip)
    mm_tm: Any = None             # Game_MM fork (game/rollout/lrp)
    surgery_tm: Any = None        # CLIPSurgery fork (surgery)
    tiny: bool = False            # CI twin: tiny vocab -> fixed tokens
    load_report: str = ""


def _load_ckpt(path: str):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def _bundle_from_params(model_name: str, params) -> Any:
    """Route the converted pytree through the PRODUCTION loader path
    (save_params -> build_bundle --params_path) so the tool verifies the
    same wiring a sweep run uses."""
    from ..runners.common import build_bundle, save_params
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "params.msgpack")
        save_params(params, p)
        return build_bundle(model_name, params_path=p)


_RESNET_LAYERS = {"R50": (3, 4, 6, 3), "R101": (3, 4, 23, 3),
                  "R152": (3, 8, 36, 3), "RNXT": (3, 4, 23, 3)}


def _build_cnn(rl, name: str, sd) -> Pair:
    from ..convert.torch_import import resnet_from_torch
    rn = rl.load_util_module("util.modified_models.resnet")
    if name == "RNXT":
        tm = rn.ResNet(rn.Bottleneck, list(_RESNET_LAYERS[name]),
                       groups=64, width_per_group=4)
    else:
        tm = rn.ResNet(rn.Bottleneck, list(_RESNET_LAYERS[name]))
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    tm = tm.eval()
    params = resnet_from_torch(tm.state_dict(), _RESNET_LAYERS[name])
    return Pair(name, "cnn", 224, tm, _bundle_from_params(name, params),
                load_report=f"missing={len(missing)} "
                            f"unexpected={len(unexpected)}")


def _build_vit(rl, name: str, sd) -> Pair:
    from ..convert.torch_import import vit_from_torch
    vt = rl.load_vit_new_timm()
    factory = {"VIT16": vt.vit_base_patch16_224,
               "VIT32": vt.vit_base_patch32_224}[name]
    tm = factory(pretrained=False)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    tm = tm.eval()
    params = vit_from_torch(tm.state_dict(), depth=12)
    lrp_pkg = rl.load_vit_lrp_timm()
    lrp_factory = {"VIT16": lrp_pkg.vit_base_patch16_224,
                   "VIT32": lrp_pkg.vit_base_patch32_224}[name]
    lrp_tm = lrp_factory(pretrained=False)
    lrp_tm.load_state_dict(sd, strict=False)
    lrp_tm = lrp_tm.eval()
    return Pair(name, "vit", 224, tm, _bundle_from_params(name, params),
                lrp_tm=lrp_tm,
                load_report=f"missing={len(missing)} "
                            f"unexpected={len(unexpected)}")


def _build_clip(rl, name: str, sd) -> Pair:
    import importlib
    from ..convert.torch_import import clip_from_torch
    ge = rl.load_generate_emap()
    bm = importlib.import_module(
        "_ref_clip_pkg.CLIP_Surgery.clip.build_model")
    tm = bm.build_model("ViT-B", {k: v for k, v in sd.items()}).eval()
    # emulate GPU clip.load dtype layout: the fork's build_model skips
    # convert_weights (build_model.py:72) so the tower would stay f32 and
    # clip_encode_dense's x.half() (generate_emap.py:315) would mismatch
    bm.convert_weights(tm)
    layers = len([k for k in sd
                  if k.startswith("visual.") and
                  k.endswith(".attn.in_proj_weight")])
    # the Game_MM hookable fork (game/rollout/lrp rows) + the CLIPSurgery
    # dual-path fork (surgery row), both from the SAME state dict; f32
    # throughout (_mm_from_sd skips the fork's convert_weights fp16
    # roundtrip so the comparison isolates the method numerics)
    mm_tm = _mm_from_sd(rl.load_mm_clip_model(), sd)
    surgery_tm = bm.build_model("CS-ViT-B",
                                {k: v for k, v in sd.items()}).float().eval()
    params = clip_from_torch(sd, vision_layers=layers, text_layers=12)
    return Pair(name, "clip", 224, tm, _bundle_from_params(name, params),
                ge=ge, mm_tm=mm_tm, surgery_tm=surgery_tm,
                load_report=f"vision_layers={layers}")


def _build_tiny_r(rl, name: str, sd) -> Pair:
    """Random-init twin for CI smoke runs (64px, 1 block per stage)."""
    from tests.torch_oracles import TorchResNet
    from ..convert.torch_import import resnet_from_torch
    layers = (1, 1, 1, 1)
    tm = TorchResNet(layers, num_classes=1000)
    tm.load_state_dict(sd)
    tm = tm.eval()
    params = resnet_from_torch(tm.state_dict(), layers)
    return Pair(name, "cnn", 64, tm, _bundle_from_params("TINY_R", params))


def _build_tiny_v(rl, name: str, sd) -> Pair:
    """Tiny ViT twin built on the reference's OWN instrumented ViT."""
    import jax
    import jax.numpy as jnp
    from ..convert.torch_import import vit_from_torch
    from ..models import vit as jvit
    from ..models.common import ModelBundle, ModelMeta
    vt = rl.load_vit_new_timm()
    tm = vt.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                              depth=3, num_heads=4, num_classes=13)
    tm.load_state_dict(sd)
    tm = tm.eval()
    params = vit_from_torch(tm.state_dict(), depth=3)
    cfg = jvit.ViTConfig(patch=8, embed_dim=32, depth=3, num_heads=4,
                         num_classes=13, img_hw=32)
    jm = jvit.VisionTransformer(cfg)
    meta = ModelMeta(name="TINY_V", family="vit", img_hw=32,
                     num_classes=13, num_patches=4, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=jax.jit(lambda p, x: jm.apply({"params": p}, x)),
        apply_taps=jax.jit(lambda p, x: jm.apply({"params": p}, x,
                                                 taps=True)),
        apply_probed=jax.jit(lambda p, x, pr: jm.apply(
            {"params": p}, x, probes=pr, taps=True)),
        apply_tokens=jax.jit(lambda p, x, ti: jm.apply(
            {"params": p}, x, token_indices=ti)),
        extras=cfg)
    lrp_pkg = rl.load_vit_lrp_timm()
    lrp_tm = lrp_pkg.VisionTransformer(img_size=32, patch_size=8,
                                       embed_dim=32, depth=3, num_heads=4,
                                       num_classes=13)
    lrp_tm.load_state_dict(sd, strict=False)
    lrp_tm = lrp_tm.eval()
    return Pair(name, "vit", 32, tm, bundle, lrp_tm=lrp_tm)


def _mm_from_sd(mm_mod, sd):
    """Construct the Game_MM fork's CLIP from a state dict with the same
    shape inference as its build_model (model.py:405-438) but WITHOUT the
    convert_weights fp16 roundtrip."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd if k.startswith("visual.")
                         and k.endswith(".attn.in_proj_weight")])
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    t_width = sd["ln_final.weight"].shape[0]
    model = mm_mod.CLIP(
        sd["text_projection"].shape[1], patch * grid, vision_layers,
        vision_width, patch, sd["positional_embedding"].shape[0],
        sd["token_embedding.weight"].shape[0], t_width,
        max(1, t_width // 64),
        len(set(k.split(".")[2] for k in sd
                if k.startswith("transformer.resblocks"))))
    model.load_state_dict(
        {k: v for k, v in sd.items()
         if k not in ("input_resolution", "context_length", "vocab_size")})
    return model.float().eval()


def _build_tiny_c(rl, name: str, sd) -> Pair:
    """Tiny CLIP twin: the SAME state dict through the reference's own
    build_model inferers (vanilla / Game_MM / CLIPSurgery) and our
    converter.  vision_width=64 and text_width=64 because the forks derive
    head counts as width // 64; vision_layers=6 because CLIPSurgery rewires
    resblocks[-6:] in place."""
    import importlib

    import jax
    from ..convert.torch_import import clip_from_torch
    from ..models import clip as clipmod
    from ..models.common import ModelBundle, ModelMeta
    ge = rl.load_generate_emap()
    bm = importlib.import_module(
        "_ref_clip_pkg.CLIP_Surgery.clip.build_model")
    mm_mod = rl.load_mm_clip_model()
    # the vanilla tower must be HALF like a GPU `clip.load` model
    # (convert_weights): clip_encode_dense casts its input to .half()
    # (generate_emap.py:315), so a floated model rejects it.  The fork's
    # build_model has convert_weights commented out (build_model.py:72),
    # leaving f32 regardless of sd dtype — apply it explicitly; the
    # model's own forward casts via .type(self.dtype), and fp16
    # conv/matmul run fine on CPU for these tiny shapes.
    tm = bm.build_model("ViT-B", {k: v for k, v in sd.items()}).eval()
    bm.convert_weights(tm)
    mm_tm = _mm_from_sd(mm_mod, sd)
    surgery_tm = bm.build_model("CS-ViT-B",
                                {k: v for k, v in sd.items()}).float().eval()
    params = clip_from_torch(sd, vision_layers=6, text_layers=2)
    cfg = clipmod.CLIPConfig(patch=8, vision_width=64, vision_layers=6,
                             vision_heads=1, embed_dim=16, text_width=64,
                             text_heads=1, text_layers=2, vocab_size=50,
                             context_length=12, img_hw=32)
    jm = clipmod.CLIP(cfg)
    meta = ModelMeta(name="TINY_C", family="clip", img_hw=32,
                     num_patches=4, num_classes=10, batch_size=8)
    bundle = ModelBundle(
        meta=meta, params=params,
        apply=jax.jit(lambda p, x: jm.apply(
            {"params": p}, x, method=clipmod.CLIP.encode_image)[:, 0]),
        apply_taps=jax.jit(lambda p, x: jm.apply(
            {"params": p}, x, taps=True,
            method=clipmod.CLIP.encode_image)),
        extras={"cfg": cfg, "model": jm})
    return Pair(name, "clip", 32, tm, bundle, ge=ge, mm_tm=mm_tm,
                surgery_tm=surgery_tm, tiny=True)


BUILDERS: Dict[str, Callable] = {
    "R50": _build_cnn, "R101": _build_cnn, "R152": _build_cnn,
    "RNXT": _build_cnn,
    "VIT16": _build_vit, "VIT32": _build_vit,
    "CLIP16": _build_clip, "CLIP32": _build_clip,
    "TINY_R": _build_tiny_r, "TINY_V": _build_tiny_v,
    "TINY_C": _build_tiny_c,
}


# ---------------------------------------------------------------------------
# method pairs: (reference map, rebuild map) on one shared input
# ---------------------------------------------------------------------------

def _t(x_hwc):
    import torch
    return torch.from_numpy(np.asarray(x_hwc).transpose(2, 0, 1))[None]


def _abs2d(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    if m.ndim == 3:       # CHW or HWC channel reduction, driver-style
        axis = 0 if m.shape[0] in (1, 3) else -1
        m = np.abs(m.sum(axis))
    return m


def _cnn_pair(method: str, pair: Pair, xn, x01, target: int, steps: int,
              rl, args=None) -> tuple:
    from ..methods import gradient as G
    sm = rl.load_saliency_methods()
    # the chunk must divide steps: the reference IG family silently
    # returns zeros otherwise (saliencyMethods.py:14-16)
    chunk = max(1, steps // 2)
    if steps % chunk:
        chunk = 1
    if method in ("ig", "lig"):
        a = 1.0 if method == "ig" else 0.9
        ref = sm.IG(_t(xn), pair.tm, steps, chunk, a, 0.0, "cpu",
                    target).detach().numpy()
        got = G.ig(pair.bundle, xn, target, steps=steps, alpha_star=a,
                   chunk=chunk)
    elif method == "idg":
        ref = sm.IDG(_t(xn), pair.tm, steps, chunk, 0.0, "cpu",
                     target).detach().numpy()
        got = G.idg(pair.bundle, xn, target, steps=steps, chunk=chunk)
    elif method == "idgi":
        ref = sm.IDGI(_t(xn), pair.tm, steps, chunk, 0.0, "cpu",
                      target).detach().numpy()
        got = G.idgi(pair.bundle, xn, target, steps=steps, chunk=chunk)
    elif method == "agi":
        import torch
        from ..methods import agi as jagi
        ragi = rl.load_agi()
        meta = pair.bundle.meta
        norm_model = torch.nn.Sequential(
            ragi.Normalize(meta.mean, meta.std), pair.tm).eval()
        selected = [0]            # driver config topk=1 -> range(0,999,1000)
        example = ragi.test(norm_model, "cpu", np.asarray(x01) * 255.0,
                            0.05, len(selected), selected,
                            max_iter=min(20, steps))
        got = jagi.agi_raw(pair.bundle, x01, selected, epsilon=0.05,
                           max_iter=min(20, steps))
        if not isinstance(example, tuple):
            # every selected class == prediction: reference returns 0s
            # (AGI.py:104-106) and the rebuild skips them all too
            ref = np.zeros(np.asarray(got).shape[:2])
        else:
            ref = example[2]
    else:
        return _cnn_pair_extra(method, pair, xn, x01, target, steps, rl,
                               args)
    return _abs2d(ref), _abs2d(np.asarray(got))


def _captum_attr():
    try:
        import captum.attr as ca
    except ImportError as e:
        raise SkipMethod(
            "captum not installed — the reference's gbp/gc/ggc/gs/fa/occ/"
            f"shap are captum 0.7 library calls ({e}); install captum "
            "next to the checkpoints to golden-verify these methods")
    # an importable module without __file__ is an in-process stub (the CI
    # reference_loader registers one so the reference's import chains
    # resolve) — treat it as not installed, not as a usable captum
    if not getattr(ca, "__file__", None):
        raise SkipMethod(
            "captum not installed — sys.modules holds a stub (no __file__)"
            "; the reference's gbp/gc/ggc/gs/fa/occ/shap are captum 0.7 "
            "library calls; install captum to golden-verify these methods")
    return ca


def _cnn_pair_extra(method: str, pair: Pair, xn, x01, target: int,
                    steps: int, rl, args=None) -> tuple:
    """The rest of the CNN ladder (evaluatePerturbation.py:99-181 +
    imagenet_seg_eval.py:160): reference code where it exists, captum at
    runtime for the captum calls, shared-randomness injection for the
    stochastic methods."""
    import torch
    import jax
    import jax.numpy as jnp
    from ..methods import gradient as G
    from ..methods import ablation as AB
    from ..methods import guided as GD
    from ..methods.gig import guided_ig as jguided_ig
    sm = rl.load_saliency_methods()
    tm = pair.tm
    t = _t(xn)
    # divisible chunk (the reference IG family zeros out otherwise,
    # saliencyMethods.py:14-16)
    chunk = max(1, steps // 2)
    if steps % chunk:
        chunk = 1
    hw = pair.img_hw
    key = jax.random.PRNGKey(0)

    if method == "grad":
        ti = t.clone().requires_grad_(True)
        ref, _ = sm.getGradientsParallel(ti, tm, target)
        ref = ref.detach().numpy()
        got = G.grad(pair.bundle, xn, target)
    elif method == "inp_x_grad":
        ti = t.clone().requires_grad_(True)
        g, _ = sm.getGradientsParallel(ti, tm, target)
        ref = (t.squeeze() * g).detach().numpy()
        got = G.inp_x_grad(pair.bundle, xn, target)
    elif method == "sg":
        # record the reference's torch.normal draws, inject into ours
        drawn = []
        orig_normal = torch.normal

        def rec(*a, **k):
            out = orig_normal(*a, **k)
            drawn.append(out.detach().numpy())
            return out

        samples = getattr(args, "sg_samples", 25) if args else 25
        # the reference smoothGrad hard-codes batch = steps/2
        # (saliencyMethods.py:196) and its IG zeros out on odd steps —
        # round to even on BOTH sides so the comparison stays valid
        sg_steps = steps - (steps % 2)
        torch.normal = rec
        try:
            torch.manual_seed(0)
            ref = sm.smoothGrad("IG", t, tm, sg_steps, 0.0, target, "cpu",
                                samples=samples).detach().numpy()
        finally:
            torch.normal = orig_normal
        noises = np.stack(drawn)[:, 0].transpose(0, 2, 3, 1)  # [S, H, W, 3]
        got = G.smooth_grad(pair.bundle, xn, target, key, "IG",
                            steps=sg_steps, noises=noises)
    elif method == "gig":
        rgig = rl.load_gig()
        ref = rgig.GuidedIG().GetMask(
            t, tm, "cpu", rgig.call_model_function,
            {"class_idx_str": int(target)},
            x_baseline=torch.zeros_like(t), x_steps=steps, max_dist=1.0,
            fraction=0.5).squeeze().numpy()
        got = jguided_ig(pair.bundle, xn, target, steps=steps,
                         fraction=0.5, max_dist=1.0)
    elif method == "xrai":
        # shared segments (OUR multiscale felzenszwalb; the reference
        # GetMask accepts them, XRAIBuilder.py:415-470) + shared base IG
        # (the reference's own, isolating the greedy growth; IG itself has
        # its own golden row)
        from ..methods import xrai as jxrai
        rxrai = rl.load_xrai()
        segs = jxrai.get_segments(np.asarray(xn))
        ref_ig = sm.IG(t, tm, steps, chunk, 1.0, 0.0, "cpu",
                       target).detach()
        ref = rxrai.XRAI().GetMask(
            t.squeeze().permute(1, 2, 0).numpy(),
            base_attribution=ref_ig.permute(1, 2, 0).numpy(),
            segments=[m.copy() for m in segs])
        got = jxrai.xrai(np.asarray(xn),
                         np.asarray(ref_ig.permute(1, 2, 0)), segs=segs)
    elif method == "lime":
        # shared quickshift labels (exported from the fused pipeline) +
        # shared sample matrix (replaying vendored lime's random_state
        # draws, lime_image.py data_labels)
        from ..methods.lime import lime_batch, lime_segments
        lm = rl.load_lime()
        labels, nseg = lime_segments(np.asarray(x01, np.float32))
        S = getattr(args, "lime_samples", 1000) if args else 1000
        seed_rs = np.random.RandomState(0)
        rows = seed_rs.randint(0, 2, S * nseg).reshape(S, nseg)
        rows[0, :] = 1
        explainer = lm.LimeImageExplainer(
            random_state=np.random.RandomState(0))
        explanation = explainer.explain_instance(
            np.asarray(x01, np.float32), _lime_batch_predict(rl),
            tm, "cpu", top_labels=5, hide_color=0, num_samples=S,
            segmentation_fn=lambda img: labels)
        _, mask = explanation.get_image_and_mask(
            explanation.top_labels[0], positive_only=True, hide_rest=False)
        got_mask, got_coef = lime_batch(
            pair.bundle, np.asarray(x01, np.float32)[None], [key],
            rows=rows.astype(np.int8)[None], return_coef=True)
        # the compared quantity is the SIGNED per-segment ridge coefficient
        # (painted per pixel) — the value the mask selection derives from.
        # The binary top-5 mask is an argsort of it: comparing coefficients
        # stays meaningful at any magnitude, where the mask flips on
        # sub-dust sign ties (random-init twins drive all coefficients to
        # ~1e-6; real weights give O(1e-2) and the masks then also agree —
        # checked below for any disagreement beyond coefficient noise).
        ref_w = np.zeros(nseg)
        for f, wgt in explanation.local_exp[explanation.top_labels[0]]:
            if f < nseg:
                ref_w[f] = wgt
        got_w = np.asarray(got_coef[0][:nseg], np.float64)
        scale = max(np.abs(ref_w).max(), 1e-12)
        diff = (np.asarray(mask) > 0) != (got_mask[0] > 0)
        bad = [int(s) for s in np.unique(labels[diff])
               if abs(ref_w[s]) > 0.05 * scale] if diff.any() else []
        if bad:
            raise RuntimeError(
                f"lime top-5 masks disagree on non-tie segments {bad} "
                f"(|ref w| > 5% of max) — selection mismatch, not noise")
        return ref_w[labels], got_w[labels]
    elif method == "gc":
        ca = _captum_attr()
        layer = getattr(tm, "layer4")
        cam = ca.LayerGradCam(tm, layer).attribute(
            t.clone().requires_grad_(True), target, relu_attributions=True)
        side = cam.shape[-1]
        ref = (_tv_resize(cam.detach().reshape(1, side, side), hw)
               .reshape(1, hw, hw).numpy() * np.ones((3, hw, hw)))
        got = 3.0 * np.abs(np.asarray(
            GD.grad_cam(pair.bundle, xn, target, img_hw=hw)))
        return _abs2d(ref), np.asarray(got, np.float64)
    elif method == "gbp":
        ca = _captum_attr()
        ref = ca.GuidedBackprop(tm).attribute(
            t.clone().requires_grad_(True),
            target=target).squeeze().detach().numpy()
        got = GD.guided_backprop(pair.bundle, xn, target)
    elif method == "ggc":
        ca = _captum_attr()
        ref = ca.GuidedGradCam(tm, getattr(tm, "layer4")).attribute(
            t.clone().requires_grad_(True),
            target).squeeze().detach().numpy()
        got = GD.guided_grad_cam(pair.bundle, xn, target, img_hw=hw)
    elif method == "gs":
        # captum draws one uniform rand_coefficient per sample through
        # np.random (gradient_shap.py); record + inject.  Single baseline
        # (driver: one randn image) -> base_idx is all-zero either way.
        ca = _captum_attr()
        torch.manual_seed(0)
        baselines = torch.randn(1, 3, hw, hw)
        drawn = []
        orig_uniform = np.random.uniform

        def rec_u(*a, **k):
            out = orig_uniform(*a, **k)
            drawn.append(np.atleast_1d(np.asarray(out, np.float64)))
            return out

        np.random.uniform = rec_u
        try:
            ref = ca.GradientShap(tm).attribute(
                t.clone().requires_grad_(True), baselines.clone(),
                target=target).squeeze().detach().numpy()
        finally:
            np.random.uniform = orig_uniform
        if not drawn:
            raise SkipMethod(
                "captum GradientShap did not draw through np.random."
                "uniform in this captum version — alphas not capturable; "
                "pin captum==0.7 for the gs golden row")
        alphas = np.concatenate(drawn).reshape(-1)
        got = AB.gradient_shap(
            pair.bundle, xn, target, key,
            baselines=jnp.asarray(baselines.numpy().transpose(0, 2, 3, 1)),
            alphas=alphas, base_idx=np.zeros(len(alphas), np.int32))
    elif method == "fa":
        ca = _captum_attr()
        from ..registry import _down_up
        num_patches = 14 if hw % 14 == 0 else 2
        pm = _patch_mask_t(hw, num_patches)
        raw = ca.FeatureAblation(tm).attribute(t, target=target,
                                               feature_mask=pm)
        ref = _tv_resize(_tv_resize_ne(raw.squeeze(0), num_patches),
                         hw).numpy()
        got = np.asarray(_down_up(
            AB.feature_ablation(pair.bundle, xn, target,
                                num_patches=num_patches), hw,
            num_patches=num_patches))
        got = np.abs(got.sum(-1))
        return _abs2d(ref), np.asarray(got, np.float64)
    elif method == "occ":
        ca = _captum_attr()
        from ..registry import _down_up
        num_patches = 14 if hw % 14 == 0 else 2
        win, stride = (64, 32) if hw >= 224 else (hw // 2, hw // 4)
        raw = ca.Occlusion(tm).attribute(
            t, target=target, sliding_window_shapes=(3, win, win),
            strides=stride)
        ref = _tv_resize(_tv_resize_ne(raw.squeeze(0), num_patches),
                         hw).numpy()
        got = np.asarray(_down_up(
            AB.occlusion(pair.bundle, xn, target, window=win,
                         stride=stride), hw, num_patches=num_patches))
        got = np.abs(got.sum(-1))
        return _abs2d(ref), np.asarray(got, np.float64)
    elif method == "shap":
        # captum ShapleyValueSampling permutes features via torch.randperm
        # per sample; record + inject.  Shared 14x14 patch grid on both
        # sides (the reference's only shap usage, imagenet_seg_eval.py:160,
        # uses SLIC segments — the grid isolates the Shapley math; the
        # segment choice is driver config)
        ca = _captum_attr()
        num_patches = 14 if hw % 14 == 0 else 2
        n_samples = getattr(args, "shap_samples", 25) if args else 25
        pm = _patch_mask_t(hw, num_patches)
        drawn = []
        orig_perm = torch.randperm

        def rec_p(*a, **k):
            out = orig_perm(*a, **k)
            drawn.append(out.detach().numpy())
            return out

        torch.randperm = rec_p
        try:
            torch.manual_seed(0)
            ref = ca.ShapleyValueSampling(tm).attribute(
                t, target=target, feature_mask=pm,
                n_samples=n_samples).squeeze().detach().numpy()
        finally:
            torch.randperm = orig_perm
        perms = np.stack([d for d in drawn
                          if d.shape == (num_patches ** 2,)])
        got = AB.shapley_sampling(pair.bundle, xn, target, key,
                                  num_patches=num_patches, perms=perms)
    elif method == "rise":
        raise SkipMethod(
            "capability extension — the reference has no CNN RISE ladder "
            "entry (RISE exists only for CLIP, generate_emap.py:85); "
            "pinned by determinism/property tests "
            "(tests/test_cnn_methods.py)")
    else:
        raise KeyError(method)
    return _abs2d(ref), _abs2d(np.asarray(got))


def _lime_batch_predict(rl):
    """The vendored limeAttr.batch_predict (model on raw [0,1] HWC floats
    — the reference never normalizes inside LIME, limeAttr.py:10-20)."""
    import importlib
    rl.load_lime()                       # installs the _ref_lime package
    return importlib.import_module("_ref_lime.limeAttr").batch_predict


def _tv_resize(chw, size: int):
    """torchvision bilinear antialias resize (the driver's `resize`)."""
    import torch
    return torch.nn.functional.interpolate(
        torch.as_tensor(chw, dtype=torch.float32)[None],
        size=(size, size), mode="bilinear", antialias=True)[0]


def _tv_resize_ne(chw, size: int):
    """NEAREST_EXACT downsize (the driver's `downsize`)."""
    import torch
    return torch.nn.functional.interpolate(
        torch.as_tensor(chw, dtype=torch.float32)[None],
        size=(size, size), mode="nearest-exact")[0]


def _patch_mask_t(hw: int, num_patches: int):
    import torch
    ids = torch.arange(num_patches ** 2).reshape(num_patches, num_patches)
    cell = hw // num_patches
    return ids.repeat_interleave(cell, 0).repeat_interleave(cell, 1)


def _vit_pair(method: str, pair: Pair, xn, x01, target: int, steps: int,
              rl, args=None) -> tuple:
    import jax.numpy as jnp
    from ..methods import vit_explain as VE
    from ..methods import vit_lrp as VL
    eg = rl.load_vit_explanation_generator()
    base = eg.Baselines(pair.tm)
    inp = _t(xn)
    xj = jnp.asarray(np.asarray(xn)[None])
    start = min(4, max(0, getattr(pair.bundle.extras, "depth", 12) - 1))
    if method == "attn":
        ref = base.generate_raw_attn(inp, "cpu").detach().numpy()[0]
        got = VE.raw_attn(pair.bundle, xj)
    elif method == "grad":
        ref = base.generate_grad(inp, target, "cpu").detach().numpy()[0]
        got = VE.attn_grad(pair.bundle, xj, target)
    elif method == "n_rollout":
        ref = base.generate_naive_rollout(inp)[0].detach().numpy()[0]
        got = VE.naive_rollout(pair.bundle, xj)
    elif method == "attn_attr":
        ref = base.attn_attr(inp, target, device="cpu")
        ref = (ref[0] if isinstance(ref, tuple) else ref).detach().numpy()
        ref = np.squeeze(ref)
        got = VE.attn_attr(pair.bundle, xj, target)
    elif method == "rollout":
        ref = base.generate_rollout(inp, InFlow=False)[0]
        ref = ref.detach().numpy()[0]
        got = VE.rollout(pair.bundle, xj)
    elif method == "cam_attn":
        ref = base.generate_cam_attn(inp, target, "cpu").detach().numpy()[0]
        got = VE.cam_attn(pair.bundle, xj, target)
    elif method == "t_attn":
        ref = base.generate_transition_attention_maps(
            inp, target, start_layer=0, steps=steps,
            device="cpu")[2].detach().numpy()[0]
        got = VE.transition_attention(pair.bundle, xj, target,
                                      start_layer=0, steps=steps)
    elif method == "attn_ig":
        ref = base.IG(inp, target, steps=steps, device="cpu")
        ref = (ref[0] if isinstance(ref, tuple) else ref).detach().numpy()
        ref = np.squeeze(ref)
        got = VE.attn_ig(pair.bundle, xj, target, steps=steps)
    elif method == "bi_attn":
        ref = base.bidirectional(inp, target, steps=steps,
                                 start_layer=start,
                                 device="cpu")[0].detach().numpy()[0]
        got = VE.bidirectional(pair.bundle, xj, target, steps=steps,
                               start_layer=start)
    elif method == "InFlow":
        pair.tm(inp)
        ref = base.generate_RAVE(inp, target, withgrad=True,
                                 device="cpu")[0].detach().numpy()[0]
        got = VE.rave(pair.bundle, xj, target, withgrad=True)
    elif method == "t_attr":
        gen = eg.LRP(pair.lrp_tm)
        ref = gen.generate_LRP(inp, target,
                               method="transformer_attribution",
                               device="cpu").detach().numpy()
        ref = np.squeeze(ref)
        got = VL.transformer_attribution(pair.bundle, xj, target)
    else:
        return _vit_pair_extra(method, pair, xn, x01, target, steps, rl,
                               args)
    return _abs2d(ref), _abs2d(np.asarray(got))


class _InjectedKMeans:
    """fast_pytorch_kmeans stand-in whose fit() installs shared centroids
    (the TIS golden protocol, tests/test_reference_parity_tis.py)."""
    centroids_to_inject = None

    def __init__(self, n_clusters, mode="euclidean", verbose=False):
        self.n_clusters = n_clusters

    def fit(self, X):
        import torch
        c = _InjectedKMeans.centroids_to_inject
        assert c is not None and c.shape[0] == self.n_clusters
        self.centroids = torch.as_tensor(c, dtype=torch.float32)


def _vit_pair_extra(method: str, pair: Pair, xn, x01, target: int,
                    steps: int, rl, args=None) -> tuple:
    """TIS / VIT_CX / MDA + the paper's MAS-calibrate and MAC cores, each
    with its shared-randomness or shared-segment protocol."""
    import torch
    import jax
    import jax.numpy as jnp
    inp = _t(xn)
    xj = jnp.asarray(np.asarray(xn))

    if method == "TIS":
        from ..methods.tis import tis as jtis
        n_masks = getattr(args, "tis_masks", 1024) if args else 1024
        n_tokens = pair.bundle.meta.num_patches ** 2
        n_masks = min(n_masks, 2 ** n_tokens)   # tiny twins: 16 tokens max
        centroids = np.random.RandomState(4).rand(
            n_masks, n_tokens).astype(np.float32)
        tis_mod = rl.load_tis(_InjectedKMeans)
        _InjectedKMeans.centroids_to_inject = centroids
        ref_obj = tis_mod.TIS(pair.tm, n_masks=n_masks, batch_size=64,
                              verbose=False)
        with torch.no_grad():
            ref = ref_obj(inp, class_idx=target).numpy()
        got = jtis(pair.bundle, xj[None], target=target, n_masks=n_masks,
                   batch_size=64, centroids=centroids)
    elif method == "VIT_CX":
        # record the reference's internal torch.randn noise, inject into
        # ours scaled by the causal-score 0.1 factor (causal_score.py:30)
        from ..methods.vit_cx import vit_cx as jvcx
        vcx = rl.load_vit_cx()
        drawn = {}
        orig_randn = torch.randn

        def rec(*a, **k):
            out = orig_randn(*a, **k)
            drawn["t"] = out
            return out

        torch.randn = rec
        try:
            torch.manual_seed(5)
            ref, _ = vcx.ViT_CX(pair.tm, inp, pair.tm.blocks[-1].norm1,
                                target_category=target, gpu_batch=64,
                                device="cpu")
        finally:
            torch.randn = orig_randn
        ref = ref.numpy()
        ref = (ref - ref.min()) / max(ref.max() - ref.min(), 1e-12)
        noise = drawn["t"].permute(0, 2, 3, 1).numpy() * 0.1
        got = jvcx(pair.bundle, xj[None] if xj.ndim == 3 else xj,
                   target=target, gpu_batch=64, noise=noise)
    elif method in ("MDA", "MDA_dense"):
        if method == "MDA_dense":
            raise SkipMethod(
                "seg-driver composition (evaluateImageNetSeg.py:291-326) "
                "of the same insertion/deletion cores the MDA row "
                "verifies; the stitch is pinned by tests/test_mda.py + "
                "tests/test_sweep_and_seg.py")
        # shared SLIC segments (ours, injected into the reference's
        # module-level slic symbol) + shared prior (the reference's own
        # bi_attn — bi_attn has its own golden row); adaptive blur klen
        # computed once from the reference protocol
        from ..methods.mda import mda as jmda, slic as our_slic
        from ..ops.blur import make_blur_fn
        eg = rl.load_vit_explanation_generator()
        mas = rl.load_mas_test_functions()
        mda_mod = rl.load_mda()
        hw = pair.img_hw
        patch_count = getattr(args, "mda_patches", 16) if args else 16
        segments = our_slic(np.asarray(x01, np.float32), patch_count,
                            compactness=10000.0)

        klen = 31
        while True:
            kern = mas.gkern(klen, klen)
            blur_t = (lambda k: lambda xb: torch.nn.functional.conv2d(
                xb, k, padding=k.shape[-1] // 2))(kern)
            with torch.no_grad():
                pred = torch.nn.functional.softmax(
                    pair.tm(blur_t(inp)), dim=-1)[0, target]
            if float(pred) * 100 <= 1 or klen > 101:
                break
            klen += 4
        blur_fn = make_blur_fn(klen, float(klen))

        base = eg.Baselines(pair.tm)
        prior = base.bidirectional(inp, target,
                                   device="cpu")[0].detach()
        prior = _tv_resize(prior, hw).permute(1, 2, 0).numpy() * \
            np.ones((hw, hw, 3), np.float32)

        orig_slic = mda_mod.slic
        mda_mod.slic = lambda img, n_segments, compactness, **kw: \
            np.asarray(segments)
        # the reference hard-codes 224x224 scratch buffers inside its
        # insertion/deletion search (MDAFunctions.py:96,346) — it only
        # runs at 224.  For the sub-224 CI twins, rescale that one
        # literal so the reference's own code runs; the real-weights
        # path (224) is untouched.
        orig_ones = torch.ones
        if hw != 224:
            def _ones_shim(*a, **k):
                if a and a[0] == (224, 224, 3):
                    return orig_ones((hw, hw, 3), **k)
                return orig_ones(*a, **k)
            torch.ones = _ones_shim
        try:
            ref, _, _ = mda_mod.MDA(
                torch.from_numpy(
                    np.asarray(x01, np.float32).transpose(2, 0, 1)),
                inp, prior, patch_count, blur_t, pair.tm, "cpu", hw,
                max_batch_size=5)
        finally:
            torch.ones = orig_ones
            mda_mod.slic = orig_slic
        got3 = jmda(pair.bundle, np.asarray(x01, np.float32), xj,
                    prior, patch_count, blur_fn, target=target,
                    segments=np.asarray(segments))
        ref2 = np.abs(np.asarray(ref, np.float64).sum(-1)) \
            if np.asarray(ref).ndim == 3 else np.abs(np.asarray(ref))
        return ref2, 3.0 * np.abs(np.asarray(got3, np.float64))
    elif method == "calibrate":
        # MASCalibrator.refine_attribution — the Calibrate_Best_Possible
        # core (imagenet_seg_eval.py:172-194); fixed lr sidesteps the
        # heuristic (itself parity-tested, tests/test_calibrate.py)
        from ..methods.mas_calibrate import refine_attribution
        mc = rl.load_mas_calibrate()
        prior = np.abs(np.asarray(xn, np.float32)) + 0.1
        cal = mc.MASCalibrator(pair.tm, pair.img_hw, "cpu")
        ref = np.asarray(cal.refine_attribution(
            inp, prior.copy(), lr=0.01, smoothing=False, epochs=3))
        got = np.asarray(refine_attribution(pair.bundle, xj, prior,
                                            lr=0.01, smoothing=False,
                                            epochs=3))
    elif method == "mac":
        from ..methods.mac import clean_attribution
        from ..ops.blur import make_blur_fn
        mcb = rl.load_util_module("util.attribution_methods.MACBuilder")
        hw = pair.img_hw
        grid = 4
        block = hw // grid
        segments = np.kron(np.arange(grid * grid).reshape(grid, grid),
                           np.ones((block, block), dtype=np.int64))
        prior = np.abs(np.asarray(xn, np.float32)) + 0.1
        kern = rl.load_mas_test_functions().gkern(11, 11.0)
        blur_t = lambda xb: torch.nn.functional.conv2d(  # noqa: E731
            xb, kern, padding=5)
        blur_fn = make_blur_fn(11, 11.0)
        den = mcb.Denoise(pair.tm, hw, "cpu", substrate_fn=blur_t,
                          mode="del", segments=segments, cutoff=5)
        ref, _, _ = den.clean_attribution(inp, prior.copy(), iterations=3,
                                          max_batch_size=8)
        got, _, _ = clean_attribution(pair.bundle, xj, xj, prior, 3,
                                      mode="del", blur_fn=blur_fn,
                                      segments=segments)
        ref = np.asarray(ref)
        got = np.asarray(got)
    else:
        raise KeyError(method)
    return _abs2d(np.asarray(ref)), _abs2d(np.asarray(got))


def _clip_pair(method: str, pair: Pair, xn, x01, target: int, steps: int,
               rl, args=None) -> tuple:
    import torch
    import jax.numpy as jnp
    from ..methods import clip_explain as CE
    ge = pair.ge
    timg = _t(xn)
    dense = ge.clip_encode_dense(timg, pair.tm)
    (outputs, v_final, x_in, v, q_out, k_out, attn, att_output,
     map_size) = dense
    # shared text embedding: the predicted-class prompt through the
    # reference text tower (both sides consume the identical vector, so
    # the comparison isolates the image-path method numerics).  Tiny twins
    # have a 50-token vocab -> fixed token ids instead of the real BPE.
    if pair.tiny:
        ctx = torch.zeros(1, pair.tm.context_length, dtype=torch.long)
        ctx[0, :4] = torch.tensor([1, 5, 9, 49])
    else:
        from ..data.tokenizer import class_prompts
        st = rl.load_clip_tokenizer().SimpleTokenizer()
        prompt = class_prompts()[target % 1000]
        toks = [st.encoder["<|startoftext|>"]] + st.encode(prompt) + \
            [st.encoder["<|endoftext|>"]]
        ctx = torch.zeros(1, pair.tm.context_length, dtype=torch.long)
        ctx[0, :len(toks)] = torch.tensor(toks[:pair.tm.context_length])
    with torch.no_grad():
        txt_t = pair.tm.encode_text(ctx)
        txt_t = txt_t / txt_t.norm(dim=-1, keepdim=True)
    txt = np.asarray(txt_t.float().numpy(), np.float32)
    tok_np = np.asarray(ctx.numpy(), np.int64)

    if method == "eclip":
        img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
        cosines = (img_emb @ txt_t.T.to(img_emb.dtype))[0]
        ref = torch.stack([ge.grad_eclip(c, q_out, k_out, v, att_output,
                                         map_size) for c in cosines],
                          0).sum(0).detach().float().numpy()
        got = CE.grad_eclip(pair.bundle, np.asarray(xn), txt)
    elif method == "maskclip":
        ref = ge.mask_clip(txt_t.T.to(v_final.dtype), v_final, k_out,
                           map_size).sum(0).detach().float().numpy()
        got = CE.mask_clip(pair.bundle, np.asarray(xn), txt)
    elif method == "selfattn":
        ref = attn[0, 0, 1:].reshape(map_size).detach().float().numpy()
        got = CE.self_attn(pair.bundle, np.asarray(xn))
    elif method == "grad_cam":
        # the live call site grads w.r.t. the last block's INPUT
        # (CLIP_example.ipynb: grad_cam(c, last_input, map_size))
        img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
        cosines = (img_emb @ txt_t.T.to(img_emb.dtype))[0]
        ref = torch.stack([ge.grad_cam(c, x_in, map_size)
                           for c in cosines],
                          0).sum(0).detach().float().numpy()
        got = CE.clip_grad_cam(pair.bundle, np.asarray(xn), txt)
    elif method in ("eclip_nograd", "eclip_wo"):
        kw = ({"withgrad": False} if method == "eclip_nograd"
              else {"withksim": False})
        img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
        cosines = (img_emb @ txt_t.T.to(img_emb.dtype))[0]
        ref = torch.stack([ge.grad_eclip(c, q_out, k_out, v, att_output,
                                         map_size, **kw) for c in cosines],
                          0).sum(0).detach().float().numpy()
        got = CE.grad_eclip(pair.bundle, np.asarray(xn), txt, **kw)
    elif method == "game":
        ref = ge.mm_interpret(model=pair.mm_tm, image=timg,
                              texts=torch.from_numpy(tok_np), device="cpu")
        ref = ref.sum(0).detach().float().numpy()
        got = CE.game(pair.bundle, np.asarray(xn), tok_np)
    elif method == "rollout":
        attns = ge.mm_interpret(model=pair.mm_tm, image=timg,
                                texts=torch.from_numpy(tok_np),
                                device="cpu", rollout=True)
        ref = ge.compute_rollout_attention(attns)[0].detach().float().numpy()
        got = CE.clip_rollout(pair.bundle, np.asarray(xn), tok_np)
    elif method == "lrp":
        _, ref = ge.clip_lrp(timg, torch.from_numpy(tok_np), pair.mm_tm,
                             "cpu")
        p = pair.bundle.extras["cfg"].grid
        ref = ref.detach().float().numpy().reshape(p, p)
        _, got = CE.clip_lrp(pair.bundle, np.asarray(xn), tok_np)
    elif method == "surgery":
        # direct-text-feature protocol (the prompt-ensemble encode is
        # tokenizer + text-tower, parity-covered elsewhere): the target
        # caption + generic vectors through the SAME reference text tower;
        # feature surgery needs >1 text (mean-subtraction)
        from ..methods.clip_surgery import surgery_map
        surgery_clip = ge.surgery_clip
        extra = np.random.RandomState(7).randn(
            5, txt.shape[-1]).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=-1, keepdims=True)
        txts = np.concatenate([txt, extra], axis=0)
        with torch.no_grad():
            feats = pair.surgery_tm.encode_image(timg)
            feats = feats / feats.norm(dim=-1, keepdim=True)
            sim = surgery_clip.clip_feature_surgery(
                feats.float(), torch.from_numpy(txts))
            ref = surgery_clip.get_similarity_map(
                sim[:, 1:, :], (pair.img_hw, pair.img_hw)).numpy()
        ref = np.abs(ref[0, :, :, 0])
        got = np.abs(np.asarray(surgery_map(pair.bundle, np.asarray(xn),
                                            txts), np.float64))
        return np.asarray(ref, np.float64), got
    elif method == "rise":
        # shared masks: OUR generator's draws, fed to the reference scorer
        # (its generate_masks is torch-RNG; the scorer is the method)
        from ..methods.rise import generate_masks, rise as jrise
        import jax
        n_masks = getattr(args, "rise_masks", 2000) if args else 2000
        masks = np.asarray(generate_masks(jax.random.PRNGKey(0), n_masks,
                                          8, 0.5, pair.img_hw), np.float32)
        orig_gm = ge.generate_masks
        ge.generate_masks = lambda input_size, N, s, p1: \
            torch.from_numpy(masks)[:, None]

        # the live call site (CLIP_example.ipynb) passes the pip openai
        # model whose encode_image returns the cls projection [B, D];
        # our vanilla tower is the Surgery fork's all-token variant
        # (clip_model.py:259) — slice the cls token to match
        class _ClsTower:
            def encode_image(self, xb):
                f = pair.tm.encode_image(xb)
                return f[:, 0] if f.ndim == 3 else f

        try:
            ref = ge.rise(_ClsTower(), timg, txt_t, "cpu",
                          N=n_masks).detach().float().numpy()
        finally:
            ge.generate_masks = orig_gm
        # the reference weights by the RAW caption cosine — run our
        # production rise scorer with raw_scores=True on a caption-cosine
        # apply (the registry's default CLIP rise uses the class-table
        # softmax — a documented extension choice, PARITY.md)
        got = _our_clip_rise(pair, xn, txt, masks)
    elif method == "m2ib":
        raise SkipMethod(
            "the reference M2IB consumes an HF-format CLIPModel "
            "(M2IB/scripts/methods.py) — not constructible from the "
            "openai-format checkpoint; golden-verified in CI by the HF "
            "torch-RNG-injection oracle "
            "(tests/test_reference_parity_m2ib.py); see PARITY.md")
    else:
        raise KeyError(method)
    return _abs2d(ref), _abs2d(np.asarray(got))


def _our_clip_rise(pair, xn, txt, masks):
    """Our production rise() scorer on a caption-cosine apply with the
    reference's weighting (raw cosine, no softmax —
    generate_emap.py:85-104) and the shared mask set."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    from ..methods.rise import rise as jrise
    from ..models import clip as clipmod
    model = pair.bundle.extras["model"]
    txt_j = jnp.asarray(txt)

    def caption_apply(params, xb):
        feats = model.apply({"params": params}, xb,
                            method=clipmod.CLIP.encode_image)[:, 0]
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats @ txt_j.T                     # [B, 1] raw cosine

    cap_bundle = _dc.replace(pair.bundle, apply=caption_apply)
    return jrise(cap_bundle, np.asarray(xn), 0, jax.random.PRNGKey(0),
                 masks=masks, raw_scores=True)


PAIR_FNS = {"cnn": _cnn_pair, "vit": _vit_pair, "clip": _clip_pair}


# ---------------------------------------------------------------------------
# scoring + report
# ---------------------------------------------------------------------------

#: a map whose largest magnitude is below this is float dust (e.g. the
#: random-init twins drive InFlow's clamp(grad * attn) product to ~1e-7);
#: relative error and rank order on dust are meaningless, so such rows
#: are verdicted on ABSOLUTE agreement instead and flagged "degenerate".
#: Real pretrained weights produce O(1e-1..1e2) maps — never degenerate.
DUST = 1e-5


def compare_maps(ref: np.ndarray, got: np.ndarray) -> dict:
    from scipy.stats import spearmanr
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    abs_linf = float(np.abs(got - ref).max())
    ref_mag = float(np.abs(ref).max())
    linf = abs_linf / max(ref_mag, 1e-12)
    if ref.size < 3 or np.allclose(ref, ref.flat[0]):
        rho = 1.0 if linf < 1e-6 else 0.0
    else:
        rho = float(spearmanr(ref.ravel(), got.ravel()).statistic)
    if ref_mag < DUST and abs_linf < DUST:
        return {"rel_linf": 0.0, "spearman": 1.0, "degenerate": True,
                "abs_linf": abs_linf, "ref_mag": ref_mag}
    return {"rel_linf": linf, "spearman": rho}


def _load_images(args, img_hw: int, family: str):
    """Yield (name, trans_img in [0,1] HWC) pairs."""
    from ..ops.preprocess import center_crop_resize
    if args.synthetic:
        rng = np.random.RandomState(args.seed)
        for i in range(args.synthetic):
            yield f"synthetic_{i}", rng.rand(img_hw, img_hw, 3).astype(
                np.float32)
        return
    from PIL import Image
    files = sorted(os.listdir(args.images))
    n = 0
    for fn in files:
        if args.image_count and n >= args.image_count:
            return
        path = os.path.join(args.images, fn)
        try:
            img = Image.open(path).convert("RGB")
        except Exception:
            continue
        yield fn, np.asarray(center_crop_resize(img, img_hw), np.float32)
        n += 1


def run_golden_parity(args) -> dict:
    import jax
    # parity verification wants the numerics question isolated: on TPU the
    # DEFAULT matmul precision runs f32 inputs through bf16 MXU passes
    # (~1e-3 relative noise — PARITY.md), which would eat the whole L∞
    # budget before any method difference shows.  Pin full f32.
    jax.config.update("jax_default_matmul_precision", "highest")
    rl = _reference_loader()
    from ..runners.common import family_stats
    from ..ops.preprocess import normalize

    models = [m for m in args.models.split(",") if m]
    rows = []
    summary = {}
    model_families = {}
    for model_name in models:
        builder = BUILDERS.get(model_name)
        if builder is None:
            print(f"[skip] unknown model {model_name}")
            continue
        ckpt = None
        for ext in (".pth", ".pt", ".bin"):
            p = os.path.join(args.checkpoints, model_name + ext)
            if os.path.exists(p):
                ckpt = p
                break
        if ckpt is None:
            print(f"[skip] no checkpoint for {model_name} under "
                  f"{args.checkpoints}")
            continue
        sd = _load_ckpt(ckpt)
        pair = builder(rl, model_name, sd)
        model_families[model_name] = pair.family
        print(f"[{model_name}] reference + bundle built "
              f"({pair.load_report})")
        methods = ([m for m in args.methods.split(",") if m]
                   if args.methods else DEFAULT_METHODS[pair.family])
        mean, std = family_stats(pair.family)
        pair_fn = PAIR_FNS[pair.family]
        for img_name, x01 in _load_images(args, pair.img_hw, pair.family):
            xn = np.asarray(normalize(x01, mean, std), np.float32)
            import torch
            with torch.no_grad():
                if pair.family == "clip":
                    target = args.target or 0
                else:
                    logits = pair.tm(_t(xn).float())
                    logits = logits[0] if isinstance(logits, tuple) \
                        else logits
                    target = int(logits[0].argmax())
            for method in methods:
                method = ALIASES.get(method, method)
                known = (method in TOLERANCES
                         or f"{pair.family}:{method}" in TOLERANCES
                         or method in DEFAULT_METHODS[pair.family])
                if not known:
                    rows.append({"model": model_name, "method": method,
                                 "image": img_name,
                                 "error": "unknown method"})
                    continue
                try:
                    ref, got = pair_fn(method, pair, xn, x01, target,
                                       args.steps, rl, args)
                    res = compare_maps(ref, got)
                except SkipMethod as e:    # documented non-runnable row
                    print(f"  {model_name}/{method} [{img_name}] SKIP: "
                          f"{str(e)[:80]}", flush=True)
                    rows.append({"model": model_name, "method": method,
                                 "image": img_name, "skip": str(e)})
                    key = (model_name, method)
                    s = summary.setdefault(key, {"max_linf": 0.0,
                                                 "min_rho": 1.0, "n": 0,
                                                 "errors": 0, "skips": 0})
                    s["skips"] = s.get("skips", 0) + 1
                    continue
                except Exception as e:     # record, keep sweeping
                    print(f"  {model_name}/{method} [{img_name}] ERROR: "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    rows.append({"model": model_name, "method": method,
                                 "image": img_name,
                                 "error": f"{type(e).__name__}: {e}"})
                    continue
                print(f"  {model_name}/{method} [{img_name}] "
                      f"linf={res['rel_linf']:.2e} "
                      f"rho={res['spearman']:.4f}", flush=True)
                res.update(model=model_name, method=method, image=img_name,
                           target=target)
                rows.append(res)
                key = (model_name, method)
                s = summary.setdefault(key, {"max_linf": 0.0,
                                             "min_rho": 1.0, "n": 0,
                                             "errors": 0})
                s["max_linf"] = max(s["max_linf"], res["rel_linf"])
                s["min_rho"] = min(s["min_rho"], res["spearman"])
                s["n"] += 1
    for r in rows:
        if "error" in r:
            key = (r["model"], r["method"])
            s = summary.setdefault(key, {"max_linf": 0.0, "min_rho": 1.0,
                                         "n": 0, "errors": 0, "skips": 0})
            s["errors"] += 1

    # ---- artifacts -------------------------------------------------------
    ok = True
    if not summary and models:
        # every requested model was skipped (typo'd --checkpoints, unknown
        # names): a "success" here would report verification that never
        # happened.  Per-model skips stay non-fatal when at least one model
        # produced verdicts.
        print("NOTHING-VERIFIED: all requested models were skipped "
              f"(models={models}, checkpoints={args.checkpoints!r})")
        ok = False
    lines = ["# Golden parity report (xai_tpu.tools.golden_parity)", "",
             "| model | method | images | max rel-L∞ | tol | min ρ | "
             "min-ρ tol | verdict |", "|---|---|---|---|---|---|---|---|"]
    for (model_name, method), s in sorted(summary.items()):
        fam = model_families.get(model_name, "")
        tol_linf, tol_rho = tol_for(fam, method)
        if s["n"] == 0 and s["errors"] == 0 and s.get("skips", 0) > 0:
            # documented non-runnable method (SkipMethod): non-fatal
            lines.append(f"| {model_name} | {method} | 0 | — | — | — | — | "
                         f"SKIP ({s['skips']}, see .jsonl/PARITY.md) |")
            continue
        passed = (s["errors"] == 0 and s["n"] > 0 and
                  s["max_linf"] <= tol_linf and s["min_rho"] >= tol_rho)
        ok = ok and passed
        verdict = "PASS" if passed else (
            f"FAIL ({s['errors']} errors)" if s["errors"] else "FAIL")
        lines.append(f"| {model_name} | {method} | {s['n']} | "
                     f"{s['max_linf']:.2e} | {tol_linf:.0e} | "
                     f"{s['min_rho']:.4f} | {tol_rho} | {verdict} |")
    with open(args.out + ".jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return {"ok": ok, "rows": rows, "summary": {
        f"{m}/{meth}": s for (m, meth), s in summary.items()}}


def build_parser():
    p = argparse.ArgumentParser("golden_parity")
    p.add_argument("--checkpoints", required=True,
                   help="dir with <MODEL>.{pth,pt,bin} torch state dicts")
    p.add_argument("--images", default="",
                   help="dir of image files (ImageNet val subset)")
    p.add_argument("--models", default="R101,VIT16",
                   help=",".join(BUILDERS))
    p.add_argument("--methods", default="",
                   help="comma list; empty = per-family default set")
    p.add_argument("--image_count", type=int, default=10)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N fixed random images instead of --images")
    p.add_argument("--steps", type=int, default=50,
                   help="IG-family step count (reference driver: 50)")
    p.add_argument("--sg_samples", type=int, default=25,
                   help="SmoothGrad noise samples (reference: 25)")
    p.add_argument("--lime_samples", type=int, default=1000,
                   help="LIME perturbation samples (reference: 1000)")
    p.add_argument("--shap_samples", type=int, default=25,
                   help="ShapleyValueSampling permutations (captum: 25)")
    p.add_argument("--tis_masks", type=int, default=1024,
                   help="TIS centroid masks (reference driver: 1024)")
    p.add_argument("--mda_patches", type=int, default=16,
                   help="MDA superpixel count (production shape: 196; "
                        "16 keeps the CPU reference side tractable)")
    p.add_argument("--rise_masks", type=int, default=2000,
                   help="CLIP RISE mask count (reference: 2000)")
    p.add_argument("--target", type=int, default=0,
                   help="CLIP prompt class (0 = first class)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="golden_report")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    result = run_golden_parity(args)
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
