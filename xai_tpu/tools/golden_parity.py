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


# ---------------------------------------------------------------------------
# documented per-method tolerances (PARITY.md; fp16 CLIP gets wider bars)
# ---------------------------------------------------------------------------

TOLERANCES: Dict[str, tuple] = {
    # method: (relative L-inf on the 2-D driver map, min Spearman rho)
    "ig": (1e-3, 0.999),
    "lig": (1e-3, 0.999),
    "idg": (5e-3, 0.99),      # tiny-magnitude maps; scale-relative
    "idgi": (1e-3, 0.999),
    "agi": (5e-3, 0.99),      # PGD trajectory is argmax-sensitive
    "raw_attn": (1e-3, 0.999),
    "rollout": (1e-3, 0.999),
    "cam_attn": (1e-3, 0.999),
    "t_attn": (2e-3, 0.999),
    "attn_ig": (2e-3, 0.999),
    "bi_attn": (2e-3, 0.999),
    "rave": (2e-3, 0.999),
    "t_attr": (5e-3, 0.99),   # LRP: long product chains amplify rounding
    # reference CLIP runs fp16 (generate_emap.py:315) -> wider bars
    "eclip": (2e-2, 0.98),
    "maskclip": (2e-2, 0.98),
    "selfattn": (2e-2, 0.98),
    "clip_grad_cam": (2e-2, 0.98),
}

DEFAULT_METHODS = {
    "cnn": ["ig", "lig", "idg", "idgi", "agi"],
    "vit": ["raw_attn", "rollout", "cam_attn", "t_attn", "attn_ig",
            "bi_attn", "rave", "t_attr"],
    "clip": ["eclip", "maskclip", "selfattn", "clip_grad_cam"],
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
    layers = len([k for k in sd
                  if k.startswith("visual.") and
                  k.endswith(".attn.in_proj_weight")])
    params = clip_from_torch(sd, vision_layers=layers, text_layers=12)
    return Pair(name, "clip", 224, tm, _bundle_from_params(name, params),
                ge=ge, load_report=f"vision_layers={layers}")


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
        extras=cfg)
    lrp_pkg = rl.load_vit_lrp_timm()
    lrp_tm = lrp_pkg.VisionTransformer(img_size=32, patch_size=8,
                                       embed_dim=32, depth=3, num_heads=4,
                                       num_classes=13)
    lrp_tm.load_state_dict(sd, strict=False)
    lrp_tm = lrp_tm.eval()
    return Pair(name, "vit", 32, tm, bundle, lrp_tm=lrp_tm)


BUILDERS: Dict[str, Callable] = {
    "R50": _build_cnn, "R101": _build_cnn, "R152": _build_cnn,
    "RNXT": _build_cnn,
    "VIT16": _build_vit, "VIT32": _build_vit,
    "CLIP16": _build_clip, "CLIP32": _build_clip,
    "TINY_R": _build_tiny_r, "TINY_V": _build_tiny_v,
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
              rl) -> tuple:
    from ..methods import gradient as G
    sm = rl.load_saliency_methods()
    chunk = max(2, steps // 2)
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
        raise KeyError(method)
    return _abs2d(ref), _abs2d(np.asarray(got))


def _vit_pair(method: str, pair: Pair, xn, x01, target: int, steps: int,
              rl) -> tuple:
    import jax.numpy as jnp
    from ..methods import vit_explain as VE
    from ..methods import vit_lrp as VL
    eg = rl.load_vit_explanation_generator()
    base = eg.Baselines(pair.tm)
    inp = _t(xn)
    xj = jnp.asarray(np.asarray(xn)[None])
    start = min(4, max(0, getattr(pair.bundle.extras, "depth", 12) - 1))
    if method == "raw_attn":
        ref = base.generate_raw_attn(inp, "cpu").detach().numpy()[0]
        got = VE.raw_attn(pair.bundle, xj)
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
    elif method == "rave":
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
        raise KeyError(method)
    return _abs2d(ref), _abs2d(np.asarray(got))


def _clip_pair(method: str, pair: Pair, xn, x01, target: int, steps: int,
               rl) -> tuple:
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
    # the comparison isolates the image-path method numerics)
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
    elif method == "clip_grad_cam":
        img_emb = torch.nn.functional.normalize(outputs[:, 0], dim=-1)
        cosines = (img_emb @ txt_t.T.to(img_emb.dtype))[0]
        ref = torch.stack([ge.grad_cam(c, att_output, map_size)
                           for c in cosines],
                          0).sum(0).detach().float().numpy()
        got = CE.clip_grad_cam(pair.bundle, np.asarray(xn), txt)
    else:
        raise KeyError(method)
    return _abs2d(ref), _abs2d(np.asarray(got))


PAIR_FNS = {"cnn": _cnn_pair, "vit": _vit_pair, "clip": _clip_pair}


# ---------------------------------------------------------------------------
# scoring + report
# ---------------------------------------------------------------------------

def compare_maps(ref: np.ndarray, got: np.ndarray) -> dict:
    from scipy.stats import spearmanr
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    scale = max(np.abs(ref).max(), 1e-12)
    linf = float(np.abs(got - ref).max() / scale)
    if ref.size < 3 or np.allclose(ref, ref.flat[0]):
        rho = 1.0 if linf < 1e-6 else 0.0
    else:
        rho = float(spearmanr(ref.ravel(), got.ravel()).statistic)
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
                if method not in TOLERANCES:
                    rows.append({"model": model_name, "method": method,
                                 "image": img_name,
                                 "error": "unknown method"})
                    continue
                try:
                    ref, got = pair_fn(method, pair, xn, x01, target,
                                       args.steps, rl)
                    res = compare_maps(ref, got)
                except Exception as e:     # record, keep sweeping
                    rows.append({"model": model_name, "method": method,
                                 "image": img_name,
                                 "error": f"{type(e).__name__}: {e}"})
                    continue
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
                                         "n": 0, "errors": 0})
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
        tol_linf, tol_rho = TOLERANCES.get(method, (0.0, 1.0))
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
