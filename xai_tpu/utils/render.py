"""LRP-style heatmap rendering (evaluations/utils/render.py equivalent):
signed relevance -> RGB heatmap via the classic firered colormap, plus
overlay helpers."""
from __future__ import annotations

import numpy as np


def _standardize(x: np.ndarray) -> np.ndarray:
    x = x / np.max(np.abs(x)) if np.max(np.abs(x)) > 0 else x
    return (x + 1.0) / 2.0


def hm_to_rgb(relevance: np.ndarray, scaling: int = 1) -> np.ndarray:
    """[H, W] signed relevance -> [H*s, W*s, 3] float RGB in [0, 1]
    (render.heatmap semantics: blue-white-red diverging)."""
    r = np.repeat(np.repeat(relevance, scaling, 0), scaling, 1)
    v = _standardize(r)
    red = np.clip(2.0 * v - 1.0, 0, 1)
    blue = np.clip(1.0 - 2.0 * v, 0, 1)
    green = 1.0 - red - blue
    return np.stack([red + green, green + 0.0 * v, blue + green], axis=-1)


def overlay(image: np.ndarray, heatmap_rgb: np.ndarray,
            alpha: float = 0.5) -> np.ndarray:
    """Alpha-blend a heatmap over an [H, W, 3] image in [0, 1]."""
    return np.clip((1 - alpha) * image + alpha * heatmap_rgb, 0, 1)
