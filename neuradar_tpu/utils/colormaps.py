"""Colormaps for rendered-output visualization (numpy).

cf. reference nerfstudio/utils/colormaps.py:28-220: apply_colormap routes by
channel count (1 -> float colormap via matplotlib tables, 3 -> passthrough,
bool -> black/white, >3 -> PCA-to-RGB with median outlier rejection);
apply_depth_colormap normalizes to [near, far] and blends with accumulation.
Host-side numpy here — these feed PNG/viewer outputs, never the jit path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

Colormaps = ("default", "turbo", "viridis", "magma", "inferno", "cividis", "gray", "pca")


@dataclass
class ColormapOptions:
    colormap: str = "default"
    normalize: bool = False
    colormap_min: float = 0.0
    colormap_max: float = 1.0
    invert: bool = False
    range_min: Optional[float] = None
    range_max: Optional[float] = None


def apply_float_colormap(image: np.ndarray, colormap: str = "viridis") -> np.ndarray:
    """[..., 1] floats in [0, 1] -> [..., 3] colors via matplotlib tables
    (reference apply_float_colormap:103)."""
    import matplotlib

    if colormap in ("default", "pca"):
        # "pca" only applies to >3-channel features (apply_colormap routes
        # those before reaching here); for scalars fall back to turbo
        colormap = "turbo"
    image = np.nan_to_num(np.asarray(image, np.float64), nan=0.0)
    if colormap == "gray":
        return np.repeat(image, 3, axis=-1)
    idx = np.clip((image * 255).astype(np.int64), 0, 255)
    # resample via cmap(...) so LinearSegmentedColormaps (jet, Greys, ...)
    # work too, not only ListedColormaps with a .colors table
    table = np.asarray(matplotlib.colormaps[colormap](np.linspace(0.0, 1.0, 256)))[:, :3]
    return table[idx[..., 0]]


def apply_boolean_colormap(image: np.ndarray, true_color=(1.0, 1.0, 1.0), false_color=(0.0, 0.0, 0.0)) -> np.ndarray:
    return np.where(np.asarray(image)[..., None], np.asarray(true_color), np.asarray(false_color))


def apply_pca_colormap(image: np.ndarray) -> np.ndarray:
    """[..., D>3] features -> [..., 3] via PCA with per-channel median
    outlier rejection (reference apply_pca_colormap:184)."""
    shape = image.shape
    x = np.asarray(image, np.float64).reshape(-1, shape[-1])
    x_c = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(x_c, full_matrices=False)
    y = x @ vt[:3].T  # project (reference uses pca_lowrank on the uncentered matrix)
    d = np.abs(y - np.median(y, axis=0))
    mdev = np.median(d, axis=0)
    s = d / np.clip(mdev, 1e-12, None)
    m = 3.0
    for c in range(3):
        ins = y[s[:, c] < m, c]
        if len(ins) == 0:
            ins = y[:, c]
        y[:, c] = (y[:, c] - ins.min()) / max(ins.max() - ins.min(), 1e-12)
    return np.clip(y, 0, 1).reshape(*shape[:-1], 3)


def apply_colormap(image: np.ndarray, colormap_options: ColormapOptions = ColormapOptions(),
                   eps: float = 1e-9) -> np.ndarray:
    """Channel-count router (reference apply_colormap:51): 3ch passthrough,
    1ch float colormap, bool black/white, >3ch PCA."""
    image = np.asarray(image)
    if image.shape[-1] == 3:
        return image
    o = colormap_options
    lo = o.range_min if o.range_min is not None else image.min()
    hi = o.range_max if o.range_max is not None else image.max()
    image = np.clip(image, lo, hi)
    if image.shape[-1] == 1 and np.issubdtype(image.dtype, np.floating):
        out = image
        if o.normalize:
            out = out - out.min()
            out = out / (out.max() + eps)
        out = np.clip(out * (o.colormap_max - o.colormap_min) + o.colormap_min, 0, 1)
        if o.invert:
            out = 1 - out
        return apply_float_colormap(out, colormap=o.colormap)
    if image.dtype == bool:
        return apply_boolean_colormap(image[..., 0] if image.shape[-1] == 1 else image)
    if image.shape[-1] > 3:
        return apply_pca_colormap(image)
    raise NotImplementedError(f"no colormap route for shape {image.shape} dtype {image.dtype}")


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: Optional[np.ndarray] = None,
    near_plane: Optional[float] = None,
    far_plane: Optional[float] = None,
    colormap_options: ColormapOptions = ColormapOptions(),
) -> np.ndarray:
    """[..., 1] depth -> [..., 3] colors, optionally faded to white where
    accumulation is low (reference apply_depth_colormap:127)."""
    depth = np.asarray(depth, np.float64)
    near = near_plane if near_plane is not None else float(depth.min())
    far = far_plane if far_plane is not None else float(depth.max())
    norm = np.clip((depth - near) / (far - near + 1e-10), 0, 1)
    colored = apply_colormap(norm, colormap_options=colormap_options)
    if accumulation is not None:
        colored = colored * accumulation + (1 - accumulation)
    return colored
