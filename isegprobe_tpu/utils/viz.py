"""Visualization utilities (reference: core/utils/viz.py:16-186)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np


def get_palette(num_cls: int) -> np.ndarray:
    """Standard VOC bit-interleaved palette, vectorized: channel c of label j
    collects j's bits (3i + c) into descending output bit positions."""
    ids = np.arange(num_cls, dtype=np.int64)
    palette = np.zeros((num_cls, 3), dtype=np.int32)
    for i in range(8):
        for ch in range(3):
            palette[:, ch] |= (((ids >> (3 * i + ch)) & 1) << (7 - i)).astype(
                np.int32
            )
    return palette


def draw_probmap(x: np.ndarray) -> np.ndarray:
    return cv2.applyColorMap((x * 255).astype(np.uint8), cv2.COLORMAP_HOT)


def draw_points(image: np.ndarray, points: List, color: Tuple[int, int, int],
                radius: int = 3) -> np.ndarray:
    image = image.copy()
    for p in points:
        if p[0] < 0:
            continue
        if len(p) == 3:
            pradius = {0: 8, 1: 6, 2: 4}[p[2]] if p[2] < 3 else 2
        else:
            pradius = radius
        image = cv2.circle(image, (int(p[1]), int(p[0])), pradius, color, -1)
    return image


def draw_with_blend_and_clicks(
    img: np.ndarray,
    mask: Optional[np.ndarray] = None,
    alpha: float = 0.6,
    clicks_list=None,
    pos_color: Tuple[int, int, int] = (0, 255, 0),
    neg_color: Tuple[int, int, int] = (255, 0, 0),
    radius: int = 4,
    use_color_mask: bool = False,
) -> np.ndarray:
    """Darkened background + yellow mask contour + click dots
    (reference: viz.py:55-106)."""
    result = img.copy()
    darkened = cv2.addWeighted(result, alpha, np.zeros_like(result), 0, 0)

    if mask is not None:
        contours, _ = cv2.findContours(
            mask.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE
        )
        cv2.drawContours(result, contours, -1, (255, 255, 100), thickness=2)
        mask_region = (mask > 0).astype(np.uint8)
        result = (
            darkened * (1 - mask_region[:, :, np.newaxis])
            + result * mask_region[:, :, np.newaxis]
        )
        if use_color_mask:
            palette = get_palette(int(np.max(mask)) + 1)
            rgb_mask = palette[mask.astype(np.uint8)]
            result = result * (1 - alpha * mask_region[:, :, None]) + rgb_mask * (
                alpha * mask_region[:, :, None]
            )
        result = result.astype(np.uint8)

    if clicks_list:
        pos_points = [c.coords for c in clicks_list if c.is_positive]
        neg_points = [c.coords for c in clicks_list if not c.is_positive]
        result = draw_points(result, pos_points, pos_color, radius=radius)
        result = draw_points(result, neg_points, neg_color, radius=radius)
    return result


def plot_feats(images, lr_feats_list, hr_feats_list, save_path=None, names=None):
    """Grid of image / low-res PCA / high-res PCA panels
    (reference: viz.py:108-186). Features are [H, W, C] numpy arrays."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from isegprobe_tpu.utils.pca import fit_joint_pca

    n = len(images)
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i, (img, lr, hr) in enumerate(zip(images, lr_feats_list, hr_feats_list)):
        lr_rgb, hr_rgb = fit_joint_pca(lr, hr)
        axes[i][0].imshow(img)
        axes[i][0].set_title("image" if not names else names[i])
        axes[i][1].imshow(lr_rgb)
        axes[i][1].set_title("LowRes")
        axes[i][2].imshow(hr_rgb)
        axes[i][2].set_title("HighRes")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig
