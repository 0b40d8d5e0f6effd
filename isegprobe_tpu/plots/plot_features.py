"""Visualize saved low/high-res feature maps via PCA
(reference: core/plots/plot_features.py).

Features are the .npy dumps produced by
``isegprobe_tpu.inference.eval_utils.get_save_feats_callback``.

Usage:
    python -m isegprobe_tpu.plots.plot_features \
        --lr_feats_path /path/to/feats --hr_feats_paths /p1,/p2 \
        --img_ids 0,1,2 --save_dir out/ --title "Feature Visualization"
"""

from __future__ import annotations

import argparse
from datetime import datetime
from pathlib import Path

import numpy as np
from PIL import Image

from isegprobe_tpu.utils.misc import seed_all
from isegprobe_tpu.utils.pca import fit_joint_pca


def load_features(img_ids, lr_path, hr_paths):
    images, lr_list, hr_lists = [], [], []
    for img_id in img_ids:
        image = Image.open(Path(lr_path) / "images" / f"{img_id}_0_image.jpg")
        images.append(np.asarray(image))
        lr_list.append(np.load(Path(lr_path) / f"{img_id}_0_LowRes.npy")[0])
        hr_lists.append([
            np.load(Path(p) / f"{img_id}_0_HighRes.npy")[0] for p in hr_paths
        ])
    return images, lr_list, hr_lists


def main(args) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    seed_all(args.seed)
    img_ids = [int(x) for x in args.img_ids.split(",")]
    hr_paths = args.hr_feats_paths.split(",")
    captions = args.feats_captions.split(",") if args.feats_captions else [
        f"HR {i}" for i in range(len(hr_paths))
    ]

    images, lr_list, hr_lists = load_features(img_ids, args.lr_feats_path,
                                              hr_paths)
    n, m = len(images), len(hr_paths)
    fig, axes = plt.subplots(n, m + 2, figsize=(3 * (m + 2), 3 * n),
                             squeeze=False)
    for i in range(n):
        axes[i][0].imshow(images[i])
        axes[i][0].set_title("image")
        for j, hr in enumerate(hr_lists[i]):
            lr_rgb, hr_rgb = fit_joint_pca(lr_list[i], hr)
            if j == 0:
                axes[i][1].imshow(lr_rgb)
                axes[i][1].set_title("LowRes")
            axes[i][j + 2].imshow(hr_rgb)
            axes[i][j + 2].set_title(captions[j])
        for ax in axes[i]:
            ax.axis("off")
    if args.title:
        fig.suptitle(args.title)
    fig.tight_layout()

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M")
    out = save_dir / f"features_{stamp}.png"
    fig.savefig(out, dpi=150)
    print(f"Saved: {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--lr_feats_path", required=True)
    parser.add_argument("--hr_feats_paths", required=True)
    parser.add_argument("--feats_captions", default="")
    parser.add_argument("--img_ids", default="0")
    parser.add_argument("--save_dir", default="./plots")
    parser.add_argument("--title", default="")
    parser.add_argument("--seed", type=int, default=1)
    main(parser.parse_args())
