"""Plot mIoU vs clicks from evaluation iou-analysis pickles
(reference: core/plots/plot_iou_vs_clicks.py).

Usage:
    python -m isegprobe_tpu.plots.plot_iou_vs_clicks \
        --pickle_paths a.pickle,b.pickle --legend_names A,B --output_folder out/
"""

from __future__ import annotations

import argparse
import pickle
from datetime import datetime
from pathlib import Path
from typing import List

import numpy as np

MARKERS = ["o", "s", "^", "D", "v", "P", "*", "X"]


def plot_iou_vs_clicks(pickle_paths: List[str], legend_names: List[str],
                       output_folder: str, title: str = "") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(pickle_paths) != len(legend_names):
        raise ValueError("Number of paths must match number of legend names")
    out_dir = Path(output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    fig, ax = plt.subplots(figsize=(7, 5))
    for i, (path, name) in enumerate(zip(pickle_paths, legend_names)):
        with open(path, "rb") as f:
            data = pickle.load(f)
        all_ious = data["all_ious"]
        max_clicks = max(len(a) for a in all_ious)
        table = np.stack([
            np.concatenate([a, np.full(max_clicks - len(a), a[-1])])
            for a in all_ious
        ])
        miou = table.mean(axis=0)
        ax.plot(np.arange(1, max_clicks + 1), miou, label=name,
                marker=MARKERS[i % len(MARKERS)], markersize=4)

    ax.set_xlabel("Number of clicks")
    ax.set_ylabel("mIoU")
    ax.grid(alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M")
    out = out_dir / f"iou_vs_clicks_{stamp}.png"
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"Saved: {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pickle_paths", required=True)
    parser.add_argument("--legend_names", required=True)
    parser.add_argument("--output_folder", default="./plots")
    parser.add_argument("--title", default="")
    args = parser.parse_args()
    plot_iou_vs_clicks(args.pickle_paths.split(","),
                       args.legend_names.split(","), args.output_folder,
                       args.title)
