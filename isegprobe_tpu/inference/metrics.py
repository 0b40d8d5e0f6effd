"""NoC / mIoU / timing metrics and the results table
(reference: core/inference/utils.py:25-34, 123-146, 174-246, 386-450)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def compute_noc_metric(
    all_ious: List[np.ndarray], iou_thrs: Sequence[float], max_clicks: int = 20
) -> Tuple[List[float], List[float], List[int]]:
    """Mean number of clicks to reach each IoU threshold (capped at
    max_clicks), its std, and the count of samples that never reach it."""

    def _get_noc(iou_arr, thr):
        vals = iou_arr >= thr
        return np.argmax(vals) + 1 if np.any(vals) else max_clicks

    noc_list, noc_std, over_max = [], [], []
    for thr in iou_thrs:
        scores = np.array([_get_noc(a, thr) for a in all_ious], dtype=np.int64)
        noc_list.append(float(scores.mean()))
        noc_std.append(float(scores.std()))
        over_max.append(int((scores == max_clicks).sum()))
    return noc_list, noc_std, over_max


def get_time_metrics(all_ious, elapsed_time) -> Tuple[float, float]:
    n_images = len(all_ious)
    n_clicks = sum(map(len, all_ious))
    return elapsed_time / n_clicks, elapsed_time / n_images


def miou_at_k(all_ious: List[np.ndarray], max_clicks: int = 20) -> np.ndarray:
    """Mean IoU after k clicks for k = 1..max_clicks; a sample that stopped
    early keeps its final IoU for later k (it already reached the target)."""
    table = np.zeros((len(all_ious), max_clicks), dtype=np.float64)
    for i, arr in enumerate(all_ious):
        filled = np.concatenate([arr, np.full(max_clicks - len(arr), arr[-1])])
        table[i] = filled
    return table.mean(axis=0)


def get_results_table(
    noc_list,
    over_max_list,
    brs_type: str,
    dataset_name: str,
    mean_spc: float,
    elapsed_time: float,
    n_clicks: int = 20,
    model_name: str = "",
    print_header: bool = True,
    single_model_eval: bool = True,
) -> str:
    """Text results table byte-compatible with the reference format
    (core/inference/utils.py:174-246)."""
    table_header = (
        f'|{"BRS Type":^13}|{"Dataset":^11}|'
        f'{"NoC@80%":^9}|{"NoC@85%":^9}|{"NoC@90%":^9}|'
        f'{">="+str(n_clicks)+"@85%":^9}|{">="+str(n_clicks)+"@90%":^9}|'
        f'{"SPC,s":^7}|{"Time":^9}|'
    )
    row_width = len(table_header)

    header = f"Eval results for model: {model_name}\n" if model_name else ""
    header += "-" * row_width + "\n"
    header += table_header + "\n" + "-" * row_width

    eval_time = str(__import__("datetime").timedelta(seconds=int(elapsed_time)))
    table_row = f"|{brs_type:^13}|{dataset_name:^11}|"
    table_row += f"{noc_list[0]:^9.2f}|"
    table_row += f"{noc_list[1]:^9.2f}|" if len(noc_list) > 1 else f'{"?":^9}|'
    table_row += f"{noc_list[2]:^9.2f}|" if len(noc_list) > 2 else f'{"?":^9}|'
    table_row += f"{over_max_list[1]:^9}|" if len(over_max_list) > 1 else f'{"?":^9}|'
    table_row += f"{over_max_list[2]:^9}|" if len(over_max_list) > 2 else f'{"?":^9}|'
    table_row += f"{mean_spc:^7.3f}|{eval_time:^9}|"

    return (header + "\n" + table_row) if print_header else table_row
