"""Simulated user for NoC evaluation (reference: core/inference/clicker.py).

Clicks at the deepest point (max EDT) of the largest error region; positive if
the false-negative region is deeper than the false-positive one; never clicks
the same pixel twice. Host-side and byte-faithful to the reference protocol —
the jittable decision rule lives in ops.edt.next_click_from_error and is tested
for decision parity.
"""

from __future__ import annotations

from copy import deepcopy
from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple

import numpy as np

from isegprobe_tpu.ops.edt import edt_l2sq


@dataclass
class Click:
    is_positive: bool
    coords: Tuple[float, float]  # (y, x)
    indx: Optional[int] = None

    @property
    def coords_and_indx(self):
        return (*self.coords, self.indx)

    def copy(self, **kwargs) -> "Click":
        return replace(self, **kwargs)


class Clicker:
    def __init__(
        self,
        gt_mask: Optional[np.ndarray] = None,
        init_clicks: Optional[List[Click]] = None,
        ignore_label: int = -1,
        click_indx_offset: int = 0,
    ) -> None:
        self.click_indx_offset = click_indx_offset
        if gt_mask is not None:
            self.gt_mask = gt_mask == 1
            self.not_ignore_mask = gt_mask != ignore_label
        else:
            self.gt_mask = None
        self.reset_clicks()
        if init_clicks is not None:
            for click in init_clicks:
                self.add_click(click)

    def make_next_click(self, pred_mask: np.ndarray) -> None:
        assert self.gt_mask is not None
        self.add_click(self._get_next_click(pred_mask))

    def get_clicks(self, clicks_limit: Optional[int] = None) -> List[Click]:
        return self.clicks_list[:clicks_limit]

    def _get_next_click(self, pred_mask: np.ndarray, padding: bool = True) -> Click:
        fn_mask = self.gt_mask & ~pred_mask & self.not_ignore_mask
        fp_mask = ~self.gt_mask & pred_mask & self.not_ignore_mask

        if padding:
            fn_mask = np.pad(fn_mask, 1)
            fp_mask = np.pad(fp_mask, 1)

        # squared EDT: monotonic in the true distance, so argmax location and
        # the FN-vs-FP comparison match the reference's cv2 float distances
        fn_d2 = edt_l2sq(fn_mask.astype(np.uint8))
        fp_d2 = edt_l2sq(fp_mask.astype(np.uint8))
        if padding:
            fn_d2 = fn_d2[1:-1, 1:-1]
            fp_d2 = fp_d2[1:-1, 1:-1]

        fn_d2 = fn_d2 * self.not_clicked_map
        fp_d2 = fp_d2 * self.not_clicked_map

        fn_max = fn_d2.max()
        fp_max = fp_d2.max()
        is_positive = fn_max > fp_max
        d2 = fn_d2 if is_positive else fp_d2
        coords_y, coords_x = np.where(d2 == d2.max())
        return Click(is_positive=bool(is_positive),
                     coords=(int(coords_y[0]), int(coords_x[0])))

    def add_click(self, click: Click) -> None:
        click.indx = self.click_indx_offset + self.num_pos_clicks + self.num_neg_clicks
        if click.is_positive:
            self.num_pos_clicks += 1
        else:
            self.num_neg_clicks += 1
        self.clicks_list.append(click)
        if self.gt_mask is not None:
            self.not_clicked_map[int(click.coords[0]), int(click.coords[1])] = False

    def _remove_last_click(self) -> None:
        click = self.clicks_list.pop()
        if click.is_positive:
            self.num_pos_clicks -= 1
        else:
            self.num_neg_clicks -= 1
        if self.gt_mask is not None:
            self.not_clicked_map[int(click.coords[0]), int(click.coords[1])] = True

    def reset_clicks(self) -> None:
        if self.gt_mask is not None:
            self.not_clicked_map = np.ones_like(self.gt_mask, dtype=bool)
        self.num_pos_clicks = 0
        self.num_neg_clicks = 0
        self.clicks_list: List[Click] = []

    def get_state(self) -> List[Click]:
        return deepcopy(self.clicks_list)

    def set_state(self, state: List[Click]) -> None:
        self.reset_clicks()
        for click in state:
            self.add_click(click)

    def __len__(self) -> int:
        return len(self.clicks_list)
