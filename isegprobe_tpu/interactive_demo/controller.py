"""Interactive-segmentation controller: multi-object annotation with undo
(reference: core/interactive_demo/controller.py:11-177).

UI-framework-agnostic (used by both the Tk demo and tests): holds the clicker
+ predictor state stack; undo restores the functional predictor state — the
"explicit pytree state" design gives this for free (SURVEY.md §7 delta #3).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from isegprobe_tpu.inference.clicker import Click, Clicker
from isegprobe_tpu.utils.viz import draw_with_blend_and_clicks


class InteractiveController:
    def __init__(
        self,
        predictor_factory: Callable[[], object],
        update_image_callback: Callable = lambda **kw: None,
        prob_thresh: float = 0.5,
    ) -> None:
        self.prob_thresh = prob_thresh
        self.clicker = Clicker()
        self.states = []
        self.probs_history = []
        self.object_count = 0
        self._result_mask = None
        self._init_mask = None

        self.image = None
        self.predictor_factory = predictor_factory
        self.predictor = None
        self.update_image_callback = update_image_callback
        self.reset_predictor()

    def set_image(self, image: np.ndarray) -> None:
        self.image = image
        self._result_mask = np.zeros(image.shape[:2], dtype=np.uint16)
        self.object_count = 0
        self.reset_last_object(update_image=False)
        self.update_image_callback(reset_canvas=True)

    def set_mask(self, mask: np.ndarray) -> bool:
        if self.image.shape[:2] != mask.shape[:2]:
            return False
        if len(self.probs_history) > 0:
            self.reset_last_object()
        init = mask.astype(np.float32)
        self.probs_history.append((np.zeros_like(init), init))
        self._init_mask = init
        self.clicker.click_indx_offset = 1
        return True

    def add_click(self, x: int, y: int, is_positive: bool) -> None:
        self.states.append({
            "clicker": self.clicker.get_state(),
            "predictor": self.predictor.get_states(),
        })
        self.clicker.add_click(Click(is_positive=is_positive, coords=(y, x)))
        pred = self.predictor.get_prediction(self.clicker,
                                             prev_mask=self._init_mask)
        if self._init_mask is not None and len(self.clicker) == 1:
            pred = self.predictor.get_prediction(self.clicker,
                                                 prev_mask=self._init_mask)

        if self.probs_history:
            self.probs_history.append((self.probs_history[-1][0], pred))
        else:
            self.probs_history.append((np.zeros_like(pred), pred))
        self.update_image_callback()

    def undo_click(self) -> None:
        if not self.states:
            return
        prev_state = self.states.pop()
        self.clicker.set_state(prev_state["clicker"])
        self.predictor.set_states(prev_state["predictor"])
        self.probs_history.pop()
        if not self.probs_history:
            self.reset_init_mask()
        self.update_image_callback()

    def partially_finish_object(self) -> None:
        object_prob = self.current_object_prob
        if object_prob is None:
            return
        self.probs_history.append((object_prob, np.zeros_like(object_prob)))
        self.states.append(self.states[-1])
        self.clicker.reset_clicks()
        self.reset_predictor()
        self.reset_init_mask()
        self.update_image_callback()

    def finish_object(self) -> None:
        if self.current_object_prob is None:
            return
        self._result_mask = self.result_mask
        self.object_count += 1
        self.reset_last_object()

    def reset_last_object(self, update_image: bool = True) -> None:
        self.states = []
        self.probs_history = []
        self.clicker.reset_clicks()
        self.reset_predictor()
        self.reset_init_mask()
        if update_image:
            self.update_image_callback()

    def reset_predictor(self) -> None:
        self.predictor = self.predictor_factory()
        if self.image is not None:
            self.predictor.set_input_image(self.image)

    def reset_init_mask(self) -> None:
        self._init_mask = None
        self.clicker.click_indx_offset = 0

    @property
    def current_object_prob(self) -> Optional[np.ndarray]:
        if self.probs_history:
            total, additive = self.probs_history[-1]
            return np.maximum(total, additive)
        return None

    @property
    def is_incomplete_mask(self) -> bool:
        return len(self.probs_history) > 0

    @property
    def result_mask(self) -> np.ndarray:
        result_mask = self._result_mask.copy()
        if self.probs_history:
            result_mask[self.current_object_prob > self.prob_thresh] = (
                self.object_count + 1
            )
        return result_mask

    def get_visualization(self, alpha_blend: float, click_radius: int):
        if self.image is None:
            return None
        results_mask_for_vis = self.result_mask
        vis = draw_with_blend_and_clicks(
            self.image,
            mask=results_mask_for_vis,
            alpha=alpha_blend,
            clicks_list=self.clicker.clicks_list,
            radius=click_radius,
            use_color_mask=True,
        )
        if self.probs_history:
            total_mask = self.probs_history[-1][0] > self.prob_thresh
            results_mask_for_vis[np.logical_not(total_mask)] = 0
            vis = draw_with_blend_and_clicks(
                vis, mask=results_mask_for_vis, alpha=alpha_blend
            )
        return vis
