"""Dataset base class (reference: core/data/base_dataset.py:16-122).

Framework-neutral (no torch.utils.data): training batching is done by the
trainer's host prefetch loop. Items are NHWC numpy: {'images': [H, W, 3] f32,
'points': [2N, 3] f32, 'instances': [H, W, 1] f32}.
"""

from __future__ import annotations

import pickle
import random
from typing import Dict, Optional

import numpy as np

from isegprobe_tpu.data.sample import DSample


class iSegBaseDataset:
    def __init__(
        self,
        augmentator=None,
        points_sampler=None,
        min_object_area: float = 0,
        keep_background_prob: float = 0.0,
        with_image_info: bool = False,
        samples_scores_path: Optional[str] = None,
        samples_scores_gamma: float = 1.0,
        sample_points: bool = True,
        epoch_len: int = -1,
    ) -> None:
        self.epoch_len = epoch_len
        self.augmentator = augmentator
        self.min_object_area = min_object_area
        self.keep_background_prob = keep_background_prob
        self.points_sampler = points_sampler
        self.with_image_info = with_image_info
        self.samples_precomputed_scores = self._load_samples_scores(
            samples_scores_path, samples_scores_gamma
        )
        self.sample_points = sample_points
        self.dataset_samples = None

    def __getitem__(self, index: int) -> Dict:
        if self.samples_precomputed_scores is not None:
            index = np.random.choice(
                self.samples_precomputed_scores["indices"],
                p=self.samples_precomputed_scores["probs"],
            )
        elif self.epoch_len > 0:
            index = random.randrange(0, len(self.dataset_samples))

        sample = self.get_sample(index)
        sample = self.augment_sample(sample)

        sample.remove_small_objects(self.min_object_area)
        self.points_sampler.sample_object(sample)
        if self.sample_points:
            points = np.array(self.points_sampler.sample_points())
        else:
            points = np.empty([self.points_sampler.max_num_points * 2, 3])
        mask = self.points_sampler.selected_mask  # [1, H, W] float

        output = {
            "images": np.ascontiguousarray(sample.image, dtype=np.float32) / 255.0
            if sample.image.dtype == np.uint8
            else np.ascontiguousarray(sample.image, dtype=np.float32),
            "points": points.astype(np.float32),
            "instances": np.moveaxis(mask, 0, -1).astype(np.float32),  # [H, W, 1]
        }
        if self.with_image_info:
            output["image_info"] = sample.sample_id
        return output

    def augment_sample(self, sample: DSample) -> DSample:
        if self.augmentator is None:
            return sample
        valid_augmentation = False
        while not valid_augmentation:
            sample.augment(self.augmentator)
            keep_sample = (
                self.keep_background_prob < 0.0
                or random.random() < self.keep_background_prob
            )
            valid_augmentation = len(sample) > 0 or keep_sample
        return sample

    def get_sample(self, index: int) -> DSample:
        raise NotImplementedError

    def __len__(self) -> int:
        if self.epoch_len > 0:
            return self.epoch_len
        return self.get_samples_number()

    def get_samples_number(self) -> int:
        return len(self.dataset_samples)

    @staticmethod
    def _load_samples_scores(samples_scores_path, samples_scores_gamma):
        """Precomputed per-sample difficulty weighting
        (reference: base_dataset.py:107-122)."""
        if samples_scores_path is None:
            return None
        with open(samples_scores_path, "rb") as f:
            images_scores = pickle.load(f)
        probs = np.array(
            [(1.0 - x[2]) ** samples_scores_gamma for x in images_scores]
        )
        probs /= probs.sum()
        return {"indices": [x[0] for x in images_scores], "probs": probs}
