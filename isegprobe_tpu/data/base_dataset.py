"""Dataset base class (behavior spec: reference core/data/base_dataset.py:16-122).

Framework-neutral (no torch.utils.data): batching is done by the trainer's
host prefetch loop.  Items are NHWC numpy::

    {'images': [H, W, 3] f32 in [0, 1],
     'points': [2N, 3] f32 (y, x, label), padded with -1,
     'instances': [H, W, 1] f32}

Structure: index resolution (virtual epochs / difficulty-weighted resampling)
lives in ``_resolve_index`` + the ``_WeightedIndex`` helper; item assembly in
``__getitem__`` is a straight pipeline over ``get_sample`` → augmentation →
click synthesis.  Subclasses implement ``get_sample`` and fill
``dataset_samples``.
"""

from __future__ import annotations

import pickle
import random
import threading
from typing import Dict, Optional

import numpy as np

from isegprobe_tpu.data.sample import DSample

# MultiPointSampler keeps its click plan in instance state (_plan/_target),
# and one sampler instance is shared by every worker THREAD of the default
# DataLoader (process workers each get their own pickled copy). Serialize the
# sample_object -> sample_points -> selected_mask critical section or two
# threads interleave and pair one image with another sample's clicks/mask.
# Module-level (not an attribute) so dataset instances stay picklable for the
# process-mode loader's initargs.
_SAMPLER_LOCK = threading.Lock()


class _WeightedIndex:
    """Difficulty-weighted index resampling from a precomputed score pickle.

    The pickle holds (index, _, score) triples; an item's draw probability is
    ``(1 - score) ** gamma`` normalized (ref base_dataset.py:107-122).
    """

    def __init__(self, path: str, gamma: float) -> None:
        with open(path, "rb") as f:
            rows = pickle.load(f)
        self.indices = [r[0] for r in rows]
        w = np.array([(1.0 - r[2]) ** gamma for r in rows], dtype=np.float64)
        self.probs = w / w.sum()

    def draw(self) -> int:
        return np.random.choice(self.indices, p=self.probs)


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
        self.sample_points = sample_points
        self.dataset_samples = None
        self._weighted_index = (
            _WeightedIndex(samples_scores_path, samples_scores_gamma)
            if samples_scores_path is not None
            else None
        )

    # -- index resolution ---------------------------------------------------

    def _resolve_index(self, index: int) -> int:
        """Map the loader's index to a concrete sample index.

        Difficulty weighting (when configured) and virtual epochs
        (``epoch_len > 0``) both *replace* the incoming index with a random
        draw; otherwise the index passes through unchanged.
        """
        if self._weighted_index is not None:
            return self._weighted_index.draw()
        if self.epoch_len > 0:
            return random.randrange(len(self.dataset_samples))
        return index

    def __len__(self) -> int:
        return self.epoch_len if self.epoch_len > 0 else self.get_samples_number()

    def get_samples_number(self) -> int:
        return len(self.dataset_samples)

    # -- item assembly --------------------------------------------------------

    def __getitem__(self, index: int) -> Dict:
        sample = self.get_sample(self._resolve_index(index))
        sample = self.augment_sample(sample)
        sample.remove_small_objects(self.min_object_area)

        with _SAMPLER_LOCK:
            self.points_sampler.sample_object(sample)
            n_max = self.points_sampler.max_num_points * 2
            points = (
                np.array(self.points_sampler.sample_points(), dtype=np.float32)
                if self.sample_points
                # -1 sentinel padding, same convention as real click rows
                # (np.empty here would leak uninitialized floats as clicks)
                else np.full([n_max, 3], -1.0, dtype=np.float32)
            )
            mask = np.moveaxis(self.points_sampler.selected_mask, 0, -1)

        # keep uint8 images as uint8: the train step normalizes on device, and
        # the host->device batch upload shrinks 4x (it dominates step wall
        # time on tunnel-attached chips — see trainer.py)
        if sample.image.dtype == np.uint8:
            image = np.ascontiguousarray(sample.image)
        else:
            image = np.ascontiguousarray(sample.image, dtype=np.float32)

        mask_i8 = mask.astype(np.int8)
        # binary/ignore masks ride as int8 (4x smaller); soft masks stay f32
        instances = (mask_i8 if np.array_equal(mask, mask_i8)
                     else mask.astype(np.float32))

        item = {
            "images": image,
            "points": points,
            # selected_mask is [1, H, W]; device layout wants channels-last
            "instances": instances,
        }
        if self.with_image_info:
            item["image_info"] = sample.sample_id
        return item

    def augment_sample(self, sample: DSample) -> DSample:
        """Re-roll the augmentation until at least one object survives (or a
        background-only crop is explicitly kept with ``keep_background_prob``)."""
        if self.augmentator is None:
            return sample
        while True:
            sample.augment(self.augmentator)
            if len(sample) > 0:
                return sample
            if self.keep_background_prob < 0.0:
                return sample
            if random.random() < self.keep_background_prob:
                return sample

    def get_sample(self, index: int) -> DSample:
        raise NotImplementedError
