"""Combined datasets (reference: core/data/compose_dataset.py:11-51)."""

from __future__ import annotations

from math import isclose
from typing import List

import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample


class ComposeDataset(iSegBaseDataset):
    """Concatenation of datasets."""

    def __init__(self, datasets: List[iSegBaseDataset], **kwargs) -> None:
        super().__init__(**kwargs)
        self._datasets = datasets
        self.dataset_samples = []
        for dataset_indx, dataset in enumerate(self._datasets):
            self.dataset_samples.extend(
                [(dataset_indx, i) for i in range(len(dataset))]
            )

    def get_sample(self, index: int) -> DSample:
        dataset_indx, sample_indx = self.dataset_samples[index]
        return self._datasets[dataset_indx].get_sample(sample_indx)


class ProportionalComposeDataset(iSegBaseDataset):
    """Ratio-weighted random mixture."""

    def __init__(self, datasets: List[iSegBaseDataset], ratios: List[float],
                 **kwargs) -> None:
        super().__init__(**kwargs)
        assert len(ratios) == len(datasets), (
            "The number of datasets must match the number of ratios"
        )
        assert isclose(sum(ratios), 1.0), "The sum of ratios must be equal to 1"
        self._ratios = ratios
        self._datasets = datasets
        self.dataset_samples = []
        for dataset_indx, dataset in enumerate(self._datasets):
            self.dataset_samples.extend(
                [(dataset_indx, i) for i in range(len(dataset))]
            )

    def get_sample(self, index: int) -> DSample:
        dataset_indx = np.random.choice(len(self._datasets), p=self._ratios)
        sample_indx = np.random.choice(len(self._datasets[dataset_indx]))
        return self._datasets[dataset_indx].get_sample(sample_indx)
