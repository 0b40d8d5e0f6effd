"""Combined datasets (behavior spec: reference core/data/compose_dataset.py:
11-51): plain concatenation, and a ratio-weighted random mixture whose length
is the sum of member lengths."""

from __future__ import annotations

from math import isclose
from typing import List, Tuple

import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample


def _flat_index(datasets) -> List[Tuple[int, int]]:
    """(member, local index) pairs covering every sample of every member."""
    return [
        (member, local)
        for member, ds in enumerate(datasets)
        for local in range(len(ds))
    ]


class ComposeDataset(iSegBaseDataset):
    """Concatenation: index i maps straight onto one member's sample."""

    def __init__(self, datasets: List[iSegBaseDataset], **kwargs) -> None:
        super().__init__(**kwargs)
        self._datasets = list(datasets)
        self.dataset_samples = _flat_index(self._datasets)

    def get_sample(self, index: int) -> DSample:
        member, local = self.dataset_samples[index]
        return self._datasets[member].get_sample(local)


class ProportionalComposeDataset(ComposeDataset):
    """Mixture: every draw ignores the index and picks a member by ratio,
    then a uniform sample within it."""

    def __init__(self, datasets: List[iSegBaseDataset], ratios: List[float],
                 **kwargs) -> None:
        if len(ratios) != len(datasets):
            raise ValueError("one mixing ratio per dataset required")
        if not isclose(sum(ratios), 1.0):
            raise ValueError(f"ratios must sum to 1, got {sum(ratios)}")
        super().__init__(datasets, **kwargs)
        self._ratios = list(ratios)

    def get_sample(self, index: int) -> DSample:
        del index  # mixture draws are independent of the requested index
        member = np.random.choice(len(self._datasets), p=self._ratios)
        local = np.random.choice(len(self._datasets[member]))
        return self._datasets[member].get_sample(local)
