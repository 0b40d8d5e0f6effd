"""DSample: one image with layered instance masks and an object hierarchy
(reference: core/data/data_sample.py:13-218)."""

from __future__ import annotations

from copy import deepcopy
from typing import Dict, List, Optional, Tuple

import numpy as np

from isegprobe_tpu.utils.misc import get_labels_with_sizes


class DSample:
    def __init__(
        self,
        image: np.ndarray,
        encoded_masks: np.ndarray,
        objects: Optional[Dict] = None,
        objects_ids: Optional[List[int]] = None,
        ignore_ids: Optional[List[int]] = None,
        sample_id: Optional[int] = None,
    ) -> None:
        self.image = image
        self.sample_id = sample_id

        if len(encoded_masks.shape) == 2:
            encoded_masks = encoded_masks[:, :, np.newaxis]
        self._encoded_masks = encoded_masks
        self._ignored_regions = []

        if objects_ids is not None:
            if not objects_ids or not isinstance(objects_ids[0], tuple):
                assert encoded_masks.shape[2] == 1
                objects_ids = [(0, obj_id) for obj_id in objects_ids]

            self._objects = {}
            for indx, obj_mapping in enumerate(objects_ids):
                self._objects[indx] = {"parent": None, "mapping": obj_mapping,
                                       "children": []}

            if ignore_ids:
                if isinstance(ignore_ids[0], tuple):
                    self._ignored_regions = list(ignore_ids)
                else:
                    self._ignored_regions = [(0, region_id) for region_id in ignore_ids]
        else:
            self._objects = deepcopy(objects) if objects is not None else {}

        self._augmented = False
        self._soft_mask_aug = None
        self.points = None
        self._original_data = (self.image, self._encoded_masks,
                               deepcopy(self._objects))
        self.remove_small_objects(min_area=1)

    def augment(self, augmentator) -> None:
        """Apply an augmentation pipeline jointly to image and layered masks
        (reference: data_sample.py:60-84; replay/soft-mask path unsupported)."""
        self.reset_augmentation()
        aug_output = augmentator(image=self.image, mask=self._encoded_masks)
        self.image = aug_output["image"]
        self._encoded_masks = aug_output["mask"]
        self._compute_objects_areas()
        self.remove_small_objects(min_area=1)
        self._augmented = True

    def reset_augmentation(self) -> None:
        if not self._augmented:
            return
        orig_image, orig_masks, orig_objects = self._original_data
        self.image = orig_image
        self._encoded_masks = orig_masks
        self._objects = deepcopy(orig_objects)
        self._augmented = False
        self._soft_mask_aug = None

    @property
    def objects_ids(self) -> List[int]:
        return list(self._objects.keys())

    def get_object_mask(self, obj_id) -> np.ndarray:
        layer_indx, mask_id = self._objects[obj_id]["mapping"]
        obj_mask = (self._encoded_masks[:, :, layer_indx] == mask_id).astype(np.int32)
        if self._ignored_regions:
            for layer_indx_i, mask_id_i in self._ignored_regions:
                ignore_mask = self._encoded_masks[:, :, layer_indx_i] == mask_id_i
                obj_mask[ignore_mask] = -1
        return obj_mask

    def gt_mask(self, obj_id) -> np.ndarray:
        return self.get_object_mask(obj_id)

    @property
    def gt_masks(self):
        return [self.get_object_mask(i) for i in self.objects_ids]

    def get_soft_object_mask(self, obj_id) -> np.ndarray:
        # soft masks only exist under augmentation replay; hard mask otherwise
        return self.get_object_mask(obj_id).astype(np.float32)

    def get_background_mask(self) -> np.ndarray:
        return np.max(self._encoded_masks, axis=2) == 0

    @property
    def root_objects(self):
        return [obj_id for obj_id, obj in self._objects.items()
                if obj["parent"] is None]

    def remove_small_objects(self, min_area: int) -> None:
        if self._objects and "area" not in list(self._objects.values())[0]:
            self._compute_objects_areas()
        for obj_id, obj_info in list(self._objects.items()):
            if obj_info["area"] < min_area:
                self._remove_object(obj_id)

    def _compute_objects_areas(self) -> None:
        inverse_index = {
            obj["mapping"]: obj_id for obj_id, obj in self._objects.items()
        }
        ignored_regions_keys = set(self._ignored_regions)

        for layer_indx in range(self._encoded_masks.shape[2]):
            objects_ids, objects_areas = get_labels_with_sizes(
                self._encoded_masks[:, :, layer_indx]
            )
            for obj_id, obj_area in zip(objects_ids, objects_areas):
                inv_key = (layer_indx, obj_id)
                if inv_key in ignored_regions_keys:
                    continue
                try:
                    self._objects[inverse_index[inv_key]]["area"] = obj_area
                    del inverse_index[inv_key]
                except KeyError:
                    # layered masks can occlude objects entirely
                    layer = self._encoded_masks[:, :, layer_indx]
                    layer[layer == obj_id] = 0

        for obj_id in inverse_index.values():
            self._objects[obj_id]["area"] = 0

    def _remove_object(self, obj_id) -> None:
        obj_info = self._objects[obj_id]
        obj_parent = obj_info["parent"]
        for child_id in obj_info["children"]:
            self._objects[child_id]["parent"] = obj_parent
        if obj_parent is not None:
            parent_children = self._objects[obj_parent]["children"]
            parent_children = [x for x in parent_children if x != obj_id]
            self._objects[obj_parent]["children"] = parent_children + obj_info[
                "children"
            ]
        del self._objects[obj_id]

    def __len__(self) -> int:
        return len(self._objects)
