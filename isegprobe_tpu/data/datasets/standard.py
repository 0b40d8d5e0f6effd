"""Standard evaluation/training dataset loaders (reference:
core/data/datasets/{grabcut,berkeley,davis,sbd,pascalvoc}.py)."""

from __future__ import annotations

import pickle as pkl
from pathlib import Path

import cv2
import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample
from isegprobe_tpu.utils.misc import get_bbox_from_mask, get_labels_with_sizes


def _read_rgb(path: str) -> np.ndarray:
    image = cv2.imread(path)
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)


class GrabCutDataset(iSegBaseDataset):
    """GrabCut: gray-128 pixels are ignore regions (grabcut.py:12-42)."""

    def __init__(self, dataset_path, images_dir_name="data_GT",
                 masks_dir_name="boundary_GT", **kwargs) -> None:
        super().__init__(**kwargs)
        self.dataset_path = Path(dataset_path)
        self._images_path = self.dataset_path / images_dir_name
        self._insts_path = self.dataset_path / masks_dir_name
        self.dataset_samples = [x.name for x in sorted(self._images_path.glob("*.*"))]
        self._masks_paths = {x.stem: x for x in self._insts_path.glob("*.*")}

    def get_sample(self, index: int) -> DSample:
        image_name = self.dataset_samples[index]
        image = _read_rgb(str(self._images_path / image_name))
        mask_path = str(self._masks_paths[image_name.split(".")[0]])
        instances_mask = cv2.imread(mask_path)[:, :, 0].astype(np.int32)
        instances_mask[instances_mask == 128] = -1
        instances_mask[instances_mask > 128] = 1
        return DSample(image, instances_mask, objects_ids=[1], ignore_ids=[-1],
                       sample_id=index)


class BerkeleyDataset(GrabCutDataset):
    def __init__(self, dataset_path, **kwargs) -> None:
        super().__init__(dataset_path, images_dir_name="images",
                         masks_dir_name="masks", **kwargs)


class DavisDataset(iSegBaseDataset):
    """DAVIS-585 style layout; also used for COCO_MVal (davis.py:12-39)."""

    def __init__(self, dataset_path, images_dir_name="img", masks_dir_name="gt",
                 **kwargs) -> None:
        super().__init__(**kwargs)
        self.dataset_path = Path(dataset_path)
        self._images_path = self.dataset_path / images_dir_name
        self._insts_path = self.dataset_path / masks_dir_name
        self.dataset_samples = [x.name for x in sorted(self._images_path.glob("*.*"))]
        self._masks_paths = {x.stem: x for x in self._insts_path.glob("*.*")}

    def get_sample(self, index: int) -> DSample:
        image_name = self.dataset_samples[index]
        image = _read_rgb(str(self._images_path / image_name))
        mask_path = str(self._masks_paths[image_name.split(".")[0]])
        instances_mask = np.max(cv2.imread(mask_path).astype(np.int32), axis=2)
        instances_mask[instances_mask > 0] = 1
        return DSample(image, instances_mask, objects_ids=[1], sample_id=index)


def _load_sbd_mask(inst_info_path: str) -> np.ndarray:
    from scipy.io import loadmat

    return loadmat(inst_info_path)["GTinst"][0][0][0].astype(np.int32)


class SBDDataset(iSegBaseDataset):
    """SBD training split with buggy-mask filtering (sbd.py:15-76)."""

    def __init__(self, dataset_path, split="train", buggy_mask_thresh=0.08,
                 **kwargs) -> None:
        super().__init__(**kwargs)
        assert split in {"train", "val"}
        self.dataset_path = Path(dataset_path)
        self.dataset_split = split
        self._images_path = self.dataset_path / "img"
        self._insts_path = self.dataset_path / "inst"
        self._buggy_objects = {}
        self._buggy_mask_thresh = buggy_mask_thresh
        with open(self.dataset_path / f"{split}.txt") as f:
            self.dataset_samples = [x.strip() for x in f.readlines()]

    def get_sample(self, index: int) -> DSample:
        image_name = self.dataset_samples[index]
        image = _read_rgb(str(self._images_path / f"{image_name}.jpg"))
        instances_mask = _load_sbd_mask(str(self._insts_path / f"{image_name}.mat"))
        instances_mask = self.remove_buggy_masks(index, instances_mask)
        instances_ids, _ = get_labels_with_sizes(instances_mask)
        return DSample(image, instances_mask, objects_ids=instances_ids,
                       sample_id=index)

    def remove_buggy_masks(self, index: int, instances_mask: np.ndarray):
        if self._buggy_mask_thresh > 0.0:
            buggy_image_objects = self._buggy_objects.get(index)
            if buggy_image_objects is None:
                buggy_image_objects = []
                instances_ids, _ = get_labels_with_sizes(instances_mask)
                for obj_id in instances_ids:
                    obj_mask = instances_mask == obj_id
                    bbox = get_bbox_from_mask(obj_mask)
                    bbox_area = (bbox[1] - bbox[0] + 1) * (bbox[3] - bbox[2] + 1)
                    if obj_mask.sum() / bbox_area < self._buggy_mask_thresh:
                        buggy_image_objects.append(obj_id)
                self._buggy_objects[index] = buggy_image_objects
            for obj_id in buggy_image_objects:
                instances_mask[instances_mask == obj_id] = 0
        return instances_mask


class SBDEvaluationDataset(iSegBaseDataset):
    """Per-instance flattening of SBD with a pickle cache (sbd.py:79-131)."""

    def __init__(self, dataset_path, split="val", **kwargs) -> None:
        super().__init__(**kwargs)
        assert split in {"train", "val"}
        self.dataset_path = Path(dataset_path)
        self.dataset_split = split
        self._images_path = self.dataset_path / "img"
        self._insts_path = self.dataset_path / "inst"
        with open(self.dataset_path / f"{split}.txt") as f:
            self.dataset_samples = [x.strip() for x in f.readlines()]
        self.dataset_samples = self.get_sbd_images_and_ids_list()

    def get_sample(self, index: int) -> DSample:
        image_name, instance_id = self.dataset_samples[index]
        image = _read_rgb(str(self._images_path / f"{image_name}.jpg"))
        instances_mask = _load_sbd_mask(str(self._insts_path / f"{image_name}.mat"))
        instances_mask[instances_mask != instance_id] = 0
        instances_mask[instances_mask > 0] = 1
        return DSample(image, instances_mask, objects_ids=[1], sample_id=index)

    def get_sbd_images_and_ids_list(self):
        pkl_path = self.dataset_path / f"{self.dataset_split}_images_and_ids_list.pkl"
        if pkl_path.exists():
            with open(str(pkl_path), "rb") as fp:
                return pkl.load(fp)
        images_and_ids_list = []
        for sample in self.dataset_samples:
            instances_mask = _load_sbd_mask(str(self._insts_path / f"{sample}.mat"))
            instances_ids, _ = get_labels_with_sizes(instances_mask)
            for instance_id in instances_ids:
                images_and_ids_list.append((sample, instance_id))
        with open(str(pkl_path), "wb") as fp:
            pkl.dump(images_and_ids_list, fp)
        return images_and_ids_list


class PascalVocDataset(iSegBaseDataset):
    """(pascalvoc.py:13-60); label 220 marks ignore boundaries."""

    def __init__(self, dataset_path, split="train", **kwargs) -> None:
        super().__init__(**kwargs)
        assert split in {"train", "val", "trainval", "test"}
        self.dataset_path = Path(dataset_path)
        self._images_path = self.dataset_path / "JPEGImages"
        self._insts_path = self.dataset_path / "SegmentationObject"
        self.dataset_split = split
        if split == "test":
            with open(self.dataset_path / "ImageSets/Segmentation/test.pickle",
                      "rb") as f:
                self.dataset_samples, self.instance_ids = pkl.load(f)
        else:
            with open(self.dataset_path / f"ImageSets/Segmentation/{split}.txt") as f:
                self.dataset_samples = [name.strip() for name in f.readlines()]

    def get_sample(self, index: int) -> DSample:
        sample_id = self.dataset_samples[index]
        image = _read_rgb(str(self._images_path / f"{sample_id}.jpg"))
        instances_mask = cv2.imread(str(self._insts_path / f"{sample_id}.png"))
        instances_mask = cv2.cvtColor(instances_mask, cv2.COLOR_BGR2GRAY).astype(
            np.int32
        )
        if self.dataset_split == "test":
            instance_id = self.instance_ids[index]
            mask = np.zeros_like(instances_mask)
            mask[instances_mask == 220] = 220
            mask[instances_mask == instance_id] = 1
            objects_ids = [1]
            instances_mask = mask
        else:
            objects_ids = [
                int(x) for x in np.unique(instances_mask) if x not in (0, 220)
            ]
        return DSample(image, instances_mask, objects_ids=objects_ids,
                       ignore_ids=[220], sample_id=index)
