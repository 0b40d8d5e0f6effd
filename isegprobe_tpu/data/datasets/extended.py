"""Extended training datasets (reference: core/data/datasets/
{coco_lvis,lvis,coco,ade20k,openimages}.py) — all pure cv2/json/pickle."""

from __future__ import annotations

import json
import pickle
import random
from collections import defaultdict
from copy import deepcopy
from pathlib import Path

import cv2
import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample
from isegprobe_tpu.utils.misc import get_labels_with_sizes


def _read_rgb(path) -> np.ndarray:
    return cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)


class CocoLvisDataset(iSegBaseDataset):
    """Packed COCO+LVIS hierarchy dataset (coco_lvis.py:16-100)."""

    def __init__(self, dataset_path, split="train", stuff_prob=0.0,
                 allow_list_name=None, anno_file="hannotation.pickle",
                 **kwargs) -> None:
        super().__init__(**kwargs)
        dataset_path = Path(dataset_path)
        self._split_path = dataset_path / split
        self.split = split
        self._images_path = self._split_path / "images"
        self._masks_path = self._split_path / "masks"
        self.stuff_prob = stuff_prob

        with open(self._split_path / anno_file, "rb") as f:
            self.dataset_samples = sorted(pickle.load(f).items())

        if allow_list_name is not None:
            with open(self._split_path / allow_list_name) as f:
                allow_images_ids = set(json.load(f))
            self.dataset_samples = [
                s for s in self.dataset_samples if s[0] in allow_images_ids
            ]

    def get_sample(self, index: int) -> DSample:
        image_id, sample = self.dataset_samples[index]
        image = _read_rgb(self._images_path / f"{image_id}.jpg")

        with open(self._masks_path / f"{image_id}.pickle", "rb") as f:
            encoded_layers, objs_mapping = pickle.load(f)
        layers = [cv2.imdecode(x, cv2.IMREAD_UNCHANGED) for x in encoded_layers]
        layers = np.stack(layers, axis=2)

        instances_info = deepcopy(sample["hierarchy"])
        for inst_id, inst_info in list(instances_info.items()):
            if inst_info is None:
                inst_info = {"children": [], "parent": None, "node_level": 0}
                instances_info[inst_id] = inst_info
            inst_info["mapping"] = objs_mapping[inst_id]

        if self.stuff_prob > 0 and random.random() < self.stuff_prob:
            for inst_id in range(sample["num_instance_masks"], len(objs_mapping)):
                instances_info[inst_id] = {
                    "mapping": objs_mapping[inst_id], "parent": None,
                    "children": [],
                }
        else:
            for inst_id in range(sample["num_instance_masks"], len(objs_mapping)):
                layer_indx, mask_id = objs_mapping[inst_id]
                layers[:, :, layer_indx][layers[:, :, layer_indx] == mask_id] = 0

        return DSample(image, layers, objects=instances_info)


class LvisDataset(iSegBaseDataset):
    """LVIS with polygon rasterization and overlap filtering (lvis.py:15-108)."""

    def __init__(self, dataset_path, split="train", max_overlap_ratio=0.5,
                 **kwargs) -> None:
        super().__init__(**kwargs)
        dataset_path = Path(dataset_path)
        train_categories_path = dataset_path / "train_categories.json"
        self._train_path = dataset_path / "train"
        self._val_path = dataset_path / "val"
        self.split = split
        self.max_overlap_ratio = max_overlap_ratio

        with open(dataset_path / split / f"lvis_{split}.json") as f:
            json_annotation = json.loads(f.read())

        self.annotations = defaultdict(list)
        for x in json_annotation["annotations"]:
            self.annotations[x["image_id"]].append(x)

        if not train_categories_path.exists():
            self.generate_train_categories(dataset_path, train_categories_path)
        self.dataset_samples = [
            x for x in json_annotation["images"]
            if len(self.annotations[x["id"]]) > 0
        ]

    def get_sample(self, index: int) -> DSample:
        image_info = self.dataset_samples[index]
        image_id, image_url = image_info["id"], image_info["coco_url"]
        image_filename = image_url.split("/")[-1]
        image_annotations = self.annotations[image_id]
        random.shuffle(image_annotations)

        base = self._train_path if "train2017" in image_url else self._val_path
        image = _read_rgb(base / "images" / image_filename)

        instances_mask = None
        instances_area = defaultdict(int)
        objects_ids = []
        for indx, obj_annotation in enumerate(image_annotations):
            mask = self.get_mask_from_polygon(obj_annotation, image)
            object_mask = mask > 0
            object_area = object_mask.sum()
            if instances_mask is None:
                instances_mask = np.zeros_like(object_mask, dtype=np.int32)

            overlap_ids = np.bincount(instances_mask[object_mask].flatten())
            overlap_areas = [
                overlap_area / instances_area[inst_id]
                for inst_id, overlap_area in enumerate(overlap_ids)
                if overlap_area > 0 and inst_id > 0
            ]
            overlap_ratio = (
                np.logical_and(object_mask, instances_mask > 0).sum() / object_area
            )
            if overlap_areas:
                overlap_ratio = max(overlap_ratio, max(overlap_areas))
            if overlap_ratio > self.max_overlap_ratio:
                continue

            instance_id = indx + 1
            instances_mask[object_mask] = instance_id
            instances_area[instance_id] = object_area
            objects_ids.append(instance_id)

        return DSample(image, instances_mask, objects_ids=objects_ids)

    @staticmethod
    def get_mask_from_polygon(annotation, image) -> np.ndarray:
        mask = np.zeros(image.shape[:2], dtype=np.int32)
        for contour_points in annotation["segmentation"]:
            pts = np.round(np.array(contour_points).reshape(-1, 2)).astype(np.int32)
            cv2.fillPoly(mask, pts[np.newaxis], 1)
        return mask

    @staticmethod
    def generate_train_categories(dataset_path, train_categories_path):
        with open(dataset_path / "train/lvis_train.json") as f:
            annotation = json.load(f)
        with open(train_categories_path, "w") as f:
            json.dump(annotation["categories"], f, indent=1)


class CocoDataset(iSegBaseDataset):
    """COCO panoptic (coco.py:14-90)."""

    def __init__(self, dataset_path, split="train", stuff_prob=0.0, **kwargs):
        super().__init__(**kwargs)
        self.split = split
        self.dataset_path = Path(dataset_path)
        self.stuff_prob = stuff_prob
        self.load_samples()

    def load_samples(self) -> None:
        annotation_path = (
            self.dataset_path / "annotations" / f"panoptic_{self.split}.json"
        )
        self.labels_path = self.dataset_path / "annotations" / f"panoptic_{self.split}"
        self.images_path = self.dataset_path / self.split
        with open(annotation_path) as f:
            annotation = json.load(f)
        self.dataset_samples = annotation["annotations"]
        self._categories = annotation["categories"]
        self._things_labels_set = {
            x["id"] for x in self._categories if x["isthing"] == 1
        }

    def get_sample(self, index: int) -> DSample:
        dataset_sample = self.dataset_samples[index]
        image = _read_rgb(
            self.images_path / dataset_sample["file_name"].replace(".png", ".jpg")
        )
        label = cv2.imread(
            str(self.labels_path / dataset_sample["file_name"]), cv2.IMREAD_UNCHANGED
        ).astype(np.int32)
        label = 256 * 256 * label[:, :, 0] + 256 * label[:, :, 1] + label[:, :, 2]

        instance_map = np.full_like(label, 0)
        things_ids, stuff_ids = [], []
        for segment in dataset_sample["segments_info"]:
            obj_id = segment["id"]
            if segment["category_id"] in self._things_labels_set:
                if segment["iscrowd"] == 1:
                    continue
                things_ids.append(obj_id)
            else:
                stuff_ids.append(obj_id)
            instance_map[label == obj_id] = obj_id

        if self.stuff_prob > 0 and random.random() < self.stuff_prob:
            instances_ids = things_ids + stuff_ids
        else:
            instances_ids = things_ids
            for stuff_id in stuff_ids:
                instance_map[instance_map == stuff_id] = 0

        return DSample(image, instance_map, objects_ids=instances_ids)


class ADE20kDataset(iSegBaseDataset):
    """(ade20k.py:16-80)"""

    def __init__(self, dataset_path, split="train", stuff_prob=0.0, **kwargs):
        super().__init__(**kwargs)
        assert split in {"train", "val"}
        self.dataset_path = Path(dataset_path)
        self.dataset_split = split
        self.stuff_prob = stuff_prob
        anno_path = self.dataset_path / f"{split}-annotations-object-segmentation.pkl"
        if not anno_path.exists():
            raise RuntimeError(f"Can't find annotations at {anno_path}")
        with anno_path.open("rb") as f:
            self.annotations = pickle.load(f)
        self.dataset_samples = list(self.annotations.keys())

    def get_sample(self, index: int) -> DSample:
        image_id = self.dataset_samples[index]
        sample_annos = self.annotations[image_id]
        image = _read_rgb(
            self.dataset_path / sample_annos["folder"] / f"{image_id}.jpg"
        )
        layer = random.choice(sample_annos["layers"])
        instances_mask = cv2.imread(
            str(self.dataset_path / sample_annos["folder"] / layer["mask_name"]),
            cv2.IMREAD_UNCHANGED,
        )[:, :, 0].astype(np.int32)  # B channel holds instances
        object_ids, _ = get_labels_with_sizes(instances_mask)

        if (self.stuff_prob <= 0) or (random.random() > self.stuff_prob):
            for i, object_id in enumerate(object_ids):
                if i in layer["stuff_instances"]:
                    instances_mask[instances_mask == object_id] = 0
            object_ids, _ = get_labels_with_sizes(instances_mask)

        return DSample(image, instances_mask, objects_ids=object_ids,
                       sample_id=index)


class OpenImagesDataset(iSegBaseDataset):
    """(openimages.py)"""

    def __init__(self, dataset_path, split="train", **kwargs):
        super().__init__(**kwargs)
        assert split in {"train", "val", "test"}
        self.dataset_path = Path(dataset_path)
        self._split_path = self.dataset_path / split
        self._images_path = self._split_path / "images"
        self._masks_path = self._split_path / "masks"
        self.dataset_split = split

        clean_anno_path = (
            self._split_path / f"{split}-annotations-object-segmentation_clean.pkl"
        )
        if not clean_anno_path.exists():
            raise RuntimeError(f"Can't find annotations at {clean_anno_path}")
        with clean_anno_path.open("rb") as f:
            annotations = pickle.load(f)
        self.image_id_to_masks = annotations["image_id_to_masks"]
        self.dataset_samples = annotations["dataset_samples"]

    def get_sample(self, index: int) -> DSample:
        image_id = self.dataset_samples[index]
        image = _read_rgb(self._images_path / f"{image_id}.jpg")

        mask_path = self._masks_path / random.choice(self.image_id_to_masks[image_id])
        instances_mask = cv2.cvtColor(cv2.imread(str(mask_path)),
                                      cv2.COLOR_BGR2GRAY)
        instances_mask[instances_mask > 0] = 1
        instances_mask = instances_mask.astype(np.int32)

        min_w = min(image.shape[1], instances_mask.shape[1])
        min_h = min(image.shape[0], instances_mask.shape[0])
        if image.shape[:2] != (min_h, min_w):
            image = cv2.resize(image, (min_w, min_h), interpolation=cv2.INTER_LINEAR)
        if instances_mask.shape != (min_h, min_w):
            instances_mask = cv2.resize(instances_mask, (min_w, min_h),
                                        interpolation=cv2.INTER_NEAREST)

        object_ids = [1] if instances_mask.sum() > 0 else []
        return DSample(image, instances_mask, objects_ids=object_ids,
                       sample_id=index)
