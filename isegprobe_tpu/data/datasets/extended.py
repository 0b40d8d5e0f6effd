"""Extended training datasets — all pure cv2/json/pickle.

Behavior spec: reference core/data/datasets/{coco_lvis,lvis,coco,ade20k,
openimages}.py. The on-disk formats dictate parsing; the expression here is
original: hierarchy assembly and stuff-layer handling are factored into
helpers, LVIS's overlap rule lives in a placement predicate, and COCO panoptic
decodes its RGB ids with a dot product.
"""

from __future__ import annotations

import json
import pickle
import random
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

import cv2
import numpy as np

from isegprobe_tpu.data.base_dataset import iSegBaseDataset
from isegprobe_tpu.data.sample import DSample
from isegprobe_tpu.utils.misc import get_labels_with_sizes


def _read_rgb(path) -> np.ndarray:
    return cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)


class CocoLvisDataset(iSegBaseDataset):
    """Packed COCO+LVIS hierarchy dataset (ref coco_lvis.py:16-100).

    Each sample ships pre-encoded mask layers plus an instance hierarchy;
    "stuff" occupies the mapping slots past ``num_instance_masks`` and is
    either promoted to clickable objects (with prob ``stuff_prob``) or scrubbed
    from its layers.
    """

    def __init__(self, dataset_path, split="train", stuff_prob=0.0,
                 allow_list_name=None, anno_file="hannotation.pickle",
                 **kwargs) -> None:
        super().__init__(**kwargs)
        root = Path(dataset_path) / split
        self.split = split
        self._split_path = root
        self._images_path = root / "images"
        self._masks_path = root / "masks"
        self.stuff_prob = stuff_prob

        samples: Dict = pickle.loads((root / anno_file).read_bytes())
        if allow_list_name:
            allowed = set(json.loads((root / allow_list_name).read_text()))
            samples = {k: v for k, v in samples.items() if k in allowed}
        self.dataset_samples = sorted(samples.items())

    def get_sample(self, index: int) -> DSample:
        image_id, meta = self.dataset_samples[index]
        image = _read_rgb(self._images_path / f"{image_id}.jpg")
        packed, mapping = pickle.loads(
            (self._masks_path / f"{image_id}.pickle").read_bytes()
        )
        layers = np.stack(
            [cv2.imdecode(buf, cv2.IMREAD_UNCHANGED) for buf in packed], axis=2
        )

        # instance nodes: the stored hierarchy (None = isolated object) plus
        # this sample's (layer, label) mapping
        nodes = {}
        instance_ids = set(meta["hierarchy"]) | set(
            range(meta["num_instance_masks"])
        )
        for inst_id in instance_ids:
            info = meta["hierarchy"].get(inst_id) or {}
            nodes[inst_id] = {
                "mapping": mapping[inst_id],
                "parent": info.get("parent"),
                "children": list(info.get("children", [])),
            }

        stuff_ids = range(meta["num_instance_masks"], len(mapping))
        if self.stuff_prob > 0 and random.random() < self.stuff_prob:
            for sid in stuff_ids:
                nodes[sid] = {"mapping": mapping[sid], "parent": None,
                              "children": []}
        else:
            for sid in stuff_ids:
                layer_idx, label = mapping[sid]
                plane = layers[:, :, layer_idx]
                plane[plane == label] = 0

        return DSample(image, layers, objects=nodes)


class LvisDataset(iSegBaseDataset):
    """LVIS with polygon rasterization (ref lvis.py:15-108).

    Annotations are stamped in shuffled order; one is kept only when neither
    it nor anything already placed would be mostly covered (the
    ``max_overlap_ratio`` placement rule).
    """

    def __init__(self, dataset_path, split="train", max_overlap_ratio=0.5,
                 **kwargs) -> None:
        super().__init__(**kwargs)
        root = Path(dataset_path)
        self.split = split
        self.max_overlap_ratio = max_overlap_ratio
        self._train_path = root / "train"
        self._val_path = root / "val"

        payload = json.loads((root / split / f"lvis_{split}.json").read_text())
        self.annotations = defaultdict(list)
        for anno in payload["annotations"]:
            self.annotations[anno["image_id"]].append(anno)

        categories_cache = root / "train_categories.json"
        if not categories_cache.exists():
            train_meta = json.loads(
                (root / "train/lvis_train.json").read_text()
            )
            categories_cache.write_text(
                json.dumps(train_meta["categories"], indent=1)
            )
        self.dataset_samples = [
            img for img in payload["images"] if self.annotations[img["id"]]
        ]

    def _can_place(self, canvas, areas, obj_mask) -> bool:
        """Overlap rule: reject when the candidate is covered beyond the
        threshold OR it would cover any placed instance beyond it."""
        covered = (canvas[obj_mask] > 0).sum() / max(1, obj_mask.sum())
        worst = covered
        hit = np.bincount(canvas[obj_mask].ravel())
        for inst_id, overlap in enumerate(hit):
            if inst_id > 0 and overlap > 0:
                worst = max(worst, overlap / areas[inst_id])
        return worst <= self.max_overlap_ratio

    def get_sample(self, index: int) -> DSample:
        info = self.dataset_samples[index]
        annos = self.annotations[info["id"]]
        random.shuffle(annos)
        url = info["coco_url"]
        base = self._train_path if "train2017" in url else self._val_path
        image = _read_rgb(base / "images" / url.split("/")[-1])

        canvas = np.zeros(image.shape[:2], dtype=np.int32)
        areas: Dict[int, int] = defaultdict(int)
        object_ids: List[int] = []
        for rank, anno in enumerate(annos):
            obj_mask = self._rasterize(anno, image.shape[:2]) > 0
            if not self._can_place(canvas, areas, obj_mask):
                continue
            inst_id = rank + 1
            canvas[obj_mask] = inst_id
            areas[inst_id] = obj_mask.sum()
            object_ids.append(inst_id)

        return DSample(image, canvas, objects_ids=object_ids)

    @staticmethod
    def _rasterize(annotation, hw) -> np.ndarray:
        mask = np.zeros(hw, dtype=np.int32)
        for ring in annotation["segmentation"]:
            pts = np.round(np.asarray(ring).reshape(-1, 2)).astype(np.int32)
            cv2.fillPoly(mask, pts[None], 1)
        return mask


class CocoDataset(iSegBaseDataset):
    """COCO panoptic (ref coco.py:14-90): RGB-encoded segment ids; crowds
    dropped, stuff kept with prob ``stuff_prob``."""

    def __init__(self, dataset_path, split="train", stuff_prob=0.0, **kwargs):
        super().__init__(**kwargs)
        root = Path(dataset_path)
        self.split = split
        self.dataset_path = root
        self.stuff_prob = stuff_prob
        self.images_path = root / split
        self.labels_path = root / "annotations" / f"panoptic_{split}"
        payload = json.loads(
            (root / "annotations" / f"panoptic_{split}.json").read_text()
        )
        self.dataset_samples = payload["annotations"]
        self._thing_categories = {
            cat["id"] for cat in payload["categories"] if cat["isthing"] == 1
        }

    def get_sample(self, index: int) -> DSample:
        entry = self.dataset_samples[index]
        image = _read_rgb(
            self.images_path / entry["file_name"].replace(".png", ".jpg")
        )
        rgb = cv2.imread(str(self.labels_path / entry["file_name"]),
                         cv2.IMREAD_UNCHANGED).astype(np.int32)
        segment_ids = rgb @ np.asarray([256 * 256, 256, 1], dtype=np.int32)

        things = [
            seg["id"] for seg in entry["segments_info"]
            if seg["category_id"] in self._thing_categories
            and seg["iscrowd"] != 1
        ]
        stuff = [
            seg["id"] for seg in entry["segments_info"]
            if seg["category_id"] not in self._thing_categories
        ]
        keep_stuff = self.stuff_prob > 0 and random.random() < self.stuff_prob
        wanted = things + stuff if keep_stuff else things

        labels = np.where(np.isin(segment_ids, wanted), segment_ids, 0)
        return DSample(image, labels, objects_ids=wanted)


class ADE20kDataset(iSegBaseDataset):
    """(ref ade20k.py:16-80): layered instance PNGs, one random layer per
    draw; stuff instances scrubbed unless kept by ``stuff_prob``."""

    def __init__(self, dataset_path, split="train", stuff_prob=0.0, **kwargs):
        super().__init__(**kwargs)
        assert split in {"train", "val"}
        self.dataset_path = Path(dataset_path)
        self.dataset_split = split
        self.stuff_prob = stuff_prob
        anno_path = (self.dataset_path /
                     f"{split}-annotations-object-segmentation.pkl")
        if not anno_path.exists():
            raise RuntimeError(f"Can't find annotations at {anno_path}")
        self.annotations = pickle.loads(anno_path.read_bytes())
        self.dataset_samples = list(self.annotations)

    def get_sample(self, index: int) -> DSample:
        image_id = self.dataset_samples[index]
        meta = self.annotations[image_id]
        folder = self.dataset_path / meta["folder"]
        image = _read_rgb(folder / f"{image_id}.jpg")
        layer = random.choice(meta["layers"])
        # the blue channel carries the instance labels
        labels = cv2.imread(str(folder / layer["mask_name"]),
                            cv2.IMREAD_UNCHANGED)[:, :, 0].astype(np.int32)

        object_ids = get_labels_with_sizes(labels)[0]
        if self.stuff_prob <= 0 or random.random() > self.stuff_prob:
            for rank, obj_id in enumerate(object_ids):
                if rank in layer["stuff_instances"]:
                    labels[labels == obj_id] = 0
            object_ids = get_labels_with_sizes(labels)[0]

        return DSample(image, labels, objects_ids=object_ids, sample_id=index)


class OpenImagesDataset(iSegBaseDataset):
    """(ref openimages.py): one random binary mask per image; image and mask
    resolutions can disagree, so both shrink to the common extent."""

    def __init__(self, dataset_path, split="train", **kwargs):
        super().__init__(**kwargs)
        assert split in {"train", "val", "test"}
        root = Path(dataset_path) / split
        self.dataset_split = split
        self.dataset_path = Path(dataset_path)
        self._images_path = root / "images"
        self._masks_path = root / "masks"
        anno_path = root / f"{split}-annotations-object-segmentation_clean.pkl"
        if not anno_path.exists():
            raise RuntimeError(f"Can't find annotations at {anno_path}")
        payload = pickle.loads(anno_path.read_bytes())
        self.image_id_to_masks = payload["image_id_to_masks"]
        self.dataset_samples = payload["dataset_samples"]

    def get_sample(self, index: int) -> DSample:
        image_id = self.dataset_samples[index]
        image = _read_rgb(self._images_path / f"{image_id}.jpg")
        mask_name = random.choice(self.image_id_to_masks[image_id])
        gray = cv2.cvtColor(cv2.imread(str(self._masks_path / mask_name)),
                            cv2.COLOR_BGR2GRAY)
        binary = (gray > 0).astype(np.int32)

        h = min(image.shape[0], binary.shape[0])
        w = min(image.shape[1], binary.shape[1])
        if image.shape[:2] != (h, w):
            image = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
        if binary.shape != (h, w):
            binary = cv2.resize(binary, (w, h),
                                interpolation=cv2.INTER_NEAREST)

        return DSample(image, binary,
                       objects_ids=[1] if binary.any() else [],
                       sample_id=index)
