"""COCO dataset via a first-party lightweight JSON reader (component C3,
SURVEY.md §2 — pycocotools is not installed in this environment, and its only
roles here are annotation loading and eval; both are reimplemented).

Handles the 91->80 contiguous category-id remapping and xywh->xyxy boxes.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


class CocoAnnotations:
    """Parsed instances_*.json: images, per-image annotations, category map."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.images: List[dict] = data["images"]
        self.image_by_id: Dict[int, dict] = {im["id"]: im for im in self.images}
        cats = sorted(data.get("categories", []), key=lambda c: c["id"])
        # contiguous 1-based labels in sorted-category-id order (91 -> 80)
        self.cat_id_to_label = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self.label_to_cat_id = {v: k for k, v in self.cat_id_to_label.items()}
        self.cat_names = {c["id"]: c["name"] for c in cats}
        self.anns_by_image: Dict[int, List[dict]] = {}
        for ann in data.get("annotations", []):
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)

    def boxes_for_image(self, image_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (boxes_px xyxy (G,4), labels (G,) contiguous 1-based)."""
        anns = self.anns_by_image.get(image_id, [])
        boxes, labels = [], []
        for a in anns:
            x, y, w, h = a["bbox"]  # COCO xywh
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            labels.append(self.cat_id_to_label[a["category_id"]])
        return (
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32),
        )


class CocoDetection:
    """Indexable dataset of (image_u8 (S,S,3), boxes_norm (G,4), labels (G,))."""

    def __init__(self, root: str, ann_file: str, image_size: int = 512):
        self.root = root
        self.image_size = image_size
        self.coco = CocoAnnotations(ann_file)
        # keep only images that exist on disk (partial mounts are common)
        self.images = [
            im for im in self.coco.images
            if os.path.exists(os.path.join(root, im["file_name"]))
        ]

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, i: int):
        from shape_based_object_detection_tpu.utils.image import decode_image_host
        from PIL import Image

        im = self.images[i]
        img = decode_image_host(os.path.join(self.root, im["file_name"]))
        h, w = im["height"], im["width"]
        boxes_px, labels = self.coco.boxes_for_image(im["id"])
        boxes = boxes_px / np.array([w, h, w, h], np.float32)
        s = self.image_size
        img = np.asarray(
            Image.fromarray(img).resize((s, s), Image.BILINEAR), np.uint8
        )
        return img, np.clip(boxes, 0.0, 1.0), labels
