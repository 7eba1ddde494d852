"""Host-side data pipeline: deterministic numpy transforms → padded,
statically-shaped device batches.

TPU-native rework of the reference pipeline
(mmdet/datasets/pipelines/transforms.py, formating.py): instead of
DataContainers with ragged tensors, every sample is padded to
(img_size², MAX_GT) so batches feed one compiled program.  OBB
augmentation parity: flips re-canonicalise pointobbs
(transforms.py:276-306), Pointobb2RBBox converts gt to the head's
encoding (transforms.py:1020-1096).
"""

from __future__ import annotations

import numpy as np

from . import np_rboxes as NR
from . import transforms as T

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def normalize_image(img, mean=IMAGENET_MEAN, std=IMAGENET_STD, to_rgb=True):
    """Parity: pipelines Normalize (transforms.py:405-433)."""
    img = img.astype(np.float32)
    if to_rgb and img.shape[-1] == 3:
        img = img[..., ::-1]
    return (img - mean) / std


def _np_best_point_sort(pointobbs):
    if len(pointobbs) == 0:
        return pointobbs
    return NR.pointobb_best_point_sort(np.asarray(pointobbs))


def resize_keep_ratio(img, target: int):
    """Resize long edge to target, keep aspect (Resize keep_ratio=True,
    transforms.py:27-112). Returns (img, scale_factor)."""
    import cv2
    h, w = img.shape[:2]
    scale = min(target / h, target / w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    out = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    return out, scale


class TrainPipeline:
    """load → resize → flip → normalize → pad → fixed-gt pack."""

    def __init__(self, img_size: int = 1024, max_gt: int = 256,
                 flip_ratio: float = 0.5, rotate90_ratio: float = 0.0,
                 with_rbox: bool = True,
                 rbox_encode: str = "thetaobb",
                 with_mask: bool = False, mask_size: int = 0,
                 mask_type: str = "binary",
                 with_mask_weight: bool = False,
                 with_reverse_mask_weight: bool = False,
                 with_semantic: bool = False,
                 with_heatmap_weight: bool = False,
                 reverse_heatmap_weight: bool = False,
                 centermap_rate: float = 0.5,
                 centermap_factor: float = 4.0,
                 centermap_template: int = 512,
                 seg_scale: int = 4,
                 scale_range=None, albu=None, instaboost=None,
                 mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 to_rgb: bool = True, device_normalize: bool = False,
                 seed: int = 0):
        """mask_type: 'binary' (Mask R-CNN / MaskOBB) or 'centermap'
        (soft centerness pseudo-masks, loading.py:160-178).

        CenterMap-Net extras (parity: LoadAnnotations flags,
        loading.py:80-128, 211-230 + SegRescale 1/4):
          with_mask_weight / with_reverse_mask_weight — per-instance
            weight maps warped from the (255-centerness) resp.
            centerness template (mutually exclusive, like the
            reference's assert) → sample['gt_mask_weights'];
          with_semantic — class-index pseudo-segmentation painted from
            the OBB quads at img_size/seg_scale → sample['gt_semantic'];
          with_heatmap_weight — scene centerness heatmap in [0, 1] at
            the same resolution → sample['gt_seg_weights'];
          centermap_rate/centermap_factor — template shape parameters
            (centermap_rate=0.5, centermap_factor=4 in
            configs/dota/centermap_net_tgrs_mask_weight_V4.py).

        scale_range: optional (lo, hi) multi-scale training range —
        each sample resizes its long edge to a random target in
        [lo, hi] (≤ img_size) and pads to img_size, keeping the batch
        statically shaped (the 'ms' configs of the reference)."""
        assert not (with_mask_weight and with_reverse_mask_weight)
        self.scale_range = scale_range
        self.img_size = img_size
        self.max_gt = max_gt
        self.flip_ratio = flip_ratio
        self.rotate90_ratio = rotate90_ratio
        self.with_rbox = with_rbox
        self.rbox_encode = rbox_encode
        self.with_mask = with_mask
        self.mask_size = mask_size or img_size // 4
        self.mask_type = mask_type
        self.with_mask_weight = with_mask_weight
        self.with_reverse_mask_weight = with_reverse_mask_weight
        self.with_semantic = with_semantic
        self.with_heatmap_weight = with_heatmap_weight
        # reversed scene weight for the semantic branch (the
        # reference's offline 'reverse_heatmap_weight/' image dir,
        # configs/dota/centermap_net_tgrs_mask_weight_reverse_seg_weight_V4.py:202)
        self.reverse_heatmap_weight = reverse_heatmap_weight
        self.centermap_rate = centermap_rate
        self.centermap_factor = centermap_factor
        # reference loading.py:97 anchor_centermap_scale (the
        # '1024_1024_anchor' config variant renders the centerness
        # template at the full patch resolution)
        self.centermap_template = centermap_template
        self.seg_scale = seg_scale
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        self.device_normalize = device_normalize
        # optional albumentations stage (transforms.py:865 Albu);
        # raises at construction if the package is missing
        self.albu = None
        if albu:
            from .albu import AlbuTransform
            self.albu = AlbuTransform(albu)
        # optional InstaBoost stage (reference pipelines/instaboost.py,
        # configs/instaboost/*_4x.py place it right after LoadImage)
        self.instaboost = None
        if instaboost:
            from .instaboost import InstaBoost
            self.instaboost = InstaBoost(seed=seed + 1, **instaboost)
        self.rng = np.random.RandomState(seed)

    def __call__(self, img, anns):
        """img: HWC uint8 BGR (cv2 convention); anns: dict from dataset."""
        size = self.img_size
        if self.instaboost is not None:
            img, anns = self.instaboost(img, anns)
        if self.albu is not None:
            # Albu only maps bboxes/labels/pointobbs through the
            # transform; geometric albu ops would leave stale ignore
            # regions / polygon masks, so refuse those inputs loudly
            # rather than silently training on misaligned geometry.
            for stale in ("bboxes_ignore", "segmentations"):
                v = anns.get(stale)
                if v is not None and len(v):
                    raise ValueError(
                        f"albu pipeline stage does not transform "
                        f"'{stale}' — this sample carries "
                        f"{len(v)} of them; drop the albu stage or "
                        f"use a pipeline without {stale}")
            img, bb, lab, pp = self.albu(
                img, anns["bboxes"], anns["labels"],
                anns.get("pointobbs"))
            anns = dict(anns, bboxes=bb, labels=lab)
            if pp is not None:
                anns["pointobbs"] = pp
        if self.scale_range is not None:
            lo, hi = self.scale_range
            target = int(self.rng.uniform(lo, min(hi, size)))
        else:
            target = size
        img, scale = resize_keep_ratio(img, target)
        boxes = anns["bboxes"] * scale
        pointobbs = anns.get("pointobbs")
        if pointobbs is not None and len(pointobbs):
            pointobbs = pointobbs * scale

        # 90-degree-multiple rotation (reference RandomRotate with
        # choice=(0, 90, 180, 270), the `_rotation`/`_rotate` config
        # family). Applied before mask/semantic synthesis, which is
        # painted from the rotated pointobbs downstream.
        if self.rotate90_ratio and self.rng.rand() < self.rotate90_ratio:
            img, rp, rb, _ = T.random_rotate90(
                img, pointobbs, boxes, rng=self.rng)
            # the helper returns None for empty/absent inputs — keep
            # the original (empty) arrays so downstream shapes hold
            boxes = rb if rb is not None else boxes
            pointobbs = rp if rp is not None else pointobbs

        flip = self.rng.rand() < self.flip_ratio
        h, w = img.shape[:2]
        if flip:
            img = img[:, ::-1]
            x1 = w - boxes[:, 2] - 1
            x2 = w - boxes[:, 0] - 1
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], -1)
            if pointobbs is not None and len(pointobbs):
                pointobbs = NR.pointobb_flip(pointobbs, (h, w))

        if self.device_normalize:
            # ship raw uint8 BGR; (x - mean)/std (+ channel flip) runs
            # inside the jitted step (models/preprocess.py) — 4x less
            # host->device traffic than normalized float32.  Pad with
            # the rounded mean pixel so the pad region normalizes to
            # ~0, matching the host path's normalize-then-zero-pad.
            pad_val = np.round(self.mean[::-1] if self.to_rgb
                               else self.mean).astype(np.uint8)
            padded = np.broadcast_to(
                pad_val, (size, size, img.shape[-1])).copy()
            padded[:h, :w] = img
        else:
            img = normalize_image(img, self.mean, self.std, self.to_rgb)
            padded = np.zeros((size, size, img.shape[-1]), np.float32)
            padded[:h, :w] = img

        g = self.max_gt
        n = min(len(boxes), g)
        out_boxes = np.zeros((g, 4), np.float32)
        out_boxes[:n] = boxes[:n]
        out_labels = np.zeros((g,), np.int32)
        out_labels[:n] = anns["labels"][:n]
        out_valid = np.zeros((g,), bool)
        out_valid[:n] = True

        sample = dict(imgs=padded, gt_boxes=out_boxes, gt_labels=out_labels,
                      gt_valid=out_valid,
                      img_shapes=np.asarray([h, w], np.float32))

        if self.with_rbox:
            # pointobbs can be absent entirely on patches whose every
            # annotation fell in the ignore set (prepare_dota keeps
            # them when bboxes_ignore is non-empty) — still emit the
            # zero rbox slot or collate_batch KeyErrors on the mixed
            # batch
            nr = n if (pointobbs is not None and len(pointobbs)) else 0
            p = _np_best_point_sort(pointobbs[:nr]) if nr else \
                np.zeros((0, 8), np.float32)
            d = {"thetaobb": 5, "pointobb": 8, "hobb": 5}[self.rbox_encode]
            out_r = np.zeros((g, d), np.float32)
            if nr:
                if self.rbox_encode == "pointobb":
                    out_r[:nr] = p
                elif self.rbox_encode == "thetaobb":
                    out_r[:nr] = NR.pointobb2thetaobb(p)
                else:
                    out_r[:nr] = NR.pointobb2hobb(p)
            sample["gt_rboxes"] = out_r

        if self.with_mask:
            ms = self.mask_size
            masks = np.zeros((g, ms, ms), np.float32)
            if n and pointobbs is not None:
                if self.mask_type == "centermap":
                    from .centermap import pointobbs2centermap
                    masks[:n] = pointobbs2centermap(
                        np.asarray(pointobbs[:n]), (self.img_size,
                                                    self.img_size),
                        mask_size=ms, factor=self.centermap_factor,
                        rate=self.centermap_rate,
                        template_size=self.centermap_template)
                else:
                    masks[:n] = rasterize_polygons(
                        pointobbs[:n], (self.img_size, self.img_size), ms)
            sample["gt_masks"] = self._quantize(masks)

        if self.with_mask_weight or self.with_reverse_mask_weight:
            from .centermap import pointobbs2centermap
            ms = self.mask_size
            weights = np.zeros((g, ms, ms), np.float32)
            if n and pointobbs is not None:
                kind = ("weight" if self.with_mask_weight else "reverse")
                weights[:n] = pointobbs2centermap(
                    np.asarray(pointobbs[:n]),
                    (self.img_size, self.img_size), mask_size=ms,
                    factor=self.centermap_factor, kind=kind,
                    template_size=self.centermap_template)
            sample["gt_mask_weights"] = self._quantize(weights)

        if self.with_semantic or self.with_heatmap_weight:
            from .centermap import heatmap_weight, pseudo_segmentation
            out_size = self.img_size // self.seg_scale
            quads = (np.asarray(pointobbs[:n], np.float32)
                     if (n and pointobbs is not None)
                     else np.zeros((0, 8), np.float32))
            if self.with_semantic:
                sample["gt_semantic"] = pseudo_segmentation(
                    quads, anns["labels"][:n],
                    (self.img_size, self.img_size), out_size,
                    valid_hw=(h, w))
            if self.with_heatmap_weight:
                hw_map = heatmap_weight(
                    quads, (self.img_size, self.img_size), out_size,
                    factor=self.centermap_factor)
                if self.reverse_heatmap_weight:
                    hw_map = 1.0 - hw_map
                sample["gt_seg_weights"] = self._quantize(hw_map)
        return sample

    def _quantize(self, arr):
        """uint8-quantize [0,1] mask-type targets for transfer when the
        device normalizes anyway (4x less host->device traffic; the
        reference stores centermaps as uint8 images too —
        loading.py:110-127 — so /255 quantization is its native
        precision). Dequantized in the jitted loss."""
        if not self.device_normalize:
            return arr
        return np.round(arr * 255.0).astype(np.uint8)


class TestPipeline:
    __test__ = False  # not a pytest class

    def __init__(self, img_size: int = 1024,
                 mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 to_rgb: bool = True, device_normalize: bool = False):
        self.img_size = img_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        self.device_normalize = device_normalize

    def __call__(self, img):
        size = self.img_size
        img, scale = resize_keep_ratio(img, size)
        h, w = img.shape[:2]
        if (self.device_normalize and img.dtype == np.uint8
                and img.shape[-1] == 3):
            # raw uint8 out; normalization folds into the jitted
            # predict (models/preprocess.py) — 4x less transfer.
            # Mean-pixel padding normalizes to ~0 (host-path parity).
            pad_val = np.round(self.mean[::-1] if self.to_rgb
                               else self.mean).astype(np.uint8)
            padded = np.broadcast_to(pad_val, (size, size, 3)).copy()
            padded[:h, :w] = img
        elif img.dtype == np.uint8 and img.shape[-1] == 3:
            # fused native BGR→RGB + normalise + pad (single pass)
            from ..native import normalize_pad
            padded = normalize_pad(img, (size, size), self.mean,
                                   self.std, self.to_rgb)
        else:
            x = normalize_image(img, self.mean, self.std, self.to_rgb)
            padded = np.zeros((size, size, img.shape[-1]), np.float32)
            padded[:h, :w] = x
        return dict(imgs=padded,
                    img_shapes=np.asarray([h, w], np.float32),
                    scale_factors=np.asarray(scale, np.float32))


def rasterize_polygons(pointobbs, img_hw, mask_size):
    """Rasterise quads to binary masks at mask_size² resolution over the
    full image extent (mask targets are later roi-cropped on device)."""
    import cv2
    h, w = img_hw
    n = len(pointobbs)
    out = np.zeros((n, mask_size, mask_size), np.float32)
    sy = mask_size / h
    sx = mask_size / w
    for i, p in enumerate(pointobbs):
        pts = np.round(p.reshape(4, 2) * [sx, sy]).astype(np.int32)
        cv2.fillPoly(out[i], [pts], 1.0)
    return out


def collate_batch(samples: list) -> dict:
    """Stack per-sample dicts into [B, ...] numpy arrays."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}
