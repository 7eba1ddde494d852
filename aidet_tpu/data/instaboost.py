"""InstaBoost augmentation (parity: mmdet/datasets/pipelines/
instaboost.py — a thin wrapper over the external `instaboostfast`
package in the reference; Fang et al., "InstaBoost: Boosting Instance
Segmentation via Probability Map Guided Copy-Pasting").

`instaboostfast` is not available in this image, so the core
map-and-paste transform is implemented natively (numpy + cv2): for an
augmented sample, each instance with a polygon segmentation is lifted
off the canvas via its mask, the hole is inpainted, and the instance
is re-pasted under a small random affine jitter (translate ±dx/±dy px,
scale in `scale`, rotate in `theta` deg — the reference default
action_prob=(1, 0, 0) i.e. the "normal" local-jitter action;
"horizontal" additionally mirrors the instance). Boxes, polygons and
pointobbs are mapped through the same affine. The reference's
appearance-consistency location heatmap is intentionally not
replicated: with its default config the jitter is local, where the
uniform kernel is an accepted approximation (deviation recorded in
ROUND4_NOTES).

Operates on the repo's per-image annotation dict (data/coco.py
parse_anns format), the representation the pipeline actually carries —
not pycocotools ann lists.
"""

from __future__ import annotations

import numpy as np


def _poly_mask(segs, h, w):
    import cv2
    m = np.zeros((h, w), np.uint8)
    for poly in segs:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(m, [np.round(pts).astype(np.int32)], 1)
    return m


class InstaBoost:
    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5, seed=0):
        self.actions = tuple(action_candidate)
        p = np.asarray(action_prob, np.float64)
        self.action_p = p / p.sum()
        self.scale = scale
        self.dx = dx
        self.dy = dy
        self.theta = theta
        self.color_prob = color_prob
        self.aug_ratio = aug_ratio
        # own seeded stream like every other pipeline transform —
        # the global np.random would break run reproducibility
        self.rng = np.random.RandomState(seed)

    # -- per-instance affine -------------------------------------------------

    def _sample_affine(self, cx, cy, flip):
        """2x3 affine about the instance centre (cx, cy)."""
        import cv2
        ang = self.rng.uniform(*self.theta)
        s = self.rng.uniform(*self.scale)
        m = cv2.getRotationMatrix2D((float(cx), float(cy)), ang, s)
        m[0, 2] += self.rng.uniform(-self.dx, self.dx)
        m[1, 2] += self.rng.uniform(-self.dy, self.dy)
        if flip:  # mirror about the instance's vertical centre line
            f = np.array([[-1.0, 0.0, 2.0 * cx],
                          [0.0, 1.0, 0.0]])
            m = np.vstack([m, [0, 0, 1]]) @ np.vstack([f, [0, 0, 1]])
            m = m[:2]
        return m

    def _augment_one(self, img, segs, rng):
        """Lift one instance, inpaint its hole, paste it back jittered.

        Returns (img, m) where m is the applied 2x3 affine, or None when
        the instance has no usable mask."""
        import cv2
        h, w = img.shape[:2]
        mask = _poly_mask(segs, h, w)
        if mask.sum() < 4:
            return img, None
        ys, xs = np.nonzero(mask)
        cx, cy = xs.mean(), ys.mean()
        act = self.actions[rng.choice(len(self.actions), p=self.action_p)]
        if act == "skip":
            return img, None
        m = self._sample_affine(cx, cy, flip=(act == "horizontal"))

        inst = img * mask[..., None]
        # background: fill the instance hole from its surroundings
        bg = cv2.inpaint(img, mask, 3, cv2.INPAINT_TELEA)
        wm = cv2.warpAffine(mask, m, (w, h),
                            flags=cv2.INTER_NEAREST)
        wi = cv2.warpAffine(inst, m, (w, h), flags=cv2.INTER_LINEAR)
        if rng.rand() < self.color_prob:
            # mild per-instance color jitter (instaboostfast color_prob)
            gain = rng.uniform(0.8, 1.2, size=(1, 1, 3))
            wi = np.clip(wi.astype(np.float32) * gain, 0,
                         255).astype(img.dtype)
        out = np.where(wm[..., None].astype(bool), wi, bg)
        return out, m

    @staticmethod
    def _map_pts(pts, m):
        return pts @ m[:, :2].T + m[:, 2]

    # -- sample-level entry ----------------------------------------------------

    def __call__(self, img, anns):
        """img: HWC uint8; anns: per-image dict (data/coco.py format).

        Instances without a polygon segmentation ride through
        unchanged (the reference package requires segm annotations
        too)."""
        if self.rng.rand() >= self.aug_ratio:
            return img, anns
        segs_all = anns.get("segmentations")
        if not segs_all or all(not s for s in segs_all):
            return img, anns

        boxes = np.array(anns["bboxes"], np.float32, copy=True)
        pobbs = anns.get("pointobbs")
        pobbs = (np.array(pobbs, np.float32, copy=True)
                 if pobbs is not None and len(pobbs) else None)
        segs_out = [list(s) if s else s for s in segs_all]
        h, w = img.shape[:2]
        for i, segs in enumerate(segs_all):
            if not segs:
                continue
            img, m = self._augment_one(img, segs, self.rng)
            if m is None:
                continue
            # map the polygon(s), bbox and pointobb through the affine
            new_polys = []
            for poly in segs:
                pts = np.asarray(poly, np.float32).reshape(-1, 2)
                pts = self._map_pts(pts, m)
                pts[:, 0] = np.clip(pts[:, 0], 0, w - 1)
                pts[:, 1] = np.clip(pts[:, 1], 0, h - 1)
                new_polys.append(pts.reshape(-1).tolist())
            segs_out[i] = new_polys
            b = boxes[i]
            corners = np.asarray([[b[0], b[1]], [b[2], b[1]],
                                  [b[2], b[3]], [b[0], b[3]]], np.float32)
            wc = self._map_pts(corners, m)
            boxes[i] = [max(wc[:, 0].min(), 0), max(wc[:, 1].min(), 0),
                        min(wc[:, 0].max(), w - 1),
                        min(wc[:, 1].max(), h - 1)]
            if pobbs is not None:
                pobbs[i] = self._map_pts(
                    pobbs[i].reshape(4, 2), m).reshape(8)

        anns = dict(anns, bboxes=boxes, segmentations=segs_out)
        if pobbs is not None:
            anns["pointobbs"] = pobbs
        return img, anns
