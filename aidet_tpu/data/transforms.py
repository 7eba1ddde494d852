"""Additional host-side augmentations.

TPU-native ports of the reference's pipeline transforms
(mmdet/datasets/pipelines/transforms.py): PhotoMetricDistortion:544,
Expand:638, MinIoURandomCrop:733, RandomCrop:435, RandomRotate:1113
(90° multiples with box/poly remap), SegRescale:521, Corrupt:842
(the common corruptions implemented natively — the imagecorruptions
package is not vendored).  All operate on numpy samples before device
transfer; each takes/returns (img, anns-like dict).
"""

from __future__ import annotations

import numpy as np


class PhotoMetricDistortion:
    """Random brightness/contrast/saturation/hue (transforms.py:544)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18, seed=0):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.rng = np.random.RandomState(seed)

    def __call__(self, img):
        import cv2
        rng = self.rng
        img = img.astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta,
                               self.brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*self.saturation_range)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0]
                           + rng.uniform(-self.hue_delta,
                                         self.hue_delta)) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if mode == 0 and rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        if rng.randint(2):
            # final random channel swap (transforms.py:627-629)
            img = img[..., rng.permutation(3)]
        return np.clip(img, 0, 255).astype(np.uint8)


class Expand:
    """Paste the image onto a larger mean-filled canvas
    (transforms.py:638)."""

    def __init__(self, mean=(123.675, 116.28, 103.53), ratio_range=(1, 4),
                 prob=0.5, seed=0):
        self.mean = np.asarray(mean[::-1])  # pipelines run in BGR
        self.ratio_range = ratio_range
        self.prob = prob
        self.rng = np.random.RandomState(seed)

    def __call__(self, img, boxes, pointobbs=None):
        if self.rng.rand() > self.prob:
            return img, boxes, pointobbs
        h, w = img.shape[:2]
        ratio = self.rng.uniform(*self.ratio_range)
        ox = int(self.rng.uniform(0, w * ratio - w))
        oy = int(self.rng.uniform(0, h * ratio - h))
        canvas = np.full((int(h * ratio), int(w * ratio), img.shape[2]),
                         self.mean, img.dtype)
        canvas[oy:oy + h, ox:ox + w] = img
        boxes = boxes + [ox, oy, ox, oy]
        if pointobbs is not None and len(pointobbs):
            pointobbs = pointobbs + np.tile([ox, oy], 4)
        return canvas, boxes, pointobbs


class MinIoURandomCrop:
    """Random crop keeping min IoU with gt (transforms.py:733)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size=0.3, max_tries=50, seed=0):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.max_tries = max_tries
        self.rng = np.random.RandomState(seed)

    def __call__(self, img, boxes, labels):
        h, w = img.shape[:2]
        while True:
            mode = self.sample_mode[
                self.rng.randint(len(self.sample_mode))]
            if mode == 1:
                return img, boxes, labels
            for _ in range(self.max_tries):
                nw = self.rng.uniform(self.min_crop_size * w, w)
                nh = self.rng.uniform(self.min_crop_size * h, h)
                if nh / nw < 0.5 or nh / nw > 2:
                    continue
                left = self.rng.uniform(0, w - nw)
                top = self.rng.uniform(0, h - nh)
                patch = np.array([left, top, left + nw, top + nh])
                if len(boxes):
                    ious = _iou(boxes, patch[None]).reshape(-1)
                    if ious.min() < mode:
                        continue
                    ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
                    m = ((ctr[:, 0] > patch[0]) & (ctr[:, 1] > patch[1])
                         & (ctr[:, 0] < patch[2]) & (ctr[:, 1] < patch[3]))
                    if not m.any():
                        continue
                    boxes_c = boxes[m].copy()
                    boxes_c[:, :2] = np.maximum(boxes_c[:, :2],
                                                patch[:2]) - patch[:2]
                    boxes_c[:, 2:] = np.minimum(boxes_c[:, 2:],
                                                patch[2:]) - patch[:2]
                    labels_c = labels[m]
                else:
                    boxes_c, labels_c = boxes, labels
                img_c = img[int(patch[1]):int(patch[3]),
                            int(patch[0]):int(patch[2])]
                return img_c, boxes_c, labels_c


def _iou(b1, b2):
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    xx1 = np.maximum(b1[:, None, 0], b2[None, :, 0])
    yy1 = np.maximum(b1[:, None, 1], b2[None, :, 1])
    xx2 = np.minimum(b1[:, None, 2], b2[None, :, 2])
    yy2 = np.minimum(b1[:, None, 3], b2[None, :, 3])
    inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
    return inter / np.maximum(area1[:, None] + area2[None] - inter, 1e-9)


def random_rotate90(img, pointobbs=None, boxes=None, k=None, rng=None):
    """Rotate by a multiple of 90° (RandomRotate, transforms.py:1113):
    image + polygons + re-axis-aligned boxes."""
    rng = rng or np.random
    if k is None:
        k = rng.randint(4)
    if k == 0:
        return img, pointobbs, boxes, 0
    h, w = img.shape[:2]
    out = np.ascontiguousarray(np.rot90(img, k))

    def rot_pts(x, y):
        if k == 1:    # 90° ccw (np.rot90 convention)
            return y, w - 1 - x
        if k == 2:
            return w - 1 - x, h - 1 - y
        return h - 1 - y, x  # k == 3

    new_p = None
    if pointobbs is not None and len(pointobbs):
        xs = pointobbs[:, 0::2]
        ys = pointobbs[:, 1::2]
        nx, ny = rot_pts(xs, ys)
        new_p = np.empty_like(pointobbs)
        new_p[:, 0::2] = nx
        new_p[:, 1::2] = ny
    new_b = None
    if boxes is not None and len(boxes):
        x1, y1 = boxes[:, 0], boxes[:, 1]
        x2, y2 = boxes[:, 2], boxes[:, 3]
        ax, ay = rot_pts(x1, y1)
        bx, by = rot_pts(x2, y2)
        new_b = np.stack([np.minimum(ax, bx), np.minimum(ay, by),
                          np.maximum(ax, bx), np.maximum(ay, by)], -1)
    return out, new_p, new_b, k


def seg_rescale(seg, scale_factor):
    """Rescale a segmentation map (SegRescale, transforms.py:521)."""
    import cv2
    if scale_factor == 1:
        return seg
    h, w = seg.shape[:2]
    return cv2.resize(seg, (int(w * scale_factor), int(h * scale_factor)),
                      interpolation=cv2.INTER_NEAREST)


# ---------------------------------------------------------------------------
# native corruption benchmark (Corrupt / tools/test_robustness.py)
# ---------------------------------------------------------------------------

def corrupt(img, corruption: str, severity: int = 1, seed: int = 0):
    """A native subset of the robustness-benchmark corruptions.

    Supported: gaussian_noise, shot_noise, impulse_noise, defocus_blur,
    motion_blur, brightness, contrast, pixelate, jpeg_compression, fog.
    """
    import cv2
    rng = np.random.RandomState(seed)
    x = img.astype(np.float32) / 255.0
    s = severity
    if corruption == "gaussian_noise":
        c = [0.04, 0.06, 0.08, 0.09, 0.10][s - 1]
        x = x + rng.normal(size=x.shape) * c
    elif corruption == "shot_noise":
        c = [500, 250, 100, 75, 50][s - 1]
        x = rng.poisson(np.clip(x, 0, 1) * c) / c
    elif corruption == "impulse_noise":
        c = [0.01, 0.02, 0.03, 0.05, 0.07][s - 1]
        m = rng.rand(*x.shape[:2])
        x[m < c / 2] = 0.0
        x[m > 1 - c / 2] = 1.0
    elif corruption == "defocus_blur":
        c = [3, 4, 6, 8, 10][s - 1]
        x = cv2.GaussianBlur(x, (0, 0), c / 3.0)
    elif corruption == "motion_blur":
        c = [10, 15, 15, 15, 20][s - 1]
        k = np.zeros((c, c), np.float32)
        k[c // 2] = 1.0 / c
        x = cv2.filter2D(x, -1, k)
    elif corruption == "brightness":
        c = [0.1, 0.2, 0.3, 0.4, 0.5][s - 1]
        x = x + c
    elif corruption == "contrast":
        c = [0.4, 0.3, 0.2, 0.1, 0.05][s - 1]
        x = (x - x.mean()) * c + x.mean()
    elif corruption == "pixelate":
        c = [0.6, 0.5, 0.4, 0.3, 0.25][s - 1]
        h, w = x.shape[:2]
        small = cv2.resize(x, (int(w * c), int(h * c)),
                           interpolation=cv2.INTER_AREA)
        x = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    elif corruption == "jpeg_compression":
        c = [25, 18, 15, 10, 7][s - 1]
        ok, enc = cv2.imencode(
            ".jpg", (np.clip(x, 0, 1) * 255).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, c])
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255
    elif corruption == "fog":
        c = [1.5, 2.0, 2.5, 3.0, 3.5][s - 1]
        h, w = x.shape[:2]
        fog = rng.rand(h // 8 + 1, w // 8 + 1).astype(np.float32)
        fog = cv2.resize(fog, (w, h), interpolation=cv2.INTER_LINEAR)
        x = x * (1 - 0.3 * c / 3.5) + fog[..., None] * 0.3 * c / 3.5
    elif corruption == "glass_blur":
        # gaussian blur + iterated local pixel displacement (the
        # imagecorruptions glass_blur recipe, vectorised via remap
        # instead of the per-pixel python swap loop)
        sigma, max_delta, iters = [(0.7, 1, 2), (0.9, 2, 1), (1.0, 2, 3),
                                   (1.1, 3, 2), (1.5, 4, 2)][s - 1]
        x = cv2.GaussianBlur(x, (0, 0), sigma)
        h, w = x.shape[:2]
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        for _ in range(iters):
            dx = rng.randint(-max_delta, max_delta + 1,
                             (h, w)).astype(np.float32)
            dy = rng.randint(-max_delta, max_delta + 1,
                             (h, w)).astype(np.float32)
            x = cv2.remap(x, np.clip(gx + dx, 0, w - 1),
                          np.clip(gy + dy, 0, h - 1), cv2.INTER_NEAREST)
        x = cv2.GaussianBlur(x, (0, 0), sigma)
    elif corruption == "zoom_blur":
        # mean of progressively centre-zoomed copies
        zmax, step = [(1.11, 0.01), (1.16, 0.01), (1.21, 0.02),
                      (1.26, 0.02), (1.31, 0.03)][s - 1]
        h, w = x.shape[:2]
        acc = np.zeros_like(x)
        zooms = np.arange(1.0, zmax, step)
        for z in zooms:
            zh, zw = int(np.ceil(h / z)), int(np.ceil(w / z))
            top, left = (h - zh) // 2, (w - zw) // 2
            crop = x[top:top + zh, left:left + zw]
            acc += cv2.resize(crop, (w, h),
                              interpolation=cv2.INTER_LINEAR)
        x = (x + acc) / (len(zooms) + 1)
    elif corruption == "snow":
        # gaussian snow layer, zoomed + thresholded + motion-streaked,
        # composited over a lightened image
        amt, zoom, thr, blur_sig, mono, streak = [
            (0.1, 3.0, 0.5, 4, 0.8, 10), (0.2, 2.0, 0.5, 4, 0.7, 12),
            (0.55, 4.0, 0.9, 8, 0.7, 12), (0.55, 4.5, 0.85, 8, 0.65, 14),
            (0.55, 2.5, 0.85, 12, 0.55, 16)][s - 1]
        h, w = x.shape[:2]
        layer = rng.normal(size=(h // 4, w // 4),
                           loc=amt, scale=0.3).astype(np.float32)
        layer = cv2.resize(layer, (w, h),
                           interpolation=cv2.INTER_LINEAR) * zoom / 2
        layer[layer < thr] = 0.0
        k = np.zeros((streak, streak), np.float32)
        np.fill_diagonal(k, 1.0 / streak)        # diagonal streaks
        layer = cv2.filter2D(cv2.GaussianBlur(layer, (0, 0), blur_sig / 4),
                             -1, k)
        gray = cv2.cvtColor((np.clip(x, 0, 1) * 255).astype(np.uint8),
                            cv2.COLOR_BGR2GRAY).astype(np.float32) / 255
        whitened = np.maximum(x, (gray * 1.5 + 0.5)[..., None] * mono)
        x = mono * x + (1 - mono) * whitened
        x = x + layer[..., None] + np.rot90(layer, 2)[..., None]
    elif corruption == "frost":
        # the reference blends licensed frost photographs; synthesise a
        # crystalline texture instead (multi-octave noise, thresholded)
        mix, tint = [(0.78, 0.22), (0.64, 0.36), (0.5, 0.5),
                     (0.46, 0.54), (0.4, 0.6)][s - 1]
        h, w = x.shape[:2]
        tex = np.zeros((h, w), np.float32)
        for octave in (8, 16, 32):
            n = rng.rand(h // octave + 1, w // octave + 1).astype(np.float32)
            tex += cv2.resize(n, (w, h),
                              interpolation=cv2.INTER_CUBIC) / 3
        tex = np.clip((tex - 0.45) * 3, 0, 1)
        frost = np.stack([tex * 0.95, tex * 0.98, tex], -1)  # icy blue
        x = mix * x + tint * frost
    elif corruption == "elastic_transform":
        # smoothed random displacement field (no affine pre-warp at the
        # detection benchmark's severities, following imagecorruptions)
        alpha, sigma = [(2.0, 0.7), (2.0, 0.08), (2.0, 0.2),
                        (4.0, 0.4), (6.0, 0.6)][s - 1]
        h, w = x.shape[:2]
        shape_size = min(h, w)
        a = alpha * shape_size / 224.0 * 20
        sig = max(sigma * shape_size / 224.0 * 20, 1.0)
        dx = cv2.GaussianBlur(
            rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
            sig) * a
        dy = cv2.GaussianBlur(
            rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
            sig) * a
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        x = cv2.remap(x, np.clip(gx + dx, 0, w - 1),
                      np.clip(gy + dy, 0, h - 1), cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT)
    elif corruption == "speckle_noise":
        c = [0.06, 0.1, 0.12, 0.16, 0.2][s - 1]
        x = x + x * rng.normal(size=x.shape).astype(np.float32) * c
    elif corruption == "gaussian_blur":
        c = [1, 2, 3, 4, 6][s - 1]
        x = cv2.GaussianBlur(x, (0, 0), c)
    elif corruption == "spatter":
        # liquid layer: thresholded smoothed noise rendered as water
        # highlights (lighter) or mud blobs (darker)
        loc, scale, thr, blur_sig, mud = [
            (0.65, 0.3, 0.69, 0.6, 0), (0.65, 0.3, 0.68, 0.6, 0),
            (0.65, 0.3, 0.68, 0.5, 0), (0.65, 0.3, 0.65, 1.5, 1),
            (0.67, 0.4, 0.65, 1.5, 1)][s - 1]
        h, w = x.shape[:2]
        liquid = rng.normal(size=(h, w), loc=loc,
                            scale=scale).astype(np.float32)
        liquid = cv2.GaussianBlur(liquid, (0, 0), blur_sig)
        mask = (liquid > thr).astype(np.float32)
        mask = cv2.GaussianBlur(mask, (0, 0), max(blur_sig, 0.7))
        if mud:
            color = np.asarray([20, 42, 63], np.float32) / 255  # BGR mud
            x = x * (1 - mask[..., None]) + color * mask[..., None]
        else:
            water = np.asarray([238, 238, 175], np.float32) / 255
            x = x + water * (0.6 * mask)[..., None]
    elif corruption == "saturate":
        c, shift = [(0.3, 0.0), (0.1, 0.0), (2.0, 0.0),
                    (5.0, 0.1), (20.0, 0.2)][s - 1]
        hsv = cv2.cvtColor((np.clip(x, 0, 1) * 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[..., 1] = np.clip(hsv[..., 1] * c + shift * 255, 0, 255)
        x = cv2.cvtColor(hsv.astype(np.uint8),
                         cv2.COLOR_HSV2BGR).astype(np.float32) / 255
    else:
        raise ValueError(f"unknown corruption: {corruption}")
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


# the reference's 15-corruption 'benchmark' set + 4 extras
# (tools/test_robustness.py:279-298)
CORRUPTIONS = ("gaussian_noise", "shot_noise", "impulse_noise",
               "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
               "snow", "frost", "fog", "brightness", "contrast",
               "elastic_transform", "pixelate", "jpeg_compression")
CORRUPTIONS_EXTRA = ("speckle_noise", "gaussian_blur", "spatter",
                     "saturate")
CORRUPTIONS_ALL = CORRUPTIONS + CORRUPTIONS_EXTRA
