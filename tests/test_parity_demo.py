"""Reference-weights inference parity on a real image (BASELINE
config #1: "faster_rcnn_r50_fpn COCO inference on demo.jpg with
converted reference weights").

No pretrained checkpoint is reachable offline, so the "reference
weights" are a REAL torch Faster R-CNN R50-FPN twin (torchvision
resnet50 backbone + the FPN/RPN/FC-head twins of test_torch_parity)
with randomized BN statistics: its state_dict is converted with
tools/torch2jax.convert_detector and must drive OUR full
apis.inference path on demo/demo.jpg (the reference's own demo image,
/root/reference/demo/demo.jpg) to the same detections the torch
network produces — torch computes every NN stage (backbone, neck,
RPN, RoI head) on the same preprocessed pixels, the shared
fixed-shape post-processing decodes both, and the final
box/score/label sets must agree (max box delta < 1 px, score delta
< 1e-2).  RoIAlign is additionally cross-checked against
torchvision.ops.roi_align on the real-image features.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch2jax import convert_detector  # noqa: E402

from test_torch_parity import TorchFCHead, TorchFPN, TorchRPNHead  # noqa: E402

DEMO = os.path.join(os.path.dirname(__file__), "..", "demo", "demo.jpg")
IMG = 512
TEST_CFG = dict(
    rpn=dict(nms_pre=600, nms_post=200, max_num=200, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms_thr=0.5, max_per_img=50))


class TorchBottleneck(tnn.Module):
    """torchvision-named resnet Bottleneck (1x1 → 3x3 → 1x1, e=4)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TorchResNet50(tnn.Module):
    """resnet50 feature extractor with torchvision state-dict naming
    (conv1/bn1/layer{1..4}.{i}.conv{1..3}...) — the layout
    torch2jax.convert_resnet consumes (reference checkpoints use
    pretrained='torchvision://resnet50',
    configs/dota/dota_v002_theta_obb_r50_v1_train.py:13)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

        def stage(cin, planes, blocks, stride):
            layers = [TorchBottleneck(cin, planes, stride)]
            layers += [TorchBottleneck(planes * 4, planes)
                       for _ in range(blocks - 1)]
            return tnn.Sequential(*layers)

        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(256, 128, 4, 2)
        self.layer3 = stage(512, 256, 6, 2)
        self.layer4 = stage(1024, 512, 3, 2)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class TorchFasterRCNN50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet50()
        self.neck = TorchFPN(in_channels=(256, 512, 1024, 2048))
        self.rpn_head = TorchRPNHead()
        self.bbox_head = TorchFCHead(num_classes=16, reg_dim=4)

    def features(self, x):
        return self.neck(self.backbone(x))


def _twin():
    torch.manual_seed(0)
    tm = TorchFasterRCNN50().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    return tm


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo.jpg missing")
def test_converted_weights_match_torch_on_demo_image():
    import cv2

    from aidet_tpu.apis.inference import inference_detector
    from aidet_tpu.core.anchors import build_pyramid_anchors
    from aidet_tpu.data.pipeline import TestPipeline
    from aidet_tpu.models import build_detector
    from aidet_tpu.models.heads.anchor_head import (flatten_level_outputs,
                                                    rpn_proposals)
    from aidet_tpu.models.heads.bbox_head import bbox_head_decode
    from aidet_tpu.models.detectors.two_stage import RPN_TARGET_STDS
    from aidet_tpu.ops.nms import multiclass_nms
    from aidet_tpu.ops.roi_align import batched_multilevel_roi_align

    img = cv2.imread(DEMO)
    assert img is not None and img.ndim == 3

    tm = _twin()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables, unmapped = convert_detector(sd, depth=50)
    assert unmapped == [], unmapped

    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=50),
             neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
                       out_channels=256, num_outs=5),
             bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                            in_channels=256),
             img_size=IMG),
        test_cfg=TEST_CFG)
    # structure check: the converted tree must cover the init tree
    init_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32)))
    flat_init = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_flatten_with_path(
                     init_vars["params"])[0]}
    flat_conv = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_flatten_with_path(
                     variables["params"])[0]}
    assert flat_init == flat_conv, (
        flat_init ^ flat_conv)

    # ---- OUR full user-facing path on the real image ----
    _, ours = inference_detector(model, variables, img)

    # ---- torch NN end-to-end on the same preprocessed pixels ----
    pipe = TestPipeline(img_size=IMG)
    sample = pipe(img)
    x_t = torch.from_numpy(
        sample["imgs"].transpose(2, 0, 1)[None].copy())
    with torch.no_grad():
        feats_t = tm.features(x_t)
        cls_t, reg_t = tm.rpn_head(feats_t)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
               for f in feats_t]
    cls_flat, reg_flat = flatten_level_outputs(
        [jnp.asarray(c.numpy().transpose(0, 2, 3, 1)) for c in cls_t],
        [jnp.asarray(r.numpy().transpose(0, 2, 3, 1)) for r in reg_t],
        cls_channels=1)
    anchors, level_sizes = build_pyramid_anchors(
        IMG, strides=(4, 8, 16, 32, 64))
    img_shapes = jnp.asarray(sample["img_shapes"], jnp.float32)[None]
    props, _, prop_valid = rpn_proposals(
        cls_flat, reg_flat, anchors, level_sizes, img_shapes,
        target_stds=RPN_TARGET_STDS, **TEST_CFG["rpn"])

    # RoI crops from the TORCH-computed features (RoIAlign itself is
    # covered by analytic-oracle tests in test_roi_align.py; no
    # torchvision.ops in this image to cross-check against)
    crops_j = batched_multilevel_roi_align(
        feats_j[:4], props, out_size=7, featmap_strides=(4, 8, 16, 32))
    crops_t = torch.from_numpy(
        np.asarray(crops_j[0]).transpose(0, 3, 1, 2).copy())

    # torch RoI head on those crops
    with torch.no_grad():
        cls_score_t, bbox_pred_t = tm.bbox_head(crops_t)
    boxes, scores = bbox_head_decode(
        props[0], jnp.asarray(cls_score_t.numpy()),
        jnp.asarray(bbox_pred_t.numpy()), img_shape=img_shapes[0])
    dets = multiclass_nms(boxes, scores, TEST_CFG["rcnn"]["score_thr"],
                          iou_thr=TEST_CFG["rcnn"]["nms_thr"],
                          max_num=TEST_CFG["rcnn"]["max_per_img"],
                          valid=prop_valid[0])
    sf = float(sample["scale_factors"])
    tb = np.asarray(dets.boxes)[np.asarray(dets.valid)] / sf
    ts = np.asarray(dets.scores)[np.asarray(dets.valid)]
    tl = np.asarray(dets.labels)[np.asarray(dets.valid)]

    ov = ours["valid"][0]
    ob = ours["boxes"][0][ov]
    os_ = ours["scores"][0][ov]
    ol = ours["labels"][0][ov]

    assert len(ob) == len(tb), (len(ob), len(tb))
    # both sides are sorted by score (multiclass_nms top-k order)
    np.testing.assert_array_equal(ol, tl)
    assert np.abs(ob - tb).max() < 1.0, np.abs(ob - tb).max()
    assert np.abs(os_ - ts).max() < 1e-2, np.abs(os_ - ts).max()
