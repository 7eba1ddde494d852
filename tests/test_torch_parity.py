"""Numerical parity of the flax ResNet against torch (cpu).

Builds a torch ResNet-18 (torchvision-compatible naming), converts its
state dict with tools/torch2jax.convert_resnet, and compares outputs —
the gold check for conv padding, frozen-BN and maxpool semantics, and
the loader used for pretrained backbone weights.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch2jax import convert_resnet

from aidet_tpu.models.backbones.resnet import ResNet


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        self.relu = tnn.ReLU()

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = (64, 128, 256, 512)
        cin = 64
        for s, c in enumerate(chans):
            blocks = []
            for b in range(2):
                stride = (1 if s == 0 or b > 0 else 2)
                blocks.append(TorchBasicBlock(cin, c, stride))
                cin = c
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


def test_resnet18_matches_torch():
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    # randomize BN stats so the frozen-BN path is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet(sd, depth=18)

    jm = ResNet(depth=18)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = {"params": params, "batch_stats": stats}
    outs_j = jax.jit(jm.apply)(variables, jnp.asarray(x))

    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs_j) == 4
    for oj, ot in zip(outs_j, outs_t):
        ot = ot.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(oj), ot, atol=2e-3,
                                   rtol=1e-3)


def test_stem_space_to_depth_equivalence():
    """The s2d stem is a pure relayout of the 7x7/s2 stem: identical
    outputs on the same weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aidet_tpu.models.backbones.resnet import ResNet, stem_s2d_weights

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    m1 = ResNet(depth=18, stem_space_to_depth=False)
    m2 = ResNet(depth=18, stem_space_to_depth=True)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    # transplant every param; relayout the stem kernel
    import flax
    p1 = flax.traverse_util.flatten_dict(v1["params"])
    p2 = flax.traverse_util.flatten_dict(v2["params"])
    for k in p2:
        if k == ("stem_conv", "kernel"):
            p2[k] = jnp.asarray(stem_s2d_weights(p1[k]))
        else:
            p2[k] = p1[k]
    v2 = dict(v2, params=flax.traverse_util.unflatten_dict(p2))
    o1 = jax.jit(m1.apply)(v1, x)
    o2 = jax.jit(m2.apply)(v2, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # the phase-decomposed variant consumes the SAME checkpoint tree
    # ([4,4,4C,F] stem_conv kernel) and must be numerically identical
    m3 = ResNet(depth=18, stem_space_to_depth=True, stem_s2d_phase=True)
    o3 = jax.jit(m3.apply)(v2, x)
    for a, b in zip(o2, o3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Full-detector converter parity (tools/torch2jax.convert_detector):
# torch twins of the reference FPN (necks/fpn.py:86-177), RPN head
# (anchor_heads/rpn_head.py:19-35) and SharedFC heads
# (bbox_heads/convfc_bbox_head.py:52-95, rbbox_head.py:76-156) with the
# reference state_dict naming, vs the flax modules on converted weights.
# ---------------------------------------------------------------------------

class _ConvModule(tnn.Module):
    """Reference ConvModule (no norm): keys `.conv.weight/.conv.bias`."""

    def __init__(self, cin, cout, k, stride=1, pad=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, pad)

    def forward(self, x):
        return self.conv(x)


class TorchFPN(tnn.Module):
    def __init__(self, in_channels=(64, 128, 256, 512), out_channels=256):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [_ConvModule(c, out_channels, 1) for c in in_channels])
        self.fpn_convs = tnn.ModuleList(
            [_ConvModule(out_channels, out_channels, 3, pad=1)
             for _ in in_channels])

    def forward(self, inputs):
        lat = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + tnn.functional.interpolate(
                lat[i], scale_factor=2, mode="nearest")
        outs = [f(x) for f, x in zip(self.fpn_convs, lat)]
        outs.append(tnn.functional.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TorchRPNHead(tnn.Module):
    def __init__(self, in_channels=256, num_anchors=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(in_channels, num_anchors, 1)
        self.rpn_reg = tnn.Conv2d(in_channels, num_anchors * 4, 1)

    def forward(self, feats):
        cls_out, reg_out = [], []
        for f in feats:
            h = tnn.functional.relu(self.rpn_conv(f))
            cls_out.append(self.rpn_cls(h))
            reg_out.append(self.rpn_reg(h))
        return cls_out, reg_out


class TorchFCHead(tnn.Module):
    def __init__(self, in_dim=256 * 7 * 7, num_classes=16, reg_dim=4):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(in_dim, 1024), tnn.Linear(1024, 1024)])
        self.fc_cls = tnn.Linear(1024, num_classes)
        self.fc_reg = tnn.Linear(1024, num_classes * reg_dim)

    def forward(self, x):               # x: [n, C, 7, 7]
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = tnn.functional.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TorchTwoStage(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet18()
        self.neck = TorchFPN()
        self.rpn_head = TorchRPNHead()
        self.bbox_head = TorchFCHead(reg_dim=4)
        self.rbbox_head = TorchFCHead(reg_dim=5)


def test_full_detector_converter_matches_torch():
    from torch2jax import convert_detector
    from aidet_tpu.models.necks.fpn import FPN
    from aidet_tpu.models.heads.rpn_head import RPNHead
    from aidet_tpu.models.heads.bbox_head import RBBoxHead, SharedFCBBoxHead

    torch.manual_seed(1)
    tm = TorchTwoStage().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables, unmapped = convert_detector(sd, depth=18)
    assert unmapped == []
    p = variables["params"]

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    # backbone + neck
    bb = ResNet(depth=18)
    feats_j = jax.jit(bb.apply)(
        {"params": p["_backbone"],
         "batch_stats": variables["batch_stats"]["_backbone"]},
        jnp.asarray(x))
    fpn = FPN(in_channels=(64, 128, 256, 512))
    outs_j = jax.jit(fpn.apply)({"params": p["_neck"]}, feats_j)
    with torch.no_grad():
        feats_t = tm.backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        outs_t = tm.neck(feats_t)
    assert len(outs_j) == len(outs_t) == 5
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj), ot.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, rtol=1e-3)

    # rpn head
    rpn = RPNHead()
    cls_j, reg_j = jax.jit(rpn.apply)({"params": p["_rpn"]}, outs_j)
    with torch.no_grad():
        cls_t, reg_t = tm.rpn_head(outs_t)
    for a, b in zip(cls_j + reg_j, cls_t + reg_t):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, rtol=1e-3)

    # fc heads: NHWC roi crops vs the same crops in NCHW
    crops = rng.randn(8, 7, 7, 256).astype(np.float32)
    head = SharedFCBBoxHead(num_classes=16)
    cj, rj = jax.jit(head.apply)({"params": p["_bbox_head"]},
                                 jnp.asarray(crops))
    rhead = RBBoxHead(num_classes=16, encode="thetaobb")
    crj, rrj = jax.jit(rhead.apply)({"params": p["_rbbox_head"]},
                                    jnp.asarray(crops))
    with torch.no_grad():
        tc = torch.from_numpy(crops.transpose(0, 3, 1, 2))
        ct, rt = tm.bbox_head(tc)
        crt, rrt = tm.rbbox_head(tc)
    np.testing.assert_allclose(np.asarray(cj), ct.numpy(), atol=5e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rj), rt.numpy(), atol=5e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(crj), crt.numpy(), atol=5e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rrj), rrt.numpy(), atol=5e-3,
                               rtol=1e-3)
