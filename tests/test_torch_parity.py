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
