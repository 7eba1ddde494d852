"""ResNet backbone, TPU-native flax implementation.

Behavioral parity with the reference's ResNet
(mmdet/models/backbones/resnet.py:306-494): pytorch-style bottlenecks
(stride on the 3x3), stem 7x7/2 + maxpool/2, per-stage strides/
dilations, multi-level outputs (C2..C5), frozen batch-norm.

TPU-first choices: NHWC layout, optional bf16 compute with fp32
norm/params, BN realised as FrozenBN (affine transform with running
statistics as non-trainable variables — detection fine-tuning never
updates BN stats in the reference either, norm_eval=True default).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES


class FrozenBN(nn.Module):
    """Affine normalization with frozen running statistics.

    Equivalent to the reference's BN under norm_eval=True +
    requires_grad handling (resnet.py frozen_stages / norm_eval):
    statistics live in the 'batch_stats' collection and are never
    updated by the train step; scale/bias are ordinary params.
    """
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        # fold stats+affine into one scale/bias IN F32 (tiny vectors),
        # then apply in the compute dtype: avoids materialising f32
        # copies of bf16 activation tensors between convs
        inv = jax.lax.rsqrt(var + self.epsilon)
        eff_scale = (scale * inv).astype(self.dtype)
        eff_bias = (bias - mean * inv * scale).astype(self.dtype)
        return x.astype(self.dtype) * eff_scale + eff_bias


def make_norm(norm_cfg, dtype, name):
    """Norm factory: FrozenBN by default; GroupNorm when
    norm_cfg=dict(type='GN', num_groups=N) (reference configs/gn,
    norm_cfg plumbing in resnet.py build_norm_layer)."""
    if norm_cfg and norm_cfg.get("type") == "GN":
        return nn.GroupNorm(num_groups=norm_cfg.get("num_groups", 32),
                            epsilon=1e-5, dtype=dtype, name=name)
    return FrozenBN(dtype=dtype, name=name)


def conv(features, kernel, stride=1, dilation=1, name=None,
         dtype=jnp.float32, conv_cfg=None):
    pad = dilation * (kernel - 1) // 2
    if conv_cfg and conv_cfg.get("type") == "ConvWS":
        # weight-standardised conv (reference conv_ws.py, configs/gn+ws)
        from ..plugins import ConvWS
        return ConvWS(features, kernel, stride, padding=pad,
                      dilation=dilation, use_bias=False,
                      dtype=dtype, name=name)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation), use_bias=False,
                   dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1
    norm_cfg: dict | None = None
    conv_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.planes, 3, self.stride, self.dilation,
                   "conv1", self.dtype, self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, self.dilation, "conv2",
                   self.dtype, self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn2")(out)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride, 1,
                            "ds_conv", self.dtype, self.conv_cfg)(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 "ds_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4
    # deformable 3x3 (configs/dcn family): dict like
    # dict(modulated=False) — None keeps the plain conv
    dcn: dict | None = None
    # 'pytorch': spatial stride on the 3x3; 'caffe': stride on the
    # first 1x1 (reference resnet.py Bottleneck conv1_stride/
    # conv2_stride switch, the r50_caffe config family)
    style: str = "pytorch"
    # GCNet global-context block after bn3, before the residual add
    # (reference resnet.py:182-222, configs/gcnet): ContextBlock kwargs
    gcb: dict | None = None
    norm_cfg: dict | None = None
    conv_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        s1, s2 = ((self.stride, 1) if self.style == "caffe"
                  else (1, self.stride))
        out = conv(self.planes, 1, s1, 1, "conv1", self.dtype,
                   self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, self.dtype, "bn1")(out)
        out = nn.relu(out)
        if self.dcn is not None:
            from ...ops.deform_conv import DeformConv2d
            out = DeformConv2d(
                features=self.planes, kernel_size=3,
                stride=s2, padding=self.dilation,
                dilation=self.dilation, dtype=self.dtype,
                name="conv2", **dict(self.dcn))(out)
        else:
            out = conv(self.planes, 3, s2, self.dilation,
                       "conv2", self.dtype, self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, 1, "conv3", self.dtype,
                   self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn3")(out)
        if self.gcb is not None:
            from ..plugins import ContextBlock
            out = ContextBlock(dtype=self.dtype, name="context_block",
                               **dict(self.gcb))(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1,
                            "ds_conv", self.dtype, self.conv_cfg)(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 "ds_bn")(identity)
        return nn.relu(out + identity)


class _ConvP(nn.Module):
    """Declares exactly the params an nn.Conv(use_bias=False) would —
    lets a path that relays the kernel out manually (the phase-
    decomposed s2d stem conv) own the same checkpoint tree as the
    plain nn.Conv variant."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register
class ResNet(nn.Module):
    """Multi-stage ResNet returning the feature maps named by
    ``out_indices`` (0→C2/stride4 ... 3→C5/stride32)."""
    depth: int = 50
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_channels: int = 64
    # empirical-attention plugin per stage (resnet.py gen_attention /
    # configs/empirical_attention): dict of GeneralizedAttention kwargs
    gen_attention: dict | None = None
    gen_attention_stages: Sequence[bool] = (False, False, False, False)
    # deformable conv per stage (reference resnet.py dcn/stage_with_dcn,
    # configs/dcn family): dcn=dict(modulated=True) selects DCNv2
    dcn: dict | None = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    # GCNet context blocks (configs/gcnet): gcb=dict(ratio=1/4.)
    gcb: dict | None = None
    stage_with_gcb: Sequence[bool] = (False, False, False, False)
    # norm_cfg=dict(type='GN', num_groups=32) swaps FrozenBN for
    # GroupNorm everywhere (configs/gn); conv_cfg=dict(type='ConvWS')
    # swaps convs for weight-standardised convs (configs/gn+ws)
    norm_cfg: dict | None = None
    conv_cfg: dict | None = None
    dtype: jnp.dtype = jnp.float32
    # frozen_stages=k stops gradients to the stem and the first k
    # stages (reference ResNet._freeze_stages sets requires_grad=False
    # there); BN is frozen everywhere regardless (FrozenBN)
    frozen_stages: int = 1
    norm_eval: bool = True
    style: str = "pytorch"
    pretrained: str | None = None
    # space-to-depth stem: the 7x7/s2 conv over 3 input channels packs
    # <3% of the MXU's contraction lanes; re-expressing it as a 2x2
    # space-to-depth + 4x4/s1 conv over 12 channels is numerically
    # IDENTICAL (weights are a pure relayout, see stem_s2d_weights) and
    # ~3x faster on TPU — the classic MLPerf-ResNet trick
    stem_space_to_depth: bool = False
    # phase-decomposed s2d stem conv: the 4x4/s1 conv over the
    # 12-channel half-res map leaves the MXU contraction at C_in=12
    # (~12 of 128 lanes); a second space-to-depth + per-output-phase
    # kernel relayout turns it into ONE 3x3 conv at K=432 emitting all
    # 4 phases as output channels. Same math, same checkpoint tree
    # (the [4,4,4C,F] stem_conv kernel is relaid out in-graph).
    stem_s2d_phase: bool = False

    @nn.compact
    def __call__(self, x):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        if self.dcn is not None and block_cls is not Bottleneck:
            raise ValueError(
                "dcn is only supported for bottleneck depths (>=50); "
                f"depth={self.depth} uses BasicBlock (reference "
                "resnet.py asserts dcn is None there)")
        x = x.astype(self.dtype)
        if self.stem_space_to_depth:
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c)
            if (self.stem_s2d_phase and x.shape[1] % 2 == 0
                    and x.shape[2] % 2 == 0):
                k4 = _ConvP((4, 4, 4 * c, self.base_channels),
                            name="stem_conv")().astype(self.dtype)
                x = _stem_phase_conv(x, k4)
            else:
                # taps u,v span [-2, 1] around each output pixel →
                # asymmetric (2, 1) padding
                x = nn.Conv(self.base_channels, (4, 4), strides=(1, 1),
                            padding=[(2, 1), (2, 1)], use_bias=False,
                            dtype=self.dtype, name="stem_conv")(x)
        else:
            x = conv(self.base_channels, 7, 2, 1, "stem_conv",
                     self.dtype, self.conv_cfg)(x)
        x = make_norm(self.norm_cfg, self.dtype, "stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            # everything upstream of this activation (stem conv) gets
            # zero gradient — the in-graph equivalent of
            # requires_grad=False on the stem params
            x = jax.lax.stop_gradient(x)

        outs = []
        cur_c = self.base_channels
        for i in range(self.num_stages):
            planes = self.base_channels * 2 ** i
            out_c = planes * block_cls.expansion
            for b in range(stage_blocks[i]):
                stride = self.strides[i] if b == 0 else 1
                # projection shortcut only when geometry/channels change
                # (torch resnet convention)
                ds = b == 0 and (stride != 1 or cur_c != out_c)
                extra = {}
                if self.norm_cfg is not None:
                    extra["norm_cfg"] = self.norm_cfg
                if self.conv_cfg is not None:
                    extra["conv_cfg"] = self.conv_cfg
                if self.dcn is not None and self.stage_with_dcn[i]:
                    extra["dcn"] = self.dcn
                if block_cls is Bottleneck:
                    extra["style"] = self.style
                    if (self.gcb is not None
                            and self.stage_with_gcb[i]):
                        extra["gcb"] = self.gcb
                x = block_cls(
                    planes=planes, stride=stride,
                    dilation=self.dilations[i],
                    downsample=ds,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_block{b}", **extra)(x)
                cur_c = out_c
                if (self.gen_attention is not None
                        and self.gen_attention_stages[i]):
                    from ..plugins import GeneralizedAttention
                    x = GeneralizedAttention(
                        in_dim=out_c, dtype=self.dtype,
                        name=f"layer{i + 1}_block{b}_gen_attention",
                        **dict(self.gen_attention))(x)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


def _stem_phase_conv(x2, k4):
    """Phase-decomposed space-to-depth stem conv (same math as the
    4x4/s1 conv with padding (2,1) over the s2d(2) map, MXU-friendly).

    y[2p+φu, 2q+φv] = Σ_{du,dv∈[-2,1]} K[du+2,dv+2] · x2[2p+φu+du, …]
    is regrouped over a second space-to-depth of x2 (blocks of 2 rows/
    cols → channels): tap e3∈{0,1,2} at block row p-1+e3, row-phase a
    contributes the original tap eu = 2·e3 + a - φu when 0 ≤ eu ≤ 3.
    All 4 output phases are emitted as channels of ONE 3x3 conv with a
    K = 9·4C contraction, then interleaved back to full resolution.
    """
    b, hh, ww, c12 = x2.shape
    f = k4.shape[-1]
    x4 = x2.reshape(b, hh // 2, 2, ww // 2, 2, c12)
    x4 = x4.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, hh // 2, ww // 2, 4 * c12)
    e3 = jnp.arange(3)[:, None, None, None]
    a_ = jnp.arange(2)[None, :, None, None]
    ph = jnp.arange(2)[None, None, :, None]
    eu = jnp.arange(4)[None, None, None, :]
    m = (eu == 2 * e3 + a_ - ph).astype(k4.dtype)   # [e3, a, φ, eu]
    kk = jnp.einsum("iaxu,jbyv,uvcf->ijabcxyf", m, m, k4)
    kk = kk.reshape(3, 3, 4 * c12, 4 * f)
    y = jax.lax.conv_general_dilated(
        x4, kk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, hh // 2, ww // 2, 2, 2, f)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, f)


def stem_s2d_weights(w7):
    """Relayout a [7, 7, C, F] HWIO stem kernel into the [4, 4, 4C, F]
    kernel consumed by the space-to-depth stem.

    Derivation: out[i] = Σ_a w[a]·x[2i + a - 3]; writing the input index
    as 2(i + u) + p (p ∈ {0,1} the space-to-depth phase) gives
    a = 2u + p + 3 with u ∈ [-2, 1] — a 4-tap kernel over 12 channels
    whose (u, p) entries are a permutation of the original taps (the
    (u=-2, p=0) slot maps to a = -1 and stays zero).
    """
    import numpy as np
    w7 = np.asarray(w7)
    c, f = w7.shape[2], w7.shape[3]
    w4 = np.zeros((4, 4, 4 * c, f), w7.dtype)
    for u in range(-2, 2):
        for p in range(2):
            a = 2 * u + p + 3
            if not 0 <= a <= 6:
                continue
            for v in range(-2, 2):
                for q in range(2):
                    bcol = 2 * v + q + 3
                    if not 0 <= bcol <= 6:
                        continue
                    w4[u + 2, v + 2,
                       p * 2 * c + q * c:p * 2 * c + (q + 1) * c] = \
                        w7[a, bcol]
    return w4
