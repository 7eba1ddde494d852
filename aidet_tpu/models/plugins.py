"""Plug-in feature modules (parity: mmdet/ops/{context_block.py,
non_local.py, conv_ws.py, generalized_attention.py, scale.py}):
GCNet context block, non-local 2D, weight-standardised conv, scale."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """GCNet global-context block."""
    ratio: float = 1.0 / 16
    pooling_type: str = "att"        # 'att' | 'avg'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            att = nn.Conv(1, (1, 1), dtype=self.dtype,
                          name="conv_mask")(x)           # [B,H,W,1]
            att = jax.nn.softmax(att.reshape(b, h * w, 1), axis=1)
            ctx = jnp.einsum("bnc,bnk->bkc", x.reshape(b, h * w, c), att)
            ctx = ctx.reshape(b, 1, 1, c)
        else:
            ctx = x.mean(axis=(1, 2), keepdims=True)
        t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                    name="channel_add_conv1")(ctx)
        t = nn.LayerNorm(dtype=self.dtype, name="ln")(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="channel_add_conv2",
                    kernel_init=nn.initializers.zeros)(t)
        return x + t


class NonLocal2D(nn.Module):
    """Non-local block (embedded gaussian)."""
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name="theta")(x).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype,
                      name="phi")(x).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype,
                    name="g")(x).reshape(b, h * w, inter)
        att = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", att, g).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_out",
                    kernel_init=nn.initializers.zeros)(y)
        return x + y


class ConvWS(nn.Module):
    """Weight-standardised conv (for GN configs)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (k, k, x.shape[-1], self.features))
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        std = kernel.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        kernel = (kernel - mean) / std
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


class Scale(nn.Module):
    """Learnable scalar multiplier (mmdet/ops/scale.py)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       nn.initializers.constant(self.init_value), ())
        return x * s


class GeneralizedAttention(nn.Module):
    """Generalized (empirical) attention plugin.

    Parity: mmdet/ops/generalized_attention.py: multi-head attention
    over an (optionally strided) key/value grid whose energy is a sum
    of up to four terms gated by ``attention_type`` — '1000' query·key
    content, '0100' query·relative-position, '0010' key-content bias,
    '0001' relative-position bias — with sinusoidal separable (x, y)
    position embeddings, an optional local ``spatial_range`` mask, and
    a zero-init gamma residual.

    TPU notes: NHWC; the energy factorises into one [hw, kv] content
    matmul plus two rank-1-in-space position matmuls, all MXU-friendly;
    the local mask is computed with integer broadcasting instead of a
    precomputed parameter buffer.
    """
    in_dim: int = 256
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: float = 1.0
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = "1111"
    dtype: jnp.dtype = jnp.float32

    def _pos_embedding(self, n_q, n_kv, q_stride, kv_stride, feat_dim):
        q_idx = jnp.arange(n_q, dtype=jnp.float32) * q_stride
        kv_idx = jnp.arange(n_kv, dtype=jnp.float32) * kv_stride
        diff = (q_idx[:, None] - kv_idx[None, :]) \
            * self.position_magnitude                     # [n_q, n_kv]
        feat_range = jnp.arange(feat_dim // 4, dtype=jnp.float32)
        dim_mat = 1000.0 ** ((4.0 / feat_dim) * feat_range)
        phase = diff[..., None] / dim_mat                  # [q, kv, d/4]
        return jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], -1)

    @nn.compact
    def __call__(self, x):
        at = [bool(int(c)) for c in self.attention_type]
        heads = self.num_heads
        qk_dim = self.in_dim // heads
        v_dim = self.in_dim // heads
        pe_dim = (self.position_embedding_dim
                  if self.position_embedding_dim > 0 else self.in_dim)
        x_q = x[:, ::self.q_stride, ::self.q_stride]
        x_kv = x[:, ::self.kv_stride, ::self.kv_stride]
        n, h, w, _ = x_q.shape
        h_kv, w_kv = x_kv.shape[1:3]
        scale = 1.0 / jnp.sqrt(jnp.float32(2.0))

        energy = jnp.zeros((n, heads, h, w, h_kv, w_kv), jnp.float32)
        q = None
        if at[0] or at[1]:
            q = nn.Conv(heads * qk_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name="query_conv")(x_q)
            q = q.reshape(n, h, w, heads, qk_dim)
        if at[0] or at[2]:
            k = nn.Conv(heads * qk_dim, (1, 1), use_bias=False,
                        dtype=self.dtype, name="key_conv")(x_kv)
            k = k.reshape(n, h_kv, w_kv, heads, qk_dim)
        if at[0] or at[2]:
            appr_bias = self.param(
                "appr_bias", nn.initializers.uniform(
                    scale=2.0 / (qk_dim * 2) ** 0.5), (heads * qk_dim,)) \
                .reshape(heads, qk_dim)
            if at[0] and at[2]:
                qq = q + appr_bias[None, None, None]
                energy += jnp.einsum("nhwad,nHWad->nahwHW", qq, k)
            elif at[0]:
                energy += jnp.einsum("nhwad,nHWad->nahwHW", q, k)
            else:
                energy += jnp.einsum("ad,nHWad->naHW", appr_bias,
                                     k)[:, :, None, None]
        if at[1] or at[3]:
            emb_x = self._pos_embedding(w, w_kv, self.q_stride,
                                        self.kv_stride, pe_dim)
            emb_y = self._pos_embedding(h, h_kv, self.q_stride,
                                        self.kv_stride, pe_dim)
            px = nn.Dense(heads * qk_dim, use_bias=False,
                          dtype=self.dtype,
                          name="appr_geom_fc_x")(emb_x) * scale
            py = nn.Dense(heads * qk_dim, use_bias=False,
                          dtype=self.dtype,
                          name="appr_geom_fc_y")(emb_y) * scale
            px = px.reshape(w, w_kv, heads, qk_dim)
            py = py.reshape(h, h_kv, heads, qk_dim)
            geom_bias = self.param(
                "geom_bias", nn.initializers.uniform(
                    scale=2.0 / (qk_dim * 2) ** 0.5), (heads * qk_dim,)) \
                .reshape(heads, qk_dim)
            if at[1]:
                qg = q + (geom_bias[None, None, None] if at[3] else 0.0)
                # x-term varies over (w, w_kv); y-term over (h, h_kv)
                energy += jnp.einsum(
                    "nhwad,wWad->nahwW", qg, px)[..., None, :]
                energy += jnp.einsum(
                    "nhwad,hHad->nahwH", qg, py)[..., None]
            else:  # '0001': position bias only
                ex = jnp.einsum("wWad,ad->awW", px, geom_bias)
                ey = jnp.einsum("hHad,ad->ahH", py, geom_bias)
                energy += ex[None, :, None, :, None, :]
                energy += ey[None, :, :, None, :, None]

        if self.spatial_range >= 0:
            qy = jnp.arange(h)[:, None] * self.q_stride
            qx = jnp.arange(w)[:, None] * self.q_stride
            kvy = jnp.arange(h_kv)[None, :]
            kvx = jnp.arange(w_kv)[None, :]
            ok_y = (kvy >= jnp.maximum(
                (qy - self.spatial_range) // self.kv_stride, 0)) \
                & (kvy < (qy + self.spatial_range + 1)
                   // self.kv_stride + 1)
            ok_x = (kvx >= jnp.maximum(
                (qx - self.spatial_range) // self.kv_stride, 0)) \
                & (kvx < (qx + self.spatial_range + 1)
                   // self.kv_stride + 1)
            ok = ok_y[:, None, :, None] & ok_x[None, :, None, :]
            energy = jnp.where(ok[None, None], energy, -jnp.inf)

        attn = jax.nn.softmax(
            energy.reshape(n, heads, h, w, h_kv * w_kv), -1)
        v = nn.Conv(heads * v_dim, (1, 1), use_bias=False,
                    dtype=self.dtype, name="value_conv")(x_kv)
        v = v.reshape(n, h_kv * w_kv, heads, v_dim)
        out = jnp.einsum("nahwK,nKad->nhwad", attn, v)
        out = out.reshape(n, h, w, heads * v_dim)
        out = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype,
                      name="proj_conv")(out)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x
