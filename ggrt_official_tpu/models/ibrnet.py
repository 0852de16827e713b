"""IBRNet: per-ray-sample view-aggregation MLP (flax.linen).

Parity target: /root/reference/ggrt/model/ibrnet.py:17-136 and
/root/reference/ggrt/model/mlp_network.py — anti-alias-pooled view
weighting, mean/variance fusion, visibility refinement, ray attention over
samples (post-LN transformer block), softmax color blending -> (rgb, sigma).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def fused_mean_variance(x, weight):
    """Weighted mean/var over the views axis (dim 2)."""
    mean = jnp.sum(x * weight, axis=2, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=2, keepdims=True)
    return mean, var


def _ray_posenc(n_samples: int, d_hid: int = 16) -> np.ndarray:
    position = np.arange(n_samples)[:, None]
    hid = np.arange(d_hid)[None, :]
    table = position / np.power(10000, 2 * (hid // 2) / d_hid)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)[None]  # (1, n_samples, d_hid)


class MultiHeadAttention(nn.Module):
    """Post-LN residual attention (ref mlp_network.py:69-120)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        residual = q
        b, lq, _ = q.shape
        qh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_qs")(q)
        kh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_ks")(k)
        vh = nn.Dense(self.n_head * self.d_v, use_bias=False, name="w_vs")(v)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, -1, self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k**0.5), kh)
        if mask is not None:
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, use_bias=False, name="fc")(out)
        out = nn.LayerNorm(epsilon=1e-6)(out + residual)
        return out, attn


def _elu_mlp(widths, name):
    def apply(module_self, x):
        for i, w in enumerate(widths):
            x = nn.Dense(w, name=f"{name}_{i}")(x)
            if i < len(widths) - 1 or True:
                pass
        return x

    return apply


class IBRNet(nn.Module):
    in_feat_ch: int = 32
    n_samples: int = 64
    anti_alias_pooling: bool = True

    @nn.compact
    def __call__(self, rgb_feat, ray_diff, mask):
        """rgb_feat (r, s, v, 3+f); ray_diff (r, s, v, 4); mask (r, s, v, 1)
        -> (r, s, 4) rgb+sigma."""
        elu = nn.elu
        num_views = rgb_feat.shape[2]

        d = nn.Dense(16, name="ray_dir_fc0")(ray_diff)
        d = nn.Dense(self.in_feat_ch + 3, name="ray_dir_fc1")(elu(d))
        direction_feat = elu(d)

        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + direction_feat
        if self.anti_alias_pooling:
            s = self.param("s", nn.initializers.constant(0.2), ())
            dot_prod = ray_diff[..., 3:]
            exp_dot = jnp.exp(jnp.abs(s) * (dot_prod - 1.0))
            weight = (exp_dot - jnp.min(exp_dot, axis=2, keepdims=True)) * mask
            weight = weight / (jnp.sum(weight, axis=2, keepdims=True) + 1e-8)
        else:
            weight = mask / (jnp.sum(mask, axis=2, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(rgb_feat, weight)
        global_feat = jnp.concatenate([mean, var], axis=-1)
        x = jnp.concatenate(
            [jnp.broadcast_to(global_feat, (*rgb_feat.shape[:3], global_feat.shape[-1])), rgb_feat],
            axis=-1,
        )
        x = nn.Dense(64, name="base_fc0")(x)
        x = nn.Dense(32, name="base_fc1")(elu(x))
        x = elu(x)

        x_vis = nn.Dense(32, name="vis_fc0")(x * weight)
        x_vis = nn.Dense(33, name="vis_fc1")(elu(x_vis))
        x_vis = elu(x_vis)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = nn.sigmoid(vis) * mask
        x = x + x_res
        v2 = nn.Dense(32, name="vis_fc2_0")(x * vis)
        v2 = nn.Dense(1, name="vis_fc2_1")(elu(v2))
        vis = nn.sigmoid(v2) * mask
        weight = vis / (jnp.sum(vis, axis=2, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(x, weight)
        global_feat = jnp.concatenate(
            [mean[:, :, 0], var[:, :, 0], jnp.mean(weight, axis=2)], axis=-1
        )  # (r, s, 65)
        g = nn.Dense(64, name="geometry_fc0")(global_feat)
        g = nn.Dense(16, name="geometry_fc1")(elu(g))
        g = elu(g)

        num_valid_obs = jnp.sum(mask, axis=2)  # (r, s, 1)
        s_actual = g.shape[1]
        g = g + jnp.asarray(_ray_posenc(max(self.n_samples, s_actual)))[:, :s_actual]
        g, _ = MultiHeadAttention(4, 16, 4, 4, name="ray_attention")(
            g, g, g, mask=(num_valid_obs > 1).astype(g.dtype)
        )
        sig = nn.Dense(16, name="out_geometry_fc0")(g)
        sig = nn.Dense(1, name="out_geometry_fc1")(elu(sig))
        sigma = nn.relu(sig)
        sigma_out = jnp.where(num_valid_obs < 1, 0.0, sigma)

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = nn.Dense(16, name="rgb_fc0")(x)
        x = nn.Dense(8, name="rgb_fc1")(elu(x))
        x = nn.Dense(1, name="rgb_fc2")(elu(x))
        x = jnp.where(mask == 0, -1e9, x)
        blending = nn.softmax(x, axis=2)
        rgb_out = jnp.sum(rgb_in * blending, axis=2)
        return jnp.concatenate([rgb_out, sigma_out], axis=-1)
