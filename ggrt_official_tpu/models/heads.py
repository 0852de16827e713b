"""IPO-Net heads and ConvGRU update blocks (flax.linen, NHWC).

Parity target: /root/reference/ggrt/optimizer.py (DepthHead, PoseHead,
ConvGRU, SepConvGRU, ProjectionInput{Depth,Pose}, UpMaskNet,
BasicUpdateBlock{Depth,Pose}).

The reference's python `for i in range(seq_len)` inner loops become
`jax.lax.scan` in iponet.py; these modules are the per-step cells.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class DepthHead(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, act=nn.tanh):
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="conv1")(x))
        y = nn.Conv(1, (3, 3), name="conv2")(y)
        return act(y)


class PoseHead(nn.Module):
    """6-DoF head; translation scaled by 0.01 (ref optimizer.py:19-30).

    NOTE the reference concatenates [out[:, :3], 0.01*out[:, 3:]] — the
    *first* three channels raw and last three scaled — while Pose.from_vec
    reads (tvec, euler). So translation = raw, rotation = 0.01-scaled?
    No: from_vec takes vec[:3]=tvec, vec[3:]=rot; PoseHead returns
    [raw3, 0.01*last3], so rotations get the 0.01 damping. We keep the
    identical convention for checkpoint/behavior parity.
    """

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="conv1")(x))
        y = nn.Conv(6, (3, 3), name="conv2")(y)
        out = jnp.mean(y, axis=(1, 2))  # (b, 6)
        return jnp.concatenate([out[:, :3], 0.01 * out[:, 3:]], axis=1)


class UpMaskNet(nn.Module):
    hidden_dim: int = 128
    ratio: int = 8

    @nn.compact
    def __call__(self, feat):
        m = nn.relu(nn.Conv(self.hidden_dim * 2, (3, 3), name="conv1")(feat))
        m = nn.Conv(self.ratio * self.ratio * 9, (1, 1), name="conv2")(m)
        return 0.25 * m  # scale mask to balance gradients


class SepConvGRU(nn.Module):
    """Separable 1x5 / 5x1 ConvGRU (ref optimizer.py:51-78)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        def half(h, x, ksize, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, name=f"convz{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, name=f"convr{suffix}")(hx))
            q = nn.tanh(
                nn.Conv(self.hidden_dim, ksize, name=f"convq{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            return (1 - z) * h + z * q

        h = half(h, x, (1, 5), "1")
        h = half(h, x, (5, 1), "2")
        return h


class ProjectionInputDepth(nn.Module):
    hidden_dim: int
    out_chs: int

    @nn.compact
    def __call__(self, depth, cost):
        cor = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="convc1")(cost))
        cor = nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="convc2")(cor))
        dfm = nn.relu(nn.Conv(self.hidden_dim, (7, 7), name="convd1")(depth))
        dfm = nn.relu(nn.Conv(64, (3, 3), name="convd2")(dfm))
        cor_dfm = jnp.concatenate([cor, dfm], axis=-1)
        out_d = nn.relu(nn.Conv(self.out_chs - 1, (3, 3), name="convd")(cor_dfm))
        return jnp.concatenate([out_d, depth], axis=-1)


class ProjectionInputPose(nn.Module):
    hidden_dim: int
    out_chs: int

    @nn.compact
    def __call__(self, pose, cost):
        b, h, w, _ = cost.shape
        cor = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="convc1")(cost))
        cor = nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="convc2")(cor))
        pose_map = jnp.broadcast_to(pose[:, None, None, :], (b, h, w, 6))
        pfm = nn.relu(nn.Conv(self.hidden_dim, (7, 7), name="convp1")(pose_map))
        pfm = nn.relu(nn.Conv(64, (3, 3), name="convp2")(pfm))
        cor_pfm = jnp.concatenate([cor, pfm], axis=-1)
        out_p = nn.relu(nn.Conv(self.out_chs - 6, (3, 3), name="convp")(cor_pfm))
        return jnp.concatenate([out_p, pose_map], axis=-1)


class BasicUpdateBlockDepth(nn.Module):
    """One GRU *step* of the depth update (the seq_len loop lives in iponet).

    ref optimizer.py:145-174.
    """

    hidden_dim: int = 128
    ratio: int = 8
    context_dim: int = 32

    @nn.compact
    def __call__(self, net, inv_depth, cost, context):
        input_features = ProjectionInputDepth(
            self.hidden_dim, out_chs=self.hidden_dim, name="encoder"
        )(inv_depth, cost)
        inp = jnp.concatenate([context, input_features], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="depth_gru")(net, inp)
        # Reference DepthHead default act_fn is tanh (optimizer.py:14,166):
        # the per-step inverse-depth delta is tanh-squashed.
        delta = DepthHead(self.hidden_dim, name="depth_head")(net, act=nn.tanh)
        mask = nn.relu(nn.Conv(self.hidden_dim * 2, (3, 3), name="mask1")(net))
        mask = 0.25 * nn.Conv(self.ratio * self.ratio * 9, (1, 1), name="mask2")(mask)
        return net, inv_depth + delta, mask


class BasicUpdateBlockPose(nn.Module):
    """One GRU step of the pose update (ref optimizer.py:177-199)."""

    hidden_dim: int = 128
    context_dim: int = 32

    @nn.compact
    def __call__(self, net, pose, cost, context):
        input_features = ProjectionInputPose(
            self.hidden_dim, out_chs=self.hidden_dim, name="encoder"
        )(pose, cost)
        inp = jnp.concatenate([context, input_features], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="pose_gru")(net, inp)
        delta = PoseHead(self.hidden_dim, name="pose_head")(net)
        return net, pose + delta
