"""IPO-Net: iterative pose + depth optimizer (flax.linen).

Parity target: /root/reference/ggrt/depth_pose_network.py (DepthPoseNet).

RAFT-style recurrence: a shared ResNet feature net over [target; refs],
init heads for inverse depth / per-view 6-DoF relative poses, then
`iters//seq_len` outer iterations each running `seq_len` ConvGRU steps,
driven by plane-sweep photometric feature-warp costs.

TPU-first re-design (SURVEY.md §7.3 #4): the reference's python lists over
views (`depth_pose_network.py:200-212`) become a *views-as-batch* layout —
every per-view head/GRU/warp call runs once with n_views on the batch axis,
so the MXU sees one big conv instead of n_views small ones. The seq_len
inner loops (4 steps) are unrolled statically; the detach between outer
iterations is jax.lax.stop_gradient, matching the reference's `.detach()`.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import IPONetCfg
from ..geometry import camera as cam
from ..geometry.depth import disp_to_depth, inv2depth
from ..geometry.se3 import pose_from_vec
from ..ops.grid_sample import grid_sample
from .backbone import ResNetEncoder
from .heads import (
    BasicUpdateBlockDepth,
    BasicUpdateBlockPose,
    DepthHead,
    PoseHead,
    UpMaskNet,
)


class IPONetOutput(NamedTuple):
    inv_depths: jnp.ndarray   # (n_preds, 1, 1, h, w) full-res inverse depths
    rel_poses: jnp.ndarray    # (1, n_views, n_preds, 6)
    fmap: jnp.ndarray         # (1, hf, wf, c) target feature map (NHWC)


def upsample_depth_convex(depth, mask, ratio, image_size):
    """Convex upsampling of a stride-`ratio` depth map (ref :50-66).

    depth: (b, hf, wf, 1); mask: (b, hf, wf, 9*ratio*ratio).
    Returns (b, H, W, 1) after bilinear resize to image_size.
    """
    b, hf, wf, _ = depth.shape
    mask = mask.reshape(b, hf, wf, 9, ratio * ratio)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of the depth map (unfold with padding 1).
    pad = jnp.pad(depth[..., 0], ((0, 0), (1, 1), (1, 1)))
    neighborhoods = jnp.stack(
        [pad[:, dy : dy + hf, dx : dx + wf] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (b, hf, wf, 9)
    up = jnp.einsum("bhwk,bhwkr->bhwr", neighborhoods, mask)
    up = up.reshape(b, hf, wf, ratio, ratio)
    up = up.transpose(0, 1, 3, 2, 4).reshape(b, hf * ratio, wf * ratio, 1)
    if (hf * ratio, wf * ratio) != tuple(image_size):
        # Reference upsample_depth uses align_corners=True
        # (depth_pose_network.py:64).
        from .backbone import _resize_bilinear_align_corners

        up = _resize_bilinear_align_corners(up, tuple(image_size))
    return up


def warp_cost(pose_vecs, fmap, fmaps_ref, depth, K, ref_Ks, scale_factor):
    """Photometric feature-warp cost, views-as-batch (ref get_cost_each :68-89).

    pose_vecs: (nv, 6) target->ref. fmap: (1, hf, wf, c). fmaps_ref:
    (nv, hf, wf, c). depth: (1, 1, hf, wf). K: (1, 3, 3); ref_Ks: (nv, 3, 3)
    pixel intrinsics at full image scale. Returns (nv, hf, wf, c).
    """
    nv = pose_vecs.shape[0]
    pose = pose_from_vec(pose_vecs)  # (nv, 4, 4)
    Ks = cam.scale_intrinsics(jnp.broadcast_to(K, (nv, 3, 3)), scale_factor, scale_factor)
    ref_Ks = cam.scale_intrinsics(ref_Ks, scale_factor, scale_factor)
    depth_nv = jnp.broadcast_to(depth, (nv, *depth.shape[1:]))
    world = cam.reconstruct(depth_nv, Ks)                      # (nv, 3, hf, wf)
    coords = cam.project(world, ref_Ks, Twc=pose, normalize=True)
    warped = grid_sample(
        fmaps_ref.transpose(0, 3, 1, 2), coords, align_corners=True
    ).transpose(0, 2, 3, 1)
    return (fmap - warped) ** 2


class IPONet(nn.Module):
    cfg: IPONetCfg

    @nn.compact
    def __call__(
        self,
        target_image: jnp.ndarray,       # (1, 3, h, w)
        ref_imgs: jnp.ndarray,           # (n_views, 3, h, w)
        target_intrinsics: jnp.ndarray,  # (1, 3, 3) pixel intrinsics
        ref_intrinsics: jnp.ndarray,     # (n_views, 3, 3)
        min_depth: float | jnp.ndarray = 0.1,
        max_depth: float | jnp.ndarray = 100.0,
    ) -> IPONetOutput:
        cfg = self.cfg
        n_views = ref_imgs.shape[0]
        h, w = target_image.shape[-2:]
        ratio = cfg.feat_ratio
        outer_iters = cfg.iters // cfg.seq_len

        scale_inv_depth = lambda d: disp_to_depth(d, min_depth, max_depth)[0]

        to_nhwc = lambda t: t.transpose(0, 2, 3, 1)
        tgt = to_nhwc(target_image)       # (1, h, w, 3)
        refs = to_nhwc(ref_imgs)          # (nv, h, w, 3)

        # Shared feature net over [target; refs].
        fnet = ResNetEncoder(out_chs=cfg.foutput_dim, stride=ratio, name="fnet")
        fmaps = fnet(jnp.concatenate([tgt, refs], axis=0))
        fmap1, fmaps_ref = fmaps[:1], fmaps[1:]

        # Init heads — views batched on the leading axis.
        fmap1_nv = jnp.broadcast_to(fmap1, (n_views, *fmap1.shape[1:]))
        poses = PoseHead(cfg.foutput_dim, name="pose_head")(
            jnp.concatenate([fmap1_nv, fmaps_ref], axis=-1)
        )  # (nv, 6)

        inv_depth = DepthHead(cfg.foutput_dim, name="depth_head")(fmap1, act=nn.sigmoid)
        up_mask0 = UpMaskNet(cfg.foutput_dim, ratio, name="upmask_net")(fmap1)
        inv_depth_up0 = upsample_depth_convex(inv_depth, up_mask0, ratio, (h, w))

        # Context nets.
        cnet_depth = ResNetEncoder(
            out_chs=cfg.hidden_dim + cfg.context_dim, stride=ratio, name="cnet_depth"
        )(tgt)
        hidden_d = nn.tanh(cnet_depth[..., : cfg.hidden_dim])
        inp_d = nn.relu(cnet_depth[..., cfg.hidden_dim :])

        pairs = jnp.concatenate([jnp.broadcast_to(tgt, (n_views, *tgt.shape[1:])), refs], axis=-1)
        cnet_pose = ResNetEncoder(
            out_chs=cfg.hidden_dim + cfg.context_dim, stride=ratio, name="cnet_pose"
        )(pairs)
        hidden_p = nn.tanh(cnet_pose[..., : cfg.hidden_dim])  # (nv, hf, wf, hd)
        inp_p = nn.relu(cnet_pose[..., cfg.hidden_dim :])

        K = target_intrinsics
        ref_K = ref_intrinsics
        sf = 1.0 / ratio

        update_depth = BasicUpdateBlockDepth(
            cfg.hidden_dim, ratio, cfg.context_dim, name="update_block_depth"
        )
        update_pose = BasicUpdateBlockPose(
            cfg.hidden_dim, cfg.context_dim, name="update_block_pose"
        )

        inv_depth_preds = [scale_inv_depth(inv_depth_up0)]
        pose_preds = [poses]

        for _ in range(outer_iters):
            inv_depth = jax.lax.stop_gradient(inv_depth)
            poses = jax.lax.stop_gradient(poses)

            # The pose update uses the depth from the *start* of the outer
            # iteration (the reference's partial() captures it eagerly,
            # depth_pose_network.py:176-178), not the freshly updated one.
            depth_fixed = inv2depth(scale_inv_depth(inv_depth)).transpose(0, 3, 1, 2)

            # --- depth GRU steps ---
            net_d = hidden_d
            up_mask = None
            for _ in range(cfg.seq_len):
                depth_now = inv2depth(scale_inv_depth(inv_depth)).transpose(0, 3, 1, 2)
                cost = jnp.mean(
                    warp_cost(poses, fmap1, fmaps_ref, depth_now, K, ref_K, sf),
                    axis=0, keepdims=True,
                )
                net_d, inv_depth, up_mask = update_depth(net_d, inv_depth, cost, inp_d)
            hidden_d = net_d
            inv_depth_up = upsample_depth_convex(inv_depth, up_mask, ratio, (h, w))
            inv_depth_preds.append(scale_inv_depth(inv_depth_up))

            # --- pose GRU steps (views batched) ---
            net_p = hidden_p
            for _ in range(cfg.seq_len):
                cost = warp_cost(poses, fmap1, fmaps_ref, depth_fixed, K, ref_K, sf)
                net_p, poses = update_pose(net_p, poses, cost, inp_p)
            hidden_p = net_p
            pose_preds.append(poses)

        inv_depths = jnp.stack(
            [p.transpose(0, 3, 1, 2) for p in inv_depth_preds], axis=0
        )  # (n_preds, 1, 1, h, w)
        rel_poses = jnp.stack(pose_preds, axis=1)[None]  # (1, nv, n_preds, 6)
        return IPONetOutput(inv_depths=inv_depths, rel_poses=rel_poses, fmap=fmap1)
