"""Multi-view photometric SfM loss (pure jnp).

Parity target: /root/reference/ggrt/loss/photometric_loss.py
(MultiViewPhotometricDecayLoss): for each RAFT iterate's (depth, poses),
warp every reference image into the target via depth+pose, L1+SSIM
(alpha = 0.85) with mean+0.5*std clipping, min-reduce over {warped refs,
unwarped refs (automask)}, gamma-decay (0.85) over iterates, plus an
edge-aware smoothness term.

The reference evaluates one "scale" (self.n = number of RAFT iterates is
reinterpreted as scales in its code — inv_depths is the *iterate* list and
match_scales sees same-resolution maps). We reproduce that exact behavior:
per-iterate losses, decay-weighted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry.depth import calc_smoothness, inv2depth
from ..geometry.se3 import pose_from_vec
from ..ops.grid_sample import grid_sample
from ..ops.ssim import ssim_photometric


def warp_ref_image(inv_depth, ref_image, K, ref_K, pose_mat, return_mask=False):
    """Warp ref image into the target frame via depth + pose (ref :106-138,
    :245-276). inv_depth (b,1,h,w); ref_image (b,3,h,w); pose target->ref.

    With return_mask, also returns the (b,1,h,w) in-bounds validity mask
    (pixels whose warp lands inside the reference frame)."""
    depth = inv2depth(inv_depth)
    world = cam.reconstruct(depth, K)
    coords = cam.project(world, ref_K, Twc=pose_mat, normalize=True)
    warped = grid_sample(ref_image, coords, align_corners=True)
    if not return_mask:
        return warped
    valid = (
        (jnp.abs(coords[..., 0]) <= 1.0) & (jnp.abs(coords[..., 1]) <= 1.0)
    )[:, None].astype(warped.dtype)
    return warped, valid, coords


def _photometric_map(t_est, images, ssim_weight, C1, C2, clip):
    """Per-pixel L1+SSIM photometric residual with std clipping (ref :318-355)."""
    l1 = jnp.abs(t_est - images)
    if ssim_weight > 0.0:
        ssim_val = ssim_photometric(t_est, images, C1=C1, C2=C2)
        ssim_loss = jnp.clip((1.0 - ssim_val) / 2.0, 0.0, 1.0)
        loss = ssim_weight * jnp.mean(ssim_loss, axis=1, keepdims=True) + (
            1.0 - ssim_weight
        ) * jnp.mean(l1, axis=1, keepdims=True)
    else:
        loss = l1
    if clip > 0.0:
        # torch.Tensor.std() is the unbiased (n-1) estimator.
        mean, std = jnp.mean(loss), jnp.std(loss, ddof=1)
        loss = jnp.minimum(loss, mean + clip * std)
    return loss


def photometric_decay_loss(
    image: jnp.ndarray,      # (1, 3, h, w) target
    ref_imgs: jnp.ndarray,   # (nv, 3, h, w)
    inv_depths: jnp.ndarray, # (n_iters, 1, 1, h, w)
    K: jnp.ndarray,          # (1, 3, 3) pixel intrinsics
    ref_Ks: jnp.ndarray,     # (nv, 3, 3)
    poses: jnp.ndarray,      # (1, nv, n_iters, 6)
    ssim_weight: float = 0.85,
    smooth_weight: float = 0.01,
    C1: float = 1e-4,
    C2: float = 9e-4,
    clip: float = 0.5,
    gamma: float = 0.85,
    automask: bool = True,
    valid_mask: bool = False,
    oob_weight: float = 0.0,
) -> dict:
    """Returns {'loss': scalar, 'metrics': {...}} (ref forward :412-516).

    valid_mask (TPU-build extension, OFF by default for reference parity):
    the reference warps with padding_mode='zeros' (photometric_loss.py:106),
    so out-of-frame warps compare the target against black. On wide-baseline
    or low-texture data that creates a positive feedback — poses that push
    pixels out of frame reduce the loss wherever the target is dark, and
    once everything is out of frame the automask min hides the warp entirely
    (zero pose gradient, translations drift unbounded; observed in the round-2
    flagship: unaligned t_err 17.7 vs 0.25 identity baseline). With
    valid_mask=True, out-of-frame residuals are excluded: they cannot win
    the min-reduce, and pixels with no valid residual at all are dropped
    from the mean.

    oob_weight (TPU-build extension, 0 = off/parity): valid_mask alone
    makes out-of-frame warps UNPUNISHED — once a pose pushes everything
    out of frame the loss collapses to the pose-independent automask floor
    and translations random-walk (round-3 smoke2: unaligned t_err drifted
    to 4.1 vs a 0.25 identity baseline, sfm flat at the ~0.8 automask
    level). A smooth boundary penalty mean(relu(|xy|-1)^2) on the warp
    coordinates restores an inward gradient everywhere outside the frame."""
    n_iters = inv_depths.shape[0]
    nv = ref_imgs.shape[0]
    poses = poses[0]  # (nv, n_iters, 6)
    BIG = jnp.asarray(1e4, image.dtype)

    per_iter_losses = []
    oob_terms = []
    for i in range(n_iters):
        residuals = []
        valids = []
        for j in range(nv):
            pose_mat = pose_from_vec(poses[j, i][None])
            warped, valid, coords = warp_ref_image(
                inv_depths[i], ref_imgs[j][None], K, ref_Ks[j][None], pose_mat,
                return_mask=True,
            )
            res = _photometric_map(warped, image, ssim_weight, C1, C2, clip)
            if valid_mask:
                res = jnp.where(valid > 0.5, res, BIG)
                valids.append(valid)
            if oob_weight > 0.0:
                oob_terms.append(
                    jnp.mean(jnp.maximum(jnp.abs(coords) - 1.0, 0.0) ** 2)
                )
            residuals.append(res)
            if automask:
                residuals.append(
                    _photometric_map(ref_imgs[j][None], image, ssim_weight, C1, C2, clip)
                )
                valids.append(jnp.ones_like(valid))
        # min-reduce over views (+automask copies), then mean over pixels.
        stacked = jnp.concatenate(residuals, axis=1)  # (1, n_res, h, w)
        min_res = jnp.min(stacked, axis=1)
        if valid_mask:
            any_valid = jnp.max(jnp.concatenate(valids, axis=1), axis=1) > 0.5
            per_iter_losses.append(
                jnp.sum(jnp.where(any_valid, min_res, 0.0))
                / jnp.maximum(jnp.sum(any_valid.astype(image.dtype)), 1.0)
            )
        else:
            per_iter_losses.append(jnp.mean(min_res))

    weights = gamma ** (n_iters - 1 - jnp.arange(n_iters, dtype=image.dtype))
    photo = jnp.sum(weights * jnp.stack(per_iter_losses))

    metrics = {"photometric_loss": photo}
    loss = photo
    if oob_weight > 0.0:
        oob = oob_weight * jnp.mean(jnp.stack(oob_terms))
        metrics["oob_loss"] = oob
        loss = loss + oob
    if smooth_weight > 0.0:
        smooth_terms = []
        for i in range(n_iters):
            sx, sy = calc_smoothness(inv_depths[i], image)
            # Reference: (|sx|.mean() + |sy|.mean()) / 2**i — the divisor is
            # only the per-scale octave factor (photometric_loss.py:438-440).
            smooth_terms.append(
                (jnp.mean(jnp.abs(sx)) + jnp.mean(jnp.abs(sy))) / (2.0**i)
            )
        smooth = smooth_weight * jnp.sum(jnp.stack(smooth_terms)) / n_iters
        metrics["smoothness_loss"] = smooth
        loss = loss + smooth

    return {"loss": loss, "metrics": metrics}


class MultiViewPhotometricDecayLoss:
    """Thin class wrapper mirroring the reference API."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, image, ref_imgs, inv_depths, K, ref_Ks, poses):
        return photometric_decay_loss(image, ref_imgs, inv_depths, K, ref_Ks, poses, **self.kwargs)
