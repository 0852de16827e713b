"""Composite GGRt model: IPO-Net + PixelSplat + joint loss machinery.

Parity target: /root/reference/ggrt/model/dgaussian.py (DGaussianModel):
iponet() wrapper (camera 34-vector unpacking), the pose_only/nerf_only/
joint state machine, and the exponential-decay joint loss.

In JAX the "state machine" does not toggle requires_grad; instead the
trainer zero-masks the corresponding gradient pytrees (see
training/trainer.py), which is the functional equivalent.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GGRtConfig
from ..losses.photometric import photometric_decay_loss
from .iponet import IPONet, IPONetOutput
from .pixelsplat import PixelSplat


def unpack_camera(camera: jnp.ndarray):
    """34-vector camera -> (hw, intrinsics 4x4, c2w 4x4) (ref dgaussian.py:70-71)."""
    hw = camera[..., :2]
    intrinsics = camera[..., 2:18].reshape(*camera.shape[:-1], 4, 4)
    c2w = camera[..., 18:34].reshape(*camera.shape[:-1], 4, 4)
    return hw, intrinsics, c2w


def compose_joint_loss(sfm_loss, nerf_loss, step, coefficient: float = 1e-5):
    """alpha * sfm + (1 - alpha) * nerf with alpha = 2^(-c*step) (ref :113-121).

    Time-scale warning: at the reference coefficient 1e-5 the gaussian
    (nerf) term carries ~0.3% of the loss for the first few thousand steps
    (alpha halves only at step 1e5), so 'joint' from scratch stalls gaussian
    learning — measured flat PSNR ~8 over 2.4k steps on the synthetic mix.
    Short runs should stage machines instead (nerf_only → pose_only) or
    raise cfg.train.joint_coefficient.
    """
    alpha = 2.0 ** (-coefficient * step)
    return alpha * sfm_loss + (1.0 - alpha) * nerf_loss


class GGRtModel(nn.Module):
    """Bundles the pose learner and the gaussian model as submodules so a
    single param pytree carries both, keyed 'pose_learner' / 'gaussian'
    exactly like the reference checkpoints (train_ggrt_stable.py:60-66)."""

    cfg: GGRtConfig

    def setup(self):
        self.pose_learner = IPONet(self.cfg.iponet)
        self.gaussian = PixelSplat(self.cfg.encoder, self.cfg.decoder)

    def iponet(
        self,
        target_image: jnp.ndarray,   # (1, h, w, 3) — loader layout, ref parity
        ref_imgs: jnp.ndarray,       # (1, nv, h, w, 3)
        target_camera: jnp.ndarray,  # (1, 34)
        ref_cameras: jnp.ndarray,    # (1, nv, 34)
        min_depth,
        max_depth,
        compute_sfm_loss: bool = True,
    ):
        """Run IPO-Net; optionally attach the photometric SfM loss.

        Returns (inv_depths, rel_poses, sfm_loss, fmap) like
        dgaussian.py:55-87 — rel_poses (nv, n_preds, 6).
        """
        _, target_K4, _ = unpack_camera(target_camera)
        _, ref_K4, _ = unpack_camera(ref_cameras[0])
        target_K = target_K4[..., :3, :3]
        ref_K = ref_K4[..., :3, :3]

        tgt = target_image.transpose(0, 3, 1, 2)       # (1, 3, h, w)
        refs = ref_imgs[0].transpose(0, 3, 1, 2)       # (nv, 3, h, w)

        out: IPONetOutput = self.pose_learner(
            tgt, refs, target_K, ref_K, min_depth=min_depth, max_depth=max_depth
        )
        sfm = None
        if compute_sfm_loss:
            sfm = photometric_decay_loss(
                tgt, refs, out.inv_depths, target_K, ref_K, out.rel_poses,
                valid_mask=self.cfg.train.sfm_valid_mask,
                oob_weight=self.cfg.train.sfm_oob_weight,
            )
        return out.inv_depths, out.rel_poses[0], sfm, out.fmap

    def gaussian_forward(self, batch, global_step, **kw):
        return self.gaussian(batch, global_step, **kw)

    def pose_teacher_render(self, batch, cams_c2w, global_step):
        """Render the context views at the given cameras from a FROZEN
        teacher field (gaussians encoded at the dataset context poses).

        The pose-teacher loss (config.pose_teacher_weight) compares these
        renders against the real context images; gradients flow to the
        cameras only — the gaussians are stop-gradiented, so IPO-Net
        receives the rasterizer's exact dExtrinsics and nothing perturbs
        the field (unlike use_pred_pose+pose_render_grad, which rebuilds
        the field FROM the predicted poses and diverges, r4 sweep).

        Args: cams_c2w (b, v, 4, 4). Returns (b, v, 3, h, w) renders.
        """
        ctx = batch["context"]
        g = self.gaussian.encode_pairs(ctx, global_step, deterministic=True)
        g = jax.tree_util.tree_map(jax.lax.stop_gradient, g)
        h, w = ctx["image"].shape[-2:]
        out = self.gaussian.decoder(
            g, cams_c2w, ctx["intrinsics"], ctx["near"], ctx["far"], (h, w),
            depth_mode=None,
        )
        return out.color

    def __call__(self, batch, global_step, **kw):
        """Gaussian-model forward (the common jit entry)."""
        return self.gaussian(batch, global_step, **kw)
