"""DBARF model: IBRNet + pose learner (legacy volume-rendering path).

Parity target: /root/reference/ggrt/model/dbarf.py (DBARFModel) and
/root/reference/ggrt/model/ibrnet.py:139-193 (IBRNetModel): coarse(+fine)
IBRNet nets, ResUNet feature extractor, the IPO-Net pose learner with
correct_poses(), and the same state machine / joint loss as the Gaussian
model. Used by eval_dbarf and as the pose-network host in eval_ggrt.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GGRtConfig
from .feature_unet import ResUNet
from .ibrnet import IBRNet
from .iponet import IPONet, IPONetOutput


class IBRNetModel(nn.Module):
    """Coarse(+fine) IBRNet + feature net bundled as one module."""

    cfg: GGRtConfig
    coarse_feat_dim: int = 64
    fine_feat_dim: int = 32
    coarse_only: bool = True
    n_samples: int = 64
    n_importance: int = 0

    def setup(self):
        self.net_coarse = IBRNet(
            in_feat_ch=self.coarse_feat_dim, n_samples=self.n_samples
        )
        if not self.coarse_only:
            self.net_fine = IBRNet(
                in_feat_ch=self.fine_feat_dim,
                n_samples=self.n_samples + self.n_importance,
            )
        self.feature_net = ResUNet(
            coarse_out_ch=self.coarse_feat_dim,
            fine_out_ch=self.fine_feat_dim,
            coarse_only=self.coarse_only,
        )

    def extract_features(self, src_rgbs: jnp.ndarray):
        """(v, h, w, 3) -> (coarse (v, h/2, w/2, d), fine | None)."""
        return self.feature_net(src_rgbs)

    def coarse(self, rgb_feat, ray_diff, mask):
        return self.net_coarse(rgb_feat, ray_diff, mask)

    def fine(self, rgb_feat, ray_diff, mask):
        assert not self.coarse_only
        return self.net_fine(rgb_feat, ray_diff, mask)

    def __call__(self, src_rgbs, rgb_feat, ray_diff, mask):
        """Init-friendly entry touching every submodule."""
        feats = self.extract_features(src_rgbs)
        out = self.coarse(rgb_feat, ray_diff, mask)
        if not self.coarse_only:
            out = out + 0.0 * self.fine(rgb_feat, ray_diff, mask)
        return feats, out


class DBARFModel(nn.Module):
    """IBRNetModel + pose learner (ref dbarf.py:11-112)."""

    cfg: GGRtConfig
    coarse_only: bool = True

    def setup(self):
        self.ibrnet = IBRNetModel(
            self.cfg,
            coarse_feat_dim=64,
            fine_feat_dim=32,
            coarse_only=self.coarse_only,
        )
        self.pose_learner = IPONet(self.cfg.iponet)

    def correct_poses(
        self, target_image, ref_imgs, target_intrinsics, ref_intrinsics,
        min_depth=0.1, max_depth=100.0,
    ) -> IPONetOutput:
        """Predict inverse depth + relative poses (ref dbarf.py:31-63)."""
        return self.pose_learner(
            target_image, ref_imgs, target_intrinsics, ref_intrinsics,
            min_depth=min_depth, max_depth=max_depth,
        )

    def extract_features(self, src_rgbs):
        return self.ibrnet.extract_features(src_rgbs)

    def coarse(self, rgb_feat, ray_diff, mask):
        return self.ibrnet.coarse(rgb_feat, ray_diff, mask)

    def __call__(self, src_rgbs, rgb_feat, ray_diff, mask):
        return self.ibrnet(src_rgbs, rgb_feat, ray_diff, mask)
