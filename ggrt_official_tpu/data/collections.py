"""Multi-scene generalizable training datasets (host-side).

Parity targets:
  * /root/reference/ggrt/data_loaders/llff.py (LLFFDataset — multi-scene
    LLFF training on real_iconic_noface)
  * /root/reference/ggrt/data_loaders/ibrnet_collected.py
    (IBRNetCollectedDataset — ibrnet_collected_1/2)

Both walk a directory of LLFF-format scene folders (poses_bounds.npy +
images_N/) and emit the dual-format examples; they differ only in the
folder layout and resize policy, so they share one implementation.
"""
from __future__ import annotations

import os

import numpy as np

from .datasets import make_example, pack_camera
from .llff import batch_parse_llff_poses, load_llff_data, loader_resize
from .view_selection import get_nearest_pose_ids


class LLFFSceneCollection:
    """Directory-of-LLFF-scenes dataset."""

    def __init__(
        self,
        scene_dirs: list[str],
        mode: str = "train",
        num_source_views: int = 5,
        image_size=(320, 448),
        factor: int = 8,
        llffhold: int = 8,
    ):
        self.mode = mode
        self.num_source_views = num_source_views
        self.image_size = image_size

        self.render_rgb_files = []
        self.render_intrinsics = []
        self.render_poses = []
        self.render_train_set_ids = []
        self.render_depth_range = []
        self.train_intrinsics = []
        self.train_poses = []
        self.train_rgb_files = []

        kept = 0
        for scene_path in scene_dirs:
            try:
                _, poses, bds, _, _, rgb_files = load_llff_data(
                    scene_path, factor=factor, load_imgs=False
                )
            except (FileNotFoundError, ValueError):
                continue
            near_depth, far_depth = np.min(bds), np.max(bds)
            intrinsics, c2w_mats = batch_parse_llff_poses(poses)
            ids = np.arange(len(rgb_files))
            i_test = ids[::llffhold]
            i_train = np.array([j for j in ids if j not in i_test])
            i_render = i_train if mode == "train" else i_test

            self.train_intrinsics.append(intrinsics[i_train])
            self.train_poses.append(c2w_mats[i_train])
            self.train_rgb_files.append(np.array(rgb_files)[i_train].tolist())
            self.render_rgb_files.extend(np.array(rgb_files)[i_render].tolist())
            self.render_intrinsics.extend(intrinsics[i_render])
            self.render_poses.extend(c2w_mats[i_render])
            self.render_depth_range.extend([[near_depth, far_depth]] * len(i_render))
            self.render_train_set_ids.extend([kept] * len(i_render))
            kept += 1

    def __len__(self):
        return len(self.render_rgb_files)

    def __getitem__(self, idx):
        import imageio.v2 as imageio

        idx = idx % len(self.render_rgb_files)
        rgb_file = self.render_rgb_files[idx]
        rgb = imageio.imread(rgb_file).astype(np.float32)[..., :3] / 255.0
        pose = self.render_poses[idx]
        intrinsics = self.render_intrinsics[idx]
        depth_range_raw = self.render_depth_range[idx]

        tsid = self.render_train_set_ids[idx]
        train_files = self.train_rgb_files[tsid]
        train_poses = self.train_poses[tsid]
        train_intr = self.train_intrinsics[tsid]

        id_render = train_files.index(rgb_file) if rgb_file in train_files else -1
        nearest = get_nearest_pose_ids(
            pose, train_poses, self.num_source_views,
            tar_id=id_render, angular_dist_method="dist",
        )

        camera = pack_camera(rgb.shape[:2], intrinsics, pose)
        src_rgbs, src_cams, src_in, src_ex = [], [], [], []
        for sid in nearest:
            img = imageio.imread(train_files[sid]).astype(np.float32)[..., :3] / 255.0
            src_rgbs.append(img)
            src_cams.append(pack_camera(img.shape[:2], train_intr[sid], train_poses[sid]))
            src_in.append(train_intr[sid])
            src_ex.append(train_poses[sid])
        src_rgbs = np.stack(src_rgbs)
        src_cams = np.stack(src_cams)

        rgb_r, cam_r, src_rgbs_r, src_cams_r, intr3, src_intr3 = loader_resize(
            rgb, camera, src_rgbs, src_cams, size=self.image_size
        )
        depth_range = (depth_range_raw[0] * 0.9, depth_range_raw[1] * 1.5)
        return make_example(
            rgb_r, cam_r, rgb_file, src_rgbs_r, src_cams_r, depth_range,
            np.stack(src_ex).astype(np.float32), pose[None].astype(np.float32),
            src_intr3, intr3[None], nearest, tsid, self.image_size,
        )


def _scene_dirs(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if os.path.isdir(os.path.join(root, d))
    ]


class LLFFDataset(LLFFSceneCollection):
    """Multi-scene LLFF training set (real_iconic_noface), ref llff.py:27."""

    def __init__(self, rootdir: str, mode: str = "train", **kw):
        super().__init__(
            _scene_dirs(os.path.join(rootdir, "real_iconic_noface")), mode, **kw
        )


class IBRNetCollectedDataset(LLFFSceneCollection):
    """ibrnet_collected_1 + ibrnet_collected_2, ref ibrnet_collected.py:30."""

    def __init__(self, rootdir: str, mode: str = "train", **kw):
        dirs = _scene_dirs(os.path.join(rootdir, "ibrnet_collected_1")) + _scene_dirs(
            os.path.join(rootdir, "ibrnet_collected_2")
        )
        super().__init__(dirs, mode, **kw)
