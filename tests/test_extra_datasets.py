"""The five round-2 dataset loaders against tiny on-disk fixtures.

No real dataset ships in this environment, so each test materializes a
minimal scene tree in the reference's file format (frames/cameras txt,
KITTI calib/poses, DeepVoxels rgb/pose/intrinsics, GSO images/pose/
intrinsics, Spaces models.json) and checks the loader emits the dual batch
format (legacy IBRNet keys + pixelSplat context/target)."""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from ggrt_official_tpu.data.registry import dataset_dict


def _write_png(path, h=8, w=12, seed=0):
    import imageio.v2 as imageio

    rs = np.random.RandomState(seed)
    img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, img)


def _check_example(ex, n_src):
    assert ex["rgb"].ndim == 3 and ex["rgb"].shape[-1] == 3
    assert ex["camera"].shape == (34,)
    assert ex["src_rgbs"].shape[0] == n_src
    assert ex["src_cameras"].shape == (n_src, 34)
    ctx, tgt = ex["context"], ex["target"]
    assert ctx["extrinsics"].shape == (n_src, 4, 4)
    assert ctx["intrinsics"].shape == (n_src, 3, 3)
    assert ctx["image"].shape[0] == n_src and ctx["image"].shape[1] == 3
    assert tgt["extrinsics"].shape == (1, 4, 4)
    assert np.isfinite(ex["depth_range"]).all()
    # c2w orthonormality of the emitted extrinsics.
    R = ctx["extrinsics"][:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (n_src, 1, 1)), atol=1e-4)


def _pose_ring(n, radius=2.0):
    poses = []
    for i in range(n):
        a = 0.4 * i / n
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        t = np.array([radius * s, 0.0, radius * (1 - c) + 4.0])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        poses.append(m)
    return poses


class TestRealEstate:
    def test_load(self, tmp_path):
        root = tmp_path
        scene = root / "RealEstate10K-subset" / "train" / "frames" / "scene0"
        cam_lines = ["https://example"]
        poses = _pose_ring(12)
        for i in range(12):
            _write_png(str(scene / f"{i:05d}.jpg"), seed=i)
            w2c = np.linalg.inv(poses[i])[:3, :].reshape(-1)
            cam_lines.append(
                " ".join(
                    map(str, [i, 0.8, 0.9, 0.5, 0.5, 0.0, 0.0, *w2c.tolist()])
                )
            )
        cams = root / "RealEstate10K-subset" / "train" / "cameras"
        os.makedirs(cams)
        (cams / "scene0.txt").write_text("\n".join(cam_lines))

        np.random.seed(0)
        ds = dataset_dict["realestate"](
            str(root), "train", num_source_views=3, image_size=(16, 24)
        )
        assert len(ds) == 1
        ex = ds[0]
        _check_example(ex, 3)


class TestKitti:
    def test_load(self, tmp_path):
        root = tmp_path / "kitti"
        seq = root / "sequences" / "00"
        n = 10
        poses = _pose_ring(n)
        for i in range(n):
            _write_png(str(seq / "image_2" / f"{i:06d}.png"), seed=i)
        P = np.array([[100.0, 0, 60, 0], [0, 100.0, 30, 0], [0, 0, 1, 0]])
        lines = [f"P{j}: " + " ".join(map(str, P.reshape(-1))) for j in range(4)]
        (seq / "calib.txt").write_text("\n".join(lines))
        os.makedirs(root / "poses")
        (root / "poses" / "00.txt").write_text(
            "\n".join(" ".join(map(str, p[:3, :].reshape(-1))) for p in poses)
        )

        ds = dataset_dict["kitti"](
            str(tmp_path), "train", scenes="00", num_source_views=3,
            image_size=(16, 32),
        )
        assert len(ds) > 0
        ex = ds[0]
        _check_example(ex, 3)


class TestDeepVoxels:
    def test_load(self, tmp_path):
        root = tmp_path / "deepvoxels"
        n = 8
        poses = _pose_ring(n)
        for subset in ("train", "test"):
            sp = root / subset / "vase"
            for i in range(n):
                _write_png(str(sp / "rgb" / f"{i:03d}.png"), seed=i)
                os.makedirs(sp / "pose", exist_ok=True)
                (sp / "pose" / f"{i:03d}.txt").write_text(
                    " ".join(map(str, poses[i].reshape(-1)))
                )
            (sp / "intrinsics.txt").write_text("100.0 4.0 4.0 0\n0\n8\n")

        np.random.seed(0)
        ds = dataset_dict["deepvoxels"](
            str(tmp_path), "train", scenes="vase", num_source_views=3,
            image_size=(16, 16),
        )
        ex = ds[0]
        assert ex["src_rgbs"].shape[0] >= 1
        _check_example(ex, ex["src_rgbs"].shape[0])


class TestGoogleScanned:
    def test_load(self, tmp_path):
        root = tmp_path / "google_scanned_objects" / "obj0"
        n = 6
        poses = _pose_ring(n)
        K4 = np.eye(4)
        K4[0, 0] = K4[1, 1] = 80.0
        K4[0, 2] = K4[1, 2] = 8.0
        for i in range(n):
            _write_png(str(root / "images" / f"{i:03d}.png"), seed=i)
            os.makedirs(root / "pose", exist_ok=True)
            os.makedirs(root / "intrinsics", exist_ok=True)
            (root / "pose" / f"{i:03d}.txt").write_text(
                " ".join(map(str, poses[i].reshape(-1)))
            )
            (root / "intrinsics" / f"{i:03d}.txt").write_text(
                " ".join(map(str, K4.reshape(-1)))
            )

        np.random.seed(1)
        ds = dataset_dict["google_scanned"](
            str(tmp_path), "train", num_source_views=3, image_size=(16, 16),
            min_files=n,
        )
        assert len(ds) == 1
        ex = ds[0]
        _check_example(ex, 3)


class TestSpaces:
    def test_load(self, tmp_path):
        base = tmp_path / "spaces_dataset" / "data" / "800" / "scene_000"
        os.makedirs(base)
        n_rigs, n_cams = 3, 4
        model = []
        k = 0
        for r in range(n_rigs):
            rig = []
            for c in range(n_cams):
                rel = f"cam_{c:02d}/image_{r:03d}.png"
                _write_png(str(base / rel), h=8, w=12, seed=k)
                from scipy.spatial.transform import Rotation

                Rm = Rotation.from_euler("XYZ", [0.01 * k, 0.02 * k, 0.0]).as_matrix()
                rotvec = Rotation.from_matrix(Rm.T).as_rotvec()
                rig.append(
                    {
                        "relative_path": rel,
                        "height": 8,
                        "width": 12,
                        "focal_length": 10.0,
                        "pixel_aspect_ratio": 1.0,
                        "principal_point": [6.0, 4.0],
                        "position": [0.1 * k, 0.05 * r, 0.0],
                        "orientation": rotvec.tolist(),
                    }
                )
                k += 1
            model.append(rig)
        (base / "models.json").write_text(json.dumps(model))

        ds = dataset_dict["spaces"](
            str(tmp_path), "train", num_source_views=3, image_size=(8, 12)
        )
        assert len(ds) == n_rigs * n_cams
        ex = ds[0]
        _check_example(ex, 3)


class TestRegistryComplete:
    def test_eleven_plus_datasets_registered(self):
        # Reference registry lists 11 usable entries
        # (/root/reference/ggrt/data_loaders/__init__.py:32-46).
        expected = {
            "llff", "llff_test", "ibrnet_collected", "waymo", "nerf_synthetic",
            "scannet", "realestate", "kitti", "deepvoxels", "google_scanned",
            "spaces",
        }
        assert expected <= set(dataset_dict)


class TestShims:
    def _batch(self):
        rs = np.random.RandomState(0)
        def views(v):
            e = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
            e[0, :, 0, 3] = np.linspace(0, 0.2, v)
            K = np.tile(np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (1, v, 1, 1))
            return {
                "image": rs.rand(1, v, 3, 20, 28).astype(np.float32),
                "extrinsics": e, "intrinsics": K,
                "near": np.ones((1, v), np.float32),
                "far": np.full((1, v), 10.0, np.float32),
            }
        return {"context": views(2), "target": views(1)}

    def test_augmentation_reflects_consistently(self):
        from ggrt_official_tpu.data.shims import apply_augmentation_shim

        batch = self._batch()
        rng = np.random.RandomState(3)  # first rand() >= 0.5 -> flips
        while True:
            probe = np.random.RandomState(rng.get_state()[1][0] % (2**31))
            break
        out = apply_augmentation_shim(batch, rng=np.random.RandomState(1))
        out2 = apply_augmentation_shim(batch, rng=np.random.RandomState(1))
        np.testing.assert_array_equal(out["context"]["image"], out2["context"]["image"])
        # Find a seed that flips, then check the reflection is an involution.
        for seed in range(10):
            r = np.random.RandomState(seed)
            if r.rand() >= 0.5:
                flipped = apply_augmentation_shim(batch, rng=np.random.RandomState(seed))
                twice = apply_augmentation_shim(flipped, rng=np.random.RandomState(seed))
                np.testing.assert_allclose(
                    twice["context"]["image"], batch["context"]["image"], atol=1e-6
                )
                # Extrinsics stay valid rotations.
                R = flipped["context"]["extrinsics"][0, :, :3, :3]
                np.testing.assert_allclose(
                    np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (2, 1, 1)),
                    atol=1e-5,
                )
                return
        raise AssertionError("no flipping seed found")

    def test_crop_shim_shapes_and_intrinsics(self):
        from ggrt_official_tpu.data.shims import apply_crop_shim

        batch = self._batch()
        out = apply_crop_shim(batch, (16, 16))
        assert out["context"]["image"].shape == (1, 2, 3, 16, 16)
        assert out["target"]["image"].shape == (1, 1, 3, 16, 16)
        # Width was cropped more than height at 20x28 -> fx scaled more.
        fx = out["context"]["intrinsics"][0, 0, 0, 0]
        fy = out["context"]["intrinsics"][0, 0, 1, 1]
        assert fx > fy >= 1.0
