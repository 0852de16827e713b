"""Datasets emitting the dual batch format (host-side numpy).

Parity target: /root/reference/ggrt/data_loaders/llff_test.py (and llff.py):
each example carries BOTH the legacy IBRNet keys (rgb/camera/src_rgbs/
src_cameras/depth_range) AND the pixelSplat context/target dicts
(llff_test.py:245-269). Arrays are numpy; the trainer moves them on-device.

Also provides `SyntheticPlanesDataset` — a procedurally generated
multi-view scene (textured fronto-parallel planes rendered by alpha
compositing with exact pinhole geometry) used by tests and smoke training
where no LLFF data is on disk.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .llff import batch_parse_llff_poses, load_llff_data, loader_resize
from .view_selection import get_nearest_pose_ids


def pack_camera(img_size, intrinsics4, c2w) -> np.ndarray:
    """34-vector camera: (h, w, K.flatten 16, c2w.flatten 16)."""
    return np.concatenate(
        [list(img_size), intrinsics4.flatten(), c2w.flatten()]
    ).astype(np.float32)


def normalize_intrinsics(intrinsics: np.ndarray, img_size) -> np.ndarray:
    """Pixel -> normalized intrinsics with centered principal point
    (ref utils_loc.py normalize_intrinsics)."""
    h, w = img_size
    out = intrinsics.copy()
    out[..., 0, 0] /= w
    out[..., 1, 1] /= h
    out[..., 0, 2] = 0.5
    out[..., 1, 2] = 0.5
    return out


def make_example(
    rgb, camera, rgb_file, src_rgbs, src_cameras, depth_range,
    src_extrinsics, extrinsics, src_intrinsics, intrinsics,
    nearest_pose_ids, train_set_id, image_size,
):
    """Assemble the dual-format example dict (llff_test.py:229-269)."""
    num_select = len(nearest_pose_ids)
    scale = 1.0
    if src_extrinsics.shape[0] == 2:
        a, b = src_extrinsics[:, :3, 3]
        scale = max(float(np.linalg.norm(a - b)), 1e-3)
        src_extrinsics = src_extrinsics.copy()
        extrinsics = extrinsics.copy()
        src_extrinsics[:, :3, 3] /= scale
        extrinsics[:, :3, 3] /= scale

    near = np.full((num_select,), depth_range[0] / scale, np.float32)
    far = np.full((num_select,), depth_range[1] / scale, np.float32)
    return {
        "rgb": rgb.astype(np.float32),
        "camera": camera.astype(np.float32),
        "rgb_path": rgb_file,
        "src_rgbs": src_rgbs.astype(np.float32),
        "src_cameras": src_cameras.astype(np.float32),
        "depth_range": np.asarray(depth_range, np.float32),
        "scaled_shape": (0, 0),
        "context": {
            "extrinsics": src_extrinsics.astype(np.float32),
            "intrinsics": normalize_intrinsics(src_intrinsics, image_size).astype(np.float32),
            "image": src_rgbs.transpose(0, 3, 1, 2).astype(np.float32),
            "near": near,
            "far": far,
            "index": np.asarray(nearest_pose_ids, np.int64),
        },
        "target": {
            "extrinsics": extrinsics.astype(np.float32),
            "intrinsics": normalize_intrinsics(intrinsics, image_size).astype(np.float32),
            "image": rgb.transpose(2, 0, 1)[None].astype(np.float32),
            "near": near[:1],
            "far": far[:1],
            "index": np.asarray([train_set_id], np.int64),
        },
    }


class LLFFTestDataset:
    """Per-scene LLFF dataset (ref llff_test.py:30-287)."""

    def __init__(
        self,
        rootdir: str,
        mode: str,
        scenes=(),
        num_source_views: int = 5,
        llffhold: int = 8,
        image_size=(320, 448),
        factor: int = 8,
    ):
        self.folder_path = os.path.join(rootdir, "nerf_llff_data/")
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

        if isinstance(scenes, str):
            scenes = [scenes]
        if not scenes:
            scenes = sorted(os.listdir(self.folder_path))

        for i, scene in enumerate(scenes):
            scene_path = os.path.join(self.folder_path, scene)
            _, poses, bds, _, _, rgb_files = load_llff_data(
                scene_path, factor=factor, load_imgs=False
            )
            near_depth, far_depth = np.min(bds), np.max(bds)
            intrinsics, c2w_mats = batch_parse_llff_poses(poses)

            i_test = np.arange(poses.shape[0])[::llffhold]
            i_train = np.array(
                [j for j in np.arange(poses.shape[0]) if j not in i_test]
            )
            i_render = i_train if mode == "train" else i_test

            self.train_intrinsics.append(intrinsics[i_train])
            self.train_poses.append(c2w_mats[i_train])
            self.train_rgb_files.append(np.array(rgb_files)[i_train].tolist())
            self.render_rgb_files.extend(np.array(rgb_files)[i_render].tolist())
            self.render_intrinsics.extend(intrinsics[i_render])
            self.render_poses.extend(c2w_mats[i_render])
            self.render_depth_range.extend([[near_depth, far_depth]] * len(i_render))
            self.render_train_set_ids.extend([i] * len(i_render))

    def __len__(self):
        return len(self.render_rgb_files)

    def __getitem__(self, idx):
        import imageio.v2 as imageio

        idx = idx % len(self.render_rgb_files)
        rgb_file = self.render_rgb_files[idx]
        rgb = imageio.imread(rgb_file).astype(np.float32)[..., :3] / 255.0
        render_pose = self.render_poses[idx]
        intrinsics = self.render_intrinsics[idx]
        depth_range_raw = self.render_depth_range[idx]

        tsid = self.render_train_set_ids[idx]
        train_rgb_files = self.train_rgb_files[tsid]
        train_poses = self.train_poses[tsid]
        train_intrinsics = self.train_intrinsics[tsid]

        if self.mode == "train" and rgb_file in train_rgb_files:
            id_render = train_rgb_files.index(rgb_file)
        else:
            id_render = -1

        nearest_pose_ids = get_nearest_pose_ids(
            render_pose, train_poses, self.num_source_views,
            tar_id=id_render, angular_dist_method="dist",
        )

        img_size = rgb.shape[:2]
        camera = pack_camera(img_size, intrinsics, render_pose)

        src_rgbs, src_cameras, src_intr, src_extr = [], [], [], []
        for sid in nearest_pose_ids:
            src_rgb = imageio.imread(train_rgb_files[sid]).astype(np.float32)[..., :3] / 255.0
            src_rgbs.append(src_rgb)
            src_cameras.append(
                pack_camera(src_rgb.shape[:2], train_intrinsics[sid], train_poses[sid])
            )
            src_intr.append(train_intrinsics[sid])
            src_extr.append(train_poses[sid])
        src_rgbs = np.stack(src_rgbs)
        src_cameras = np.stack(src_cameras)
        src_extr = np.stack(src_extr)

        rgb_r, camera_r, src_rgbs_r, src_cameras_r, intr3, src_intr3 = loader_resize(
            rgb, camera, src_rgbs, src_cameras, size=self.image_size
        )
        depth_range = (depth_range_raw[0] * 0.9, depth_range_raw[1] * 1.5)

        return make_example(
            rgb_r, camera_r, rgb_file, src_rgbs_r, src_cameras_r, depth_range,
            src_extr.astype(np.float32), render_pose[None].astype(np.float32),
            src_intr3, intr3[None], nearest_pose_ids, tsid, self.image_size,
        )


@dataclass
class SyntheticSceneSpec:
    n_views: int = 12
    image_size: tuple = (64, 96)
    n_planes: int = 4
    seed: int = 0
    # Binary (0/1) plane alphas make the scene fully opaque at every hit, so
    # a single depth map explains each pixel exactly and GT poses are a true
    # minimizer of the photometric warp loss (the default 0.05/0.95 soft
    # alphas leak 5% of every background plane through, which biases the
    # expected depth and puts the photometric optimum AWAY from GT poses —
    # measured by tools/diag_photometric_pose.py). Use for pose-learning
    # tests/runs; keep soft alphas for rasterizer compositing tests.
    binary_alpha: bool = False
    # Camera rotation controls. The default arc is pure translation
    # (identity rotations), which makes rotation-error metrics trivially
    # zero for any near-identity pose prediction. look_at_z orients every
    # camera toward (0, 0, look_at_z); rot_wobble_deg adds a smooth
    # deterministic yaw/pitch wobble on top so relative rotations between
    # nearby views are several degrees — a pose-learning eval is only
    # meaningful when the identity-prediction baseline error is nonzero.
    look_at_z: float | None = None
    rot_wobble_deg: float = 0.0
    arc_scale: float = 1.0
    # Texture spectrum. The default single-octave (blur-9 noise) texture has
    # ONE correlation length (~5 px at image res), so the photometric-loss
    # pose basin is only ~±20% of the inter-view offset (measured by
    # tools/diag_pose_1d.py: flat plateau from identity until 0.75·GT) and
    # no image pyramid can widen it — downsampling single-scale noise does
    # not create coarser structure. texture_octaves > 1 sums noise at
    # doubling blur radii (equal per-octave variance): coarse octaves give
    # the loss a wide basin, fine octaves keep the minimum sharp. Required
    # for pose-learning runs; default 1 keeps existing tests byte-stable.
    texture_octaves: int = 1
    # Camera focal length as a multiple of image width (1.2 ≈ 45° FOV).
    # Narrow FOV makes yaw/pitch rotations nearly indistinguishable from
    # translations in the photometric loss (the classic R-t ambiguity);
    # pose-learning runs use ~0.7 (≈ 71° FOV) so the periphery
    # disambiguates. Wider plane depth ranges add parallax for the same
    # reason.
    focal_factor: float = 1.2
    plane_depths: tuple = (2.0, 6.0)
    # Plane extents. "legacy": all planes span [-2,2]x[-1.5,1.5] — the far
    # planes do NOT cover the frustum (at depth 6 the half-FOV needs 2.5),
    # so off-center views see black borders where rays miss every plane, a
    # black-bias the photometric loss exploits. "cover": extent grows with
    # depth (+ margin for the camera arc) so every ray hits the background.
    plane_span: str = "legacy"


def flagship_scene_spec(seed: int = 0, image_size=(64, 96), n_views: int = 12):
    """The round-3 flagship pose-learning scene ("scene v3").

    Every field is diagnosis-driven (tools/diag_pose_landscape.py and the
    round-3 probes): multi-octave texture gives the photometric loss a wide
    basin with a sharp minimum; wide FOV + deep plane range breaks the
    rotation/translation ambiguity; plane_span="cover" removes black
    borders; binary alphas make GT poses a true minimizer. Direct Adam on
    raw pose vecs from identity converges R 5.4° -> 2.2° here (it diverges
    on the round-2 scene).
    """
    return SyntheticSceneSpec(
        n_views=n_views, image_size=image_size, seed=seed, binary_alpha=True,
        # This exact geometry (6° wobble at 2.3 rad/view, arc 1.4, z 4)
        # is the round-3-validated convergent configuration: direct Adam
        # from identity reaches R ~2° on it. High-frequency wobble matters
        # — it DECORRELATES adjacent views' rotations, breaking the
        # common-mode rotation-vs-translation valley that trapped every
        # low-frequency variant (round-3 seed sweeps; low-freq failed even
        # at 4.6° baselines).
        look_at_z=4.0, rot_wobble_deg=6.0, arc_scale=1.4,
        texture_octaves=4, focal_factor=0.7, plane_depths=(1.5, 8.0),
        plane_span="cover",
    )


class SyntheticPlanesDataset:
    """Procedural multi-view scene: textured alpha planes at fixed depths,
    cameras on an arc, exact pinhole projection. Used for tests/smoke runs."""

    def __init__(self, spec: SyntheticSceneSpec = SyntheticSceneSpec(),
                 mode: str = "train", num_source_views: int = 4, llffhold: int = 4):
        self.spec = spec
        self.mode = mode
        self.num_source_views = num_source_views
        rng = np.random.RandomState(spec.seed)
        h, w = spec.image_size

        # Textures: smooth random RGBA per plane.
        def smooth_noise(shape, blur=9):
            import cv2

            x = rng.rand(*shape).astype(np.float32)
            return cv2.GaussianBlur(x, (blur, blur), 0)

        def octave_noise(shape):
            """Equal-variance sum of noise octaves at explicit, tripling
            blur sigmas (0.8 · 3^o), rescaled to [0, 1]. Explicit sigma
            matters: ksize-derived sigma saturates (ksize 55 -> sigma ~9)
            and the coarse octaves never materialize — measured by the
            /tmp sigma probes behind tools/diag_pose_*: a sigma-8 texture
            gives the photometric pose loss a globally monotone
            identity->GT slope while ksize-9 noise plateaus beyond 20% of
            the offset. See SyntheticSceneSpec.texture_octaves."""
            if spec.texture_octaves <= 1:
                return smooth_noise(shape)
            acc = np.zeros(shape, np.float32)
            for o in range(spec.texture_octaves):
                x = rng.rand(*shape).astype(np.float32)
                layer = cv2.GaussianBlur(x, (0, 0), 0.8 * 3.0**o)
                acc += (layer - layer.mean()) / max(layer.std(), 1e-6)
            acc /= spec.texture_octaves**0.5
            return np.clip(0.5 + 0.25 * acc, 0.0, 1.0)

        import cv2

        depths = np.linspace(spec.plane_depths[0], spec.plane_depths[1], spec.n_planes)
        self.planes = []
        for d in depths:
            tex = np.stack([octave_noise((128, 192)) for _ in range(3)], -1)
            alpha = (smooth_noise((128, 192)) > 0.5).astype(np.float32)
            if not spec.binary_alpha:
                alpha = np.clip(alpha * 0.9 + 0.05, 0, 1)
            if d == depths[-1]:
                alpha = np.ones_like(alpha)  # opaque background plane
            self.planes.append((d, tex, alpha))

        # Cameras: arc along x, looking +z (optionally rotated, see spec).
        self.poses = []
        for i in range(spec.n_views):
            t = (i / max(spec.n_views - 1, 1) - 0.5) * spec.arc_scale
            c2w = np.eye(4)
            c2w[0, 3] = t
            c2w[1, 3] = 0.1 * np.sin(3 * t)
            if spec.look_at_z is not None:
                c = c2w[:3, 3]
                f = np.array([0.0, 0.0, spec.look_at_z]) - c
                # Degenerate look-at specs (camera at the target point, or
                # forward parallel to the +y up vector) would silently emit
                # NaN poses — fail loudly instead (ADVICE.md r2).
                fn = np.linalg.norm(f)
                assert fn > 1e-6, f"camera {i} sits at the look_at point"
                f = f / fn
                r = np.cross([0.0, 1.0, 0.0], f)
                rn = np.linalg.norm(r)
                assert rn > 1e-6, f"camera {i} forward is parallel to up"
                r = r / rn
                u = np.cross(f, r)
                c2w[:3, :3] = np.stack([r, u, f], axis=1)
            if spec.rot_wobble_deg:
                a = np.deg2rad(spec.rot_wobble_deg)
                # Seed-dependent phases: without them every seed shares the
                # exact same camera set, so a held-out-SCENE eval would test
                # pose prediction on cameras the network has memorized
                # (observed round 3: identical identity baselines across
                # seeds). Separate RandomState keeps textures byte-stable.
                # Fixed base phases + a small BOUNDED per-seed jitter:
                # identical cameras across seeds would let a constant-output
                # pose net ace the eval, while free-phase draws swung
                # per-seed relative rotations far outside the photometric
                # basin (round-3 seed sweeps).
                prng = np.random.RandomState(spec.seed + 1000)
                j1, j2 = prng.uniform(-0.15, 0.15, 2)
                yaw = a * np.sin(2.3 * i + 0.7 + j1)
                pitch = 0.6 * a * np.cos(1.7 * i + 0.3 + j2)
                cy, sy = np.cos(yaw), np.sin(yaw)
                cp, sp = np.cos(pitch), np.sin(pitch)
                ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
                rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
                c2w[:3, :3] = c2w[:3, :3] @ (ry @ rx)
            self.poses.append(c2w)
        self.poses = np.stack(self.poses).astype(np.float32)

        f = spec.focal_factor * w
        self.K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        self.images = np.stack([self._render(p) for p in self.poses])

        ids = np.arange(spec.n_views)
        i_test = ids[::llffhold]
        i_train = np.array([j for j in ids if j not in i_test])
        self.i_render = i_train if mode == "train" else i_test
        self.i_train = i_train
        self.depth_range = (depths[0] * 0.8, depths[-1] * 1.3)

    @staticmethod
    def _bilinear(tex, u, v):
        """Bilinear texture lookup (edge-clamped). Matching the photometric
        warp's bilinear grid_sample keeps cross-view photometric residuals
        at the interpolation-noise floor instead of nearest-neighbor
        aliasing (~0.12 L1 at GT poses on this texture scale)."""
        h, w = tex.shape[:2]
        u0 = np.clip(np.floor(u).astype(int), 0, w - 1)
        v0 = np.clip(np.floor(v).astype(int), 0, h - 1)
        u1 = np.minimum(u0 + 1, w - 1)
        v1 = np.minimum(v0 + 1, h - 1)
        fu = np.clip(u - u0, 0.0, 1.0)[..., None] if tex.ndim == 3 else np.clip(u - u0, 0.0, 1.0)
        fv = np.clip(v - v0, 0.0, 1.0)[..., None] if tex.ndim == 3 else np.clip(v - v0, 0.0, 1.0)
        return (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u1] * fu * (1 - fv)
            + tex[v1, u0] * (1 - fu) * fv
            + tex[v1, u1] * fu * fv
        )

    def _plane_half_extent(self, d):
        """Half extents (hx, hy) of the textured plane at depth d (see
        SyntheticSceneSpec.plane_span)."""
        if self.spec.plane_span == "legacy":
            return 2.0, 1.5
        # Cover the frustum: tan(half-FOV) = 0.5/focal_factor per axis
        # (square pixels; the y half-angle scales with h/w), plus the
        # camera-arc offset margin (arc up to ~1 unit + look_at swing).
        h, w = self.spec.image_size
        tx = 0.5 / self.spec.focal_factor
        ty = tx * (h / w)
        margin = 0.6 * self.spec.arc_scale + 0.5
        return tx * d * 1.35 + margin, ty * d * 1.35 + margin

    def _render(self, c2w):
        h, w = self.spec.image_size
        xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        Kinv = np.linalg.inv(self.K)
        dirs_cam = np.einsum(
            "ij,jhw->ihw", Kinv, np.stack([xs, ys, np.ones_like(xs)])
        )
        R, t = c2w[:3, :3], c2w[:3, 3]
        dirs = np.einsum("ij,jhw->ihw", R, dirs_cam)
        out = np.zeros((h, w, 3), np.float32)
        T = np.ones((h, w), np.float32)
        for d, tex, alpha in self.planes:
            # Intersect rays with plane z = d.
            s = (d - t[2]) / dirs[2]
            px = t[0] + s * dirs[0]
            py = t[1] + s * dirs[1]
            hx, hy = self._plane_half_extent(d)
            u = (px + hx) / (2 * hx) * (tex.shape[1] - 1)
            v = (py + hy) / (2 * hy) * (tex.shape[0] - 1)
            inside = (u >= 0) & (u < tex.shape[1]) & (v >= 0) & (v < tex.shape[0])
            a = self._bilinear(alpha, u, v) * inside
            if self.spec.binary_alpha:
                a = (a > 0.5).astype(np.float32)  # keep hits fully opaque
            c = self._bilinear(tex, u, v)
            out += (T * a)[..., None] * c
            T = T * (1 - a)
        return out

    def depth_map(self, view_idx: int) -> np.ndarray:
        """Expected camera-space depth (h, w) for an ABSOLUTE view index —
        alpha-weighted first-surface depth, Σ T·a·z + T_fin·z_last. With the
        near-binary plane alphas this is ≈ the first-hit depth; used by the
        photometric-loss diagnostics and depth-supervision tests."""
        c2w = self.poses[view_idx]
        h, w = self.spec.image_size
        xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        Kinv = np.linalg.inv(self.K)
        dirs_cam = np.einsum(
            "ij,jhw->ihw", Kinv, np.stack([xs, ys, np.ones_like(xs)])
        )
        R, t = c2w[:3, :3], c2w[:3, 3]
        dirs = np.einsum("ij,jhw->ihw", R, dirs_cam)
        depth = np.zeros((h, w), np.float32)
        T = np.ones((h, w), np.float32)
        s = None
        for d, tex, alpha in self.planes:
            s = (d - t[2]) / dirs[2]
            px = t[0] + s * dirs[0]
            py = t[1] + s * dirs[1]
            hx, hy = self._plane_half_extent(d)
            u = (px + hx) / (2 * hx) * (tex.shape[1] - 1)
            v = (py + hy) / (2 * hy) * (tex.shape[0] - 1)
            inside = (u >= 0) & (u < tex.shape[1]) & (v >= 0) & (v < tex.shape[0])
            a = self._bilinear(alpha, u, v) * inside
            if self.spec.binary_alpha:
                a = (a > 0.5).astype(np.float32)
            depth += T * a * s.astype(np.float32)
            T = T * (1 - a)
        depth += T * s.astype(np.float32)  # background plane fills the rest
        return depth

    def __len__(self):
        return len(self.i_render)

    def __getitem__(self, idx):
        h, w = self.spec.image_size
        idx = self.i_render[idx % len(self.i_render)]
        rgb = self.images[idx]
        pose = self.poses[idx]

        train_poses = self.poses[self.i_train]
        nearest = get_nearest_pose_ids(
            pose, train_poses, self.num_source_views,
            tar_id=int(np.where(self.i_train == idx)[0][0]) if idx in self.i_train else -1,
            angular_dist_method="dist",
        )
        K4 = np.eye(4, dtype=np.float32)
        K4[:3, :3] = self.K
        camera = pack_camera((h, w), K4, pose)
        src_rgbs = self.images[self.i_train][nearest]
        src_poses = train_poses[nearest]
        src_cameras = np.stack([pack_camera((h, w), K4, p) for p in src_poses])
        return make_example(
            rgb, camera, f"synthetic_{idx}", src_rgbs, src_cameras, self.depth_range,
            src_poses.copy(), pose[None].copy(),
            np.repeat(self.K[None], len(nearest), 0), self.K[None],
            self.i_train[nearest], 0, (h, w),
        )


def collate_batch(example: dict) -> dict:
    """Add the leading batch dim (batch_size 1, like the reference loader)."""
    def rec(v):
        if isinstance(v, dict):
            return {k: rec(x) for k, x in v.items()}
        if isinstance(v, np.ndarray):
            return v[None]
        return v

    return {k: rec(v) for k, v in example.items()}
