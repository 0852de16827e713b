"""Native host-runtime library tests (builds with g++ on first use)."""
import numpy as np
import pytest

from ggrt_official_tpu import native


class TestNativeBuild:
    def test_library_builds(self):
        lib = native.get_lib()
        assert lib is not None, "native build failed (g++ expected in env)"


class TestResize:
    def test_downsample_matches_box_average(self):
        # 2x downsample of a block-constant image must be exact.
        img = np.zeros((8, 8, 3), np.float32)
        img[:4, :4] = 1.0
        out = native.resize_bilinear_aa(img, (4, 4))
        assert out.shape == (4, 4, 3)
        np.testing.assert_allclose(out[:2, :2], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[2:, 2:], 0.0, atol=1e-6)

    def test_upsample_smooth(self):
        img = np.random.RandomState(0).rand(6, 6, 3).astype(np.float32)
        out = native.resize_bilinear_aa(img, (12, 12))
        assert out.shape == (12, 12, 3)
        assert abs(out.mean() - img.mean()) < 0.02

    def test_matches_loader_resize_quality(self):
        """Close (not bitwise) to the cv2 blur+resize the reference uses."""
        cv2 = pytest.importorskip("cv2")
        from ggrt_official_tpu.data.llff import downsample_gaussian_blur

        img = np.random.RandomState(1).rand(64, 96, 3).astype(np.float32)
        ours = native.resize_bilinear_aa(img, (16, 24))
        ref = cv2.resize(
            downsample_gaussian_blur(img, 16 / 64), (24, 16), interpolation=cv2.INTER_LINEAR
        )
        assert np.abs(ours - ref).mean() < 0.03


class TestPoseDistances:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        refs = np.tile(np.eye(4, dtype=np.float32), (20, 1, 1))
        refs[:, :3, 3] = rng.randn(20, 3)
        tar = np.eye(4, dtype=np.float32)
        tar[:3, 3] = [1.0, -2.0, 0.5]
        d = native.pose_distances(refs, tar)
        expected = np.linalg.norm(refs[:, :3, 3] - tar[:3, 3], axis=-1)
        np.testing.assert_allclose(d, expected, rtol=1e-5)


class TestPrefetchRing:
    def test_fifo_and_capacity(self):
        ring = native.PrefetchRing(capacity=2)
        assert ring.pop() is None
        assert ring.push(b"one")
        assert ring.push(b"two")
        assert not ring.push(b"three")  # full
        assert ring.pop() == b"one"
        assert ring.push(b"three")
        assert ring.pop() == b"two"
        assert ring.pop() == b"three"
        assert len(ring) == 0

    def test_threaded_producer(self):
        import threading

        ring = native.PrefetchRing(capacity=4)
        blobs = [bytes([i]) * 100 for i in range(20)]

        def produce():
            for b in blobs:
                while not ring.push(b):
                    pass

        t = threading.Thread(target=produce)
        t.start()
        got = []
        while len(got) < len(blobs):
            b = ring.pop()
            if b is not None:
                got.append(b)
        t.join()
        assert got == blobs
