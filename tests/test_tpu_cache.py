"""Tests for the tunnel-safe persistent-cache purge (utils/tpu_cache.py).

Round-5 measured failure: cache-hit loads of >100 MB serialized
executables wedge the axon tunnel (BENCH_NOTES round-5 infra); every TPU
entry point purges oversize entries before its first dispatch.
"""
import os

from ggrt_official_tpu.utils.tpu_cache import purge_oversize_entries


def test_purges_only_oversize_entries(tmp_path):
    small = tmp_path / "small-cache"
    big = tmp_path / "big-cache"
    small.write_bytes(b"x" * 1024)
    big.write_bytes(b"x" * (2 * 1024 * 1024))
    purged = purge_oversize_entries(str(tmp_path), limit_bytes=1024 * 1024,
                                    verbose=False)
    assert purged == ["big-cache"]
    assert small.exists() and not big.exists()


def test_missing_dir_is_noop():
    assert purge_oversize_entries("/nonexistent/dir/xyz", verbose=False) == []


def test_entry_points_are_wired():
    """Every TPU-touching tool must purge before first dispatch."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("bench.py", "tools/run_flagship.py", "tools/shape_gate.py",
                "tools/diag_tile_shape.py", "tools/diag_production.py",
                "tools/pose_sweep.py"):
        src = open(os.path.join(root, rel)).read()
        assert "purge_oversize_entries" in src, rel
