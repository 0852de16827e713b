"""Orbax-backed CheckPointManager: retention, best-tracking, atomic save,
legacy-pickle fallback (ref checkpoint_manager.py:13-190 semantics)."""
import collections
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ggrt_official_tpu.training.checkpoint import CheckPointManager

TS = collections.namedtuple("TS", ["a", "b"])


def _state(scale=1.0):
    return TS(
        a={"w": jnp.arange(6.0).reshape(2, 3) * scale},
        b=(jnp.ones(4) * scale, jnp.asarray(3)),
    )


def _restore(template, payload):
    _, treedef = jax.tree_util.tree_flatten(template)
    leaves = [jnp.asarray(x) for x in jax.tree_util.tree_leaves(payload["state"])]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class TestOrbaxCheckpoints:
    def test_save_load_retention_best(self, tmp_path):
        d = str(tmp_path)
        m = CheckPointManager(d, max_to_keep=2)
        m.save(10, _state(1.0), score=1.0)
        m.save(20, _state(2.0), score=2.0)
        m.save(30, _state(3.0), score=0.5)

        kept = sorted(x for x in os.listdir(d) if x.startswith("ckpt"))
        assert kept == ["ckpt_00000020", "ckpt_00000030"]

        payload = m.load()
        assert payload["step"] == 30
        restored = _restore(_state(), payload)
        np.testing.assert_allclose(
            np.asarray(restored.a["w"]), np.arange(6).reshape(2, 3) * 3.0
        )

        best = m.load(os.path.join(d, "best"))
        assert best["step"] == 20
        # Orbax layout on disk (not pickle).
        assert os.path.isdir(os.path.join(d, "ckpt_00000030", "tree"))

    def test_resume_across_manager_instances(self, tmp_path):
        d = str(tmp_path)
        CheckPointManager(d).save(5, _state(5.0), score=1.0)
        payload = CheckPointManager(d).load()
        assert payload["step"] == 5

    def test_legacy_pickle_fallback(self, tmp_path):
        d = str(tmp_path / "old")
        os.makedirs(d)
        legacy = {
            "step": 7,
            "state": jax.tree_util.tree_map(np.asarray, _state(7.0)),
        }
        with open(os.path.join(d, "state.pkl"), "wb") as f:
            pickle.dump(legacy, f)
        payload = CheckPointManager(str(tmp_path)).load(d)
        assert payload["step"] == 7
        restored = _restore(_state(), payload)
        np.testing.assert_allclose(np.asarray(restored.b[0]), np.ones(4) * 7.0)
