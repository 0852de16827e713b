"""Pretrained-weight conversion + merge path (training/pretrained.py).

Uses the torchvision-compatible stub resnet as the weight source — the
identical code path real imagenet/dino checkpoints take."""
import numpy as np

from tests import reference_stubs

reference_stubs.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ggrt_official_tpu.models import backbone as fx_backbone  # noqa: E402
from ggrt_official_tpu.training import pretrained  # noqa: E402


class TestBackboneConversion:
    def test_trunk_weights_load_and_change_forward(self, tmp_path):
        torch.manual_seed(0)
        tm = reference_stubs.resnet50()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        converted = pretrained.convert_torchvision_resnet_for_backbone(
            sd, "resnet50", num_layers=3
        )
        path = str(tmp_path / "resnet50.npz")
        pretrained.save_pretrained_npz(path, converted)

        fm = fx_backbone.BackboneResnet(model="resnet50", num_layers=3, d_out=16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 8, 12, 3), jnp.float32)
        variables = fm.init(jax.random.PRNGKey(0), x)
        before = fm.apply(variables, x)

        params, loaded = pretrained.maybe_load_backbone(
            {"backbone": variables["params"]}, path, ("backbone",)
        )
        assert loaded
        after = fm.apply({"params": params["backbone"]}, x)
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # Converted conv1 actually landed.
        np.testing.assert_allclose(
            np.asarray(params["backbone"]["trunk"]["conv1"]["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
        )

    def test_ipo_conv1_replication(self):
        torch.manual_seed(1)
        tm = reference_stubs.resnet18()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        converted = pretrained.convert_imagenet_resnet_for_ipo(sd, num_input_images=2)
        k = converted["conv1"]["kernel"]
        assert k.shape == (7, 7, 6, 64)
        np.testing.assert_allclose(k[..., :3, :], k[..., 3:, :])
        np.testing.assert_allclose(
            k[..., :3, :] * 2, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
            rtol=1e-6,
        )

    def test_missing_file_is_graceful(self):
        params = {"backbone": {"x": np.zeros(2)}}
        out, loaded = pretrained.maybe_load_backbone(params, "/nonexistent.npz", ("backbone",))
        assert not loaded and out is params
