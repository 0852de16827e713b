"""Checkpoint-conversion machinery tests: torch layouts -> flax layouts."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class TestTensorConversions:
    def test_linear(self):
        """torch Linear and flax Dense must agree after conversion."""
        import flax.linen as nn

        from ggrt_official_tpu.training.convert import linear_to_dense

        lin = torch.nn.Linear(5, 3)
        x = np.random.RandomState(0).randn(2, 5).astype(np.float32)
        with torch.no_grad():
            expected = lin(torch.from_numpy(x)).numpy()

        dense = nn.Dense(3)
        params = {
            "params": {
                "kernel": jnp.asarray(linear_to_dense(lin.weight.detach().numpy())),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            }
        }
        got = dense.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_conv(self):
        import flax.linen as nn

        from ggrt_official_tpu.training.convert import conv_to_flax

        conv = torch.nn.Conv2d(4, 6, 3, padding=1)
        x = np.random.RandomState(1).randn(2, 4, 8, 8).astype(np.float32)
        with torch.no_grad():
            expected = conv(torch.from_numpy(x)).numpy()  # NCHW

        fconv = nn.Conv(6, (3, 3))
        params = {
            "params": {
                "kernel": jnp.asarray(conv_to_flax(conv.weight.detach().numpy())),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            }
        }
        got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got.transpose(0, 3, 1, 2)), expected, atol=1e-4
        )

    def test_conv_transpose(self):
        import flax.linen as nn

        from ggrt_official_tpu.training.convert import conv_transpose_to_flax

        convt = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
        x = np.random.RandomState(2).randn(1, 4, 5, 5).astype(np.float32)
        with torch.no_grad():
            expected = convt(torch.from_numpy(x)).numpy()

        fconvt = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
        params = {
            "params": {
                "kernel": jnp.asarray(conv_transpose_to_flax(convt.weight.detach().numpy())),
                "bias": jnp.asarray(convt.bias.detach().numpy()),
            }
        }
        got = fconvt.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got.transpose(0, 3, 1, 2)), expected, atol=1e-4
        )


class TestNameMap:
    def test_apply_and_merge(self):
        from ggrt_official_tpu.training.convert import (
            apply_name_map, assert_tree_shapes_match, merge_params,
        )

        state_dict = {
            "net.fc.weight": np.zeros((3, 5), np.float32),
            "net.fc.bias": np.zeros((3,), np.float32),
        }
        name_map = [
            ("net.fc.weight", ("fc", "kernel"), "dense"),
            ("net.fc.bias", ("fc", "bias"), "bias"),
        ]
        converted = apply_name_map(state_dict, name_map)
        assert converted["fc"]["kernel"].shape == (5, 3)

        template = {"fc": {"kernel": np.ones((5, 3)), "bias": np.ones(3)},
                    "other": {"kernel": np.ones((2, 2))}}
        assert_tree_shapes_match(converted, template)
        merged = merge_params(template, converted)
        np.testing.assert_allclose(merged["fc"]["kernel"], 0.0)
        np.testing.assert_allclose(merged["other"]["kernel"], 1.0)  # untouched
