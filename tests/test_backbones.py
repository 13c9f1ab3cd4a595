"""ResNet backbone + pose heads: shapes, BN collections, weight import."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models.heads import PoseNet2D, PoseNet3D, ProjectionMLP
from pose3d_tpu.models.resnet import ResNet, load_torch_resnet


def _init(model, x):
    return model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )


class TestResNet:
    @pytest.mark.parametrize("arch,channels", [("resnet18", 512), ("resnet50", 2048)])
    def test_feature_shape(self, arch, channels):
        model = ResNet(arch)
        x = jnp.zeros((1, 64, 64, 3))
        variables = _init(model, x)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 2, 2, channels)  # stride 32

    def test_resnet50_param_count(self):
        """ResNet-50 backbone (no fc): 23,508,032 params in torch."""
        variables = _init(ResNet("resnet50"), jnp.zeros((1, 32, 32, 3)))
        n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n == 23_508_032

    def test_batch_stats_present(self):
        variables = _init(ResNet("resnet18"), jnp.zeros((1, 32, 32, 3)))
        assert "batch_stats" in variables

    def test_torch_state_dict_import(self):
        """Round-trip: fabricate a torch-format state dict with the right
        shapes, import it, check values landed in the mapped leaves."""
        model = ResNet("resnet50")
        variables = _init(model, jnp.zeros((1, 32, 32, 3)))
        params, stats = variables["params"], variables["batch_stats"]

        rng = np.random.default_rng(0)
        sd = {
            "conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
            "bn1.weight": rng.standard_normal(64).astype(np.float32),
            "bn1.running_mean": rng.standard_normal(64).astype(np.float32),
            # torch Bottleneck block 0 of layer1 incl. downsample
            "layer1.0.conv1.weight": rng.standard_normal((64, 64, 1, 1)).astype(np.float32),
            "layer1.0.bn1.weight": rng.standard_normal(64).astype(np.float32),
            "layer1.0.conv3.weight": rng.standard_normal((256, 64, 1, 1)).astype(np.float32),
            "layer1.0.downsample.0.weight": rng.standard_normal((256, 64, 1, 1)).astype(np.float32),
            "layer1.0.downsample.1.weight": rng.standard_normal(256).astype(np.float32),
            "layer1.0.downsample.1.running_var": np.abs(rng.standard_normal(256)).astype(np.float32),
            "fc.weight": rng.standard_normal((1000, 2048)).astype(np.float32),  # ignored
        }
        new_params, new_stats, n = load_torch_resnet(params, stats, sd)
        assert n == 9  # everything except fc.weight
        np.testing.assert_allclose(
            np.asarray(new_params["stem_conv"]["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_params["stage1_block0"]["Conv_3"]["kernel"]),
            np.transpose(sd["layer1.0.downsample.0.weight"], (2, 3, 1, 0)),
            atol=1e-6,
        )
        # main-path conv3 went to Conv_2, not clobbered by the downsample
        np.testing.assert_allclose(
            np.asarray(new_params["stage1_block0"]["Conv_2"]["kernel"]),
            np.transpose(sd["layer1.0.conv3.weight"], (2, 3, 1, 0)), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_stats["stage1_block0"]["BatchNorm_3"]["var"]),
            sd["layer1.0.downsample.1.running_var"], atol=1e-6,
        )


class TestPoseNets:
    def test_posenet3d_shapes(self):
        model = PoseNet3D(architecture="resnet18", depth=8)
        x = jnp.zeros((2, 64, 64, 3))
        variables = _init(model, x)
        coords, hm = model.apply(variables, x, train=False)
        assert coords.shape == (2, 51)
        assert hm.shape == (2, 17, 8, 2 * 8, 2 * 8)  # deconv: 2 -> 16

    def test_posenet3d_256_input_geometry(self):
        """256^2 input -> 8^2 features -> 64^2 maps, the reference geometry.
        Uses resnet18 for test speed; geometry is architecture-independent."""
        model = PoseNet3D(architecture="resnet18", depth=64)
        x = jnp.zeros((1, 256, 256, 3))
        variables = _init(model, x)
        coords, hm = model.apply(variables, x, train=False)
        assert coords.shape == (1, 51)
        assert hm.shape == (1, 17, 64, 64, 64)

    def test_posenet2d_shapes(self):
        model = PoseNet2D(architecture="resnet18")
        x = jnp.zeros((2, 64, 64, 3))
        variables = _init(model, x)
        coords = model.apply(variables, x, train=False)
        assert coords.shape == (2, 34)
        assert float(coords.min()) >= 0.0 and float(coords.max()) <= 1.0

    def test_posenet3d_grad_flows(self):
        model = PoseNet3D(architecture="resnet18", depth=8, return_heatmap=False)
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(
            {"params": jax.random.key(0)}, x, train=True,
        )

        def loss_fn(params):
            coords, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.mean(jnp.square(coords))

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
        )
        assert gnorm > 0

    def test_projection_mlp(self):
        model = ProjectionMLP()
        x = jnp.zeros((4, 17, 3))
        variables = _init(model, x)
        out = model.apply(variables, x, train=False)
        assert out.shape == (4, 34)
