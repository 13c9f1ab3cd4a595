"""Volumetric-heatmap pose heads: deconv stack + soft-argmax decode.

Reference contracts:
- deconv head (phase3_direct/my_HybrIK/Model.py:66-88): 3x
  ConvTranspose2d(kernel 4, stride 2, pad 1, no bias) 2048->256->256->256,
  each followed by BN + ReLU — upsamples the stride-32 8x8 feature map to
  64x64 — then a 1x1 conv to num_joints*depth channels (Model.py:45-46).
- ``PoseNet3D`` <- ``Model_3D`` (Model.py:12-191): ResNet-50 backbone ->
  deconv -> 64^3 volumetric softmax -> soft-argmax; returns the (B, 17*3)
  coordinate vector and the (B,17,64,64,64) normalized heatmap. z_scale is
  2.5 in phase3 (Model.py:177) and 2.0 in the phase4 variant
  (phase4_joined/Model.py:126-128) — a config knob here. The reference's
  dead camera-embedding MLP (Model.py:50-64,185-189) is commented-out code
  and not reproduced.
- ``PoseNet2D`` <- ``Model_2D`` (phase5_loop/Model_2d.py:13-138):
  depth_dim=1, 2D soft-argmax, coords in [0,1], output (B, 17*2).

TPU-first: NHWC throughout; ConvTranspose stride-2 SAME padding doubles the
spatial dims exactly like torch's (4,2,1) deconv; the softmax/soft-argmax
decode is one fused XLA computation (pose3d_tpu.ops.heatmap).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from pose3d_tpu.models.norm import BatchNorm
import jax.numpy as jnp

from pose3d_tpu.models.resnet import ResNet, _bn
from pose3d_tpu.ops.heatmap import soft_argmax_2d, soft_argmax_3d


class DeconvHead(nn.Module):
    """3x (ConvTranspose k4 s2 + BN + ReLU) + 1x1 projection."""

    filters: Sequence[int] = (256, 256, 256)
    out_channels: int = 17 * 64
    dropout: float = 0.0  # the reference's _make_deconv_layer_with_dropout variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, decode=None):
        for f in self.filters:
            x = nn.ConvTranspose(f, (4, 4), (2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
            x = nn.relu(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        conv = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)
        if decode is None:
            return conv(x)
        # fused epilogue: the decode consumes the trunk features plus the
        # conv's own weights so the (B,H,W,out_channels) logits never exist
        # in HBM (ops/pallas_conv_decode). A 1-pixel call binds the params
        # under the unchanged "Conv_0" name — checkpoints and torch
        # transplants are layout-identical to the unfused head.
        _ = conv(x[:1, :1, :1])
        params = self.variables["params"]["Conv_0"]
        kernel = params["kernel"][0, 0].astype(self.dtype)
        bias = params["bias"].astype(self.dtype)
        return decode(x, kernel, bias)


class PoseNet3D(nn.Module):
    """Direct image->3D regression (reference ``Model_3D``).

    (B, 256, 256, 3) NHWC float in [0,1] -> ((B, J*3) coords, (B,J,D,H,W)
    softmax heatmap). x,y in [-1,1]; z in [-z_scale, z_scale]/... per the
    reference rescale.
    """

    architecture: str = "resnet50"
    num_joints: int = 17
    depth: int = 64
    z_scale: float = 2.5
    return_heatmap: bool = True
    use_pallas: bool = True  # fused decode kernel on TPU (coords-only path)
    # also take the Pallas decode (fused fwd+bwd) in TRAINING; see
    # ROUND2_NOTES "decode" for the measured XLA-vs-kernel train-step
    # numbers behind the default
    use_pallas_train: bool = False
    # fuse the final 1x1 conv INTO the decode (ops/pallas_conv_decode):
    # the (B,H,W,J*D) logits never exist in HBM in either direction —
    # forward and backward both read the trunk features exactly once.
    # Applies to both train and eval (coords-only path). On-chip ladder
    # (round 5, identical-executable estimator): the fused epilogue wins
    # the full train step by a consistent ~1.1% (49.2 vs 49.8 ms at B=64;
    # the step is conv-bound, so the 13.5->4.8 ms epilogue win is diluted).
    # Opt-in because it is TPU-only; like every pallas_call it is NOT
    # partitionable by GSPMD — use it single-chip or inside a shard_map DP
    # step (train.image_steps.make_dp_direct_train_step), not under a
    # jit-with-shardings mesh.
    fuse_final_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        import jax

        feats = ResNet(self.architecture, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        head = DeconvHead(
            out_channels=self.num_joints * self.depth, dtype=self.dtype,
            name="head",
        )
        if self.fuse_final_conv and not self.return_heatmap:
            from pose3d_tpu.ops.pallas_conv_decode import (
                conv_soft_argmax_3d_fused,
            )

            def decode(trunk, kernel, bias):
                return conv_soft_argmax_3d_fused(
                    trunk, kernel, bias, self.num_joints, self.depth,
                    z_scale=self.z_scale,
                )

            coords = head(feats, train=train, decode=decode)
            return coords, None
        logits = head(feats, train=train)
        b, h, w, _ = logits.shape
        if not self.return_heatmap:
            if (self.use_pallas and (not train or self.use_pallas_train)
                    and jax.default_backend() == "tpu"):
                # fused transpose-free decode straight off the NHWC conv
                # output: single VMEM pass forward, fused Pallas backward
                # (used in training only under use_pallas_train)
                from pose3d_tpu.ops.pallas_softargmax import (
                    soft_argmax_3d_nhwc_pallas,
                )

                coords = soft_argmax_3d_nhwc_pallas(
                    logits, self.num_joints, self.depth,
                    z_scale=self.z_scale,
                )
                return coords, None
            # training path: decode straight from NHWC (no 1GB-scale layout
            # transpose in forward/backward; XLA fuses it into the step)
            from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc

            coords = soft_argmax_3d_nhwc(
                logits, self.num_joints, self.depth, z_scale=self.z_scale,
            )
            return coords, None
        # heatmap requested: produce the reference's (B,J,D,H,W) volume
        logits = logits.transpose(0, 3, 1, 2).reshape(
            b, self.num_joints, self.depth, h, w
        )
        coords, heatmap = soft_argmax_3d(
            logits, self.num_joints, self.depth, h, w,
            z_scale=self.z_scale, return_heatmap=True,
        )
        return coords, heatmap


class PoseNet2D(nn.Module):
    """Image->2D keypoints (reference ``Model_2D``): (B,256,256,3) ->
    (B, J*2) coords in [0,1]."""

    architecture: str = "resnet50"
    num_joints: int = 17
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ResNet(self.architecture, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        logits = DeconvHead(
            out_channels=self.num_joints, dtype=self.dtype, name="head"
        )(feats, train=train)
        b, h, w, _ = logits.shape
        logits = logits.transpose(0, 3, 1, 2)
        return soft_argmax_2d(logits, self.num_joints, h, w)


class ProjectionMLP(nn.Module):
    """3D->2D learned projection (reference ``Projection``,
    Model_2d.py:140-170): Flatten -> [Dense BN Tanh Dropout(.3)] x3
    (512/256/128) -> Dense(out). Superseded in the reference trainers by the
    ViT projector but kept for API parity."""

    in_dim: int = 51
    out_dim: int = 34
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = x.reshape(x.shape[0], -1).astype(self.dtype)
        for width in (512, 256, 128):
            y = nn.Dense(width, dtype=self.dtype)(y)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
            y = nn.tanh(y)
            y = nn.Dropout(0.3, deterministic=not train)(y)
        y = nn.Dense(self.out_dim, dtype=self.dtype)(y)
        return y.astype(jnp.promote_types(self.dtype, jnp.float32))
