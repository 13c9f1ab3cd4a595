"""Full SMPL-IK pose model: image -> volumetric 29-joint uvd + shape + twist
-> camera back-projection -> HybrIK -> mesh + joints.

Reference contract: phase3_direct/my_HybrIK/simple3dposeBaseSMPL.py:35-348
(``Simple3DPoseBaseSMPL``):
- backbone + deconv + 1x1 -> 29x64^3 volumetric softmax, soft-argmax with
  coords in [-0.5, 0.5] (:226-262 — note: NOT the x2/x2.5 rescale of
  Model_3D);
- global-pool shape/twist heads: fc1(1024) -> dropout -> fc2(1024) -> dropout
  (no activation between the fc layers — reference quirk, :272-275) ->
  decshape (10 betas, added to the h36m mean beta init, :277-278) and decphi
  (23 x [cos, sin], :279);
- ``uvd_to_cam`` (:146-184): heatmap uv -> bbox inverse-affine -> K^-1
  homogeneous ray x (z + root depth) -> root-relative xyz / depth_factor;
- flip-ensemble machinery ``flip_uvd_coord``/``flip_phi`` (:186-221);
- SMPL hybrik on pose_skeleton x2, outputs /2 (:308-319).

The flax module (:class:`PoseSMPLNet`) carries only network weights; the
SMPL buffers stay a plain pytree consumed by pure functions — jit-friendly
and shardable without module state.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.models import hybrik as ik
from pose3d_tpu.models.heads import DeconvHead
from pose3d_tpu.models.resnet import ResNet
from pose3d_tpu.models.smpl import SMPLModel
from pose3d_tpu.ops.heatmap import soft_argmax_3d

# left/right SMPL joint pairs (simple3dposeBaseSMPL.py:86-91)
JOINT_PAIRS_24 = ((1, 2), (4, 5), (7, 8), (10, 11), (13, 14), (16, 17),
                  (18, 19), (20, 21), (22, 23))
JOINT_PAIRS_29 = JOINT_PAIRS_24 + ((25, 26), (27, 28))


def _pair_permutation(pairs, n):
    perm = list(range(n))
    for a, b in pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return np.asarray(perm)


_PERM_29 = _pair_permutation(JOINT_PAIRS_29, 29)
_PERM_23 = _pair_permutation(tuple((a - 1, b - 1) for a, b in JOINT_PAIRS_24), 23)


class PoseSMPLNet(nn.Module):
    """Network half: image -> (uvd29, phis, shape)."""

    architecture: str = "resnet50"
    num_joints: int = 29
    depth: int = 64
    init_shape: tuple = tuple([0.0] * 10)  # h36m_mean_beta when available
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ResNet(self.architecture, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        logits = DeconvHead(
            out_channels=self.num_joints * self.depth, dtype=self.dtype,
            name="head",
        )(feats, train=train)
        b, h, w, _ = logits.shape
        logits = logits.transpose(0, 3, 1, 2).reshape(
            b, self.num_joints, self.depth, h, w
        )
        # soft-argmax in [-0.5, 0.5] (simple3dposeBaseSMPL.py:257-259)
        coords, _ = soft_argmax_3d(
            logits, self.num_joints, self.depth, h, w,
            z_scale=1.0, xy_scale=1.0, return_heatmap=False,
        )
        uvd = coords.reshape(b, self.num_joints, 3)

        # shape/twist heads on the pooled backbone features (:266-279)
        pooled = jnp.mean(feats, axis=(1, 2))
        xc = nn.Dense(1024, dtype=self.dtype, name="fc1")(pooled)
        xc = nn.Dropout(0.5, deterministic=not train)(xc)
        xc = nn.Dense(1024, dtype=self.dtype, name="fc2")(xc)
        xc = nn.Dropout(0.5, deterministic=not train)(xc)
        delta_shape = nn.Dense(10, dtype=self.dtype, name="decshape")(xc)
        pred_shape = delta_shape + jnp.asarray(self.init_shape, jnp.float32)
        phis = nn.Dense(23 * 2, dtype=self.dtype, name="decphi")(xc)
        return {
            "uvd29": uvd.astype(jnp.float32),
            "phis": phis.reshape(b, 23, 2).astype(jnp.float32),
            "delta_shape": delta_shape.astype(jnp.float32),
            "pred_shape": pred_shape.astype(jnp.float32),
        }


def uvd_to_cam(uvd_jts, trans_inv, intrinsic_param, joint_root, depth_factor,
               heatmap_size: int = 64, return_relative: bool = True):
    """Back-project heatmap uvd to camera xyz (simple3dposeBaseSMPL.py:146-184).

    uvd_jts: (B,K,3) in [-0.5,0.5]; trans_inv: (B,2,3) inverse bbox affine;
    intrinsic_param: (B,3,3) inverse camera matrix; joint_root: (B,3) root in
    camera mm; depth_factor: (B,1) (typically bbox depth 2.2m in mm).
    """
    u = (uvd_jts[..., 0] + 0.5) * heatmap_size * 4  # input-pixel space
    v = (uvd_jts[..., 1] + 0.5) * heatmap_size * 4
    dz = uvd_jts[..., 2] * depth_factor  # (B,K)
    ones = jnp.ones_like(u)
    uv_homo = jnp.stack([u, v, ones], axis=-1)  # (B,K,3)
    uv = jnp.einsum("brc,bkc->bkr", trans_inv, uv_homo)  # (B,K,2)
    cam_homo = jnp.concatenate([uv, ones[..., None]], axis=-1)
    xyz = jnp.einsum("brc,bkc->bkr", intrinsic_param, cam_homo)
    abs_z = dz + joint_root[:, 2:3]
    xyz = xyz * abs_z[..., None]
    if return_relative:
        xyz = xyz - joint_root[:, None, :]
    return xyz / depth_factor[..., None]


def flip_uvd_coord(uvd, shift: bool = True, heatmap_size: int = 64):
    """Horizontal flip in heatmap-uvd space (simple3dposeBaseSMPL.py:186-210)."""
    x = -uvd[..., :1] if shift else (-1.0 / heatmap_size) - uvd[..., :1]
    flipped = jnp.concatenate([x, uvd[..., 1:]], axis=-1)
    return jnp.take(flipped, jnp.asarray(_PERM_29), axis=-2)


def flip_phi(phis):
    """Flip twists: negate sin, swap left/right pairs (:212-221)."""
    flipped = phis * jnp.asarray([1.0, -1.0])
    return jnp.take(flipped, jnp.asarray(_PERM_23), axis=-2)


@dataclasses.dataclass
class HybrIKPose:
    """Network + SMPL assembly (the full Simple3DPoseBaseSMPL surface)."""

    net: PoseSMPLNet
    smpl: SMPLModel

    def init(self, rng, x, train: bool = True):
        import jax

        return self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 7)}, x,
            train=train,
        )

    def apply(self, variables, x, trans_inv, intrinsic_param, joint_root,
              depth_factor, *, train: bool = False, rngs=None,
              flip_test: bool = False, mutable=False):
        """Full forward. With ``flip_test`` the network also runs on the
        horizontally flipped image and uvd/phi/shape are averaged — the
        reference's flip-ensemble (:281-306) expressed as one batched pass.
        Returns the reference's ModelOutput fields as a dict.
        """
        def run(img):
            out = self.net.apply(variables, img, train=train, rngs=rngs,
                                 mutable=mutable)
            return out

        new_vars = None
        out = run(x)
        if mutable:
            out, new_vars = out
        if flip_test:
            out_f = self.net.apply(variables, x[:, :, ::-1, :], train=train,
                                   rngs=rngs)
            uvd_f = flip_uvd_coord(out_f["uvd29"], shift=True)
            phi_f = flip_phi(out_f["phis"])
            out = {
                "uvd29": (out["uvd29"] + uvd_f) / 2,
                "phis": (out["phis"] + phi_f) / 2,
                "pred_shape": (out["pred_shape"] + out_f["pred_shape"]) / 2,
                "delta_shape": out["delta_shape"],
            }

        xyz29 = uvd_to_cam(out["uvd29"], trans_inv, intrinsic_param,
                           joint_root, depth_factor,
                           heatmap_size=self.net.depth)
        xyz29 = xyz29 - xyz29[:, :1]

        verts, joints24, rot_mats, j17 = ik.hybrik(
            self.smpl, out["pred_shape"], xyz29 * 2.0, out["phis"],
            train=train,
        )
        verts, joints24, j17 = ik.root_centre_outputs(verts, joints24, j17)
        from pose3d_tpu.models.smpl import rotmat_to_quat

        b = x.shape[0]
        result = {
            "pred_uvd_jts": out["uvd29"].reshape(b, -1),
            "pred_phi": out["phis"],
            "pred_shape": out["pred_shape"],
            "pred_delta_shape": out["delta_shape"],
            "pred_xyz_jts_24": xyz29[:, :24].reshape(b, 72),
            "pred_xyz_jts_24_struct": (joints24 / 2).reshape(b, 72),
            "pred_xyz_jts_17": (j17 / 2).reshape(b, 51),
            "pred_vertices": verts,
            "pred_theta_quats": rotmat_to_quat(rot_mats).reshape(b, 24 * 4),
        }
        return (result, new_vars) if mutable else result
