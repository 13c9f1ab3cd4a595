"""Numerical parity of the SMPL/LBS/HybrIK stack vs the ACTUAL reference
``lbs.py`` (phase3_direct/my_HybrIK/lbs.py), on a shared synthetic body.

Both sides consume the same buffers (synthetic_model with the reference's
hardcoded leaf vertex ids — lbs.py:352 requires vertex indices up to 6617, so
the body has 6890 vertices like real SMPL). This proves the level-batched
JAX redesign (models/smpl.py, models/hybrik.py) computes the same function as
the reference's per-joint python recursion:

- ``lbs``                         (lbs.py:195-288)  FK: verts/joints/rots/h36m
- ``hybrik`` eval path            (lbs.py:291-399 -> 551-756) SVD pelvis,
                                  global-position IK with the 15mm clamp
- ``hybrik`` train path           (lbs.py:759-934) naive pelvis + local IK
- ``joints2bones``/``bones2joints`` (lbs.py:143-192)
- ``batch_rodrigues``             (lbs.py:446-477)
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from pose3d_tpu.models import hybrik as jhybrik  # noqa: E402
from pose3d_tpu.models import smpl as jsmpl  # noqa: E402

PHASE3 = pathlib.Path("/root/reference/phase3_direct/my_HybrIK")

pytestmark = pytest.mark.skipif(
    not PHASE3.exists(), reason="reference checkout not present"
)


def ref_lbs():
    p = str(PHASE3)
    if p not in sys.path:
        sys.path.append(p)
    import lbs as mod  # noqa

    sys.path.remove(p)
    return mod


@pytest.fixture(scope="module")
def body():
    """Synthetic SMPL-like body with the reference's hardcoded leaf vertex
    ids (lbs.py:352) — needs >= 6618 vertices."""
    m = jsmpl.synthetic_model(n_vertices=6890, seed=0)
    return dataclasses.replace(m, leaf_vertex_ids=(411, 2445, 5905, 3216, 6617))


def torch_buffers(m):
    return dict(
        v_template=torch.from_numpy(np.asarray(m.v_template)),
        shapedirs=torch.from_numpy(np.asarray(m.shapedirs)),
        posedirs=torch.from_numpy(np.asarray(m.posedirs)),
        J_regressor=torch.from_numpy(np.asarray(m.j_regressor)),
        J_regressor_h36m=torch.from_numpy(np.asarray(m.j_regressor_h36m)),
        parents=torch.from_numpy(np.asarray(m.parents)).long(),
        children=torch.from_numpy(np.asarray(m.children)).long(),
        lbs_weights=torch.from_numpy(np.asarray(m.lbs_weights)),
    )


B = 3


def rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


def test_lbs_fk_parity(body):
    mod = ref_lbs()
    bufs = torch_buffers(body)
    betas = rand((B, 10), 10, 0.5)
    pose = rand((B, 72), 11, 0.3)

    verts_t, joints_t, rots_t, h36m_t = mod.lbs(
        torch.from_numpy(betas), torch.from_numpy(pose),
        bufs["v_template"], bufs["shapedirs"], bufs["posedirs"],
        bufs["J_regressor"], bufs["J_regressor_h36m"], bufs["parents"],
        bufs["lbs_weights"], pose2rot=True,
    )
    verts, joints, rots, h36m = jsmpl.lbs(body, betas, pose, pose2rot=True)

    np.testing.assert_allclose(np.asarray(rots), rots_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), joints_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts), verts_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h36m), h36m_t.numpy(), atol=1e-5)


def _posed_skeleton_29(mod, body, bufs, betas, pose):
    """A plausible 29-joint IK target: FK the random pose with the reference
    and read off joints + leaf vertices."""
    with torch.no_grad():
        verts_t, joints_t, _, _ = mod.lbs(
            torch.from_numpy(betas), torch.from_numpy(pose),
            bufs["v_template"], bufs["shapedirs"], bufs["posedirs"],
            bufs["J_regressor"], bufs["J_regressor_h36m"], bufs["parents"],
            bufs["lbs_weights"], pose2rot=True,
        )
    leaf = verts_t[:, list(body.leaf_vertex_ids)]
    return torch.cat([joints_t, leaf], dim=1).numpy()  # (B,29,3)


@pytest.mark.parametrize("train", [False, True], ids=["eval_svd", "train_naive"])
def test_hybrik_ik_parity(body, train):
    mod = ref_lbs()
    bufs = torch_buffers(body)
    betas = rand((B, 10), 20, 0.5)
    pose = rand((B, 72), 21, 0.4)
    skel = _posed_skeleton_29(mod, body, bufs, betas, pose)
    # perturb so the eval-path 15mm outlier clamp actually fires somewhere
    skel = skel + rand(skel.shape, 22, 0.01)
    phis = rand((B, 23, 2), 23, 1.0)

    with torch.no_grad():
        verts_t, joints_t, rots_t, h36m_t = mod.hybrik(
            torch.from_numpy(betas), None, torch.from_numpy(skel),
            torch.from_numpy(phis),
            bufs["v_template"], bufs["shapedirs"], bufs["posedirs"],
            bufs["J_regressor"], bufs["J_regressor_h36m"], bufs["parents"],
            bufs["children"], bufs["lbs_weights"], train=train,
        )

    verts, joints, rots, h36m = jhybrik.hybrik(
        body, betas, jnp.asarray(skel), jnp.asarray(phis), train=train
    )

    np.testing.assert_allclose(np.asarray(rots), rots_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(joints), joints_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(verts), verts_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h36m), h36m_t.numpy(), atol=2e-4)


def test_ik_clamp_fires_in_eval_path(body):
    """Sanity: with the 1cm perturbation the eval/train IK paths diverge,
    i.e. the parity above isn't vacuous (clamp + SVD pelvis really differ)."""
    mod = ref_lbs()
    bufs = torch_buffers(body)
    betas = rand((B, 10), 20, 0.5)
    pose = rand((B, 72), 21, 0.4)
    skel = _posed_skeleton_29(mod, body, bufs, betas, pose) + rand(
        (B, 29, 3), 22, 0.01
    )
    phis = rand((B, 23, 2), 23, 1.0)
    r_eval = jhybrik.hybrik(body, betas, jnp.asarray(skel), jnp.asarray(phis),
                            train=False)[2]
    r_train = jhybrik.hybrik(body, betas, jnp.asarray(skel), jnp.asarray(phis),
                             train=True)[2]
    assert not np.allclose(np.asarray(r_eval), np.asarray(r_train), atol=1e-3)


def test_joints2bones_roundtrip_parity(body):
    mod = ref_lbs()
    parents24 = torch.from_numpy(np.asarray(body.parents[:24])).long()
    joints = rand((B, 24, 3), 30)
    dirs_t, lens_t = mod.joints2bones(torch.from_numpy(joints), parents24)
    dirs, lens = jsmpl.joints2bones(jnp.asarray(joints))
    np.testing.assert_allclose(np.asarray(dirs), dirs_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lens), lens_t.numpy(), atol=1e-5)

    out = jsmpl.bones2joints(dirs, lens)
    np.testing.assert_allclose(np.asarray(out), joints, atol=1e-5)


def test_batch_rodrigues_parity():
    mod = ref_lbs()
    vecs = rand((B * 24, 3), 40, 0.8)
    r_t = mod.batch_rodrigues(torch.from_numpy(vecs)).numpy()
    r = jsmpl.batch_rodrigues(jnp.asarray(vecs))
    np.testing.assert_allclose(np.asarray(r), r_t, atol=1e-5)
