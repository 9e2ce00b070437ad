"""Pallas kernel tests (interpret mode on CPU): fused LBS vs the XLA
smpl_forward reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.models import SMPLModel, rodrigues, smpl_forward
from smpltpu.ops.lbs import joint_affines, lbs_pallas, prepare_lbs_operands


def test_lbs_pallas_matches_forward(small_model_dict, rng):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    ops = prepare_lbs_operands(model)
    b = 3
    shapes = jnp.asarray(rng.normal(size=(b, 10)) * 0.4, jnp.float32)
    aa = jnp.asarray(rng.normal(size=(b, 24, 3)) * 0.3, jnp.float32)
    rots = rodrigues(aa)
    pos = jnp.asarray(rng.normal(size=(b, 3)) + np.array([0, 0, 3.0]), jnp.float32)

    g, joints = jax.vmap(lambda w, r, p: joint_affines(model, w, r, p))(
        shapes, rots, pos)
    verts_k = lbs_pallas(shapes, g, ops, tile=128, interpret=True)

    ref = jax.vmap(lambda w, r, p: smpl_forward(model, w, r, p)["verts"])(
        shapes, rots, pos)
    got = np.transpose(np.asarray(verts_k)[:, :, :model.num_verts], (0, 2, 1))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4)
    # joints from joint_affines must match the forward too
    ref_j = jax.vmap(lambda w, r, p: smpl_forward(
        model, w, r, p, want_verts=False)["joints"])(shapes, rots, pos)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(ref_j), atol=1e-5)


def test_lbs_pallas_padding_zeroed(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    ops = prepare_lbs_operands(model)
    assert ops["n_pad"] % 128 == 0
    # padded weight columns are zero -> padded outputs = pure translation blend 0
    w = np.asarray(ops["weights_t"])
    assert np.all(w[:, model.num_verts:] == 0.0)
