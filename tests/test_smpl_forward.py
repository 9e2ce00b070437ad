"""Unit tests for the JAX SMPL forward pass against an independent numpy
oracle (naive per-joint FK + per-vertex LBS loops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.models import SMPLModel, rodrigues, smpl_forward


def numpy_rodrigues(aa):
    theta = np.linalg.norm(aa)
    if theta < 1e-14:
        return np.eye(3)
    k = aa / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def numpy_smpl_forward(model_dict, shape, rotations, root_pos):
    """Naive oracle: loops, no vectorization."""
    v = model_dict["v_template"] + model_dict["shapedirs"] @ shape
    joints_rest = model_dict["J_regressor"] @ v
    parents = model_dict["parents"]
    n_j = len(parents)
    g = [None] * n_j
    x = [None] * n_j
    g[0] = rotations[0]
    x[0] = np.zeros(3)
    for j in range(1, n_j):
        p = parents[j]
        g[j] = g[p] @ rotations[j]
        x[j] = g[p] @ (joints_rest[j] - joints_rest[p]) + x[p]
    joints_world = np.stack(x) + root_pos
    n_v = v.shape[0]
    verts = np.zeros((n_v, 3))
    for vi in range(n_v):
        acc = np.zeros(3)
        for j in range(n_j):
            w = model_dict["weights"][vi, j]
            if w == 0.0:
                continue
            acc += w * (g[j] @ (v[vi] - joints_rest[j]) + x[j])
        verts[vi] = acc + root_pos
    return joints_world, verts


def test_rodrigues_matches_numpy(rng):
    aa = rng.normal(size=(20, 3))
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    for i in range(20):
        np.testing.assert_allclose(got[i], numpy_rodrigues(aa[i]), atol=1e-6)


def test_rodrigues_small_angle_smooth():
    # smooth and correct through zero (needed for autodiff at theta=0)
    aa = jnp.array([1e-9, -2e-9, 3e-10], dtype=jnp.float64)
    r = rodrigues(aa)
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-8)
    jac = jax.jacobian(lambda a: rodrigues(a))(jnp.zeros(3, dtype=jnp.float64))
    assert np.all(np.isfinite(np.asarray(jac)))
    # d(R)/d(aa_z) at 0 is the skew generator
    np.testing.assert_allclose(np.asarray(jac)[..., 2],
                               np.array([[0, -1, 0], [1, 0, 0], [0, 0, 0.0]]),
                               atol=1e-6)


def test_forward_matches_numpy_oracle(small_model_dict, rng):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    shape = rng.normal(size=10) * 0.5
    aa = rng.normal(size=(24, 3)) * 0.3
    rotations = np.stack([numpy_rodrigues(a) for a in aa])
    root_pos = np.array([0.2, -0.1, 3.0])

    out = smpl_forward(model, jnp.asarray(shape), jnp.asarray(rotations),
                       jnp.asarray(root_pos))
    joints_ref, verts_ref = numpy_smpl_forward(small_model_dict, shape, rotations, root_pos)
    np.testing.assert_allclose(np.asarray(out["joints"]), joints_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out["verts"]), verts_ref, atol=1e-9)


def test_root_anchoring(small_model_dict):
    """jointPos[0] must equal root_pos exactly (solver write-back contract:
    mean_pixel_error projects jointPos.col(0) to the optimized translation)."""
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    p = jnp.array([1.0, 2.0, 5.0])
    out = smpl_forward(model, jnp.zeros(10), jnp.broadcast_to(jnp.eye(3), (24, 3, 3)), p)
    np.testing.assert_allclose(np.asarray(out["joints"][0]), np.asarray(p), atol=1e-12)


def test_forward_vmap_batches(small_model_dict, rng):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    batch = 5
    shapes = jnp.asarray(rng.normal(size=(batch, 10)) * 0.3)
    aas = rng.normal(size=(batch, 24, 3)) * 0.2
    rots = jnp.asarray(np.stack([[numpy_rodrigues(a) for a in f] for f in aas]))
    pos = jnp.asarray(rng.normal(size=(batch, 3)) + np.array([0, 0, 3.0]))
    vout = jax.vmap(lambda w, r, p: smpl_forward(model, w, r, p))(shapes, rots, pos)
    for i in range(batch):
        single = smpl_forward(model, shapes[i], rots[i], pos[i])
        np.testing.assert_allclose(np.asarray(vout["joints"][i]),
                                   np.asarray(single["joints"]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(vout["verts"][i]),
                                   np.asarray(single["verts"]), atol=1e-9)


def test_posedirs_applied(small_model_dict, rng):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    aa = rng.normal(size=(24, 3)) * 0.4
    rots = jnp.asarray(np.stack([numpy_rodrigues(a) for a in aa]))
    base = smpl_forward(model, jnp.zeros(10), rots, jnp.zeros(3), use_posedirs=False)
    posed = smpl_forward(model, jnp.zeros(10), rots, jnp.zeros(3), use_posedirs=True)
    # pose blendshapes change verts but not regressed joints
    assert not np.allclose(np.asarray(base["verts"]), np.asarray(posed["verts"]))
    np.testing.assert_allclose(np.asarray(base["joints"]), np.asarray(posed["joints"]))


def test_forward_jit_compiles_f32(small_model_dict):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float32)
    out = smpl_forward(model, jnp.zeros(10, jnp.float32),
                       jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (24, 3, 3)),
                       jnp.zeros(3, jnp.float32))
    assert out["verts"].dtype == jnp.float32
