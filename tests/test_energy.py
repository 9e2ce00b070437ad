"""Energy-layer tests: the whole-skeleton FK residual must match an
independent numpy oracle that walks the kinematic chain per keypoint the
way the reference cost functors do (include/Sim3BA.h:34-88 pose-only,
:126-227 with shape), including the root quirks. GMM prior Jacobian checked
against finite differences and against the documented analytic form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpltpu.constants import init_root_rotation
from smpltpu.energy import (
    Camera,
    GMMPrior,
    gmm_pose_prior_residual,
    huber_block_weights,
    keypoint_residuals,
    make_skeleton_spec,
    pack_frame_params,
    skeleton_joints_cam,
    temporal_residuals,
)
from smpltpu.energy.params import FrameParams, N_FRAME_PARAMS, init_frame_params, unpack_frame_params
from smpltpu.models import SMPLModel
from tests.test_smpl_forward import numpy_rodrigues


# ---------------------------------------------------------------------
# Independent oracle: per-keypoint chain walk (the reference functor's
# algorithm, re-implemented in plain numpy from its math description).
# ---------------------------------------------------------------------
def oracle_joint_cam(jid, parents, offsets, r0, scale, root_aa, root_t,
                     joint_aa, shape=None, jsr=None):
    """Position of joint `jid` in camera space, reference-functor style."""
    def delta(j):
        if shape is None or jsr is None:
            return np.zeros(3)
        return jsr[3 * j:3 * j + 3] @ shape

    pos = offsets[jid].copy()
    if shape is not None and jsr is not None:
        d_par = delta(parents[jid]) if parents[jid] >= 0 else np.zeros(3)
        pos += delta(jid) - d_par
    cur = jid
    while parents[cur] != -1 and parents[cur] != 0:
        p = parents[cur]
        pos = numpy_rodrigues(joint_aa[p]) @ pos
        extra = np.zeros(3)
        if shape is not None and jsr is not None:
            pp = parents[p]
            d_pp = delta(pp) if pp >= 0 else np.zeros(3)
            extra = delta(p) - d_pp
        pos = pos + offsets[p] + extra
        cur = p
    pos = r0 @ pos
    pos = numpy_rodrigues(root_aa) @ pos
    return scale * pos + root_t


def _setup(small_model_dict, rng, with_shape):
    model = SMPLModel.from_dict(small_model_dict, dtype=jnp.float64)
    r0 = init_root_rotation()
    spec = make_skeleton_spec(model, r0, with_shape=with_shape)
    n_j = model.num_joints
    fp = FrameParams(
        scale=jnp.asarray(1.3),
        root_aa=jnp.asarray(rng.normal(size=3) * 0.2),
        root_t=jnp.asarray(np.array([0.1, -0.2, 3.5])),
        joint_aa=jnp.asarray(rng.normal(size=(n_j - 1, 3)) * 0.3),
    )
    vec = pack_frame_params(fp)
    shape = jnp.asarray(rng.normal(size=model.num_shapes) * 0.5)
    return model, spec, vec, shape, r0


@pytest.mark.parametrize("with_shape", [False, True])
def test_skeleton_fk_matches_chain_oracle(small_model_dict, rng, with_shape):
    model, spec, vec, shape, r0 = _setup(small_model_dict, rng, with_shape)
    joints = np.asarray(skeleton_joints_cam(vec, shape, spec))

    parents = small_model_dict["parents"]
    offsets = np.asarray(spec.base_offsets)
    fp = unpack_frame_params(vec, model.num_joints)
    joint_aa_full = np.zeros((model.num_joints, 3))
    joint_aa_full[1:] = np.asarray(fp.joint_aa)
    jsr = small_model_dict["joint_shape_reg"] if with_shape else None
    sh = np.asarray(shape) if with_shape else None
    for jid in range(model.num_joints):
        ref = oracle_joint_cam(jid, parents, offsets, r0,
                               float(fp.scale), np.asarray(fp.root_aa),
                               np.asarray(fp.root_t), joint_aa_full,
                               shape=sh, jsr=jsr)
        np.testing.assert_allclose(joints[jid], ref, atol=1e-9,
                                   err_msg=f"joint {jid}")


def test_keypoint_residual_masking(small_model_dict, rng):
    model, spec, vec, shape, _ = _setup(small_model_dict, rng, False)
    cam = Camera(*map(jnp.asarray, (500.0, 500.0, 320.0, 240.0)))
    kp = np.zeros((5, 4))
    kp[:, 0] = [1, 2, 15, 16, 0]
    kp[:, 1:3] = rng.normal(size=(5, 2)) * 50 + 300
    kp[:, 3] = [1, 1, 0, 1, 0]  # slots 2 and 4 invalid
    res = np.asarray(keypoint_residuals(vec, shape, jnp.asarray(kp), cam, spec))
    assert res.shape == (10,)
    assert np.all(res[4:6] == 0.0) and np.all(res[8:10] == 0.0)
    assert np.all(res[:4] != 0.0)
    # Jacobian rows of masked slots are exactly zero
    jac = np.asarray(jax.jit(jax.jacfwd(
        lambda v: keypoint_residuals(v, shape, jnp.asarray(kp), cam, spec)))(vec))
    assert np.all(jac[4:6] == 0.0) and np.all(jac[8:10] == 0.0)
    assert np.any(jac[:4] != 0.0)


def test_jacfwd_full_rank_structure(small_model_dict, rng):
    """Fixed joints aside, observed-chain params must have nonzero Jacobian."""
    model, spec, vec, shape, _ = _setup(small_model_dict, rng, False)
    cam = Camera(*map(jnp.asarray, (500.0, 500.0, 320.0, 240.0)))
    kp = np.zeros((1, 4))
    kp[0] = [20, 300.0, 300.0, 1.0]  # left wrist: chain 20<-18<-16<-13<-9<-6<-3<-0
    jac = np.asarray(jax.jacfwd(
        lambda v: keypoint_residuals(v, shape, jnp.asarray(kp), cam, spec))(vec))
    fp_lay_joint = lambda j: slice(7 + 3 * (j - 1), 7 + 3 * j)
    for j in (18, 16, 13, 9, 6, 3):  # ancestors (excl root) affect it
        assert np.any(jac[:, fp_lay_joint(j)] != 0.0), f"joint {j} should matter"
    assert np.any(jac[:, 0:7] != 0.0)  # sim3 params matter
    for j in (20, 4, 21):  # its own rotation and unrelated joints don't
        assert np.all(jac[:, fp_lay_joint(j)] == 0.0), f"joint {j} should not matter"


def test_gmm_residual_and_jacobian(gmm_prior, rng):
    prior = GMMPrior.from_dict(gmm_prior, beta=5.0, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=69) * 0.3)
    r = gmm_pose_prior_residual(x, prior)
    assert r.shape == (70,)

    # energy equals beta^2*(NLL of chosen component + global shift)
    white = np.einsum("kdr,kd->kr", gmm_prior["prec_cho"],
                      np.asarray(x)[None] - gmm_prior["means"])
    c = -np.log(gmm_prior["weights"]) + 0.5 * gmm_prior["logdet_cov"]
    c -= c.min()
    nll = 0.5 * (white ** 2).sum(-1) + c
    k = nll.argmin()
    np.testing.assert_allclose(0.5 * float(jnp.sum(r * r)), 25.0 * nll[k], rtol=1e-9)

    # analytic Jacobian = beta * L_k^T on the first 69 rows, 0 on the const row
    jac = np.asarray(jax.jacfwd(lambda v: gmm_pose_prior_residual(v, prior))(x))
    np.testing.assert_allclose(jac[:69], 5.0 * gmm_prior["prec_cho"][k].T, atol=1e-9)
    np.testing.assert_allclose(jac[69], 0.0, atol=1e-12)

    # finite differences agree (away from component boundaries)
    eps = 1e-6
    for i in (0, 17, 68):
        xp = x.at[i].add(eps)
        xm = x.at[i].add(-eps)
        fd = (np.asarray(gmm_pose_prior_residual(xp, prior))
              - np.asarray(gmm_pose_prior_residual(xm, prior))) / (2 * eps)
        np.testing.assert_allclose(jac[:, i], fd, atol=1e-5)


def test_huber_weights():
    delta = 3.0
    small = jnp.asarray([[1.0, 2.0]])          # s=5 <= 9 -> weight 1
    big = jnp.asarray([[30.0, 40.0]])          # s=2500 -> rho'=3/50
    w_small = np.asarray(huber_block_weights(small, delta))
    w_big = np.asarray(huber_block_weights(big, delta))
    np.testing.assert_allclose(w_small, 1.0)
    np.testing.assert_allclose(w_big, np.sqrt(3.0 / 50.0), rtol=1e-6)


def test_temporal_residuals_exclude_scale():
    f, p = 4, N_FRAME_PARAMS
    params = jnp.asarray(np.arange(f * p, dtype=np.float64).reshape(f, p))
    res = np.asarray(temporal_residuals(params, jnp.asarray(2.0), 24)).reshape(f - 1, p)
    np.testing.assert_allclose(res[:, 0], 0.0)          # scale uncoupled
    np.testing.assert_allclose(res[:, 1:], 2.0 * -p)    # lam*(p_f - p_{f+1})


def test_init_frame_params_defaults():
    vec = init_frame_params(dtype=jnp.float64)
    fp = unpack_frame_params(vec)
    assert float(fp.scale) == 1.0
    np.testing.assert_allclose(np.asarray(fp.root_t), [0.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(fp.joint_aa), 0.0)
