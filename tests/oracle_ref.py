"""Independent CPU oracle of the reference objective (numpy + scipy).

This module re-implements the reference's nonlinear-least-squares
objective EXACTLY as the Ceres cost functors define it — the per-keypoint
bottom-up kinematic chain walk of ``ReprojCost`` / ``ReprojCostShape``
(/root/reference/include/Sim3BA.h:34-88 and :126-227), the analytic
priors (:245-346), and the multi-frame temporal terms
(/root/reference/include/MultiFrameBA.h:20-28,121-142) — in plain numpy
f64, and minimizes it with ``scipy.optimize.least_squares`` (trust-region
reflective), a solver with no code or design in common with the repo's
batched JAX LM engine.

Purpose: the accuracy-parity budget (BASELINE.json: final mean pixel
error within 1% of the Ceres baseline) cannot be measured against Ceres
itself here (the reference is unbuildable: SMPL npz assets are LFS stubs,
ceres/eigen not installed, avatar submodule absent). This oracle is the
independent stand-in: same objective, independently formulated residuals
(per-keypoint chain recursion instead of whole-skeleton FK), independent
minimizer. tests/test_parity_oracle.py pins the repo solvers against it.

Robust loss: Ceres applies Huber(delta) to the SQUARED NORM of each
2-row keypoint block: cost = 0.5 * rho(||r_block||^2)
(Sim3BA.h:570 ``new ceres::HuberLoss(3.0)``). scipy's builtin losses are
per-component, so we instead return "corrected" residual blocks
c = r * sqrt(rho(s)/s) with s = ||r||^2; then 0.5*||c||^2 == 0.5*rho(s)
identically and scipy's plain sum-of-squares minimizes the exact
robustified objective.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares

HUBER_DELTA = 3.0  # Sim3BA.h:570, MultiFrameBA.h:64
SCALE_MIN, SCALE_MAX = 0.3, 3.0  # Sim3BA.h:613-614


def aa_rotate(aa: np.ndarray, p: np.ndarray) -> np.ndarray:
    """ceres::AngleAxisRotatePoint (rotation.h): Rodrigues rotation with
    the first-order Taylor fallback near theta = 0."""
    theta2 = float(aa @ aa)
    if theta2 > 1e-32:
        theta = np.sqrt(theta2)
        w = aa / theta
        c, s = np.cos(theta), np.sin(theta)
        return p * c + np.cross(w, p) * s + w * (w @ p) * (1.0 - c)
    return p + np.cross(aa, p)


def aa_to_matrix(aa: np.ndarray) -> np.ndarray:
    """Rodrigues angle-axis -> rotation matrix (same Taylor fallback)."""
    th2 = float(aa @ aa)
    kx = np.array([[0.0, -aa[2], aa[1]],
                   [aa[2], 0.0, -aa[0]],
                   [-aa[1], aa[0], 0.0]])
    if th2 > 1e-32:
        th = np.sqrt(th2)
        kx = kx / th
        return np.eye(3) + np.sin(th) * kx + (1.0 - np.cos(th)) * (kx @ kx)
    return np.eye(3) + kx


def rest_offsets(model_dict: dict) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pose parent-relative bone offsets, root-anchored, exactly as
    OptimizePoseReprojection builds them (Sim3BA.h:532-555): zero-shape
    rest joints = J_regressor @ v_template, translated so the root is at
    the origin; offset[0] = 0, offset[j] = base[j] - base[parent[j]]."""
    v_t = np.asarray(model_dict["v_template"], np.float64)
    j_reg = np.asarray(model_dict["J_regressor"], np.float64)
    if hasattr(j_reg, "toarray"):
        j_reg = j_reg.toarray()
    parents = np.asarray(model_dict["parents"], np.int64)
    parents = np.where(parents == np.arange(len(parents)), -1, parents)
    parents = np.where(parents >= len(parents), -1, parents)
    base = j_reg @ v_t                      # (nJ, 3)
    base = base - base[0]
    off = np.zeros_like(base)
    for j in range(1, base.shape[0]):
        pj = parents[j]
        off[j] = base[j] - base[pj] if pj >= 0 else base[j]
    return off, parents


class OracleGMM:
    """Numpy re-derivation of the GMM prior residual contract documented
    in smpltpu/energy/priors.py (the reference's ark::GaussianMixture is
    not checked out upstream; Sim3BA.h:246-301 documents only the
    interface). Hard per-evaluation component assignment, whitened rows
    L_k^T (x - mu_k), constant last row sqrt(2 * shifted c_k)."""

    def __init__(self, weights, means, covs):
        self.means = np.asarray(means, np.float64)
        prec = np.array([np.linalg.inv(c) for c in np.asarray(covs, np.float64)])
        self.prec_cho = np.array([np.linalg.cholesky(p) for p in prec])
        sign, logdet = np.linalg.slogdet(np.asarray(covs, np.float64))
        assert np.all(sign > 0)
        c = -np.log(np.asarray(weights, np.float64)) + 0.5 * logdet
        self.const = c - c.min()

    def residual(self, x: np.ndarray, beta: float) -> np.ndarray:
        diff = x[None, :] - self.means                          # (K, D)
        white = np.einsum("kdr,kd->kr", self.prec_cho, diff)     # L^T (x-mu)
        nll = 0.5 * np.sum(white * white, axis=-1) + self.const
        k = int(np.argmin(nll))
        return beta * np.concatenate(
            [white[k], [np.sqrt(2.0 * self.const[k] + 1e-20)]])


class OracleProblem:
    """Reference objective for one frame-parameter layout.

    x76 layout matches the repo packing: [scale, rootAA(3), rootT(3),
    jointAA(nJ-1, 3)] — purely a vector convention; residual math is the
    reference chain walk."""

    def __init__(self, model_dict: dict, r0: np.ndarray, cam, with_shape: bool):
        self.offsets, self.parents = rest_offsets(model_dict)
        self.n_joints = len(self.parents)
        self.r0 = np.asarray(r0, np.float64)
        self.fx, self.fy, self.cx, self.cy = [float(v) for v in cam]
        self.jsr = None
        if with_shape:
            # model jointShapeReg: (3*nJ, nS) = J_regressor @ shapedirs
            j_reg = np.asarray(model_dict["J_regressor"], np.float64)
            if hasattr(j_reg, "toarray"):
                j_reg = j_reg.toarray()
            sd = np.asarray(model_dict["shapedirs"], np.float64)  # (V,3,nS)
            self.jsr = np.einsum("jv,vxs->jxs", j_reg, sd)        # (nJ,3,nS)

    # --- the reference functor, verbatim semantics (Sim3BA.h:34-88 /
    # :126-227): start at this joint's offset (+ shape delta_j - delta_par),
    # walk ancestors up to but NOT including the root applying each
    # parent's AA rotation then its offset (+ its shape delta pair), then
    # fixed R0, optimized root AA, scale, translation, pinhole projection.
    def chain_point(self, jid: int, x: np.ndarray, shape,
                    delta=None) -> np.ndarray:
        scale, root_aa, root_t = x[0], x[1:4], x[4:7]
        joint_aa = x[7:].reshape(self.n_joints - 1, 3)
        if delta is None and self.jsr is not None:
            delta = np.einsum("jxs,s->jx", self.jsr, np.asarray(shape, np.float64))
        pos = self.offsets[jid].copy()
        if delta is not None:
            dpar = delta[self.parents[jid]] if self.parents[jid] >= 0 else 0.0
            pos = pos + (delta[jid] - dpar)
        cur = jid
        while self.parents[cur] != -1 and self.parents[cur] != 0:
            p = self.parents[cur]
            pos = aa_rotate(joint_aa[p - 1], pos)
            step = self.offsets[p]
            if delta is not None:
                pp = self.parents[p]
                dpp = delta[pp] if pp >= 0 else 0.0
                step = step + (delta[p] - dpp)
            pos = pos + step
            cur = p
        pos = self.r0 @ pos
        pos = aa_rotate(root_aa, pos)
        return scale * pos + root_t

    def project(self, pos: np.ndarray) -> np.ndarray:
        return np.array([self.fx * pos[0] / pos[2] + self.cx,
                         self.fy * pos[1] / pos[2] + self.cy])

    def joints_cam_all(self, x: np.ndarray, shape) -> np.ndarray:
        """All joints' camera-space positions in one top-down pass —
        mathematically identical to chain_point for every jid (the
        bottom-up ancestor walk telescopes into this accumulation;
        test_parity_oracle.py pins them equal to f64 roundoff). Exists
        because scipy's finite differencing calls the residual tens of
        thousands of times and the literal per-keypoint walk is ~20x
        slower; the solver uses this, the formulation test uses
        chain_point."""
        n_j = self.n_joints
        scale, root_aa, root_t = x[0], x[1:4], x[4:7]
        joint_aa = x[7:].reshape(n_j - 1, 3)
        off = self.offsets
        if self.jsr is not None:
            delta = np.einsum("jxs,s->jx", self.jsr, np.asarray(shape, np.float64))
            pp = np.where(self.parents >= 0, self.parents, 0)
            dpar = np.where((self.parents >= 0)[:, None], delta[pp], 0.0)
            off = off + (delta - dpar)
        a = [np.eye(3)] * n_j   # rotation accumulated ABOVE each joint
        pos = np.zeros((n_j, 3))
        pos[0] = off[0]
        rots = [np.eye(3)] + [aa_to_matrix(joint_aa[j - 1])
                              for j in range(1, n_j)]
        for j in range(1, n_j):
            p = int(self.parents[j])
            if p in (-1, 0):
                a[j] = np.eye(3)
                pos[j] = off[j]
            else:
                a[j] = a[p] @ rots[p]
                pos[j] = a[j] @ off[j] + pos[p]
        cam_pts = (self.r0 @ pos.T).T
        r_root = aa_to_matrix(root_aa)
        cam_pts = (r_root @ cam_pts.T).T
        return scale * cam_pts + root_t

    def _pred_uv(self, x, shape, kp_dense) -> tuple[np.ndarray, np.ndarray]:
        """Predicted pixels and raw residuals for the VALID rows of a
        dense (K, 4) [jid, u, v, valid] frame (fast whole-skeleton path)."""
        kp = np.asarray(kp_dense, np.float64)
        valid = kp[:, 3] > 0.0
        jids = kp[valid, 0].astype(int)
        joints = self.joints_cam_all(x, shape)[jids]      # (n_valid, 3)
        uv = np.stack([self.fx * joints[:, 0] / joints[:, 2] + self.cx,
                       self.fy * joints[:, 1] / joints[:, 2] + self.cy], -1)
        return uv, uv - kp[valid, 1:3]

    def kp_blocks(self, x, shape, kp_dense) -> np.ndarray:
        """Huber-corrected 2-row blocks for the VALID rows.
        Returns (n_valid, 2)."""
        _, r = self._pred_uv(x, shape, kp_dense)
        s = np.sum(r * r, axis=-1)
        d2 = HUBER_DELTA * HUBER_DELTA
        # np.where evaluates both branches: clamp the numerator so the
        # unused s <= d2 side never feeds sqrt a negative (for s > d2 the
        # numerator is > d2 > 0, so the clamp is inert on the used branch)
        num = np.maximum(
            2.0 * HUBER_DELTA * np.sqrt(np.maximum(s, 1e-300)) - d2, 0.0)
        w = np.where(s > d2, np.sqrt(num / np.maximum(s, 1e-300)), 1.0)
        return r * w[:, None]

    def mean_px_error(self, x, shape, kp_dense) -> float:
        """Mean Euclidean pixel distance over valid keypoints (the
        log.csv metric, Utils.h:102-116) under THIS objective's forward."""
        _, r = self._pred_uv(x, shape, kp_dense)
        if r.shape[0] == 0:
            return 0.0
        return float(np.mean(np.sqrt(np.sum(r * r, axis=-1))))


def fit_single_frame(
    prob: OracleProblem,
    kp_dense: np.ndarray,
    x0: np.ndarray,
    beta_pose: float = 0.0,
    beta_shape: float = 0.0,
    shape0=None,
    opt_shape: bool = False,
    frozen_joints=(),
    gmm: OracleGMM | None = None,
    max_nfev: int = 40000,
):
    """Reference single-frame solve (OptimizePose[Shape]Reprojection):
    Huber keypoint blocks + pose prior (L2 or GMM) [+ shape prior],
    scale bounded to [0.3, 3], frozen_joints held constant.
    Returns (x_opt (76,), shape_opt (nS,))."""
    n_j = prob.n_joints
    n_s = len(shape0) if opt_shape else 0
    x_full = np.asarray(x0, np.float64).copy()
    w_full = (np.asarray(shape0, np.float64).copy() if shape0 is not None
              else np.zeros(0))

    frozen = np.zeros(76 + n_s, bool)
    for j in frozen_joints:
        frozen[7 + 3 * (j - 1): 7 + 3 * j] = True
    free = ~frozen
    z0 = np.concatenate([x_full, w_full[:n_s]])[free]
    lo = np.full(76 + n_s, -np.inf)
    hi = np.full(76 + n_s, np.inf)
    lo[0], hi[0] = SCALE_MIN, SCALE_MAX

    def unpack(z):
        full = np.concatenate([x_full, w_full[:n_s]]).copy()
        full[free] = z
        return full[:76], (full[76:] if opt_shape else w_full)

    def fun(z):
        x, w = unpack(z)
        parts = [prob.kp_blocks(x, w, kp_dense).ravel()]
        if beta_pose > 0.0:
            if gmm is not None:
                parts.append(gmm.residual(x[7:], beta_pose))
            else:
                parts.append(beta_pose * x[7:])
        if opt_shape and beta_shape > 0.0:
            parts.append(beta_shape * w)
        return np.concatenate(parts)

    res = least_squares(fun, z0, method="trf", bounds=(lo[free], hi[free]),
                        ftol=1e-12, xtol=1e-12, gtol=1e-12,
                        max_nfev=max_nfev)
    return unpack(res.x)


def single_frame_cost(prob, x, w, kp_dense, beta_pose=0.0, beta_shape=0.0,
                      opt_shape=False, gmm=None) -> float:
    """0.5 * sum of squared (corrected) residuals — the scalar objective
    fit_single_frame minimizes, evaluable at ANY point (e.g. the repo
    solver's optimum, for the local-optimality certificate)."""
    parts = [prob.kp_blocks(x, w, kp_dense).ravel()]
    if beta_pose > 0.0:
        parts.append(gmm.residual(x[7:], beta_pose) if gmm is not None
                     else beta_pose * x[7:])
    if opt_shape and beta_shape > 0.0:
        parts.append(beta_shape * np.asarray(w, np.float64))
    r = np.concatenate(parts)
    return 0.5 * float(r @ r)


def online_frame_cost(prob, x, shape, kp_dense, prev, has_prev: float,
                      beta_pose: float, lambda_t: float,
                      gmm: OracleGMM | None = None) -> float:
    """Scalar objective of one STREAMING frame (solve/online.py): the
    single-frame pose-only objective plus the temporal tether
    ``lambda_t * has_prev * tmask * (x - prev)`` — one row of the
    multi-frame stencil (MultiFrameBA.h:121-142) with the earlier frame
    frozen. Evaluable at any point (certificate use)."""
    parts = [prob.kp_blocks(x, shape, kp_dense).ravel()]
    if beta_pose > 0.0:
        parts.append(gmm.residual(x[7:], beta_pose) if gmm is not None
                     else beta_pose * x[7:])
    tmask = _temporal_mask(prob.n_joints)
    parts.append(lambda_t * has_prev * tmask
                 * (np.asarray(x, np.float64) - np.asarray(prev, np.float64)))
    r = np.concatenate(parts)
    return 0.5 * float(r @ r)


def fit_online_frame(
    prob: OracleProblem,
    kp_dense: np.ndarray,
    x0: np.ndarray,
    prev: np.ndarray,
    has_prev: float,
    shape=None,
    beta_pose: float = 0.0,
    lambda_t: float = 0.0,
    frozen_joints=(),
    freeze_scale: bool = True,
    gmm: OracleGMM | None = None,
    max_nfev: int = 40000,
) -> np.ndarray:
    """Reference-objective solve of one streaming frame (the objective of
    online_frame_cost; shape is constant data). Returns x_opt (76,)."""
    x_full = np.asarray(x0, np.float64).copy()
    prev = np.asarray(prev, np.float64)
    tmask = _temporal_mask(prob.n_joints)

    frozen = np.zeros(76, bool)
    if freeze_scale:
        frozen[0] = True
    for j in frozen_joints:
        frozen[7 + 3 * (j - 1): 7 + 3 * j] = True
    free = ~frozen
    lo = np.full(76, -np.inf)
    hi = np.full(76, np.inf)
    lo[0], hi[0] = SCALE_MIN, SCALE_MAX

    def unpack(z):
        full = x_full.copy()
        full[free] = z
        return full

    def fun(z):
        x = unpack(z)
        parts = [prob.kp_blocks(x, shape, kp_dense).ravel()]
        if beta_pose > 0.0:
            parts.append(gmm.residual(x[7:], beta_pose) if gmm is not None
                         else beta_pose * x[7:])
        parts.append(lambda_t * has_prev * tmask * (x - prev))
        return np.concatenate(parts)

    res = least_squares(fun, x_full[free], method="trf",
                        bounds=(lo[free], hi[free]),
                        ftol=1e-12, xtol=1e-12, gtol=1e-12,
                        max_nfev=max_nfev)
    return unpack(res.x)


def multi_frame_cost(prob, xs, w, kp_batch, r0_batch, beta_pose, beta_shape,
                     lambda_t) -> float:
    """Scalar objective of fit_multi_frame at any point."""
    f_dim = xs.shape[0]
    t_idx = np.nonzero(_temporal_mask(prob.n_joints))[0]
    saved_r0 = prob.r0
    parts = []
    for f in range(f_dim):
        prob.r0 = np.asarray(r0_batch[f], np.float64)
        parts.append(prob.kp_blocks(xs[f], w, kp_batch[f]).ravel())
        parts.append(beta_pose * xs[f, 7:])
    prob.r0 = saved_r0
    parts.append(beta_shape * np.asarray(w, np.float64))
    diff = (xs[:-1] - xs[1:])[:, t_idx]
    parts.append(lambda_t * diff.ravel())
    r = np.concatenate(parts)
    return 0.5 * float(r @ r)


# temporal smoothness acts on rootT, rootAA and every jointAA — NOT scale
# (MultiFrameBA.h:121-142)
def _temporal_mask(n_joints: int) -> np.ndarray:
    m = np.ones(7 + 3 * (n_joints - 1), np.float64)
    m[0] = 0.0
    return m


def fit_multi_frame(
    prob: OracleProblem,
    kp_batch: np.ndarray,      # (F, K, 4)
    x0_batch: np.ndarray,      # (F, 76)
    shape0: np.ndarray,        # (nS,)
    r0_batch: np.ndarray,      # (F, 3, 3) per-frame fixed root orientation
    beta_pose: float,
    beta_shape: float,
    lambda_t: float,
    freeze_scale: bool = True,
    max_nfev: int = 40000,
):
    """Reference multi-frame BA (OptimizeMultiFrame, MultiFrameBA.h:33-151):
    shared shape, per-frame Huber keypoint blocks (per-frame fixed R0),
    per-frame PLAIN L2 pose prior (GMM is nullptr there, :109), one shared
    shape prior, temporal first-order smoothness between consecutive
    frames. freeze_scale matches the repo's documented gauge fix
    (solve/multi_frame.py): the per-frame scale dof is the reprojection
    energy's exact gauge direction, held at init.
    Returns (x_opt (F, 76), shape_opt (nS,))."""
    f_dim, n_j = x0_batch.shape[0], prob.n_joints
    n_s = len(shape0)
    p = 76
    tmask = _temporal_mask(n_j)
    t_idx = np.nonzero(tmask)[0]

    frozen = np.zeros(f_dim * p + n_s, bool)
    if freeze_scale:
        frozen[np.arange(f_dim) * p] = True
    free = ~frozen
    base = np.concatenate([np.asarray(x0_batch, np.float64).ravel(),
                           np.asarray(shape0, np.float64)])
    z0 = base[free]

    r0s = [np.asarray(r, np.float64) for r in r0_batch]

    def unpack(z):
        full = base.copy()
        full[free] = z
        return full[:f_dim * p].reshape(f_dim, p), full[f_dim * p:]

    def fun(z):
        xs, w = unpack(z)
        parts = []
        for f in range(f_dim):
            prob.r0 = r0s[f]
            parts.append(prob.kp_blocks(xs[f], w, kp_batch[f]).ravel())
            parts.append(beta_pose * xs[f, 7:])
        parts.append(beta_shape * w)
        diff = (xs[:-1] - xs[1:])[:, t_idx]
        parts.append(lambda_t * diff.ravel())
        return np.concatenate(parts)

    # column-grouping sparsity so scipy's finite differencing stays O(P)
    # instead of O(F*P) residual evals per Jacobian
    from scipy.sparse import lil_matrix
    n_rows = len(fun(z0))
    spar = lil_matrix((n_rows, int(free.sum())), dtype=np.int8)
    col_of = -np.ones(f_dim * p + n_s, np.int64)
    col_of[free] = np.arange(free.sum())

    def cols(fr_slice):
        c = col_of[fr_slice]
        return c[c >= 0]

    row = 0
    for f in range(f_dim):
        n_kp = 2 * int(np.sum(kp_batch[f][:, 3] > 0))
        fr = slice(f * p, (f + 1) * p)
        for blk in (n_kp, 3 * (n_j - 1)):
            spar[row:row + blk, cols(fr)] = 1
            if blk == n_kp:
                spar[row:row + blk, cols(slice(f_dim * p, f_dim * p + n_s))] = 1
            row += blk
    spar[row:row + n_s, cols(slice(f_dim * p, f_dim * p + n_s))] = 1
    row += n_s
    for f in range(f_dim - 1):
        blk = len(t_idx)
        spar[row:row + blk, cols(slice(f * p, (f + 2) * p))] = 1
        row += blk
    assert row == n_rows

    res = least_squares(fun, z0, method="trf", jac_sparsity=spar,
                        ftol=1e-12, xtol=1e-12, gtol=1e-12,
                        max_nfev=max_nfev)
    return unpack(res.x)
