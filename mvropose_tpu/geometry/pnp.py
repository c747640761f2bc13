"""Perspective-n-Point solvers in pure jnp: DLT init + LM refine + RANSAC.

TPU-native replacement for the reference's cv2.solvePnPRansac(EPNP) serve path
(/root/reference/model/Fr5_model_train.ipynb cell 14, lines 1433-1446) and the
cv2.solvePnP + solvePnPRefineLM marker re-solve
(/root/reference/dataset/Meca_insertion_preprocessing.py:235-241).

Design notes (why this is not a port):
  * Static shapes everywhere: RANSAC draws a FIXED number of hypotheses and
    scores them with a vmap - no data-dependent loops, so the whole solve jits
    and batches (vmap over cameras/frames) and runs on-device right after the
    heatmap decode, instead of a host round-trip per view.
  * Per-point weights replace index filtering: the confidence gate
    (score >= thresh) becomes a weight vector, keeping shapes static.
  * Levenberg-Marquardt with a fixed iteration count and multiplicative
    damping update runs as a lax.scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix


def _normalize_2d(pts: jnp.ndarray, weights: jnp.ndarray):
    """Hartley normalization for weighted 2D points: (T, pts_norm)."""
    wsum = jnp.sum(weights) + 1e-12
    mean = jnp.sum(pts * weights[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1) + 1e-12)
    scale = jnp.sqrt(2.0) / (jnp.sum(d * weights) / wsum + 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=pts.dtype,
    )
    pn = (pts - mean) * scale
    return T, pn


def _normalize_3d(pts: jnp.ndarray, weights: jnp.ndarray):
    wsum = jnp.sum(weights) + 1e-12
    mean = jnp.sum(pts * weights[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1) + 1e-12)
    scale = jnp.sqrt(3.0) / (jnp.sum(d * weights) / wsum + 1e-12)
    U = jnp.concatenate(
        [scale * jnp.eye(3, dtype=pts.dtype), (-scale * mean)[:, None]], axis=1
    )
    U = jnp.concatenate([U, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=pts.dtype)], axis=0)
    pn = (pts - mean) * scale
    return U, pn


def solve_pnp_dlt(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray | None = None,
):
    """Weighted DLT pose init: (N>=6, 3) + (N, 2) -> (rvec (3,), tvec (3,)).

    Estimates the 3x4 projection in normalized image coords, then projects the
    left 3x3 onto SO(3) via SVD. Weights soft-select points (0 disables).
    """
    N = object_points.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=object_points.dtype)
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((N, 1), dtype=image_points.dtype)
    pix_h = jnp.concatenate([image_points, ones], axis=1)
    xy = (Kinv @ pix_h.T).T[:, :2]  # normalized camera coords

    T2, xyn = _normalize_2d(xy, weights)
    U4, Xn = _normalize_3d(object_points, weights)

    Xh = jnp.concatenate([Xn, ones], axis=1)  # (N, 4)
    zero = jnp.zeros_like(Xh)
    u = xyn[:, 0:1]
    v = xyn[:, 1:2]
    rows_u = jnp.concatenate([Xh, zero, -u * Xh], axis=1)  # (N, 12)
    rows_v = jnp.concatenate([zero, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N, 12)
    w2 = jnp.concatenate([weights, weights], axis=0)
    A = A * w2[:, None]

    # Smallest right singular vector of A.
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    p = Vt[-1]
    P = p.reshape(3, 4)
    # Denormalize: xy = T2^-1 Pn U4 X
    P = jnp.linalg.inv(T2) @ P @ U4

    M = P[:, :3]
    # Fix sign so that points end up in front of the camera (positive depth).
    Xh_w = jnp.concatenate([object_points, ones], axis=1)
    depths = (P @ Xh_w.T)[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths) * weights) < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]

    # Project M onto a scaled rotation: M = s R.
    Um, Sm, Vtm = jnp.linalg.svd(M)
    det = jnp.linalg.det(Um @ Vtm)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=M.dtype)).at[2, 2].set(det)
    R = Um @ D @ Vtm
    s = jnp.sum(Sm) / 3.0
    t = P[:, 3] / (s + 1e-12)
    rvec = matrix_to_rodrigues(R)
    return rvec, t


def solve_pnp_planar(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray | None = None,
):
    """Homography-based pose init for (near-)planar point sets (IPPE-style).

    Robot FK keypoint chains are often nearly coplanar (arm stretched in a
    plane), which degenerates the 11-dof DLT; this planar path fits the
    best plane, estimates the plane->image homography, and decomposes it into
    a pose. Returns TWO candidate (rvec, tvec) pairs - the classic two-fold
    planar ambiguity - for downstream scoring to disambiguate:
    ((rvec1, tvec1), (rvec2, tvec2)).
    """
    N = object_points.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=object_points.dtype)
    wsum = jnp.sum(weights) + 1e-12
    c = jnp.sum(object_points * weights[:, None], axis=0) / wsum
    centered = (object_points - c) * weights[:, None]
    # Principal plane basis.
    _, _, Vt = jnp.linalg.svd(centered, full_matrices=True)
    B2 = Vt[:2].T  # (3, 2) in-plane basis
    n = Vt[2]  # plane normal
    plane_pts = (object_points - c) @ B2  # (N, 2)

    # Normalized image coordinates.
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((N, 1), dtype=image_points.dtype)
    pix_h = jnp.concatenate([image_points, ones], axis=1)
    xy = (Kinv @ pix_h.T).T[:, :2]

    # Homography DLT (plane 2D -> normalized image), weighted + normalized.
    T2, xyn = _normalize_2d(xy, weights)
    T3, ppn = _normalize_2d(plane_pts, weights)
    X = ppn[:, 0:1]
    Y = ppn[:, 1:2]
    x = xyn[:, 0:1]
    y = xyn[:, 1:2]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    rows_x = jnp.concatenate([X, Y, one, zero, zero, zero, -x * X, -x * Y, -x], axis=1)
    rows_y = jnp.concatenate([zero, zero, zero, X, Y, one, -y * X, -y * Y, -y], axis=1)
    A = jnp.concatenate([rows_x, rows_y], axis=0)
    w2 = jnp.concatenate([weights, weights], axis=0)
    A = A * w2[:, None]
    _, _, Vh = jnp.linalg.svd(A, full_matrices=True)
    H = Vh[-1].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T3

    # Positive-depth normalization: the plane origin must project with z > 0.
    z0 = H[2, 2]
    H = H * jnp.where(z0 < 0, -1.0, 1.0)

    h1 = H[:, 0]
    h2 = H[:, 1]
    h3 = H[:, 2]
    s = 2.0 / (jnp.linalg.norm(h1) + jnp.linalg.norm(h2) + 1e-12)
    r1 = h1 * s
    r2 = h2 * s
    t_h = h3 * s
    r3 = jnp.cross(r1, r2)
    M = jnp.stack([r1, r2, r3], axis=1)
    Um, _, Vtm = jnp.linalg.svd(M)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=M.dtype)).at[2, 2].set(
        jnp.linalg.det(Um @ Vtm)
    )
    Rp = Um @ D @ Vtm  # camera-from-plane rotation, columns [r1 r2 r3]

    # Plane frame -> world frame: world = c + B2 p, normal n completes Q.
    Q = jnp.concatenate([B2, n[:, None]], axis=1)  # (3, 3) orthonormal
    detQ = jnp.linalg.det(Q)
    # R_w Q = [r1 r2 det(Q) r3] keeps R_w proper.
    Rp_adj = Rp.at[:, 2].multiply(detQ)
    Rw1 = Rp_adj @ Q.T
    tw1 = t_h - Rw1 @ c

    # Second planar solution (the classic two-fold perspective ambiguity,
    # Schweighofer & Pinz / IPPE's second root): the alternative
    # interpretation's plane normal is the REFLECTION of the first one's
    # across the viewing ray to the plane origin. Construct it as a proper
    # rotation of the camera-from-plane frame - NOT by composing with a
    # plane reflection (I - 2nn^T fixes every in-plane point, so that
    # "root" projected identically to root 1 and its SVD re-properization
    # returned an arbitrary flip).
    v = t_h / (jnp.linalg.norm(t_h) + 1e-12)  # ray to plane origin (camera)
    n_cam = Rp[:, 2]  # plane normal, camera frame
    axis = jnp.cross(n_cam, v)
    s_ax = jnp.linalg.norm(axis)
    theta = jnp.arctan2(s_ax, jnp.dot(n_cam, v))
    # Rotate the plane frame by 2*theta about (n x v): the normal lands on
    # the other side of the ray. Fronto-parallel (axis ~ 0): the two roots
    # coincide - fall back to root 1's rotation.
    safe_axis = jnp.where(s_ax > 1e-8, axis / (s_ax + 1e-12), jnp.zeros(3))
    G = rodrigues_to_matrix(safe_axis * (2.0 * theta))
    Rp2 = jnp.where(s_ax > 1e-8, G @ Rp, Rp)
    Rp2_adj = Rp2.at[:, 2].multiply(detQ)
    Rw2 = Rp2_adj @ Q.T
    tw2 = t_h - Rw2 @ c

    return (
        (matrix_to_rodrigues(Rw1), tw1),
        (matrix_to_rodrigues(Rw2), tw2),
    )


def _reproj_residuals(params, object_points, image_points, K, dist, weights):
    rvec = params[:3]
    tvec = params[3:]
    proj = project_points(object_points, rvec, tvec, K, dist)
    res = (proj - image_points) * weights[:, None]
    return res.reshape(-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_pnp_lm(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    K: jnp.ndarray,
    rvec0: jnp.ndarray,
    tvec0: jnp.ndarray,
    dist: jnp.ndarray | None = None,
    weights: jnp.ndarray | None = None,
    iters: int = 20,
):
    """Levenberg-Marquardt refinement of (rvec, tvec) on reprojection error.

    Fixed-iteration lax.scan with multiplicative damping; jnp equivalent of
    cv2.solvePnPRefineLM. Returns (rvec, tvec, final_cost).
    """
    N = object_points.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=object_points.dtype)
    if dist is None:
        dist = jnp.zeros((5,), dtype=object_points.dtype)
    params0 = jnp.concatenate([rvec0.reshape(3), tvec0.reshape(3)])

    res_fn = lambda p: _reproj_residuals(p, object_points, image_points, K, dist, weights)
    jac_fn = jax.jacfwd(res_fn)

    def step(carry, _):
        params, lam = carry
        r = res_fn(params)
        J = jac_fn(params)
        JtJ = J.T @ J
        g = J.T @ r
        H = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-9)
        delta = jnp.linalg.solve(H, g)
        new_params = params - delta
        new_cost = jnp.sum(res_fn(new_params) ** 2)
        cost = jnp.sum(r**2)
        improved = new_cost < cost
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-10, 1e8)
        return (params, lam), cost

    (params, _), _ = jax.lax.scan(step, (params0, jnp.asarray(1e-3)), None, length=iters)
    final_cost = jnp.sum(res_fn(params) ** 2)
    return params[:3], params[3:], final_cost


@functools.partial(jax.jit, static_argnames=("refine_iters",))
def solve_pnp(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    dist: jnp.ndarray | None = None,
    refine_iters: int = 20,
):
    """Non-robust PnP (cv2.solvePnP + solvePnPRefineLM equivalent).

    Runs all three initializers (DLT + two planar roots), LM-polishes each,
    and returns the lowest-reprojection-cost pose as (rvec, tvec, cost).
    """
    N = object_points.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=object_points.dtype)
    if dist is None:
        dist = jnp.zeros((5,), dtype=object_points.dtype)
    r_dlt, t_dlt = solve_pnp_dlt(object_points, image_points, K, weights)
    (r_p1, t_p1), (r_p2, t_p2) = solve_pnp_planar(object_points, image_points, K, weights)
    cand_r = jnp.stack([r_dlt, r_p1, r_p2])
    cand_t = jnp.stack([t_dlt, t_p1, t_p2])

    def polish(r0, t0):
        return refine_pnp_lm(
            object_points, image_points, K, r0, t0,
            dist=dist, weights=weights, iters=refine_iters,
        )

    rs, ts, costs = jax.vmap(polish)(cand_r, cand_t)
    b = jnp.argmin(costs)
    return rs[b], ts[b], costs[b]


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "min_points", "refine_iters")
)
def solve_pnp_ransac(
    object_points: jnp.ndarray,
    image_points: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    dist: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    n_hypotheses: int = 32,
    min_points: int = 6,
    inlier_threshold_px: float = 8.0,
    refine_iters: int = 10,
):
    """RANSAC PnP with static shapes: vmapped hypothesis scoring.

    Each hypothesis solves DLT on a random weighted subset of `min_points`
    points, scores inliers by reprojection error, and the best hypothesis is
    LM-refined on its inliers. Returns dict(rvec, tvec, inlier_mask,
    n_inliers, success).

    `weights` zero-disables low-confidence points up front (the reference's
    confidence >= 0.6, >= 4 points gate becomes: success requires >= 4
    inliers among nonzero-weight points).
    """
    N = object_points.shape[0]
    if weights is None:
        weights = jnp.ones((N,), dtype=object_points.dtype)
    if dist is None:
        dist = jnp.zeros((5,), dtype=object_points.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)

    # Sample hypothesis subsets favouring valid points. Gumbel top-k gives a
    # weighted sample without replacement, statically shaped.
    keys = jax.random.split(key, n_hypotheses)

    def one_hypothesis(k):
        g = jax.random.gumbel(k, (N,))
        logits = jnp.where(weights > 0, g, -jnp.inf)
        _, sel = jax.lax.top_k(logits, min_points)
        sel_w = jnp.zeros((N,), dtype=object_points.dtype).at[sel].set(1.0)
        sel_w = sel_w * jnp.where(weights > 0, 1.0, 0.0)
        # Three initializers per subset: general DLT + both planar roots
        # (FK chains are often near-coplanar, where DLT alone degenerates).
        r_dlt, t_dlt = solve_pnp_dlt(object_points, image_points, K, sel_w)
        (r_p1, t_p1), (r_p2, t_p2) = solve_pnp_planar(
            object_points, image_points, K, sel_w
        )
        cand_r = jnp.stack([r_dlt, r_p1, r_p2])
        cand_t = jnp.stack([t_dlt, t_p1, t_p2])

        def polish_and_score(r0, t0):
            r, t, _ = refine_pnp_lm(
                object_points, image_points, K, r0, t0,
                dist=dist, weights=sel_w, iters=8,
            )
            proj = project_points(object_points, r, t, K, dist)
            err = jnp.linalg.norm(proj - image_points, axis=-1)
            inl = (err < inlier_threshold_px) & (weights > 0)
            # Tie-break equal inlier counts by inlier reprojection error.
            mean_err = jnp.sum(jnp.where(inl, err, 0.0)) / (jnp.sum(inl) + 1e-6)
            return r, t, inl, jnp.sum(inl).astype(jnp.float32) - 1e-3 * mean_err

        rs, ts, inls, scs = jax.vmap(polish_and_score)(cand_r, cand_t)
        b = jnp.argmax(scs)
        return rs[b], ts[b], inls[b], scs[b]

    rvecs, tvecs, inlier_masks, scores = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(scores)
    rvec = rvecs[best]
    tvec = tvecs[best]
    inlier_mask = inlier_masks[best]
    inlier_w = inlier_mask.astype(object_points.dtype)

    rvec, tvec, _ = refine_pnp_lm(
        object_points,
        image_points,
        K,
        rvec,
        tvec,
        dist=dist,
        weights=inlier_w,
        iters=refine_iters,
    )
    # Recount inliers after refinement.
    proj = project_points(object_points, rvec, tvec, K, dist)
    err = jnp.linalg.norm(proj - image_points, axis=-1)
    inlier_mask = (err < inlier_threshold_px) & (weights > 0)
    n_inliers = jnp.sum(inlier_mask)
    return {
        "rvec": rvec,
        "tvec": tvec,
        "inlier_mask": inlier_mask,
        "n_inliers": n_inliers,
        "success": n_inliers >= 4,
    }
