"""Two-view geometry estimation + configuration classification.

Parity with src/estimators/two_view_geometry.{h,cc}: estimate E, F and H with
(LO-)RANSAC, classify the pair configuration from relative inlier support, and
recover the relative pose for calibrated pairs. The three RANSAC banks run as
three batched device programs (ops/ransac.py).

Configurations (two_view_geometry.h:48-66):
  DEGENERATE, CALIBRATED, UNCALIBRATED, PLANAR, PANORAMIC,
  PLANAR_OR_PANORAMIC, WATERMARK (not detected — needs border heuristics,
  off by default in the reference), MULTIPLE (not detected).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera_models as cm
from ..ops import ransac as ransac_ops
from ..ops import se3, solvers

DEGENERATE = 0
CALIBRATED = 1
UNCALIBRATED = 2
PLANAR = 3
PANORAMIC = 4
PLANAR_OR_PANORAMIC = 5
WATERMARK = 6
MULTIPLE = 7


@dataclass
class TwoViewOptions:
    min_num_inliers: int = 15
    max_error: float = 4.0  # px
    num_hypotheses: int = 2048
    # H inlier ratio above which the pair is planar/panoramic
    max_H_inlier_ratio: float = 0.8
    # E must explain nearly as many inliers as F to call it calibrated
    min_E_F_inlier_ratio: float = 0.95
    compute_relative_pose: bool = True


@dataclass
class TwoViewGeometry:
    config: int = DEGENERATE
    E: Optional[np.ndarray] = None
    F: Optional[np.ndarray] = None
    H: Optional[np.ndarray] = None
    inlier_matches: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.int32))
    # relative pose (world = cam1 frame), |t| = 1
    qvec: Optional[np.ndarray] = None
    tvec: Optional[np.ndarray] = None
    tri_angle: float = 0.0


def estimate_two_view_geometry(
    uv1: np.ndarray,  # [N,2] pixel coords of matched features in image 1
    uv2: np.ndarray,  # [N,2] matched coords in image 2 (row-aligned with uv1)
    params1: np.ndarray,
    params2: np.ndarray,
    model_id1: int,
    model_id2: int,
    opts: TwoViewOptions = TwoViewOptions(),
    seed: int = 0,
) -> TwoViewGeometry:
    """uv1[i] <-> uv2[i] are matched pairs (from ops/matching)."""
    N = uv1.shape[0]
    out = TwoViewGeometry()
    if N < 8:
        return out
    from ..ops import np_geom

    valid = jnp.ones((N,), jnp.float32)
    uv1j = jnp.asarray(uv1, jnp.float32)
    uv2j = jnp.asarray(uv2, jnp.float32)
    # normalized coords for E (host-side undistortion: no device round-trips)
    n1 = jnp.asarray(np_geom.image_to_world(model_id1, params1, uv1), jnp.float32)
    n2 = jnp.asarray(np_geom.image_to_world(model_id2, params2, uv2), jnp.float32)
    p1 = np.asarray(params1)
    p2 = np.asarray(params2)
    fi1 = cm._FOCAL_IDX[model_id1]
    fi2 = cm._FOCAL_IDX[model_id2]
    f_mean = float(np.mean([p1[fi1[0]], p1[fi1[1]], p2[fi2[0]], p2[fi2[1]]]))

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    ro = ransac_ops.RansacOptions(max_error=opts.max_error, num_hypotheses=opts.num_hypotheses)
    ro_norm = ransac_ops.RansacOptions(
        max_error=opts.max_error / f_mean, num_hypotheses=opts.num_hypotheses
    )
    resE = ransac_ops.ransac_essential(n1, n2, valid, k1, ro_norm)
    resF = ransac_ops.ransac_fundamental(uv1j, uv2j, valid, k2, ro)
    resH = ransac_ops.ransac_homography(uv1j, uv2j, valid, k3, ro)
    nE, nF, nH = int(resE.num_inliers), int(resF.num_inliers), int(resH.num_inliers)

    out.E = np.asarray(resE.model)
    out.F = np.asarray(resF.model)
    out.H = np.asarray(resH.model)

    if max(nE, nF) < opts.min_num_inliers:
        out.config = DEGENERATE
        return out

    if nE >= opts.min_E_F_inlier_ratio * nF and nE >= opts.min_num_inliers:
        config = CALIBRATED
        best_mask = np.asarray(resE.inlier_mask)
        n_best = nE
    else:
        config = UNCALIBRATED
        best_mask = np.asarray(resF.inlier_mask)
        n_best = nF

    if nH > opts.max_H_inlier_ratio * n_best:
        config = PLANAR_OR_PANORAMIC

    rows = np.nonzero(best_mask)[0]
    out.inlier_matches = np.stack([rows, rows], axis=-1).astype(np.int32)
    out.config = config

    if opts.compute_relative_pose and config == CALIBRATED:
        q, t, ang, z1, z2 = _pose_recovery(
            jnp.asarray(out.E, jnp.float32), n1, n2,
            jnp.asarray(best_mask.astype(np.float32)),
        )
        out.qvec = np.asarray(q)
        out.tvec = np.asarray(t)
        ang, z1, z2 = np.asarray(ang), np.asarray(z1), np.asarray(z2)
        ok = best_mask & (z1 > 0) & (z2 > 0)
        if ok.sum() > 0:
            out.tri_angle = float(np.median(ang[ok]))
    return out


@jax.jit
def _pose_recovery(E, n1, n2, mask):
    """Pose from E + per-match triangulation angles, one compiled program
    (median tri angle gates init pairs, two_view_geometry.cc tail)."""
    N = n1.shape[0]
    q, t = solvers.decompose_essential(E, n1, n2, mask)
    P1 = solvers.proj_matrix(jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3))
    P2 = solvers.proj_matrix(q, t)
    X = solvers.triangulate_dlt(
        jnp.broadcast_to(P1, (N, 3, 4)), jnp.broadcast_to(P2, (N, 3, 4)), n1, n2
    )
    c2 = se3.projection_center(q, t)
    ang = solvers.triangulation_angle(jnp.zeros(3), c2, X)
    z2 = se3.se3_apply(q, t, X)[:, 2]
    return q, t, ang, X[:, 2], z2
