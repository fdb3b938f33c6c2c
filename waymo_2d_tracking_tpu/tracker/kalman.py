"""Vectorized constant-velocity Kalman filter (component C15).

The reference runs a per-track Python/numpy predict/update loop on the host
(SURVEY.md §3.1 hot loops); here both steps are batched across the whole
fixed-capacity slot table as single einsums — S tracks cost the same dispatch
as one.

State per track: 8-dim [cx, cy, w, h, vcx, vcy, vw, vh], dt = 1 frame.
Measurement: [cx, cy, w, h]. Noise scales with box height (SORT-family
convention: uncertainty proportional to object scale).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import KalmanConfig

STATE_DIM = 8
MEAS_DIM = 4


def transition_matrix() -> jnp.ndarray:
    """F: position += velocity (dt=1)."""
    f = jnp.eye(STATE_DIM, dtype=jnp.float32)
    return f.at[:MEAS_DIM, MEAS_DIM:].set(jnp.eye(MEAS_DIM, dtype=jnp.float32))


def _process_noise_diag(h: jnp.ndarray, cfg: KalmanConfig) -> jnp.ndarray:
    """Q diagonal, (..., 8). Scales with current box height h."""
    pos = (cfg.std_weight_position * h) ** 2
    vel = (cfg.std_weight_velocity * h) ** 2
    return jnp.stack([pos, pos, pos, pos, vel, vel, vel, vel], axis=-1)


def _measurement_noise_diag(h: jnp.ndarray, cfg: KalmanConfig) -> jnp.ndarray:
    """R diagonal, (..., 4)."""
    m = (cfg.std_weight_measurement * h) ** 2
    return jnp.stack([m, m, m, m], axis=-1)


def init_track(meas: jnp.ndarray, cfg: KalmanConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initialize (mean, cov) from measurements. meas: (..., 4) -> (..., 8), (..., 8, 8)."""
    mean = jnp.concatenate([meas, jnp.zeros_like(meas)], axis=-1)
    h = jnp.maximum(meas[..., 3], 1.0)
    pos_std = cfg.std_weight_position * h
    vel_std = cfg.std_weight_velocity * h * cfg.init_velocity_std
    diag = jnp.stack(
        [pos_std, pos_std, pos_std, pos_std, vel_std, vel_std, vel_std, vel_std],
        axis=-1,
    )
    cov = jnp.eye(STATE_DIM, dtype=meas.dtype) * (diag[..., None, :] ** 2)
    return mean, cov


def predict(
    mean: jnp.ndarray, cov: jnp.ndarray, cfg: KalmanConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched predict. mean (..., 8), cov (..., 8, 8).

    F = [[I, I], [0, I]] is a structured selector, so F P F^T is computed as
    exact block additions instead of dense matmuls (dense einsum here silently
    ran at bf16 matmul precision on TPU — found via batched-vs-single test).
    """
    new_mean = jnp.concatenate(
        [mean[..., :MEAS_DIM] + mean[..., MEAS_DIM:], mean[..., MEAS_DIM:]], axis=-1
    )
    a = cov[..., :MEAS_DIM, :MEAS_DIM]
    b = cov[..., :MEAS_DIM, MEAS_DIM:]
    c = cov[..., MEAS_DIM:, :MEAS_DIM]
    d = cov[..., MEAS_DIM:, MEAS_DIM:]
    # F P F^T = [[A+B+C+D, B+D], [C+D, D]]
    top = jnp.concatenate([a + b + c + d, b + d], axis=-1)
    bot = jnp.concatenate([c + d, d], axis=-1)
    new_cov = jnp.concatenate([top, bot], axis=-2)
    h = jnp.maximum(mean[..., 3], 1.0)
    q = _process_noise_diag(h, cfg)
    new_cov = new_cov + jnp.eye(STATE_DIM, dtype=cov.dtype) * q[..., None, :]
    return new_mean, new_cov


def update(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    meas: jnp.ndarray,
    cfg: KalmanConfig,
    score: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched measurement update. meas (..., 4).

    H is a pure selector of the first 4 state dims, so the innovation math uses
    slices instead of H-matmuls:
      S = P[:4,:4] + R ;  K = P[:,:4] S^-1 ;  x' = x + K y ;  P' = (I - K H) P.

    With ``cfg.nsa`` and a ``score`` (...,) given, R is scaled by
    ``1 - score`` (NSA Kalman, StrongSORT): a score-1.0 detection is trusted
    (almost) exactly, a borderline one barely moves the state. The 1e-3 floor
    keeps S strictly positive definite at score == 1.
    """
    h_meas = jnp.maximum(meas[..., 3], 1.0)
    r = _measurement_noise_diag(h_meas, cfg)
    if cfg.nsa and score is not None:
        r = r * jnp.maximum(1.0 - score, 1e-3)[..., None]

    p_xz = cov[..., :, :MEAS_DIM]                      # (..., 8, 4)
    s = cov[..., :MEAS_DIM, :MEAS_DIM] + jnp.eye(MEAS_DIM, dtype=cov.dtype) * r[..., None, :]
    # K = P[:, :4] @ inv(S): solve S^T K^T = P_xz^T; S symmetric -> solve(S, P_xz^T)^T
    k = jnp.swapaxes(jnp.linalg.solve(s, jnp.swapaxes(p_xz, -1, -2)), -1, -2)  # (..., 8, 4)
    innovation = meas - mean[..., :MEAS_DIM]
    hp = jax.lax.Precision.HIGHEST
    new_mean = mean + jnp.einsum("...ij,...j->...i", k, innovation, precision=hp)
    # (I - K H) P = P - K @ P[:4, :]  (H selects the first 4 state dims)
    new_cov = cov - jnp.einsum(
        "...ij,...jk->...ik", k, cov[..., :MEAS_DIM, :], precision=hp
    )
    return new_mean, new_cov


def gating_distance(
    mean: jnp.ndarray, cov: jnp.ndarray, meas: jnp.ndarray,
    cfg: KalmanConfig = KalmanConfig(),
) -> jnp.ndarray:
    """Squared Mahalanobis distance of measurements to track predictions.

    mean (..., S, 8), cov (..., S, 8, 8), meas (..., D, 4) -> (..., S, D).
    Used for chi-square motion gating of the association cost
    (DeepSORT-style). The innovation covariance is the PROJECTED one,
    HPH^T + R with R from the track's predicted height — omitting R
    (review r4) made the statistic ~2x the DeepSORT convention for a
    converged track (whose P[:4,:4] is comparable to R), so true matches
    with ordinary measurement noise blew the chi2-95% gate the
    motion_gate default encodes, fragmenting tracks.
    """
    h_trk = jnp.maximum(mean[..., 3], 1.0)                       # (..., S)
    r = _measurement_noise_diag(h_trk, cfg)                      # (..., S, 4)
    s = cov[..., :MEAS_DIM, :MEAS_DIM] + (
        jnp.eye(MEAS_DIM, dtype=cov.dtype) * r[..., None, :]
    )                                                            # (..., S, 4, 4)
    diff = meas[..., None, :, :] - mean[..., :, None, :MEAS_DIM]  # (..., S, D, 4)
    chol = jnp.linalg.cholesky(
        s + 1e-6 * jnp.eye(MEAS_DIM, dtype=s.dtype)
    )
    # d^2 = diff^T S^-1 diff = ||L^-1 diff||^2; generic solve on (4,4) is cheap
    z = jnp.linalg.solve(chol[..., None, :, :], diff[..., None])
    return jnp.sum(jnp.squeeze(z, -1) ** 2, axis=-1)
