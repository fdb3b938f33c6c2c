"""Unit tests for tracker/kalman.py (C15) — vs a hand-rolled numpy filter."""
import numpy as np
import jax.numpy as jnp

from waymo_2d_tracking_tpu.config import KalmanConfig
from waymo_2d_tracking_tpu.tracker import kalman

CFG = KalmanConfig()


def np_filter_steps(meas_seq, cfg=CFG):
    """Oracle: textbook KF with the same noise model, plain numpy."""
    f = np.eye(8)
    f[:4, 4:] = np.eye(4)
    h = np.zeros((4, 8))
    h[:4, :4] = np.eye(4)

    z0 = meas_seq[0]
    x = np.concatenate([z0, np.zeros(4)])
    hgt = max(z0[3], 1.0)
    pos_std = cfg.std_weight_position * hgt
    vel_std = cfg.std_weight_velocity * hgt * cfg.init_velocity_std
    p = np.diag([pos_std] * 4 + [vel_std] * 4) ** 2

    means, covs = [x.copy()], [p.copy()]
    for z in meas_seq[1:]:
        # predict
        hgt = max(x[3], 1.0)
        q = np.diag(
            [(cfg.std_weight_position * hgt) ** 2] * 4
            + [(cfg.std_weight_velocity * hgt) ** 2] * 4
        )
        x = f @ x
        p = f @ p @ f.T + q
        # update
        hm = max(z[3], 1.0)
        r = np.eye(4) * (cfg.std_weight_measurement * hm) ** 2
        s = h @ p @ h.T + r
        k = p @ h.T @ np.linalg.inv(s)
        x = x + k @ (z - h @ x)
        p = (np.eye(8) - k @ h) @ p
        means.append(x.copy())
        covs.append(p.copy())
    return np.stack(means), np.stack(covs)


def jax_filter_steps(meas_seq, cfg=CFG):
    mean, cov = kalman.init_track(jnp.asarray(meas_seq[0]), cfg)
    means, covs = [np.asarray(mean)], [np.asarray(cov)]
    for z in meas_seq[1:]:
        mean, cov = kalman.predict(mean, cov, cfg)
        mean, cov = kalman.update(mean, cov, jnp.asarray(z), cfg)
        means.append(np.asarray(mean))
        covs.append(np.asarray(cov))
    return np.stack(means), np.stack(covs)


def test_100_steps_vs_numpy_oracle():
    rng = np.random.default_rng(0)
    # object moving with constant velocity + noise
    t = np.arange(100)
    cx = 100 + 3.0 * t + rng.normal(0, 1, 100)
    cy = 200 + 1.5 * t + rng.normal(0, 1, 100)
    w = 50 + rng.normal(0, 0.5, 100)
    h = 80 + rng.normal(0, 0.5, 100)
    meas = np.stack([cx, cy, w, h], axis=1).astype(np.float32)

    m_np, p_np = np_filter_steps(meas)
    m_jx, p_jx = jax_filter_steps(meas)
    # f32 device filter vs f64 numpy oracle: drift accumulates over 100 steps
    np.testing.assert_allclose(m_jx, m_np, atol=1e-2, rtol=2e-2)
    np.testing.assert_allclose(p_jx, p_np, atol=1e-2, rtol=2e-2)


def test_velocity_estimation_converges():
    meas = np.stack(
        [100 + 5.0 * np.arange(50), np.full(50, 200.0), np.full(50, 40.0), np.full(50, 60.0)],
        axis=1,
    ).astype(np.float32)
    m, _ = jax_filter_steps(meas)
    assert abs(m[-1, 4] - 5.0) < 0.2  # vcx -> 5
    assert abs(m[-1, 5]) < 0.2        # vcy -> 0


def test_batched_matches_single():
    """predict/update over a (S,) batch must equal per-track application."""
    rng = np.random.default_rng(1)
    meas0 = rng.uniform(50, 200, size=(6, 4)).astype(np.float32)
    meas1 = meas0 + rng.normal(0, 1, size=(6, 4)).astype(np.float32)

    mean_b, cov_b = kalman.init_track(jnp.asarray(meas0), CFG)
    mean_b, cov_b = kalman.predict(mean_b, cov_b, CFG)
    mean_b, cov_b = kalman.update(mean_b, cov_b, jnp.asarray(meas1), CFG)

    for i in range(6):
        m, p = kalman.init_track(jnp.asarray(meas0[i]), CFG)
        m, p = kalman.predict(m, p, CFG)
        m, p = kalman.update(m, p, jnp.asarray(meas1[i]), CFG)
        np.testing.assert_allclose(np.asarray(mean_b[i]), np.asarray(m), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cov_b[i]), np.asarray(p), atol=1e-5)


def test_gating_distance_small_for_true_measurement():
    meas0 = jnp.asarray(np.array([[100.0, 100.0, 40.0, 60.0]], dtype=np.float32))
    mean, cov = kalman.init_track(meas0, CFG)
    mean, cov = kalman.predict(mean, cov, CFG)
    near = jnp.asarray(np.array([[101.0, 100.0, 40.0, 60.0]], dtype=np.float32))
    far = jnp.asarray(np.array([[500.0, 500.0, 40.0, 60.0]], dtype=np.float32))
    d_near = kalman.gating_distance(mean, cov, near)
    d_far = kalman.gating_distance(mean, cov, far)
    assert float(d_near[0, 0]) < float(d_far[0, 0])
    assert float(d_near[0, 0]) < 9.4877  # chi2 0.95 quantile, 4 dof
