"""Kalman filter vs a NumPy DeepSORT-style oracle."""

import numpy as np
import jax.numpy as jnp

from strongsort_yolo_tpu.track import kalman as K


class OracleKF:
    """Straight NumPy transcription of the DeepSORT constant-velocity
    KF spec (std_weight_position=1/20, std_weight_velocity=1/160),
    XYWH form."""

    def __init__(self):
        self.swp, self.swv = 1.0 / 20, 1.0 / 160
        self.F = np.eye(8)
        self.F[:4, 4:] = np.eye(4)
        self.H = np.eye(4, 8)

    def initiate(self, m):
        mean = np.r_[m, np.zeros(4)]
        w, h = m[2], m[3]
        std = [
            2 * self.swp * w, 2 * self.swp * h, 2 * self.swp * w, 2 * self.swp * h,
            10 * self.swv * w, 10 * self.swv * h, 10 * self.swv * w, 10 * self.swv * h,
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        w, h = mean[2], mean[3]
        std = [
            self.swp * w, self.swp * h, self.swp * w, self.swp * h,
            self.swv * w, self.swv * h, self.swv * w, self.swv * h,
        ]
        q = np.diag(np.square(std))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov, conf=None):
        w, h = mean[2], mean[3]
        std = [self.swp * w, self.swp * h, self.swp * w, self.swp * h]
        r = np.diag(np.square(std))
        if conf is not None:
            r = r * (1 - conf)
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, m, conf=None):
        pm, s = self.project(mean, cov, conf)
        k = cov @ self.H.T @ np.linalg.inv(s)
        new_mean = mean + k @ (m - pm)
        new_cov = cov - k @ s @ k.T
        return new_mean, new_cov

    def gating(self, mean, cov, ms):
        pm, s = self.project(mean, cov)
        d = ms - pm
        return np.einsum("ni,ij,nj->n", d, np.linalg.inv(s), d)


def test_initiate_matches_oracle():
    o = OracleKF()
    m = np.array([100.0, 50.0, 40.0, 80.0], np.float32)
    om, oc = o.initiate(m)
    jm, jc = K.initiate(jnp.asarray(m), K.XYWH)
    np.testing.assert_allclose(np.asarray(jm), om, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), oc, atol=1e-5)


def test_predict_update_cycle_matches_oracle(rng):
    o = OracleKF()
    m0 = np.array([200.0, 150.0, 60.0, 120.0])
    om, oc = o.initiate(m0)
    jm, jc = K.initiate(jnp.asarray(m0, jnp.float32), K.XYWH)
    for step in range(10):
        om, oc = o.predict(om, oc)
        jm, jc = K.predict(jm, jc, K.XYWH)
        meas = m0 + rng.normal(0, 2.0, 4) + np.array([3.0, 1.0, 0, 0]) * step
        om, oc = o.update(om, oc, meas)
        jm, jc = K.update(jm, jc, jnp.asarray(meas, jnp.float32), K.XYWH)
        np.testing.assert_allclose(np.asarray(jm), om, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(jc), oc, rtol=1e-3, atol=1e-3)


def test_nsa_scales_noise():
    o = OracleKF()
    m0 = np.array([200.0, 150.0, 60.0, 120.0])
    om, oc = o.initiate(m0)
    om, oc = o.predict(om, oc)
    jm0, jc0 = K.initiate(jnp.asarray(m0, jnp.float32), K.XYWH)
    jm0, jc0 = K.predict(jm0, jc0, K.XYWH)
    meas = m0 + 5.0
    om, oc = o.update(om, oc, meas, conf=0.9)
    jm, jc = K.update(
        jm0, jc0, jnp.asarray(meas, jnp.float32), K.XYWH,
        conf=jnp.float32(0.9),
    )
    np.testing.assert_allclose(np.asarray(jm), om, rtol=1e-3, atol=1e-3)
    # high confidence -> tighter noise -> mean closer to measurement
    jm_plain, _ = K.update(jm0, jc0, jnp.asarray(meas, jnp.float32), K.XYWH)
    d_nsa = np.abs(np.asarray(jm)[:4] - meas)
    d_plain = np.abs(np.asarray(jm_plain)[:4] - meas)
    assert np.all(d_nsa <= d_plain + 1e-6)


def test_batched_matches_single(rng):
    ms = rng.uniform(50, 300, (16, 4)).astype(np.float32)
    bm, bc = K.initiate(jnp.asarray(ms), K.XYWH)
    assert bm.shape == (16, 8) and bc.shape == (16, 8, 8)
    bm2, bc2 = K.predict(bm, bc, K.XYWH)
    for i in [0, 7, 15]:
        sm, sc = K.initiate(jnp.asarray(ms[i]), K.XYWH)
        sm, sc = K.predict(sm, sc, K.XYWH)
        np.testing.assert_allclose(np.asarray(bm2[i]), np.asarray(sm), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bc2[i]), np.asarray(sc), rtol=1e-5)


def test_gating_distance_matches_oracle(rng):
    o = OracleKF()
    m0 = np.array([200.0, 150.0, 60.0, 120.0])
    om, oc = o.initiate(m0)
    om, oc = o.predict(om, oc)
    cands = (m0[None] + rng.normal(0, 20, (8, 4))).astype(np.float32)
    want = o.gating(om, oc, cands)
    jm, jc = K.initiate(jnp.asarray(m0, jnp.float32), K.XYWH)
    jm, jc = K.predict(jm, jc, K.XYWH)
    got = np.asarray(
        K.gating_distance(jm[None], jc[None], jnp.asarray(cands), K.XYWH)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_still_mask_zeroes_size_velocity():
    m0 = jnp.asarray([100.0, 100.0, 50.0, 50.0], jnp.float32)
    mean, cov = K.initiate(m0, K.XYWH)
    mean = mean.at[4:].set(jnp.asarray([5.0, 5.0, 2.0, 2.0]))
    m_still, _ = K.predict(
        mean[None], cov[None], K.XYWH, still_mask=jnp.asarray([True])
    )
    # vw, vh zeroed before integrating; position velocity still applies
    assert float(m_still[0, 2]) == 50.0 and float(m_still[0, 3]) == 50.0
    assert float(m_still[0, 0]) == 105.0
