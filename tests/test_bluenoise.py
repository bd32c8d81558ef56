"""Blue-noise sample table (PathTracer.cpp BlueNoiseData analog): the
void-and-cluster mask must be a uniform permutation with blue spectrum
(neighbors maximally different), and the tracer consumes it per pixel."""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.raytracing import bluenoise


def test_mask_is_uniform_permutation():
    m = bluenoise.blue_noise_mask(32)
    assert m.shape == (32, 32)
    # ranks are a permutation of (i + 0.5) / n
    vals = np.sort(m.ravel())
    expect = (np.arange(32 * 32) + 0.5) / (32 * 32)
    np.testing.assert_allclose(vals, expect, atol=1e-7)


def test_mask_is_blue():
    m = bluenoise.blue_noise_mask(32)
    # mean |difference to 4-neighbors| much higher than white noise's 1/3
    d = 0.0
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        d += np.abs(m - np.roll(m, sh, axis=ax)).mean()
    d /= 4
    rng = np.random.default_rng(0)
    w = rng.random((32, 32))
    dw = sum(
        np.abs(w - np.roll(w, sh, axis=ax)).mean()
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1))
    ) / 4
    assert d > dw * 1.25, (d, dw)


def test_pixel_jitter_and_rotation():
    u, v = bluenoise.pixel_jitter(70, 90)
    assert u.shape == (70, 90) and v.shape == (70, 90)
    assert not np.allclose(u, v)
    ju0, jv0 = bluenoise.rotate((jnp.asarray(u), jnp.asarray(v)), 0)
    ju1, jv1 = bluenoise.rotate((jnp.asarray(u), jnp.asarray(v)), 1)
    assert float(jnp.abs(ju0 - ju1).mean()) > 0.05
    assert float(ju1.min()) >= 0.0 and float(ju1.max()) < 1.0
