"""Post-process kernels vs numpy oracles (reference test strategy analog:
oracle comparison, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.kernels import bloom, blur, histogram, sampling, tonemap


def _rand_img(h, w, c=3, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, scale, size=(h, w, c)).astype(np.float32))


# --- histogram -------------------------------------------------------------


def _hist_oracle(img, min_log=-10.0, rng_=12.0):
    lum = img[..., 0] * 0.2125 + img[..., 1] * 0.7154 + img[..., 2] * 0.0721
    lum = np.asarray(lum)
    bins = np.zeros(lum.shape, dtype=np.int32)
    mask = lum >= 0.005
    ll = np.clip((np.log2(np.maximum(lum, 1e-12)) - min_log) / rng_, 0, 1)
    bins[mask] = (ll[mask] * 254.0 + 1.0).astype(np.int32)
    return np.bincount(bins.ravel(), minlength=256).astype(np.float32)


def test_luminance_histogram_matches_oracle():
    img = _rand_img(64, 96, scale=8.0)
    got = np.asarray(histogram.luminance_histogram(img))
    want = _hist_oracle(np.asarray(img))
    assert got.shape == (256,)
    np.testing.assert_allclose(got, want, atol=1.0)  # float-boundary slack
    assert abs(got.sum() - 64 * 96) < 1e-3


def test_histogram_black_image():
    img = jnp.zeros((32, 128, 3))
    got = np.asarray(histogram.luminance_histogram(img))
    assert got[0] == 32 * 128
    assert got[1:].sum() == 0


def test_adapt_average_luminance_converges():
    img = jnp.full((64, 128, 3), 0.5)
    hist = histogram.luminance_histogram(img)
    avg = jnp.asarray(0.0)
    for _ in range(60):
        avg = histogram.adapt_average_luminance(hist, avg, 64 * 128, dt=0.5)
    lum = 0.5 * sum([0.2125, 0.7154, 0.0721])
    # converges near the scene luminance (within histogram quantization)
    assert 0.5 * lum < float(avg) < 2.0 * lum


# --- blur ------------------------------------------------------------------


def test_gaussian_blur_preserves_constant():
    img = jnp.full((40, 56, 3), 3.25)
    out = blur.gaussian_blur(img, radius=8)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-5)


def test_gaussian_blur_smooths_impulse():
    img = jnp.zeros((33, 33)).at[16, 16].set(1.0)
    out = np.asarray(blur.gaussian_blur(img, radius=6))
    assert out[16, 16] < 1.0
    assert out.sum() > 0.99  # energy preserving
    assert out[16, 11] > 0  # spread along x (radius-1 texels)
    assert out[11, 16] > 0  # spread along y


def test_evsm_blur_independent_radii():
    m = _rand_img(32, 32, 4, seed=3)
    out = blur.evsm_blur(m, radius_pos=1, radius_neg=8, axis=1)
    # radius 1 = identity-ish (w0=1), radius 8 definitely changes values
    np.testing.assert_allclose(np.asarray(out[..., :2]), np.asarray(m[..., :2]), atol=1e-5)
    assert np.abs(np.asarray(out[..., 2:]) - np.asarray(m[..., 2:])).max() > 1e-3


# --- bloom -----------------------------------------------------------------


def test_bloom_threshold_kills_dark():
    img = jnp.full((64, 64, 3), 0.1)
    out = np.asarray(bloom.bloom(img, threshold=1.0, knee=0.1))
    assert out.max() < 0.01


def test_bloom_bright_spot_spreads():
    img = jnp.zeros((64, 64, 3)).at[32, 32].set(50.0)
    out = np.asarray(bloom.bloom(img, threshold=1.0))
    assert out[32, 32].max() > 0
    assert out[40, 40].max() > 0  # energy reached 8px away
    assert out.min() >= 0


def test_downsample_13tap_constant():
    img = jnp.full((32, 32, 3), 2.0)
    out = np.asarray(bloom.downsample_13tap(img))
    # karis-weighted sum of a constant: 5 taps of karis(2.0 .. weights)
    assert out.shape == (16, 16, 3)
    assert np.allclose(out, out[0, 0]), "constant image stays constant"


# --- sampling --------------------------------------------------------------


def test_bilinear_matches_nearest_at_centers():
    img = _rand_img(16, 16, 3, seed=5)
    ys, xs = jnp.meshgrid(
        (jnp.arange(16) + 0.5) / 16, (jnp.arange(16) + 0.5) / 16, indexing="ij"
    )
    uv = jnp.stack([xs, ys], axis=-1)
    out = sampling.sample_bilinear(img, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_blit_identity_and_resize():
    img = _rand_img(32, 48, 3, seed=6)
    same = sampling.blit(img, (32, 48))
    assert same is img
    up = sampling.blit(img, (64, 96))
    assert up.shape == (64, 96, 3)
    # average preserved approximately under bilinear resize
    np.testing.assert_allclose(float(up.mean()), float(img.mean()), rtol=0.02)


def test_min_pyramid():
    depth = _rand_img(64, 64, 1, seed=7)[..., 0]
    mips = sampling.build_min_pyramid(depth, 4)
    assert len(mips) == 4
    assert mips[-1].shape == (8, 8)
    assert float(mips[-1].min()) == float(depth.min())


def test_wrap_modes():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    uv = jnp.asarray([[1.1, 0.1]])  # u out of range
    rep = sampling.sample_nearest(img, uv, wrap="repeat")
    clm = sampling.sample_nearest(img, uv, wrap="clamp")
    assert float(rep[0]) == 0.0  # wraps to x=0
    assert float(clm[0]) == 3.0  # clamps to x=3


# --- tonemap oracle --------------------------------------------------------


def test_tonemap_modes_monotonic():
    x = jnp.linspace(0.0, 20.0, 128)[:, None] * jnp.ones((1, 3))
    for mode in ("aces", "uncharted2", "reinhard"):
        y = np.asarray(tonemap.tonemap(x, 0.18, mode=mode))
        assert (np.diff(y[:, 0]) >= -1e-4).all(), f"{mode} not monotonic"
        assert y.min() >= 0.0
        if mode != "uncharted2":  # filmic exceeds 1 past whitepoint (LDR clamp downstream)
            assert y.max() <= 1.01


def test_tonemap_luminance_mode_preserves_chroma():
    from sailor_tpu.core import math3d as m3

    c = jnp.asarray([[[2.0, 0.5, 0.25]]])
    out = tonemap.tonemap(c, 0.18, mode="aces", luminance_only=True)
    yxy_in = m3.rgb_to_yxy(c)
    yxy_out = m3.rgb_to_yxy(jnp.clip(out, 1e-4, None))
    np.testing.assert_allclose(
        np.asarray(yxy_out[..., 1:]), np.asarray(yxy_in[..., 1:]), atol=5e-3
    )


# --- gather-free pow2 upsampler ---------------------------------------------


def test_upsample_pow2_matches_blit_exact_factor():
    for c in (None, 3):
        src = _rand_img(8, 12, c=c or 1, seed=3)
        if c is None:
            src = src[..., 0]
        up = np.asarray(sampling.upsample_bilinear_pow2(src, (16, 24)))
        ref = np.asarray(sampling.blit(src, (16, 24)))
        assert up.shape == ref.shape
        np.testing.assert_allclose(up, ref, atol=1e-5)


def test_upsample_pow2_4x_and_crop():
    src = _rand_img(7, 9, c=3, seed=4)
    # ceil-division subsample of a 26x34 frame at stride 4 gives 7x9
    up = np.asarray(sampling.upsample_bilinear_pow2(src, (26, 34)))
    assert up.shape == (26, 34, 3)
    ref = np.asarray(sampling.blit(src, (28, 36)))[:26, :34]
    np.testing.assert_allclose(up, ref, atol=1e-5)


def test_upsample_pow2_constant_preserved():
    src = jnp.full((5, 6), 2.5)
    up = np.asarray(sampling.upsample_bilinear_pow2(src, (10, 12)))
    np.testing.assert_allclose(up, 2.5, atol=1e-6)


# --- sun shafts + lens dirt ---------------------------------------------------


def test_sun_shafts_brighten_toward_visible_sun():
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels import postprocess as pp

    h, w = 64, 96
    color = jnp.zeros((h, w, 3))
    depth = jnp.zeros((h, w))  # all sky
    # camera looking straight at the sun: -Z forward, sun shining along -Z?
    # sun_direction points FROM sun TOWARD scene; camera looks down -Z, so a
    # sun in front has direction +Z-ish... build view/proj via look_at.
    cam = jnp.asarray([0.0, 0.0, 0.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, w / h, 0.1, 100.0)
    vp = proj @ view
    sun_dir = m3.normalize(jnp.asarray([0.0, -0.1, 1.0]))  # shining toward +z => sun at -z
    out = pp.sun_shafts(color, depth, vp, sun_dir, jnp.asarray([1.0, 1.0, 1.0]),
                        intensity=0.5, num_samples=8)
    out = np.asarray(out)
    assert out.max() > 0.01  # visible glow
    # sun behind the camera: no glow
    out_b = np.asarray(pp.sun_shafts(
        color, depth, vp, m3.normalize(jnp.asarray([0.0, -0.1, -1.0])),
        jnp.asarray([1.0, 1.0, 1.0]), intensity=0.5, num_samples=8))
    assert out_b.max() < 1e-6
    # fully occluded sky (depth > 0 everywhere): no glow
    out_o = np.asarray(pp.sun_shafts(
        color, jnp.ones((h, w)), vp, sun_dir, jnp.asarray([1.0, 1.0, 1.0]),
        intensity=0.5, num_samples=8))
    assert out_o.max() < 1e-6


def test_bloom_lens_dirt_modulates():
    from sailor_tpu.kernels import bloom as bloom_k

    img = jnp.zeros((64, 64, 3)).at[28:36, 28:36].set(6.0)  # bright blob
    plain = np.asarray(bloom_k.bloom(img))
    dirt = bloom_k.lens_dirt(64, 64)
    dirty = np.asarray(bloom_k.bloom(img, dirt=dirt, dirt_intensity=1.0))
    assert (dirty >= plain - 1e-6).all()      # dirt only adds
    assert dirty.sum() > plain.sum() * 1.02   # and measurably
    d = np.asarray(dirt)[..., 0]
    assert d.min() >= 0.0 and d.max() <= 1.0 and d.std() > 0.05
