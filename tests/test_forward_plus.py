"""Forward+ light culling + PBR shading tests (synthetic G-buffer)."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import light_culling, pbr
from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, SPOT, Lights

TILE = light_culling.TILE


def _camera(w, h):
    view = m3.look_at(
        jnp.asarray([0.0, 2.0, 5.0]),
        jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.perspective(jnp.pi / 3, w / h, 0.1, 100.0)
    return view, proj


def _ground_gbuffer(w, h, view, proj):
    """Analytic G-buffer: a y=0 ground plane seen by the camera."""
    inv_vp = jnp.linalg.inv(proj @ view)
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack([u * 2 - 1, 1 - v * 2, jnp.full_like(u, 0.5), jnp.ones_like(u)], -1)
    p_far = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_vp, ndc))
    cam = jnp.asarray([0.0, 2.0, 5.0])
    d = m3.normalize(p_far - cam)
    t = -cam[1] / d[..., 1]
    hit = (t > 0) & (d[..., 1] < 0)
    wpos = cam + d * t[..., None]
    return pbr.GBuffer(
        world_position=jnp.where(hit[..., None], wpos, 0.0),
        normal=jnp.where(
            hit[..., None], jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        * jnp.ones_like(wpos),
        albedo=jnp.full((h, w, 4), 0.8),
        metallic=jnp.zeros((h, w)),
        roughness=jnp.full((h, w), 0.5),
        ao=jnp.ones((h, w)),
        emissive=jnp.zeros((h, w, 3)),
        coverage=hit.astype(jnp.float32),
    ), hit, wpos


def test_tile_depth_bounds():
    depth = jnp.arange(32 * 32, dtype=jnp.float32).reshape(32, 32)
    zmin, zmax = light_culling.tile_depth_bounds(depth, 2, 2)
    assert zmin.shape == (2, 2)
    assert float(zmin[0, 0]) == 0.0
    assert float(zmax[1, 1]) == 32 * 32 - 1


def test_cull_point_light_localized():
    w, h = 8 * TILE, 6 * TILE
    view, proj = _camera(w, h)
    # one point light right of center, one far off-screen, one directional
    lights = Lights.from_host(
        types=[POINT, POINT, DIRECTIONAL],
        positions=[[1.5, 0.5, 0.0], [500.0, 0.0, 0.0], [0, 0, 0]],
        directions=[[0, -1, 0], [0, -1, 0], [0, -1, 0]],
        intensities=[[5, 5, 5]] * 3,
        radii=[1.5, 1.5, 0.0],
    )
    gb, hit, wpos = _ground_gbuffer(w, h, view, proj)
    lin_depth = jnp.where(
        hit, -m3.transform_point(view, gb.world_position)[..., 2], 100.0
    )
    idx, counts = light_culling.cull_lights(
        lights, view, jnp.linalg.inv(proj), lin_depth,
        tiles_y=h // TILE, tiles_x=w // TILE, viewport=(w, h), max_per_tile=8,
    )
    counts = np.asarray(counts)
    idx = np.asarray(idx)
    # directional light present in every tile
    assert (counts >= 1).all()
    assert (idx == 2).any(axis=-1).all()
    # off-screen light never selected
    assert not (idx == 1).any()
    # near light selected somewhere, but not everywhere
    sel0 = (idx == 0).any(axis=-1)
    assert sel0.any()
    assert not sel0.all()


def test_cull_two_level_matches_single_level():
    """Supertile-shortlist culling == single-level when no supertile
    overflows its shortlist (128 random lights, capacity 64 >= hits)."""
    w, h = 12 * TILE, 8 * TILE
    view, proj = _camera(w, h)
    rng = np.random.default_rng(3)
    n = 128
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * (n - 1),
        positions=np.concatenate(
            [[[0, 0, 0]], rng.uniform([-4, -1, -4], [4, 1, 4], (n - 1, 3))]
        ),
        directions=[[0, -1, 0]] * n,
        intensities=[[5, 5, 5]] * n,
        radii=[0.0] + list(rng.uniform(0.3, 1.2, n - 1)),
    )
    gb, hit, _ = _ground_gbuffer(w, h, view, proj)
    lin_depth = jnp.where(
        hit, -m3.transform_point(view, gb.world_position)[..., 2], 100.0
    )
    kw = dict(tiles_y=h // TILE, tiles_x=w // TILE, viewport=(w, h),
              max_per_tile=32)
    idx1, cnt1 = light_culling.cull_lights(
        lights, view, jnp.linalg.inv(proj), lin_depth, **kw)
    idx2, cnt2 = light_culling.cull_lights(
        lights, view, jnp.linalg.inv(proj), lin_depth,
        coarse_capacity=64, **kw)
    # conservative coarse pass at ample capacity: identical selection
    assert (np.asarray(cnt1) == np.asarray(cnt2)).all()
    assert (np.asarray(idx1) == np.asarray(idx2)).all()


def test_shade_directional_lambert_falloff():
    w, h = 4 * TILE, 4 * TILE
    view, proj = _camera(w, h)
    gb, hit, _ = _ground_gbuffer(w, h, view, proj)
    ld = m3.normalize(jnp.asarray([0.3, -1.0, 0.2]))
    lights = Lights.from_host(
        types=[DIRECTIONAL],
        positions=[[0, 0, 0]],
        directions=[np.asarray(ld)],
        intensities=[[1.0, 1.0, 1.0]],
    )
    idx = jnp.zeros((h // TILE, w // TILE, 4), jnp.int32).at[..., 1:].set(-1)
    color = pbr.shade_forward_plus(
        gb, lights, idx, jnp.asarray([0.0, 2.0, 5.0]), ambient=(0.0, 0.0, 0.0)
    )
    color = np.asarray(color)
    mask = np.asarray(hit)
    assert color[mask].max() > 0.05
    assert (color[~mask] == 0).all()  # no coverage -> black
    # Lambert-dominated: diffuse term ~ albedo * cosLi * intensity, cos = 1.0*|ld.y|
    cos_li = float(-ld[1])
    expected = 0.8 * cos_li  # kd ~ (1-F)*albedo ~ 0.77-0.8 scale
    assert abs(color[mask][:, 0].mean() - expected) < 0.3


def test_point_light_attenuates_with_distance():
    w, h = 4 * TILE, 4 * TILE
    view, proj = _camera(w, h)
    gb, hit, _ = _ground_gbuffer(w, h, view, proj)
    lights = Lights.from_host(
        types=[POINT],
        positions=[[0.0, 1.0, 0.0]],
        directions=[[0, -1, 0]],
        intensities=[[10, 10, 10]],
        attenuations=[[1.0, 0.0, 1.0]],
        radii=[50.0],
    )
    idx = jnp.zeros((h // TILE, w // TILE, 1), jnp.int32)
    color = np.asarray(
        pbr.shade_forward_plus(
            gb, lights, idx, jnp.asarray([0.0, 2.0, 5.0]), ambient=(0, 0, 0)
        )
    )
    wpos = np.asarray(gb.world_position)
    mask = np.asarray(hit)
    d = np.linalg.norm(wpos - np.asarray([0.0, 1.0, 0.0]), axis=-1)
    near = color[mask & (d < 2)][:, 0].mean()
    far = color[mask & (d > 6)][:, 0].mean()
    assert near > far * 3


def test_spot_cone_limits():
    w, h = 2 * TILE, 2 * TILE
    gb = pbr.GBuffer(
        world_position=jnp.zeros((h, w, 3)),
        normal=jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3)),
        albedo=jnp.full((h, w, 4), 1.0),
        metallic=jnp.zeros((h, w)),
        roughness=jnp.full((h, w), 0.8),
        ao=jnp.ones((h, w)),
        emissive=jnp.zeros((h, w, 3)),
        coverage=jnp.ones((h, w)),
    )
    # spot above origin pointing straight down: lit; pointing sideways: unlit
    for direction, lit in [((0, -1, 0), True), ((1, 0, 0), False)]:
        lights = Lights.from_host(
            types=[SPOT],
            positions=[[0.0, 2.0, 0.0]],
            directions=[direction],
            intensities=[[20, 20, 20]],
            cutoffs=[[np.cos(0.3), np.cos(0.5)]],
            radii=[10.0],
        )
        idx = jnp.zeros((h // TILE, w // TILE, 1), jnp.int32)
        c = np.asarray(
            pbr.shade_forward_plus(
                gb, lights, idx, jnp.asarray([0.0, 2.0, 5.0]), ambient=(0, 0, 0)
            )
        )
        center = c[h // 2, w // 2, 0]
        assert (center > 0.01) == lit, (direction, center)


def test_brdf_energy_sanity():
    # grazing vs normal incidence fresnel
    f = np.asarray(pbr.fresnel_schlick(jnp.asarray([0.04]), jnp.asarray([1.0, 0.0])))
    assert abs(f[0] - 0.04) < 1e-6  # wait: broadcast check below
    f0 = pbr.fresnel_schlick(jnp.full((3,), 0.04), jnp.asarray(1.0))
    f1 = pbr.fresnel_schlick(jnp.full((3,), 0.04), jnp.asarray(0.0))
    assert float(f0[0]) < float(f1[0])
    assert abs(float(f1[0]) - 1.0) < 1e-5
    # NDF integrates roughly to cosine-weighted 1 over hemisphere (loose check)
    assert float(pbr.ndf_ggx(jnp.asarray(1.0), jnp.asarray(0.1))) > float(
        pbr.ndf_ggx(jnp.asarray(1.0), jnp.asarray(0.9))
    )


def test_pallas_shading_matches_jnp():
    """The Pallas Forward+ kernel must reproduce the jnp reference path."""
    from sailor_tpu.kernels import pbr_pallas

    rng = np.random.default_rng(0)
    h, w = 4 * TILE, 8 * TILE
    nr = rng.normal(size=(h, w, 3)).astype(np.float32)
    gb = pbr.GBuffer(
        world_position=jnp.asarray(rng.uniform(-5, 5, (h, w, 3)).astype(np.float32)),
        normal=m3.normalize(jnp.asarray(nr)),
        albedo=jnp.asarray(rng.uniform(0, 1, (h, w, 4)).astype(np.float32)),
        metallic=jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        roughness=jnp.asarray(rng.uniform(0.1, 1, (h, w)).astype(np.float32)),
        ao=jnp.ones((h, w)),
        emissive=jnp.zeros((h, w, 3)),
        coverage=jnp.ones((h, w)),
    )
    n = 9
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * 4 + [SPOT] * 4,
        positions=rng.uniform(-5, 5, (n, 3)),
        directions=[[0, -1, 0]] * n,
        intensities=rng.uniform(0.5, 3, (n, 3)),
        attenuations=[[1, 0, 0.5]] * n,
        cutoffs=[[0.9, 0.6]] * n,
        radii=[8.0] * n,
    )
    idx = jnp.asarray(rng.integers(-1, n, (h // TILE, w // TILE, 32)).astype(np.int32))
    cam = jnp.asarray([0.0, 3.0, 8.0])
    shadow = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ref = pbr.shade_forward_plus(
        gb, lights, idx, cam, shadow_factors=shadow, ambient=(0, 0, 0)
    )
    got = pbr_pallas.shade_forward_plus_pallas(
        gb, lights, idx, cam, shadow_factors=shadow,
        ibl_ambient=jnp.zeros((h, w, 3)),
    )
    # The Pallas kernel uses approx reciprocals (pl.reciprocal approx=True)
    # for light falloff/G-term denominators — ~2^-8 relative in interpret
    # mode (coarser than the TPU hardware estimate). 2% relative on HDR
    # radiance is far below tonemapped visibility.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-3, rtol=2e-2
    )


def test_cull_overflow_keeps_nearest_lights():
    """When a tile sees more lights than its budget, the NEAREST (by camera
    distance) must be kept — parity with the reference's impact sort
    (LightingECS.cpp:209-260)."""
    w, h = 2 * TILE, TILE
    view, proj = _camera(w, h)
    # 12 point lights stacked in front of the camera at increasing distance,
    # all covering the whole view; budget of 4 per tile.
    n = 12
    pos = np.stack([np.zeros(n), np.zeros(n), -np.arange(1.0, n + 1.0)], -1)
    lights = Lights.from_host(
        types=[POINT] * n,
        positions=pos,
        directions=[[0, -1, 0]] * n,
        intensities=[[1, 1, 1]] * n,
        attenuations=[[1, 0, 0]] * n,
        radii=[100.0] * n,
    )
    lin = jnp.full((h, w), 5.0)
    idx, counts = light_culling.cull_lights(
        lights, view, jnp.linalg.inv(proj), lin,
        tiles_y=1, tiles_x=2, viewport=(w, h), max_per_tile=4,
    )
    idx = np.asarray(idx)
    # camera at (0,2,5): nearest lights are those with the smallest camera
    # distance = lights 0..3 (z=-1..-4 are closest to the camera)
    cam = np.asarray([0.0, 2.0, 5.0])
    dist = np.linalg.norm(pos - cam, axis=-1)
    want = set(np.argsort(dist)[:4].tolist())
    for t in range(2):
        got = set(idx[0, t][idx[0, t] >= 0].tolist())
        assert got == want, (got, want)
