"""CSM shadow pipeline: cascade fit, shadow raster, PCF/EVSM factors."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu import config
from sailor_tpu.assets import primitives
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import blur, shadow
from sailor_tpu.raster import rasterize
from sailor_tpu.raster.setup import Geometry


def _geo(meshes_t, mats=None):
    soup = primitives.merge(meshes_t, mats)
    return Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )


def _scene():
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.0, 1.0, 0.0]
    return _geo([(primitives.plane(30.0), np.eye(4)), (primitives.cube(2.0), t)])


def test_cascade_matrices_cover_frustum():
    view = m3.look_at(
        jnp.asarray([0.0, 3.0, 8.0]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.perspective(jnp.pi / 3, 16 / 9, 0.1, 100.0)
    ld = m3.normalize(jnp.asarray([-0.3, -1.0, -0.2]))
    mats = shadow.cascade_matrices(view, proj, ld, 0.1, 100.0)
    assert mats.shape == (config.NUM_CSM_CASCADES, 4, 4)
    # every frustum-slice corner lands inside its cascade's NDC box
    inv_vp = jnp.linalg.inv(proj @ view)
    splits = [0.1] + shadow.cascade_splits(0.1, 100.0)
    for c in range(config.NUM_CSM_CASCADES):
        def ndc_z(dist):
            p = proj @ jnp.asarray([0.0, 0.0, -dist, 1.0])
            return float(p[2] / p[3])
        corners = shadow.frustum_slice_corners(
            inv_vp, ndc_z(splits[c]), ndc_z(splits[c + 1])
        )
        p = m3.transform_point_h(mats[c], corners)
        ndc = np.asarray(p[:, :3] / p[:, 3:4])
        assert (np.abs(ndc[:, :2]) <= 1.01).all(), (c, ndc)
        assert (ndc[:, 2] >= -0.01).all() and (ndc[:, 2] <= 1.01).all()


def test_select_cascade_monotonic():
    view = m3.identity4()
    wp = jnp.asarray([[0, 0, -1.0], [0, 0, -8.0], [0, 0, -20.0], [0, 0, -60.0]])
    layers = np.asarray(shadow.select_cascade(view, wp, 100.0))
    assert (np.diff(layers) >= 0).all()
    assert layers[0] == 0 and layers[-1] == 3


def test_shadow_factor_cube_on_plane():
    geo = _scene()
    ld = m3.normalize(jnp.asarray([0.01, -1.0, 0.01]))  # nearly straight down
    view = m3.look_at(
        jnp.asarray([0.0, 6.0, 10.0]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    mats = shadow.cascade_matrices(view, proj, ld, 0.1, 50.0)

    S = 256
    smaps = []
    for c in range(config.NUM_CSM_CASCADES):
        _, depth, _, _ = rasterize(
            geo, mats[c], width=S, height=S, capacity=512, rounds=2, cull="none"
        )
        smaps.append(depth)
    smaps = jnp.stack(smaps)

    # sample points on the ground: under the cube (shadowed) and far away
    pts = jnp.asarray([[0.0, 0.0, 0.0], [6.0, 0.0, 6.0]])[None]  # (1, 2, 3)
    normals = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (1, 2, 3))
    f = shadow.csm_shadow_factor(
        pts, normals, view, ld, mats, smaps, z_far=50.0, use_evsm=False
    )
    f = np.asarray(f)[0]
    assert f[0] < 0.3, f  # under the cube: shadowed
    assert f[1] > 0.8, f  # open ground: lit


def test_csm_evsm_all_cascades_matches_pcf_verdict():
    """The all-cascade EVSM path (one gather) must agree with PCF on the
    clear shadowed/lit cases (cube shadow on a ground plane)."""
    geo = _scene()
    ld = m3.normalize(jnp.asarray([0.01, -1.0, 0.01]))
    view = m3.look_at(
        jnp.asarray([0.0, 6.0, 10.0]), jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    mats = shadow.cascade_matrices(view, proj, ld, 0.1, 50.0)
    S = 256
    smaps = []
    for c in range(config.NUM_CSM_CASCADES):
        _, depth, _, _ = rasterize(
            geo, mats[c], width=S, height=S, capacity=512, rounds=2, cull="none"
        )
        smaps.append(depth)
    smaps = jnp.stack(smaps)
    moments = shadow.evsm_warp(smaps)
    moments = blur.blur_1d(blur.blur_1d(moments, 3, 1), 3, 2)

    pts = jnp.asarray([[0.0, 0.0, 0.0], [6.0, 0.0, 6.0]])[None]
    normals = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (1, 2, 3))
    f = np.asarray(shadow.csm_shadow_factor_evsm(
        pts, normals, view, ld, mats, moments, z_far=50.0
    ))[0]
    assert f[0] < 0.3, f  # under the cube: shadowed
    assert f[1] > 0.8, f  # open ground: lit


def test_evsm_factor_synthetic():
    # light looks down -z over [-1,1]^2, depth range [0,2] (reverse-Z)
    light_mat = m3.ortho(-1, 1, -1, 1, 0.0, 2.0, reverse_z=True)
    # occluder plane at z=-0.5 (depth 0.5 from light -> rev depth 0.75)
    # covering the left half (u < 0.5)
    S = 128
    occ_rev = 1.0 - 0.5 / 2.0
    depth = jnp.zeros((S, S)).at[:, : S // 2].set(occ_rev)
    moments = shadow.evsm_warp(depth)
    moments = blur.blur_1d(blur.blur_1d(moments, 3, 0), 3, 1)
    # receiver points at z=-1.5 (behind the occluder), left vs right
    pts = jnp.asarray([[[-0.5, 0.0, -1.5], [0.5, 0.0, -1.5]]])
    f = np.asarray(shadow.shadow_evsm(moments, light_mat, pts))[0]
    shadowed = f[0] if f[0] < f[1] else f[1]
    lit = max(f[0], f[1])
    assert shadowed < 0.2, f
    assert lit > 0.9, f
