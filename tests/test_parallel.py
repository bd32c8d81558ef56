"""Multi-chip sharding on the virtual 8-device CPU mesh: the sharded frame
must match the content of a single-device render of the same scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sailor_tpu.parallel import make_mesh, sharded_forward_frame, sharded_path_trace
from sailor_tpu.raster import tile_raster

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _scene(width, height):
    import __graft_entry__ as g

    return g._demo_scene(width, height, num_lights=8)


def test_sharded_forward_frame_runs_and_varies():
    mesh = make_mesh(8)
    width, height = 128, tile_raster.TILE_H * 8
    scene = _scene(width, height)
    ldr = sharded_forward_frame(scene, width=width, height=height, mesh=mesh)
    img = np.asarray(ldr)
    assert img.shape == (height, width, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.02
    # no per-shard banding: adjacent strip rows shouldn't show a seam at
    # every 32-row boundary stronger than typical row-to-row variation
    row_diff = np.abs(np.diff(img.mean(axis=(1, 2))))
    seam = row_diff[31::32].mean()
    typical = row_diff.mean() + 1e-6
    assert seam < typical * 12


def test_sharded_path_trace_matches_single_device():
    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.raytracing import path_tracer as pt

    mesh = make_mesh(8)
    soup = primitives.merge(
        [(primitives.plane(20.0), np.eye(4)), (primitives.cube(2.0), np.eye(4))]
    )
    tscene = pt.scene_from_mesh(soup)
    cam = jnp.asarray([0.0, 3.0, 6.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    h = 8 * 8
    img_sharded = sharded_path_trace(
        tscene, cam, view, proj, width=32, height=h, mesh=mesh,
        spp=2, max_bounces=2, key=jax.random.PRNGKey(3),
    )
    img_single, _ = pt.render(
        tscene, cam, view, proj, width=32, height=h, spp=8, max_bounces=2,
        key=jax.random.PRNGKey(3),
    )
    a, b = np.asarray(img_sharded), np.asarray(img_single)
    assert np.isfinite(a).all()
    # same scene, different sampling -> images agree in the mean
    assert abs(a.mean() - b.mean()) < 0.25 * max(b.mean(), 1e-3)
