"""Octree container + tangent-space normal mapping."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.core.octree import Octree


def test_octree_insert_query_remove():
    ot = Octree(size=100.0)
    rng = np.random.default_rng(0)
    boxes = {}
    for k in range(200):
        c = rng.uniform(-40, 40, 3)
        e = rng.uniform(0.5, 2.0, 3)
        boxes[k] = (c - e, c + e)
        assert ot.insert(k, c - e, c + e)
    assert ot.num_elements == 200

    # AABB query vs brute force
    qmin, qmax = np.asarray([-10, -10, -10.0]), np.asarray([10, 10, 10.0])
    got = set(ot.query_aabb(qmin, qmax))
    want = {
        k for k, (bmin, bmax) in boxes.items()
        if not ((bmin > qmax) | (bmax < qmin)).any()
    }
    assert got == want

    # frustum query vs brute-force plane test
    view = m3.look_at(jnp.asarray([0.0, 0.0, 60.0]), jnp.asarray([0.0, 0.0, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 4, 1.0, 0.1, 200.0)
    from sailor_tpu.core import bounds

    planes = np.asarray(bounds.extract_frustum_planes(proj @ view))
    got_f = set(ot.query_frustum(planes))
    want_f = set()
    for k, (bmin, bmax) in boxes.items():
        n = planes[:, :3]
        p = np.where(n >= 0, bmax, bmin)
        if ((n * p).sum(-1) + planes[:, 3] >= 0).all():
            want_f.add(k)
    assert got_f == want_f

    # remove + update
    assert ot.remove(0)
    assert not ot.remove(0)
    assert ot.update(1, [-1, -1, -1], [1, 1, 1])
    assert 1 in ot.query_aabb([-2, -2, -2], [2, 2, 2])


def test_normal_mapping_tilts_shading_normal():
    from sailor_tpu.assets.materials import MaterialTable
    from sailor_tpu.raster import rasterize
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.assets import primitives

    # ground plane with a normal map tilting everything toward +X (tangent)
    nrm_tex = np.zeros((8, 8, 4), np.float32)
    nrm_tex[:] = [(0.8 * 0.5 + 0.5), 0.5, (0.6 * 0.5 + 0.5), 1.0]  # ts (0.8, 0, 0.6)
    mt = MaterialTable.from_host(
        {
            "albedo": np.ones((1, 3), np.float32),
            "metallic": np.zeros(1, np.float32),
            "roughness": np.full(1, 0.5, np.float32),
            "emissive": np.zeros((1, 3), np.float32),
            "albedo_texture": np.full(1, -1, np.int32),
            "normal_texture": np.zeros(1, np.int32),
        },
        [nrm_tex], texture_size=8,
    )
    soup = primitives.merge([(primitives.plane(10.0), np.eye(4))])
    geo = Geometry(
        position=jnp.asarray(soup["position"]), normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]), color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]), material_id=jnp.asarray(soup["material_id"]),
    )
    cam = jnp.asarray([0.0, 5.0, 5.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 2.0, 0.1, 50.0)
    gb, depth, tid, _ = rasterize(
        geo, proj @ view, width=128, height=64, capacity=32, materials=mt
    )
    n = np.asarray(gb.normal)
    cov = np.asarray(gb.coverage) > 0
    assert cov.any()
    mean_n = n[cov].mean(0)
    # flat plane normal is (0,1,0); the map should tilt it in the tangent
    # plane while keeping a dominant up component
    assert mean_n[1] > 0.4
    assert abs(mean_n[0]) + abs(mean_n[2]) > 0.3, mean_n
    # without materials: pure geometric normal
    gb2, *_ = rasterize(geo, proj @ view, width=128, height=64, capacity=32)
    n2 = np.asarray(gb2.normal)[cov].mean(0)
    np.testing.assert_allclose(n2, [0, 1, 0], atol=1e-3)
