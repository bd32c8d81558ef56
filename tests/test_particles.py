"""Particle subsystem: baked-animation asset round trip + playback, and
the scatter-free tile-binned splat vs a brute-force numpy oracle.

Reference parity: ParticlesNode.h ParticleInfo/ParticleData (header +
binary keyframe records), compute-interpolated playback, trace decay.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sailor_tpu.assets.particles import (
    RECORD, ParticlesAsset, bake_fountain, sample_baked,
)
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels.particles import splat_particles


def test_baked_asset_roundtrip(tmp_path):
    asset = bake_fountain(frames=12, n=16, fps=24)
    path = str(tmp_path / "fx.particles")
    asset.save(path)
    loaded = ParticlesAsset.load(path)
    assert loaded.fps == 24 and loaded.frames == 12 and loaded.n == 16
    assert loaded.data.shape == (12, 16, RECORD)
    np.testing.assert_allclose(loaded.data, asset.data, rtol=1e-6)


def test_baked_playback_interpolates():
    # two frames: record 0 moves x from 0 -> 1 across frame 0
    data = np.zeros((2, 1, RECORD), np.float32)
    data[:, :, 0] = 1.0          # enabled
    data[0, 0, 1] = data[0, 0, 2] = 0.5  # size
    data[0, 0, 8:12] = [1, 2, 3, 1]      # color1
    data[0, 0, 16:20] = [3, 4, 5, 1]     # color2
    data[0, 0, 4:7] = [0, 0, 0]
    data[0, 0, 12:15] = [1, 0, 0]
    pos, size, col = sample_baked(jnp.asarray(data), jnp.asarray(0.5 / 30.0),
                                  30, 2)
    np.testing.assert_allclose(np.asarray(pos[0]), [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(col[0]), [2, 3, 4, 1], atol=1e-6)
    assert float(size[0]) == pytest.approx(0.5)

    # disabled record -> alpha 0
    data[0, 0, 0] = 0.0
    _, _, col = sample_baked(jnp.asarray(data), jnp.asarray(0.0), 30, 2)
    assert float(col[0, 3]) == 0.0


def _camera(width, height):
    cam = jnp.asarray([0.0, 1.0, 6.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 1.0, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, width / height, 0.1, 60.0)
    return cam, view, proj


def _oracle_splat(pos, radii, colors, vp, proj, depth, W, H,
                  soft_depth=0.35):
    """Brute-force per-pixel x per-particle reference."""
    acc = np.zeros((H, W, 3), np.float32)
    p4 = np.concatenate([pos, np.ones((len(pos), 1))], 1)
    clip = p4 @ np.asarray(vp).T
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    for i in range(len(pos)):
        w = clip[i, 3]
        if w <= 1e-4:
            continue
        ndc = clip[i, :3] / w
        z = ndc[2]
        if not (0.0 < z <= 1.0) or colors[i, 3] <= 0:
            continue
        sx = (ndc[0] * 0.5 + 0.5) * W
        sy = (0.5 - ndc[1] * 0.5) * H
        r = np.clip(radii[i] * 0.5 * H * np.asarray(proj)[1, 1] / w,
                    0.75, 64.0)
        d2 = (xs - sx) ** 2 + (ys - sy) ** 2
        fall = np.maximum(1.0 - d2 / max(r * r, 1e-6), 0.0) ** 2
        fade = np.clip((z - depth) / soft_depth + 1.0, 0.0, 1.0)
        fade = np.where(depth <= 0.0, 1.0, fade)
        acc += (fall * fade * colors[i, 3])[..., None] * colors[i, :3]
    return acc


def test_splat_matches_oracle():
    W = H = 64
    cam, view, proj = _camera(W, H)
    vp = proj @ view
    rng = np.random.default_rng(5)
    n = 40
    pos = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(0, 2.5, n),
         rng.uniform(-2, 2, n)], 1
    ).astype(np.float32)
    radii = rng.uniform(0.05, 0.5, n).astype(np.float32)
    colors = rng.uniform(0.2, 2.0, (n, 4)).astype(np.float32)
    # one behind the camera, one dead
    pos[0] = [0, 1, 20]
    colors[1, 3] = 0.0
    depth = np.zeros((H, W), np.float32)
    depth[40:, :] = 0.9  # a near wall on the bottom rows

    got = np.asarray(
        splat_particles(
            jnp.asarray(pos), jnp.asarray(radii), jnp.asarray(colors),
            vp, proj, jnp.asarray(depth), width=W, height=H,
        )
    )
    want = _oracle_splat(pos, radii, colors, vp, proj, depth, W, H)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_splat_depth_occlusion():
    W = H = 32
    cam, view, proj = _camera(W, H)
    vp = proj @ view
    pos = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    radii = np.asarray([0.4], np.float32)
    colors = np.asarray([[1, 1, 1, 1]], np.float32)
    free = np.asarray(
        splat_particles(jnp.asarray(pos), jnp.asarray(radii),
                        jnp.asarray(colors), vp, proj,
                        jnp.zeros((H, W)), width=W, height=H)
    )
    occluded = np.asarray(
        splat_particles(jnp.asarray(pos), jnp.asarray(radii),
                        jnp.asarray(colors), vp, proj,
                        jnp.full((H, W), 0.999), width=W, height=H)
    )
    assert free.sum() > 0.1
    assert occluded.sum() < 1e-6  # wall in front of everything


def test_framegraph_baked_particles(tmp_path):
    from sailor_tpu.assets import primitives
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.kernels.lights import DIRECTIONAL, Lights
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    asset = bake_fountain(frames=8, n=24, fps=30)
    ppath = str(tmp_path / "fx.particles")
    asset.save(ppath)

    soup = primitives.merge([(primitives.plane(8.0), np.eye(4))])
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]), color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL], positions=[[0, 0, 0]],
        directions=[[0.3, -1, 0.2]], intensities=[[2, 2, 2]],
    )
    cam, view, proj = _camera(64, 64)
    frame = FrameData.create(view, proj, cam, 0.1, 60.0, time=0.4, dt=0.05)
    scene = SceneView.create(geo, lights, frame)
    fga = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: RenderScene\n"
        f" - name: Particles\n   asset: {ppath}\n"
        " - name: EyeAdaptation\n"
    )
    fg = FrameGraph(fga, 64, 64, config={"bin_capacity": 64, "bin_rounds": 1})
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, state2 = fg.process(scene, state)
    out = np.asarray(targets["Final"])
    assert np.isfinite(out).all()
    # trail accumulator exists (trace_decay > 0 in the baked header)
    assert "particles/trail" in state2
    # second frame: trail persists and frame still finite
    scene2 = scene.replace(
        frame=scene.frame.replace(current_time=jnp.asarray(0.45)))
    targets2, state3 = fg.process(scene2, state2)
    assert np.isfinite(np.asarray(targets2["Final"])).all()
    assert float(np.asarray(state3["particles/trail"]).sum()) > 0.0
