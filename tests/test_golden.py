"""Golden-image regression harness (BASELINE.md "pixel-match" discipline).

Canonical scenes render at fixed seeds on CPU and compare against
checked-in PNGs under tests/golden/. Regenerate with
``python tools/make_goldens.py`` after INTENTIONAL visual changes — the
diff printed by ``--check`` is the review artifact.

Tolerances: mean abs diff < 2.5/255 and 99th-percentile < 12/255 — tight
enough to catch shading/shadow/raster regressions, loose enough for
cross-machine float noise.
"""

import os
import struct
import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from sailor_tpu.assets import primitives
from sailor_tpu.core import math3d as m3
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
from sailor_tpu.kernels.sky import SkyParams
from sailor_tpu.raster.setup import Geometry
from sailor_tpu.rhi.scene_view import SceneView
from sailor_tpu.rhi.types import FrameData

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# ---------------------------------------------------------------------------
# minimal PNG io (no imageio dependency in the test path)
# ---------------------------------------------------------------------------


def save_png(path, img_u8):
    h, w = img_u8.shape[:2]
    raw = b"".join(
        b"\x00" + img_u8[y].tobytes() for y in range(h)
    )

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", hdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def load_png(path):
    with open(path, "rb") as f:
        data = f.read()
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "expect 8-bit RGB"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    img = np.zeros((h, w, 3), np.uint8)
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ft, px = row[0], np.frombuffer(row[1:], np.uint8).copy()
        if ft == 0:
            pass
        elif ft == 1:  # sub
            for i in range(3, len(px)):
                px[i] = (int(px[i]) + int(px[i - 3])) & 0xFF
        elif ft == 2:  # up
            px = ((px.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif ft == 3:  # average
            for i in range(len(px)):
                left = int(px[i - 3]) if i >= 3 else 0
                px[i] = (int(px[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(len(px)):
                a = int(px[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                c = int(prev[i - 3]) if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                px[i] = (int(px[i]) + pr) & 0xFF
        img[y] = px.reshape(w, 3)
        prev = px
    return img


# ---------------------------------------------------------------------------
# canonical scenes
# ---------------------------------------------------------------------------

W, H = 160, 96


def _to_u8(final_srgb):
    return np.clip(np.asarray(final_srgb) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _forward_scene():
    rng = np.random.default_rng(11)
    items = [(primitives.plane(40.0), np.eye(4))]
    for i in range(10):
        t = np.eye(4)
        t[:3, 3] = [rng.uniform(-6, 6), rng.uniform(0.4, 1.2), rng.uniform(-6, 6)]
        items.append(
            (primitives.cube(1.0) if i % 2 else primitives.uv_sphere(0.6), t)
        )
    soup = primitives.merge(items)
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]) * jnp.asarray([0.7, 0.65, 0.6, 1.0]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    n = 24
    lp = np.stack(
        [rng.uniform(-7, 7, n), rng.uniform(0.3, 2.0, n), rng.uniform(-7, 7, n)], -1
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate([[[-0.35, -0.7, -0.3]], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate([[[3.0, 2.9, 2.6]], rng.uniform(0.3, 1, (n, 3)) * 5]),
        attenuations=[[1, 0, 0.8]] * (n + 1),
        radii=[0.0] + list(rng.uniform(2.0, 4.0, n)),
    )
    cam = jnp.asarray([8.0, 4.5, 9.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 80.0)
    frame = FrameData.create(view, proj, cam, 0.1, 80.0, time=0.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.35, -0.7, -0.3))
    return SceneView.create(geo, lights, frame, sky=sky)


def render_forward_frame():
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(GOLDEN_DIR), "..",
                         "content/DefaultRenderer.renderer")
        ),
        W, H,
        config={"z_far": 80.0, "shadow_resolution": 256, "env_resolution": 16,
                "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": True,
                "cloud_stride": 2},
    )
    scene = _forward_scene()
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, _ = fg.process(scene, state)
    return _to_u8(targets["Final"])


def render_tracer():
    from sailor_tpu.raytracing import path_tracer as pt

    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.0, 0.8, 0.0]
    soup = primitives.merge(
        [(primitives.plane(20.0), np.eye(4)), (primitives.uv_sphere(0.8), t)]
    )
    scene = pt.scene_from_mesh(soup)
    cam = jnp.asarray([2.5, 2.0, 3.5])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.6, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    import jax

    img, _ = pt.render(scene, cam, view, proj, width=96, height=96, spp=16,
                       max_bounces=3, key=jax.random.PRNGKey(7))
    return _to_u8(m3.linear_to_srgb(jnp.clip(img, 0.0, 1.0)))


def render_queues():
    """Masked + transparent quads over a plane (render-queue pipeline)."""
    import test_render_queues as rq

    tex = np.ones((8, 8, 4), np.float32)
    tex[::2, :, 3] = 0.0
    scene = rq._quad_scene(rq._mat_table(1, alpha_tex=tex))
    targets = rq._run(scene)
    return _to_u8(targets["Final"])


DUCK_GLB = "/root/reference/Content/Models/DuckGlb/Duck.glb"


def render_content(extra_config=None):
    """Textured GLTF (Duck.glb) + floor through the FULL frame graph —
    the real-content golden (ModelImporter.cpp:382-520 parity)."""
    from sailor_tpu.assets import gltf
    from sailor_tpu.assets.materials import MaterialTable
    from sailor_tpu.rhi.types import FrameData

    soup, mats = gltf.load_merged(DUCK_GLB)
    g = gltf.GLTF.load(DUCK_GLB)
    images = g.load_texture_images()
    floor = primitives.merge([(primitives.plane(12.0), np.eye(4))])
    n_mat = len(mats["albedo"])
    pos = np.concatenate([np.asarray(floor["position"], np.float32),
                          np.asarray(soup["position"], np.float32)])
    nrm = np.concatenate([np.asarray(floor["normal"], np.float32),
                          np.asarray(soup["normal"], np.float32)])
    uv = np.concatenate([np.asarray(floor["uv"], np.float32),
                         np.asarray(soup["uv"], np.float32)])
    col = np.concatenate([np.asarray(floor["color"], np.float32),
                          np.asarray(soup["color"], np.float32)])
    idx = np.concatenate([np.asarray(floor["indices"], np.int32),
                          np.asarray(soup["indices"], np.int32)
                          + len(floor["position"])])
    mid = np.concatenate([np.full(len(floor["indices"]), n_mat, np.int32),
                          np.asarray(soup["material_id"], np.int32)])
    floor_row = {
        "albedo": [[0.55, 0.55, 0.58]], "metallic": [0.0],
        "roughness": [0.75], "emissive": [[0, 0, 0]],
        "albedo_texture": [-1], "normal_texture": [-1], "queue": [0],
        "alpha_cutoff": [0.5], "opacity": [1.0],
    }
    table = {
        k: np.concatenate(
            [np.asarray(v), np.asarray(floor_row[k], np.asarray(v).dtype)]
        )
        for k, v in mats.items() if k in floor_row
    }
    materials = MaterialTable.from_host(table, images, texture_size=128)
    geo = Geometry(
        position=jnp.asarray(pos), normal=jnp.asarray(nrm),
        uv=jnp.asarray(uv), color=jnp.asarray(col),
        indices=jnp.asarray(idx), material_id=jnp.asarray(mid),
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL],
        positions=[[0, 0, 0]], directions=[[-0.4, -0.75, -0.35]],
        intensities=[[3.2, 3.0, 2.7]], attenuations=[[1, 0, 0]],
        radii=[0.0],
    )
    cam = jnp.asarray([2.6, 2.2, 3.2])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.9, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 60.0)
    frame = FrameData.create(view, proj, cam, 0.1, 60.0, time=0.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.4, -0.75, -0.35))
    scene = SceneView.create(geo, lights, frame, sky=sky, materials=materials)
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(GOLDEN_DIR), "..",
                         "content/DefaultRenderer.renderer")
        ),
        W, H,
        config={"z_far": 60.0, "shadow_resolution": 256, "env_resolution": 16,
                "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False,
                **(extra_config or {})},
    )
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, _ = fg.process(scene, state)
    return _to_u8(targets["Final"])


def render_tracer_textured():
    """Duck.glb through the path tracer with its albedo texture and the
    baked raymarched-sky environment (TraceSky + MaterialUtils parity)."""
    import jax

    from sailor_tpu.assets import gltf
    from sailor_tpu.raytracing import path_tracer as pt

    soup, mats = gltf.load_merged(DUCK_GLB)
    g = gltf.GLTF.load(DUCK_GLB)
    mats = dict(mats)
    mats["images"] = g.load_texture_images()
    mats["texture_size"] = 128
    scene = pt.scene_from_mesh(
        soup, mats, sky=SkyParams.default(sun_direction=(-0.4, -0.75, -0.35)),
        env_size=(32, 64), sun_direction=(-0.4, -0.75, -0.35),
    )
    cam = jnp.asarray([2.4, 1.9, 2.9])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.9, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    img, _ = pt.render(scene, cam, view, proj, width=96, height=96, spp=8,
                       max_bounces=2, key=jax.random.PRNGKey(3))
    return _to_u8(m3.linear_to_srgb(jnp.clip(img, 0.0, 1.0)))


SCENES = {
    "forward_frame": render_forward_frame,
    "tracer": render_tracer,
    "queues": render_queues,
    "content": render_content,
    "tracer_textured": render_tracer_textured,
}


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run tools/make_goldens.py ({path})")
    ref = load_png(path).astype(np.float32)
    got = SCENES[name]().astype(np.float32)
    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    assert diff.mean() < 2.5, f"{name}: mean {diff.mean():.2f}"
    assert np.percentile(diff, 99) < 12, (
        f"{name}: p99 {np.percentile(diff, 99):.1f} max {diff.max():.0f}"
    )


def test_content_golden_with_fused_resolve():
    """Real-content scene (textured Duck.glb) through the FUSED resolve
    must match the stored content golden within the golden tolerance."""
    path = os.path.join(GOLDEN_DIR, "content.png")
    if not os.path.exists(path):
        pytest.skip("content golden missing")
    if not os.path.exists(DUCK_GLB):
        pytest.skip("reference Duck.glb not mounted")
    ref = load_png(path).astype(np.float32)
    got = render_content({"fused_resolve": True}).astype(np.float32)
    diff = np.abs(got - ref)
    assert diff.mean() < 2.5, f"fused content: mean {diff.mean():.2f}"
    assert np.percentile(diff, 99) < 12, (
        f"fused content: p99 {np.percentile(diff, 99):.1f}"
    )
