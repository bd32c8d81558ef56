"""Asset pipeline: GLB parser, material table, registry + hot reload."""

import json
import struct
import time

import jax.numpy as jnp
import numpy as np
import yaml


def _make_glb(tmp_path):
    """Hand-assemble a minimal valid GLB: one quad with normals+uvs,
    one pbr material."""
    pos = np.asarray(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([0, 2, 1, 0, 3, 2], np.uint16)
    bin_data = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    pad = (4 - len(bin_data) % 4) % 4
    bin_data += b"\x00" * pad

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.2, 0.1, 1.0],
                "metallicFactor": 0.3,
                "roughnessFactor": 0.4,
            },
            "emissiveFactor": [0.0, 0.1, 0.0],
        }],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    glb = (
        struct.pack("<4sII", b"glTF", 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    )
    p = tmp_path / "quad.glb"
    p.write_bytes(glb)
    return str(p)


def test_glb_load_merged(tmp_path):
    from sailor_tpu.assets import gltf

    path = _make_glb(tmp_path)
    soup, mats = gltf.load_merged(path)
    assert soup["position"].shape == (4, 3)
    assert soup["indices"].shape == (2, 3)
    # node translation [2,0,0] applied
    np.testing.assert_allclose(soup["position"][:, 0].mean(), 2.0, atol=1e-6)
    np.testing.assert_allclose(soup["normal"], [[0, 1, 0]] * 4, atol=1e-6)
    np.testing.assert_allclose(mats["albedo"][0], [0.9, 0.2, 0.1], atol=1e-6)
    assert mats["metallic"][0] == np.float32(0.3)
    np.testing.assert_allclose(mats["emissive"][0], [0, 0.1, 0], atol=1e-6)


def test_glb_renders_in_path_tracer(tmp_path):
    from sailor_tpu.assets import gltf
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.raytracing import path_tracer as pt

    soup, mats = gltf.load_merged(_make_glb(tmp_path))
    mats.pop("albedo_texture")
    scene = pt.scene_from_mesh(soup, mats)
    cam = jnp.asarray([2.0, 3.0, 3.0])
    view = m3.look_at(cam, jnp.asarray([2.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    img, _ = pt.render(scene, cam, view, proj, width=24, height=24, spp=2, max_bounces=2)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # the reddish quad should dominate the center
    c = img[12, 12]
    assert c[0] > c[2]


def test_material_table_sampling():
    from sailor_tpu.assets.materials import MaterialTable

    table = {
        "albedo": np.asarray([[1.0, 1.0, 1.0], [0.5, 0.5, 0.5]], np.float32),
        "metallic": np.asarray([0.0, 1.0], np.float32),
        "roughness": np.asarray([0.5, 0.1], np.float32),
        "emissive": np.zeros((2, 3), np.float32),
        "albedo_texture": np.asarray([0, -1], np.int32),
    }
    # texture 0: left half red, right half green
    tex = np.zeros((8, 8, 4), np.float32)
    tex[:, :4] = [1, 0, 0, 1]
    tex[:, 4:] = [0, 1, 0, 1]
    mt = MaterialTable.from_host(table, [tex], texture_size=8)
    mat_id = jnp.asarray([[0, 0], [1, 1]])
    uv = jnp.asarray([[[0.25, 0.5], [0.75, 0.5]], [[0.25, 0.5], [0.75, 0.5]]])
    albedo, met, rough, emis = mt.sample(mat_id, uv)
    a = np.asarray(albedo)
    assert a[0, 0, 0] > 0.9 and a[0, 0, 1] < 0.1   # textured red
    assert a[0, 1, 1] > 0.9 and a[0, 1, 0] < 0.1   # textured green
    np.testing.assert_allclose(a[1, 0, :3], 0.5, atol=1e-6)  # untextured
    assert float(met[1, 0]) == 1.0


def test_mat_yaml_parse():
    from sailor_tpu.assets.materials import MaterialAsset

    text = """
renderQueue: Masked
cullMode: None
shader: Standard
defines: [ALPHA_CUTOUT]
uniformsVec4:
  material.albedo: [0.8, 0.1, 0.1, 1.0]
uniformsFloat:
  material.metallic: 0.9
  material.roughness: 0.2
samplers:
  albedoSampler: Textures/brick.png
"""
    m = MaterialAsset.from_yaml(text)
    assert m.render_queue == "Masked"
    assert "ALPHA_CUTOUT" in m.defines
    row = m.to_table_row()
    np.testing.assert_allclose(row["albedo"], [0.8, 0.1, 0.1])
    assert row["metallic"] == 0.9


def test_registry_scan_load_hot_reload(tmp_path):
    from sailor_tpu.assets.registry import AssetRegistry

    content = tmp_path / "content"
    content.mkdir()
    mat = content / "red.mat"
    mat.write_text("uniformsVec4:\n  material.albedo: [1.0, 0.0, 0.0, 1.0]\n")
    (content / "world.world").write_text("name: W\ngameObjects: []\n")

    reg = AssetRegistry(str(content))
    n = reg.scan_content_folder()
    assert n == 2
    # sidecars written with stable file ids
    sidecar = yaml.safe_load((content / "red.mat.asset").read_text())
    assert "fileId" in sidecar

    m = reg.load(str(mat))
    assert m.to_table_row()["albedo"] == [1.0, 0.0, 0.0]
    # cached: same object identity
    assert reg.load(str(mat)) is m

    # hot reload on timestamp change
    events = []
    reg.add_hot_reload_listener(lambda info: events.append(info.path))
    time.sleep(0.01)
    mat.write_text("uniformsVec4:\n  material.albedo: [0.0, 1.0, 0.0, 1.0]\n")
    import os

    os.utime(mat, (time.time() + 1, time.time() + 1))
    reloaded = reg.check_hot_reload()
    assert len(reloaded) == 1
    assert events
    assert reg.load(str(mat)).to_table_row()["albedo"] == [0.0, 1.0, 0.0]


def test_obj_mtl_load_merged(tmp_path):
    """OBJ+MTL importer: fan triangulation, v/vt/vn dedup, MTL fields ->
    MaterialTable schema (ModelImporter parity for sponza.obj-class
    content; assets/objmtl.py)."""
    import imageio.v2 as imageio

    from sailor_tpu.assets import objmtl

    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, :4] = [255, 0, 0, 255]
    tex[:, 4:] = [0, 255, 0, 255]
    imageio.imwrite(tmp_path / "wall.png", tex)
    (tmp_path / "scene.mtl").write_text(
        "newmtl wall\nKd 1.0 1.0 1.0\nNs 50\nmap_Kd wall.dds\n"  # .dds -> .png fallback
        "newmtl glass\nKd 0.9 0.9 1.0\nd 0.4\nNi 1.45\n"
    )
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "usemtl wall\nf 1/1/1 2/2/1 3/3/1 4/4/1\n"  # quad -> 2 tris
        "usemtl glass\nf 1/1/1 3/3/1 2/2/1\n"
    )
    soup, table, images = objmtl.load_merged(str(tmp_path / "scene.obj"))
    assert soup["indices"].shape == (3, 3)
    assert soup["position"].shape[0] == 4          # deduped corners
    assert (soup["material_id"] == [0, 0, 1]).all()
    assert table["albedo_texture"][0] == 0 and len(images) == 1
    assert table["queue"][1] == 2 and abs(table["opacity"][1] - 0.4) < 1e-6
    assert abs(table["ior"][1] - 1.45) < 1e-6
    # Ns=50 -> Blinn-Phong roughness fold
    assert abs(table["roughness"][0] - np.sqrt(2.0 / 52.0)) < 1e-6
    # normals kept, uv flipped to top-left origin
    assert np.allclose(soup["normal"], [[0, 0, 1]] * 4)
    assert np.allclose(soup["uv"][0], [0, 1])


def test_obj_mtl_sponza_material_library():
    """The REFERENCE's actual Sponza MTL library parses: 25 materials,
    real PNG textures resolved through the .dds name drift, masked
    foliage routed to the Masked queue with folded alpha."""
    import os

    from sailor_tpu.assets import objmtl

    path = "/root/reference/Content/Models/Sponza/sponza.mtl"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference Sponza content not present")
    table, images, names = objmtl.load_mtl(path)
    assert len(names) >= 20
    assert "leaf" in names and "vase_round" in names
    leaf = names["leaf"]
    assert table["queue"][leaf] == 1          # map_d -> Masked
    assert table["albedo_texture"][leaf] >= 0
    assert table["normal_texture"][leaf] >= 0
    assert table["orm_texture"][leaf] >= 0    # map_Ns+map_Ks -> ORM
    a = images[table["albedo_texture"][leaf]]
    assert a.shape[-1] == 4 and (a[..., 3] < 0.5).any()  # real mask folded
    assert len(images) >= 20


def test_fbx_load_reference_content():
    """The reference's shipped binary FBX models parse: geometry layers,
    per-polygon materials, name-convention textures (assets/fbx.py;
    ModelImporter.cpp loads the same files through assimp)."""
    import os

    import pytest

    from sailor_tpu.assets import fbx

    cer = "/root/reference/Content/Models/Cerberus/cerberus.fbx"
    art = "/root/reference/Content/Models/KnightArtorias/Artorias.fbx"
    if not (os.path.exists(cer) and os.path.exists(art)):
        pytest.skip("reference FBX content not present")

    soup, table, images = fbx.load_merged(cer)
    assert soup["indices"].shape[0] > 30000
    n = np.linalg.norm(soup["normal"], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
    assert soup["uv"].min() >= -4 and soup["uv"].max() <= 8

    soup, table, images = fbx.load_merged(art)
    assert soup["indices"].shape[0] > 30000
    assert len(table["albedo"]) == 6            # six named materials
    assert (table["albedo_texture"] >= 0).sum() >= 4   # real texture set
    assert (table["normal_texture"] >= 0).sum() >= 1
    assert (table["orm_texture"] >= 0).sum() >= 4
    assert len(images) >= 10
    # material ids reference real rows and vary across the mesh
    assert set(np.unique(soup["material_id"])) <= set(range(6))
    assert len(np.unique(soup["material_id"])) >= 4


def test_combined_quad_sampling_matches_per_layer(monkeypatch):
    """sample_combined (one gather per mip level for albedo+normal) matches
    the per-layer trilinear path across wrap modes, missing maps, seams,
    and the full lod range (assets/materials.py build_quad_stack;
    GraphicsDriver.h:326 sampler semantics) — bit-for-bit-ish with f32
    rows, within the 1/255 quantization step with the default u8 rows
    (sources are 8-bit, so u8+sRGB loses nothing vs the files)."""
    from sailor_tpu.assets.materials import MaterialTable

    rng = np.random.default_rng(0)
    S = 32
    imgs = [rng.uniform(0, 1, (S, S, 4)).astype(np.float32) for _ in range(3)]
    table = {
        "albedo": np.ones((4, 3), np.float32),
        "metallic": np.zeros(4, np.float32),
        "roughness": np.full(4, 0.5, np.float32),
        "emissive": np.zeros((4, 3), np.float32),
        "albedo_texture": np.array([0, 1, -1, 2], np.int32),
        "normal_texture": np.array([0, -1, -1, 2], np.int32),
    }
    meta = [{"clamping": "Clamp"}, {}, {"clamping": "Repeat"}]

    H = W = 48
    mat_id = jnp.asarray(rng.integers(0, 4, (H, W)), jnp.int32)
    uv = jnp.asarray(rng.uniform(-0.2, 1.4, (H, W, 2)), jnp.float32)
    lod = jnp.asarray(rng.uniform(0, 3.5, (H, W)), jnp.float32)

    for u8, split, tol in (("0", "0", 1e-5), ("1", "1", 6e-3)):
        monkeypatch.setenv("SAILOR_QUAD_U8", u8)
        monkeypatch.setenv("SAILOR_QUAD_SPLIT", split)
        mt = MaterialTable.from_host(table, imgs, texture_size=S,
                                     sampler_meta=meta)
        assert mt.has_quad and mt.quad_has_normal
        if u8 == "1":
            # u8 rows ride 4-bytes-per-i32-lane packing (pack_u8_rows):
            # 28 bytes -> 7 lanes, quartering the per-row gather cost
            assert mt.tex_quad.dtype == jnp.int32
            assert mt.tex_quad.shape[-1] == 7
        else:
            assert mt.tex_quad.shape[-1] == 28
        if split == "1":
            assert mt.tex_quad_mip0 is not None

        alb_q, n_q, has_q = mt.sample_combined(mat_id, uv, lod)
        a_layer = mt.albedo_texture[mat_id]
        tex = mt.sample_texture(a_layer, uv, lod)
        m_alb = np.asarray(a_layer >= 0)
        d = np.abs(np.asarray(alb_q - tex)).max(-1)
        assert d[m_alb].max() < tol
        # materials with no albedo map sample the neutral 1.0
        assert np.allclose(np.asarray(alb_q)[~m_alb], 1.0)

        n_layer = mt.normal_texture[mat_id]
        ntex = mt.sample_texture(n_layer, uv, lod)
        m_n = np.asarray(n_layer >= 0)
        dn = np.abs(
            np.asarray(n_q) - np.asarray(ntex[..., :3] * 2 - 1)
        ).max(-1)
        assert dn[m_n].max() < tol
        assert bool(jnp.all(has_q == (n_layer >= 0)))
