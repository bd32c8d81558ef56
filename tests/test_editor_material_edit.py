"""Editor asset-editing round trip (VERDICT r4 #8).

The reference's C# editor edits a .mat through per-asset ViewModels and the
engine hot-reloads it (Editor/ViewModels/, EngineService.cs:16-69,
MaterialImporter.cpp:53 OnHotReload). TPU counterpart: EditorServer
.update_asset patches the .mat YAML -> AssetRegistry.check_hot_reload ->
MaterialLibrary rebuilds its device MaterialTable -> the NEXT rendered
frame reflects the edit.
"""

import numpy as np

RED_MAT = """\
name: TestRed
renderQueue: Opaque
shader: Standard
uniformsVec4:
  material.albedo: [0.9, 0.05, 0.05, 1.0]
uniformsFloat:
  material.roughness: 0.6
  material.metallic: 0.0
"""


def _make_world():
    from sailor_tpu.engine.components import (
        CameraComponent, LightComponent, MeshRendererComponent,
    )
    from sailor_tpu.engine.world import World

    w = World("MatEdit")
    cam = w.instantiate("Camera")
    cam.position = [0.0, 1.0, 4.0]
    cam.add_component(CameraComponent(fov_degrees=60.0, aspect=1.5))
    sun = w.instantiate("Sun")
    sun.add_component(
        LightComponent(light_type=0,  # Directional
                       direction=[-0.2, -0.9, -0.3],
                       intensity=[5.0, 5.0, 5.0])
    )
    box = w.instantiate("Box")
    box.position = [0.0, 1.0, 0.0]
    box.add_component(MeshRendererComponent(mesh_asset="cube", material_id=0))
    return w


def test_material_edit_roundtrip(tmp_path):
    from sailor_tpu.assets.materials import MaterialLibrary
    from sailor_tpu.assets.registry import AssetRegistry
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.engine.editor_server import EditorServer
    from sailor_tpu.kernels.sky import SkyParams

    mat_path = tmp_path / "TestRed.mat"
    mat_path.write_text(RED_MAT)
    reg = AssetRegistry(str(tmp_path))
    reg.scan_content_folder()

    lib = MaterialLibrary(reg, [str(mat_path)])
    assert lib.table is not None and lib.version == 1
    a0 = np.asarray(lib.table.albedo[0])
    assert a0[0] > 0.5 and a0[1] < 0.2  # red

    world = _make_world()
    world.materials = lib
    world.tick(1 / 60)

    r = Renderer(
        "content/DefaultRenderer.renderer", 96, 64,
        config={"bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False,
                "shadow_resolution": 128, "env_resolution": 16},
    )
    loop = EngineLoop(world, r, sky=SkyParams.default())
    f1 = np.asarray(loop.process_cpu_frame(1 / 60)["Main"])

    editor = EditorServer()
    editor.world = world
    editor.registry = reg
    ok = editor.update_asset(
        str(mat_path),
        "uniformsVec4:\n  material.albedo: [0.05, 0.9, 0.05, 1.0]\n",
    )
    assert ok
    # hot reload fired the library listener and swapped the device table
    assert lib.version == 2
    a1 = np.asarray(lib.table.albedo[0])
    assert a1[1] > 0.5 and a1[0] < 0.2  # green now

    f2 = np.asarray(loop.process_cpu_frame(1 / 60)["Main"])
    # the box region flips from red- to green-dominant in the NEXT frame;
    # sky pixels are red-dominant at this sun angle too, so key the box
    # mask on pixels that actually CHANGED between the frames
    changed = np.abs(f2 - f1).sum(-1) > 0.05
    box = changed & (f1[..., 0] > f1[..., 1])
    assert box.sum() > 50  # the box is visible
    assert (f2[..., 1] > f2[..., 0])[box].mean() > 0.8


def test_web_asset_update_endpoint(tmp_path):
    """POST /api/asset/update patches the asset through the registry."""
    import yaml

    from sailor_tpu.assets.registry import AssetRegistry
    from sailor_tpu.engine.editor_server import EditorServer
    from sailor_tpu.engine.editor_web import EditorWebApp

    mat_path = tmp_path / "TestRed.mat"
    mat_path.write_text(RED_MAT)
    reg = AssetRegistry(str(tmp_path))
    reg.scan_content_folder()

    editor = EditorServer()
    editor.initialize()
    editor.registry = reg
    app = EditorWebApp(editor)
    status, _, payload = app.handle(
        "POST", f"/api/asset/update?path={mat_path}",
        b"uniformsFloat:\n  material.roughness: 0.123\n",
    )
    assert status == 200 and b'"ok": true' in payload
    doc = yaml.safe_load(mat_path.read_text())
    assert abs(doc["uniformsFloat"]["material.roughness"] - 0.123) < 1e-9
    # untouched fields survive the merge
    assert doc["uniformsVec4"]["material.albedo"][0] == 0.9
