"""Overlay UI (ImGuiApi / RenderImGuiNode analog): host-built HUD canvas
composited over Final on device."""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.engine.overlay import OverlayContext, stats_hud
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset

import test_framegraph as tf


def test_overlay_canvas_text_and_rect():
    ov = OverlayContext(128, 64)
    ov.new_frame()
    ov.rect(0, 0, 60, 20, fill=(0, 0, 0, 128))
    ov.text(4, 4, "60.0 FPS")
    c = ov.canvas()
    assert c.shape == (64, 128, 4)
    assert c[..., 3].max() > 0.4          # something drawn
    assert (c[..., 3] > 0).mean() < 0.3   # mostly transparent


def test_overlay_composites_over_final():
    asset = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: RenderScene\n - name: EyeAdaptation\n"
        " - name: RenderOverlay\n"
    )
    fg = FrameGraph(asset, tf.W, tf.H, config={"bin_capacity": 256, "bin_rounds": 2})
    scene = tf._scene_view()
    state = fg.initial_state()

    fg.prepare(scene, state)
    base, _ = fg.process(scene, state)   # no canvas -> no-op
    base_f = np.asarray(base["Final"])

    ov = OverlayContext(96, 48)
    stats_hud(ov, {"last_frame_ms": 16.6, "gpu_frames": 7})
    state2 = dict(state)
    state2["overlay/canvas"] = jnp.asarray(ov.canvas())
    fg2 = FrameGraph(asset, tf.W, tf.H, config={"bin_capacity": 256, "bin_rounds": 2})
    t2, _ = fg2.process(scene, state2)
    with_hud = np.asarray(t2["Final"])

    changed = np.abs(with_hud - base_f).sum(-1) > 1e-4
    # HUD affects only the top-left canvas region, and does affect it
    assert changed[:48, :96].sum() > 100
    assert changed[48:, :].sum() == 0 and changed[:, 96:].sum() == 0
