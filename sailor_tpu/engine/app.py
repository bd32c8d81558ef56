"""App + EngineLoop + Renderer: process-level engine loop.

Counterpart of Runtime/Sailor.{h,cpp} (App submodule registry + main loop),
Runtime/Engine/EngineLoop.cpp (CPU frame orchestration, ~120fps cap) and
Runtime/RHI/Renderer.cpp (frame pacing with 2 frames in flight).

On TPU, "2 frames in flight" is jax async dispatch: `frame N`'s arrays are
futures while the host prepares frame N+1; `block_until_ready` only on
present/readback. The submodule registry is a typed service locator like
App::GetSubmodule<T>.
"""

from __future__ import annotations

import time
from typing import Any

import jax

from sailor_tpu.engine.world import World
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
from sailor_tpu.utils.log import SAILOR_LOG


class App:
    """Static submodule registry (Sailor::App)."""

    _submodules: dict[type, Any] = {}

    @classmethod
    def add_submodule(cls, instance) -> Any:
        cls._submodules[type(instance)] = instance
        return instance

    @classmethod
    def get_submodule(cls, t: type):
        return cls._submodules.get(t)

    @classmethod
    def remove_submodule(cls, t: type) -> None:
        cls._submodules.pop(t, None)

    @classmethod
    def shutdown(cls) -> None:
        cls._submodules.clear()


class Renderer:
    """Frame-graph lifecycle + pacing (Runtime/RHI/Renderer.cpp).

    ``max_frames_in_flight=2`` (Renderer.h:34): at most two undispatched
    device frames; the host blocks on the oldest future before pushing the
    next (back-pressure at Renderer.cpp:209-214).
    """

    def __init__(self, renderer_path: str, width: int, height: int,
                 config: dict | None = None, max_frames_in_flight: int = 2):
        self.asset_path = renderer_path
        self.width = width
        self.height = height
        self.config = config or {}
        # RHISurface analog (Types.h RHISurface = MSAA target + resolved
        # pair): supersample=N renders the whole graph at N x resolution
        # and box-resolves Final back down — the visibility-buffer raster
        # has no hardware MSAA, SSAA is its honest equivalent.
        self.supersample = int(self.config.get("supersample", 1))
        self.max_frames_in_flight = max_frames_in_flight
        self._in_flight: list = []
        self.frame_graph = self._build()
        self.state = self.frame_graph.initial_state()
        self.stats = {"gpu_frames": 0, "last_frame_ms": 0.0}
        # F6 frame capture (RenderDocApi analog, utils/capture.py)
        from sailor_tpu.utils.capture import FrameCapture

        self.capture = FrameCapture()

    def _build(self) -> FrameGraph:
        ss = int(self.config.get("supersample", 1))
        return FrameGraph(
            FrameGraphAsset.load(self.asset_path),
            self.width * ss, self.height * ss, config=self.config,
        )

    def refresh_frame_graph(self) -> None:
        """F5 hot-reload: re-parse the .renderer and re-jit
        (Renderer::BeginConditionalDestroy + rebuild path)."""
        SAILOR_LOG("Renderer: refreshing frame graph")
        self.frame_graph = self._build()

    def fix_lost_device(self) -> None:
        """Device-loss recovery (Renderer::FixLostDevice,
        Renderer.cpp:166-172: on a lost device the reference rebuilds the
        swapchain + frame graph). The TPU analog: drop every in-flight
        async result, rebuild the jitted graph, and reseed temporal state
        — the next frame re-dispatches from scratch."""
        SAILOR_LOG("Renderer: device lost — rebuilding frame graph")
        self._in_flight.clear()
        self.frame_graph = self._build()
        self.state = self.frame_graph.initial_state()
        self.stats["device_losses"] = self.stats.get("device_losses", 0) + 1

    def push_frame(self, scene_view):
        """Dispatch one frame; returns the (async) target dict.

        A device error (TPU fault / tunnel drop, jax.errors.JaxRuntimeError)
        triggers FixLostDevice and ONE retry — matching the reference's
        per-frame ShouldFixLostDevice poll."""
        try:
            return self._push_frame(scene_view)
        except jax.errors.JaxRuntimeError:
            self.fix_lost_device()
            return self._push_frame(scene_view)

    def profile_nodes(self, repeats: int = 2) -> dict:
        """One per-node device-timing pass on the last pushed scene
        (Tracy 'GPU cost per node' analog); results land in
        ``stats['node_ms']`` for the overlay HUD / console."""
        scene = getattr(self, "_last_scene", None)
        if scene is None:
            return {}
        _, _, timings = self.frame_graph.process_pernode(
            scene, dict(self.state), repeats=repeats
        )
        self.stats["node_ms"] = timings
        return timings

    def _push_frame(self, scene_view):
        self._last_scene = scene_view
        if len(self._in_flight) >= self.max_frames_in_flight:
            jax.block_until_ready(self._in_flight.pop(0))
        t0 = time.perf_counter()
        self.frame_graph.prepare(scene_view, self.state)
        targets, self.state = self.frame_graph.process(scene_view, self.state)
        if self.supersample > 1:
            ss = self.supersample
            targets["FinalSS"] = targets["Final"]
            targets["Final"] = jax.lax.reduce_window(
                targets["Final"], 0.0, jax.lax.add,
                (ss, ss, 1), (ss, ss, 1), "VALID",
            ) * (1.0 / (ss * ss))
        self._in_flight.append(targets["Final"])
        self.stats["gpu_frames"] += 1
        self.stats["last_frame_ms"] = (time.perf_counter() - t0) * 1e3
        if self.capture.armed:
            path = self.capture.capture(targets, state=self.state)
            SAILOR_LOG(f"Renderer: frame captured to {path}")
        return targets

    def wait_idle(self) -> None:
        for t in self._in_flight:
            jax.block_until_ready(t)
        self._in_flight.clear()


class EngineLoop:
    """CPU frame orchestration (Runtime/Engine/EngineLoop.cpp)."""

    CPU_FPS_CAP = 120.0  # reference sleeps below ~1000/130 ms

    def __init__(self, world: World, renderer: Renderer, sky=None, stars=None,
                 overlay=None):
        from sailor_tpu.engine.input import InputState

        self.world = world
        self.renderer = renderer
        self.sky = sky
        self.stars = stars
        self.overlay = overlay  # OverlayContext (ImGuiApi analog) or None
        self._prev_frame = None
        self.frame_index = 0
        # GlobalInput analog: frontends inject events, components read
        # world.input during tick, edges reset at frame end
        self.input = InputState()
        world.input = self.input

    def process_cpu_frame(self, dt: float):
        """World tick -> scene snapshot -> renderer push (one frame).

        Mirrors EngineLoop::ProcessCpuFrame: ImGui NewFrame (overlay HUD
        build) -> world ticks -> render dispatch."""
        if self.overlay is not None:
            import jax.numpy as jnp

            from sailor_tpu.engine.overlay import stats_hud

            stats_hud(self.overlay, self.renderer.stats)
            self.renderer.state["overlay/canvas"] = jnp.asarray(
                self.overlay.canvas()
            )
        self.world.tick(dt)
        scene = self.world.scene_view(
            sky=self.sky, stars=self.stars, prev_frame=self._prev_frame
        )
        self._prev_frame = scene.frame
        targets = self.renderer.push_frame(scene)
        self.input.end_frame()
        self.frame_index += 1
        return targets

    def run(self, num_frames: int, dt: float = 1 / 60, pace: bool = False):
        """Fixed-step loop (headless main loop, App::Start while-loop)."""
        last = None
        for _ in range(num_frames):
            t0 = time.perf_counter()
            last = self.process_cpu_frame(dt)
            if pace:
                elapsed = time.perf_counter() - t0
                budget = 1.0 / self.CPU_FPS_CAP
                if elapsed < budget:
                    time.sleep(budget - elapsed)
        self.renderer.wait_idle()
        return last
