"""Frame-graph core: YAML asset, node registry, jit compilation.

YAML schema (parity with Content/DefaultRenderer.renderer and
FrameGraphAsset::Deserialize, FrameGraphParser.cpp:23-78):

```yaml
float:                       # named scalar values
  Bloom.Intensity: 0.35
renderTargets:
  - name: Main
    format: R16G16B16A16_SFLOAT
    width: ViewportWidth     # or int / "ViewportWidth/2" expressions
    height: ViewportHeight
frame:                       # ordered node list
  - name: DepthPrepass
  - name: LightCulling
  - name: Sky
    string: EnvCubemap       # node-specific params
  - name: RenderScene
  - name: Bloom
  - name: EyeAdaptation
```

Nodes self-register by name via the @node decorator (the analog of the
reference's CRTP static factory, FrameGraphNode.h:22-68). ``compile()``
folds the ordered node list into one function and jits it; per-node debug
execution (eager, timed) is available for profiling parity with the
reference's GPU-cost tracking.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import yaml

from sailor_tpu.rhi.types import RenderTargets, TargetSpec

_NODE_REGISTRY: dict[str, type] = {}


def node(name: str):
    """Register a frame-graph node class under its YAML name."""

    def deco(cls):
        cls.node_name = name
        _NODE_REGISTRY[name] = cls
        return cls

    return deco


def node_types() -> dict[str, type]:
    return dict(_NODE_REGISTRY)


class BaseNode:
    """A frame-graph node: pure function over the target dict.

    Parameters from YAML land in ``self.params`` (BaseFrameGraphNode's
    string/vec4/float/resource param store). Nodes must be traceable:
    ``process`` runs under jit.
    """

    node_name = "Base"

    def __init__(self, params: dict | None = None):
        self.params = params or {}

    def p(self, key: str, default=None):
        return self.params.get(key, default)

    def prepare(self, ctx: "RenderContext") -> None:
        """Host-side per-frame setup (cache lookups, bakes). Runs eagerly
        BEFORE jit tracing; may stash arrays on self for process()."""

    def process(self, ctx: "RenderContext", targets: dict) -> dict:
        raise NotImplementedError


@dataclasses.dataclass
class RenderContext:
    """Static + per-frame context handed to nodes.

    Multi-chip: when the graph runs inside a shard_map over screen rows,
    ``width``/``height`` are the LOCAL slice dims, ``full_height`` the
    global viewport, ``row0`` the (traced) global row of local row 0 and
    ``mesh_axis`` the shard_map axis name — nodes that need global pixel
    coordinates (ray generation, tile frustums, AO windows) or cross-slice
    data (histogram, bloom, motion-blur taps) read these. Single-chip:
    row0 = 0, full == local, mesh_axis None (all node code degenerates to
    the plain path).
    """

    width: int
    height: int
    scene: Any = None          # SceneView (pytree) — traced
    state: dict | None = None  # temporal state dict (avg_lum, env maps...) — traced
    values: dict | None = None  # named floats from YAML
    config: dict | None = None  # misc static config
    full_height: int | None = None
    row0: Any = 0              # traced scalar under shard_map
    mesh_axis: str | None = None
    mesh_size: int = 1

    def value(self, key: str, default: float = 0.0) -> float:
        return (self.values or {}).get(key, default)

    @property
    def fh(self) -> int:
        return self.full_height if self.full_height is not None else self.height

    @property
    def sharded(self) -> bool:
        return self.mesh_axis is not None

    def upsample(self, src, dst_hw):
        """Pow2 bilinear upsample, slice-boundary-exact when sharded."""
        from sailor_tpu.kernels import sampling as _s

        if self.sharded:
            return _s.upsample_bilinear_pow2_sharded(
                src, dst_hw, self.mesh_axis, self.mesh_size
            )
        return _s.upsample_bilinear_pow2(src, dst_hw)


@dataclasses.dataclass
class FrameGraphAsset:
    """Parsed `.renderer` file."""

    targets: list[TargetSpec]
    frame: list[dict]
    values: dict[str, float]

    @classmethod
    def from_yaml(cls, text: str) -> "FrameGraphAsset":
        doc = yaml.safe_load(text) or {}
        targets = []
        for t in doc.get("renderTargets", []) or []:
            targets.append(
                TargetSpec(
                    name=t["name"],
                    format=t.get("format", "R16G16B16A16_SFLOAT"),
                    width=t.get("width", "ViewportWidth"),
                    height=t.get("height", "ViewportHeight"),
                    mips=t.get("mips", 1),
                    clear=tuple(t.get("clear", (0.0, 0.0, 0.0, 0.0))),
                )
            )
        frame = []
        for entry in doc.get("frame", []) or []:
            if isinstance(entry, str):
                entry = {"name": entry}
            frame.append(dict(entry))
        values = dict(doc.get("float", {}) or {})
        return cls(targets=targets, frame=frame, values=values)

    @classmethod
    def load(cls, path: str) -> "FrameGraphAsset":
        with open(path) as f:
            return cls.from_yaml(f.read())


class FrameGraph:
    """Materialized frame graph (RHIFrameGraph counterpart)."""

    def __init__(self, asset: FrameGraphAsset, width: int, height: int,
                 config: dict | None = None):
        self.asset = asset
        self.width = width
        self.height = height
        self.config = config or {}
        self.targets = RenderTargets(width, height)
        for spec in asset.targets:
            self.targets.declare(spec)
        self.nodes: list[BaseNode] = []
        for entry in asset.frame:
            name = entry["name"]
            if name not in _NODE_REGISTRY:
                raise KeyError(
                    f"unknown frame-graph node '{name}' "
                    f"(registered: {sorted(_NODE_REGISTRY)})"
                )
            params = {k: v for k, v in entry.items() if k != "name"}
            self.nodes.append(_NODE_REGISTRY[name](params))
        self._jitted: Callable | None = None
        self._jitted_sharded: dict = {}

    # -- execution ---------------------------------------------------------

    def _run(self, scene, state):
        ctx = RenderContext(
            width=self.width, height=self.height, scene=scene, state=state,
            values=self.asset.values, config=self.config,
        )
        targets = self.targets.allocate()
        targets.update({k: v for k, v in state.items() if k.startswith("rt/")})
        for i, n in enumerate(self.nodes):
            # named scopes annotate XLA metadata -> per-node attribution in
            # device traces (the Tracy-zone analog for profiling)
            with jax.named_scope(f"{i:02d}_{n.node_name}"):
                targets = n.process(ctx, targets)
        new_state = dict(state)
        new_state.update(targets.pop("state_out", {}))
        return targets, new_state

    def prepare(self, scene, state) -> None:
        """Host-side node prep (cache-gated bakes). Call once per frame
        BEFORE process (Renderer::PushFrame prepare stage analog)."""
        ctx = RenderContext(
            width=self.width, height=self.height, scene=scene, state=state,
            values=self.asset.values, config=self.config,
        )
        for n in self.nodes:
            n.prepare(ctx)

    def _logical_key(self) -> str:
        """Everything static the traced graph depends on besides source code
        and input avals: node list + params, target specs, values, config,
        viewport. Feeds the AOT executable-cache key."""
        return repr((
            [(type(n).__name__, sorted(n.params.items())) for n in self.nodes],
            [dataclasses.astuple(t) for t in self.asset.targets],
            sorted(self.asset.values.items()),
            sorted(self.config.items(), key=str),
            self.width, self.height,
        ))

    def process(self, scene, state: dict):
        """Jitted execution of the whole graph. Returns (targets, state).

        First call resolves through the AOT executable cache
        (assets/aot_cache.py): a warm start deserializes the compiled
        program instead of re-tracing + re-compiling the mega-jit."""
        if self._jitted is None:
            from sailor_tpu.assets import aot_cache

            if aot_cache.enabled():
                self._jitted = aot_cache.load_or_compile(
                    self._run, (scene, state),
                    logical_key=self._logical_key(), label="framegraph",
                )
            else:
                self._jitted = jax.jit(self._run)
        try:
            return self._jitted(scene, state)
        except TypeError:
            # AOT executables are pinned to the first call's avals; a
            # shape/dtype drift (tests reusing one graph across scenes)
            # falls back to a plain re-traceable jit.
            self._jitted = jax.jit(self._run)
            return self._jitted(scene, state)

    def process_views(self, scene, states: list, frames: list):
        """Render N cameras of ONE world in one process — the analog of
        RHISceneView's per-camera snapshot list (SceneView.h:85-115) with
        RHIFrameGraph running once per snapshot (RHIFrameGraph.cpp:95).

        ``frames``: list of FrameData (one per camera); ``states``: one
        temporal-state dict per camera (camera-dependent caches — CSM
        change snapshots, HiZ pyramids, exposure — must not cross-bleed
        between views). Host-side bakes in ``prepare`` (environment/IBL)
        are instance-cached and shared across views. All views share one
        compiled executable: the camera is a traced FrameData, so view 2+
        costs zero recompiles.

        Returns (list of target dicts, list of new states).
        """
        outs, new_states = [], []
        for frame, st in zip(frames, states):
            view_scene = scene.replace(
                frame=frame,
                # the main camera keeps its real history (motion blur);
                # secondary views reproject against themselves (static)
                prev_frame=(scene.prev_frame if frame is scene.frame
                            else frame),
            )
            t, s = self.process(view_scene, st)
            outs.append(t)
            new_states.append(s)
        return outs, new_states

    # -- multi-chip execution ------------------------------------------------

    def process_sharded(self, scene, state: dict, mesh, axis: str = "screen",
                        extra_outputs: tuple = ()):
        """Run the FULL node pipeline screen-row-sharded over a device mesh.

        Each chip executes every node on its row slice (local viewport via
        RenderContext.row0/full_height); cross-slice data moves through
        collectives inside the nodes (histogram psum, bloom / motion-blur
        all_gather, halo ppermutes for blur/AO/upsamples). Returns
        ({"Final", "Main"} gathered full-frame, new_state) — bit-matching
        the single-device graph (tests/test_parallel_graph.py).
        """
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n = mesh.shape[axis]
        if self.height % (n * 32) != 0:
            raise ValueError(
                f"height {self.height} must split into 32-px tile rows "
                f"across {n} shards"
            )
        h_local = self.height // n
        key = (n, axis, tuple(extra_outputs))
        if self._jitted_sharded.get(key) is None:
            local_targets = RenderTargets(self.width, h_local)
            for spec in self.asset.targets:
                local_targets.declare(spec)

            def shard_body(scene, state):
                idx = jax.lax.axis_index(axis)
                row0 = idx * h_local
                ctx = RenderContext(
                    width=self.width, height=h_local, scene=scene,
                    state=state, values=self.asset.values, config=self.config,
                    full_height=self.height, row0=row0,
                    mesh_axis=axis, mesh_size=n,
                )
                targets = local_targets.allocate()
                for i, nd in enumerate(self.nodes):
                    with jax.named_scope(f"{i:02d}_{nd.node_name}"):
                        targets = nd.process(ctx, targets)
                out = {
                    "Final": jax.lax.all_gather(
                        targets["Final"], axis, axis=0, tiled=True
                    ),
                    "Main": jax.lax.all_gather(
                        targets["Main"], axis, axis=0, tiled=True
                    ),
                }
                for name in extra_outputs:  # debugging/inspection
                    out[name] = jax.lax.all_gather(
                        targets[name], axis, axis=0, tiled=True
                    )
                # Propagate the FULL temporal state (advisor r2): replicated
                # entries (csm/*, avg_luminance — psum'd in-node, particle
                # world-space sim) pass through; row-local entries (HiZ mips
                # built from the local Depth slice, particle trails) are
                # gathered to full height so state shapes match
                # initial_state() and the single-device graph. h_local is a
                # multiple of 32 so the min-pyramid windows (<=16 rows for
                # the culling levels) never straddle a shard boundary.
                new_state = dict(state)
                st = targets.get("state_out", {})
                for k, v in st.items():
                    if (k.startswith("hiz/") or k == "particles/trail"
                            or k == "sky/buf"):
                        new_state[k] = jax.lax.all_gather(
                            v, axis, axis=0, tiled=True
                        )
                    else:
                        new_state[k] = v
                return out, new_state

            fn = shard_map(
                shard_body, mesh=mesh, in_specs=(P(), P()),
                out_specs=(P(), P()), check_vma=False,
            )
            from sailor_tpu.assets import aot_cache

            if aot_cache.enabled():
                self._jitted_sharded[key] = aot_cache.load_or_compile(
                    fn, (scene, state),
                    logical_key=self._logical_key() + repr(
                        (key, tuple(mesh.shape.items()),
                         [d.id for d in mesh.devices.flat])
                    ),
                    label=f"framegraph-sharded-{n}x",
                )
            else:
                self._jitted_sharded[key] = jax.jit(fn)
        return self._jitted_sharded[key](scene, state)

    def process_debug(self, scene, state: dict):
        """Eager per-node execution with wall-clock timings — the analog of
        the reference's per-command-list GPU cost tracking (Tracy zones)."""
        ctx = RenderContext(
            width=self.width, height=self.height, scene=scene, state=state,
            values=self.asset.values, config=self.config,
        )
        targets = self.targets.allocate()
        timings = {}
        for i, n in enumerate(self.nodes):
            t0 = time.perf_counter()
            targets = n.process(ctx, targets)
            jax.block_until_ready(targets)
            label = n.node_name + (
                f"/{n.p('shader')}" if n.p("shader") else ""
            )
            timings[f"{i:02d}_{label}"] = (time.perf_counter() - t0) * 1e3
        new_state = dict(state)
        new_state.update(targets.pop("state_out", {}))
        return targets, new_state, timings

    def process_pernode(self, scene, state: dict, repeats: int = 3):
        """Per-node DEVICE timing: each node jitted separately, fed the
        materialized outputs of the previous one. Sum-of-nodes approximates
        the fused frame (upper bound: node boundaries force HBM
        materialization). Inputs are jittered per repeat so memoizing
        runtimes cannot fake 0ms. Returns (targets, new_state, timings_ms)."""
        targets = self.targets.allocate()
        timings = {}
        for i, n in enumerate(self.nodes):
            ctx_cfg = dict(
                width=self.width, height=self.height,
                values=self.asset.values, config=self.config,
            )

            def run_node(scene, state, targets, _n=n, _cfg=ctx_cfg):
                ctx = RenderContext(scene=scene, state=state, **_cfg)
                return _n.process(ctx, dict(targets))

            fn = jax.jit(run_node)
            out = fn(scene, state, targets)
            jax.block_until_ready(out)
            best = 1e9
            for r in range(repeats):
                eps = 1e-6 * (r + 1)
                scene_r = scene.replace(
                    frame=scene.frame.replace(
                        camera_position=scene.frame.camera_position + eps
                    )
                )
                t0 = time.perf_counter()
                out_r = fn(scene_r, state, targets)
                jax.block_until_ready(out_r)
                best = min(best, (time.perf_counter() - t0) * 1e3)
            label = n.node_name + (f"/{n.p('shader')}" if n.p("shader") else "")
            timings[f"{i:02d}_{label}"] = best
            targets = out
        new_state = dict(state)
        new_state.update(targets.pop("state_out", {}))
        return targets, new_state, timings

    def initial_state(self) -> dict:
        import jax.numpy as jnp

        state = {"avg_luminance": jnp.asarray(0.18, jnp.float32)}
        if self.config.get("csm_cache", True) and any(
            n.node_name == "ShadowPrepass" for n in self.nodes
        ):
            from sailor_tpu import config as _cfg

            s = int(self.config.get("shadow_resolution", 1024))
            c = _cfg.NUM_CSM_CASCADES
            state["csm/maps"] = jnp.zeros((c, s, s), jnp.float32)
            state["csm/evsm"] = jnp.zeros((c, s, s, 4), jnp.float32)
            # sentinel forces the first frame dirty (|key - (-1e30)| > 0;
            # never use inf: inf - inf = nan and nan > 0 is False)
            state["csm/key"] = jnp.full((c * 16 + 3,), -1e30, jnp.float32)
        if self.config.get("sky_cache", True) and any(
            n.node_name == "Sky" for n in self.nodes
        ):
            # sentinel key forces frame-1 dirty (same pattern as csm/key)
            state["sky/buf"] = jnp.zeros(
                (self.height, self.width, 3), jnp.float32
            )
            state["sky/key"] = jnp.full((18,), -1e30, jnp.float32)
        if self.config.get("hiz_culling", True):
            # seed the HiZ culling pyramid with zeros (reverse-Z 0 = "no
            # occluder", culls nothing) so the jit signature is stable
            # between frame 1 and frame 2 — the shapes MUST match what
            # DepthHighZNode publishes (build_min_pyramid of the Depth
            # target, culling levels = mips[2:]).
            from sailor_tpu.kernels import sampling as _s

            levels = 8
            for n in self.nodes:
                if n.node_name == "DepthHighZ":
                    levels = int(n.p("levels", 8))
            mips = _s.build_min_pyramid(
                jnp.zeros((self.height, self.width), jnp.float32), levels
            )
            for i, m in enumerate(mips[2:]):
                state[f"hiz/mip{i}"] = m
        return state
