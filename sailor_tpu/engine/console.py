"""Console command dispatch — counterpart of the reference's stdin console
(Runtime/Sailor.cpp:219-252): `scan`, `stats.memory`, the container/memory
benchmark commands, plus world save/load and frame-graph refresh."""

from __future__ import annotations

from typing import Callable

from sailor_tpu.utils.log import SAILOR_LOG


class Console:
    def __init__(self, world=None, renderer=None, assets=None):
        self.world = world
        self.renderer = renderer
        self.assets = assets
        self.commands: dict[str, Callable[[list[str]], str]] = {}
        self._register_defaults()

    def register(self, name: str, fn: Callable[[list[str]], str]) -> None:
        self.commands[name] = fn

    def execute(self, line: str) -> str:
        parts = line.strip().split()
        if not parts:
            return ""
        cmd, args = parts[0], parts[1:]
        fn = self.commands.get(cmd)
        if fn is None:
            return f"unknown command '{cmd}' (try: {', '.join(sorted(self.commands))})"
        out = fn(args)
        SAILOR_LOG("console: %s -> %s", line.strip(), out.splitlines()[0] if out else "ok")
        return out

    # -- defaults ---------------------------------------------------------------

    def _register_defaults(self) -> None:
        self.register("scan", self._cmd_scan)
        self.register("stats.memory", self._cmd_stats_memory)
        self.register("world.save", self._cmd_world_save)
        self.register("refresh", self._cmd_refresh)
        self.register("capture", self._cmd_capture)
        self.register("profile", self._cmd_profile)
        self.register("cache.stats", self._cmd_cache_stats)
        self.register("cache.expire", self._cmd_cache_expire)
        self.register("cache.clear", self._cmd_cache_clear)
        # benchmark commands (reference: memory/vector/set/map/list/octree.benchmark)
        from sailor_tpu.utils import benchmarks

        for name in benchmarks.ALL:
            self.register(
                f"{name}.benchmark",
                lambda args, n=name: benchmarks.run(n),
            )

    def _cmd_scan(self, args) -> str:
        if self.assets is None:
            return "no asset registry"
        n = self.assets.scan_content_folder()
        reloaded = self.assets.check_hot_reload()
        return f"scanned {n} assets, hot-reloaded {len(reloaded)}"

    # -- compiled-program caches (ShaderCache::Expire/ClearAll parity) ------

    def _cmd_cache_stats(self, args) -> str:
        from sailor_tpu.assets import aot_cache, shader_cache

        s = shader_cache.stats()
        a = aot_cache.stats()
        return (f"xla: {s['entries']} entries {s['bytes']/1e6:.0f} MB "
                f"({s['dir']}); aot: {a['entries']} entries "
                f"{a['bytes']/1e6:.0f} MB ({a['dir']})")

    def _cmd_cache_expire(self, args) -> str:
        from sailor_tpu.assets import aot_cache, shader_cache

        days = float(args[0]) if args else 14.0
        nx = shader_cache.expire(days)
        na = aot_cache.expire(days)
        return f"expired {nx} xla + {na} aot entries older than {days:g}d"

    def _cmd_cache_clear(self, args) -> str:
        from sailor_tpu.assets import aot_cache, shader_cache

        shader_cache.clear()
        aot_cache.clear()
        return "caches cleared"

    def _cmd_capture(self, args) -> str:
        """Arm a frame capture (F6 / RenderDocApi::TriggerCapture analog);
        the renderer dumps the NEXT frame's targets to Captures/."""
        if self.renderer is None or not hasattr(self.renderer, "capture"):
            return "no renderer attached"
        self.renderer.capture.trigger()
        return "capture armed for next frame"

    def _cmd_profile(self, args) -> str:
        """Per-node device timings of the current frame graph (Tracy GPU
        cost listing analog); also feeds the overlay HUD."""
        if self.renderer is None or not hasattr(self.renderer, "profile_nodes"):
            return "no renderer attached"
        t = self.renderer.profile_nodes()
        if not t:
            return "no frame pushed yet"
        total = sum(t.values())
        lines = [
            f"{name}: {ms:7.2f} ms"
            for name, ms in sorted(t.items(), key=lambda kv: -kv[1])
        ]
        lines.append(f"TOTAL (sum of nodes): {total:.2f} ms")
        return "\n".join(lines)

    def _cmd_stats_memory(self, args) -> str:
        """GPU/host arena occupancy (Renderer.cpp stats.memory analog)."""
        import jax

        lines = []
        for d in jax.devices():
            try:
                s = d.memory_stats()
                lines.append(
                    f"{d}: in_use={s.get('bytes_in_use', 0)/1e6:.1f}MB "
                    f"limit={s.get('bytes_limit', 0)/1e6:.1f}MB"
                )
            except Exception:
                lines.append(f"{d}: (no memory stats)")
        if self.world is not None:
            lines.append(
                f"transform pool: {self.world.transforms.pool.num_alive}"
                f"/{self.world.transforms.pool.capacity}"
            )
        # native multipool occupancy (TMultiPoolAllocator stats; the
        # reference's stats.memory dumps GPU arena occupancy the same way)
        try:
            from sailor_tpu import native_bridge as nb

            if nb.available():
                mp = getattr(self, "_mpool", None)
                if mp is None:
                    mp = self._mpool = nb.MultiPool()
                s = mp.stats()
                lines.append(
                    f"native multipool: {s['used']}/{s['capacity']} blocks, "
                    f"{s['pages']} pages, "
                    f"{s['reserved_bytes']/1e6:.1f}MB reserved"
                )
        except Exception:
            pass
        return "\n".join(lines) or "no devices"

    def _cmd_world_save(self, args) -> str:
        if self.world is None:
            return "no world"
        path = args[0] if args else "/tmp/world_save.world"
        self.world.save(path)
        return f"saved {path}"

    def _cmd_refresh(self, args) -> str:
        """F5: rescan assets + rebuild frame graph."""
        out = []
        if self.assets is not None:
            out.append(self._cmd_scan(args))
        if self.renderer is not None:
            self.renderer.refresh_frame_graph()
            out.append("frame graph refreshed")
        return "; ".join(out) or "nothing to refresh"
