"""Diagnose content-dependent compile time: trace the frame graph for each
bench scene and report the closure CONSTANTS captured in the jaxpr. A
graph whose jaxpr carries multi-MB consts is serializing scene data into
the executable — the cause of 250-597 MB AOT entries and content-scaled
compile time (VERDICT r4 weak #5/#6). Tracing (no lowering/compile) keeps
this fast and CPU-only.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SAILOR_AOT_CACHE", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset  # noqa: E402


def report(tag, scene, width, height):
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "content/DefaultRenderer.renderer")
        ),
        width, height,
        config={
            "z_far": 150.0, "shadow_resolution": 1024, "env_resolution": 32,
            "bin_capacity": 1024, "bin_rounds": 4, "max_lights_per_tile": 128,
            "pallas_shading": True, "fused_resolve": True,
        },
    )
    state = fg.initial_state()
    fg.prepare(scene, state)
    import time
    t0 = time.time()
    traced = jax.jit(fg._run).trace(scene, state)
    cj = traced.jaxpr
    consts = cj.consts
    print(f"== {tag}: trace {time.time()-t0:.1f}s, {len(consts)} consts, "
          f"{len(cj.jaxpr.eqns)} top-level eqns")
    sizes = []
    for c in consts:
        try:
            nb = np.asarray(c).nbytes
        except Exception:
            nb = 0
        sizes.append((nb, getattr(c, "shape", "?"), getattr(c, "dtype", "?")))
    sizes.sort(reverse=True, key=lambda s: s[0])
    tot = sum(s for s, _, _ in sizes)
    print(f"   const total {tot/1e6:.1f} MB; top:")
    for nb, shape, dt in sizes[:12]:
        if nb < 1e4:
            break
        print(f"     {nb/1e6:9.2f} MB  {shape} {dt}")
    sys.stdout.flush()
    return tot


def main():
    w, h = 640, 384
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "proc"):
        report("procedural", bench._build_scene(w, h, 128, 24), w, h)
    if which in ("all", "duck") and os.path.exists(bench.DUCK_GLB):
        report("duck-content", bench._build_content_scene(w, h, 128, 60), w, h)
    if which in ("all", "sponza") and os.path.exists(bench.SPONZA_MTL):
        report("sponza", bench._build_sponza_scene(w, h, 128), w, h)


if __name__ == "__main__":
    main()
