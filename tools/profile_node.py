"""Trace ONE frame-graph node's jitted program at 1080p.

Usage: python tools/profile_node.py 10 --trace /tmp/ntrace
(then parse with tools/parse_trace.py)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("node", type=int)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    import bench
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.framegraph.graph import RenderContext

    if args.small:
        width, height, num_lights, num_objects = 640, 384, 128, 24
    else:
        width, height, num_lights, num_objects = 1920, 1088, 1000, 96
    scene = bench._build_scene(width, height, num_lights, num_objects)
    fg = FrameGraph(
        FrameGraphAsset.load(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "content/DefaultRenderer.renderer")),
        width, height,
        config={"z_far": 150.0, "shadow_resolution": 1024, "env_resolution": 32,
                "bin_capacity": 1024, "bin_rounds": 2,
                "max_lights_per_tile": 128, "pallas_shading": True},
    )
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets = fg.targets.allocate()
    cfg = dict(width=fg.width, height=fg.height, values=fg.asset.values,
               config=fg.config)

    # run everything before the target node once to build its inputs
    def run_prefix(scene, state, targets):
        ctx = RenderContext(scene=scene, state=state, **cfg)
        for n in fg.nodes[: args.node]:
            targets = n.process(ctx, dict(targets))
        return targets

    targets = jax.jit(run_prefix)(scene, state, targets)
    jax.block_until_ready(targets)
    node = fg.nodes[args.node]
    print(f"# node {args.node}: {node.node_name} {node.params}", file=sys.stderr)

    def run_node(scene, state, targets):
        ctx = RenderContext(scene=scene, state=state, **cfg)
        return node.process(ctx, dict(targets))

    fn = jax.jit(run_node)
    out = fn(scene, state, targets)
    jax.block_until_ready(out)
    for i in range(3):
        s = scene.replace(frame=scene.frame.replace(
            camera_position=scene.frame.camera_position + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        out = fn(s, state, targets)
        jax.block_until_ready(out)
        print(f"# run {i}: {(time.perf_counter()-t0)*1e3:.1f} ms", file=sys.stderr)
    if args.trace:
        s = scene.replace(frame=scene.frame.replace(
            camera_position=scene.frame.camera_position + 5e-6))
        with jax.profiler.trace(args.trace):
            out = fn(s, state, targets)
            jax.block_until_ready(out)
        print(f"# trace -> {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
