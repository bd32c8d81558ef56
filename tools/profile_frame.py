"""Per-pass profile of the headline Forward+ frame on the current backend.

Usage:
  python tools/profile_frame.py                 # 1080p/1k lights, per-node ms
  python tools/profile_frame.py --small         # 640x384 smoke
  python tools/profile_frame.py --trace DIR     # dump a jax device trace too

Per-node numbers come from FrameGraph.process_debug (eager, synced) — the
Tracy/GPU-cost analog. The jitted whole-graph time is printed for contrast
(XLA fuses across nodes, so the sum of eager nodes is an upper bound).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--trace", default=None, help="jax trace output dir")
    ap.add_argument("--eager", action="store_true", help="per-node eager timings")
    ap.add_argument("--pernode", action="store_true",
                    help="per-node jitted device timings")
    ap.add_argument("--nojit", action="store_true",
                    help="skip the whole-graph jitted timing")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--content", action="store_true",
                    help="textured Duck.glb x60 scene (bench --content)")
    ap.add_argument("--sponza", action="store_true",
                    help="sponza-materials atrium scene (bench --sponza)")
    args = ap.parse_args()

    import jax

    import bench
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset

    if args.small:
        width, height, num_lights, num_objects = 640, 384, 128, 24
    else:
        width, height, num_lights, num_objects = 1920, 1088, 1000, 96

    if args.sponza:
        scene = bench._build_sponza_scene(width, height, num_lights)
    elif args.content:
        scene = bench._build_content_scene(width, height, num_lights, 60)
    else:
        scene = bench._build_scene(width, height, num_lights, num_objects)
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "content/DefaultRenderer.renderer")
        ),
        width, height,
        config={
            "z_far": 150.0, "shadow_resolution": 1024, "env_resolution": 32,
            "bin_capacity": 1024, "bin_rounds": 4, "max_lights_per_tile": 128,
            "pallas_shading": True,
            "fused_resolve": os.environ.get(
                "SAILOR_FUSED_RESOLVE", "1") == "1",
        },
    )
    state = fg.initial_state()
    fg.prepare(scene, state)

    # jitted whole-graph FIRST (the trace is the ground truth; eager
    # per-node over the tunnel is dispatch-latency-dominated and optional)
    if not args.nojit:
        t0 = time.time()
        targets, state = fg.process(scene, state)
        jax.block_until_ready(targets["Final"])
        print(f"# jit compile+frame: {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for i in range(args.frames):
            # vary delta_time to defeat the tunnel's execution memoization;
            # THREAD the state like bench.py does so temporal caches (CSM
            # change-snapshot) hit as they would in a real app
            scene_i = scene.replace(
                frame=scene.frame.replace(
                    delta_time=scene.frame.delta_time + 1e-6 * (i + 1))
            )
            t0 = time.time()
            targets, state = fg.process(scene_i, state)
            jax.block_until_ready(targets["Final"])
            times.append(time.time() - t0)
        print(f"== jitted graph: best {min(times)*1e3:.1f} ms "
              f"({1.0/min(times):.2f} FPS), times "
              f"{[round(t*1e3,1) for t in times]}")

    if args.trace:
        scene_t = scene.replace(
            frame=scene.frame.replace(delta_time=scene.frame.delta_time + 1e-4)
        )
        with jax.profiler.trace(args.trace):
            targets, _ = fg.process(scene_t, state)  # state is threaded (warm)
            jax.block_until_ready(targets["Final"])
        print(f"# trace written to {args.trace}", file=sys.stderr)

    if args.pernode:
        _t, _s, timings = fg.process_pernode(scene, state, repeats=args.frames)
        total = sum(timings.values())
        print(f"\n== per-node (jitted separately, best of {args.frames}) ==")
        for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<24} {v:8.2f} ms  {100*v/total:5.1f}%")
        print(f"  {'TOTAL':<24} {total:8.2f} ms")

    if args.eager:
        # timed eager per-node passes (best of N). Jitter the camera per
        # iteration: the tunnel memoizes byte-identical executions (~0ms).
        best: dict[str, float] = {}
        for i in range(args.frames):
            eps = 1e-5 * (i + 1)
            scene_i = scene.replace(
                frame=scene.frame.replace(
                    camera_position=scene.frame.camera_position + eps,
                    delta_time=scene.frame.delta_time + eps,
                )
            )
            _t, _s, timings = fg.process_debug(scene_i, state)
            for k, v in timings.items():
                best[k] = min(best.get(k, 1e9), v)
        total = sum(best.values())
        print(f"\n== per-node (eager, best of {args.frames}) ==")
        for k, v in sorted(best.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<24} {v:8.2f} ms  {100*v/total:5.1f}%")
        print(f"  {'TOTAL':<24} {total:8.2f} ms")


if __name__ == "__main__":
    main()
