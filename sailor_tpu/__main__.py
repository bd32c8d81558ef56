"""Headless engine entry point — counterpart of Exec/Main.cpp + the
App::Start main loop: load a world, run the engine loop, accept console
commands, optionally write frames to disk.

  python -m sailor_tpu --world content/Editor.world --frames 60 \\
      --out /tmp/out.png [--width 1280 --height 704] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sailor_tpu")
    ap.add_argument("--world", default="content/Editor.world")
    ap.add_argument("--renderer", default="content/DefaultRenderer.renderer")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--command", action="append", default=[],
                    help="console command(s) to run after the loop")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # single-graph process: the AOT executable cache is safe
        # on CPU here (only one deserialized program per process)
        import os as _os
        _os.environ.setdefault("SAILOR_AOT_CACHE", "1")
        from sailor_tpu.assets import shader_cache as _sc
        _sc.rescope_for_cpu()  # CPU cache entries are host-specific

    from sailor_tpu.assets.registry import AssetRegistry
    from sailor_tpu.engine import World
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.engine.console import Console
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.utils.log import SAILOR_LOG

    registry = AssetRegistry()
    registry.scan_content_folder()
    world = World.load(args.world, assets=registry)
    renderer = Renderer(
        args.renderer, args.width, args.height,
        config={"shadow_resolution": 512, "env_resolution": 32,
                "bin_capacity": 512, "bin_rounds": 2},
    )
    sky = SkyParams.default(sun_direction=(-0.35, -0.7, -0.3))
    loop = EngineLoop(world, renderer, sky=sky)
    console = Console(world=world, renderer=renderer, assets=registry)

    SAILOR_LOG("sailor_tpu: world '%s' %dx%d", world.name, args.width, args.height)
    t0 = time.time()
    targets = loop.run(args.frames)
    dt = time.time() - t0
    print(f"{args.frames} frames in {dt:.2f}s "
          f"({args.frames/dt:.2f} FPS incl. compile)")

    for cmd in args.command:
        print(f"> {cmd}")
        print(console.execute(cmd))

    if args.out and targets is not None:
        import imageio.v2 as imageio
        import numpy as np

        imageio.imwrite(args.out, np.asarray(targets["Final"] * 255).astype("uint8"))
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
