"""Regenerate golden renders for tests/test_golden.py.

Usage: python tools/make_goldens.py [--check]

Renders the canonical scenes on CPU (the same backend the tests use, so
goldens are bit-stable) and writes PNGs under tests/golden/. With --check,
compares instead of writing (same tolerance as the tests).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"),
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import test_golden as tg

    outdir = tg.GOLDEN_DIR
    os.makedirs(outdir, exist_ok=True)
    for name, render in tg.SCENES.items():
        img = render()
        path = os.path.join(outdir, f"{name}.png")
        if args.check:
            ref = tg.load_png(path)
            diff = np.abs(img.astype(np.float32) - ref.astype(np.float32))
            print(f"{name}: mean {diff.mean():.3f} max {diff.max():.0f}")
        else:
            tg.save_png(path, img)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
