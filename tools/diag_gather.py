"""Microbenchmark: (H*W)-row gather cost vs table size / row width / dtype
on the live backend. Sponza's frame is ~880 ms of 8 tex_quad gathers
(2.18M x 28 f32, 245 MB) at 93-120 ms each, while the duck scene's 87k-row
(9.8 MB) table gathers at ~13 ms — this isolates whether the cliff is
table bytes (cache), row width, index coherence, or dtype.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    sumf = jax.jit(lambda x: jnp.sum(x))
    float(sumf(fn(*args)))  # compile
    best = 1e9
    for r in range(reps):
        # jitter one arg element so the tunnel can't memoize
        args = (args[0], args[1] + (r % 2))
        t0 = time.time()
        float(sumf(fn(*args)))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    npix = 1920 * 1088  # 2.09M
    rng = np.random.default_rng(0)

    gather = jax.jit(lambda t, i: t[i])

    print(f"pixels: {npix/1e6:.2f}M  (all times ms, best of 3)")
    for rows in (87_380, 436_900, 2_184_400):
        for width in (4, 16, 28, 32):
            tbl = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
            # coherent: pixel-order indices into a (level,y,x) layout —
            # approximate with sorted indices; random: shuffled
            idx_r = jnp.asarray(rng.integers(0, rows, npix), jnp.int32)
            idx_c = jnp.sort(idx_r)
            t_r = timed(gather, tbl, idx_r)
            t_c = timed(gather, tbl, idx_c)
            mb = rows * width * 4 / 1e6
            print(f"  rows={rows:8d} w={width:2d} ({mb:7.1f} MB): "
                  f"random {t_r:7.1f}  coherent {t_c:7.1f}")
        sys.stdout.flush()

    # dtype: bf16 halves the bytes
    rows = 2_184_400
    tbl16 = jnp.asarray(rng.standard_normal((rows, 28)), jnp.bfloat16)
    idx_r = jnp.asarray(rng.integers(0, rows, npix), jnp.int32)
    g16 = jax.jit(lambda t, i: t[i].astype(jnp.float32))
    print(f"  rows={rows} w=28 bf16 ({rows*28*2/1e6:.1f} MB): "
          f"random {timed(g16, tbl16, idx_r):7.1f}")

    # flat 1-D gather of a (rows*w,) table, one f32 per pixel — the
    # latency floor for a single scattered read
    flat = jnp.asarray(rng.standard_normal(rows * 28), jnp.float32)
    gf = jax.jit(lambda t, i: t[i])
    print(f"  flat 1-D single-f32 gather from {rows*28*4/1e6:.0f} MB: "
          f"random {timed(gf, flat, idx_r):7.1f}")


if __name__ == "__main__":
    main()
