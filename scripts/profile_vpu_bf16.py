#!/usr/bin/env python
"""Does the v5e VPU run bf16 elementwise math at 2x f32 rate in Mosaic?

The fast16 blend is VPU-cell-bound ([P, chunk] exp/select/mul chains, see
ROADMAP): if Mosaic packs bf16 lanes, casting the cell math to bf16 would
buy ~2x on those stages at fast-mode precision. This kernel isolates the
question: N repetitions of a representative cell chain (mul, exp, compare,
select) over a [256, 256] block, in f32 vs bf16, timed via an on-device
scan.
"""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("devices:", jax.devices())
    P, C = 256, 256
    REPS = 64          # cell-chain repetitions per kernel
    K = 8              # scan length

    def kernel(x_ref, o_ref, *, dtype):
        # Compares run in f32 regardless of dtype: v5e's VPU has no bf16
        # compare (Mosaic: "Target does not support this comparison",
        # measured r4) — this matches the production cellbf16 kernel,
        # which also keeps its validity compares on f32 operands.
        x = x_ref[...].astype(dtype)
        acc = jnp.zeros_like(x)
        half = jnp.asarray(0.5, dtype)
        lim = jnp.float32(0.999)
        for _ in range(REPS):
            a = x * half
            e = jnp.exp(-a * a)
            m = ((e.astype(jnp.float32) <= lim)
                 & (a.astype(jnp.float32) >= -lim))
            acc = acc + jnp.where(m, e, half)
            x = x + e * jnp.asarray(1e-3, dtype)
        o_ref[...] = acc.astype(jnp.float32)

    def run(name, dtype):
        f = pl.pallas_call(
            functools.partial(kernel, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        )

        @jax.jit
        def scanned(x):
            def body(c, i):
                return c + jnp.sum(f(x + i)), 0.0
            c, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c

        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (P, C)).astype(np.float32))
        t0 = time.time()
        _ = float(scanned(x))
        ct = time.time() - t0
        # large-batch version for steady-state: vmap over 512 blocks
        fb = jax.vmap(f)
        xb = jnp.asarray(np.random.default_rng(1).uniform(
            -1, 1, (512, P, C)).astype(np.float32))

        @jax.jit
        def scanned_b(xb):
            def body(c, i):
                return c + jnp.sum(fb(xb + i)), 0.0
            c, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c

        _ = float(scanned_b(xb))
        t0 = time.time()
        _ = float(scanned_b(xb))
        dt = (time.time() - t0) / K
        cells = 512 * P * C * REPS
        log(f"{name:8s} compile {ct:5.1f}s  {dt * 1000:7.2f} ms "
            f"= {cells / dt / 1e9:6.1f} Gcell-chains/s")

    run("f32", jnp.float32)
    run("bf16", jnp.bfloat16)


if __name__ == "__main__":
    main()
