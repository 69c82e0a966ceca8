#!/usr/bin/env python
"""Per-stage timing of the cascade binning pipeline on the real TPU.

Each stage is jitted separately and timed with a repeated host-fetch probe
(block_until_ready under-reports on this backend). Stage inputs are
materialized device arrays from the previous stage."""
import functools
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _ = np.asarray(jax_first(out))
    t0 = time.time()
    o = None
    for _i in range(reps):
        del o
        o = fn(*args)
    _ = np.asarray(jax_first(o))
    dt = (time.time() - t0) / reps * 1000
    log(f"{name:28s} {dt:8.2f} ms")
    return out


def jax_first(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0].ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.ops import projection, pallas_cascade as pc
    from langsplatv2_tpu.ops import pallas_blend
    sys.path.insert(0, "scripts")
    from bench_cascade import make_scene

    log("devices:", jax.devices())
    n, h, w = 1_000_000, 1080, 1920
    sc = make_scene(n, h, w, seed=0)
    gx, gy = -(-w // 16), -(-h // 16)
    nb, ns = -(-gy // 8), -(-gx // 8)
    budget = 5_300_000
    b_al = -(-budget // 256) * 256
    log(f"grid {gx}x{gy} nb={nb} ns={ns}")

    @jax.jit
    def prep():
        proj = projection.preprocess(
            sc["means"], sc["scales"], sc["rots"], None, None, sc["cols"],
            sc["view"], sc["proj"], jnp.zeros(3),
            math.tan(sc["fovx"] / 2), math.tan(sc["fovy"] / 2), w, h, 0, 1.0,
            opacities=sc["ops"][:, 0])
        geom_rows, feat_rows = pc.pack_cascade_rows(
            proj, sc["ops"][:, 0], sc["qw"], sc["qi"])
        return geom_rows, feat_rows, proj.depth

    geom_rows, feat_rows, depth = timeit("preprocess+pack", prep)

    @jax.jit
    def prologue(geom_rows, feat_rows, depth):
        depth_bits = lax.bitcast_convert_type(depth, jnp.uint32) & jnp.uint32(0x7FFFFFFF)
        idx = jnp.arange(n, dtype=jnp.uint32)
        _, order = lax.sort((depth_bits, idx), num_keys=1, is_stable=True)
        order = order.astype(jnp.int32)
        geom_o = geom_rows[order]
        feat_o = feat_rows[order]
        n_pad = -(-n // 256) * 256
        rows_fm = jnp.concatenate([
            jnp.pad(geom_o, ((0, n_pad - n), (0, 0))).T,
            jnp.pad(feat_o, ((0, n_pad - n), (0, 0))).T,
        ], axis=0)
        pxy = feat_rows[:, 12]
        y0 = jnp.floor(pxy * (1.0 / 512.0))
        pwh = feat_rows[:, 13]
        rh = jnp.floor(pwh * (1.0 / 512.0))
        alive = (pwh - rh * 512.0 > 0) & (rh > 0)
        band = jnp.arange(nb, dtype=jnp.float32)[None, :] * 8
        overlap = (y0[:, None] < band + 8) & ((y0 + rh)[:, None] > band)
        l1_counts = jnp.sum(overlap & alive[:, None], axis=0).astype(jnp.int32)
        return rows_fm, l1_counts

    rows_fm, l1_counts = timeit("sort+gather+counts", prologue,
                                geom_rows, feat_rows, depth)

    zi = lambda k: jnp.zeros((k,), jnp.int32)
    oi = lambda k: jnp.ones((k,), jnp.int32)

    def coords(level):
        if level == 2:
            return zi(nb), jnp.arange(nb, dtype=jnp.int32) * 8
        if level == 3:
            b = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), ns)
            s = jnp.tile(jnp.arange(ns, dtype=jnp.int32), nb)
            return s * 8, b * 8
        b = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), ns * 8)
        s = jnp.tile(jnp.repeat(jnp.arange(ns, dtype=jnp.int32), 8), nb)
        ty = jnp.tile(jnp.arange(8, dtype=jnp.int32), nb * ns)
        return s * 8, b * 8 + ty

    run = functools.partial(pc._run_level, interpret=False)
    jbases = jax.jit(pc._bases, static_argnums=(1, 2))

    base1, cnt1, en1, tot1 = jbases(l1_counts, 256, b_al)
    l1 = functools.partial(run, fan_out=nb, group=1, axis="y", span=8,
                           cull=False, count_only=False, out_pad=b_al)
    out1 = timeit("L1 write (->bands)", jax.jit(l1), rows_fm, zi(1),
                  jnp.asarray([n], jnp.int32), zi(1), zi(1), base1, en1)

    bx2, by2 = coords(2)
    l2c = functools.partial(run, fan_out=ns, group=1, axis="x", span=8,
                            cull=False, count_only=True, out_pad=0)
    cnt2_raw = timeit("L2 count", jax.jit(l2c), out1, base1, cnt1, bx2, by2,
                      zi(nb * ns), oi(nb * ns))
    base2, cnt2, en2, tot2 = jbases(cnt2_raw, 256, b_al)
    l2 = functools.partial(run, fan_out=ns, group=1, axis="x", span=8,
                           cull=False, count_only=False, out_pad=b_al)
    out2 = timeit("L2 write (->supertiles)", jax.jit(l2), out1, base1, cnt1,
                  bx2, by2, base2, en2)
    log(f"  L1 total {int(jnp.sum(cnt1))}  L2 total {int(tot2)}")

    bx3, by3 = coords(3)
    l3c = functools.partial(run, fan_out=8, group=1, axis="y", span=1,
                            cull=False, count_only=True, out_pad=0)
    cnt3_raw = timeit("L3 count", jax.jit(l3c), out2, base2, cnt2, bx3, by3,
                      zi(nb * ns * 8), oi(nb * ns * 8))
    base3, cnt3, en3, tot3 = jbases(cnt3_raw, 256, b_al)
    l3 = functools.partial(run, fan_out=8, group=1, axis="y", span=1,
                           cull=False, count_only=False, out_pad=b_al)
    out3 = timeit("L3 write (->tile rows)", jax.jit(l3), out2, base2, cnt2,
                  bx3, by3, base3, en3)
    log(f"  L3 total {int(tot3)}")

    bx4, by4 = coords(4)
    n4 = nb * ns * 64
    l4c = functools.partial(run, fan_out=8, group=8, axis="x", span=1,
                            cull=True, count_only=True, out_pad=0)
    cnt4_raw = timeit("L4 count (+cull)", jax.jit(l4c), out3, base3, cnt3,
                      bx4, by4, zi(n4), oi(n4))
    base4, cnt4, en4, tot4 = jbases(cnt4_raw, 128, budget)
    l4 = functools.partial(run, fan_out=8, group=8, axis="x", span=1,
                           cull=True, count_only=False,
                           out_pad=budget + 256 + 128)
    out4 = timeit("L4 write (->tiles)", jax.jit(l4), out3, base3, cnt3,
                  bx4, by4, base4, en4)
    log(f"  L4 total {int(tot4)}")

    perm = jnp.asarray(pc._tile_permutation(gx, gy, nb, ns))
    tile_start = base4[perm]
    tile_count = cnt4[perm]
    tile_ids = jnp.arange(gx * gy, dtype=jnp.int32)
    dummy_feat = jnp.zeros((1, 1), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    blend = jax.jit(functools.partial(
        pallas_blend.blend_tiles_pallas, grid_x=gx, grid_y=gy, mode="quick",
        out_channels=192, topk=12, chunk=256, combined=True))
    timeit("blend (quick 192ch)", blend, out4, dummy_feat, tile_start,
           tile_count, tile_ids, bg)


if __name__ == "__main__":
    main()
