"""Blockwise Pallas closest-hit: prim blocks on sublanes, rays on lanes.

Second-generation fused kernel (v1 in :mod:`pallas_hit` loops primitives
scalarly from SMEM and loses to the dense sweep). Here the VPU tile is used
in both dimensions: each inner iteration intersects a block of 8 primitives
(sublanes) against 128 rays (lanes) as one (8, 128) vector computation,
with primitive attributes living in VMEM as (P, k) arrays sliced to (8, 1)
blocks that broadcast across lanes. Kind segments are padded to multiples
of 8 by the scene compiler, so every block is kind-pure and the per-kind
math is selected statically.

Running reductions stay on-chip: entry = masked min + first-index tie-break
via an iota encode; exit = masked max within the winning group. Nothing
(R, P)-shaped touches HBM.

Shares the custom-VJP backward of :mod:`pallas_hit` (winner-only analytic
recompute).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .linalg import EPS
from .pallas_hit import _fetch_rows, _winner_t  # shared backward pieces

_BIG = 3.0e38
PRIM_BLOCK = 8
LANES = 128
RAY_TILE_ROWS = 1          # rays per grid step = RAY_TILE_ROWS * LANES
RAY_TILE = RAY_TILE_ROWS * LANES

KIND_SPHERE, KIND_PLANE, KIND_BOX, KIND_TRIANGLE = 0, 1, 2, 3


from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


from .pallas_hit import _seg_bounds  # shared segment-bounds helper


def _kernel(kind_counts, need_exit,
            fr, ipos, pa, pb, pc, pr, gid, valid,     # VMEM (P, k)
            ox, oy, oz, dx, dy, dz,                   # VMEM (1, 128) ray tiles
            te_o, tx_o, hit_o, ie_o, ix_o):           # VMEM (1, 128) outputs
    # ray refs are (1, 1, 128) blocks; drop the grid dim -> (1, 128)
    o = (ox[0], oy[0], oz[0])
    d = (dx[0], dy[0], dz[0])

    rid8 = jax.lax.broadcasted_iota(jnp.int32, (PRIM_BLOCK, LANES), 0)

    def block_t(kind, b):
        """(t0, t1, ok, prim_ids) of prim block b vs the ray tile, (8,128)."""
        s = lambda ref, k: ref[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), k:k + 1]
        m = [s(fr, k) for k in range(9)]                     # (8,1) each
        ipx, ipy, ipz = s(ipos, 0), s(ipos, 1), s(ipos, 2)
        rx, ry, rz = o[0] - ipx, o[1] - ipy, o[2] - ipz      # (8,128)
        opx = m[0] * rx + m[1] * ry + m[2] * rz + ipx
        opy = m[3] * rx + m[4] * ry + m[5] * rz + ipy
        opz = m[6] * rx + m[7] * ry + m[8] * rz + ipz
        dpx = m[0] * d[0] + m[1] * d[1] + m[2] * d[2]
        dpy = m[3] * d[0] + m[4] * d[1] + m[5] * d[2]
        dpz = m[6] * d[0] + m[7] * d[1] + m[8] * d[2]

        if kind == KIND_SPHERE:
            r_ = s(pr, 0)
            ox_, oy_, oz_ = opx - ipx, opy - ipy, opz - ipz
            a = dpx * dpx + dpy * dpy + dpz * dpz
            bq = 2.0 * (ox_ * dpx + oy_ * dpy + oz_ * dpz)
            c = ox_ * ox_ + oy_ * oy_ + oz_ * oz_ - r_ * r_
            disc = bq * bq - 4.0 * a * c
            sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
            a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
            t0 = (-bq - sq) / a2
            t1 = (-bq + sq) / a2
            ok = (disc >= 0.0) & (t0 >= 0.0)
        elif kind == KIND_PLANE:
            nx, ny, nz = s(pa, 0), s(pa, 1), s(pa, 2)
            inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
            nx, ny, nz = nx * inv, ny * inv, nz * inv
            dd = -(nx * ipx + ny * ipy + nz * ipz)
            dn = dpx * nx + dpy * ny + dpz * nz
            t0 = -(opx * nx + opy * ny + opz * nz + dd) / jnp.where(
                dn == 0.0, 1.0, dn)
            t1 = t0
            ok = (t0 > 0.0) & (dn != 0.0)
        elif kind == KIND_BOX:
            lo = hi = None
            for dp_c, op_c, ip_c, s_c in (
                    (dpx, opx, ipx, s(pa, 0)),
                    (dpy, opy, ipy, s(pa, 1)),
                    (dpz, opz, ipz, s(pa, 2))):
                mm = 1.0 / jnp.where(dp_c == 0.0, 1.0, dp_c)
                mm = jnp.where(dp_c == 0.0, 1.0 / EPS, mm)
                nn = (op_c - ip_c) * mm
                kk = 0.5 * s_c * jnp.abs(mm)
                lo_c, hi_c = -nn - kk, -nn + kk
                lo = lo_c if lo is None else jnp.maximum(lo, lo_c)
                hi = hi_c if hi is None else jnp.minimum(hi, hi_c)
            t0, t1 = lo, hi
            ok = ~((t0 > t1) | (t1 < 0.0))
        else:  # KIND_TRIANGLE
            ax, ay, az = s(pa, 0), s(pa, 1), s(pa, 2)
            e0x, e0y, e0z = s(pb, 0) - ax, s(pb, 1) - ay, s(pb, 2) - az
            e1x, e1y, e1z = s(pc, 0) - ax, s(pc, 1) - ay, s(pc, 2) - az
            pvx = dpy * e1z - dpz * e1y
            pvy = dpz * e1x - dpx * e1z
            pvz = dpx * e1y - dpy * e1x
            det = e0x * pvx + e0y * pvy + e0z * pvz
            ok = jnp.abs(det) >= EPS
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tvx = opx - (ax + ipx)
            tvy = opy - (ay + ipy)
            tvz = opz - (az + ipz)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            ok &= (u >= 0.0) & (u <= 1.0)
            qvx = tvy * e0z - tvz * e0y
            qvy = tvz * e0x - tvx * e0z
            qvz = tvx * e0y - tvy * e0x
            v = (dpx * qvx + dpy * qvy + dpz * qvz) * inv
            ok &= (v >= 0.0) & (u + v <= 1.0)
            t0 = (e1x * qvx + e1y * qvy + e1z * qvz) * inv
            ok &= t0 >= 0.0
            t1 = t0
        ok &= s(valid, 0) != 0
        ok &= jnp.isfinite(t0) & jnp.isfinite(t1)
        ids = rid8 + b * PRIM_BLOCK
        return t0, t1, ok, ids

    shape = (1, LANES)
    t_best = jnp.full(shape, _BIG, jnp.float32)
    i_best = jnp.zeros(shape, jnp.int32)
    g_best = jnp.full(shape, jnp.int32(-2))

    for kind, (start, count) in enumerate(_seg_bounds(kind_counts)):
        if count == 0:
            continue
        b0, b1 = start // PRIM_BLOCK, (start + count) // PRIM_BLOCK

        def body(b, carry, kind=kind):
            t_best, i_best, g_best = carry
            t0, _, ok, ids = block_t(kind, b)
            tm = jnp.where(ok, t0, _BIG)                     # (8,128)
            bm = jnp.min(tm, axis=0, keepdims=True)          # (1,128)
            cand_i = jnp.min(jnp.where(tm == bm, ids, jnp.int32(2**30)),
                             axis=0, keepdims=True)
            gids = gid[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), 0:1] + 0 * ids
            # the group must come from the SAME row as cand_i: on an exact
            # entry-t tie an independent min-over-ties could pair the winner
            # with another tied prim's group
            cand_g = jnp.min(jnp.where(ids == cand_i, gids, jnp.int32(2**30)),
                             axis=0, keepdims=True)
            upd = bm < t_best
            t_best = jnp.where(upd, bm, t_best)
            i_best = jnp.where(upd, cand_i, i_best)
            g_best = jnp.where(upd, cand_g, g_best)
            return t_best, i_best, g_best

        t_best, i_best, g_best = jax.lax.fori_loop(
            b0, b1, body, (t_best, i_best, g_best))

    if not need_exit:
        # only refraction consumes the exit hit; opaque scenes compile
        # without the whole second sweep
        t_exit, i_exit = t_best, i_best
    else:
        t_exit = jnp.full(shape, -_BIG, jnp.float32)
        i_exit = jnp.zeros(shape, jnp.int32)
        for kind, (start, count) in enumerate(_seg_bounds(kind_counts)):
            if count == 0:
                continue
            b0, b1 = start // PRIM_BLOCK, (start + count) // PRIM_BLOCK

            def body2(b, carry, kind=kind):
                t_exit, i_exit = carry
                _, t1, ok, ids = block_t(kind, b)
                gids = gid[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), 0:1] + 0 * ids
                okg = ok & (gids == g_best)
                tm = jnp.where(okg, t1, -_BIG)
                bm = jnp.max(tm, axis=0, keepdims=True)
                cand_i = jnp.min(jnp.where(tm == bm, ids, jnp.int32(2**30)),
                                 axis=0, keepdims=True)
                upd = bm > t_exit
                t_exit = jnp.where(upd, bm, t_exit)
                i_exit = jnp.where(upd, cand_i, i_exit)
                return t_exit, i_exit

            t_exit, i_exit = jax.lax.fori_loop(b0, b1, body2,
                                               (t_exit, i_exit))

    te_o[0] = t_best
    tx_o[0] = t_exit
    hit_o[0] = (g_best != -2).astype(jnp.int32)
    ie_o[0] = jnp.where(i_best == 2**30, 0, i_best)
    ix_o[0] = jnp.where(i_exit == 2**30, 0, i_exit)


def _run_kernel(kind_counts, need_exit, fr, ipos, pa, pb, pc, pr, gid,
                valid, orig, dirs, interpret=False):
    R = orig.shape[0]
    assert R % RAY_TILE == 0, R
    grid = R // RAY_TILE
    # (grid, 1, 128) with a (1, 1, 128) block: the trailing two dims are
    # (1, 128) where 1 equals the full array dim — satisfies the TPU block
    # divisibility rule while keeping a 128-ray lane tile per step.
    comps = [c.reshape(-1, 1, LANES) for c in
             (orig[:, 0], orig[:, 1], orig[:, 2],
              dirs[:, 0], dirs[:, 1], dirs[:, 2])]

    ray_spec = pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((grid, 1, LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid, 1, LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid, 1, LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid, 1, LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid, 1, LANES), jnp.int32),
    ]
    out_specs = [pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(5)]

    te, tx, hit, ie, ix = pl.pallas_call(
        partial(_kernel, tuple(kind_counts), need_exit),
        grid=(grid,),
        in_specs=[full()] * 8 + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(fr.reshape(-1, 9), ipos, pa, pb, pc, pr[:, None],
      gid[:, None], valid.astype(jnp.int32)[:, None], *comps)
    return (te.reshape(R), tx.reshape(R), hit.reshape(R) != 0,
            ie.reshape(R), ix.reshape(R))


def available() -> bool:
    return (os.environ.get("MRT_PALLAS2", "0") == "1"
            and jax.default_backend() not in ("cpu",))


def closest_hit_fast(scene, frames, orig, dirs, interpret=False,
                     need_exit=True):
    """Blockwise-Pallas drop-in for ``intersect.closest_hit``."""
    from . import intersect as _intersect

    from . import intersect as _intersect_mod

    kind_counts = tuple(scene.kind_counts)
    gid, valid = scene.group_id, scene.prim_valid
    kind_arr = _intersect_mod._kind_array(scene)

    @jax.custom_vjp
    def core(fr, ipos, pa, pb, pc, pr, o, d):
        return _run_kernel(kind_counts, need_exit, fr, ipos, pa, pb, pc, pr,
                           gid, valid, o, d, interpret=interpret)

    def fwd(fr, ipos, pa, pb, pc, pr, o, d):
        out = core(fr, ipos, pa, pb, pc, pr, o, d)
        _, _, hit, ie, ix = out
        return out, (fr, ipos, pa, pb, pc, pr, o, d, hit, ie, ix)

    def bwd(res, ct):
        fr, ipos, pa, pb, pc, pr, o, d, hit, ie, ix = res
        d_te, d_tx, _, _, _ = ct
        P = fr.shape[0]
        grads = (jnp.zeros_like(fr), jnp.zeros_like(ipos), jnp.zeros_like(pa),
                 jnp.zeros_like(pb), jnp.zeros_like(pc), jnp.zeros_like(pr),
                 jnp.zeros_like(o), jnp.zeros_like(d))

        def accum(idx, d_t, which, grads):
            d_t = jnp.where(hit, d_t, 0.0)
            kind_oh = jax.nn.one_hot(kind_arr[idx], 4, dtype=fr.dtype)

            def t_of(fr_r, ipos_r, pa_r, pb_r, pc_r, pr_r, o_, d_):
                t0, t1 = _winner_t(kind_oh, fr_r, ipos_r, pa_r, pb_r, pc_r,
                                   pr_r, o_, d_)
                return t0 if which == 0 else t1

            rows = _fetch_rows(idx, P, fr, ipos, pa, pb, pc, pr)
            _, vjp = jax.vjp(t_of, *rows, o, d)
            g = vjp(d_t)
            out = []
            for i, (gz, gi) in enumerate(zip(grads, g)):
                if i < 6:
                    gi = jnp.zeros_like(gz).at[idx].add(
                        gi.reshape((gi.shape[0],) + gz.shape[1:]))
                out.append(gz + gi)
            return tuple(out)

        grads = accum(ie, d_te, 0, grads)
        grads = accum(ix, d_tx, 1, grads)
        return grads

    core.defvjp(fwd, bwd)

    R = orig.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        orig = jnp.concatenate([orig, jnp.ones((pad, 3), orig.dtype)], 0)
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)], 0)
    te, tx, hit, ie, ix = core(
        frames, scene.inst_pos, scene.prim_a, scene.prim_b,
        scene.prim_c, scene.prim_r, orig, dirs)
    if pad:
        te, tx, hit, ie, ix = (v[:R] for v in (te, tx, hit, ie, ix))
    return _intersect.HitInfo(hit=hit, t_entry=te, t_exit=tx,
                              idx_entry=ie, idx_exit=ix)
