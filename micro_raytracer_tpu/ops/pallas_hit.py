"""Fused closest-hit as a Pallas TPU kernel.

The jnp path (``intersect.closest_hit``) materializes (R, P)-shaped
intermediates in HBM (object-space rays, per-prim t/valid matrices) before
reducing; profiling shows the step is bound by that traffic. This kernel
streams a ray tile through VMEM once, loops the (small) primitive table from
SMEM, and keeps the running entry-min / group-exit-max entirely on-chip —
inputs R*6 floats, outputs R*5, nothing (R, P)-shaped ever touches HBM.

Differentiation: ``closest_hit_fast`` carries a custom VJP. The forward runs
the kernel; the backward recomputes ONLY the winning primitive's ``t``
analytically per ray (R-sized, not R*P) with the same guarded math as the
dense path, pulls gradients through ``jax.vjp``, and scatter-adds the
per-ray geometry cotangents into the (P,)-row scene leaves. Index outputs
are integer (no gradient), matching the dense path where argmin/argmax are
non-differentiable choices.

Structure per tile (TILE = 8*128 rays):
  pass 1  per kind segment (static Python loop), ``fori_loop`` over prims:
          object-space transform -> kind-specialized (t0, t1, ok) ->
          running (t_best, idx_best, group_best)
  pass 2  same sweep; among ``ok & (group == group_best)`` take max t1.

Opt-in via ``MRT_PALLAS=1`` on TPU (see :func:`available` for the measured
reasons); every other backend falls back to the dense jnp path.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from . import linalg
from .linalg import EPS

_BIG = 3.0e38
TILE_ROWS = 8
LANES = 128
TILE = TILE_ROWS * LANES

KIND_SPHERE, KIND_PLANE, KIND_BOX, KIND_TRIANGLE = 0, 1, 2, 3


def _seg_bounds(kind_counts):
    out, start = [], 0
    for c in kind_counts:
        out.append((start, c))
        start += c
    return out


# ---------------------------------------------------------------- kernel --

def _hit_kernel(kind_counts, need_exit,
                fr, ipos, pa, pb, pc, pr, gid, valid,      # SMEM (P, ...)
                ox, oy, oz, dx, dy, dz,                    # VMEM (8,128)
                te_o, tx_o, hit_o, ie_o, ix_o):            # VMEM outputs
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    def obj_space(p):
        """World->object transform of the ray by prim p's instance frame."""
        ipx, ipy, ipz = ipos[p, 0], ipos[p, 1], ipos[p, 2]
        m = [fr[p, k] for k in range(9)]
        rx, ry, rz = o[0] - ipx, o[1] - ipy, o[2] - ipz
        opx = m[0] * rx + m[1] * ry + m[2] * rz + ipx
        opy = m[3] * rx + m[4] * ry + m[5] * rz + ipy
        opz = m[6] * rx + m[7] * ry + m[8] * rz + ipz
        dpx = m[0] * d[0] + m[1] * d[1] + m[2] * d[2]
        dpy = m[3] * d[0] + m[4] * d[1] + m[5] * d[2]
        dpz = m[6] * d[0] + m[7] * d[1] + m[8] * d[2]
        return (opx, opy, opz), (dpx, dpy, dpz), (ipx, ipy, ipz)

    def prim_t(kind, p):
        """(t0, t1, ok) of prim p against the tile; same guarded math as
        intersect.intersect_all."""
        (opx, opy, opz), (dpx, dpy, dpz), (ipx, ipy, ipz) = obj_space(p)
        if kind == KIND_SPHERE:
            ox_, oy_, oz_ = opx - ipx, opy - ipy, opz - ipz
            a = dpx * dpx + dpy * dpy + dpz * dpz
            b = 2.0 * (ox_ * dpx + oy_ * dpy + oz_ * dpz)
            c = ox_ * ox_ + oy_ * oy_ + oz_ * oz_ - pr[p, 0] * pr[p, 0]
            disc = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
            a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
            t0 = (-b - sq) / a2
            t1 = (-b + sq) / a2
            ok = (disc >= 0.0) & (t0 >= 0.0)
        elif kind == KIND_PLANE:
            nx, ny, nz = pa[p, 0], pa[p, 1], pa[p, 2]
            inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
            nx, ny, nz = nx * inv, ny * inv, nz * inv
            dd = -(nx * ipx + ny * ipy + nz * ipz)
            dn = dpx * nx + dpy * ny + dpz * nz
            t0 = -(opx * nx + opy * ny + opz * nz + dd) / jnp.where(
                dn == 0.0, 1.0, dn)
            t1 = t0
            ok = (t0 > 0.0) & (dn != 0.0)
        elif kind == KIND_BOX:
            t0 = None
            t1 = None
            lo = hi = None
            for dp_c, op_c, ip_c, s_c in (
                    (dpx, opx, ipx, pa[p, 0]),
                    (dpy, opy, ipy, pa[p, 1]),
                    (dpz, opz, ipz, pa[p, 2])):
                m = 1.0 / jnp.where(dp_c == 0.0, 1.0, dp_c)
                m = jnp.where(dp_c == 0.0, 1.0 / EPS, m)
                n = (op_c - ip_c) * m
                k = 0.5 * s_c * jnp.abs(m)
                lo_c, hi_c = -n - k, -n + k
                lo = lo_c if lo is None else jnp.maximum(lo, lo_c)
                hi = hi_c if hi is None else jnp.minimum(hi, hi_c)
            t0, t1 = lo, hi
            ok = ~((t0 > t1) | (t1 < 0.0))
        else:  # KIND_TRIANGLE
            v0x, v0y, v0z = pa[p, 0] + ipx, pa[p, 1] + ipy, pa[p, 2] + ipz
            e0x, e0y, e0z = pb[p, 0] - pa[p, 0], pb[p, 1] - pa[p, 1], pb[p, 2] - pa[p, 2]
            e1x, e1y, e1z = pc[p, 0] - pa[p, 0], pc[p, 1] - pa[p, 1], pc[p, 2] - pa[p, 2]
            pvx = dpy * e1z - dpz * e1y
            pvy = dpz * e1x - dpx * e1z
            pvz = dpx * e1y - dpy * e1x
            det = e0x * pvx + e0y * pvy + e0z * pvz
            ok = jnp.abs(det) >= EPS
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = opx - v0x, opy - v0y, opz - v0z
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
        ok &= valid[p, 0] != 0
        ok &= jnp.isfinite(t0) & jnp.isfinite(t1)
        return t0, t1, ok

    shape = o[0].shape
    t_best = jnp.full(shape, _BIG, jnp.float32)
    i_best = jnp.zeros(shape, jnp.int32)
    g_best = jnp.full(shape, jnp.int32(-2))

    for kind, (start, count) in enumerate(_seg_bounds(kind_counts)):
        if count == 0:
            continue

        def body(p, carry, kind=kind):
            t_best, i_best, g_best = carry
            t0, _, ok = prim_t(kind, p)
            upd = ok & (t0 < t_best)
            t_best = jnp.where(upd, t0, t_best)
            i_best = jnp.where(upd, p, i_best)
            g_best = jnp.where(upd, gid[p, 0], g_best)
            return t_best, i_best, g_best

        t_best, i_best, g_best = jax.lax.fori_loop(
            start, start + count, body, (t_best, i_best, g_best))

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

            def body2(p, carry, kind=kind):
                t_exit, i_exit = carry
                _, t1, ok = prim_t(kind, p)
                upd = ok & (gid[p, 0] == g_best) & (t1 > t_exit)
                t_exit = jnp.where(upd, t1, t_exit)
                i_exit = jnp.where(upd, p, i_exit)
                return t_exit, i_exit

            t_exit, i_exit = jax.lax.fori_loop(
                start, start + count, body2, (t_exit, i_exit))

    te_o[:] = t_best
    tx_o[:] = t_exit
    hit_o[:] = (g_best != -2).astype(jnp.int32)
    ie_o[:] = i_best
    ix_o[:] = i_exit


def _run_kernel(kind_counts, need_exit, fr, ipos, pa, pb, pc, pr, gid,
                valid, orig, dirs, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = orig.shape[0]
    assert R % TILE == 0, R
    grid = R // TILE
    comps = [c.reshape(-1, LANES) for c in
             (orig[:, 0], orig[:, 1], orig[:, 2],
              dirs[:, 0], dirs[:, 1], dirs[:, 2])]

    ray_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((R // LANES, LANES), jnp.float32),  # te
        jax.ShapeDtypeStruct((R // LANES, LANES), jnp.float32),  # tx
        jax.ShapeDtypeStruct((R // LANES, LANES), jnp.int32),    # hit
        jax.ShapeDtypeStruct((R // LANES, LANES), jnp.int32),    # ie
        jax.ShapeDtypeStruct((R // LANES, LANES), jnp.int32),    # ix
    ]
    out_specs = [pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for _ in range(5)]

    te, tx, hit, ie, ix = pl.pallas_call(
        partial(_hit_kernel, tuple(kind_counts), need_exit),
        grid=(grid,),
        in_specs=[smem()] * 8 + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(fr.reshape(-1, 9), ipos, pa, pb, pc, pr[:, None],
      gid[:, None], valid.astype(jnp.int32)[:, None], *comps)
    return (te.reshape(R), tx.reshape(R), hit.reshape(R) != 0,
            ie.reshape(R), ix.reshape(R))


# ------------------------------------------------------- differentiable --

def _winner_t(kind_oh, fr_r, ipos_r, pa_r, pb_r, pc_r, pr_r, orig, dirs):
    """Differentiable per-ray (t0, t1) of the fetched winner primitive.

    Same guarded formulas as the kernel/dense path, evaluated for all four
    kinds and selected by the winner's kind one-hot (R-sized work).
    """
    op = ipos_r + linalg.matvec(fr_r, orig - ipos_r)
    dp = linalg.matvec(fr_r, dirs)

    # sphere
    oo = op - ipos_r
    a = linalg.dot(dp, dp)
    b = 2.0 * linalg.dot(oo, dp)
    c = linalg.dot(oo, oo) - pr_r ** 2
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
    a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
    t0_sph, t1_sph = (-b - sq) / a2, (-b + sq) / a2

    # plane
    n = linalg.safe_normalize(pa_r)
    dd = -linalg.dot(n, ipos_r)
    dn = linalg.dot(dp, n)
    t_pln = -(linalg.dot(op, n) + dd) / jnp.where(dn == 0.0, 1.0, dn)

    # box
    m = 1.0 / jnp.where(dp == 0.0, 1.0, dp)
    m = jnp.where(dp == 0.0, 1.0 / EPS, m)
    nn = (op - ipos_r) * m
    kk = 0.5 * pa_r * jnp.abs(m)
    t0_box = jnp.max(-nn - kk, axis=-1)
    t1_box = jnp.min(-nn + kk, axis=-1)

    # triangle
    e0 = pb_r - pa_r
    e1 = pc_r - pa_r
    pv = linalg.cross(dp, e1)
    det = linalg.dot(e0, pv)
    inv = 1.0 / jnp.where(jnp.abs(det) >= EPS, det, 1.0)
    tv = op - (pa_r + ipos_r)
    qv = linalg.cross(tv, e0)
    t_tri = linalg.dot(e1, qv) * inv

    t0 = (kind_oh[:, 0] * t0_sph + kind_oh[:, 1] * t_pln
          + kind_oh[:, 2] * t0_box + kind_oh[:, 3] * t_tri)
    t1 = (kind_oh[:, 0] * t1_sph + kind_oh[:, 1] * t_pln
          + kind_oh[:, 2] * t1_box + kind_oh[:, 3] * t_tri)
    return t0, t1


def _fetch_rows(idx, P, fr, ipos, pa, pb, pc, pr):
    onehot = jax.nn.one_hot(idx, P, dtype=fr.dtype)          # (R,P)
    # highest precision: bf16 matmul truncation would corrupt the winner
    # geometry used for the analytic backward recompute
    f = lambda m: jax.lax.dot(onehot, m.reshape(P, -1),
                              precision=jax.lax.Precision.HIGHEST)
    return (f(fr).reshape(-1, 3, 3), f(ipos), f(pa), f(pb), f(pc),
            f(pr[:, None])[:, 0])


def closest_hit_fast(scene, frames, orig, dirs, interpret=False,
                     need_exit=True):
    """Pallas-backed drop-in for ``intersect.closest_hit``.

    Pads the ray batch to a TILE multiple; returns the same HitInfo fields.
    The custom-VJP pair closes over the scene's integer metadata (group ids,
    validity, kind segmentation), which carries no gradient.
    """
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
            d_t = jnp.where(hit, d_t, 0.0)  # misses carry no t gradient
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
                if i < 6:   # per-prim rows -> scatter-add into the table
                    gi = jnp.zeros_like(gz).at[idx].add(
                        gi.reshape((gi.shape[0],) + gz.shape[1:]))
                out.append(gz + gi)
            return tuple(out)

        grads = accum(ie, d_te, 0, grads)
        grads = accum(ix, d_tx, 1, grads)
        return grads

    core.defvjp(fwd, bwd)

    R = orig.shape[0]
    pad = (-R) % TILE
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


def available() -> bool:
    """Opt-in: measured on TPU v5e the dense sweep wins at small P
    (CornellBox P=16: 21M vs 17M rays/s fwd) and the SMEM prim table
    overflows at P~1000 (Mesh.json fails to compile), leaving a narrow
    beneficial regime. Enable explicitly with MRT_PALLAS=1 while the
    vectorized-prim-block variant is developed.
    """
    return (os.environ.get("MRT_PALLAS") == "1"
            and jax.default_backend() not in ("cpu",))
