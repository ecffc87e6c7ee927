"""All-kind fused Pallas closest-hit (fourth-generation kernel).

:mod:`pallas_tri` moved the triangle segment into VMEM; the profile then
showed the remaining forward time spread across ~40 small HBM-bound XLA
fusions — the sphere/plane/box sweeps, their argmin/argmax/any reductions,
and the glue between them, each materializing (R, Pk)-scale buffers. This
kernel computes the ENTIRE closest-hit query (rt.rs:867-898) in one
pallas_call: every kind segment is swept in VMEM (object-space math for
sphere/plane/box per rt.rs:299-412, the composed Woop transform for
triangles), the entry winner and its group are reduced inline, and the
group-exit (rt.rs:740-772) is reduced from a stashed exit-t scratch in a
second cheap pass. One (t_entry, row, t_exit, xrow) quadruple per ray
crosses HBM.

Layout: rays on lanes, primitives on sublanes (dense (1, R) outputs; see
pallas_tri for why the other orientation loses 100x). Non-triangle
segments are small (the compiler pads them to 8-row multiples) and are
processed as single whole-segment blocks at their static offsets; the
triangle segment loops in PRIM_BLOCK chunks.

Differentiation: custom_vjp recomputes the winner's entry/exit t
analytically per kind — quadratic root for spheres, plane equation,
active-slab for boxes, the Woop plane form for triangles — selecting the
formula by the winner row's static segment bounds, with row attributes
fetched by one-hot MXU matmuls. This reproduces exactly the gradient the
dense masked-min/max would produce (only the winning row's t carries
cotangent) without saving any (R, P) residuals.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..models import schema
from .linalg import EPS
from . import pallas_tri
from .pallas_tri import (_BIG, _BIGI, PRIM_BLOCK, RAY_TILE, _interpret,
                         _pad_p, _RAY_SPEC, _OUT_SPEC, _out_shapes)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    env = os.environ.get("MRT_HIT3", "")
    if env == "0" or not _PALLAS:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# scratch is (P_pad, RAY_TILE) f32
_MAX_SCRATCH_ROWS = 4096


def enabled_for(scene) -> bool:
    return (available() and scene.n_prims > 0
            and _padded_rows(scene.kind_counts) <= _MAX_SCRATCH_ROWS)


def _padded_rows(kind_counts) -> int:
    n = sum(kind_counts[:3])
    n_tri = kind_counts[schema.KIND_TRIANGLE]
    return n + n_tri + ((-n_tri) % PRIM_BLOCK if n_tri else 0)


def _seg_layout(kind_counts):
    """Static (kind, start, count) of non-tri segments + tri bounds."""
    segs = []
    start = 0
    for kind in (schema.KIND_SPHERE, schema.KIND_PLANE, schema.KIND_BOX):
        c = kind_counts[kind]
        if c:
            segs.append((kind, start, c))
        start += c
    return tuple(segs), start, kind_counts[schema.KIND_TRIANGLE]


def _kind_block(kind, s, e, fr, ipos, pa, pr, valid, o, d):
    """(t0, t1, ok) of the [s:e) rows of a non-triangle segment, (e-s, RT).

    Object-space math identical to intersect.intersect_all's per-kind
    branches (and thus rt.rs:299-412), as VPU broadcast-FMAs: per-prim
    scalars are (Pk, 1) sublane columns, per-ray values (1, RT) lane rows.
    """
    f = [fr[s:e, k:k + 1] for k in range(9)]
    ix, iy, iz = (ipos[s:e, k:k + 1] for k in range(3))
    a0, a1, a2 = (pa[s:e, k:k + 1] for k in range(3))
    oc = [o[k:k + 1, :] for k in range(3)]
    dc = [d[k:k + 1, :] for k in range(3)]
    rx, ry, rz = oc[0] - ix, oc[1] - iy, oc[2] - iz
    opx = f[0] * rx + f[1] * ry + f[2] * rz + ix
    opy = f[3] * rx + f[4] * ry + f[5] * rz + iy
    opz = f[6] * rx + f[7] * ry + f[8] * rz + iz
    dpx = f[0] * dc[0] + f[1] * dc[1] + f[2] * dc[2]
    dpy = f[3] * dc[0] + f[4] * dc[1] + f[5] * dc[2]
    dpz = f[6] * dc[0] + f[7] * dc[1] + f[8] * dc[2]

    if kind == schema.KIND_SPHERE:
        r_ = pr[s:e, 0:1]
        ox_, oy_, oz_ = opx - ix, opy - iy, opz - iz
        a = dpx * dpx + dpy * dpy + dpz * dpz
        bq = 2.0 * (ox_ * dpx + oy_ * dpy + oz_ * dpz)
        c = ox_ * ox_ + oy_ * oy_ + oz_ * oz_ - r_ * r_
        disc = bq * bq - 4.0 * a * c
        sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
        a2_ = jnp.where(a == 0.0, 1.0, 2.0 * a)
        t0 = (-bq - sq) / a2_
        t1 = (-bq + sq) / a2_
        ok = (disc >= 0.0) & (t0 >= 0.0)
    elif kind == schema.KIND_PLANE:
        nn = a0 * a0 + a1 * a1 + a2 * a2
        inv = jax.lax.rsqrt(jnp.where(nn > 0.0, nn, 1.0))
        nx, ny, nz = a0 * inv, a1 * inv, a2 * inv
        dd = -(nx * ix + ny * iy + nz * iz)
        dn = dpx * nx + dpy * ny + dpz * nz
        t0 = -(opx * nx + opy * ny + opz * nz + dd) / jnp.where(
            dn == 0.0, 1.0, dn)
        t1 = t0
        ok = (t0 > 0.0) & (dn != 0.0)
    else:  # KIND_BOX
        lo = hi = None
        for dp_c, op_c, ip_c, s_c in ((dpx, opx, ix, a0), (dpy, opy, iy, a1),
                                      (dpz, opz, iz, a2)):
            mm = 1.0 / jnp.where(dp_c == 0.0, 1.0, dp_c)
            mm = jnp.where(dp_c == 0.0, 1.0 / EPS, mm)
            nn = (op_c - ip_c) * mm
            kk = 0.5 * s_c * jnp.abs(mm)
            lo_c, hi_c = -nn - kk, -nn + kk
            lo = lo_c if lo is None else jnp.maximum(lo, lo_c)
            hi = hi_c if hi is None else jnp.minimum(hi, hi_c)
        t0, t1 = lo, hi
        ok = ~((t0 > t1) | (t1 < 0.0))
    ok &= valid[s:e, 0:1] > 0.5
    ok &= jnp.isfinite(t0) & jnp.isfinite(t1)
    return t0, t1, ok


_NA_COL = 12  # attr table column of the object-space normal source rows


def sweep_closest(layout, need_exit, fr, ipos, pa, pr, valid, gid,
                  AT, HT, thr, o, d, tx_s, tbb=None, live=None,
                  occl=False, want_na=False, at_ref=None):
    """In-kernel closest-hit sweep over every kind segment.

    ``o``/``d`` are (3, RT) lane-major rows; returns (te, row, wg, tx, xrow)
    as (1, RT) values. Shared by the hit kernel and the bounce-step
    megakernel (pallas_step). ``tx_s`` is the (P_pad, RT) exit scratch,
    only written when ``need_exit``.

    ``tbb`` (optional, entry-only sweeps): the super-block AABB table from
    :func:`_tri_superbounds`. Every ``_CB``-row block is slab-tested
    against the tile up front; the touched block ids are compacted into an
    SMEM list SORTED by the tile's entry distance into the block, and a
    dynamic-trip-count loop sweeps only those, stopping as soon as the
    nearest unswept block begins beyond every live lane's current best t
    (each lane's own slab entry lower-bounds its hits, so no reachable
    winner is skipped). Untouched blocks cost one bulk slab test, no
    ``lax.cond`` region. Exit sweeps never cull: the exit pass re-reads
    the per-block ``tx_s`` stash, which skipped blocks would leave stale.

    ``live`` (optional (1, RT) bool): lanes whose sweep result the caller
    masks away anyway (dead bounce-scan rays carry garbage directions);
    excluding them from the slab test is what makes culling bite at high
    bounce depth, where most of a tile is dead.

    ``occl``: occlusion (shadow) query — the caller only tests
    ``te >= BIG/2``, so lanes that already found ANY hit stop demanding
    work: blocks touched only by occluded lanes drop out of the candidate
    list and the sweep loop ends once every live lane is occluded (the
    reported t may then come from a farther block than the true closest —
    indistinguishable through the hit/miss test). The row/group
    reductions are skipped per block.
    """
    segs, tri_start, n_tri = layout
    RT = o.shape[1]
    shape = (1, RT)
    assert not (want_na and occl)
    # the winner group feeds the exit pass AND the group-keyed attribute
    # fetch (pallas_step); skip the gid math only when neither wants it
    track_g = need_exit or want_na

    def na_cols(s, e):
        return tuple(at_ref[s:e, _NA_COL + k:_NA_COL + k + 1]
                     for k in range(3))

    def na_pick(mask, naB, na_best, upd):
        """Winner-row normal select: exactly one row matches ``mask``."""
        return tuple(
            jnp.where(upd,
                      jnp.min(jnp.where(mask, naB[k], _BIG), axis=0,
                              keepdims=True), na_best[k])
            for k in range(3))

    def entry_step(t0, t1, ok, rows, gidB, naB, carry):
        t_best, r_best, g_best, na_best = carry
        tm = jnp.where(ok, t0, _BIG)
        bm = jnp.min(tm, axis=0, keepdims=True)
        br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0, keepdims=True)
        upd = bm < t_best
        if track_g:
            bg = jnp.min(jnp.where(rows == br, gidB, _BIG), axis=0,
                         keepdims=True)
            g_best = jnp.where(upd, bg, g_best)
        if want_na:
            na_best = na_pick(rows == br, naB, na_best, upd)
        return (jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best),
                g_best, na_best)

    zero_na = tuple(jnp.zeros(shape, jnp.float32) for _ in range(3))
    carry = (jnp.full(shape, _BIG, jnp.float32), jnp.zeros(shape, jnp.int32),
             jnp.full(shape, _BIG, jnp.float32), zero_na)

    def sphere_cull_sweep(s0, n_rows, carry):
        """Candidate-block sweep of a LONG sphere segment — the dense-kind
        analog of the triangle candidate path (round 5; Instance.json's
        1000 spheres ran a full dense all-pairs sweep every step). Blocks
        are ``_CB`` rows; their AABB rows live at :func:`_bb_sph_off` in
        the combined ``tbb`` table; ``_SUBTILE`` lane groups carry
        independent candidate lists like the tri path. Tie-breaks match
        the dense sweep: blocks ascend, rows ascend within a block, and
        an untouched block can hold no valid hit (a sphere hit point lies
        inside its block AABB — no phantom analog)."""
        n_sb = (n_rows + _CB - 1) // _CB
        off = _bb_sph_off(layout)
        # sphere blocks default to ONE list per tile: the sub-tile split
        # measured a LOSS on Instance.json (H=1: 4.28M vs H=2: 4.09M
        # rays/s — grid-class scenes see most blocks from both halves),
        # opposite to the triangle path's +2%/+6%. MRT_TRI_SUBTILE set
        # explicitly applies to both paths.
        H = _SUBTILE() if (os.environ.get("MRT_TRI_SUBTILE")
                           and _SUBTILE() in (2, 4, 8)) else 1
        RW = RT // H
        GR = 8 // H
        invd = [1.0 / jnp.where(d[k:k + 1, :] == 0.0, EPS, d[k:k + 1, :])
                for k in range(3)]
        c8 = lambda x: jnp.reshape(x, (8, RT // 8))
        oX = [c8(o[k:k + 1, :]) for k in range(3)]
        invdX = [c8(v) for v in invd]
        t_bound = carry[0]
        tbX = c8(t_bound)
        live_m = live if live is not None else jnp.ones(t_bound.shape, bool)
        liveX = c8(live_m.astype(jnp.float32)) > 0.5

        def slab(bi, oR, iR):
            tmin = tmax = None
            for k in range(3):
                t1 = (tbb[off + bi, k] - oR[k]) * iR[k]
                t2 = (tbb[off + bi, 3 + k] - oR[k]) * iR[k]
                near, far = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
                tmin = near if tmin is None else jnp.maximum(tmin, near)
                tmax = far if tmax is None else jnp.minimum(tmax, far)
            return tmin, tmax

        def sph_rows(start, oH, dH):
            # the sphere branch of _kind_block on a dynamic _CB-row slice
            sl = pl.ds(start, _CB)
            f = [fr[sl, k:k + 1] for k in range(9)]
            ix, iy, iz = (ipos[sl, k:k + 1] for k in range(3))
            oc = [oH[k:k + 1, :] for k in range(3)]
            dc = [dH[k:k + 1, :] for k in range(3)]
            rx, ry, rz = oc[0] - ix, oc[1] - iy, oc[2] - iz
            opx = f[0] * rx + f[1] * ry + f[2] * rz + ix
            opy = f[3] * rx + f[4] * ry + f[5] * rz + iy
            opz = f[6] * rx + f[7] * ry + f[8] * rz + iz
            dpx = f[0] * dc[0] + f[1] * dc[1] + f[2] * dc[2]
            dpy = f[3] * dc[0] + f[4] * dc[1] + f[5] * dc[2]
            dpz = f[6] * dc[0] + f[7] * dc[1] + f[8] * dc[2]
            r_ = pr[sl, 0:1]
            ox_, oy_, oz_ = opx - ix, opy - iy, opz - iz
            a = dpx * dpx + dpy * dpy + dpz * dpz
            bq = 2.0 * (ox_ * dpx + oy_ * dpy + oz_ * dpz)
            c = ox_ * ox_ + oy_ * oy_ + oz_ * oz_ - r_ * r_
            disc = bq * bq - 4.0 * a * c
            sq = jnp.sqrt(jnp.where(disc >= 0.0,
                                    jnp.maximum(disc, 1e-12), 1.0))
            a2_ = jnp.where(a == 0.0, 1.0, 2.0 * a)
            t0 = (-bq - sq) / a2_
            t1 = (-bq + sq) / a2_
            ok = (disc >= 0.0) & (t0 >= 0.0)
            ok &= valid[sl, 0:1] > 0.5
            ok &= jnp.isfinite(t0) & jnp.isfinite(t1)
            return t0, ok

        def body(b, c, oH, dH, iota_b):
            t_best, r_best, g_best, na_best = c
            # clamp the LAST block of a segment whose length is not a
            # _CB multiple: the unclamped slice would run past the table
            # (dynamic_slice silently clamps the START, mislabeling every
            # row of the block by the overhang — a real round-5 bug on
            # Instance.json's 1000-row segment, caught in review). The
            # clamped block overlaps the previous one; re-sweeping those
            # rows is idempotent for the min/any reductions, and the
            # labels now match the rows actually read.
            start = jnp.minimum(s0 + b * _CB, s0 + n_rows - _CB)
            t0, ok = sph_rows(start, oH, dH)
            if occl:
                any_r = jnp.max(jnp.where(ok, 1.0, 0.0), axis=0,
                                keepdims=True)
                return (jnp.where(any_r > 0.0, -_BIG, t_best),
                        r_best, g_best, na_best)
            rows = iota_b + start
            tm = jnp.where(ok, t0, _BIG)
            bm = jnp.min(tm, axis=0, keepdims=True)
            br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0,
                         keepdims=True)
            upd = bm < t_best
            if track_g:
                gidB = gid[pl.ds(start, _CB), :]
                bg = jnp.min(jnp.where(rows == br, gidB, _BIG), axis=0,
                             keepdims=True)
                g_best = jnp.where(upd, bg, g_best)
            if want_na:
                naB = tuple(at_ref[pl.ds(start, _CB),
                                   _NA_COL + k:_NA_COL + k + 1]
                            for k in range(3))
                na_best = na_pick(rows == br, naB, na_best, upd)
            return (jnp.where(upd, bm, t_best),
                    jnp.where(upd, br, r_best), g_best, na_best)

        def scoped_s(cand_ref):
            cnts = []
            for hh in range(H):
                rs = slice(hh * GR, (hh + 1) * GR)
                oXH = [r[rs] for r in oX]
                invdH = [v[rs] for v in invdX]
                tbH, liveH = tbX[rs], liveX[rs]
                cnt = jnp.int32(0)
                for sb in range(n_sb):                  # static unroll
                    tmin, tmax = slab(sb, oXH, invdH)
                    touch = ((tmax >= jnp.maximum(tmin, 0.0))
                             & (tmin <= tbH))
                    if occl:
                        touch &= tbH >= _BIG * 0.5
                    if live is not None:
                        touch &= liveH
                    hit = jnp.max(jnp.where(touch, 1.0, 0.0)) > 0.0
                    at = jnp.where(hit, cnt, _CAND_MAX) \
                        + hh * (_CAND_MAX + 1)
                    cand_ref[at] = jnp.int32(sb)
                    cnt = cnt + hit.astype(jnp.int32)
                cnts.append(cnt)
            parts = []
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (_CB, RW), 0)
            for hh in range(H):
                lo_, hi_ = hh * RW, (hh + 1) * RW
                oH, dH = o[:, lo_:hi_], d[:, lo_:hi_]
                cH = tuple(
                    tuple(v[:, lo_:hi_] for v in x)
                    if isinstance(x, tuple) else x[:, lo_:hi_]
                    for x in carry)
                base = hh * (_CAND_MAX + 1)
                cH = jax.lax.fori_loop(
                    0, cnts[hh],
                    lambda j, c, _o=oH, _d=dH, _b=base:
                        body(cand_ref[_b + j], c, _o, _d, iota_b),
                    cH)
                parts.append(cH)
            cat = lambda xs: jnp.concatenate(xs, axis=1)
            return (cat([p[0] for p in parts]),
                    cat([p[1] for p in parts]),
                    cat([p[2] for p in parts]),
                    tuple(cat([p[3][k] for p in parts])
                          for k in range(3)))

        return pl.run_scoped(
            scoped_s, pltpu.SMEM((H * (_CAND_MAX + 1),), jnp.int32))

    sph = _sph_cull_rows(layout) if tbb is not None else None
    sph_cull = sph is not None and sph_cull_active(layout, need_exit, RT)
    for kind, s, e_c in segs:
        e = s + e_c
        if sph_cull and kind == schema.KIND_SPHERE and s == sph[0]:
            carry = sphere_cull_sweep(s, e_c, carry)
            continue
        t0, t1, ok = _kind_block(kind, s, e, fr, ipos, pa, pr, valid, o, d)
        rows = jax.lax.broadcasted_iota(jnp.int32, (e_c, RT), 0) + s
        if need_exit:
            tx_s[s:e, :] = jnp.where(ok, t1, -_BIG)
        carry = entry_step(t0, t1, ok, rows, gid[s:e, :],
                           na_cols(s, e) if want_na else None, carry)

    if n_tri:
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (PRIM_BLOCK, RT), 0)

        def tri_body(b, carry):
            t, ok = pallas_tri._tri_block(AT, HT, thr, o, d, b)
            rows = iota_t + (tri_start + b * PRIM_BLOCK)
            t_best, r_best, g_best, na_best = carry
            tm = jnp.where(ok, t, _BIG)
            if need_exit:
                # triangle exit t == entry t; invalid rows must stash -BIG
                # (a +BIG would win the exit max)
                tx_s[pl.ds(tri_start + b * PRIM_BLOCK, PRIM_BLOCK), :] = \
                    jnp.where(ok, t, -_BIG)
            bm = jnp.min(tm, axis=0, keepdims=True)
            br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0,
                         keepdims=True)
            upd = bm < t_best
            if track_g:
                gidB = gid[pl.ds(tri_start + b * PRIM_BLOCK, PRIM_BLOCK), :]
                bg = jnp.min(jnp.where(rows == br, gidB, _BIG), axis=0,
                             keepdims=True)
                g_best = jnp.where(upd, bg, g_best)
            if want_na:
                naB = tuple(
                    at_ref[pl.ds(tri_start + b * PRIM_BLOCK, PRIM_BLOCK),
                           _NA_COL + k:_NA_COL + k + 1] for k in range(3))
                na_best = na_pick(rows == br, naB, na_best, upd)
            return (jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best),
                    g_best, na_best)

        n_blocks = (n_tri + PRIM_BLOCK - 1) // PRIM_BLOCK
        n_cb = (n_tri + _CB - 1) // _CB
        # MRT_TRI_NOCULL=1: validation knob (tools/golden_check.py) — the
        # compacted-culling deviation (phantom |det|>=E hits outside their
        # block AABB get dropped) is measured by rendering with and
        # without culling in the same run and gating the diff
        cull = (tbb is not None and not need_exit
                and 1 < n_cb <= _CAND_MAX
                and os.environ.get("MRT_TRI_NOCULL", "0") != "1")
        if not cull:
            carry = jax.lax.fori_loop(0, n_blocks, tri_body, carry)
        else:
            # Compacted candidate-block list: slab-test every _CB-row block
            # against the whole tile UP FRONT (bound = the dense kinds'
            # best t, so blocks wholly behind a closer sphere/plane/box hit
            # drop out), compact the touched block ids into SMEM, then run
            # a dynamic-trip-count loop over ONLY those blocks. No scf.if
            # regions at all — the lax.cond-per-super scheme paid ~150
            # cycles per region even when skipped (BASELINE.md), and its
            # n_blocks > 16 gate meant small meshes (Mesh.json: 2 blocks of
            # 512) never culled in the first place.
            invd = [1.0 / jnp.where(d[k:k + 1, :] == 0.0, EPS, d[k:k + 1, :])
                    for k in range(3)]
            t_bound = carry[0]
            iota_cb = jax.lax.broadcasted_iota(jnp.int32, (_CB, RT), 0)

            def cb_body(b, c):
                t_best, r_best, g_best, na_best = c
                if occl:
                    # hit/no-hit is all the caller reads: division-free,
                    # t-free any-hit block test, flag carried as -BIG
                    ok = pallas_tri._tri_block_any(AT, HT, thr, o, d, b,
                                                   tb=_CB)
                    any_r = jnp.max(jnp.where(ok, 1.0, 0.0), axis=0,
                                    keepdims=True)
                    return (jnp.where(any_r > 0.0, -_BIG, t_best),
                            r_best, g_best, na_best)
                t, ok = pallas_tri._tri_block(AT, HT, thr, o, d, b, tb=_CB)
                rows = iota_cb + (tri_start + b * _CB)
                tm = jnp.where(ok, t, _BIG)
                bm = jnp.min(tm, axis=0, keepdims=True)
                br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0,
                             keepdims=True)
                upd = bm < t_best
                if track_g:
                    gidB = gid[pl.ds(tri_start + b * _CB, _CB), :]
                    bg = jnp.min(jnp.where(rows == br, gidB, _BIG), axis=0,
                                 keepdims=True)
                    g_best = jnp.where(upd, bg, g_best)
                if want_na:
                    naB = tuple(at_ref[pl.ds(tri_start + b * _CB, _CB),
                                       _NA_COL + k:_NA_COL + k + 1]
                                for k in range(3))
                    na_best = na_pick(rows == br, naB, na_best, upd)
                return (jnp.where(upd, bm, t_best),
                        jnp.where(upd, br, r_best), g_best, na_best)

            live_m = live if live is not None \
                else jnp.ones(t_bound.shape, bool)

            def _slab(bi, o_rows, invd_rows):
                """Per-lane (tmin, tmax) of cull-block ``bi``'s AABB vs the
                tile — shared by the up-front compaction and the mid-loop
                gate re-test. ``tbb`` lives in SMEM, so the bounds read as
                true scalars and broadcast against any row layout (a (1,1)
                VMEM slice cannot broadcast to (8, W) — Mosaic limitation).
                Row layout follows ``o_rows``/``invd_rows``."""
                tmin = None
                tmax = None
                for k in range(3):
                    t1 = (tbb[bi, k] - o_rows[k]) * invd_rows[k]
                    t2 = (tbb[bi, 3 + k] - o_rows[k]) * invd_rows[k]
                    near = jnp.minimum(t1, t2)
                    far = jnp.maximum(t1, t2)
                    tmin = near if tmin is None else jnp.maximum(tmin, near)
                    tmax = far if tmax is None else jnp.minimum(tmax, far)
                return tmin, tmax

            o_rows = [o[k:k + 1, :] for k in range(3)]
            # the up-front slab tests reduce to scalars (hit/tkey), so run
            # them at full register width: (1, RT) lane rows waste 7/8 of
            # every (8, 128)-tiled vreg; the (8, RT/8) component reshape is
            # Mosaic-native at 1024-lane multiples. With few swept blocks
            # (shadow sweeps especially) the slab unroll otherwise costs a
            # substantial fraction of the whole sweep.
            if RT % 1024 == 0:
                c8 = lambda x: jnp.reshape(x, (8, RT // 8))
                oX = [c8(r) for r in o_rows]
                invdX = [c8(v) for v in invd]
                tbX = c8(t_bound)
                liveX = c8(live_m.astype(jnp.float32)) > 0.5
            else:
                oX, invdX, tbX, liveX = o_rows, invd, t_bound, live_m

            # sub-tile candidate granularity: the tile-frustum slab test
            # is the culling's resolution limit (a 1024-lane tile spans a
            # wide screen/space region, so it demands the union of its
            # lanes' blocks). Splitting the tile into H lane groups with
            # INDEPENDENT candidate lists sweeps each block only over the
            # groups that demand it — strictly fewer (block x lane)
            # pairs for the same semantics, at H x the (cheap, scalar)
            # list bookkeeping. H divides the 8 sublane rows of the
            # component-form slab test, so each group's test is a static
            # row slice.
            H = _SUBTILE() if (RT % 1024 == 0 and _SUBTILE() in (2, 4, 8)
                               and not _NEAR_SORT and not _MID_GATE
                               and not (occl and _OCCL_EXIT())) else 1

            if H > 1:
                RW = RT // H
                GR = 8 // H
                iota_h = jax.lax.broadcasted_iota(jnp.int32, (_CB, RW), 0)

                def cb_body_h(b, c, oH, dH):
                    t_best, r_best, g_best, na_best = c      # (1, RW)
                    if occl:
                        ok = pallas_tri._tri_block_any(AT, HT, thr, oH, dH,
                                                       b, tb=_CB)
                        any_r = jnp.max(jnp.where(ok, 1.0, 0.0), axis=0,
                                        keepdims=True)
                        return (jnp.where(any_r > 0.0, -_BIG, t_best),
                                r_best, g_best, na_best)
                    t, ok = pallas_tri._tri_block(AT, HT, thr, oH, dH, b,
                                                  tb=_CB)
                    rows = iota_h + (tri_start + b * _CB)
                    tm = jnp.where(ok, t, _BIG)
                    bm = jnp.min(tm, axis=0, keepdims=True)
                    br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0,
                                 keepdims=True)
                    upd = bm < t_best
                    if track_g:
                        gidB = gid[pl.ds(tri_start + b * _CB, _CB), :]
                        bg = jnp.min(jnp.where(rows == br, gidB, _BIG),
                                     axis=0, keepdims=True)
                        g_best = jnp.where(upd, bg, g_best)
                    if want_na:
                        naB = tuple(
                            at_ref[pl.ds(tri_start + b * _CB, _CB),
                                   _NA_COL + k:_NA_COL + k + 1]
                            for k in range(3))
                        na_best = na_pick(rows == br, naB, na_best, upd)
                    return (jnp.where(upd, bm, t_best),
                            jnp.where(upd, br, r_best), g_best, na_best)

                def scoped_h(cand_ref):
                    cnts = []
                    for hh in range(H):
                        rs = slice(hh * GR, (hh + 1) * GR)
                        oXH = [r[rs] for r in oX]
                        invdH = [v[rs] for v in invdX]
                        tbH, liveH = tbX[rs], liveX[rs]
                        cnt = jnp.int32(0)
                        for s in range(n_cb):               # static unroll
                            tmin, tmax = _slab(s, oXH, invdH)
                            touch = ((tmax >= jnp.maximum(tmin, 0.0))
                                     & (tmin <= tbH))
                            if occl:
                                touch &= tbH >= _BIG * 0.5
                            if live is not None:
                                touch &= liveH
                            hit = jnp.max(jnp.where(touch, 1.0, 0.0)) > 0.0
                            at = jnp.where(hit, cnt, _CAND_MAX) \
                                + hh * (_CAND_MAX + 1)
                            cand_ref[at] = jnp.int32(s)
                            cnt = cnt + hit.astype(jnp.int32)
                        cnts.append(cnt)
                    parts = []
                    for hh in range(H):
                        lo, hi = hh * RW, (hh + 1) * RW
                        oH, dH = o[:, lo:hi], d[:, lo:hi]
                        cH = tuple(
                            tuple(v[:, lo:hi] for v in x)
                            if isinstance(x, tuple) else x[:, lo:hi]
                            for x in carry)
                        base = hh * (_CAND_MAX + 1)
                        cH = jax.lax.fori_loop(
                            0, cnts[hh],
                            lambda j, c, _o=oH, _d=dH, _b=base:
                                cb_body_h(cand_ref[_b + j], c, _o, _d),
                            cH)
                        parts.append(cH)
                    cat = lambda xs: jnp.concatenate(xs, axis=1)
                    return (cat([p[0] for p in parts]),
                            cat([p[1] for p in parts]),
                            cat([p[2] for p in parts]),
                            tuple(cat([p[3][k] for p in parts])
                                  for k in range(3)))

                carry = pl.run_scoped(
                    scoped_h, pltpu.SMEM((H * (_CAND_MAX + 1),), jnp.int32))
                te, row, wg, na_e = carry
                row = jnp.where(row == _BIGI, 0, row)
                if want_na:
                    return te, row, wg, te, row, na_e, na_e
                return te, row, wg, te, row

            def scoped(cand_ref, tmin_ref):
                cnt = jnp.int32(0)
                # farthest touched-slab exit per lane: a lane can never
                # need a block whose entry lies beyond this, so lanes that
                # miss every block stop holding the early cutoff open
                # (only the near-sort cutoff reads it)
                tfar_all = jnp.full(tbX.shape, -_BIG, jnp.float32)
                for s in range(n_cb):                   # static unroll
                    tmin, tmax = _slab(s, oX, invdX)
                    # a block whose AABB starts beyond the lane's dense-kind
                    # best can't improve the min; occlusion lanes that found
                    # any hit already stop asking for more work
                    touch = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= tbX)
                    if occl:
                        touch &= tbX >= _BIG * 0.5
                    if live is not None:
                        touch &= liveX
                    if _NEAR_SORT:
                        tfar_all = jnp.where(
                            touch, jnp.maximum(tfar_all, tmax), tfar_all)
                    hit = jnp.max(jnp.where(touch, 1.0, 0.0)) > 0.0
                    # the tile's entry distance into this block (for the
                    # near-to-far sweep order): every touched lane's hits
                    # inside the block are >= its own tmin >= this minimum
                    tkey = jnp.min(jnp.where(touch, tmin, _BIG))
                    # branch-free compaction: untouched blocks write to the
                    # trash slot (_CAND_MAX), so every meaningful slot is
                    # stored exactly once — repeated stores to one address
                    # gave Mosaic license to reorder and corrupted the list
                    at = jnp.where(hit, cnt, _CAND_MAX)
                    cand_ref[at] = jnp.int32(s)
                    tmin_ref[at] = tkey
                    if _NEAR_SORT:
                        # insertion bubble: keep the list tmin-ascending.
                        # The swap loop runs only for touched blocks (k
                        # starts at 0 otherwise) and touches real slots only.
                        def bub_cond(k):
                            kc = jnp.maximum(k, 1)
                            return (k > 0) & (tmin_ref[kc - 1] > tkey)

                        def bub_body(k):
                            cand_ref[k] = cand_ref[k - 1]
                            tmin_ref[k] = tmin_ref[k - 1]
                            cand_ref[k - 1] = jnp.int32(s)
                            tmin_ref[k - 1] = tkey
                            return k - 1

                        jax.lax.while_loop(bub_cond, bub_body,
                                           jnp.where(hit, cnt, 0))
                    cnt = cnt + hit.astype(jnp.int32)

                def gated_body(b, c):
                    # mid-loop re-test: as the loop finds hits (entry) or
                    # occludes lanes (shadow), listed blocks stop being
                    # needed — re-derive per-lane demand against the
                    # CURRENT bests and skip the whole (CB, RT) sweep when
                    # no lane demands it. The scf.if region costs ~150
                    # cycles when not taken vs ~1 us for a swept block.
                    tmin, tmax = _slab(b, o_rows, invd)
                    t_best = c[0]
                    need = (tmax >= jnp.maximum(tmin, 0.0)) & live_m
                    if occl:
                        need &= t_best >= _BIG * 0.5
                    else:
                        need &= tmin <= t_best
                    return jax.lax.cond(
                        jnp.max(jnp.where(need, 1.0, 0.0)) > 0.0,
                        lambda cc: cb_body(b, cc), lambda cc: cc, c)

                body = gated_body if _MID_GATE else cb_body

                if not _NEAR_SORT:
                    if occl and _OCCL_EXIT():
                        # early-exit any-hit (opt-in, measured a net LOSS
                        # — see _OCCL_EXIT): once EVERY live lane is
                        # occluded (t_best < BIG/2) the remaining
                        # candidate blocks cannot change the answer, so
                        # the while form stops; but its scalar loop
                        # dependency serializes sweeps the fori_loop
                        # pipelines.
                        def occ_cond(st):
                            j, c = st
                            t_best = c[0]
                            open_ = jnp.where(
                                live_m & (t_best >= _BIG * 0.5), 1.0, 0.0)
                            if RT % 1024 == 0:  # full-register reduce
                                open_ = jnp.reshape(open_, (8, RT // 8))
                            return (j < cnt) & (jnp.max(open_) > 0.0)

                        def occ_body(st):
                            j, c = st
                            return j + 1, body(cand_ref[j], c)

                        return jax.lax.while_loop(
                            occ_cond, occ_body, (jnp.int32(0), carry))[1]
                    return jax.lax.fori_loop(
                        0, cnt, lambda j, c: body(cand_ref[j], c), carry)

                # near-to-far sweep with early cutoff: stop when the
                # nearest unswept block begins beyond every live lane's
                # demand bound min(current best, farthest touched-slab
                # exit) — a lane with possible hits in block j has
                # tkey_j <= its own slab entry <= both terms, so no
                # reachable winner is ever skipped (occlusion: a lane
                # stops demanding once occluded or out of blocks)
                def loop_cond(st):
                    j, c = st
                    t_best = c[0]
                    tfar_l = jnp.reshape(tfar_all, t_bound.shape)
                    if occl:
                        bound = jnp.max(jnp.where(
                            live_m & (t_best >= _BIG * 0.5), tfar_l,
                            -_BIG))
                    else:
                        bound = jnp.max(jnp.where(
                            live_m, jnp.minimum(t_best, tfar_l), -_BIG))
                    tj = tmin_ref[jnp.minimum(j, _CAND_MAX)]
                    return (j < cnt) & (tj <= bound)

                def loop_body(st):
                    j, c = st
                    return j + 1, body(cand_ref[j], c)

                return jax.lax.while_loop(loop_cond, loop_body,
                                          (jnp.int32(0), carry))[1]

            carry = pl.run_scoped(scoped,
                                  pltpu.SMEM((_CAND_MAX + 1,), jnp.int32),
                                  pltpu.SMEM((_CAND_MAX + 1,), jnp.float32))

    te, row, wg, na_e = carry
    row = jnp.where(row == _BIGI, 0, row)
    if not need_exit:
        if want_na:
            return te, row, wg, te, row, na_e, na_e
        return te, row, wg, te, row

    # pass 2: farthest stashed exit-t within the winning group. Stashed
    # values are -BIG where invalid; for triangles the stash holds the
    # entry t (== exit t per triangle) masked the same way.
    tx_best = jnp.full(shape, -_BIG, jnp.float32)
    x_best = jnp.zeros(shape, jnp.int32)
    na_x = zero_na

    def exit_step(s, e_c, carry):
        tx_best, x_best, na_x = carry
        txm = tx_s[pl.ds(s, e_c), :] if not isinstance(s, int) \
            else tx_s[s:s + e_c, :]
        gidB = gid[pl.ds(s, e_c), :] if not isinstance(s, int) \
            else gid[s:s + e_c, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (e_c, RT), 0) + s
        me = jnp.where(gidB == wg, txm, -_BIG)
        bm = jnp.max(me, axis=0, keepdims=True)
        br = jnp.min(jnp.where(me == bm, rows, _BIGI), axis=0, keepdims=True)
        upd = bm > tx_best
        if want_na:
            naB = tuple(at_ref[pl.ds(s, e_c) if not isinstance(s, int)
                               else slice(s, s + e_c),
                               _NA_COL + k:_NA_COL + k + 1]
                        for k in range(3))
            na_x = na_pick(rows == br, naB, na_x, upd)
        return (jnp.where(upd, bm, tx_best), jnp.where(upd, br, x_best),
                na_x)

    for kind, s, e_c in segs:
        tx_best, x_best, na_x = exit_step(s, e_c, (tx_best, x_best, na_x))
    if n_tri:
        n_blocks = (n_tri + PRIM_BLOCK - 1) // PRIM_BLOCK

        def exit_tri(b, carry):
            return exit_step(tri_start + b * PRIM_BLOCK, PRIM_BLOCK, carry)

        tx_best, x_best, na_x = jax.lax.fori_loop(
            0, n_blocks, exit_tri, (tx_best, x_best, na_x))

    xrow = jnp.where(x_best == _BIGI, 0, x_best)
    if want_na:
        return te, row, wg, tx_best, xrow, na_e, na_x
    return te, row, wg, tx_best, xrow


def _hit_kernel(layout, need_exit, has_tbb, *refs):
    refs = list(refs)
    (fr, ipos, pa, pr, valid, gid, AT, HT, thr) = refs[:9]
    refs = refs[9:]
    tbb = refs.pop(0) if has_tbb else None
    o_r, d_r, te_o, row_o, tx_o, xrow_o, tx_s = refs
    te, row, _, tx, xrow = sweep_closest(
        layout, need_exit, fr, ipos, pa, pr, valid, gid, AT, HT, thr,
        o_r[...], d_r[...], tx_s, tbb=tbb)
    te_o[...] = te
    row_o[...] = row
    tx_o[...] = tx
    xrow_o[...] = xrow


# Triangle-culling granularity: rows per cull block. Morton ordering
# (compiler._morton_order) makes consecutive rows spatially tight, so one
# conservative world-space AABB covers a 64-triangle chunk well. The
# candidate-list scheme (sweep_closest) slab-tests every block up front
# and loops over only the touched ones, so unlike the earlier
# lax.cond-per-super design there is no per-block branch to amortize.
# Measured on Mesh.json fwd: 64 -> 4.72M rays/s vs 128 -> 4.28M,
# 32 -> 4.11M, 256 -> 4.30M (finer blocks cull tighter until the slab
# tests and list bookkeeping dominate).
_CB = int(os.environ.get("MRT_TRI_CB", "64"))
# static unroll bound for the candidate slab tests / SMEM list size;
# kernel-eligible scenes are bounded by _MAX_SCRATCH_ROWS anyway
_CAND_MAX = 64
# near-to-far candidate ordering + early sweep cutoff (opt-in: the
# insertion sort and the per-iteration scalar bound reduce measured a net
# LOSS on Mesh.json — 3.74M vs 4.26M rays/s — the scalar/SMEM latency per
# while iteration outweighs the skipped blocks at n_cb=8)
_NEAR_SORT = os.environ.get("MRT_TRI_NEAR", "0") == "1"
# mid-loop per-block demand re-test + lax.cond skip inside the compacted
# candidate loop: entry sweeps skip blocks once found hits bound them out,
# occlusion sweeps skip blocks once the lanes that pulled them in are
# occluded. Opt-in: measured a net LOSS on Mesh.json (4.08M vs 4.72M
# rays/s, and 3.28M combined with MRT_TRI_NEAR) — the scf.if region per
# listed block costs more than the skipped sweeps recover, the same
# failure mode as every per-block lax.cond scheme before it (BASELINE.md)
_MID_GATE = os.environ.get("MRT_TRI_GATE", "0") == "1"
# early-exit while loop for occlusion (shadow) candidate sweeps: stop as
# soon as every live lane is occluded. NEGATIVE result (round 5,
# Mesh.json): fwd 7.54M vs 7.88M rays/s, fwdbwd 4.06M vs 4.24M — the
# while_loop's per-iteration vector reduce + scalar dependency
# serializes the block sweeps that the fori_loop pipelines, costing
# more than the skipped blocks recover at ~6 candidates/tile. Same
# failure family as _NEAR_SORT / _MID_GATE. Kept opt-in
# (MRT_TRI_OCCL_EXIT=1); radiance is bitwise-identical either way
# (test_occl_early_exit_and_nocull_match).
def _OCCL_EXIT():
    # read per trace (NOT at import): monkeypatched tests and fresh-env
    # A/Bs must actually flip the path (reviewed round 5 — import-time
    # reads made the variant equality tests compare a path to itself)
    return os.environ.get("MRT_TRI_OCCL_EXIT", "0") == "1"
# sub-tile candidate lists: split each ray tile into this many lane
# groups, each with its own compacted candidate-block list (1 = off).
# The tile-frustum union was the culling's measured resolution limit
# ("within ~30% of its tile-granularity limit", BASELINE.md round 4);
# groups sweep only the blocks their own lanes demand.
def _SUBTILE():
    # per-trace read, like _OCCL_EXIT
    return int(os.environ.get("MRT_TRI_SUBTILE", "2"))


# dense-kind culling threshold: sphere segments at least this long get
# _CB-row cull blocks like the triangle segment (Instance.json's 1000
# spheres ran a full dense all-pairs sweep every step — the scene class
# the reference's per-object iteration handles by construction)
_DENSE_CULL_MIN = 256


def _sph_cull_rows(layout):
    """(sphere_start, n_sphere) if the sphere segment gets cull blocks.

    ``c >= _CB`` guards the last-block clamp (a segment shorter than one
    block would clamp the start below the segment — reviewed round 5,
    reachable with MRT_TRI_CB > _DENSE_CULL_MIN)."""
    from ..models import schema as _s

    for kind, s, c in layout[0]:
        if kind == _s.KIND_SPHERE and c >= max(_DENSE_CULL_MIN, _CB) \
                and (c + _CB - 1) // _CB <= _CAND_MAX:
            return s, c
    return None


def sph_cull_active(layout, need_exit, RT):
    """THE sphere-cull predicate, shared by sweep_closest's kernel gate
    and pallas_step._pick_rt_fwd's tile budgeting — round 5's bug #3 was
    exactly these two disagreeing (an unclamped dense working set
    whenever the kernel fell back while the budget assumed culling)."""
    return (_sph_cull_rows(layout) is not None and not need_exit
            and RT % 1024 == 0
            and os.environ.get("MRT_TRI_NOCULL", "0") != "1")


def _bb_sph_off(layout):
    """Row offset of the sphere-block AABBs inside the combined ``tbb``
    table: the (8-padded) triangle super rows come first."""
    n_tri = layout[2]
    if not n_tri:
        return 0
    n_sup = (n_tri + _CB - 1) // _CB
    return n_sup + ((-n_sup) % 8)


def _sphere_blockbounds(scene):
    """World AABBs of _CB-row sphere blocks: center +- r per row (the
    instance transform is a rotation — radius invariant), empty for
    invalid rows, 8-padded like :func:`_tri_superbounds`."""
    s = scene.seg(schema.KIND_SPHERE)
    ip = scene.inst_pos[s]
    r = scene.prim_r[s][:, None]
    valid = scene.prim_valid[s][:, None]
    big = jnp.float32(_BIG)
    lo = jnp.where(valid, ip - r, big)
    hi = jnp.where(valid, ip + r, -big)
    Ps = lo.shape[0]
    pad = (-Ps) % _CB
    lo = jnp.pad(lo, ((0, pad), (0, 0)), constant_values=big)
    hi = jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-big)
    n_b = (Ps + pad) // _CB
    lo = jnp.min(lo.reshape(n_b, _CB, 3), axis=1)
    hi = jnp.max(hi.reshape(n_b, _CB, 3), axis=1)
    eps = 1e-4 + 1e-4 * jnp.maximum(hi - lo, 0.0)
    lo, hi = lo - eps, hi + eps
    bad = ~(jnp.isfinite(lo) & jnp.isfinite(hi))
    lo = jnp.where(bad, -big, lo)
    hi = jnp.where(bad, big, hi)
    bb = jnp.concatenate([lo, hi, jnp.zeros((n_b, 2), jnp.float32)], 1)
    if n_b % 8:
        empty = jnp.tile(jnp.asarray([[big] * 3 + [-big] * 3 + [0.0] * 2],
                                     jnp.float32), ((-n_b) % 8, 1))
        bb = jnp.concatenate([bb, empty], axis=0)
    return bb


def _tri_superbounds(scene, frames):
    """World-space AABBs of Morton-contiguous triangle super-blocks.

    Triangle vertices are stored in object space (the ray is mapped into
    the instance frame, rt.rs:729-732); the world vertex inverts that map:
    ``wv = ip + M^-1 (v - ip)``. The 3x3 inverse is the cross-product
    adjugate over columns — elementwise math, no MXU truncation. Returns
    ``(n_sup_padded, 8)`` rows ``[lo3 | hi3 | 0 0]``; padded/degenerate
    rows get an empty AABB (lo=+BIG, hi=-BIG) so their supers never pass
    the slab test, and non-finite bounds fall back to an always-tested
    AABB rather than silently culling real geometry.
    """
    s = scene.seg(schema.KIND_TRIANGLE)
    M = frames[s]                                       # (Pt,3,3)
    ip = scene.inst_pos[s]
    valid = scene.prim_valid[s]
    c0, c1, c2 = M[:, :, 0], M[:, :, 1], M[:, :, 2]     # columns
    r0 = jnp.cross(c1, c2)
    r1 = jnp.cross(c2, c0)
    r2 = jnp.cross(c0, c1)
    det = jnp.sum(c0 * r0, axis=-1, keepdims=True)
    det = jnp.where(det == 0.0, 1.0, det)
    span = _CB
    big = jnp.float32(_BIG)
    ws = []
    for v in (scene.prim_a[s], scene.prim_b[s], scene.prim_c[s]):
        rel = v - ip
        wv = ip + jnp.stack([jnp.sum(r0 * rel, -1), jnp.sum(r1 * rel, -1),
                             jnp.sum(r2 * rel, -1)], axis=-1) / det
        ws.append(wv)
    W = jnp.stack(ws, 0)                                # (3, Pt, 3)
    lo = jnp.where(valid[None, :, None], W, big)
    hi = jnp.where(valid[None, :, None], W, -big)
    Pt = lo.shape[1]
    pad = (-Pt) % span
    lo = jnp.pad(lo, ((0, 0), (0, pad), (0, 0)), constant_values=big)
    hi = jnp.pad(hi, ((0, 0), (0, pad), (0, 0)), constant_values=-big)
    n_sup = (Pt + pad) // span
    lo = jnp.min(lo.reshape(3, n_sup, span, 3), axis=(0, 2))
    hi = jnp.max(hi.reshape(3, n_sup, span, 3), axis=(0, 2))
    eps = 1e-4 + 1e-4 * jnp.maximum(hi - lo, 0.0)       # slab float slack
    lo, hi = lo - eps, hi + eps
    bad = ~(jnp.isfinite(lo) & jnp.isfinite(hi))
    lo = jnp.where(bad, -big, lo)
    hi = jnp.where(bad, big, hi)
    tbb = jnp.concatenate([lo, hi, jnp.zeros((n_sup, 2), jnp.float32)], 1)
    if n_sup % 8:
        empty = jnp.tile(jnp.asarray([[big] * 3 + [-big] * 3 + [0.0] * 2],
                                     jnp.float32), ((-n_sup) % 8, 1))
        tbb = jnp.concatenate([tbb, empty], axis=0)
    return tbb


def pack_scene(scene, frames, tri_pack):
    """Kernel constant tables from the compiled scene (all differentiable
    leaves flow: fr <- inst_dir, AT/HT <- vertices+instances). The last
    entry is the stop-gradient triangle super-block AABB table (culling
    metadata, None for tri-free scenes)."""
    P = scene.n_prims
    fr = frames.reshape(P, 9)
    valid = scene.prim_valid.astype(jnp.float32)[:, None]
    gid = scene.group_id.astype(jnp.float32)[:, None]
    n_tri = scene.kind_counts[schema.KIND_TRIANGLE]
    # combined cull-AABB table: (8-padded) triangle super rows first,
    # then sphere-block rows (offset derivable from the static layout —
    # _bb_sph_off); either section may be absent
    bb_parts = []
    layout = _seg_layout(scene.kind_counts)
    if _sph_cull_rows(layout) is not None:
        sbb = _sphere_blockbounds(scene)
    else:
        sbb = None
    tbb = None
    if n_tri:
        s = scene.seg(schema.KIND_TRIANGLE)
        AT, HT, thr = pallas_tri.pack_consts(tri_pack, scene.prim_valid[s])
        # group ids of padded tri rows must never match: valid=0 rows keep
        # thr=BIG, but the exit pass reads gid directly — pad with -3
        gid_all = jnp.concatenate(
            [gid[:s.start], _pad_p(gid[s.start:], fill=-3.0)], axis=0)
        # culling is metadata, not semantics: keep gradients off its tables
        bb_parts.append(_tri_superbounds(scene, frames))
    else:
        # Mosaic rejects zero-row operands; a dummy sublane tile with
        # thr=BIG is never read (the kernel's tri loop is compiled out)
        AT = jnp.zeros((8, 9), jnp.float32)
        HT = jnp.zeros((8, 3), jnp.float32)
        thr = jnp.full((8, 1), _BIG, jnp.float32)
        gid_all = gid
    if sbb is not None:
        bb_parts.append(sbb)
    if bb_parts:
        tbb = jax.lax.stop_gradient(jnp.concatenate(bb_parts, axis=0))
    return (fr, scene.inst_pos, scene.prim_a, scene.prim_r[:, None],
            valid, gid_all, AT, HT, thr, tbb)


def _call_hit(layout, consts, o, d, need_exit):
    fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb = consts
    AT = _pad_p(AT)
    HT = _pad_p(HT)
    thr = _pad_p(thr, fill=_BIG)
    R = o.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    oT, dT = o.T, d.T
    Rp = oT.shape[1]
    scratch_rows = layout[1] + AT.shape[0]

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    tbb_specs, tbb_args = [], []
    if tbb is not None:
        tbb_specs, tbb_args = \
            [pl.BlockSpec(memory_space=pltpu.SMEM)], [tbb]
    kern = partial(_hit_kernel, layout, need_exit, tbb is not None)
    te, row, tx, xrow = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=[cspec(fr), cspec(ipos), cspec(pa), cspec(pr), cspec(valid),
                  cspec(gid), cspec(AT), cspec(HT), cspec(thr)]
                 + tbb_specs + [_RAY_SPEC, _RAY_SPEC],
        out_specs=[_OUT_SPEC] * 4,
        out_shape=_out_shapes(Rp, 4),
        scratch_shapes=[pltpu.VMEM((max(scratch_rows, 8), RAY_TILE),
                                   jnp.float32)],
        interpret=_interpret(),
    )(fr, ipos, pa, pr, valid, gid, AT, HT, thr, *tbb_args, oT, dT)
    return te[0, :R], row[0, :R], tx[0, :R], xrow[0, :R]


# --- differentiable wrapper ------------------------------------------------

def _winner_t_all(layout, fr, ipos, pa, pr, AT, HT, o, d, row, want_exit):
    """Recompute the winner row's entry (or exit) t differentiably.

    Row attributes arrive via one one-hot MXU fetch; the per-kind formula
    is selected by the row's static segment bounds (kind-sorted layout).
    All guards mirror the forward kernel so misses/invalid stay finite.
    """
    segs, tri_start, n_tri = layout
    P_nt = tri_start
    hp = jax.lax.Precision.HIGHEST
    # non-tri attributes (row clamped into the non-tri region; the value is
    # unused for triangle winners)
    row_nt = jnp.minimum(row, max(P_nt - 1, 0))
    oh = jax.nn.one_hot(row_nt, max(P_nt, 1), dtype=o.dtype)
    fetch = lambda tab: jax.lax.dot(oh, tab[:max(P_nt, 1)], precision=hp)
    frw = fetch(fr)                                    # (R, 9)
    ipw = fetch(ipos)
    paw = fetch(pa)
    prw = fetch(pr)[:, 0]
    rel = o - ipw
    op = jnp.stack([frw[:, 0] * rel[:, 0] + frw[:, 1] * rel[:, 1]
                    + frw[:, 2] * rel[:, 2] + ipw[:, 0],
                    frw[:, 3] * rel[:, 0] + frw[:, 4] * rel[:, 1]
                    + frw[:, 5] * rel[:, 2] + ipw[:, 1],
                    frw[:, 6] * rel[:, 0] + frw[:, 7] * rel[:, 1]
                    + frw[:, 8] * rel[:, 2] + ipw[:, 2]], axis=-1)
    dp = jnp.stack([frw[:, 0] * d[:, 0] + frw[:, 1] * d[:, 1]
                    + frw[:, 2] * d[:, 2],
                    frw[:, 3] * d[:, 0] + frw[:, 4] * d[:, 1]
                    + frw[:, 5] * d[:, 2],
                    frw[:, 6] * d[:, 0] + frw[:, 7] * d[:, 1]
                    + frw[:, 8] * d[:, 2]], axis=-1)

    # sphere
    oc = op - ipw
    a = jnp.sum(dp * dp, -1)
    bq = 2.0 * jnp.sum(oc * dp, -1)
    c = jnp.sum(oc * oc, -1) - prw * prw
    disc = bq * bq - 4.0 * a * c
    sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
    a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
    t_sph = ((-bq + sq) / a2) if want_exit else ((-bq - sq) / a2)
    # plane
    nn = jnp.sum(paw * paw, -1)
    inv = jax.lax.rsqrt(jnp.where(nn > 0.0, nn, 1.0))
    nrm = paw * inv[:, None]
    dd = -jnp.sum(nrm * ipw, -1)
    dn = jnp.sum(dp * nrm, -1)
    t_pln = -(jnp.sum(op * nrm, -1) + dd) / jnp.where(dn == 0.0, 1.0, dn)
    # box
    mm = 1.0 / jnp.where(dp == 0.0, 1.0, dp)
    mm = jnp.where(dp == 0.0, 1.0 / EPS, mm)
    nb = (op - ipw) * mm
    kb = 0.5 * paw * jnp.abs(mm)
    t_box = (jnp.min(-nb + kb, -1)) if want_exit else (jnp.max(-nb - kb, -1))
    # triangle (Woop plane form over the tri-local row)
    if n_tri:
        row_t = jnp.clip(row - tri_start, 0, AT.shape[0] - 1)
        t_tri = pallas_tri._winner_t(AT, HT, o, d, row_t)
    else:
        t_tri = jnp.zeros_like(t_sph)

    bounds = []
    for kind, s, c in segs:
        bounds.append((kind, s + c))
    t = t_tri
    for kind, end in reversed(bounds):
        tk = {schema.KIND_SPHERE: t_sph, schema.KIND_PLANE: t_pln,
              schema.KIND_BOX: t_box}[kind]
        t = jnp.where(row < end, tk, t)
    return t


def make_closest_hit(layout):
    """Build the custom-vjp closest-hit for a static scene layout."""

    @partial(jax.custom_vjp, nondiff_argnums=(1,))
    def hit(consts, need_exit, o, d):
        return _call_hit(layout, consts, o, d, need_exit)

    def fwd(consts, need_exit, o, d):
        out = _call_hit(layout, consts, o, d, need_exit)
        te, row, tx, xrow = out
        res = (consts, o, d, row, xrow,
               te < _BIG * 0.5, tx > -_BIG * 0.5)
        return out, res

    def bwd(need_exit, res, cts):
        (consts, o, d, row, xrow, hit_e, hit_x) = res
        fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb = consts
        ct_te = jnp.where(hit_e, cts[0], 0.0)
        ct_tx = jnp.where(hit_x & hit_e, cts[2], 0.0)

        def f(fr, ipos, pa, pr, AT, HT, o, d):
            te = _winner_t_all(layout, fr, ipos, pa, pr, AT, HT, o, d, row,
                               want_exit=False)
            if need_exit:
                tx = _winner_t_all(layout, fr, ipos, pa, pr, AT, HT, o, d,
                                   xrow, want_exit=True)
            else:
                tx = te
            return te, tx

        _, vjp = jax.vjp(f, fr, ipos, pa, pr, AT, HT, o, d)
        gfr, gip, gpa, gpr, gA, gH, go, gd = vjp((ct_te, ct_tx))
        d_consts = (gfr, gip, gpa, gpr, jnp.zeros_like(valid),
                    jnp.zeros_like(gid), gA, gH, jnp.zeros_like(thr),
                    None if tbb is None else jnp.zeros_like(tbb))
        return (d_consts, go, gd)

    hit.defvjp(fwd, bwd)
    return hit


_HIT_CACHE: dict = {}


def closest_hit(scene, frames, orig, dirs, need_exit=True, tri_pack=None):
    """HitInfo-compatible closest hit through the all-kind kernel."""
    from . import intersect

    layout = _seg_layout(scene.kind_counts)
    if layout not in _HIT_CACHE:
        _HIT_CACHE[layout] = make_closest_hit(layout)
    if tri_pack is None and layout[2]:
        tri_pack = intersect.triangle_pack(scene, frames)
    consts = pack_scene(scene, frames, tri_pack)
    te, row, tx, xrow = _HIT_CACHE[layout](consts, need_exit, orig, dirs)
    hit = te < _BIG * 0.5
    return intersect.HitInfo(hit=hit, t_entry=te, t_exit=tx,
                             idx_entry=row, idx_exit=xrow)


def any_hit(scene, frames, orig, dirs, tri_pack=None):
    """Occlusion query through the kernel (entry only, gradient-free)."""
    h = closest_hit(scene, frames, jax.lax.stop_gradient(orig),
                    jax.lax.stop_gradient(dirs), need_exit=False,
                    tri_pack=tri_pack)
    return h.hit
