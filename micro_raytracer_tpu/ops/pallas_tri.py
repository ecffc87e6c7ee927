"""Fused Pallas reduction for the triangle segment (third-generation kernel).

The MXU (Woop-transform) triangle sweep in :mod:`intersect` is six
``(R,3)@(3,Pt)`` matmuls — but XLA materializes every (R, Pt) matmul output
in HBM, ~24*Pt bytes/ray/sweep, which caps triangle-heavy scenes around
1 M paths/s regardless of compute. This kernel performs the same sweep with
the transform products, validity tests, and the min/argmin (entry) or
masked group-max (exit) reductions all inside VMEM: HBM sees only the rays
in and one (t, row) pair out per ray.

Orientation matters on TPU: rays live on the 128-wide LANE axis and
triangles on sublanes, so per-ray results are dense (1, R) row vectors.
(The first version kept rays on sublanes; its (R, 1) outputs tile as
T(8,128) with 127/128 lanes padding — 67 MB of HBM per 131k-ray vector —
and every op touching them ran ~100x over byte cost. BASELINE.md.)

Semantics are identical to the reference Moller-Trumbore sweep
(rt.rs:361-398): first-occurrence argmin tie-break, ``|det| >= E`` mapped to
the per-triangle ``|d'_z| >= E/(n.n)`` threshold (invalid/padded rows carry
thr = BIG so they never pass), entry = min t, mesh exit = max t within the
winning ``group_id`` (rt.rs:740-772). The fused entry+exit kernel stashes
the masked t matrix in VMEM scratch and reduces the exit from it — the
winning group is known locally because a global triangle winner is by
construction this segment's argmin.

Differentiation: ``custom_vjp``s recompute the *winner's* t analytically —
``t = -(o.g3 + h3)/(d.g3)`` for the row the kernel selected — and push the
cotangent through one one-hot MXU fetch, exactly the gradient the dense
sweep's masked-min would produce (only the argmin row carries gradient).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_BIG = 3.0e38
_BIGI = 2 ** 30
# tile sizes: rays per grid program (lanes) x triangles per inner block
# (sublanes). Tuned on TPU v5e (BASELINE.md); env knobs for experiments.
RAY_TILE = int(os.environ.get("MRT_TRI_PALLAS_RT", "512"))
PRIM_BLOCK = int(os.environ.get("MRT_TRI_PALLAS_PB", "512"))
# the (Pt, 13) constant table must fit VMEM next to the (PRIM_BLOCK,
# RAY_TILE) intermediates (~16 MB/core); larger meshes fall back to the
# MXU sweep.
MAX_PRIMS = 1 << 16
# fused entry+exit stashes a (Pt, RAY_TILE) scratch
_FUSED_MAX_PT = 4096

try:  # pallas import can fail on CPU-only builds of jaxlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    """Kernel is default-on on TPU; ``MRT_TRI_PALLAS=0`` disables, ``=1``
    forces (interpret mode off-TPU is far too slow for real use)."""
    env = os.environ.get("MRT_TRI_PALLAS", "")
    if env == "0" or not _PALLAS:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def enabled_for(scene) -> bool:
    from ..models import schema

    n_tri = scene.kind_counts[schema.KIND_TRIANGLE]
    return (available() and 0 < n_tri <= MAX_PRIMS
            and n_tri >= int(os.environ.get("MRT_TRI_PALLAS_MIN", "256")))


def fused_exit_ok(scene) -> bool:
    """Whether the fused entry+exit kernel's scratch fits VMEM."""
    from ..models import schema

    n_tri = scene.kind_counts[schema.KIND_TRIANGLE]
    pt = n_tri + ((-n_tri) % PRIM_BLOCK)
    return pt <= _FUSED_MAX_PT


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def pack_consts(tri_pack, prim_valid):
    """triangle_pack output -> (AT (Pt,9), HT (Pt,3), thr (Pt,1)).

    ``AT[p, 3k+j] = G[p, k, j]`` so ``o'_k = sum_j AT[:,3k+j] o_j + h_k``;
    invalid/degenerate rows get thr = BIG (they can never pass the det
    test), which is how masking reaches the kernel without a bool input.
    """
    G, h, thr, okg = tri_pack
    AT = G.reshape(G.shape[0], 9)
    thr = jnp.where(okg & prim_valid, thr, _BIG)[:, None]
    return AT, h, thr


def _pad_p(x, fill=0.0):
    Pt = x.shape[0]
    pad = (-Pt) % PRIM_BLOCK
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                   constant_values=fill)


def _tri_block(A_r, H_r, thr_r, o, d, b, tb=None):
    """(t, ok) of prim block ``b`` vs the ray tile, (tb, RAY_TILE).

    ``o``/``d`` are (3, RAY_TILE) lane-major; per-triangle constants are
    (tb, 1) sublane columns; every product is a VPU broadcast-FMA —
    exact f32, no MXU passes (in-kernel K=3 dots measured slower AND the
    MXU truncates f32 to bf16 by default, the fetch_attrs trap).
    ``tb`` is the block row count (default PRIM_BLOCK; the candidate-list
    culling in pallas_hit3 sweeps finer 128-row blocks).
    """
    if tb is None:
        tb = PRIM_BLOCK
    sl = pl.ds(b * tb, tb)
    A = A_r[sl, :]                                       # (PB, 9)
    oc = [o[k:k + 1, :] for k in range(3)]               # (1, RT)
    dc = [d[k:k + 1, :] for k in range(3)]

    def prod(k, v):
        return (A[:, 3 * k:3 * k + 1] * v[0]
                + A[:, 3 * k + 1:3 * k + 2] * v[1]
                + A[:, 3 * k + 2:3 * k + 3] * v[2])      # (PB, RT)

    h = H_r[sl, :]
    oxt = prod(0, oc) + h[:, 0:1]
    oyt = prod(1, oc) + h[:, 1:2]
    ozt = prod(2, oc) + h[:, 2:3]
    dxt = prod(0, dc)
    dyt = prod(1, dc)
    dzt = prod(2, dc)
    thr = thr_r[sl, :]                                   # (PB, 1)
    ok = jnp.abs(dzt) >= thr                             # |det| >= E
    dzs = jnp.where(ok, dzt, 1.0)
    t = -ozt / dzs
    u = oxt + t * dxt
    v = oyt + t * dyt
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return t, ok


def _tri_block_any(A_r, H_r, thr_r, o, d, b, tb=None):
    """Occlusion form of :func:`_tri_block`: hit-or-not only, no division.

    An occlusion query never reads t, so the tests run multiplied through
    by ``D^2 > 0`` (``D = d'_z``): with ``Pu = (o'_x D - o'_z d'_x) D =
    u D^2`` (and Pv likewise), ``u in [0,1]`` iff ``0 <= Pu <= D^2``, and
    ``t >= 0`` iff ``o'_z D <= 0``. Same ``|det| >= E`` guard as the entry
    form; the division-free products round differently only at exact
    u/v/t boundaries (measure-zero grazing pairs the E-guard already
    excludes in practice)."""
    if tb is None:
        tb = PRIM_BLOCK
    sl = pl.ds(b * tb, tb)
    A = A_r[sl, :]
    oc = [o[k:k + 1, :] for k in range(3)]
    dc = [d[k:k + 1, :] for k in range(3)]

    def prod(k, v):
        return (A[:, 3 * k:3 * k + 1] * v[0]
                + A[:, 3 * k + 1:3 * k + 2] * v[1]
                + A[:, 3 * k + 2:3 * k + 3] * v[2])

    h = H_r[sl, :]
    oxt = prod(0, oc) + h[:, 0:1]
    oyt = prod(1, oc) + h[:, 1:2]
    ozt = prod(2, oc) + h[:, 2:3]
    dxt = prod(0, dc)
    dyt = prod(1, dc)
    D = prod(2, dc)
    thr = thr_r[sl, :]
    ok = jnp.abs(D) >= thr
    D2 = D * D
    Pu = (oxt * D - ozt * dxt) * D
    Pv = (oyt * D - ozt * dyt) * D
    ok &= (Pu >= 0.0) & (Pu <= D2) & (Pv >= 0.0) & (Pu + Pv <= D2)
    ok &= ozt * D <= 0.0
    return ok


def _entry_reduce(tm, rows, carry):
    t_best, r_best = carry
    bm = jnp.min(tm, axis=0, keepdims=True)              # (1, RT)
    br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0, keepdims=True)
    upd = bm < t_best                        # strict: first block wins ties
    return jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best)


def _entry_kernel(n_blocks, A_r, H_r, thr_r, o_r, d_r, te_o, row_o):
    o = o_r[...]
    d = d_r[...]
    RT = o.shape[1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (PRIM_BLOCK, RT), 0)

    def body(b, carry):
        t, ok = _tri_block(A_r, H_r, thr_r, o, d, b)
        return _entry_reduce(jnp.where(ok, t, _BIG), iota_p + b * PRIM_BLOCK,
                             carry)

    shape = (1, RT)
    te, row = jax.lax.fori_loop(
        0, n_blocks, body,
        (jnp.full(shape, _BIG, jnp.float32), jnp.zeros(shape, jnp.int32)))
    te_o[...] = te
    row_o[...] = jnp.where(row == _BIGI, 0, row)


def _entry_exit_kernel(n_blocks, A_r, H_r, thr_r, gid_r, o_r, d_r,
                       te_o, row_o, tx_o, xrow_o, tm_s):
    o = o_r[...]
    d = d_r[...]
    RT = o.shape[1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (PRIM_BLOCK, RT), 0)

    def body(b, carry):
        t_best, r_best, g_best = carry
        t, ok = _tri_block(A_r, H_r, thr_r, o, d, b)
        tm = jnp.where(ok, t, _BIG)
        tm_s[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), :] = tm
        bm = jnp.min(tm, axis=0, keepdims=True)
        rows = iota_p + b * PRIM_BLOCK
        br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0, keepdims=True)
        gidB = gid_r[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), :]      # (PB, 1)
        bg = jnp.min(jnp.where(rows == br, gidB, _BIG), axis=0, keepdims=True)
        upd = bm < t_best
        return (jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best),
                jnp.where(upd, bg, g_best))

    shape = (1, RT)
    te, row, wg = jax.lax.fori_loop(
        0, n_blocks, body,
        (jnp.full(shape, _BIG, jnp.float32), jnp.zeros(shape, jnp.int32),
         jnp.full(shape, _BIG, jnp.float32)))

    def body2(b, carry):
        tx_best, x_best = carry
        tmB = tm_s[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), :]
        gidB = gid_r[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), :]
        same = (gidB == wg) & (tmB < _BIG * 0.5)
        me = jnp.where(same, tmB, -_BIG)
        bm = jnp.max(me, axis=0, keepdims=True)
        rows = iota_p + b * PRIM_BLOCK
        br = jnp.min(jnp.where(me == bm, rows, _BIGI), axis=0, keepdims=True)
        upd = bm > tx_best
        return jnp.where(upd, bm, tx_best), jnp.where(upd, br, x_best)

    tx, xrow = jax.lax.fori_loop(
        0, n_blocks, body2,
        (jnp.full(shape, -_BIG, jnp.float32), jnp.zeros(shape, jnp.int32)))
    te_o[...] = te
    row_o[...] = jnp.where(row == _BIGI, 0, row)
    tx_o[...] = tx
    xrow_o[...] = jnp.where(xrow == _BIGI, 0, xrow)


def _exit_kernel(n_blocks, A_r, H_r, thr_r, gid_r, o_r, d_r, wg_r,
                 tx_o, row_o):
    o = o_r[...]
    d = d_r[...]
    wg = wg_r[...]                                       # (1, RT)
    RT = o.shape[1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (PRIM_BLOCK, RT), 0)

    def body(b, carry):
        t_best, r_best = carry
        t, ok = _tri_block(A_r, H_r, thr_r, o, d, b)
        okg = ok & (gid_r[pl.ds(b * PRIM_BLOCK, PRIM_BLOCK), :] == wg)
        tm = jnp.where(okg, t, -_BIG)
        bm = jnp.max(tm, axis=0, keepdims=True)
        rows = iota_p + b * PRIM_BLOCK
        br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=0, keepdims=True)
        upd = bm > t_best
        return jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best)

    shape = (1, RT)
    tx, row = jax.lax.fori_loop(
        0, n_blocks, body,
        (jnp.full(shape, -_BIG, jnp.float32), jnp.zeros(shape, jnp.int32)))
    tx_o[...] = tx
    row_o[...] = jnp.where(row == _BIGI, 0, row)


def _prep(A, H, thr, o, d, extra=()):
    """Pad constants/rays and transpose rays to lane-major (3, Rp)."""
    A = _pad_p(A)
    H = _pad_p(H)
    thr = _pad_p(thr, fill=_BIG)
    R = o.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        extra = tuple(jnp.pad(e, ((0, pad),)) for e in extra)
    return A, H, thr, R, o.T, d.T, tuple(e[None] for e in extra)


def _const_specs(Pt):
    return [
        pl.BlockSpec((Pt, 9), lambda i: (0, 0)),
        pl.BlockSpec((Pt, 3), lambda i: (0, 0)),
        pl.BlockSpec((Pt, 1), lambda i: (0, 0)),
    ]


_RAY_SPEC = pl.BlockSpec((3, RAY_TILE), lambda i: (0, i)) if _PALLAS else None
_OUT_SPEC = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i)) if _PALLAS else None


def _out_shapes(Rp, n):
    kinds = [jnp.float32, jnp.int32] * 2
    return [jax.ShapeDtypeStruct((1, Rp), kinds[i]) for i in range(n)]


def _call_entry(A, H, thr, o, d):
    A, H, thr, R, oT, dT, _ = _prep(A, H, thr, o, d)
    Pt = A.shape[0]
    Rp = oT.shape[1]
    te, row = pl.pallas_call(
        partial(_entry_kernel, Pt // PRIM_BLOCK),
        grid=(Rp // RAY_TILE,),
        in_specs=_const_specs(Pt) + [_RAY_SPEC, _RAY_SPEC],
        out_specs=[_OUT_SPEC, _OUT_SPEC],
        out_shape=_out_shapes(Rp, 2),
        interpret=_interpret(),
    )(A, H, thr, oT, dT)
    return te[0, :R], row[0, :R]


def _call_entry_exit(A, H, thr, gid, o, d):
    A, H, thr, R, oT, dT, _ = _prep(A, H, thr, o, d)
    gid = _pad_p(gid, fill=-3.0)
    Pt = A.shape[0]
    Rp = oT.shape[1]
    te, row, tx, xrow = pl.pallas_call(
        partial(_entry_exit_kernel, Pt // PRIM_BLOCK),
        grid=(Rp // RAY_TILE,),
        in_specs=_const_specs(Pt)
        + [pl.BlockSpec((Pt, 1), lambda i: (0, 0)), _RAY_SPEC, _RAY_SPEC],
        out_specs=[_OUT_SPEC] * 4,
        out_shape=_out_shapes(Rp, 4),
        scratch_shapes=[pltpu.VMEM((Pt, RAY_TILE), jnp.float32)],
        interpret=_interpret(),
    )(A, H, thr, gid, oT, dT)
    return te[0, :R], row[0, :R], tx[0, :R], xrow[0, :R]


def _call_exit(A, H, thr, gid, o, d, win_gid):
    A, H, thr, R, oT, dT, (wg,) = _prep(A, H, thr, o, d, (win_gid,))
    gid = _pad_p(gid, fill=-3.0)
    Pt = A.shape[0]
    Rp = oT.shape[1]
    tx, row = pl.pallas_call(
        partial(_exit_kernel, Pt // PRIM_BLOCK),
        grid=(Rp // RAY_TILE,),
        in_specs=_const_specs(Pt)
        + [pl.BlockSpec((Pt, 1), lambda i: (0, 0)), _RAY_SPEC, _RAY_SPEC,
           _OUT_SPEC],
        out_specs=[_OUT_SPEC, _OUT_SPEC],
        out_shape=_out_shapes(Rp, 2),
        interpret=_interpret(),
    )(A, H, thr, gid, oT, dT, wg)
    return tx[0, :R], row[0, :R]


def _winner_t(AT, HT, o, d, row):
    """Differentiable recompute of the selected row's t (plane formula)."""
    oh = jax.nn.one_hot(row, AT.shape[0], dtype=o.dtype)  # (R, Pt)
    hp = jax.lax.Precision.HIGHEST
    g3 = jax.lax.dot(oh, AT[:, 6:9], precision=hp)        # (R, 3)
    h3 = jax.lax.dot(oh, HT[:, 2:3], precision=hp)[:, 0]
    oz = jnp.sum(o * g3, axis=-1) + h3
    dz = jnp.sum(d * g3, axis=-1)
    dzs = jnp.where(dz == 0.0, 1.0, dz)
    return -oz / dzs


# --- entry: min-t over the triangle segment -------------------------------

@jax.custom_vjp
def tri_entry(AT, HT, thr, o, d):
    """(te, row) of the nearest valid triangle per ray; te=BIG on miss."""
    return _call_entry(AT, HT, thr, o, d)


def _tri_entry_fwd(AT, HT, thr, o, d):
    te, row = _call_entry(AT, HT, thr, o, d)
    return (te, row), (AT, HT, o, d, row, te < _BIG * 0.5)


def _tri_entry_bwd(res, cts):
    AT, HT, o, d, row, hit = res
    ct = jnp.where(hit, cts[0], 0.0)
    _, vjp = jax.vjp(_winner_t, AT, HT, o, d, row)
    gA, gH, go, gd, _ = vjp(ct)
    return gA, gH, jnp.zeros((AT.shape[0], 1), AT.dtype), go, gd


tri_entry.defvjp(_tri_entry_fwd, _tri_entry_bwd)


# --- fused entry + local-group exit ---------------------------------------

@jax.custom_vjp
def tri_entry_exit(AT, HT, thr, gid, o, d):
    """(te, row, tx_local, xrow_local): entry winner plus the farthest valid
    triangle of the entry winner's OWN group (valid exactly when the global
    winner turns out to be this segment's)."""
    return _call_entry_exit(AT, HT, thr, gid, o, d)


def _tri_ee_fwd(AT, HT, thr, gid, o, d):
    out = _call_entry_exit(AT, HT, thr, gid, o, d)
    te, row, tx, xrow = out
    return out, (AT, HT, o, d, row, te < _BIG * 0.5, xrow, tx > -_BIG * 0.5)


def _tri_ee_bwd(res, cts):
    AT, HT, o, d, row, hit_e, xrow, hit_x = res
    ct_te = jnp.where(hit_e, cts[0], 0.0)
    ct_tx = jnp.where(hit_x, cts[2], 0.0)

    def f(AT, HT, o, d):
        return (_winner_t(AT, HT, o, d, row), _winner_t(AT, HT, o, d, xrow))

    _, vjp = jax.vjp(f, AT, HT, o, d)
    gA, gH, go, gd = vjp((ct_te, ct_tx))
    z = jnp.zeros((AT.shape[0], 1), AT.dtype)
    return gA, gH, z, z, go, gd


tri_entry_exit.defvjp(_tri_ee_fwd, _tri_ee_bwd)


# --- exit: max-t within a given group (fallback for huge meshes) ----------

@jax.custom_vjp
def tri_group_exit(AT, HT, thr, gid, o, d, win_gid):
    """(tx, row) of the farthest valid triangle in ``win_gid`` per ray;
    tx=-BIG when the group has no triangle hit."""
    return _call_exit(AT, HT, thr, gid, o, d, win_gid)


def _tri_exit_fwd(AT, HT, thr, gid, o, d, win_gid):
    tx, row = _call_exit(AT, HT, thr, gid, o, d, win_gid)
    return (tx, row), (AT, HT, o, d, row, tx > -_BIG * 0.5)


def _tri_exit_bwd(res, cts):
    AT, HT, o, d, row, hit = res
    ct = jnp.where(hit, cts[0], 0.0)
    _, vjp = jax.vjp(_winner_t, AT, HT, o, d, row)
    gA, gH, go, gd, _ = vjp(ct)
    z = jnp.zeros((AT.shape[0], 1), AT.dtype)
    return gA, gH, z, z, go, gd, jnp.zeros(row.shape, AT.dtype)


tri_group_exit.defvjp(_tri_exit_fwd, _tri_exit_bwd)
