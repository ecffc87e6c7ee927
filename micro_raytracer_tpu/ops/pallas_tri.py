"""Fused Pallas reduction for the triangle segment (third-generation kernel).

The MXU (Woop-transform) triangle sweep in :mod:`intersect` is six
``(R,3)@(3,Pt)`` matmuls — but XLA materializes every (R, Pt) matmul output
in HBM, ~24*Pt bytes/ray/sweep, which caps triangle-heavy scenes around
1 M paths/s regardless of compute. This kernel performs the same sweep with
the matmul outputs, validity tests, and the min/argmin (or group-max)
reduction all inside VMEM: HBM sees only the rays in and one (t, row) pair
out per ray. Per-triangle constants (the composed transform ``o' = G o + h``
from :func:`intersect.triangle_pack`) are tiny — (13, Pt) floats — and stay
resident in VMEM across the whole ray tile.

Semantics are identical to the reference Moller-Trumbore sweep
(rt.rs:361-398): first-occurrence argmin tie-break, ``|det| >= E`` mapped to
the per-triangle ``|d'_z| >= E/(n.n)`` threshold (invalid/padded rows carry
thr = BIG so they never pass), entry = min t, mesh exit = max t within the
winning ``group_id`` (rt.rs:740-772).

Differentiation: the kernels are wrapped in ``custom_vjp``s whose backward
recomputes the *winner's* t analytically — ``t = -(o.g3 + h3)/(d.g3)`` for
the row the kernel selected — and pushes the cotangent through one one-hot
MXU fetch, exactly the gradient the dense sweep's masked-min would produce
(only the argmin row carries gradient).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_BIG = 3.0e38
_BIGI = 2 ** 30
# tile sizes: rays per grid program x triangles per inner block. Tuned on
# TPU v5e (BASELINE.md); env knobs for experiments.
RAY_TILE = int(os.environ.get("MRT_TRI_PALLAS_RT", "256"))
PRIM_BLOCK = int(os.environ.get("MRT_TRI_PALLAS_PB", "512"))
# full (13, Pt) constant table must fit VMEM next to the (RAY_TILE,
# PRIM_BLOCK) intermediates (~16 MB/core): 2^16 rows is ~3.4 MB of
# constants, leaving headroom; larger meshes fall back to the MXU sweep.
MAX_PRIMS = 1 << 16

try:  # pallas import can fail on CPU-only builds of jaxlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
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


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def pack_consts(tri_pack, prim_valid):
    """triangle_pack output -> (A9 (9,Pt), H (3,Pt), thr (1,Pt), gid later).

    ``A9[3k+j, p] = G[p, k, j]`` so ``o'_k = o @ A9[3k:3k+3] + h_k``;
    invalid/degenerate rows get thr = BIG (they can never pass the det
    test), which is how masking reaches the kernel without a bool input.
    """
    G, h, thr, okg = tri_pack
    A9 = jnp.transpose(G, (1, 2, 0)).reshape(9, -1)
    H = h.T
    thr = jnp.where(okg & prim_valid, thr, _BIG)[None]
    return A9, H, thr


def _pad_p(x, pb=PRIM_BLOCK, fill=0.0):
    Pt = x.shape[-1]
    pad = (-Pt) % pb
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                   constant_values=fill)


def _use_mxu_in_kernel() -> bool:
    return os.environ.get("MRT_TRI_PALLAS_MXU", "0") == "1"


def _tri_block(A9, H, thr_r, o, d, b):
    """(t, ok) of prim block ``b`` against the ray tile, (RAY_TILE, PRIM_BLOCK)."""
    sl = pl.ds(b * PRIM_BLOCK, PRIM_BLOCK)
    f32 = jnp.float32

    if _use_mxu_in_kernel():
        def rows(k):
            # geometry matmuls at HIGHEST precision: the TPU MXU truncates
            # f32 inputs to bf16 by default, which breaks the
            # |d'_z| >= E/(n.n) validity window (same trap as fetch_attrs)
            a = A9[pl.ds(3 * k, 3), sl]                   # (3, PB)
            hp = jax.lax.Precision.HIGHEST
            return (jnp.dot(o, a, preferred_element_type=f32, precision=hp),
                    jnp.dot(d, a, preferred_element_type=f32, precision=hp))
    else:
        # K=3 "matmul" as 3 VPU broadcast-FMAs per component: rays live on
        # sublanes as (RT, 1) columns, per-triangle constants on lanes as
        # (1, PB) rows — exact f32, no MXU passes, no layout churn
        oc = [o[:, k:k + 1] for k in range(3)]
        dc = [d[:, k:k + 1] for k in range(3)]

        def rows(k):
            a0 = A9[pl.ds(3 * k, 1), sl]                  # (1, PB)
            a1 = A9[pl.ds(3 * k + 1, 1), sl]
            a2 = A9[pl.ds(3 * k + 2, 1), sl]
            return (oc[0] * a0 + oc[1] * a1 + oc[2] * a2,
                    dc[0] * a0 + dc[1] * a1 + dc[2] * a2)

    oxt, dxt = rows(0)
    oyt, dyt = rows(1)
    ozt, dzt = rows(2)
    hx = H[0:1, sl]
    hy = H[1:2, sl]
    hz = H[2:3, sl]
    thr = thr_r[0:1, sl]
    oxt, oyt, ozt = oxt + hx, oyt + hy, ozt + hz
    ok = jnp.abs(dzt) >= thr                              # |det| >= E
    dzs = jnp.where(ok, dzt, 1.0)
    t = -ozt / dzs
    u = oxt + t * dxt
    v = oyt + t * dyt
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return t, ok


def _entry_kernel(n_blocks, A9, H, thr_r, o_r, d_r, te_o, row_o):
    o = o_r[...]
    d = d_r[...]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (o.shape[0], PRIM_BLOCK), 1)

    def body(b, carry):
        t_best, r_best = carry
        t, ok = _tri_block(A9, H, thr_r, o, d, b)
        tm = jnp.where(ok, t, _BIG)
        bm = jnp.min(tm, axis=1, keepdims=True)
        rows = iota_p + b * PRIM_BLOCK
        br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=1, keepdims=True)
        upd = bm < t_best                       # strict: first block wins ties
        return jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best)

    shape = (o.shape[0], 1)
    te, row = jax.lax.fori_loop(
        0, n_blocks, body,
        (jnp.full(shape, _BIG, jnp.float32), jnp.zeros(shape, jnp.int32)))
    te_o[...] = te
    row_o[...] = jnp.where(row == _BIGI, 0, row)


def _exit_kernel(n_blocks, A9, H, thr_r, gid_r, o_r, d_r, wg_r, tx_o, row_o):
    o = o_r[...]
    d = d_r[...]
    wg = wg_r[...]                                        # (RT, 1) f32
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (o.shape[0], PRIM_BLOCK), 1)

    def body(b, carry):
        t_best, r_best = carry
        t, ok = _tri_block(A9, H, thr_r, o, d, b)
        okg = ok & (gid_r[0:1, pl.ds(b * PRIM_BLOCK, PRIM_BLOCK)] == wg)
        tm = jnp.where(okg, t, -_BIG)
        bm = jnp.max(tm, axis=1, keepdims=True)
        rows = iota_p + b * PRIM_BLOCK
        br = jnp.min(jnp.where(tm == bm, rows, _BIGI), axis=1, keepdims=True)
        upd = bm > t_best
        return jnp.where(upd, bm, t_best), jnp.where(upd, br, r_best)

    shape = (o.shape[0], 1)
    tx, row = jax.lax.fori_loop(
        0, n_blocks, body,
        (jnp.full(shape, -_BIG, jnp.float32), jnp.zeros(shape, jnp.int32)))
    tx_o[...] = tx
    row_o[...] = jnp.where(row == _BIGI, 0, row)


def _pad_rays(o, d, extra=()):
    R = o.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        extra = tuple(jnp.pad(e, ((0, pad), (0, 0))) for e in extra)
    return R, o, d, extra


def _call_entry(A9, H, thr, o, d):
    A9 = _pad_p(A9)
    H = _pad_p(H)
    thr = _pad_p(thr, fill=_BIG)
    Pt = A9.shape[1]
    R, o, d, _ = _pad_rays(o, d)
    Rp = o.shape[0]
    kern = partial(_entry_kernel, Pt // PRIM_BLOCK)
    te, row = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((9, Pt), lambda i: (0, 0)),
            pl.BlockSpec((3, Pt), lambda i: (0, 0)),
            pl.BlockSpec((1, Pt), lambda i: (0, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0)),
                   pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, 1), jnp.int32)],
        interpret=_interpret(),
    )(A9, H, thr, o, d)
    return te[:R, 0], row[:R, 0]


def _call_exit(A9, H, thr, gid, o, d, win_gid):
    A9 = _pad_p(A9)
    H = _pad_p(H)
    thr = _pad_p(thr, fill=_BIG)
    gid = _pad_p(gid, fill=-3.0)
    Pt = A9.shape[1]
    R, o, d, (wg,) = _pad_rays(o, d, (win_gid[:, None],))
    Rp = o.shape[0]
    kern = partial(_exit_kernel, Pt // PRIM_BLOCK)
    tx, row = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((9, Pt), lambda i: (0, 0)),
            pl.BlockSpec((3, Pt), lambda i: (0, 0)),
            pl.BlockSpec((1, Pt), lambda i: (0, 0)),
            pl.BlockSpec((1, Pt), lambda i: (0, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0)),
                   pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, 1), jnp.int32)],
        interpret=_interpret(),
    )(A9, H, thr, gid, o, d, wg)
    return tx[:R, 0], row[:R, 0]


def _winner_t(A9, H, o, d, row):
    """Differentiable recompute of the selected row's t (plane formula)."""
    oh = jax.nn.one_hot(row, A9.shape[1], dtype=o.dtype)  # (R, Pt)
    hp = jax.lax.Precision.HIGHEST
    g3 = jax.lax.dot_general(oh, A9[6:9], (((1,), (1,)), ((), ())),
                             precision=hp)                 # (R, 3)
    h3 = jax.lax.dot_general(oh, H[2:3], (((1,), (1,)), ((), ())),
                             precision=hp)[:, 0]
    oz = jnp.sum(o * g3, axis=-1) + h3
    dz = jnp.sum(d * g3, axis=-1)
    dzs = jnp.where(dz == 0.0, 1.0, dz)
    return -oz / dzs


# --- entry: min-t over the triangle segment -------------------------------

@jax.custom_vjp
def tri_entry(A9, H, thr, o, d):
    """(te, row) of the nearest valid triangle per ray; te=BIG on miss."""
    return _call_entry(A9, H, thr, o, d)


def _tri_entry_fwd(A9, H, thr, o, d):
    te, row = _call_entry(A9, H, thr, o, d)
    return (te, row), (A9, H, o, d, row, te < _BIG * 0.5)


def _tri_entry_bwd(res, cts):
    A9, H, o, d, row, hit = res
    ct = jnp.where(hit, cts[0], 0.0)
    _, vjp = jax.vjp(_winner_t, A9, H, o, d, row)
    gA9, gH, go, gd, _ = vjp(ct)
    return gA9, gH, jnp.zeros((1, A9.shape[1]), A9.dtype), go, gd


tri_entry.defvjp(_tri_entry_fwd, _tri_entry_bwd)


# --- exit: max-t within the winning group ---------------------------------

@jax.custom_vjp
def tri_group_exit(A9, H, thr, gid, o, d, win_gid):
    """(tx, row) of the farthest valid triangle in ``win_gid`` per ray;
    tx=-BIG when the group has no triangle hit."""
    return _call_exit(A9, H, thr, gid, o, d, win_gid)


def _tri_exit_fwd(A9, H, thr, gid, o, d, win_gid):
    tx, row = _call_exit(A9, H, thr, gid, o, d, win_gid)
    return (tx, row), (A9, H, o, d, row, tx > -_BIG * 0.5)


def _tri_exit_bwd(res, cts):
    A9, H, o, d, row, hit = res
    ct = jnp.where(hit, cts[0], 0.0)
    _, vjp = jax.vjp(_winner_t, A9, H, o, d, row)
    gA9, gH, go, gd, _ = vjp(ct)
    z = jnp.zeros((1, A9.shape[1]), A9.dtype)
    return gA9, gH, z, z, go, gd, jnp.zeros(row.shape, A9.dtype)


tri_group_exit.defvjp(_tri_exit_fwd, _tri_exit_bwd)
