"""Whole-bounce-step Pallas megakernel (fifth-generation kernel).

After the closest-hit moved into VMEM (pallas_hit3), the CornellBox-class
forward profile was ~40 small XLA fusions per bounce, each near HBM byte
cost on its (R,)-scale operands — the winner fetch, normals, materials,
shadow light math, importance sampling, and the shading fold. This kernel
executes the ENTIRE bounce step (rt.rs:1014-1066 + the affine fold of
rt.rs:956-994) in one pallas_call per bounce: the closest-hit sweep, the
one-hot winner fetch (an in-kernel MXU dot against a packed (P, 24)
attribute table), per-kind normals incl. the box missing-`else` quirk,
material scalars, per-light occlusion sweeps and direct lighting,
reflect/refract importance sampling, and the fold update. The scan carry —
a handful of dense lane-major (1, R)/(3, R) rows — is the only per-bounce
HBM traffic.

Stochastic draws are INPUTS (the jnp caller passes the same
counter-derived uniforms it would use itself), so the kernel's output is
the same function of the same randomness as the jnp step: equivalence is
testable, not statistical.

Scope: untextured scenes (`has_maps` falls back to the split path — texel
gathers don't belong in VMEM loops), up to 4 lights, scene rows bounded by
the hit3 scratch. Semantics mirror
:func:`micro_raytracer_tpu.models.tracer.fused_step_reference` exactly.

Differentiation (sixth-generation): the training forward runs a variant of
the same kernel that additionally emits per-bounce *residuals* — the winner
row, exit row, entry/exit t and the per-light occlusion bits, ~6 scalars
per ray. The backward is a second Pallas megakernel that recomputes the
whole step SWEEP-FREE from those residuals (attributes via one-hot MXU
fetch, the winner's t analytically per kind — the same trick as
pallas_hit3's custom VJP) and evaluates ``jax.vjp`` of that replay *inside
the kernel body*, so the cotangent math is machine-derived and fused into
one VMEM-resident kernel. Geometry cotangents flow exclusively through the
fetched attribute matrix (its columns are built from the same scene leaves
as the sweep tables, so the chain-rule totals are identical); the sweep
tables themselves get zero cotangent except the triangle Woop rows AT/HT.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..models import schema
from .linalg import EPS
from . import pallas_hit3, pallas_tri
from .pallas_hit3 import _padded_rows, _seg_layout
from .pallas_tri import _BIG, PRIM_BLOCK, RAY_TILE, _interpret

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

_MAX_LIGHTS = 4


def available() -> bool:
    env = os.environ.get("MRT_STEP", "")
    if env == "0" or not _PALLAS:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# The backward kernel's replay holds two one-hot (P_pad, RT) operands plus
# the fetched intermediates live in VMEM; bound the scene rows tighter than
# the forward's sweep scratch.
_MAX_GRAD_ROWS = int(os.environ.get("MRT_STEP_GRAD_ROWS", "2048"))


def enabled_for(scene, inference: bool = False) -> bool:
    """Default-on on TPU for inference AND training paths (the backward
    megakernel differentiates the step in-kernel). ``MRT_STEP_GRAD=0``
    keeps the megakernel for rendering only; ``MRT_STEP=0`` disables it
    entirely, ``MRT_STEP=1`` forces it (interpret mode off-TPU)."""
    ok = (available() and scene.n_prims > 0 and not scene.has_maps
          and scene.n_lights <= _MAX_LIGHTS
          and _padded_rows(scene.kind_counts) <= pallas_hit3._MAX_SCRATCH_ROWS)
    if not ok:
        return False
    if inference or os.environ.get("MRT_STEP", "") == "1":
        return True
    # training opt-in while the backward kernel is being tuned: correct and
    # TPU-validated, but not yet faster than the jnp+hit3 route
    return (os.environ.get("MRT_STEP_GRAD", "0") == "1"
            and _padded_rows(scene.kind_counts) <= _MAX_GRAD_ROWS)


# ATTR column layout (P_pad, 24)
_C_FR, _C_IP, _C_NA, _C_PR = 0, 9, 12, 15
_C_ALB, _C_RGH, _C_MET, _C_GLS, _C_OPA, _C_EMI = 16, 19, 20, 21, 22, 23
_NCOL = 24


def pack_step(scene, frames, tri_pack):
    """Sweep tables (pallas_hit3.pack_scene) + the packed attribute matrix
    + the light table. All differentiable leaves flow through."""
    consts = pallas_hit3.pack_scene(scene, frames, tri_pack)
    P = scene.n_prims
    m = scene.mat_id
    # per-row object-space normal source: pa for sphere/plane/box rows,
    # the raw cross-product normal for triangle rows (rt.rs:459-466)
    na = scene.prim_a
    n_tri = scene.kind_counts[schema.KIND_TRIANGLE]
    if n_tri:
        s = scene.seg(schema.KIND_TRIANGLE)
        e0 = scene.prim_b[s] - scene.prim_a[s]
        e1 = scene.prim_c[s] - scene.prim_a[s]
        n_raw = jnp.stack([e0[:, 1] * e1[:, 2] - e0[:, 2] * e1[:, 1],
                           e0[:, 2] * e1[:, 0] - e0[:, 0] * e1[:, 2],
                           e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0]], -1)
        na = jnp.concatenate([na[:s.start], n_raw], axis=0)
    attr = jnp.concatenate([
        frames.reshape(P, 9), scene.inst_pos, na, scene.prim_r[:, None],
        scene.mat_albedo[m], scene.mat_rough[m][:, None],
        scene.mat_metal[m][:, None], scene.mat_glass[m][:, None],
        scene.mat_opacity[m][:, None], scene.mat_emit[m][:, None],
    ], axis=1)
    P_pad = consts[5].shape[0]  # gid is padded over the tri region
    if attr.shape[0] < P_pad:
        attr = jnp.pad(attr, ((0, P_pad - attr.shape[0]), (0, 0)))
    L = scene.n_lights
    if L:
        from . import linalg

        ldirn = -linalg.normalize(scene.light_dir)
        lights = jnp.concatenate([
            scene.light_pos, ldirn,
            scene.light_is_dir.astype(jnp.float32)[:, None],
            scene.light_pwr[:, None], scene.light_color], axis=1)  # (L, 11)
    else:
        lights = jnp.zeros((1, 11), jnp.float32)
    return consts, attr, lights


def _rows3(att, c):
    return att[c:c + 3, :]


def _dot3(a, b):
    return a[0:1] * b[0:1] + a[1:2] * b[1:2] + a[2:3] * b[2:3]


def _matvec_rows(att, v):
    """(3,RT) = M @ v with M the fetched 3x3 frame rows (att[0:9])."""
    out = []
    for k in range(3):
        out.append(att[3 * k:3 * k + 1] * v[0:1]
                   + att[3 * k + 1:3 * k + 2] * v[1:2]
                   + att[3 * k + 2:3 * k + 3] * v[2:3])
    return jnp.concatenate(out, axis=0)


def _safe_norm_rows(v, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(v, v), eps))
    return v * inv


def _normal_rows(layout, att, p, row):
    """World-space normal from fetched attribute rows (rt.rs:776-793),
    mirroring intersect.normal_from_attrs including the box quirk."""
    segs, tri_start, n_tri = layout
    ip = _rows3(att, _C_IP)
    hp = ip + _matvec_rows(att, p - ip)
    pa = _rows3(att, _C_NA)

    n_sph = hp - ip
    n_pln = pa
    sizes = jnp.where(pa == 0.0, 1.0, pa)
    q = (hp - ip) * (2.0 / sizes)
    qx, qy, qz = q[0:1], q[1:2], q[2:3]
    ix1, ix_1 = jnp.abs(qx - 1.0) < EPS, jnp.abs(qx + 1.0) < EPS
    iy1, iy_1 = jnp.abs(qy - 1.0) < EPS, jnp.abs(qy + 1.0) < EPS
    iz1, iz_1 = jnp.abs(qz - 1.0) < EPS, jnp.abs(qz + 1.0) < EPS
    zero = jnp.zeros_like(qx)
    one = jnp.ones_like(qx)
    base_x = jnp.where(ix1, one, jnp.where(ix_1, -one, zero))
    base_y = jnp.where(ix1 | ix_1, zero,
                       jnp.where(iy1, one, jnp.where(iy_1, -one, zero)))
    # z test NOT chained to x/y (missing `else`, rt.rs:435)
    anyz = iz1 | iz_1
    n_box = jnp.concatenate([
        jnp.where(anyz, zero, base_x),
        jnp.where(anyz, zero, base_y),
        jnp.where(iz1, one, jnp.where(iz_1, -one, zero))], axis=0)
    n_tri_ = pa

    n_obj = n_tri_
    bounds = [(kind, s + c) for kind, s, c in segs]
    for kind, end in reversed(bounds):
        nk = {schema.KIND_SPHERE: n_sph, schema.KIND_PLANE: n_pln,
              schema.KIND_BOX: n_box}[kind]
        n_obj = jnp.where(row < end, nk, n_obj)
    n = _safe_norm_rows(_matvec_rows(att, n_obj))
    return jnp.where(jnp.isfinite(n), n, 0.0)


def _sphere_rand_rows(n, rough, u1, u2):
    ct = jnp.clip(1.0 - 2.0 * u1, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = u2 * (2.0 * 3.14159265358979323846)
    v = jnp.concatenate([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=0)
    return _safe_norm_rows(n + rough * v)


def _pow32(x):
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return x16 * x16


def _step_kernel(layout, need_exit, L, train,
                 fr, ipos, pa, pr, valid, gid, AT, HT, thr, attr, lights,
                 dk_r, o_r, d_r, pwr_r, live_r, A_r, B_r, u_r,
                 o2_o, d2_o, pwr2_o, live2_o, A2_o, B2_o, *rest):
    if train:
        (te_o, tx_o, row_o, xrow_o), rest = rest[:4], rest[4:]
        if L:
            lok_o, rest = rest[0], rest[1:]
    (tx_s,) = rest
    o = o_r[...]
    d = d_r[...]
    pwr = pwr_r[...]
    live = live_r[...] > 0.5
    A = A_r[...]
    B = B_r[...]
    u = u_r[...]
    dk = dk_r[0, 0]                                        # SMEM scalar
    RT = o.shape[1]
    P_pad = attr.shape[0]
    hp_prec = jax.lax.Precision.HIGHEST

    te, row, _, tx, xrow = pallas_hit3.sweep_closest(
        layout, need_exit, fr, ipos, pa, pr, valid, gid, AT, HT, thr,
        o, d, tx_s)
    hit = te < _BIG * 0.5
    live_i = live & hit

    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (P_pad, RT), 0)

    def fetch(r):
        oh = (iota_rows == r).astype(jnp.float32)           # (P_pad, RT)
        return jax.lax.dot_general(attr[...], oh, (((0,), (0,)), ((), ())),
                                   precision=hp_prec)       # (24, RT)

    atE = fetch(row)
    te_f = jnp.where(live_i, te, 1.0)
    p_e = o + d * te_f
    n_e = _normal_rows(layout, atE, p_e, row)
    alb_e = _rows3(atE, _C_ALB)
    rgh_e = atE[_C_RGH:_C_RGH + 1]
    met_e = atE[_C_MET:_C_MET + 1]
    opa_e = atE[_C_OPA:_C_OPA + 1]
    emi_e = atE[_C_EMI:_C_EMI + 1]

    # per-light shadow occlusion from the entry hit (rt.rs:1027-1046);
    # the light table lives in SMEM so components read as true scalars
    # (Mosaic cannot concatenate offset (1,1) vector slices)
    def light_vec(li, p):
        is_dir = lights[li, 6] > 0.5
        return jnp.concatenate([
            jnp.where(is_dir, lights[li, 3], lights[li, 0] - p[0:1]),
            jnp.where(is_dir, lights[li, 4], lights[li, 1] - p[1:2]),
            jnp.where(is_dir, lights[li, 5], lights[li, 2] - p[2:3])],
            axis=0)

    light_ok = []
    for li in range(L):
        lvec = light_vec(li, p_e)
        ln = lvec * jax.lax.rsqrt(_dot3(lvec, lvec))
        sorig = p_e + ln * EPS
        te_s, _, _, _, _ = pallas_hit3.sweep_closest(
            layout, False, fr, ipos, pa, pr, valid, gid, AT, HT, thr,
            sorig, ln, tx_s)
        light_ok.append((te_s >= _BIG * 0.5) & live_i)

    if train:
        te_o[...] = te
        tx_o[...] = tx if need_exit else te
        row_o[...] = row
        xrow_o[...] = xrow if need_exit else row
        for li in range(L):
            lok_o[li:li + 1, :] = light_ok[li].astype(jnp.float32)

    # reflect from the entry hit (rt.rs:559-572)
    diel_e = (met_e == 0.0) & (opa_e != 0.0)
    rough_r = jnp.where(diel_e & (u[0:1] < 0.8), 1.0, rgh_e)
    nr = _sphere_rand_rows(n_e, rough_r, u[1:2], u[2:3])
    refl = _safe_norm_rows(d - nr * (2.0 * _dot3(d, nr)))

    if need_exit:
        atX = fetch(xrow)
        tx_f = jnp.where(live_i, tx, 1.0)
        p_x = o + d * tx_f
        n_x = _normal_rows(layout, atX, p_x, xrow)
        diel_x = (atX[_C_MET:_C_MET + 1] == 0.0) & (atX[_C_OPA:_C_OPA + 1] != 0.0)
        rough_f = jnp.where(diel_x & (u[3:4] < 0.8), 1.0,
                            atX[_C_RGH:_C_RGH + 1])
        nf = _sphere_rand_rows(n_x, rough_f, u[4:5], u[5:6])
        eta = 1.0 + 0.5 * atX[_C_GLS:_C_GLS + 1]
        cos = -_dot3(nf, d)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        refr_ok = kk >= 0.0
        k_safe = jnp.where(refr_ok, jnp.maximum(kk, 1e-12), 1.0)
        refr = _safe_norm_rows(d * eta + nf * (cos * eta + jnp.sqrt(k_safe)))
        refr = jnp.where(jnp.isfinite(refr), refr, 0.0)
        choose = (u[6:7] < jnp.minimum(1.0 - opa_e, 0.85)) & refr_ok

        next_dir = jnp.where(choose, refr, refl)
        from_p = jnp.where(choose, p_x, p_e)
        norm_c = jnp.where(choose, n_x, n_e)
        alb_c = jnp.where(choose, _rows3(atX, _C_ALB), alb_e)
        rgh_c = jnp.where(choose, atX[_C_RGH:_C_RGH + 1], rgh_e)
        met_c = jnp.where(choose, atX[_C_MET:_C_MET + 1], met_e)
        emi_c = jnp.where(choose, atX[_C_EMI:_C_EMI + 1], emi_e)
    else:
        next_dir, from_p, norm_c = refl, p_e, n_e
        alb_c, rgh_c, met_c, emi_c = alb_e, rgh_e, met_e, emi_e

    # direct light from the CHOSEN point, occlusion from the entry point —
    # the reference quirk (rt.rs:973-987 vs 1027-1046)
    l_col = jnp.zeros_like(from_p)
    for li in range(L):
        lvec = light_vec(li, from_p)
        ln = lvec * jax.lax.rsqrt(_dot3(lvec, lvec))
        diff = jnp.maximum(_dot3(ln, norm_c), 0.0)
        lrefl = ln - norm_c * (2.0 * _dot3(ln, norm_c))
        spec = _pow32(jnp.maximum(_dot3(d, lrefl), 0.0)) * (1.0 - rgh_c)
        o_col = alb_c * (1.0 - met_c)
        pwr_l = lights[li, 7]
        contrib = jnp.concatenate([
            (o_col[0:1] * diff * lights[li, 8] + spec) * pwr_l,
            (o_col[1:2] * diff * lights[li, 9] + spec) * pwr_l,
            (o_col[2:3] * diff * lights[li, 10] + spec) * pwr_l], axis=0)
        l_col = l_col + jnp.where(light_ok[li], contrib, 0.0)

    # fold update (rt.rs:966-992 composed forward)
    b_emit = u[7:8] < emi_c
    a_f = jnp.where(b_emit, 0.0, pwr * (0.5 + alb_c))
    b_f = jnp.where(b_emit, alb_c, pwr * l_col)
    a_f = jnp.where(live_i, a_f, 1.0)
    b_f = jnp.where(live_i, b_f, 0.0)

    o2_o[...] = from_p + next_dir * EPS                     # Ray::cast
    d2_o[...] = next_dir
    pwr2_o[...] = pwr * dk
    live2_o[...] = live_i.astype(jnp.float32)
    A2_o[...] = A * a_f
    B2_o[...] = B + A * b_f


def _call_step(layout, need_exit, L, consts, attr, lights, decay,
               o, d, pwr, live, A, B, u8, train=False):
    fr, ipos, pa, pr, valid, gid, AT, HT, thr = consts
    AT = pallas_tri._pad_p(AT)
    HT = pallas_tri._pad_p(HT)
    thr = pallas_tri._pad_p(thr, fill=_BIG)
    R = o.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        pwr = jnp.pad(pwr, ((0, pad),))
        live = jnp.pad(live, ((0, pad),))
        A = jnp.pad(A, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        u8 = jnp.pad(u8, ((0, 0), (0, pad)))
    oT, dT, AT_r, BT_r = o.T, d.T, A.T, B.T
    pwrT = pwr[None]
    liveT = live.astype(jnp.float32)[None]
    Rp = oT.shape[1]
    P_pad = gid.shape[0]
    scratch_rows = max(P_pad, 8)
    dk = jnp.asarray(decay, jnp.float32).reshape(1, 1)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    r3 = pl.BlockSpec((3, RAY_TILE), lambda i: (0, i))
    r1 = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i))
    r8 = pl.BlockSpec((8, RAY_TILE), lambda i: (0, i))
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((1, Rp), f32),
                  jax.ShapeDtypeStruct((1, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32)]
    out_specs = [r3, r3, r1, r1, r3, r3]
    if train:
        out_shapes += [jax.ShapeDtypeStruct((1, Rp), f32),
                       jax.ShapeDtypeStruct((1, Rp), f32),
                       jax.ShapeDtypeStruct((1, Rp), jnp.int32),
                       jax.ShapeDtypeStruct((1, Rp), jnp.int32)]
        out_specs += [r1, r1, r1, r1]
        if L:
            out_shapes.append(jax.ShapeDtypeStruct((L, Rp), f32))
            out_specs.append(pl.BlockSpec((L, RAY_TILE), lambda i: (0, i)))
    kern = partial(_step_kernel, layout, need_exit, L, train)
    outs = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=[cspec(fr), cspec(ipos), cspec(pa), cspec(pr), cspec(valid),
                  cspec(gid), cspec(AT), cspec(HT), cspec(thr), cspec(attr),
                  smem, smem,
                  r3, r3, r1, r1, r3, r3, r8],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((scratch_rows, RAY_TILE), jnp.float32)],
        interpret=_interpret(),
    )(fr, ipos, pa, pr, valid, gid, AT, HT, thr, attr, lights, dk,
      oT, dT, pwrT, liveT, AT_r, BT_r, u8)
    o2, d2, pwr2, live2, A2, B2 = outs[:6]
    main = (o2.T[:R], d2.T[:R], pwr2[0, :R], live2[0, :R],
            A2.T[:R], B2.T[:R])
    if not train:
        return main
    # residuals stay lane-major/padded — the backward kernel consumes them
    return main, outs[6:]


# --- sweep-free replay (rows layout) ---------------------------------------
#
# The backward megakernel evaluates jax.vjp of `_step_rows` INSIDE the
# kernel body: the replay recomputes every intermediate of `_step_kernel`
# from the saved residuals without a single sweep, so its machine-derived
# cotangent code is exactly the step's backward, fused in VMEM.

def _fetch_rows(attr, row):
    """One-hot MXU fetch: attr (P,24) selected by row (1,RT) -> (24,RT)."""
    P = attr.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, row.shape[1]), 0)
    oh = (iota == row).astype(jnp.float32)
    return jax.lax.dot_general(attr, oh, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _winner_t_rows(layout, att, o, d, row, want_exit, AT=None, HT=None):
    """Analytic entry/exit t of the winner row from its fetched attributes.

    Rows-layout twin of :func:`pallas_hit3._winner_t_all`, with identical
    guards to `_kind_block` so the value matches the sweep bitwise and the
    gradient is the masked-min's gradient (winner row only). Geometry for
    the non-tri kinds comes entirely out of ``att`` (frame 0:9, inst_pos
    9:12, prim_a 12:15, radius 15); triangles read the Woop rows AT/HT.
    """
    segs, tri_start, n_tri = layout
    ip = _rows3(att, _C_IP)
    na = _rows3(att, _C_NA)
    r_ = att[_C_PR:_C_PR + 1]
    op = ip + _matvec_rows(att, o - ip)
    dp = _matvec_rows(att, d)
    # sphere (rt.rs:299-330)
    oc = op - ip
    a = _dot3(dp, dp)
    bq = 2.0 * _dot3(oc, dp)
    c = _dot3(oc, oc) - r_ * r_
    disc = bq * bq - 4.0 * a * c
    sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
    a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
    t_sph = ((-bq + sq) / a2) if want_exit else ((-bq - sq) / a2)
    # plane (rt.rs:333-358)
    nn = _dot3(na, na)
    inv = jax.lax.rsqrt(jnp.where(nn > 0.0, nn, 1.0))
    nr = na * inv
    ddp = -_dot3(nr, ip)
    dn = _dot3(dp, nr)
    t_pln = -(_dot3(op, nr) + ddp) / jnp.where(dn == 0.0, 1.0, dn)
    # box slabs (rt.rs:401-412)
    lo = hi = None
    for k in range(3):
        dpc, opc, ipc, szc = dp[k:k + 1], op[k:k + 1], ip[k:k + 1], na[k:k + 1]
        mm = 1.0 / jnp.where(dpc == 0.0, 1.0, dpc)
        mm = jnp.where(dpc == 0.0, 1.0 / EPS, mm)
        nnb = (opc - ipc) * mm
        kkb = 0.5 * szc * jnp.abs(mm)
        loc, hic = -nnb - kkb, -nnb + kkb
        lo = loc if lo is None else jnp.maximum(lo, loc)
        hi = hic if hi is None else jnp.minimum(hi, hic)
    t_box = hi if want_exit else lo
    # triangle: Woop plane form (pallas_tri._winner_t), entry == exit
    if n_tri:
        Pt = AT.shape[0]
        row_t = jnp.clip(row - tri_start, 0, Pt - 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (Pt, row.shape[1]), 0)
        oh = (iota == row_t).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        g3 = jax.lax.dot_general(AT[:, 6:9], oh, (((0,), (0,)), ((), ())),
                                 precision=hp)
        h3 = jax.lax.dot_general(HT[:, 2:3], oh, (((0,), (0,)), ((), ())),
                                 precision=hp)
        oz = _dot3(o, g3) + h3
        dz = _dot3(d, g3)
        t_tri = -oz / jnp.where(dz == 0.0, 1.0, dz)
    else:
        t_tri = t_sph
    t = t_tri
    for kind, end in reversed([(k, s + cc) for k, s, cc in segs]):
        tk = {schema.KIND_SPHERE: t_sph, schema.KIND_PLANE: t_pln,
              schema.KIND_BOX: t_box}[kind]
        t = jnp.where(row < end, tk, t)
    return t


def _step_rows(layout, need_exit, L, p, u, live, te_sv, tx_sv, row, xrow,
               lok):
    """Sweep-free bounce step from saved residuals (lane-major rows).

    ``p`` holds the differentiable inputs: attr (P,24), o/d/A/B (3,RT),
    pwr/dk (1,RT), lr (per-light list of 11 (1,RT) rows), AT/HT (tri Woop
    rows). Everything else is control. Mirrors `_step_kernel` op for op;
    the analytic winner-t is pinned to the saved value through
    ``stop_gradient`` so the primal linearization point is the forward
    kernel's exact output.
    """
    attr, o, d = p["attr"], p["o"], p["d"]
    pwr, A, B = p["pwr"], p["A"], p["B"]
    hit = te_sv < _BIG * 0.5
    live_i = live & hit

    atE = _fetch_rows(attr, row)
    te_ad = _winner_t_rows(layout, atE, o, d, row, False,
                           p.get("AT"), p.get("HT"))
    te = te_ad + jax.lax.stop_gradient(te_sv - te_ad)
    te_f = jnp.where(live_i, te, 1.0)
    p_e = o + d * te_f
    n_e = _normal_rows(layout, atE, p_e, row)
    alb_e = _rows3(atE, _C_ALB)
    rgh_e = atE[_C_RGH:_C_RGH + 1]
    met_e = atE[_C_MET:_C_MET + 1]
    opa_e = atE[_C_OPA:_C_OPA + 1]
    emi_e = atE[_C_EMI:_C_EMI + 1]

    diel_e = (met_e == 0.0) & (opa_e != 0.0)
    rough_r = jnp.where(diel_e & (u[0:1] < 0.8), 1.0, rgh_e)
    nr = _sphere_rand_rows(n_e, rough_r, u[1:2], u[2:3])
    refl = _safe_norm_rows(d - nr * (2.0 * _dot3(d, nr)))

    if need_exit:
        atX = _fetch_rows(attr, xrow)
        tx_ad = _winner_t_rows(layout, atX, o, d, xrow, True,
                               p.get("AT"), p.get("HT"))
        tx = tx_ad + jax.lax.stop_gradient(tx_sv - tx_ad)
        tx_f = jnp.where(live_i, tx, 1.0)
        p_x = o + d * tx_f
        n_x = _normal_rows(layout, atX, p_x, xrow)
        diel_x = (atX[_C_MET:_C_MET + 1] == 0.0) & \
                 (atX[_C_OPA:_C_OPA + 1] != 0.0)
        rough_f = jnp.where(diel_x & (u[3:4] < 0.8), 1.0,
                            atX[_C_RGH:_C_RGH + 1])
        nf = _sphere_rand_rows(n_x, rough_f, u[4:5], u[5:6])
        eta = 1.0 + 0.5 * atX[_C_GLS:_C_GLS + 1]
        cos = -_dot3(nf, d)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        refr_ok = kk >= 0.0
        k_safe = jnp.where(refr_ok, jnp.maximum(kk, 1e-12), 1.0)
        refr = _safe_norm_rows(d * eta + nf * (cos * eta + jnp.sqrt(k_safe)))
        refr = jnp.where(jnp.isfinite(refr), refr, 0.0)
        choose = (u[6:7] < jnp.minimum(1.0 - opa_e, 0.85)) & refr_ok

        next_dir = jnp.where(choose, refr, refl)
        from_p = jnp.where(choose, p_x, p_e)
        norm_c = jnp.where(choose, n_x, n_e)
        alb_c = jnp.where(choose, _rows3(atX, _C_ALB), alb_e)
        rgh_c = jnp.where(choose, atX[_C_RGH:_C_RGH + 1], rgh_e)
        met_c = jnp.where(choose, atX[_C_MET:_C_MET + 1], met_e)
        emi_c = jnp.where(choose, atX[_C_EMI:_C_EMI + 1], emi_e)
    else:
        next_dir, from_p, norm_c = refl, p_e, n_e
        alb_c, rgh_c, met_c, emi_c = alb_e, rgh_e, met_e, emi_e

    l_col = jnp.zeros_like(from_p)
    for li in range(L):
        lr = p["lr"][li]
        is_dir = lr[6] > 0.5
        lvec = jnp.concatenate([
            jnp.where(is_dir, lr[3], lr[0] - from_p[0:1]),
            jnp.where(is_dir, lr[4], lr[1] - from_p[1:2]),
            jnp.where(is_dir, lr[5], lr[2] - from_p[2:3])], axis=0)
        ln = lvec * jax.lax.rsqrt(_dot3(lvec, lvec))
        diff = jnp.maximum(_dot3(ln, norm_c), 0.0)
        lrefl = ln - norm_c * (2.0 * _dot3(ln, norm_c))
        spec = _pow32(jnp.maximum(_dot3(d, lrefl), 0.0)) * (1.0 - rgh_c)
        o_col = alb_c * (1.0 - met_c)
        contrib = jnp.concatenate([
            (o_col[0:1] * diff * lr[8] + spec) * lr[7],
            (o_col[1:2] * diff * lr[9] + spec) * lr[7],
            (o_col[2:3] * diff * lr[10] + spec) * lr[7]], axis=0)
        l_col = l_col + jnp.where(lok[li], contrib, 0.0)

    b_emit = u[7:8] < emi_c
    a_f = jnp.where(b_emit, 0.0, pwr * (0.5 + alb_c))
    b_f = jnp.where(b_emit, alb_c, pwr * l_col)
    a_f = jnp.where(live_i, a_f, 1.0)
    b_f = jnp.where(live_i, b_f, 0.0)

    o2 = from_p + next_dir * EPS
    d2 = next_dir
    pwr2 = pwr * p["dk"]
    A2 = A * a_f
    B2 = B + A * b_f
    return o2, d2, pwr2, A2, B2


# --- backward megakernel ----------------------------------------------------

def _misc_rows(L):
    """Rows in the accumulated misc-cotangent block: 11 per light + decay."""
    n = L * 11 + 1
    return n + ((-n) % 8)


def _bwd_kernel(layout, need_exit, L, n_tri, *refs):
    refs = list(refs)
    attr_r = refs.pop(0)
    if n_tri:
        ATv_r = refs.pop(0)
        HTv_r = refs.pop(0)
    lights_s = refs.pop(0)
    dk_s = refs.pop(0)
    (o_r, d_r, pwr_r, live_r, A_r, B_r, u_r,
     te_r, tx_r, row_r, xrow_r) = refs[:11]
    refs = refs[11:]
    if L:
        lok_r = refs.pop(0)
    (cto_r, ctd_r, ctp_r, ctA_r, ctB_r,
     do_o, dd_o, dp_o, dA_o, dB_o, dattr_o) = refs[:11]
    refs = refs[11:]
    if n_tri:
        dAT_o, dHT_o = refs[:2]
        refs = refs[2:]
    (dmisc_o,) = refs

    u = u_r[...]
    live = live_r[...] > 0.5
    ones = jnp.ones_like(te_r[...])
    lr = [[lights_s[li, j] * ones for j in range(11)] for li in range(L)]
    lok = [lok_r[li:li + 1, :] > 0.5 for li in range(L)] if L else []
    p = {"attr": attr_r[...], "o": o_r[...], "d": d_r[...],
         "pwr": pwr_r[...], "A": A_r[...], "B": B_r[...],
         "lr": lr, "dk": dk_s[0, 0] * ones}
    if n_tri:
        p["AT"] = ATv_r[...]
        p["HT"] = HTv_r[...]

    primal = partial(_step_rows, layout, need_exit, L,
                     u=u, live=live, te_sv=te_r[...], tx_sv=tx_r[...],
                     row=row_r[...], xrow=xrow_r[...], lok=lok)
    _, vjp = jax.vjp(lambda pp: primal(pp), p)
    g = vjp((cto_r[...], ctd_r[...], ctp_r[...], ctA_r[...], ctB_r[...]))[0]

    do_o[...] = g["o"]
    dd_o[...] = g["d"]
    dp_o[...] = g["pwr"]
    dA_o[...] = g["A"]
    dB_o[...] = g["B"]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dattr_o[...] = jnp.zeros_like(dattr_o)
        dmisc_o[...] = jnp.zeros_like(dmisc_o)
        if n_tri:
            dAT_o[...] = jnp.zeros_like(dAT_o)
            dHT_o[...] = jnp.zeros_like(dHT_o)

    dattr_o[...] += g["attr"]
    if n_tri:
        dAT_o[...] += g["AT"]
        dHT_o[...] += g["HT"]
    # per-ray partials of the broadcast scalars; reduced outside the kernel
    for li in range(L):
        for j in range(11):
            k = li * 11 + j
            dmisc_o[k:k + 1, :] += g["lr"][li][j]
    dmisc_o[L * 11:L * 11 + 1, :] += g["dk"]


def _call_step_bwd(layout, need_exit, L, AT, HT, attr, lights, dk,
                   res_lane, cts):
    """Run the backward megakernel; returns cotangents for
    (attr, lights, dk, o, d, pwr, A, B, AT, HT)."""
    n_tri = layout[2]
    AT = pallas_tri._pad_p(AT)
    HT = pallas_tri._pad_p(HT)
    (oT, dT, pwrT, liveT, AT_r, BT_r, u8,
     te, tx, row, xrow, lok) = res_lane
    Rp = oT.shape[1]
    ct_o, ct_d, ct_pwr, ct_A, ct_B = cts
    R = ct_o.shape[0]
    pad = (-R) % RAY_TILE
    if pad:
        ct_o = jnp.pad(ct_o, ((0, pad), (0, 0)))
        ct_d = jnp.pad(ct_d, ((0, pad), (0, 0)))
        ct_pwr = jnp.pad(ct_pwr, ((0, pad),))
        ct_A = jnp.pad(ct_A, ((0, pad), (0, 0)))
        ct_B = jnp.pad(ct_B, ((0, pad), (0, 0)))
    ctoT, ctdT, ctAT, ctBT = ct_o.T, ct_d.T, ct_A.T, ct_B.T
    ctpT = ct_pwr[None]
    P_pad = attr.shape[0]
    MR = _misc_rows(L)
    dk_s = jnp.asarray(dk, jnp.float32).reshape(1, 1)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    r3 = pl.BlockSpec((3, RAY_TILE), lambda i: (0, i))
    r1 = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i))
    r8 = pl.BlockSpec((8, RAY_TILE), lambda i: (0, i))
    rL = pl.BlockSpec((max(L, 1), RAY_TILE), lambda i: (0, i))
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    f32 = jnp.float32

    in_specs = [cspec(attr)]
    args = [attr]
    if n_tri:
        in_specs += [cspec(AT), cspec(HT)]
        args += [AT, HT]
    in_specs += [smem, smem]
    args += [lights, dk_s]
    in_specs += [r3, r3, r1, r1, r3, r3, r8, r1, r1, r1, r1]
    args += [oT, dT, pwrT, liveT, AT_r, BT_r, u8, te, tx, row, xrow]
    if L:
        in_specs.append(rL)
        args.append(lok)
    in_specs += [r3, r3, r1, r3, r3]
    args += [ctoT, ctdT, ctpT, ctAT, ctBT]

    out_specs = [r3, r3, r1, r3, r3, acc((P_pad, 24))]
    out_shapes = [jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((1, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((P_pad, 24), f32)]
    if n_tri:
        out_specs += [acc(AT.shape), acc(HT.shape)]
        out_shapes += [jax.ShapeDtypeStruct(AT.shape, f32),
                       jax.ShapeDtypeStruct(HT.shape, f32)]
    out_specs.append(acc((MR, RAY_TILE)))
    out_shapes.append(jax.ShapeDtypeStruct((MR, RAY_TILE), f32))

    kern = partial(_bwd_kernel, layout, need_exit, L, n_tri)
    outs = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*args)
    d_oT, d_dT, d_pwrT, d_AT_, d_BT_, d_attr = outs[:6]
    rest = outs[6:]
    if n_tri:
        d_AT_w, d_HT_w = rest[:2]
        rest = rest[2:]
    else:
        d_AT_w, d_HT_w = jnp.zeros_like(AT), jnp.zeros_like(HT)
    (d_misc,) = rest
    dm = jnp.sum(d_misc, axis=1)
    d_lights = dm[:L * 11].reshape(L, 11) if L else jnp.zeros_like(lights)
    d_dk = dm[L * 11]
    return (d_attr, d_lights, d_dk, d_oT.T[:R], d_dT.T[:R], d_pwrT[0, :R],
            d_AT_.T[:R], d_BT_.T[:R], d_AT_w, d_HT_w)


# --- differentiable wrapper -------------------------------------------------

_STEP_FNS: dict = {}


def _get_step_fn(layout, need_exit, L):
    key = (layout, need_exit, L)
    if key in _STEP_FNS:
        return _STEP_FNS[key]

    @jax.custom_vjp
    def fn(consts, attr, lights, dk, o, d, pwr, live_f, A, B, u8):
        return _call_step(layout, need_exit, L, consts, attr, lights, dk,
                          o, d, pwr, live_f, A, B, u8)

    def fn_fwd(consts, attr, lights, dk, o, d, pwr, live_f, A, B, u8):
        out, resid = _call_step(layout, need_exit, L, consts, attr, lights,
                                dk, o, d, pwr, live_f, A, B, u8, train=True)
        te, tx, row, xrow = resid[:4]
        lok = resid[4] if L else te  # placeholder when L == 0
        R = o.shape[0]
        pad = (-R) % RAY_TILE
        if pad:
            o_p = jnp.pad(o, ((0, pad), (0, 0)))
            d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            pwr_p = jnp.pad(pwr, ((0, pad),))
            live_p = jnp.pad(live_f, ((0, pad),))
            A_p = jnp.pad(A, ((0, pad), (0, 0)))
            B_p = jnp.pad(B, ((0, pad), (0, 0)))
            u8_p = jnp.pad(u8, ((0, 0), (0, pad)))
        else:
            o_p, d_p, pwr_p, live_p, A_p, B_p, u8_p = \
                o, d, pwr, live_f, A, B, u8
        res_lane = (o_p.T, d_p.T, pwr_p[None], live_p[None], A_p.T, B_p.T,
                    u8_p, te, tx, row, xrow, lok)
        res = (consts[6], consts[7], attr, lights, dk, res_lane, consts)
        return out, res

    def fn_bwd(res, cts):
        AT, HT, attr, lights, dk, res_lane, consts = res
        ct = (cts[0], cts[1], cts[2], cts[4], cts[5])  # live2 ct dropped
        (d_attr, d_lights, d_dk, d_o, d_d, d_pwr, d_A, d_B,
         d_AT, d_HT) = _call_step_bwd(layout, need_exit, L, AT, HT, attr,
                                      lights, dk, res_lane, ct)
        d_consts = (jnp.zeros_like(consts[0]), jnp.zeros_like(consts[1]),
                    jnp.zeros_like(consts[2]), jnp.zeros_like(consts[3]),
                    jnp.zeros_like(consts[4]), jnp.zeros_like(consts[5]),
                    d_AT[:AT.shape[0]][:consts[6].shape[0]],
                    d_HT[:HT.shape[0]][:consts[7].shape[0]],
                    jnp.zeros_like(consts[8]))
        live_ct = jnp.zeros(d_pwr.shape, d_pwr.dtype)
        u8_ct = jnp.zeros((8, d_pwr.shape[0]), d_pwr.dtype)
        return (d_consts, d_attr[:attr.shape[0]], d_lights, d_dk,
                d_o, d_d, d_pwr, live_ct, d_A, d_B, u8_ct)

    fn.defvjp(fn_fwd, fn_bwd)
    _STEP_FNS[key] = fn
    return fn


def step(scene, frames, decay, ray, A, B, u, u_emit, tri_pack=None):
    """One fused bounce step. ``ray`` = (o, d, pwr, live_bool); returns
    (ray2, A2, B2, live2_bool) exactly like the jnp reference. Forward is
    the bounce-step megakernel; backward is the sweep-free backward
    megakernel (residual replay differentiated in-kernel)."""
    o, d, pwr, live = ray
    layout = _seg_layout(scene.kind_counts)
    tri_pack_ = tri_pack
    if tri_pack_ is None and layout[2]:
        from . import intersect

        tri_pack_ = intersect.triangle_pack(scene, frames)
    consts, attr, lights = pack_step(scene, frames, tri_pack_)
    u8 = jnp.concatenate([u.T, u_emit[None]], axis=0)
    fn = _get_step_fn(layout, scene.any_refract, scene.n_lights)
    o2, d2, pwr2, live2, A2, B2 = fn(
        consts, attr, lights, jnp.asarray(decay, jnp.float32), o, d, pwr,
        live.astype(jnp.float32), A, B, u8)
    return (o2, d2, pwr2, live2 > 0.5), A2, B2, live2 > 0.5
