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
:func:`micro_raytracer_tpu.models.tracer.fused_step_reference` exactly;
that function IS the backward: a custom VJP replays it under jax.vjp, so
gradients are the jnp path's gradients while the primal runs fused.
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


def enabled_for(scene, inference: bool = False) -> bool:
    """Default-on for inference paths on TPU (rendering: CLI, HTTP,
    goldens); OFF under differentiation unless forced (MRT_STEP=1) — the
    replay-based VJP costs one extra jnp forward per step, so training
    paths keep the jnp+hit3 route."""
    if not (inference or os.environ.get("MRT_STEP", "") == "1"):
        return False
    return (available() and scene.n_prims > 0 and not scene.has_maps
            and scene.n_lights <= _MAX_LIGHTS
            and _padded_rows(scene.kind_counts) <= pallas_hit3._MAX_SCRATCH_ROWS)


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


def _step_kernel(layout, need_exit, L,
                 fr, ipos, pa, pr, valid, gid, AT, HT, thr, attr, lights,
                 dk_r, o_r, d_r, pwr_r, live_r, A_r, B_r, u_r,
                 o2_o, d2_o, pwr2_o, live2_o, A2_o, B2_o, tx_s):
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
               o, d, pwr, live, A, B, u8):
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
    kern = partial(_step_kernel, layout, need_exit, L)
    o2, d2, pwr2, live2, A2, B2 = pl.pallas_call(
        kern,
        grid=(Rp // RAY_TILE,),
        in_specs=[cspec(fr), cspec(ipos), cspec(pa), cspec(pr), cspec(valid),
                  cspec(gid), cspec(AT), cspec(HT), cspec(thr), cspec(attr),
                  smem, smem,
                  r3, r3, r1, r1, r3, r3, r8],
        out_specs=[r3, r3, r1, r1, r3, r3],
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((scratch_rows, RAY_TILE), jnp.float32)],
        interpret=_interpret(),
    )(fr, ipos, pa, pr, valid, gid, AT, HT, thr, attr, lights, dk,
      oT, dT, pwrT, liveT, AT_r, BT_r, u8)
    return (o2.T[:R], d2.T[:R], pwr2[0, :R], live2[0, :R],
            A2.T[:R], B2.T[:R])


@partial(jax.custom_vjp, nondiff_argnums=())
def _step(scene, frames, decay, o, d, pwr, live_f, A, B, u, u_emit):
    layout = _seg_layout(scene.kind_counts)
    tri_pack = None
    if layout[2]:
        from . import intersect

        tri_pack = intersect.triangle_pack(scene, frames)
    consts, attr, lights = pack_step(scene, frames, tri_pack)
    u8 = jnp.concatenate([u.T, u_emit[None]], axis=0)
    return _call_step(layout, scene.any_refract, scene.n_lights, consts,
                      attr, lights, decay, o, d, pwr, live_f, A, B, u8)


def _step_fwd(scene, frames, decay, o, d, pwr, live_f, A, B, u, u_emit):
    out = _step(scene, frames, decay, o, d, pwr, live_f, A, B, u, u_emit)
    return out, (scene, frames, decay, o, d, pwr, live_f, A, B, u, u_emit)


def _step_bwd(res, cts):
    """Backward = jax.vjp of the jnp reference step with the same inputs.

    The kernel and :func:`tracer.fused_step_reference` compute the same
    function of the same uniforms, so the reference's VJP is this
    kernel's VJP; no (R, P) residuals are saved (remat-style)."""
    scene, frames, decay, o, d, pwr, live_f, A, B, u, u_emit = res
    from ..models import tracer
    from . import intersect

    def f(scene, frames, decay, o, d, pwr, A, B, u, u_emit):
        attrs = intersect.prim_attributes(scene, frames)
        tri_pack = None
        from ..models import schema as _s
        if scene.kind_counts[_s.KIND_TRIANGLE] and \
                intersect._use_tri_mxu(scene.kind_counts[_s.KIND_TRIANGLE]):
            tri_pack = intersect.triangle_pack(scene, frames)
        ray2, A2, B2, live2 = tracer.fused_step_reference(
            scene, frames, attrs, decay, (o, d, pwr, live_f > 0.5), A, B,
            u, u_emit, tri_pack=tri_pack)
        return (ray2[0], ray2[1], ray2[2], A2, B2)

    _, vjp = jax.vjp(f, scene, frames, decay, o, d, pwr, A, B, u, u_emit)
    ct = (cts[0], cts[1], cts[2], cts[4], cts[5])
    gs, gfr, gdk, go, gd, gpwr, gA, gB, gu, gue = vjp(ct)
    return (gs, gfr, gdk, go, gd, gpwr, jnp.zeros_like(live_f), gA, gB,
            gu, gue)


_step.defvjp(_step_fwd, _step_bwd)


def step(scene, frames, decay, ray, A, B, u, u_emit, tri_pack=None):
    """One fused bounce step. ``ray`` = (o, d, pwr, live_bool); returns
    (ray2, A2, B2, live2_bool) exactly like the jnp reference."""
    o, d, pwr, live = ray
    o2, d2, pwr2, live2, A2, B2 = _step(
        scene, frames, jnp.asarray(decay, jnp.float32), o, d, pwr,
        live.astype(jnp.float32), A, B, u, u_emit)
    return (o2, d2, pwr2, live2 > 0.5), A2, B2, live2 > 0.5
