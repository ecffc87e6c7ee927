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

Scope: up to 4 lights, scene rows bounded by the hit3 scratch, texture
atlases up to 64K texels. Semantics mirror
:func:`micro_raytracer_tpu.models.tracer.fused_step_reference` exactly.

Textured scenes (seventh-generation): rt.rs:468-548's uv map and the
rt.rs:618-628 nearest texel fetch run INSIDE the kernel — uv per kind
(sphere needs a hand-rolled Cephes atan2; Mosaic lowers no atan), then a
two-stage one-hot fetch from a VMEM-resident channel-planar atlas: one
MXU dot against a one-hot over 128-texel blocks picks the ray's block,
a sublane mask-reduce picks the texel. The atlas is stored as an exact
bf16 hi+lo split so default-precision (bf16) matmuls reconstruct f32
texels to ~2^-17 — no HIGHEST pass on the texture path. Texture scenes
run the kernel for inference only (the backward megakernel carries no
texel terms; training falls back to jnp+hit3).

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
# texture-path bounds: 128-texel atlas blocks kept in VMEM (512 blocks =
# 64K texels = a 768 KB split table) and SMEM meta rows
_MAX_TEX_BLOCKS = 512
_MAX_TEXTURES = 16

# Ray-tile sizes for the step kernels (lanes per grid program). The
# backward kernel was long pinned at 1024 lanes by the component
# relayout's Mosaic shape-cast limit; with (RT/128, 128) blocks it tiles
# at 8192 like the forward — 144 grid programs instead of 1152 per
# CornellBox sample, bwd kernel 2.73 -> 1.82 ms/sample measured (the
# per-program floor and the O(RT)-vreg transposed-one-hot scatter were
# half the kernel). Env knobs for experiments.
_TILE_FWD = int(os.environ.get("MRT_STEP_RT", "512"))
# per-step backward (scan path, comp bundles relayouted OUTSIDE the
# kernel): VMEM-bound at wide tiles, keeps the tuned 1024
_TILE_BWD = int(os.environ.get("MRT_STEP_BWD_RT", "1024"))
# whole-trace backward (in-kernel relayout, (RT/128, 128) blocks): 16384
# compiles since the same_row merge shrank the kernel (it failed at 8192's
# round-3 body) and measures 2.32 -> 2.15 ms/sample on the headline
_TILE_TBWD = int(os.environ.get("MRT_TRACE_BWD_RT", "16384"))
_TILE_PAD = max(_TILE_FWD, _TILE_BWD)


def _vmem_limit_bytes():
    """Parsed ``MRT_VMEM_LIMIT`` (bytes) or None. The ONE place the env
    var is read: it serves double duty as the pallas
    ``CompilerParams.vmem_limit_bytes`` override (:func:`_cparams`) and,
    at 75%, as :func:`_pick_tile`'s dense-rows working-set budget — the
    two must move together or wide-tile experiments clamp inconsistently.
    """
    v = os.environ.get("MRT_VMEM_LIMIT", "")
    if not v:
        return None
    try:
        return int(v)
    except ValueError:
        raise ValueError(
            f"MRT_VMEM_LIMIT must be an integer byte count, got {v!r}")


def _same_row(layout, need_exit):
    """True when the exit winner row provably equals the entry winner row
    on every lane: refractive scenes with no triangle segment.

    The scene compiler assigns one ``group_id`` per (object, instance)
    and only MESH instances emit more than one primitive row per group
    (compiler.py ``gid = group_counter`` loop), so with no triangles every
    group is a single row and the group-exit max-reduction can only
    return the entry winner. The forward fetch elision, the merged
    entry/exit backward (:func:`_step_comp_bwd_same`), and the residual
    xrow slot reuse (it carries the refract draw instead) ALL rest on
    this — any future multi-row non-mesh grouping must revisit every
    caller of this helper."""
    return need_exit and layout[2] == 0


def _cparams():
    """Per-kernel Mosaic compiler params: ``MRT_VMEM_LIMIT`` (bytes)
    raises the 16 MB scoped-VMEM ceiling for wide-tile experiments —
    per-kernel via pallas, so it needs no backend flags (the remote
    compile helper ignores client XLA_FLAGS)."""
    v = _vmem_limit_bytes()
    if v is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=v)


def _pick_tile(want, Rp, dense_rows=0, tex_cols=0):
    """Largest lane tile <= `want` dividing Rp (Rp is always a multiple of
    128 via `lane_pad`, so small test batches don't pay full-tile padding).

    Wide sphere/plane/box tables shrink the tile: the dense in-kernel
    sweep keeps ~10 (dense_rows, RT) f32 intermediates live on the scoped
    VMEM stack (measured 19 MB at 1000x512 vs the 16 MB limit), so
    Instance-class scenes overflow at the default tile — clamp so the
    sweep working set stays under ~12 MB. Triangles don't count: their
    sweep is super-block-tiled (pallas_tri) and never materializes
    (P_tri, RT)."""
    budget = 12 * 2**20
    v = _vmem_limit_bytes()
    if v is not None:
        budget = int(v * 0.75)
    t = want
    while t > 128 and dense_rows * t * 40 > budget:
        t //= 2
    # texel-fetch working set (block one-hot (Thp, RT) + sublane select
    # (128, RT) + channel blocks (384, RT)) scales with the tile; the
    # 24 MB bound is calibrated on the measured-good dof point
    # (Thp=128 @ 8192 lanes) — bigger atlases step down, floor 1024
    # (the pre-round-4 textured tile)
    while t > 1024 and tex_cols and (tex_cols + 512) * 4 * t > 24 * 2**20:
        t //= 2
    while Rp % t:
        t //= 2
    return t


def _dense_rows_eff(layout, need_exit):
    """Dense-kind rows the step kernels materialize at once: a
    cull-eligible sphere segment sweeps in ``_CB``-row candidate blocks
    (pallas_hit3.sphere_cull_sweep, entry-only), so it contributes _CB
    rows to the VMEM stack budget, not its full length — Instance.json
    (P=1000) was clamped to 256-lane tiles by the old full-segment
    accounting."""
    sph = pallas_hit3._sph_cull_rows(layout)
    rows = 0
    for kind, s, c in layout[0]:
        if (sph is not None and not need_exit
                and kind == schema.KIND_SPHERE and s == sph[0]):
            rows += pallas_hit3._CB
        else:
            rows += c
    return rows


def _pick_rt_fwd(layout, need_exit, tex, Rp):
    """Forward/trace lane tile, consistent with the kernel's sphere-cull
    gate: the optimistic _CB-row budget applies ONLY when the kernel will
    actually cull at the resulting tile (RT a 1024-multiple, culling not
    env-disabled) — otherwise the kernel runs the full dense sweep and
    the tile must be budgeted for it (reviewed round 5: the mismatch
    left a (1000, RT) working set unclamped whenever the gate and the
    budget disagreed, e.g. MRT_TRI_NOCULL=1 or 512-lane batches)."""
    want = _fwd_tile_want(layout, tex)
    # the texel budget was calibrated on the BLOCK count: the j-major
    # layout's shape[1] is 6*Thp (see _pack_tex), normalize back
    tc = 0
    if tex is not None:
        tc = (tex[0].shape[1] // 6 if tex[0].shape[0] == 128
              else tex[0].shape[1])
    rows_eff = _dense_rows_eff(layout, need_exit)
    RT = _pick_tile(want, Rp, rows_eff, tex_cols=tc)
    full = sum(c for _k, _s, c in layout[0])
    if rows_eff != full \
            and not pallas_hit3.sph_cull_active(layout, need_exit, RT):
        RT = _pick_tile(want, Rp, full, tex_cols=tc)
    return RT


def _fwd_tile_want(layout, tex):
    """Forward/trace kernel lane-tile policy (post component-form tail):
    fewer grid programs win — each costs its scf.if regions and pipeline
    ramp — so tri-free untextured scenes run 8192-lane tiles (CornellBox
    fwd 80 -> 107M rays/s; plateau at 8192, BASELINE.md round 3).
    Triangle scenes keep 1024 (the candidate-list sweep scratch scales
    with the tile; Mesh fails to fit beyond it), and textured scenes too
    (the texel select's cross-sublane reduce result cannot shape-cast to
    component form above one native vreg — Mosaic layout limitation).
    ``MRT_STEP_RT`` overrides for experiments. The 16384 want is really
    "as wide as `_pick_tile`'s dense-rows VMEM budget allows": CornellBox
    (16 rows) runs at exactly 16384 and measured 1.10 -> 0.78 ms/sample
    inference there; wider wants clamp back to the same tile. Textured
    tiles >1024 COMPILE since the texel-fetch layout legalization
    (`_tex_sample_comp.recomp`) but measure SLOWER (dof inference 45.4M
    at 1024 vs 40.4M at 8192, careful slopes; train OOMs at 8192 and
    runs 28-29M at 4096/8192+raised-limit vs ~31M at 1024) — the
    (Thp + 128 + 384, RT) texel one-hot working set grows with the tile
    and beats the grid-program savings, so textured stays 1024."""
    if "MRT_STEP_RT" in os.environ:
        return _TILE_FWD
    # sphere-cull scenes (Instance class) also keep 1024: the candidate
    # scheme's per-lane-group demand union widens with the tile until
    # culling stops biting (the tri scenes' measured behavior)
    if pallas_hit3._sph_cull_rows(layout) is not None:
        return 1024
    return 1024 if (layout[2] or tex is not None) else 16384


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
    ok = (available() and scene.n_prims > 0
          and scene.n_lights <= _MAX_LIGHTS
          and _padded_rows(scene.kind_counts) <= pallas_hit3._MAX_SCRATCH_ROWS)
    if not ok:
        return False
    if scene.has_maps:
        # textured scenes run the kernel while the split atlas fits VMEM.
        # Training included: texture VALUES are not trainable leaves
        # (shard.TRAINABLE_FIELDS) and the nearest-texel fetch
        # (rt.rs:618-628) is piecewise-constant in every differentiable
        # input (floor index), so the backward replay re-runs the fetch
        # as a constant and the remaining map terms (albedo multiply,
        # scalar-map replacement) transpose exactly like the jnp path's.
        n_blocks = -(-scene.tex_data.shape[0] // 128)
        if not (n_blocks <= _MAX_TEX_BLOCKS
                and scene.tex_offset.shape[0] <= _MAX_TEXTURES):
            return False
        if inference or os.environ.get("MRT_STEP", "") == "1":
            return True
        return (os.environ.get("MRT_STEP_GRAD", "1") == "1"
                and _padded_rows(scene.kind_counts) <= _MAX_GRAD_ROWS)
    if inference or os.environ.get("MRT_STEP", "") == "1":
        return True
    # training default-on: the component-form backward megakernel matches
    # the jnp+hit3 gradients bitwise on TPU (tools/grad_check.py) and is
    # faster end-to-end (16.4M vs 15.5M fwd+bwd rays/s at the bench
    # config). MRT_STEP_GRAD=0 keeps the megakernel for rendering only.
    return (os.environ.get("MRT_STEP_GRAD", "1") == "1"
            and _padded_rows(scene.kind_counts) <= _MAX_GRAD_ROWS)


# ATTR column layout (P_pad, 24); textured scenes append 6 map-id
# columns (+2 pad) at _C_MAP for a 32-column table
_C_FR, _C_IP, _C_NA, _C_PR = 0, 9, 12, 15
_C_ALB, _C_RGH, _C_MET, _C_GLS, _C_OPA, _C_EMI = 16, 19, 20, 21, 22, 23
_NCOL = 24
_C_MAP = 24


def _pack_tex(scene):
    """Channel-planar split texture atlas for the in-kernel fetch.

    Returns ``(TEXT (768, Thp) f32, meta (T, 3) int32)``: the flat atlas
    padded to ``Th = ceil(N/128)`` blocks of 128 texels; row ``c*128+j``
    of TEXT holds the bf16-rounded channel ``c`` of texel ``h*128+j`` at
    column ``h``, rows 384+ the bf16 residual (texel = hi + lo exactly to
    ~2^-17, so the kernel's default-precision bf16 matmuls lose nothing
    visible). ``meta`` rows are (offset, w, h) per texture, read from
    SMEM in the kernel.
    """
    td = scene.tex_data                                     # (N, 3)
    N = td.shape[0]
    Th = -(-N // 128)
    # pad block columns to a SUBLANE multiple (8), not a lane multiple:
    # Thp is only ever the contraction (K) dim of the block-pick dot and
    # the sublane dim of its one-hot — a 128-pad made dof.json's 32-block
    # atlas build a 4x wider (Thp, RT) one-hot than the atlas has blocks
    Thp = -(-Th // 8) * 8
    tdp = jnp.pad(td, ((0, Th * 128 - N), (0, 0)))
    plan = tdp.reshape(Th, 128, 3).transpose(2, 1, 0).reshape(384, Th)
    hi = plan.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (plan - hi).astype(jnp.bfloat16).astype(jnp.float32)
    if Thp <= 128:
        # j-major layout for the REVERSED two-stage fetch (round 5):
        # stage 1 contracts the within-block position j (K=128) into a
        # (6*Thp, RT) intermediate and stage 2 mask-reduces over the Thp
        # block rows — when the atlas has FEWER blocks than the 128
        # texels per block (dof: Thp=32) this halves the stage
        # intermediates vs the block-major order ((384+128, RT) blk +
        # sel working set). Column c*2*Thp + p*Thp + h holds channel c,
        # hi/lo part p, block h; the samplers discriminate the layout by
        # shape[0] == 128.
        hip = jnp.pad(hi, ((0, 0), (0, Thp - Th))).reshape(3, 128, Thp)
        lop = jnp.pad(lo, ((0, 0), (0, Thp - Th))).reshape(3, 128, Thp)
        TEXT = jnp.stack([hip, lop], axis=1) \
            .transpose(2, 0, 1, 3).reshape(128, 6 * Thp)
    else:
        TEXT = jnp.pad(jnp.concatenate([hi, lo], axis=0),
                       ((0, 0), (0, Thp - Th)))
    meta = jnp.stack([scene.tex_offset, scene.tex_w, scene.tex_h],
                     axis=1).astype(jnp.int32)              # (T, 3)
    return TEXT, meta


def _gf_min() -> int:
    """Attribute-row threshold for the group-keyed fetch: below it the
    flat (P_pad, RT) one-hot is cheap enough; beyond it the one-hot
    construction alone costs O(P_pad/8) vregs per fetch (over half of
    Mesh.json's 17 ms/sample forward, measured). Read per call so tests
    can force the group path on small interpret-mode scenes."""
    return int(os.environ.get("MRT_GF_MIN", "512"))


_GF_MAX_GROUPS = 128

# two-level attribute fetch: rows per block (the within-block one-hot's
# sublane count / the stage-1 MXU K dim)
_F2B = 64


def _pack_gattr(scene, attr):
    """Per-group attribute table for the group-keyed fetch.

    Row ``g`` holds the attr row of group ``g``'s first primitive —
    every attr column except the object-space normal source (col
    ``_C_NA``:``_C_NA``+3, per-triangle) is constant across a group's
    rows, so the kernels fetch shared columns by the winner GROUP (a
    one-hot over a handful of rows) and take the normal from the sweep's
    winner reduction instead. None when the flat fetch is cheaper or the
    group table itself would be large (Instance-class scenes)."""
    G = scene.n_groups
    if attr.shape[0] < _gf_min() or not 0 < G <= _GF_MAX_GROUPS:
        return None
    first = jnp.argmax(scene.group_id[None, :]
                       == jnp.arange(G, dtype=scene.group_id.dtype)[:, None],
                       axis=1)
    g = attr[first]
    pad = (-G) % 8
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
    return g


def pack_step(scene, frames, tri_pack):
    """Sweep tables (pallas_hit3.pack_scene) + the packed attribute matrix
    + the light table + the split texture atlas (None for untextured
    scenes). All differentiable leaves flow through."""
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
    cols = [
        frames.reshape(P, 9), scene.inst_pos, na, scene.prim_r[:, None],
        scene.mat_albedo[m], scene.mat_rough[m][:, None],
        scene.mat_metal[m][:, None], scene.mat_glass[m][:, None],
        scene.mat_opacity[m][:, None], scene.mat_emit[m][:, None],
    ]
    tex = None
    if scene.has_maps:
        cols += [scene.mat_maps[m].astype(jnp.float32),  # exact: small ints
                 jnp.zeros((P, 2), jnp.float32)]
        tex = _pack_tex(scene)
    attr = jnp.concatenate(cols, axis=1)
    P_pad = consts[5].shape[0]  # gid is padded over the tri region
    if attr.shape[0] < P_pad:
        attr = jnp.pad(attr, ((0, P_pad - attr.shape[0]), (0, 0)))
    gattr = _pack_gattr(scene, attr)
    attr2 = None
    if gattr is None and P_pad >= _gf_min():
        # wide table, too many groups for the group fetch (Instance
        # class): ship a block-rearranged copy for the TWO-LEVEL one-hot
        # fetch (see _step_math) — row = hi*_F2B + lo; attr2[j, c*n_hb+b]
        # = attr[b*_F2B + j, c], so stage 1 is one K=_F2B MXU dot and
        # stage 2 an (n_hb, RT) mask-reduce per column
        P2 = -(-P_pad // _F2B) * _F2B
        if attr.shape[0] < P2:
            attr = jnp.pad(attr, ((0, P2 - attr.shape[0]), (0, 0)))
        NC = attr.shape[1]
        n_hb = P2 // _F2B
        attr2 = attr.reshape(n_hb, _F2B, NC).transpose(1, 2, 0) \
            .reshape(_F2B, NC * n_hb)
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
    return consts, attr, gattr, attr2, lights, tex


def _kinds_present(layout):
    """Static set of non-tri kinds in the scene + whether triangles exist.

    The per-ray glue (winner-t, normals, uv) selects between per-kind
    formulas by the winner row's segment; kinds with no rows can never be
    selected, so their formulas — and, in the backward megakernel, their
    machine-derived transposes — compile to nothing. CornellBox-class
    scenes (spheres+planes) drop the box slab/quirk math entirely; the
    values on every selectable row are bit-identical."""
    segs, _tri_start, n_tri = layout
    return {k for k, _s, _c in segs}, bool(n_tri)


def _kind_select(layout, row, values, tri_value, where):
    """Fold the per-kind values into one via the segment select chain.

    ``values``: dict kind -> value for the PRESENT kinds only;
    ``tri_value``: the triangle-region value (or None when no triangles);
    ``where``: the where-combinator matching the value shape (jnp.where
    for single blocks, _vwhere for 3-tuples). The chain seeds with the
    last selectable region's value so one redundant select drops out."""
    segs, _tri_start, n_tri = layout
    bounds = [(k, s + c) for k, s, c in segs]
    if n_tri:
        out = tri_value
    else:
        out = values[bounds[-1][0]]
        bounds = bounds[:-1]
    for kind, end in reversed(bounds):
        out = where(row < end, values[kind], out)
    return out


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
    mirroring intersect.normal_from_attrs including the box quirk.
    Specialized to the kinds present (absent formulas compile to nothing)."""
    kinds, _has_tri = _kinds_present(layout)
    ip = _rows3(att, _C_IP)
    pa = _rows3(att, _C_NA)
    need_hp = bool(kinds & {schema.KIND_SPHERE, schema.KIND_BOX})
    hp = ip + _matvec_rows(att, p - ip) if need_hp else None

    vals = {}
    if schema.KIND_SPHERE in kinds:
        vals[schema.KIND_SPHERE] = hp - ip
    if schema.KIND_PLANE in kinds:
        vals[schema.KIND_PLANE] = pa
    if schema.KIND_BOX in kinds:
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
        vals[schema.KIND_BOX] = jnp.concatenate([
            jnp.where(anyz, zero, base_x),
            jnp.where(anyz, zero, base_y),
            jnp.where(iz1, one, jnp.where(iz_1, -one, zero))], axis=0)

    n_obj = _kind_select(layout, row, vals, pa, jnp.where)
    n = _safe_norm_rows(_matvec_rows(att, n_obj))
    return jnp.where(jnp.isfinite(n), n, 0.0)


_PI = 3.14159265358979323846


def _atan_rows(x):
    """atan for x >= 0, Cephes ``atanf`` range reduction + degree-4
    minimax polynomial (~2 ulp). Mosaic has no atan/atan2 lowering; the
    sphere uv (rt.rs:518-526) needs one in-kernel."""
    big = x > 2.414213562373095
    mid = x > 0.4142135623730950
    xs = jnp.maximum(x, 1e-30)
    r = jnp.where(big, -1.0 / xs, jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    z = r * r
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * r + r
    return p + jnp.where(big, _PI / 2, jnp.where(mid, _PI / 4, 0.0))


def _atan2_rows(y, x):
    """Four-quadrant atan2 on row vectors (atan2(0,0) = 0 like XLA's)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    a = _atan_rows(ay / jnp.maximum(ax, 1e-37))
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def _uv_rows(layout, att, p, row, mapped=None):
    """Texture coordinates from fetched attribute rows (rt.rs:468-548),
    mirroring intersect.uv_from_attrs: sphere spherical map, plane
    negative-wrap fract tiling, box 4x3 cross atlas, triangles 0.
    ``mapped``: static per-kind map presence — see `_uv_comp`."""
    kinds, _has_tri = _kinds_present(layout)
    if mapped is not None:
        kinds = {k for k in kinds if mapped[k]}
    ip = _rows3(att, _C_IP)
    hp = ip + _matvec_rows(att, p - ip)
    rel = hp - ip
    vals = {}
    if schema.KIND_SPHERE in kinds:
        # sphere: unguarded normalize, like the jnp path (degenerate lanes
        # produce garbage uv on both sides; inference-only, no NaN-grad risk)
        inv = jax.lax.rsqrt(jnp.maximum(_dot3(rel, rel), 1e-37))
        u_sph = (0.5
                 + 0.5 * _atan2_rows(rel[0:1] * inv, -(rel[1:2] * inv)) / _PI)
        vals[schema.KIND_SPHERE] = (u_sph, 0.5 - 0.5 * (rel[2:3] * inv))
    if schema.KIND_PLANE in kinds:
        # plane: fract with negative wrap (rt.rs:528-542)
        fx = (hp[0:1] + 0.5) - jnp.trunc(hp[0:1] + 0.5)
        fy = (hp[1:2] + 0.5) - jnp.trunc(hp[1:2] + 0.5)
        vals[schema.KIND_PLANE] = (jnp.where(fx < 0, 1.0 + fx, fx),
                                   jnp.where(fy < 0, 1.0 + fy, fy))
    zero = jnp.zeros_like(rel[0:1])
    if schema.KIND_BOX in kinds:
        # box cross atlas (rt.rs:468-515); pa rows hold the box sizes
        pa = _rows3(att, _C_NA)
        sizes = jnp.where(pa == 0.0, 1.0, pa)
        q = rel * (2.0 / sizes)
        qx, qy, qz = q[0:1], q[1:2], q[2:3]
        faces = [  # (cond_axis, cond_target, u, v) in rt.rs test order
            (qx, 1.0, (0.5 + 0.5 * qy) / 4.0 + 2.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qx, -1.0, (0.5 - 0.5 * qy) / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qy, 1.0, (0.5 - 0.5 * qx) / 4.0 + 3.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qy, -1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qz, 1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 - 0.5 * qy) / 3.0),
            (qz, -1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 + 0.5 * qy) / 3.0 + 2.0 / 3.0),
        ]
        u_box, v_box = zero, zero
        for axis, target, uu, vv in reversed(faces):
            c = jnp.abs(axis - target) < EPS
            u_box = jnp.where(c, uu, u_box)
            v_box = jnp.where(c, vv, v_box)
        vals[schema.KIND_BOX] = (u_box, v_box)
    # triangles: uv = 0 (reference todo!()); unmapped kinds: placeholder
    for k, _s, _c in layout[0]:
        vals.setdefault(k, (zero, zero))
    where2 = lambda c, a, b: (jnp.where(c, a[0], b[0]),
                              jnp.where(c, a[1], b[1]))
    return _kind_select(layout, row, vals, (zero, zero), where2)


def _texel_jmajor(TEXT, hi, lo, rgb):
    """Shared j-major texel selection (see _pack_tex): stage 1 contracts
    the within-block position (K=128), stage 2 mask-reduces the Thp
    block rows, summing the hi/lo parts of the selected block — the
    same two floats the block-major order adds, so selection is
    bitwise-identical. Scalar fetches (rgb=False) slice channel 0's
    2*Thp columns before the dot (a third of the stage-1 work).
    Returns per-channel (1, RT) rows."""
    Thp = TEXT.shape[1] // 6
    RT = lo.shape[1]
    nch = 3 if rgb else 1
    tab = TEXT if rgb else TEXT[:, :2 * Thp]
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, RT), 0)
             == lo).astype(jnp.float32)
    S = jax.lax.dot_general(tab, oh_lo, (((0,), (0,)), ((), ())))
    oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (Thp, RT), 0)
             == hi).astype(jnp.float32)
    return [jnp.sum((S[(2 * c) * Thp:(2 * c + 1) * Thp]
                     + S[(2 * c + 1) * Thp:(2 * c + 2) * Thp]) * oh_hi,
                    axis=0, keepdims=True)
            for c in range(nch)]


def _tex_sample_rows(TEXT, meta, T, tid, u, v, rgb):
    """Nearest-neighbor texel fetch inside the kernel (rt.rs:618-628).

    ``TEXT`` is the channel-planar split atlas from :func:`pack_step`:
    rows [c*128+j] hold bf16-rounded channel c of texel ``h*128+j`` at
    block column h, rows [384+...] the bf16 residual. The flat texel
    index splits as hi=idx>>7 / lo=idx&127; stage 1 fetches the ray's
    128-texel block with one MXU dot against a one-hot over blocks
    (both operands bf16-exact, so the two-term sum reconstructs f32
    texels to ~2^-17 without a HIGHEST-precision pass), stage 2 selects
    within the block by a sublane mask-reduce.
    """
    t = jnp.maximum(tid.astype(jnp.int32), 0)
    zero_i = jnp.zeros_like(t)
    off, w, h = zero_i, zero_i + 1, zero_i + 1
    for k in range(T):  # texture shapes: a handful of SMEM scalars
        sel = t == k
        # the backward path ships meta as f32 (custom_vjp args must be
        # floats); entries are exact small ints either way
        off = jnp.where(sel, meta[k, 0].astype(jnp.int32), off)
        w = jnp.where(sel, meta[k, 1].astype(jnp.int32), w)
        h = jnp.where(sel, meta[k, 2].astype(jnp.int32), h)
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    idx = off + x + y * w
    hi = idx // 128
    lo = idx % 128
    RT = tid.shape[1]
    nch = 3 if rgb else 1
    if TEXT.shape[0] == 128:
        # j-major layout (small atlases) — shared helper
        ch = _texel_jmajor(TEXT, hi, lo, rgb)
        return jnp.concatenate(ch, axis=0) if rgb else ch[0]
    Thp = TEXT.shape[1]
    C = 384 if rgb else 128
    oh = (jax.lax.broadcasted_iota(jnp.int32, (Thp, RT), 0)
          == hi).astype(jnp.float32)
    dot = lambda rows: jax.lax.dot_general(
        rows, oh, (((1,), (0,)), ((), ())))
    blk = dot(TEXT[0:C]) + dot(TEXT[384:384 + C])
    sel_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, RT), 0)
              == lo).astype(jnp.float32)
    ch = [jnp.sum(blk[c * 128:(c + 1) * 128] * sel_lo, axis=0, keepdims=True)
          for c in range(nch)]
    return jnp.concatenate(ch, axis=0) if rgb else ch[0]


def _apply_maps_rows(maps, TEXT, meta, att, u, v, alb, rgh, met, gls, opa,
                     emi):
    """Per-slot texture overrides (rt.rs:811-863): slot 0 multiplies
    albedo by the texel RGB, slots 1-5 replace the scalar with the red
    channel; a -1 map id leaves the base value. Absent slots (static
    ``map_slots``) compile to nothing."""
    slots, T = maps[0], maps[1]
    tid = lambda s: att[_C_MAP + s:_C_MAP + s + 1]
    if slots[0]:
        tv = tid(0)
        rgbv = _tex_sample_rows(TEXT, meta, T, tv, u, v, True)
        alb = jnp.where(tv >= 0.0, alb * rgbv, alb)
    outs = [rgh, met, gls, opa, emi]
    for i, s in enumerate((1, 2, 3, 4, 5)):
        if not slots[s]:
            continue
        tv = tid(s)
        val = _tex_sample_rows(TEXT, meta, T, tv, u, v, False)
        outs[i] = jnp.where(tv >= 0.0, val, outs[i])
    return (alb, *outs)


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


def _comp_fwd_on() -> bool:
    return os.environ.get("MRT_COMP_FWD", "1") == "1"


def _split3(tab):
    """f32 table -> three bf16-REPRESENTABLE f32 parts with
    hi + mid + lo = tab to within half an f32 ulp.

    TPU matmuls truncate f32 inputs to bf16 at DEFAULT precision; HIGHEST
    recovers f32 with a 6-pass (3x3 upper-triangle) product. But every
    dot in these kernels has a 0/1 one-hot on one side — already exact in
    bf16 — so three DEFAULT passes against the nested bf16 split of the
    OTHER side reconstruct the f32 product exactly: each partial product
    is exact, and the three partials' exponents are >=8 bits apart, so
    their f32 sum re-assembles the mantissa losslessly (the texel fetch's
    hi/lo trick, one level deeper). Measured ~13% off the backward
    megakernel vs HIGHEST."""
    hi = tab.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = tab - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r1 - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, lo


_FETCH_PASSES = int(os.environ.get("MRT_FETCH_PASSES", "2"))


def _onehot_dot(tab, oh, dims, passes=None):
    """``dot_general(tab, oh, dims)`` where ``oh`` is a 0/1 one-hot, via
    DEFAULT-precision passes against the nested bf16 split of ``tab``
    (see :func:`_split3`).

    ``MRT_FETCH_PASSES`` picks the accuracy/speed point: 3 passes
    reconstruct the f32 product exactly (bitwise-equal grads vs the jnp
    path); the default 2 passes (hi+mid) carry ~2^-17 relative error —
    invisible in u8 goldens — and drop a third of the fetch+scatter MXU
    time in both megakernels. CAUTION: 2 passes are safe only where the
    result feeds VALUES (shading, cotangent magnitudes). A fetch that
    sets a replay's LINEARIZATION POINT must pass ``passes=3``: grazing
    hits differentiate through ~1/sqrt(disc), so a 2^-17 shift of the
    winner's attributes became an O(1) relative gradient error on
    silhouette lanes (dof.json, ~0.3% of lanes, round-4 debugging)."""
    hi, mid, lo = _split3(tab)
    d = partial(jax.lax.dot_general, dimension_numbers=dims,
                precision=jax.lax.Precision.DEFAULT)
    out = d(hi, oh) + d(mid, oh)
    if (passes or _FETCH_PASSES) >= 3:
        out = out + d(lo, oh)
    return out


def _step_math(layout, need_exit, L, maps, tables, tx_s, dk,
               o, d, pwr, live, A, B, u, want_resid=False,
               emit_kill=False):
    """One full bounce step on lane-major (C, RT) values — the shared body
    of the per-step kernel (:func:`_step_kernel`) and the whole-trace
    kernel (:func:`_trace_kernel`). ``tables`` holds the kernel refs
    ``(fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb, attr, text_r,
    tmeta, lights)``. Returns ``(o2, d2, pwr2, live2f, A2, B2, resid,
    live_hit_f)`` with ``resid = (te, tx, row, xrow, [lok_f32...])`` when
    requested (the backward megakernel's residuals).

    ``emit_kill``: also clear the carry live bit on the emit draw. The
    reference's reverse fold DISCARDS everything deeper than an emit
    termination (rt.rs:966-970); in the forward composition that is
    ``A2 = 0``, which zeroes every later bounce's contribution exactly —
    so killing the lane changes no radiance bit (dead-lane passthrough is
    a=1, b=0 on A2=0) and no gradient (every later cotangent is scaled by
    A=0), but lets the whole-tile dead skip stop paying for bounces the
    fold would throw away. ``live_hit_f`` stays the PRE-kill hit
    liveness (the caller's first-bounce "empty path" test must not see
    the kill).

    Layout split: the sweeps, one-hot fetches and shadow rays run
    LANE-MAJOR (primitive rows on sublanes need the rays on lanes), but
    the per-ray shading/sampling glue — normals, importance sampling,
    refraction, direct light, the fold — is pure elementwise math whose
    (1, RT) rows waste 7/8 of every (8, 128)-tiled vector register. When
    the tile is wide enough for the component relayout (RT a multiple of
    1024 on real TPU), that tail runs in (8, RT/8) component blocks via
    :func:`_step_comp` — the same function the backward megakernel
    replays, with the analytic winner-t reconstruction skipped. Textured
    scenes keep the lane-major tail (the texel fetch is MXU lane-major).
    """
    (fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb, attr, gattr, attr2,
     text_r, tmeta, lights) = tables
    if (maps and not want_resid
            and "notex" in os.environ.get("MRT_STEP_ABLATE", "")):
        # timing ablation, INFERENCE ONLY (enforced by the want_resid
        # guard): training residual rows are sized from the un-ablated
        # maps, so ablating there would desync the residual layout
        maps = None
    RT = o.shape[1]
    P_pad = attr.shape[0]
    C_at = attr.shape[1]
    use_gf = gattr is not None

    sw = pallas_hit3.sweep_closest(
        layout, need_exit, fr, ipos, pa, pr, valid, gid, AT, HT, thr,
        o, d, tx_s, tbb=tbb, live=live, want_na=use_gf,
        at_ref=attr if use_gf else None)
    te, row, wg, tx, xrow = sw[:5]
    hit = te < _BIG * 0.5
    live_i = live & hit

    if "nofetch" in os.environ.get("MRT_STEP_ABLATE", ""):
        def fetch(r):  # timing ablation: skip the one-hot attribute fetch
            return jnp.zeros((C_at, RT), jnp.float32)

        atE = fetch(row)
    elif use_gf:
        # group-keyed attribute fetch: every attr column except the
        # object-space normal source (``na``, col 12:15) is constant
        # across a group's rows — a mesh's hundreds of triangle rows
        # share one material/instance. Fetch the shared columns from the
        # tiny per-group table with a one-hot over the winner GROUP the
        # sweep already reduced, and take ``na`` (the only per-row data)
        # straight out of the sweep's winner reduction. The flat per-row
        # one-hot alone cost O(P_pad/8) vregs per fetch — over half of
        # Mesh.json's forward kernel time.
        na_e, na_x = sw[5], sw[6]
        G_pad = gattr.shape[0]
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (G_pad, RT), 0)
        # miss lanes carry wg = +BIG: map to -1 so no group matches
        # (zero attributes, like a flat fetch of an all-false one-hot)
        wg_i = jnp.where(wg < _BIG * 0.5, wg, -1.0).astype(jnp.int32)
        ohg = (iota_g == wg_i).astype(jnp.float32)
        at_g = _onehot_dot(gattr[...], ohg, (((0,), (0,)), ((), ())))

        def with_na(na3):
            return jnp.concatenate(
                [at_g[:_C_NA], jnp.concatenate(na3, axis=0),
                 at_g[_C_NA + 3:]], axis=0)

        atE = with_na(na_e)

        def fetch(r):  # exit side: same group, exit-winner normal
            return with_na(na_x)
    elif attr2 is not None:
        # TWO-LEVEL one-hot fetch for wide tables with too many groups
        # for the group fetch (Instance class; nofetch ablation put the
        # flat fetch at 72% of Instance.json's sample time): row =
        # hi*_F2B + lo; stage 1 gathers position lo of EVERY block with
        # one K=_F2B MXU dot against a (_F2B, RT) one-hot, stage 2
        # selects the winner block with an (n_hb, RT) mask-reduce per
        # column. Stage 2 is an exact 0/1 select of stage-1 values, so
        # the precision profile equals the flat split-bf16 fetch's.
        n_hb = attr2.shape[1] // C_at
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_F2B, RT), 0)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hb, RT), 0)

        def fetch(r):
            oh_lo = (iota_lo == r % _F2B).astype(jnp.float32)
            t1 = _onehot_dot(attr2[...], oh_lo,
                             (((0,), (0,)), ((), ())))  # (NC*n_hb, RT)
            oh_hi = (iota_hi == r // _F2B).astype(jnp.float32)
            return jnp.concatenate(
                [jnp.sum(t1[c * n_hb:(c + 1) * n_hb] * oh_hi, axis=0,
                         keepdims=True) for c in range(C_at)], axis=0)

        atE = fetch(row)
    else:
        iota_rows = jax.lax.broadcasted_iota(jnp.int32, (P_pad, RT), 0)

        def fetch(r):
            oh = (iota_rows == r).astype(jnp.float32)       # (P_pad, RT)
            return _onehot_dot(attr[...], oh, (((0,), (0,)), ((), ())))

        atE = fetch(row)
    te_f = jnp.where(live_i, te, 1.0)
    p_e = o + d * te_f

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
        if "noshadow" in os.environ.get("MRT_STEP_ABLATE", ""):
            light_ok.append(live_i)  # timing ablation: all lights visible
            continue
        lvec = light_vec(li, p_e)
        ln = lvec * jax.lax.rsqrt(_dot3(lvec, lvec))
        sorig = p_e + ln * EPS
        te_s, _, _, _, _ = pallas_hit3.sweep_closest(
            layout, False, fr, ipos, pa, pr, valid, gid, AT, HT, thr,
            sorig, ln, tx_s, tbb=tbb, live=live_i, occl=True)
        light_ok.append((te_s >= _BIG * 0.5) & live_i)

    resid = None
    if want_resid:
        # texrows (maps only) is appended by the component tail below —
        # the training path for textured scenes always runs it (their
        # forward tile is lane-aligned; asserted there). gfres (group
        # scenes): the sweep-reduced winner group + object-space normal,
        # saved so the backward fetches from the per-group table (see
        # _res_rows). na_e is the EXACT winner-row value (a masked-min
        # reduction, not a dot), so the backward's linearization point
        # is the true table value, like its 3-pass fetches.
        # entry-only scenes only: the backward has no saved exit-side
        # normal, so refractive group scenes keep the flat fetch and
        # must not size/write these rows (reviewed round 5: a need_exit
        # forward saved CR+4 rows while the backward's BlockSpec sized
        # CR without them)
        gfres = [wg] + list(na_e) if use_gf and not need_exit else []
        resid = [te, tx if need_exit else te, row,
                 xrow if need_exit else row,
                 [lk.astype(jnp.float32) for lk in light_ok], [], gfres]

    # no-mesh refractive scenes (see _same_row): skip the exit-side
    # one-hot fetch and reuse the entry bundle (bit-identical: the
    # elided fetch would return the same rows). The residual xrow slot
    # then carries the refract-branch draw instead (the backward's
    # linearization of `choose` — recomputing it in the other kernel
    # could flip near kk == 0 under different fusion).
    same_row = _same_row(layout, need_exit)
    atX = atE if same_row else (fetch(xrow) if need_exit else None)

    if _comp_fwd_on() and (RT % (_SUBL * 128) == 0 or _interpret()):
        # component-form tail: relayout the fetched bundles and the carry
        # once ((C, RT) -> (C*8, RT/8) is a contiguity-preserving reshape
        # Mosaic lowers natively), run the glue at full register width,
        # relayout the outputs back
        W = RT // _SUBL
        cb = lambda x: jnp.reshape(x, (x.shape[0] * _SUBL, W))
        cb1 = lambda x: jnp.reshape(x, (_SUBL, W))
        ones8 = jnp.ones((_SUBL, W), jnp.float32)
        pc = {"o": _v3(cb(o), 0), "d": _v3(cb(d), 0), "pwr": cb1(pwr),
              "A": _v3(cb(A), 0), "B": _v3(cb(B), 0), "dk": dk * ones8,
              "lr": [[lights[li, j] * ones8 for j in range(11)]
                     for li in range(L)],
              "atE": cb(atE)}
        if need_exit and not same_row:
            pc["atX"] = cb(atX)
        ub = cb(u)
        u_c = _u_logical(ub, _att, need_exit)
        live_c = cb1(live.astype(jnp.float32)) > 0.5
        lok_c = [cb1(lk.astype(jnp.float32)) > 0.5 for lk in light_ok]
        rowf = cb1(row.astype(jnp.float32))
        xrowf = (cb1(xrow.astype(jnp.float32))
                 if need_exit and not same_row else rowf)
        want_tex = bool(want_resid and maps)
        out_c = _step_comp(
            layout, need_exit, L, pc, u_c, live_c, cb1(te),
            cb1(tx) if need_exit else cb1(te), rowf, xrowf, lok_c,
            analytic=False, maps=maps,
            text=text_r[...] if maps else None, tmeta=tmeta,
            want_tex=want_tex, same_row=same_row)
        o2c, d2c, pwr2c, A2c, B2c, live_ic, b_emitc, aux_c = out_c
        if same_row and want_resid:
            resid[3] = _uncomp8(aux_c["choose"].astype(jnp.float32))
        if want_tex:
            tex_e, tex_x = aux_c["tex"]

            def tex_rows(tv):
                rows = []
                for s, val in tv:
                    rows += ([_uncomp8(c) for c in val] if s == 0
                             else [_uncomp8(val)])
                return rows

            resid[5] = tex_rows(tex_e) + (tex_rows(tex_x) if need_exit
                                          else [])
        live2c = live_ic & ~b_emitc if emit_kill else live_ic
        return (_uncomp_v3(o2c), _uncomp_v3(d2c), _uncomp8(pwr2c),
                _uncomp8(live2c.astype(jnp.float32)), _uncomp_v3(A2c),
                _uncomp_v3(B2c), resid, live_i.astype(jnp.float32))

    # rows tail: inference-only for textured scenes — the training path
    # saves texel residuals, which only the component tail emits
    assert not (want_resid and maps), \
        "textured training requires the component-form tail"
    n_e = _normal_rows(layout, atE, p_e, row)
    alb_e = _rows3(atE, _C_ALB)
    rgh_e = atE[_C_RGH:_C_RGH + 1]
    met_raw_e = atE[_C_MET:_C_MET + 1]
    met_e = met_raw_e
    opa_e = atE[_C_OPA:_C_OPA + 1]
    emi_e = atE[_C_EMI:_C_EMI + 1]
    if maps:
        # texture overrides at the entry point; the dielectric test below
        # keeps the RAW metal column (material_from_attrs' `metal_scalar`)
        u_uv, v_uv = _uv_rows(layout, atE, p_e, row, maps[2])
        text = text_r[...]
        alb_e, rgh_e, met_e, _, opa_e, emi_e = _apply_maps_rows(
            maps, text, tmeta, atE, u_uv, v_uv,
            alb_e, rgh_e, met_e, atE[_C_GLS:_C_GLS + 1], opa_e, emi_e)

    # reflect from the entry hit (rt.rs:559-572)
    diel_e = (met_raw_e == 0.0) & (opa_e != 0.0)
    ul = _u_logical(u, lambda a, j: a[j:j + 1, :], need_exit)
    rough_r = jnp.where(diel_e & (ul[0] < 0.8), 1.0, rgh_e)
    nr = _sphere_rand_rows(n_e, rough_r, ul[1], ul[2])
    refl = _safe_norm_rows(d - nr * (2.0 * _dot3(d, nr)))

    if need_exit:
        tx_f = jnp.where(live_i, tx, 1.0)
        p_x = o + d * tx_f
        n_x = _normal_rows(layout, atX, p_x, xrow)
        alb_x = _rows3(atX, _C_ALB)
        rgh_x = atX[_C_RGH:_C_RGH + 1]
        met_raw_x = atX[_C_MET:_C_MET + 1]
        met_x = met_raw_x
        gls_x = atX[_C_GLS:_C_GLS + 1]
        opa_x = atX[_C_OPA:_C_OPA + 1]
        emi_x = atX[_C_EMI:_C_EMI + 1]
        if maps:
            ux_uv, vx_uv = _uv_rows(layout, atX, p_x, xrow, maps[2])
            alb_x, rgh_x, met_x, gls_x, opa_x, emi_x = _apply_maps_rows(
                maps, text, tmeta, atX, ux_uv, vx_uv,
                alb_x, rgh_x, met_x, gls_x, opa_x, emi_x)
        diel_x = (met_raw_x == 0.0) & (opa_x != 0.0)
        rough_f = jnp.where(diel_x & (ul[3] < 0.8), 1.0, rgh_x)
        nf = _sphere_rand_rows(n_x, rough_f, ul[4], ul[5])
        eta = 1.0 + 0.5 * gls_x
        cos = -_dot3(nf, d)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        refr_ok = kk >= 0.0
        k_safe = jnp.where(refr_ok, jnp.maximum(kk, 1e-12), 1.0)
        refr = _safe_norm_rows(d * eta + nf * (cos * eta + jnp.sqrt(k_safe)))
        refr = jnp.where(jnp.isfinite(refr), refr, 0.0)
        choose = (ul[6] < jnp.minimum(1.0 - opa_e, 0.85)) & refr_ok
        if same_row and want_resid:
            resid[3] = choose.astype(jnp.float32)

        next_dir = jnp.where(choose, refr, refl)
        from_p = jnp.where(choose, p_x, p_e)
        norm_c = jnp.where(choose, n_x, n_e)
        alb_c = jnp.where(choose, alb_x, alb_e)
        rgh_c = jnp.where(choose, rgh_x, rgh_e)
        met_c = jnp.where(choose, met_x, met_e)
        emi_c = jnp.where(choose, emi_x, emi_e)
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
    b_emit = ul[7] < emi_c
    a_f = jnp.where(b_emit, 0.0, pwr * (0.5 + alb_c))
    b_f = jnp.where(b_emit, alb_c, pwr * l_col)
    a_f = jnp.where(live_i, a_f, 1.0)
    b_f = jnp.where(live_i, b_f, 0.0)

    o2 = from_p + next_dir * EPS                            # Ray::cast
    live2 = live_i & ~b_emit if emit_kill else live_i
    return (o2, next_dir, pwr * dk, live2.astype(jnp.float32),
            A * a_f, B + A * b_f, resid, live_i.astype(jnp.float32))


def _step_kernel(layout, need_exit, L, train, maps, has_tbb, side_mode,
                 fr, ipos, pa, pr, valid, gid, AT, HT, thr, *rest_in):
    tbb = None
    if has_tbb:
        tbb, rest_in = rest_in[0], rest_in[1:]
    attr, rest_in = rest_in[0], rest_in[1:]
    gattr = attr2 = None
    if side_mode == "g":
        gattr, rest_in = rest_in[0], rest_in[1:]
    elif side_mode == "2":
        attr2, rest_in = rest_in[0], rest_in[1:]
    text_r = tmeta = None
    if maps:
        (text_r, tmeta), rest_in = rest_in[:2], rest_in[2:]
    (lights, dk_r, o_r, d_r, pwr_r, live_r, A_r, B_r, u_r,
     o2_o, d2_o, pwr2_o, live2_o, A2_o, B2_o, *rest) = rest_in
    if train:
        (te_o, tx_o, row_o, xrow_o), rest = rest[:4], rest[4:]
        if L:
            lok_o, rest = rest[0], rest[1:]
    (tx_s,) = rest
    dk = dk_r[0, 0]                                        # SMEM scalar

    if not train and os.environ.get("MRT_STEP_SKIP", "1") == "1":
        # whole-tile dead skip: once every lane in this ray tile has
        # terminated, the step is the identity on everything the scan
        # still reads (a=1, b=0 for dead lanes in the jnp reference, so
        # A/B pass through; pwr still decays; o/d values are garbage on
        # both paths and feed nothing live). Sky-heavy scenes kill most
        # paths in the first bounce or two — those tiles skip the sweeps
        # and the entire shading body for the remaining bounces.
        alive = jnp.max(live_r[...]) > 0.0

        # dead-lane passthrough written unconditionally (cheap copies);
        # the live body overwrites it — one scf.if region instead of two
        pwr0 = pwr_r[...]
        o2_o[...] = o_r[...]
        d2_o[...] = d_r[...]
        pwr2_o[...] = pwr0 * dk
        live2_o[...] = jnp.zeros_like(pwr0)
        A2_o[...] = A_r[...]
        B2_o[...] = B_r[...]

        body_gate = pl.when(alive)
    else:
        def body_gate(f):
            return f()

    # hoist every input-window read out of the conditional region
    o = o_r[...]
    d = d_r[...]
    pwr = pwr_r[...]
    live = live_r[...] > 0.5
    A = A_r[...]
    B = B_r[...]
    u = u_r[...]
    tables = (fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb, attr, gattr,
              attr2, text_r, tmeta, lights)

    @body_gate
    def _step_body():
        o2, d2, pwr2, live2f, A2, B2, resid, _ = _step_math(
            layout, need_exit, L, maps, tables, tx_s, dk,
            o, d, pwr, live, A, B, u, want_resid=train)
        if train:
            te, tx, row, xrow, lok = resid[:5]
            te_o[...] = te
            tx_o[...] = tx
            row_o[...] = row
            # same_row scenes store the refract draw in the xrow slot
            # (resid[3] is its f32 mask there — see _step_math)
            xrow_o[...] = xrow.astype(jnp.int32)
            for li in range(L):
                lok_o[li:li + 1, :] = lok[li]
        o2_o[...] = o2
        d2_o[...] = d2
        pwr2_o[...] = pwr2
        live2_o[...] = live2f
        A2_o[...] = A2
        B2_o[...] = B2


def _call_step(layout, need_exit, L, consts, attr, lights, decay,
               oT, dT, pwrT, liveT, AT_r, BT_r, u8, train=False,
               tex=None, maps=None, gattr=None, attr2=None):
    """One kernel invocation on LANE-MAJOR inputs (o/d/A/B as (3, Rp),
    pwr/live as (1, Rp), Rp a multiple of the ray tile). Padding and
    orientation live with the caller so the bounce scan carries dense
    lane-major rows with no per-step transposes. ``tex``/``maps`` enable
    the in-kernel texture path (inference only — the backward megakernel
    carries no texel terms)."""
    assert (tex is None) == (maps is None) and not (train and tex)
    fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb = consts
    AT = pallas_tri._pad_p(AT)
    HT = pallas_tri._pad_p(HT)
    thr = pallas_tri._pad_p(thr, fill=_BIG)
    Rp = oT.shape[1]
    P_pad = gid.shape[0]
    # the exit stash is only written under need_exit; opaque scenes get a
    # minimal scratch so wide lane tiles fit VMEM
    scratch_rows = max(P_pad, 8) if need_exit else 8
    dk = jnp.asarray(decay, jnp.float32).reshape(1, 1)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    RT = _pick_rt_fwd(layout, need_exit, tex, Rp)
    r3 = pl.BlockSpec((3, RT), lambda i: (0, i))
    r1 = pl.BlockSpec((1, RT), lambda i: (0, i))
    NU = n_uni(need_exit)
    r8 = pl.BlockSpec((NU, RT), lambda i: (0, i))
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
            out_specs.append(pl.BlockSpec((L, RT), lambda i: (0, i)))
    side = gattr if gattr is not None else attr2
    side_mode = "g" if gattr is not None else ("2" if attr2 is not None
                                               else None)
    kern = partial(_step_kernel, layout, need_exit, L, train, maps,
                   tbb is not None, side_mode)
    tbb_specs, tbb_args = [], []
    if tbb is not None:
        tbb_specs, tbb_args = \
            [pl.BlockSpec(memory_space=pltpu.SMEM)], [tbb]
    at2_specs, at2_args = [], []
    if side is not None:
        at2_specs, at2_args = [cspec(side)], [side]
    tex_specs, tex_args = [], []
    if tex is not None:
        TEXT, meta = tex
        tex_specs = [cspec(TEXT), smem]
        tex_args = [TEXT, meta]
    outs = pl.pallas_call(
        kern,
        grid=(Rp // RT,),
        in_specs=[cspec(fr), cspec(ipos), cspec(pa), cspec(pr), cspec(valid),
                  cspec(gid), cspec(AT), cspec(HT), cspec(thr)]
                 + tbb_specs + [cspec(attr)] + at2_specs + tex_specs
                 + [smem, smem, r3, r3, r1, r1, r3, r3, r8],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((scratch_rows, RT), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(fr, ipos, pa, pr, valid, gid, AT, HT, thr, *tbb_args, attr, *at2_args,
      *tex_args, lights, dk, oT, dT, pwrT, liveT, AT_r, BT_r, u8)
    if not train:
        return outs
    return outs[:6], outs[6:]


# --- whole-trace megakernel --------------------------------------------------
#
# The per-step scheme (one pallas_call per bounce inside a lax.scan) leaves
# ~60% of the training step in XLA glue: scan-carry HBM round-trips,
# residual stacking (dynamic-update-slices), lane-major <-> component-form
# relayout reshapes and the one-hot fetch/scatter around the backward
# kernel. The whole-trace kernels run ALL bounce+1 steps in ONE pallas_call
# with the carry resident in VMEM scratch: grid = (ray tiles, steps), step
# innermost, so each tile's carry lives in scratch across its K steps.
# Residuals stream straight to their (K, CR, Rp) blocks (no XLA stacking);
# the backward kernel walks the same grid with the step axis reversed,
# carrying cotangents in scratch and doing the winner fetch, the
# component-form relayout, and the attribute scatter in-kernel.

_R_TE, _R_TX, _R_ROW, _R_XROW, _R_LOK = 11, 12, 13, 14, 15


def _gf_res_base(L, need_exit, maps):
    """Row index of the group-fetch residuals [wg | na0 na1 na2] (present
    only when the scene uses the group-keyed attribute fetch)."""
    return _R_LOK + L + _tex_res_rows_side(maps) * (2 if need_exit else 1)


def _res_rows(L, need_exit=False, maps=None, gf=False):
    """Residual rows per step: o(3) d(3) pwr(1) live(1) A(3) te tx row xrow
    + L light-occlusion rows [+ saved texel values, entry then exit side —
    see :func:`_tex_res_rows_side`] [+ winner group and object-space
    normal, ``gf`` scenes — the sweep already reduced both, and saving
    them lets the whole-trace backward fetch attributes from the tiny
    per-group table instead of the flat (P_pad, RT) one-hot: the fetch
    was ~4.7 of Mesh.json's 12.7 ms/sample backward], padded to a
    sublane multiple. ``B`` is not saved: it only ever enters additively
    (B2 = B + A*b), so its value is irrelevant to every cotangent and
    its own cotangent is the constant ctB of the trace output."""
    n = _gf_res_base(L, need_exit, maps) + (4 if gf else 0)
    return n + ((-n) % 8)


def _trace_kernel(layout, need_exit, L, K, train, maps, has_tbb, side_mode,
                  skip, has_c0, want_cout,
                  fr, ipos, pa, pr, valid, gid, AT, HT, thr, *rest):
    rest = list(rest)
    tbb = rest.pop(0) if has_tbb else None
    attr = rest.pop(0)
    gattr = rest.pop(0) if side_mode == "g" else None
    attr2 = rest.pop(0) if side_mode == "2" else None
    text_r = tmeta = None
    if maps:
        text_r, tmeta = rest.pop(0), rest.pop(0)
    lights, dk_r = rest[:2]
    rest = rest[2:]
    if has_c0:
        c0_r, u8_r = rest[:2]
        rest = rest[2:]
    else:
        o0_r, d0_r, u8_r = rest[:3]
        rest = rest[3:]
    A_o, B_o, fl_o = rest[:3]
    rest = rest[3:]
    cout_o = rest.pop(0) if want_cout else None
    res_o = rest.pop(0) if train else None
    carry_s, tx_s = rest
    k = pl.program_id(1)
    dk = dk_r[0, 0]

    @pl.when(k == 0)
    def _init():
        if has_c0:
            # mid-trace segment: resume from the caller's full carry (the
            # compaction between segments permutes lanes live-first)
            carry_s[...] = c0_r[...]
        else:
            one = jnp.ones((1, carry_s.shape[1]), jnp.float32)
            carry_s[0:3, :] = o0_r[...]
            carry_s[3:6, :] = d0_r[...]
            carry_s[6:7, :] = one                           # pwr
            carry_s[7:8, :] = one                           # live
            carry_s[8:9, :] = one                           # A
            carry_s[9:10, :] = one
            carry_s[10:11, :] = one
            carry_s[11:14, :] = jnp.zeros((3, carry_s.shape[1]),
                                          jnp.float32)

    o = carry_s[0:3, :]
    d = carry_s[3:6, :]
    pwr = carry_s[6:7, :]
    live_f = carry_s[7:8, :]
    A = carry_s[8:11, :]
    B = carry_s[11:14, :]
    live = live_f > 0.5
    u = u8_r[0, :, :]
    tables = (fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb, attr, gattr,
              attr2, text_r, tmeta, lights)

    if skip:
        # whole-tile dead skip (see _step_kernel): scratch already holds
        # the passthrough carry, only pwr decays. Train mode writes only
        # the residual LIVE row: the backward kernel gates on it and
        # never reads the rest of a dead tile's residual block
        carry_s[6:7, :] = pwr * dk
        if train:
            res_o[0, 7:8, :] = jnp.zeros_like(res_o[0, 7:8, :])
        body_gate = pl.when(jnp.max(live_f) > 0.0)
    else:
        def body_gate(f):
            return f()

    @body_gate
    def _body():
        o2, d2, pwr2, live2f, A2, B2, resid, live_hit_f = _step_math(
            layout, need_exit, L, maps, tables, tx_s, dk,
            o, d, pwr, live, A, B, u, want_resid=train, emit_kill=True)

        # "empty path" means the PRIMARY ray hit nothing (rt.rs:957-959):
        # record hit-liveness, not the emit-killed carry live
        @pl.when(k == 0)
        def _first():
            fl_o[...] = live_hit_f

        if train:
            te, tx, row, xrow, lok, texres, gfres = resid
            res_o[0, 0:3, :] = o
            res_o[0, 3:6, :] = d
            res_o[0, 6:7, :] = pwr
            res_o[0, 7:8, :] = live_f
            res_o[0, 8:11, :] = A
            res_o[0, _R_TE:_R_TE + 1, :] = te
            res_o[0, _R_TX:_R_TX + 1, :] = tx
            res_o[0, _R_ROW:_R_ROW + 1, :] = row.astype(jnp.float32)
            res_o[0, _R_XROW:_R_XROW + 1, :] = xrow.astype(jnp.float32)
            for li in range(L):
                res_o[0, _R_LOK + li:_R_LOK + li + 1, :] = lok[li]
            base = _R_LOK + L
            for j, trow in enumerate(texres):
                res_o[0, base + j:base + j + 1, :] = trow
            gbase = base + len(texres)
            for j, grow in enumerate(gfres):
                res_o[0, gbase + j:gbase + j + 1, :] = grow
        carry_s[0:3, :] = o2
        carry_s[3:6, :] = d2
        carry_s[6:7, :] = pwr2
        carry_s[7:8, :] = live2f
        carry_s[8:11, :] = A2
        carry_s[11:14, :] = B2

    @pl.when(k == K - 1)
    def _final():
        A_o[...] = carry_s[8:11, :]
        B_o[...] = carry_s[11:14, :]
        if want_cout:
            cout_o[...] = carry_s[...]


def _call_trace(layout, need_exit, L, K, consts, attr, lights, dk,
                o0T, d0T, u8s, train=False, tex=None, maps=None,
                c0=None, want_cout=False, gattr=None, attr2=None):
    """Whole-trace kernel invocation on lane-major primaries (3, Rp) and
    uniforms (K, 8, Rp). Returns (A (3,Rp), B (3,Rp), first_live (1,Rp)
    [, carry (14,Rp) when ``want_cout``][, residuals (K, CR, Rp)]).

    ``c0`` ((14, Rp): o d pwr live A B rows) resumes a trace mid-flight —
    the segmented-compaction path (tracer.trace_fused) splits a trace into
    several calls and packs live lanes first in between; ``o0T``/``d0T``
    are ignored when given (pass the same arrays)."""
    assert (tex is None) == (maps is None)
    fr, ipos, pa, pr, valid, gid, AT, HT, thr, tbb = consts
    AT = pallas_tri._pad_p(AT)
    HT = pallas_tri._pad_p(HT)
    thr = pallas_tri._pad_p(thr, fill=_BIG)
    Rp = o0T.shape[1]
    P_pad = gid.shape[0]
    # the exit stash is only written under need_exit; opaque scenes get a
    # minimal scratch so wide lane tiles fit VMEM
    scratch_rows = max(P_pad, 8) if need_exit else 8
    dk = jnp.asarray(dk, jnp.float32).reshape(1, 1)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i, k: (0,) * arr.ndim)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    RT = _pick_rt_fwd(layout, need_exit, tex, Rp)
    r3 = pl.BlockSpec((3, RT), lambda i, k: (0, i))
    r1 = pl.BlockSpec((1, RT), lambda i, k: (0, i))
    NU = n_uni(need_exit)
    u8spec = pl.BlockSpec((1, NU, RT), lambda i, k: (k, 0, i))
    f32 = jnp.float32
    CR = _res_rows(L, need_exit, maps,
                   gf=gattr is not None and not need_exit)
    r14 = pl.BlockSpec((14, RT), lambda i, k: (0, i))
    out_shapes = [jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((1, Rp), f32)]
    out_specs = [r3, r3, r1]
    if want_cout:
        out_shapes.append(jax.ShapeDtypeStruct((14, Rp), f32))
        out_specs.append(r14)
    if train:
        out_shapes.append(jax.ShapeDtypeStruct((K, CR, Rp), f32))
        out_specs.append(pl.BlockSpec((1, CR, RT), lambda i, k: (k, 0, i)))
    skip = os.environ.get("MRT_STEP_SKIP", "1") == "1"
    side = gattr if gattr is not None else attr2
    side_mode = "g" if gattr is not None else ("2" if attr2 is not None
                                               else None)
    kern = partial(_trace_kernel, layout, need_exit, L, K, train, maps,
                   tbb is not None, side_mode, skip, c0 is not None,
                   want_cout)
    tbb_specs, tbb_args = [], []
    if tbb is not None:
        tbb_specs, tbb_args = \
            [pl.BlockSpec(memory_space=pltpu.SMEM)], [tbb]
    at2_specs, at2_args = [], []
    if side is not None:
        at2_specs, at2_args = [cspec(side)], [side]
    tex_specs, tex_args = [], []
    if tex is not None:
        TEXT, meta = tex
        tex_specs = [cspec(TEXT), smem]
        tex_args = [TEXT, meta]
    if c0 is not None:
        ray_specs, ray_args = [r14], [c0]
    else:
        ray_specs, ray_args = [r3, r3], [o0T, d0T]
    outs = pl.pallas_call(
        kern,
        grid=(Rp // RT, K),
        in_specs=[cspec(fr), cspec(ipos), cspec(pa), cspec(pr), cspec(valid),
                  cspec(gid), cspec(AT), cspec(HT), cspec(thr)]
                 + tbb_specs + [cspec(attr)] + at2_specs + tex_specs
                 + [smem, smem] + ray_specs + [u8spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((14, RT), jnp.float32),
                        pltpu.VMEM((scratch_rows, RT), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(fr, ipos, pa, pr, valid, gid, AT, HT, thr, *tbb_args, attr, *at2_args,
      *tex_args, lights, dk, *ray_args, u8s)
    return outs


# --- sweep-free replay (component form, rays on sublanes x lanes) ----------
#
# The backward megakernel evaluates jax.vjp of `_step_comp` INSIDE the
# kernel body: the replay recomputes every intermediate of `_step_kernel`
# from the saved residuals without a single sweep, so its machine-derived
# cotangent code is exactly the step's backward, fused in VMEM.
#
# Layout: the forward kernel's (1, R) lane-major rows waste 7/8 of every
# vector register on a (8, 128)-tiled VPU — fine where the (P, R) sweep
# dominates, ruinous for the sweep-free backward, which is nothing but
# per-ray glue. Here every per-ray scalar is an (8, W) block (rays on
# sublanes AND lanes; `(C, Rp) -> (C*8, Rp/8)` is a contiguity-preserving
# reshape, so the host-side conversion is free) and 3-vectors are triples
# of such blocks: full register utilization, ~8x fewer vector ops.

_SUBL = 8


def _att(at, c):
    """Per-ray attribute c as an (8, W) block of the (C*8, W) bundle (or
    of a per-component tuple — the whole-trace backward kernel's form)."""
    if isinstance(at, (tuple, list)):
        return at[c]
    return at[c * _SUBL:(c + 1) * _SUBL, :]


def n_uni(need_exit) -> int:
    """Uniform rows per bounce step the kernels consume. Opaque scenes
    (need_exit=False) never read the exit-side draws u3..u6 — the
    dielectric re-roll, exit sphere sample and refract choice exist only
    in the refraction branch (rt.rs:574-589, 1054-1058) — so only
    [u0, u1, u2, u_emit] are packed: half the uniform stack, its HBM
    window DMA, and the compaction payload gathers. The DRAWS are
    unchanged ((R, 7) + emit, same streams); only the packing is."""
    return 8 if need_exit else 4


def _u_logical(u_arr, take, need_exit):
    """Logical 8-slot uniform list from the packed rows (see n_uni)."""
    if need_exit:
        return [take(u_arr, j) for j in range(8)]
    z = take(u_arr, 0) * 0.0                 # DCE'd: never read
    return [take(u_arr, 0), take(u_arr, 1), take(u_arr, 2), z, z, z, z,
            take(u_arr, 3)]


def _v3(at, c):
    return (_att(at, c), _att(at, c + 1), _att(at, c + 2))


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vop(f, *vs):
    return tuple(f(*cs) for cs in zip(*vs))


def _vadd(a, b):
    return _vop(jnp.add, a, b)


def _vsub(a, b):
    return _vop(jnp.subtract, a, b)


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vwhere(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _vmatvec(at, v):
    """M @ v with M the 3x3 frame from attribute columns 0..8."""
    return tuple(_att(at, 3 * k) * v[0] + _att(at, 3 * k + 1) * v[1]
                 + _att(at, 3 * k + 2) * v[2] for k in range(3))


_VN_EPS = 1e-20


@jax.custom_vjp
def _vnorm_safe_cv(v0, v1, v2):
    s = v0 * v0 + v1 * v1 + v2 * v2
    inv = jax.lax.rsqrt(jnp.maximum(s, _VN_EPS))
    return v0 * inv, v1 * inv, v2 * inv


def _vnorm_cv_fwd(v0, v1, v2):
    return _vnorm_safe_cv(v0, v1, v2), (v0, v1, v2)


def _vnorm_cv_bwd(res, cts):
    # hand-derived transpose of normalize: d_v = inv*(ct - out*(out.ct)),
    # with the guarded branch (s <= eps) keeping inv constant. ~2x fewer
    # vector ops than the machine transpose of rsqrt/max/mul — this is the
    # innermost op of the backward megakernel (6 calls per bounce).
    v0, v1, v2 = res
    c0, c1, c2 = cts
    s = v0 * v0 + v1 * v1 + v2 * v2
    inv = jax.lax.rsqrt(jnp.maximum(s, _VN_EPS))
    t = v0 * c0 + v1 * c1 + v2 * c2
    g = jnp.where(s >= _VN_EPS, t * inv * inv, 0.0) * inv
    return (inv * c0 - g * v0, inv * c1 - g * v1, inv * c2 - g * v2)


_vnorm_safe_cv.defvjp(_vnorm_cv_fwd, _vnorm_cv_bwd)


def _vnorm_safe(v, eps=1e-20):
    if eps == _VN_EPS:
        return _vnorm_safe_cv(*v)
    inv = jax.lax.rsqrt(jnp.maximum(_vdot(v, v), eps))
    return _vscale(v, inv)


def _vfinite0(v):
    return tuple(jnp.where(jnp.isfinite(c), c, 0.0) for c in v)


def _normal_comp(layout, at, p, row):
    """Component-form twin of `_normal_rows` (rt.rs:776-793 + box quirk),
    specialized to the kinds present."""
    kinds, _has_tri = _kinds_present(layout)
    ip = _v3(at, _C_IP)
    pa = _v3(at, _C_NA)
    need_hp = bool(kinds & {schema.KIND_SPHERE, schema.KIND_BOX})
    hp = _vadd(ip, _vmatvec(at, _vsub(p, ip))) if need_hp else None

    vals = {}
    if schema.KIND_SPHERE in kinds:
        vals[schema.KIND_SPHERE] = _vsub(hp, ip)
    if schema.KIND_PLANE in kinds:
        vals[schema.KIND_PLANE] = pa
    if schema.KIND_BOX in kinds:
        q = tuple((hp[k] - ip[k])
                  * (2.0 / jnp.where(pa[k] == 0.0, 1.0, pa[k]))
                  for k in range(3))
        ix1, ix_1 = jnp.abs(q[0] - 1.0) < EPS, jnp.abs(q[0] + 1.0) < EPS
        iy1, iy_1 = jnp.abs(q[1] - 1.0) < EPS, jnp.abs(q[1] + 1.0) < EPS
        iz1, iz_1 = jnp.abs(q[2] - 1.0) < EPS, jnp.abs(q[2] + 1.0) < EPS
        zero = jnp.zeros_like(q[0])
        one = jnp.ones_like(q[0])
        base_x = jnp.where(ix1, one, jnp.where(ix_1, -one, zero))
        base_y = jnp.where(ix1 | ix_1, zero,
                           jnp.where(iy1, one, jnp.where(iy_1, -one, zero)))
        # z test NOT chained to x/y (missing `else`, rt.rs:435)
        anyz = iz1 | iz_1
        vals[schema.KIND_BOX] = (jnp.where(anyz, zero, base_x),
                                 jnp.where(anyz, zero, base_y),
                                 jnp.where(iz1, one,
                                           jnp.where(iz_1, -one, zero)))

    # triangle: raw cross-product normal from the attr table (pa rows)
    n_obj = _kind_select(layout, row, vals, pa, _vwhere)
    return _vfinite0(_vnorm_safe(_vmatvec(at, n_obj)))


def _uv_comp(layout, at, p, row, mapped=None):
    """Component-form twin of `_uv_rows` (rt.rs:468-548): sphere spherical
    map (Cephes atan2 — elementwise, shape-agnostic), plane negative-wrap
    fract tiling, box 4x3 cross atlas, triangles 0.

    ``mapped`` (static per-kind bools): kinds with no mapped row skip
    their chain — their lanes' uv feeds a texel fetch whose value is
    discarded (``tv >= 0``), so any placeholder is equivalent. Compiles
    out e.g. the sphere atan2 for dof.json (only the plane is mapped)."""
    kinds, _has_tri = _kinds_present(layout)
    if mapped is not None:
        kinds = {k for k in kinds if mapped[k]}
    ip = _v3(at, _C_IP)
    hp = _vadd(ip, _vmatvec(at, _vsub(p, ip)))
    rel = _vsub(hp, ip)
    vals = {}
    if schema.KIND_SPHERE in kinds:
        inv = jax.lax.rsqrt(jnp.maximum(_vdot(rel, rel), 1e-37))
        u_sph = 0.5 + 0.5 * _atan2_rows(rel[0] * inv, -(rel[1] * inv)) / _PI
        vals[schema.KIND_SPHERE] = (u_sph, 0.5 - 0.5 * (rel[2] * inv))
    if schema.KIND_PLANE in kinds:
        fx = (hp[0] + 0.5) - jnp.trunc(hp[0] + 0.5)
        fy = (hp[1] + 0.5) - jnp.trunc(hp[1] + 0.5)
        vals[schema.KIND_PLANE] = (jnp.where(fx < 0, 1.0 + fx, fx),
                                   jnp.where(fy < 0, 1.0 + fy, fy))
    zero = jnp.zeros_like(rel[0])
    if schema.KIND_BOX in kinds:
        pa = _v3(at, _C_NA)
        q = tuple(rel[k] * (2.0 / jnp.where(pa[k] == 0.0, 1.0, pa[k]))
                  for k in range(3))
        qx, qy, qz = q
        faces = [  # (cond_axis, cond_target, u, v) in rt.rs test order
            (qx, 1.0, (0.5 + 0.5 * qy) / 4.0 + 2.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qx, -1.0, (0.5 - 0.5 * qy) / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qy, 1.0, (0.5 - 0.5 * qx) / 4.0 + 3.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qy, -1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 - 0.5 * qz) / 3.0 + 1.0 / 3.0),
            (qz, 1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 - 0.5 * qy) / 3.0),
            (qz, -1.0, (0.5 + 0.5 * qx) / 4.0 + 1.0 / 4.0,
             (0.5 + 0.5 * qy) / 3.0 + 2.0 / 3.0),
        ]
        u_box, v_box = zero, zero
        for axis, target, uu, vv in reversed(faces):
            c = jnp.abs(axis - target) < EPS
            u_box = jnp.where(c, uu, u_box)
            v_box = jnp.where(c, vv, v_box)
        vals[schema.KIND_BOX] = (u_box, v_box)
    # triangles: uv = 0 (reference todo!()); unmapped kinds: placeholder
    for k, _s, _c in layout[0]:
        vals.setdefault(k, (zero, zero))
    where2 = lambda c, a, b: (jnp.where(c, a[0], b[0]),
                              jnp.where(c, a[1], b[1]))
    return _kind_select(layout, row, vals, (zero, zero), where2)


def _tex_sample_comp(TEXT, meta, T, tid, u, v, rgb):
    """Component-form texel fetch: the index math runs on (8, W) blocks;
    the one-hot block pick and sublane texel select stay lane-major at
    the MXU boundary (see `_tex_sample_rows`)."""
    t = jnp.maximum(tid.astype(jnp.int32), 0)
    zero_i = jnp.zeros_like(t)
    off, w, h = zero_i, zero_i + 1, zero_i + 1
    for k in range(T):  # texture shapes: a handful of SMEM scalars
        sel = t == k
        # f32-cast meta on the backward path; entries are exact ints
        off = jnp.where(sel, meta[k, 0].astype(jnp.int32), off)
        w = jnp.where(sel, meta[k, 1].astype(jnp.int32), w)
        h = jnp.where(sel, meta[k, 2].astype(jnp.int32), h)
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    idx_l = _uncomp8(off + x + y * w)                     # (1, RT)
    hi = idx_l // 128
    lo = idx_l % 128
    RT = idx_l.shape[1]
    jmajor = TEXT.shape[0] == 128
    if jmajor:
        jch = _texel_jmajor(TEXT, hi, lo, rgb)
    else:
        Thp = TEXT.shape[1]
        C = 384 if rgb else 128
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Thp, RT), 0)
              == hi).astype(jnp.float32)
        dot = lambda rows: jax.lax.dot_general(
            rows, oh, (((1,), (0,)), ((), ())))
        blk = dot(TEXT[0:C]) + dot(TEXT[384:384 + C])
        sel_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, RT), 0)
                  == lo).astype(jnp.float32)
    # re-comp to the CALLER's component block shape: the fwd tail uses
    # (8, RT/8) blocks, the backward kernel (RT/128, 128) — both plain
    # reshapes of the (1, RT) lane row, so match the input's shape
    def recomp(row):
        # Mosaic cannot shape-cast a cross-sublane-reduce result beyond
        # one native vreg ((1, RT>1024) -> blocks fails layout
        # inference); a VMEM scratch round-trip materializes the row in
        # the canonical layout first, unlocking wide tiles for textured
        # scenes. Kept off the known-good 1024 path.
        if RT > 8 * 128 and not _interpret():
            def scoped(tmp):
                tmp[...] = row
                return tmp[...]
            row = pl.run_scoped(scoped, pltpu.VMEM(row.shape, row.dtype))
        return jnp.reshape(row, t.shape)

    if jmajor:
        ch = [recomp(r) for r in jch]
    else:
        ch = [recomp(jnp.sum(blk[c * 128:(c + 1) * 128] * sel_lo, axis=0,
                             keepdims=True))
              for c in range(3 if rgb else 1)]
    return tuple(ch) if rgb else ch[0]


def _tex_slots(maps):
    """Present map slots in slot order (0 = albedo rgb, 1-5 scalar)."""
    if not maps:
        return []
    slots, _T = maps[0], maps[1]
    return [s for s in range(6) if slots[s]]


def _tex_res_rows_side(maps):
    """Residual rows one hit side's texel values occupy (3 rgb + 1/scalar).

    Texel VALUES are piecewise-constant in every differentiable input
    (nearest fetch, floor index), so the forward kernel saves them and
    the backward replay applies them as constants — no uv math, no
    (384, RT) atlas blocks in the backward kernel, bit-identical
    gradients (the machine VJP's chain through the fetch was already
    zero)."""
    return sum(3 if s == 0 else 1 for s in _tex_slots(maps))


def _tex_values_comp(maps, TEXT, meta, at, u, v):
    """Fetch the present slots' texel values: [(slot, value)] with a
    3-tuple for slot 0 and a scalar block otherwise."""
    slots, T = maps[0], maps[1]
    out = []
    for s in _tex_slots(maps):
        tv = _att(at, _C_MAP + s)
        out.append((s, _tex_sample_comp(TEXT, meta, T, tv, u, v, s == 0)))
    return out


def _apply_tex_comp(maps, at, texvals, alb, rgh, met, gls, opa, emi):
    """Apply fetched/saved texel values (rt.rs:811-863): slot 0 multiplies
    albedo by the rgb texel, slots 1-5 replace the scalar; -1 map id
    keeps the base value."""
    outs = [rgh, met, gls, opa, emi]
    for s, val in texvals:
        tv = _att(at, _C_MAP + s)
        if s == 0:
            alb = _vwhere(tv >= 0.0, _vop(jnp.multiply, alb, val), alb)
        else:
            outs[s - 1] = jnp.where(tv >= 0.0, val, outs[s - 1])
    return (alb, *outs)


def _apply_maps_comp(maps, TEXT, meta, at, u, v, alb, rgh, met, gls, opa,
                     emi):
    """Component-form twin of `_apply_maps_rows` (rt.rs:811-863)."""
    return _apply_tex_comp(maps, at, _tex_values_comp(maps, TEXT, meta, at,
                                                      u, v),
                           alb, rgh, met, gls, opa, emi)


def _sphere_rand_comp(n, rough, u1, u2):
    ct = jnp.clip(1.0 - 2.0 * u1, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = u2 * (2.0 * 3.14159265358979323846)
    v = (st * jnp.cos(phi), st * jnp.sin(phi), ct)
    return _vnorm_safe(_vadd(n, _vscale(v, rough)))


def _winner_t_comp(layout, at, o, d, row, want_exit, g3=None, h3=None):
    """Analytic entry/exit t of the winner row from its fetched attributes.

    Component-form twin of :func:`pallas_hit3._winner_t_all`, with
    identical guards to `_kind_block` so the value matches the sweep
    bitwise and the gradient is the masked-min's gradient (winner row
    only). Geometry for the non-tri kinds comes entirely out of ``at``
    (frame 0:9, inst_pos 9:12, prim_a 12:15, radius 15); triangles read
    the winner's Woop plane rows ``g3`` (3-tuple)/``h3`` (block),
    pre-fetched by the caller.
    """
    kinds, has_tri = _kinds_present(layout)
    ip = _v3(at, _C_IP)
    na = _v3(at, _C_NA)
    op = _vadd(ip, _vmatvec(at, _vsub(o, ip)))
    dp = _vmatvec(at, d)
    vals = {}
    if schema.KIND_SPHERE in kinds:
        # sphere (rt.rs:299-330)
        r_ = _att(at, _C_PR)
        oc = _vsub(op, ip)
        a = _vdot(dp, dp)
        bq = 2.0 * _vdot(oc, dp)
        c = _vdot(oc, oc) - r_ * r_
        disc = bq * bq - 4.0 * a * c
        sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
        a2 = jnp.where(a == 0.0, 1.0, 2.0 * a)
        vals[schema.KIND_SPHERE] = (((-bq + sq) / a2) if want_exit
                                    else ((-bq - sq) / a2))
    if schema.KIND_PLANE in kinds:
        # plane (rt.rs:333-358)
        nn = _vdot(na, na)
        inv = jax.lax.rsqrt(jnp.where(nn > 0.0, nn, 1.0))
        nr = _vscale(na, inv)
        ddp = -_vdot(nr, ip)
        dn = _vdot(dp, nr)
        vals[schema.KIND_PLANE] = -(_vdot(op, nr) + ddp) / jnp.where(
            dn == 0.0, 1.0, dn)
    if schema.KIND_BOX in kinds:
        # box slabs (rt.rs:401-412)
        lo = hi = None
        for k in range(3):
            dpc, opc, ipc, szc = dp[k], op[k], ip[k], na[k]
            mm = 1.0 / jnp.where(dpc == 0.0, 1.0, dpc)
            mm = jnp.where(dpc == 0.0, 1.0 / EPS, mm)
            nnb = (opc - ipc) * mm
            kkb = 0.5 * szc * jnp.abs(mm)
            loc, hic = -nnb - kkb, -nnb + kkb
            lo = loc if lo is None else jnp.maximum(lo, loc)
            hi = hic if hi is None else jnp.minimum(hi, hic)
        vals[schema.KIND_BOX] = hi if want_exit else lo
    # triangle: Woop plane form (pallas_tri._winner_t), entry == exit
    t_tri = None
    if has_tri:
        oz = _vdot(o, g3) + h3
        dz = _vdot(d, g3)
        t_tri = -oz / jnp.where(dz == 0.0, 1.0, dz)
    return _kind_select(layout, row, vals, t_tri, jnp.where)


def _seg_masks(layout, row):
    """Static-per-kind membership masks of the winner row (plus the
    triangle-region mask), matching `_kind_select`'s chain semantics."""
    segs, _tri_start, n_tri = layout
    masks = {}
    prev_end = None
    for kind, s, c in segs:
        end = s + c
        m = row < end
        if prev_end is not None:
            m = m & (row >= prev_end)
        masks[kind] = m
        prev_end = end
    m_tri = (row >= prev_end) if (n_tri and prev_end is not None) else None
    if n_tri and prev_end is None:
        m_tri = row >= 0  # pure-mesh scene: everything is the tri region
    return masks, m_tri


def _winner_t_bwd_math(layout, want_exit, at, o, d, row, ct, g3, h3):
    """Hand-derived cotangents of the analytic winner-t (rt.rs:299-412 /
    the Woop plane form), replacing the machine transpose of
    `_winner_t_comp` in the backward megakernel. The winner t is a single
    scalar per lane whose value is pinned to the sweep's saved t, so the
    replay needs ONLY this gradient — the hand derivation drops the
    primal-chain and select scaffolding the machine VJP rebuilds
    (measured ~315 -> ~200 vector eqns per side on CornellBox).
    Guard semantics mirror the machine VJP's (zero cotangent through
    `where`-pinned denominators and the sqrt floor); values differ from it
    only by float reassociation."""
    kinds, has_tri = _kinds_present(layout)
    ip = _v3(at, _C_IP)
    na = _v3(at, _C_NA)
    rel = _vsub(o, ip)
    op = _vadd(ip, _vmatvec(at, rel))
    dp = _vmatvec(at, d)
    zero = jnp.zeros_like(ct)
    z3 = (zero, zero, zero)
    ct_op, ct_dp, ct_ip, ct_na = z3, z3, z3, z3
    ct_r = zero
    d_o, d_d = z3, z3
    d_g3, d_h3 = None, None
    masks, m_tri = _seg_masks(layout, row)

    if schema.KIND_SPHERE in kinds:
        ctm = jnp.where(masks[schema.KIND_SPHERE], ct, 0.0)
        r_ = _att(at, _C_PR)
        oc = _vsub(op, ip)
        a = _vdot(dp, dp)
        b = 2.0 * _vdot(oc, dp)
        c_ = _vdot(oc, oc) - r_ * r_
        disc = b * b - 4.0 * a * c_
        sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
        inv_a2 = 1.0 / jnp.where(a == 0.0, 1.0, 2.0 * a)
        s_ = 1.0 if want_exit else -1.0
        t_ad = (-b + s_ * sq) * inv_a2
        g_disc = jnp.where(disc >= 1e-12, ctm * (s_ * inv_a2) * (0.5 / sq),
                           0.0)
        ct_b = -ctm * inv_a2 + g_disc * (2.0 * b)
        ct_a = (jnp.where(a == 0.0, 0.0, -2.0 * ctm * t_ad * inv_a2)
                + g_disc * (-4.0 * c_))
        ct_c = g_disc * (-4.0 * a)
        ct_dp = _vadd(ct_dp, _vadd(_vscale(dp, 2.0 * ct_a),
                                   _vscale(oc, 2.0 * ct_b)))
        ct_oc = _vadd(_vscale(dp, 2.0 * ct_b), _vscale(oc, 2.0 * ct_c))
        ct_op = _vadd(ct_op, ct_oc)
        ct_ip = _vsub(ct_ip, ct_oc)
        ct_r = ct_r + ct_c * (-2.0 * r_)

    if schema.KIND_PLANE in kinds:
        ctm = jnp.where(masks[schema.KIND_PLANE], ct, 0.0)
        nn = _vdot(na, na)
        nn_ok = nn > 0.0
        inv = jax.lax.rsqrt(jnp.where(nn_ok, nn, 1.0))
        nr = _vscale(na, inv)
        dn = _vdot(dp, nr)
        dn_ok = dn != 0.0
        inv_dn = 1.0 / jnp.where(dn_ok, dn, 1.0)
        num = -(_vdot(op, nr) - _vdot(nr, ip))   # -(op.nr + ddp)
        t_ad = num * inv_dn
        ct_num = ctm * inv_dn
        ct_dn = jnp.where(dn_ok, -ctm * t_ad * inv_dn, 0.0)
        ct_op = _vadd(ct_op, _vscale(nr, -ct_num))
        ct_ip = _vadd(ct_ip, _vscale(nr, ct_num))
        ct_dp = _vadd(ct_dp, _vscale(nr, ct_dn))
        ct_nr = _vadd(_vadd(_vscale(op, -ct_num), _vscale(ip, ct_num)),
                      _vscale(dp, ct_dn))
        ct_inv = _vdot(na, ct_nr)
        ct_nn = jnp.where(nn_ok, ct_inv * (-0.5) * inv * inv * inv, 0.0)
        ct_na = _vadd(ct_na, _vadd(_vscale(ct_nr, inv),
                                   _vscale(na, 2.0 * ct_nn)))

    if schema.KIND_BOX in kinds:
        ctm = jnp.where(masks[schema.KIND_BOX], ct, 0.0)
        sgn = 1.0 if want_exit else -1.0     # kkb sign in t = -nnb +/- kkb
        ts, mms, nnbs, kkbs = [], [], [], []
        for k in range(3):
            dpc = dp[k]
            z = dpc == 0.0
            mm = jnp.where(z, 1.0 / EPS, 1.0 / jnp.where(z, 1.0, dpc))
            nnb = (op[k] - ip[k]) * mm
            kkb = 0.5 * na[k] * jnp.abs(mm)
            ts.append(-nnb + sgn * kkb)
            mms.append(mm)
            nnbs.append(nnb)
            kkbs.append(kkb)
        t_box = (jnp.minimum(jnp.minimum(ts[0], ts[1]), ts[2]) if want_exit
                 else jnp.maximum(jnp.maximum(ts[0], ts[1]), ts[2]))
        taken = zero > 1.0                               # all-false
        co, cip, cna, cdp = list(z3), list(z3), list(z3), list(z3)
        for k in range(3):
            ak = (ts[k] == t_box) & ~taken               # first active axis
            taken = taken | ak
            cak = jnp.where(ak, ctm, 0.0)
            co[k] = cak * (-mms[k])
            cip[k] = cak * mms[k]
            cna[k] = cak * (sgn * 0.5 * jnp.abs(mms[k]))
            # d t_axis / d dpc = -t_axis * mm (0 where the E-workaround
            # pinned mm); follows from d mm/d dpc = -mm^2
            cdp[k] = jnp.where(dp[k] == 0.0, 0.0, cak * (-ts[k] * mms[k]))
        ct_op = _vadd(ct_op, tuple(co))
        ct_ip = _vadd(ct_ip, tuple(cip))
        ct_na = _vadd(ct_na, tuple(cna))
        ct_dp = _vadd(ct_dp, tuple(cdp))

    if has_tri:
        ctm = jnp.where(m_tri, ct, 0.0)
        oz = _vdot(o, g3) + h3
        dz = _vdot(d, g3)
        dz_ok = dz != 0.0
        inv_dz = 1.0 / jnp.where(dz_ok, dz, 1.0)
        t_ad = -oz * inv_dz
        ct_oz = -ctm * inv_dz
        ct_dz = jnp.where(dz_ok, -ctm * t_ad * inv_dz, 0.0)
        d_g3 = _vadd(_vscale(o, ct_oz), _vscale(d, ct_dz))
        d_h3 = ct_oz
        d_o = _vadd(d_o, _vscale(g3, ct_oz))
        d_d = _vadd(d_d, _vscale(g3, ct_dz))

    # shared transposes of op = ip + M(o - ip), dp = M d
    def mt(v):  # M^T v
        return tuple(_att(at, 0 + j) * v[0] + _att(at, 3 + j) * v[1]
                     + _att(at, 6 + j) * v[2] for j in range(3))

    mt_op = mt(ct_op)
    d_o = _vadd(d_o, mt_op)
    d_d = _vadd(d_d, mt(ct_dp))
    d_ip = _vadd(ct_ip, _vsub(ct_op, mt_op))
    d_at = [ct_op[k] * rel[j] + ct_dp[k] * d[j]
            for k in range(3) for j in range(3)]
    d_at += [d_ip[0], d_ip[1], d_ip[2], ct_na[0], ct_na[1], ct_na[2], ct_r]
    n_cols = (at.shape[0] // _SUBL if not isinstance(at, (tuple, list))
              else len(at))
    d_at += [zero] * (n_cols - len(d_at))
    if isinstance(at, (tuple, list)):
        d_at = tuple(d_at)
    else:  # bundled (C*8, W) attribute array: match the input container
        d_at = jnp.concatenate(d_at, axis=0)
    return d_at, d_o, d_d, d_g3, d_h3


def _winner_t_bwd_both(layout, at, o, d, row, ct_e, ct_x):
    """Merged entry+exit winner-t transpose for same_row scenes (the exit
    winner is the entry winner, so both t's share one primal chain:
    sphere entry/exit are the +/-sqrt roots of ONE quadratic
    (rt.rs:299-330), a plane's exit t IS its entry t (rt.rs:333-358), box
    entry/exit are the lo/hi of ONE slab sweep (rt.rs:401-412)). Per-lane
    equal to `_winner_t_bwd_math(entry) + _winner_t_bwd_math(exit)` up to
    summation order, at a little over half the vector ops: the object-
    space transform, the quadratic/slab primals and the M^T tail are
    computed once. No triangle branch — same_row excludes meshes."""
    kinds, _has_tri = _kinds_present(layout)
    ip = _v3(at, _C_IP)
    na = _v3(at, _C_NA)
    rel = _vsub(o, ip)
    op = _vadd(ip, _vmatvec(at, rel))
    dp = _vmatvec(at, d)
    zero = jnp.zeros_like(ct_e)
    z3 = (zero, zero, zero)
    ct_op, ct_dp, ct_ip, ct_na = z3, z3, z3, z3
    ct_r = zero
    masks, _m_tri = _seg_masks(layout, row)

    if schema.KIND_SPHERE in kinds:
        m = masks[schema.KIND_SPHERE]
        ce = jnp.where(m, ct_e, 0.0)
        cx = jnp.where(m, ct_x, 0.0)
        r_ = _att(at, _C_PR)
        oc = _vsub(op, ip)
        a = _vdot(dp, dp)
        b = 2.0 * _vdot(oc, dp)
        c_ = _vdot(oc, oc) - r_ * r_
        disc = b * b - 4.0 * a * c_
        sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-12), 1.0))
        inv_a2 = 1.0 / jnp.where(a == 0.0, 1.0, 2.0 * a)
        t_en = (-b - sq) * inv_a2
        t_ex = (-b + sq) * inv_a2
        g_disc = jnp.where(disc >= 1e-12,
                           (cx - ce) * inv_a2 * (0.5 / sq), 0.0)
        ct_b = -(ce + cx) * inv_a2 + g_disc * (2.0 * b)
        ct_a = (jnp.where(a == 0.0, 0.0,
                          -2.0 * inv_a2 * (ce * t_en + cx * t_ex))
                + g_disc * (-4.0 * c_))
        ct_c = g_disc * (-4.0 * a)
        ct_dp = _vadd(ct_dp, _vadd(_vscale(dp, 2.0 * ct_a),
                                   _vscale(oc, 2.0 * ct_b)))
        ct_oc = _vadd(_vscale(dp, 2.0 * ct_b), _vscale(oc, 2.0 * ct_c))
        ct_op = _vadd(ct_op, ct_oc)
        ct_ip = _vsub(ct_ip, ct_oc)
        ct_r = ct_r + ct_c * (-2.0 * r_)

    if schema.KIND_PLANE in kinds:
        # exit t == entry t for a plane: one chain, summed cotangent
        ctm = jnp.where(masks[schema.KIND_PLANE], ct_e + ct_x, 0.0)
        nn = _vdot(na, na)
        nn_ok = nn > 0.0
        inv = jax.lax.rsqrt(jnp.where(nn_ok, nn, 1.0))
        nr = _vscale(na, inv)
        dn = _vdot(dp, nr)
        dn_ok = dn != 0.0
        inv_dn = 1.0 / jnp.where(dn_ok, dn, 1.0)
        num = -(_vdot(op, nr) - _vdot(nr, ip))
        t_ad = num * inv_dn
        ct_num = ctm * inv_dn
        ct_dn = jnp.where(dn_ok, -ctm * t_ad * inv_dn, 0.0)
        ct_op = _vadd(ct_op, _vscale(nr, -ct_num))
        ct_ip = _vadd(ct_ip, _vscale(nr, ct_num))
        ct_dp = _vadd(ct_dp, _vscale(nr, ct_dn))
        ct_nr = _vadd(_vadd(_vscale(op, -ct_num), _vscale(ip, ct_num)),
                      _vscale(dp, ct_dn))
        ct_inv = _vdot(na, ct_nr)
        ct_nn = jnp.where(nn_ok, ct_inv * (-0.5) * inv * inv * inv, 0.0)
        ct_na = _vadd(ct_na, _vadd(_vscale(ct_nr, inv),
                                   _vscale(na, 2.0 * ct_nn)))

    if schema.KIND_BOX in kinds:
        m = masks[schema.KIND_BOX]
        ce = jnp.where(m, ct_e, 0.0)
        cx = jnp.where(m, ct_x, 0.0)
        mms, nnbs, kkbs, ts_e, ts_x = [], [], [], [], []
        for k in range(3):
            dpc = dp[k]
            z = dpc == 0.0
            mm = jnp.where(z, 1.0 / EPS, 1.0 / jnp.where(z, 1.0, dpc))
            nnb = (op[k] - ip[k]) * mm
            kkb = 0.5 * na[k] * jnp.abs(mm)
            mms.append(mm)
            nnbs.append(nnb)
            kkbs.append(kkb)
            ts_e.append(-nnb - kkb)
            ts_x.append(-nnb + kkb)
        t_lo = jnp.maximum(jnp.maximum(ts_e[0], ts_e[1]), ts_e[2])
        t_hi = jnp.minimum(jnp.minimum(ts_x[0], ts_x[1]), ts_x[2])
        taken_e = taken_x = zero > 1.0
        co, cip, cna, cdp = list(z3), list(z3), list(z3), list(z3)
        for k in range(3):
            ak_e = (ts_e[k] == t_lo) & ~taken_e
            taken_e = taken_e | ak_e
            ak_x = (ts_x[k] == t_hi) & ~taken_x
            taken_x = taken_x | ak_x
            cak_e = jnp.where(ak_e, ce, 0.0)
            cak_x = jnp.where(ak_x, cx, 0.0)
            cboth = cak_e + cak_x
            co[k] = cboth * (-mms[k])
            cip[k] = cboth * mms[k]
            cna[k] = (cak_x - cak_e) * (0.5 * jnp.abs(mms[k]))
            cdp[k] = jnp.where(dp[k] == 0.0, 0.0,
                               -(cak_e * ts_e[k] + cak_x * ts_x[k])
                               * mms[k])
        ct_op = _vadd(ct_op, tuple(co))
        ct_ip = _vadd(ct_ip, tuple(cip))
        ct_na = _vadd(ct_na, tuple(cna))
        ct_dp = _vadd(ct_dp, tuple(cdp))

    def mt(v):  # M^T v
        return tuple(_att(at, 0 + j) * v[0] + _att(at, 3 + j) * v[1]
                     + _att(at, 6 + j) * v[2] for j in range(3))

    mt_op = mt(ct_op)
    d_o = mt_op
    d_d = mt(ct_dp)
    d_ip = _vadd(ct_ip, _vsub(ct_op, mt_op))
    d_at = [ct_op[k] * rel[j] + ct_dp[k] * d[j]
            for k in range(3) for j in range(3)]
    d_at += [d_ip[0], d_ip[1], d_ip[2], ct_na[0], ct_na[1], ct_na[2], ct_r]
    # tuple-form only: unlike _winner_t_bwd_math this function never
    # re-concatenates d_at into a bundled (C*8, W) container, so a
    # bundled-array `at` would silently return a mismatched d_at list
    assert isinstance(at, (tuple, list)), \
        "_winner_t_bwd_both takes tuple-form attributes"
    d_at += [zero] * (len(at) - len(d_at))
    return d_at, d_o, d_d


_WT_FNS: dict = {}


def _winner_t_pinned(layout, want_exit, at, o, d, row, t_sv, g3=None,
                     h3=None):
    """Winner t with the value pinned to the sweep's saved ``t_sv`` and the
    analytic gradient attached via custom_vjp (:func:`_winner_t_bwd_math`).
    The replay's primal pass costs ZERO ops (it returns ``t_sv``), replacing
    the ``te_ad + stop_gradient(te_sv - te_ad)`` pattern whose machine
    transpose rebuilt the whole explicit-formula chain per side."""
    kinds, has_tri = _kinds_present(layout)
    key = (layout, bool(want_exit))
    fn = _WT_FNS.get(key)
    if fn is None:
        if has_tri:
            @jax.custom_vjp
            def fn(at, o, d, row, t_sv, g3, h3):
                return t_sv

            def fwd(at, o, d, row, t_sv, g3, h3):
                return t_sv, (at, o, d, row, g3, h3)

            def bwd(res, ct):
                at, o, d, row, g3, h3 = res
                d_at, d_o, d_d, d_g3, d_h3 = _winner_t_bwd_math(
                    layout, want_exit, at, o, d, row, ct, g3, h3)
                return (d_at, d_o, d_d, jnp.zeros_like(row),
                        jnp.zeros_like(ct), d_g3, d_h3)
        else:
            @jax.custom_vjp
            def fn(at, o, d, row, t_sv):
                return t_sv

            def fwd(at, o, d, row, t_sv):
                return t_sv, (at, o, d, row)

            def bwd(res, ct):
                at, o, d, row = res
                d_at, d_o, d_d, _, _ = _winner_t_bwd_math(
                    layout, want_exit, at, o, d, row, ct, None, None)
                return (d_at, d_o, d_d, jnp.zeros_like(row),
                        jnp.zeros_like(ct))
        fn.defvjp(fwd, bwd)
        _WT_FNS[key] = fn
    if has_tri:
        return fn(at, o, d, row, t_sv, g3, h3)
    return fn(at, o, d, row, t_sv)


def _step_comp(layout, need_exit, L, p, u, live, te_sv, tx_sv, row, xrow,
               lok, analytic=True, maps=None, text=None, tmeta=None,
               tex_sv=None, want_tex=False, same_row=False,
               choose_sv=None):
    """Sweep-free bounce step from saved residuals (component form).

    ``p`` holds the differentiable inputs: the pre-fetched winner/exit
    attribute bundles atE/atX (24*8, W), tri Woop plane components
    g3e/h3e (+exit), o/d/A/B (3-tuples of (8,W) blocks), pwr/dk blocks,
    lr (per-light list of 11 blocks). Everything else is control.
    Mirrors `_step_kernel` op for op; the analytic winner-t is pinned to
    the saved value through ``stop_gradient`` so the primal linearization
    point is the forward kernel's exact output. Keeping the one-hot
    fetches OUT of this function keeps the backward kernel dot-free: the
    cotangents d_atE/d_atX come back as dense bundles and the caller
    scatters them to the attribute matrix with one XLA-side one-hot
    matmul over the whole ray batch.

    ``analytic=False`` (the component-form FORWARD body, not replayed
    under ``jax.vjp``) skips the analytic winner-t reconstruction and
    uses the sweep's ``te_sv``/``tx_sv`` directly — value-identical, and
    no Woop plane rows are needed.

    ``same_row``: no-mesh refractive scenes, where every group is one
    primitive so the exit winner IS the entry winner (rt.rs:725-772:
    sphere/plane/box intersect return both bounds of one object) —
    ``p`` carries no ``atX``; the exit side reads the entry bundle and
    ``xrow`` is ignored. Under ``jax.vjp`` both sides' cotangents then
    accumulate into ``atE`` automatically.
    """
    o, d = p["o"], p["d"]
    pwr, A, B = p["pwr"], p["A"], p["B"]
    hit = te_sv < _BIG * 0.5
    live_i = live & hit
    _abl = os.environ.get("MRT_BWD_ABLATE", "")

    atE = p["atE"]
    if analytic:
        te = _winner_t_pinned(layout, False, atE, o, d, row, te_sv,
                              p.get("g3e"), p.get("h3e"))
    else:
        te = te_sv
    te_f = jnp.where(live_i, te, 1.0)
    p_e = _vadd(o, _vscale(d, te_f))
    n_e = _normal_comp(layout, atE, p_e, row)
    if "nonormg" in _abl:  # timing ablation: cut the normal's grad chain
        n_e = jax.lax.stop_gradient(n_e)
    alb_e = _v3(atE, _C_ALB)
    rgh_e = _att(atE, _C_RGH)
    met_raw_e = _att(atE, _C_MET)
    met_e = met_raw_e
    opa_e = _att(atE, _C_OPA)
    emi_e = _att(atE, _C_EMI)
    tex_e = tex_x = None
    if maps:
        # texture overrides at the entry point; the dielectric tests keep
        # the RAW metal column (material_from_attrs' `metal_scalar`).
        # ``tex_sv`` (the backward replay) applies SAVED texel values —
        # piecewise-constant in every differentiable input, so skipping
        # the uv+fetch recompute changes no cotangent.
        if tex_sv is not None:
            tex_e = tex_sv["e"]
        else:
            u_uv, v_uv = _uv_comp(layout, atE, p_e, row, maps[2])
            tex_e = _tex_values_comp(maps, text, tmeta, atE, u_uv, v_uv)
        alb_e, rgh_e, met_e, _, opa_e, emi_e = _apply_tex_comp(
            maps, atE, tex_e,
            alb_e, rgh_e, met_e, _att(atE, _C_GLS), opa_e, emi_e)

    diel_e = (met_raw_e == 0.0) & (opa_e != 0.0)
    rough_r = jnp.where(diel_e & (u[0] < 0.8), 1.0, rgh_e)
    nr = _sphere_rand_comp(n_e, rough_r, u[1], u[2])
    refl = _vnorm_safe(_vsub(d, _vscale(nr, 2.0 * _vdot(d, nr))))

    if need_exit:
        atX = p["atE"] if same_row else p["atX"]
        if same_row:
            xrow = row
        if analytic:
            tx = _winner_t_pinned(layout, True, atX, o, d, xrow, tx_sv,
                                  p.get("g3x"), p.get("h3x"))
        else:
            tx = tx_sv
        tx_f = jnp.where(live_i, tx, 1.0)
        p_x = _vadd(o, _vscale(d, tx_f))
        n_x = _normal_comp(layout, atX, p_x, xrow)
        alb_x = _v3(atX, _C_ALB)
        rgh_x = _att(atX, _C_RGH)
        met_raw_x = _att(atX, _C_MET)
        met_x = met_raw_x
        gls_x = _att(atX, _C_GLS)
        opa_x = _att(atX, _C_OPA)
        emi_x = _att(atX, _C_EMI)
        if maps:
            if tex_sv is not None:
                tex_x = tex_sv["x"]
            else:
                ux_uv, vx_uv = _uv_comp(layout, atX, p_x, xrow,
                                         maps[2])
                tex_x = _tex_values_comp(maps, text, tmeta, atX, ux_uv,
                                         vx_uv)
            alb_x, rgh_x, met_x, gls_x, opa_x, emi_x = _apply_tex_comp(
                maps, atX, tex_x,
                alb_x, rgh_x, met_x, gls_x, opa_x, emi_x)
        diel_x = (met_raw_x == 0.0) & (opa_x != 0.0)
        rough_f = jnp.where(diel_x & (u[3] < 0.8), 1.0, rgh_x)
        nf = _sphere_rand_comp(n_x, rough_f, u[4], u[5])
        eta = 1.0 + 0.5 * gls_x
        cos = -_vdot(nf, d)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        refr_ok = kk >= 0.0
        k_safe = jnp.where(refr_ok, jnp.maximum(kk, 1e-12), 1.0)
        refr = _vnorm_safe(_vadd(_vscale(d, eta),
                                 _vscale(nf, cos * eta + jnp.sqrt(k_safe))))
        refr = _vfinite0(refr)
        # ``choose_sv``: backward replays pin the branch to the forward's
        # saved draw (recomputing could flip near kk == 0 under a
        # different compilation's fusion)
        choose = (choose_sv if choose_sv is not None
                  else (u[6] < jnp.minimum(1.0 - opa_e, 0.85)) & refr_ok)

        next_dir = _vwhere(choose, refr, refl)
        from_p = _vwhere(choose, p_x, p_e)
        norm_c = _vwhere(choose, n_x, n_e)
        alb_c = _vwhere(choose, alb_x, alb_e)
        rgh_c = jnp.where(choose, rgh_x, rgh_e)
        met_c = jnp.where(choose, met_x, met_e)
        emi_c = jnp.where(choose, emi_x, emi_e)
    else:
        next_dir, from_p, norm_c = refl, p_e, n_e
        alb_c, rgh_c, met_c, emi_c = alb_e, rgh_e, met_e, emi_e

    if "norandg" in _abl:  # timing ablation: cut the scatter-dir grad chain
        nr = jax.lax.stop_gradient(nr)
        refl = jax.lax.stop_gradient(refl)
        next_dir = jax.lax.stop_gradient(next_dir)
    zero = jnp.zeros_like(pwr)
    l_col = (zero, zero, zero)
    for li in range(L if "nolight" not in _abl else 0):
        lr = p["lr"][li]
        is_dir = lr[6] > 0.5
        lvec = tuple(jnp.where(is_dir, lr[3 + k], lr[k] - from_p[k])
                     for k in range(3))
        ln = _vscale(lvec, jax.lax.rsqrt(_vdot(lvec, lvec)))
        diff = jnp.maximum(_vdot(ln, norm_c), 0.0)
        lrefl = _vsub(ln, _vscale(norm_c, 2.0 * _vdot(ln, norm_c)))
        spec = _pow32(jnp.maximum(_vdot(d, lrefl), 0.0)) * (1.0 - rgh_c)
        o_col = _vscale(alb_c, 1.0 - met_c)
        contrib = tuple((o_col[k] * diff * lr[8 + k] + spec) * lr[7]
                        for k in range(3))
        l_col = _vadd(l_col, _vwhere(lok[li], contrib,
                                     (zero, zero, zero)))

    b_emit = u[7] < emi_c
    a_f = tuple(jnp.where(b_emit, 0.0, pwr * (0.5 + alb_c[k]))
                for k in range(3))
    b_f = tuple(jnp.where(b_emit, alb_c[k], pwr * l_col[k])
                for k in range(3))
    a_f = tuple(jnp.where(live_i, c, 1.0) for c in a_f)
    b_f = tuple(jnp.where(live_i, c, 0.0) for c in b_f)

    o2 = _vadd(from_p, _vscale(next_dir, EPS))
    d2 = next_dir
    pwr2 = pwr * p["dk"]
    A2 = _vop(jnp.multiply, A, a_f)
    B2 = _vadd(B, _vop(jnp.multiply, A, b_f))
    # aux (no cotangents; the backward replay drops them): hit-liveness,
    # the emit draw, saved texels, and the refract-branch draw — for the
    # caller's carry-live policy and the same_row choose residual
    aux = {"tex": (tex_e, tex_x) if want_tex else None,
           "choose": choose if need_exit else None}
    return o2, d2, pwr2, A2, B2, live_i, b_emit, aux


def _norm_bwd(v, ct):
    """Transpose of :func:`_vnorm_safe` at pre-norm ``v`` (guard semantics
    of `_vnorm_cv_bwd`): d_v = inv*(ct - out*(out.ct))."""
    s = _vdot(v, v)
    inv = jax.lax.rsqrt(jnp.maximum(s, _VN_EPS))
    t = _vdot(v, ct)
    g = jnp.where(s >= _VN_EPS, t * inv * inv, 0.0) * inv
    return tuple(inv * c - g * vv for c, vv in zip(ct, v))


def _sphere_dir(u1, u2):
    """The constant unit direction `_sphere_rand_comp` mixes in (u1/u2 are
    non-differentiable uniforms)."""
    ct = jnp.clip(1.0 - 2.0 * u1, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = u2 * (2.0 * 3.14159265358979323846)
    return (st * jnp.cos(phi), st * jnp.sin(phi), ct)


def _side_primal(layout, at, o, d, live_i, t_sv, rowv, maps, tex):
    """Primal intermediates of one hit side that the hand backward needs:
    hit point chain, normal chain (with pre-normalization vector), raw +
    textured material columns."""
    kinds, has_tri = _kinds_present(layout)
    t_f = jnp.where(live_i, t_sv, 1.0)
    p_h = _vadd(o, _vscale(d, t_f))
    ip = _v3(at, _C_IP)
    pa = _v3(at, _C_NA)
    rel = _vsub(p_h, ip)
    need_hp = bool(kinds & {schema.KIND_SPHERE, schema.KIND_BOX})
    hp = _vadd(ip, _vmatvec(at, rel)) if need_hp else None
    vals = {}
    if schema.KIND_SPHERE in kinds:
        vals[schema.KIND_SPHERE] = _vsub(hp, ip)
    if schema.KIND_PLANE in kinds:
        vals[schema.KIND_PLANE] = pa
    if schema.KIND_BOX in kinds:
        q = tuple((hp[k] - ip[k])
                  * (2.0 / jnp.where(pa[k] == 0.0, 1.0, pa[k]))
                  for k in range(3))
        ix1, ix_1 = jnp.abs(q[0] - 1.0) < EPS, jnp.abs(q[0] + 1.0) < EPS
        iy1, iy_1 = jnp.abs(q[1] - 1.0) < EPS, jnp.abs(q[1] + 1.0) < EPS
        iz1, iz_1 = jnp.abs(q[2] - 1.0) < EPS, jnp.abs(q[2] + 1.0) < EPS
        zero = jnp.zeros_like(q[0])
        one = jnp.ones_like(q[0])
        base_x = jnp.where(ix1, one, jnp.where(ix_1, -one, zero))
        base_y = jnp.where(ix1 | ix_1, zero,
                           jnp.where(iy1, one, jnp.where(iy_1, -one, zero)))
        anyz = iz1 | iz_1
        vals[schema.KIND_BOX] = (jnp.where(anyz, zero, base_x),
                                 jnp.where(anyz, zero, base_y),
                                 jnp.where(iz1, one,
                                           jnp.where(iz_1, -one, zero)))
    n_obj = _kind_select(layout, rowv, vals, pa, _vwhere)
    mv = _vmatvec(at, n_obj)
    s_mv = _vdot(mv, mv)
    invn = jax.lax.rsqrt(jnp.maximum(s_mv, _VN_EPS))
    nn = _vscale(mv, invn)
    n = _vfinite0(nn)

    alb = _v3(at, _C_ALB)
    rgh = _att(at, _C_RGH)
    met_raw = _att(at, _C_MET)
    met = met_raw
    gls = _att(at, _C_GLS)
    opa = _att(at, _C_OPA)
    emi = _att(at, _C_EMI)
    if maps:
        alb, rgh, met, gls, opa, emi = _apply_tex_comp(
            maps, at, tex, alb, rgh, met, gls, opa, emi)
    return {"t_f": t_f, "p": p_h, "ip": ip, "pa": pa, "rel": rel,
            "hp": hp, "n_obj": n_obj, "mv": mv, "nn": nn, "n": n,
            "alb": alb, "rgh": rgh, "met_raw": met_raw, "met": met,
            "gls": gls, "opa": opa, "emi": emi}


def _side_bwd(layout, at, sp, live_i, ct_p, ct_n, d_at):
    """Transpose of the hit-point + normal chain of one side.

    Accumulates into ``d_at`` (mutable per-column list) and returns
    (ct_o, ct_d, ct_t) — the cotangents flowing to the ray and the
    winner t (the caller routes ct_t through the analytic winner-t)."""
    kinds, has_tri = _kinds_present(layout)
    masks, m_tri = _seg_masks(layout, sp["rowv"])
    # n = finite0(nn): pass ct only where the normalized value was finite
    ct_nn = tuple(jnp.where(jnp.isfinite(c_nn), c, 0.0)
                  for c_nn, c in zip(sp["nn"], ct_n))
    ct_mv = _norm_bwd(sp["mv"], ct_nn)
    # mv = M n_obj
    n_obj = sp["n_obj"]
    for k in range(3):
        for j in range(3):
            d_at[3 * k + j] = d_at[3 * k + j] + ct_mv[k] * n_obj[j]
    ct_nobj = tuple(_att(at, j) * ct_mv[0] + _att(at, 3 + j) * ct_mv[1]
                    + _att(at, 6 + j) * ct_mv[2] for j in range(3))
    # per-kind select transpose (box normals are piecewise constants)
    zero = jnp.zeros_like(ct_nobj[0])
    ct_hp = (zero, zero, zero)
    ct_ip = (zero, zero, zero)
    if schema.KIND_SPHERE in kinds:
        m = masks[schema.KIND_SPHERE]
        ms = tuple(jnp.where(m, c, 0.0) for c in ct_nobj)
        ct_hp = _vadd(ct_hp, ms)
        ct_ip = _vsub(ct_ip, ms)
    m_pa = None
    if schema.KIND_PLANE in kinds:
        m_pa = masks[schema.KIND_PLANE]
    if has_tri:
        m_pa = m_tri if m_pa is None else (m_pa | m_tri)
    if m_pa is not None:
        for j in range(3):
            d_at[_C_NA + j] = d_at[_C_NA + j] + jnp.where(m_pa,
                                                          ct_nobj[j], 0.0)
    # hp = ip + M (p - ip): d hp/d p = M, d hp/d ip = I - M
    ct_ph = list(ct_p)
    if sp["hp"] is not None:
        rel = sp["rel"]
        for k in range(3):
            for j in range(3):
                d_at[3 * k + j] = d_at[3 * k + j] + ct_hp[k] * rel[j]
        mt_hp = tuple(_att(at, j) * ct_hp[0] + _att(at, 3 + j) * ct_hp[1]
                      + _att(at, 6 + j) * ct_hp[2] for j in range(3))
        for j in range(3):
            ct_ph[j] = ct_ph[j] + mt_hp[j]
        ct_ip = tuple(ct_ip[j] + ct_hp[j] - mt_hp[j] for j in range(3))
    for j in range(3):
        d_at[_C_IP + j] = d_at[_C_IP + j] + ct_ip[j]
    # p = o + d*t_f; t_f = where(live_i, t, 1)
    ct_o = tuple(ct_ph)
    ct_d = _vscale(ct_ph, sp["t_f"])
    ct_t = jnp.where(live_i, _vdot(sp["d"], ct_ph), 0.0)
    return ct_o, ct_d, ct_t


def _tex_base_bwd(maps, at, ct_alb, ct_rgh, ct_met, ct_gls):
    """Transpose of `_apply_tex_comp` to the BASE material columns (texel
    values are constants): albedo multiplies through the rgb texel,
    replaced scalars zero their base cotangent."""
    tex = at["tex"]
    atv = at["at"]
    for s, val in tex:
        tv = _att(atv, _C_MAP + s)
        sel = tv >= 0.0
        if s == 0:
            ct_alb = tuple(jnp.where(sel, c * v, c)
                           for c, v in zip(ct_alb, val))
        elif s == 1:
            ct_rgh = jnp.where(sel, 0.0, ct_rgh)
        elif s == 2:
            ct_met = jnp.where(sel, 0.0, ct_met)
        elif s == 3:
            ct_gls = jnp.where(sel, 0.0, ct_gls)
        # slots 4/5 (opacity/emission) feed comparisons only: no cotangent
    return ct_alb, ct_rgh, ct_met, ct_gls


def _step_comp_bwd(layout, need_exit, L, p, u, live, te_sv, tx_sv, row,
                   xrow, lok, cts, maps=None, tex_sv=None):
    """Hand-derived transpose of :func:`_step_comp` (rt.rs:956-994 fold +
    the step chain), replacing ``jax.vjp``'s replay+machine-transpose in
    the backward megakernel. The machine VJP re-runs the full primal
    (~F ops) plus its mechanical transpose (~2F); this computes only the
    intermediates the chain rule references (~0.7F) and a factored
    reverse sweep (~F). Values differ from the machine transpose only by
    float reassociation (pinned to it by
    ``test_hand_bwd_matches_machine``). Returns the cotangent dict for
    ``p``."""
    cto2, ctd2, ctp2, ctA2, ctB2 = cts
    o, d = p["o"], p["d"]
    pwr, A = p["pwr"], p["A"]
    atE = p["atE"]
    hit = te_sv < _BIG * 0.5
    live_i = live & hit
    kinds, has_tri = _kinds_present(layout)
    zero = jnp.zeros_like(pwr)
    z3 = (zero, zero, zero)

    # ---- primal recompute (only what the chain rule references) ----
    texs_e = tex_sv["e"] if (maps and tex_sv) else None
    sp_e = _side_primal(layout, atE, o, d, live_i, te_sv, row, maps, texs_e)
    sp_e["rowv"], sp_e["d"] = row, d
    diel_e = (sp_e["met_raw"] == 0.0) & (sp_e["opa"] != 0.0)
    cond_re = diel_e & (u[0] < 0.8)
    rough_r = jnp.where(cond_re, 1.0, sp_e["rgh"])
    v_e = _sphere_dir(u[1], u[2])
    w1 = _vadd(sp_e["n"], _vscale(v_e, rough_r))
    nr = _vnorm_safe(w1)
    dn_r = _vdot(d, nr)
    w2 = _vsub(d, _vscale(nr, 2.0 * dn_r))
    refl = _vnorm_safe(w2)

    if need_exit:
        atX = p["atX"]
        texs_x = tex_sv["x"] if (maps and tex_sv) else None
        sp_x = _side_primal(layout, atX, o, d, live_i, tx_sv, xrow, maps,
                            texs_x)
        sp_x["rowv"], sp_x["d"] = xrow, d
        diel_x = (sp_x["met_raw"] == 0.0) & (sp_x["opa"] != 0.0)
        cond_rf = diel_x & (u[3] < 0.8)
        rough_f = jnp.where(cond_rf, 1.0, sp_x["rgh"])
        v_x = _sphere_dir(u[4], u[5])
        w1x = _vadd(sp_x["n"], _vscale(v_x, rough_f))
        nf = _vnorm_safe(w1x)
        eta = 1.0 + 0.5 * sp_x["gls"]
        cos = -_vdot(nf, d)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        refr_ok = kk >= 0.0
        k_safe = jnp.where(refr_ok, jnp.maximum(kk, 1e-12), 1.0)
        sq = jnp.sqrt(k_safe)
        s3 = cos * eta + sq
        w3 = _vadd(_vscale(d, eta), _vscale(nf, s3))
        nn3 = _vnorm_safe(w3)
        choose = (u[6] < jnp.minimum(1.0 - sp_e["opa"], 0.85)) & refr_ok
        nch = jnp.logical_not(choose)
        norm_c = _vwhere(choose, sp_x["n"], sp_e["n"])
        alb_c = _vwhere(choose, sp_x["alb"], sp_e["alb"])
        rgh_c = jnp.where(choose, sp_x["rgh"], sp_e["rgh"])
        met_c = jnp.where(choose, sp_x["met"], sp_e["met"])
        emi_c = jnp.where(choose, sp_x["emi"], sp_e["emi"])
        from_p = _vwhere(choose, sp_x["p"], sp_e["p"])
    else:
        norm_c, alb_c, rgh_c = sp_e["n"], sp_e["alb"], sp_e["rgh"]
        met_c, emi_c, from_p = sp_e["met"], sp_e["emi"], sp_e["p"]

    b_emit = u[7] < emi_c
    m_ab = live_i & jnp.logical_not(b_emit)   # a_f/b_f "shade" branch
    m_em = live_i & b_emit

    # ---- light-loop primals (per light; L is small and static) ----
    lights_pr = []
    l_col = z3
    one_mrgh = 1.0 - rgh_c
    one_mmet = 1.0 - met_c
    o_col = _vscale(alb_c, one_mmet)
    for li in range(L):
        lr = p["lr"][li]
        is_dir = lr[6] > 0.5
        lvec = tuple(jnp.where(is_dir, lr[3 + k], lr[k] - from_p[k])
                     for k in range(3))
        s_lv = _vdot(lvec, lvec)
        invl = jax.lax.rsqrt(s_lv)
        ln = _vscale(lvec, invl)
        dotln = _vdot(ln, norm_c)
        diff = jnp.maximum(dotln, 0.0)
        lrefl = _vsub(ln, _vscale(norm_c, 2.0 * dotln))
        dl = _vdot(d, lrefl)
        m = jnp.maximum(dl, 0.0)
        m2 = m * m
        m4 = m2 * m2
        m8 = m4 * m4
        m16 = m8 * m8
        s32 = m16 * m16
        spec = s32 * one_mrgh
        contrib = tuple((o_col[k] * diff * lr[8 + k] + spec) * lr[7]
                        for k in range(3))
        l_col = _vadd(l_col, _vwhere(lok[li], contrib, z3))
        lights_pr.append((is_dir, lvec, invl, ln, dotln, diff, lrefl, dl,
                          m, m2, m4, m8, m16, s32, spec, contrib))

    # ---- reverse sweep ----
    # fold: A2 = A*a_f; B2 = B + A*b_f; pwr2 = pwr*dk; o2 = from_p +
    # EPS*next_dir; d2 = next_dir
    af_in = tuple(pwr * (0.5 + alb_c[k]) for k in range(3))
    a_f = tuple(jnp.where(live_i, jnp.where(b_emit, 0.0, af_in[k]), 1.0)
                for k in range(3))
    b_f = tuple(jnp.where(live_i,
                          jnp.where(b_emit, alb_c[k], pwr * l_col[k]), 0.0)
                for k in range(3))
    g_A = tuple(ctA2[k] * a_f[k] + ctB2[k] * b_f[k] for k in range(3))
    ct_af = tuple(ctA2[k] * A[k] for k in range(3))
    ct_bf = tuple(ctB2[k] * A[k] for k in range(3))
    ct_pwr = ctp2 * p["dk"]
    g_dk = ctp2 * pwr
    ct_alb_c = list(z3)
    ct_lcol = list(z3)
    for k in range(3):
        caf = jnp.where(m_ab, ct_af[k], 0.0)
        cbf_sh = jnp.where(m_ab, ct_bf[k], 0.0)
        ct_pwr = ct_pwr + caf * (0.5 + alb_c[k]) + cbf_sh * l_col[k]
        ct_alb_c[k] = caf * pwr + jnp.where(m_em, ct_bf[k], 0.0)
        ct_lcol[k] = cbf_sh * pwr
    ct_from_p = list(cto2)
    ct_nd = tuple(cto2[k] * EPS + ctd2[k] for k in range(3))

    # light loop transpose
    g_lr = []
    ct_nc = list(z3)
    ct_rgh_c = zero
    ct_met_c = zero
    ct_d = list(z3)
    for li in range(L):
        lr = p["lr"][li]
        (is_dir, lvec, invl, ln, dotln, diff, lrefl, dl,
         m, m2, m4, m8, m16, s32, spec, contrib) = lights_pr[li]
        glr = [zero] * 11
        ct_con = tuple(jnp.where(lok[li], ct_lcol[k], 0.0)
                       for k in range(3))
        ct_diff = zero
        ct_spec = zero
        for k in range(3):
            glr[7] = glr[7] + ct_con[k] * (o_col[k] * diff * lr[8 + k]
                                           + spec)
            clp = ct_con[k] * lr[7]
            glr[8 + k] = o_col[k] * diff * clp
            ct_ocol_k = clp * diff * lr[8 + k]
            ct_alb_c[k] = ct_alb_c[k] + ct_ocol_k * one_mmet
            ct_met_c = ct_met_c - ct_ocol_k * alb_c[k]
            ct_diff = ct_diff + clp * o_col[k] * lr[8 + k]
            ct_spec = ct_spec + clp
        # spec = m^32 * (1 - rgh_c)
        ct_rgh_c = ct_rgh_c - ct_spec * s32
        ct_m = ct_spec * one_mrgh * 32.0 * (m16 * m8 * m4 * m2 * m)
        ct_dl = jnp.where(dl >= 0.0, ct_m, 0.0)
        for k in range(3):
            ct_d[k] = ct_d[k] + ct_dl * lrefl[k]
        ct_lrefl = _vscale(d, ct_dl)
        # lrefl = ln - 2*dotln*norm_c
        ct_ln = list(ct_lrefl)
        ct_dotln = -2.0 * _vdot(norm_c, ct_lrefl)
        for k in range(3):
            ct_nc[k] = ct_nc[k] - 2.0 * dotln * ct_lrefl[k]
        # diff = max(dotln, 0)
        ct_dotln = ct_dotln + jnp.where(dotln >= 0.0, ct_diff, 0.0)
        for k in range(3):
            ct_ln[k] = ct_ln[k] + ct_dotln * norm_c[k]
            ct_nc[k] = ct_nc[k] + ct_dotln * ln[k]
        # ln = lvec * rsqrt(lvec.lvec)
        t_l = _vdot(lvec, ct_ln)
        gl = t_l * invl * invl * invl
        ct_lvec = tuple(invl * ct_ln[k] - gl * lvec[k] for k in range(3))
        for k in range(3):
            glr[3 + k] = jnp.where(is_dir, ct_lvec[k], 0.0)
            glr[k] = jnp.where(is_dir, 0.0, ct_lvec[k])
            ct_from_p[k] = ct_from_p[k] - jnp.where(is_dir, 0.0,
                                                    ct_lvec[k])
        g_lr.append(glr)

    # selections -> per-side cotangents
    if need_exit:
        ct_refl = tuple(jnp.where(nch, c, 0.0) for c in ct_nd)
        ct_refr = tuple(jnp.where(choose, c, 0.0) for c in ct_nd)
        ct_pe = [jnp.where(nch, c, 0.0) for c in ct_from_p]
        ct_px = [jnp.where(choose, c, 0.0) for c in ct_from_p]
        ct_ne = [jnp.where(nch, c, 0.0) for c in ct_nc]
        ct_nx = [jnp.where(choose, c, 0.0) for c in ct_nc]
        ct_alb_e = [jnp.where(nch, c, 0.0) for c in ct_alb_c]
        ct_alb_x = [jnp.where(choose, c, 0.0) for c in ct_alb_c]
        ct_rgh_e = jnp.where(nch, ct_rgh_c, 0.0)
        ct_rgh_x = jnp.where(choose, ct_rgh_c, 0.0)
        ct_met_e = jnp.where(nch, ct_met_c, 0.0)
        ct_met_x = jnp.where(choose, ct_met_c, 0.0)
        ct_emi_e = jnp.where(nch, zero, 0.0)   # emi: comparisons only
    else:
        ct_refl = ct_nd
        ct_pe = ct_from_p
        ct_ne = ct_nc
        ct_alb_e = ct_alb_c
        ct_rgh_e = ct_rgh_c
        ct_met_e = ct_met_c

    # refl = norm(w2), w2 = d - 2*(d.nr)*nr
    ct_w2 = _norm_bwd(w2, ct_refl)
    t_nr = _vdot(nr, ct_w2)
    ct_nr = list(z3)
    for k in range(3):
        ct_d[k] = ct_d[k] + ct_w2[k] - 2.0 * t_nr * nr[k]
        ct_nr[k] = -2.0 * (d[k] * t_nr + dn_r * ct_w2[k])
    # nr = norm(w1), w1 = n_e + rough_r*v_e
    ct_w1 = _norm_bwd(w1, ct_nr)
    ct_rough_r = _vdot(v_e, ct_w1)
    for k in range(3):
        ct_ne[k] = ct_ne[k] + ct_w1[k]
    ct_rgh_e = ct_rgh_e + jnp.where(cond_re, 0.0, ct_rough_r)

    if need_exit:
        # refr = finite0(norm(w3))
        ct_nn3 = tuple(jnp.where(jnp.isfinite(c3), c, 0.0)
                       for c3, c in zip(nn3, ct_refr))
        ct_w3 = _norm_bwd(w3, ct_nn3)
        ct_eta = _vdot(d, ct_w3)
        ct_nf = list(_vscale(ct_w3, s3))
        ct_s3 = _vdot(nf, ct_w3)
        for k in range(3):
            ct_d[k] = ct_d[k] + eta * ct_w3[k]
        ct_cos = ct_s3 * eta
        ct_eta = ct_eta + ct_s3 * cos
        ct_ksafe = ct_s3 * 0.5 / sq
        ct_kk = jnp.where(refr_ok & (kk >= 1e-12), ct_ksafe, 0.0)
        ct_eta = ct_eta + ct_kk * (-2.0 * eta * (1.0 - cos * cos))
        ct_cos = ct_cos + ct_kk * (eta * eta * 2.0 * cos)
        # cos = -(nf.d)
        for k in range(3):
            ct_nf[k] = ct_nf[k] - ct_cos * d[k]
            ct_d[k] = ct_d[k] - ct_cos * nf[k]
        ct_gls_x = 0.5 * ct_eta
        # nf = norm(w1x), w1x = n_x + rough_f*v_x
        ct_w1x = _norm_bwd(w1x, ct_nf)
        ct_rough_f = _vdot(v_x, ct_w1x)
        for k in range(3):
            ct_nx[k] = ct_nx[k] + ct_w1x[k]
        ct_rgh_x = ct_rgh_x + jnp.where(cond_rf, 0.0, ct_rough_f)

    # material-base transposes + attribute assembly, entry side
    NCOL = len(atE) if isinstance(atE, (tuple, list)) else atE.shape[0] // 8
    d_atE = [zero] * NCOL
    ct_gls_e = zero
    if maps:
        ct_alb_e, ct_rgh_e, ct_met_e, ct_gls_e = _tex_base_bwd(
            maps, {"tex": texs_e, "at": atE},
            ct_alb_e, ct_rgh_e, ct_met_e, ct_gls_e)
    for j in range(3):
        d_atE[_C_ALB + j] = d_atE[_C_ALB + j] + ct_alb_e[j]
    d_atE[_C_RGH] = d_atE[_C_RGH] + ct_rgh_e
    d_atE[_C_MET] = d_atE[_C_MET] + ct_met_e
    d_atE[_C_GLS] = d_atE[_C_GLS] + ct_gls_e
    ct_oE, ct_dE, ct_te = _side_bwd(layout, atE, sp_e, live_i,
                                    ct_pe, ct_ne, d_atE)
    wt_at, wt_o, wt_d, wt_g3, wt_h3 = _winner_t_bwd_math(
        layout, False, atE, o, d, row, ct_te, p.get("g3e"), p.get("h3e"))
    wt_at = list(wt_at)
    for j in range(NCOL):
        d_atE[j] = d_atE[j] + wt_at[j]
    g_o = [ct_oE[k] + wt_o[k] for k in range(3)]
    g_d = [ct_d[k] + ct_dE[k] + wt_d[k] for k in range(3)]
    g = {"o": tuple(g_o), "d": None, "pwr": ct_pwr, "A": g_A,
         "B": tuple(ctB2), "dk": g_dk, "lr": g_lr,
         "atE": tuple(d_atE)}
    if has_tri:
        g["g3e"] = wt_g3 if wt_g3 is not None else z3
        g["h3e"] = wt_h3 if wt_h3 is not None else zero

    if need_exit:
        d_atX = [zero] * NCOL
        ct_gls_x2 = ct_gls_x
        if maps:
            ct_alb_x, ct_rgh_x, ct_met_x, ct_gls_x2 = _tex_base_bwd(
                maps, {"tex": texs_x, "at": atX},
                ct_alb_x, ct_rgh_x, ct_met_x, ct_gls_x2)
        for j in range(3):
            d_atX[_C_ALB + j] = d_atX[_C_ALB + j] + ct_alb_x[j]
        d_atX[_C_RGH] = d_atX[_C_RGH] + ct_rgh_x
        d_atX[_C_MET] = d_atX[_C_MET] + ct_met_x
        d_atX[_C_GLS] = d_atX[_C_GLS] + ct_gls_x2
        ct_oX, ct_dX, ct_tx = _side_bwd(layout, atX, sp_x, live_i,
                                        ct_px, ct_nx, d_atX)
        wtx_at, wtx_o, wtx_d, wtx_g3, wtx_h3 = _winner_t_bwd_math(
            layout, True, atX, o, d, xrow, ct_tx, p.get("g3x"),
            p.get("h3x"))
        wtx_at = list(wtx_at)
        for j in range(NCOL):
            d_atX[j] = d_atX[j] + wtx_at[j]
        for k in range(3):
            g_o[k] = g_o[k] + ct_oX[k] + wtx_o[k]
            g_d[k] = g_d[k] + ct_dX[k] + wtx_d[k]
        g["o"] = tuple(g_o)
        g["atX"] = tuple(d_atX)
        if has_tri:
            g["g3x"] = wtx_g3 if wtx_g3 is not None else z3
            g["h3x"] = wtx_h3 if wtx_h3 is not None else zero
    g["d"] = tuple(g_d)
    return g


def _step_comp_bwd_same(layout, L, p, u, live, te_sv, tx_sv, row, choose,
                        lok, cts, maps=None, tex_sv=None):
    """Hand transpose of the same_row step (no-mesh refractive scenes —
    see :func:`_step_comp`): the exit winner IS the entry winner, so the
    dual-side chain collapses onto the SELECTED hit. Per lane exactly one
    side is live (``choose``, saved by the forward as the linearization
    of the refract draw), both sides read the same attribute bundle, and
    the selected hit point is ``o + d*where(choose, tx, te)`` — so ONE
    hit-point/normal chain, ONE material transpose, ONE `_side_bwd` and
    the merged `_winner_t_bwd_both` replace the entry+exit pair. Per-lane
    cotangents match the dual chain's bit-for-bit on the live side
    (identical primals, identical ops); only attribute-column summation
    order differs. ~40% fewer vector ops than the dual chain on
    CornellBox-class scenes."""
    cto2, ctd2, ctp2, ctA2, ctB2 = cts
    o, d = p["o"], p["d"]
    pwr, A = p["pwr"], p["A"]
    atE = p["atE"]
    hit = te_sv < _BIG * 0.5
    live_i = live & hit
    zero = jnp.zeros_like(pwr)
    z3 = (zero, zero, zero)
    nch = jnp.logical_not(choose)

    # ---- primal recompute at the SELECTED hit ----
    t_c = jnp.where(choose, tx_sv, te_sv)
    tex_c = None
    if maps and tex_sv is not None:
        tex_c = []
        for (s, ve), (_sx, vx) in zip(tex_sv["e"], tex_sv["x"]):
            if s == 0:
                tex_c.append((s, tuple(jnp.where(choose, x, e)
                                       for e, x in zip(ve, vx))))
            else:
                tex_c.append((s, jnp.where(choose, vx, ve)))
    sp = _side_primal(layout, atE, o, d, live_i, t_c, row, maps, tex_c)
    sp["rowv"], sp["d"] = row, d
    diel = (sp["met_raw"] == 0.0) & (sp["opa"] != 0.0)
    u_r = jnp.where(choose, u[3], u[0])
    cond_c = diel & (u_r < 0.8)
    rough_c = jnp.where(cond_c, 1.0, sp["rgh"])
    v_c = _sphere_dir(jnp.where(choose, u[4], u[1]),
                      jnp.where(choose, u[5], u[2]))
    w1 = _vadd(sp["n"], _vscale(v_c, rough_c))
    nrc = _vnorm_safe(w1)
    dn_r = _vdot(d, nrc)
    # reflection primals (live on ~choose lanes): w2 = d - 2(d.nr)nr
    w2 = _vsub(d, _vscale(nrc, 2.0 * dn_r))
    # refraction primals (live on choose lanes, where nrc == nf);
    # cos = -(nf.d) is the shared dn_r
    eta = 1.0 + 0.5 * sp["gls"]
    cos = -dn_r
    kk = 1.0 - eta * eta * (1.0 - cos * cos)
    k_safe = jnp.where(kk >= 0.0, jnp.maximum(kk, 1e-12), 1.0)
    sq = jnp.sqrt(k_safe)
    s3 = cos * eta + sq
    w3 = _vadd(_vscale(d, eta), _vscale(nrc, s3))
    nn3 = _vnorm_safe(w3)

    norm_c, from_p = sp["n"], sp["p"]
    alb_c, rgh_c = sp["alb"], sp["rgh"]
    met_c, emi_c = sp["met"], sp["emi"]
    b_emit = u[7] < emi_c
    m_ab = live_i & jnp.logical_not(b_emit)
    m_em = live_i & b_emit

    # ---- light-loop primals ----
    lights_pr = []
    l_col = z3
    one_mrgh = 1.0 - rgh_c
    one_mmet = 1.0 - met_c
    o_col = _vscale(alb_c, one_mmet)
    for li in range(L):
        lr = p["lr"][li]
        is_dir = lr[6] > 0.5
        lvec = tuple(jnp.where(is_dir, lr[3 + k], lr[k] - from_p[k])
                     for k in range(3))
        s_lv = _vdot(lvec, lvec)
        invl = jax.lax.rsqrt(s_lv)
        ln = _vscale(lvec, invl)
        dotln = _vdot(ln, norm_c)
        diff = jnp.maximum(dotln, 0.0)
        lrefl = _vsub(ln, _vscale(norm_c, 2.0 * dotln))
        dl = _vdot(d, lrefl)
        m = jnp.maximum(dl, 0.0)
        m2 = m * m
        m4 = m2 * m2
        m8 = m4 * m4
        m16 = m8 * m8
        s32 = m16 * m16
        spec = s32 * one_mrgh
        contrib = tuple((o_col[k] * diff * lr[8 + k] + spec) * lr[7]
                        for k in range(3))
        l_col = _vadd(l_col, _vwhere(lok[li], contrib, z3))
        lights_pr.append((is_dir, lvec, invl, ln, dotln, diff, lrefl, dl,
                          m, m2, m4, m8, m16, s32, spec, contrib))

    # ---- reverse sweep (fold, as in the dual chain) ----
    af_in = tuple(pwr * (0.5 + alb_c[k]) for k in range(3))
    a_f = tuple(jnp.where(live_i, jnp.where(b_emit, 0.0, af_in[k]), 1.0)
                for k in range(3))
    b_f = tuple(jnp.where(live_i,
                          jnp.where(b_emit, alb_c[k], pwr * l_col[k]), 0.0)
                for k in range(3))
    g_A = tuple(ctA2[k] * a_f[k] + ctB2[k] * b_f[k] for k in range(3))
    ct_af = tuple(ctA2[k] * A[k] for k in range(3))
    ct_bf = tuple(ctB2[k] * A[k] for k in range(3))
    ct_pwr = ctp2 * p["dk"]
    g_dk = ctp2 * pwr
    ct_alb = list(z3)
    ct_lcol = list(z3)
    for k in range(3):
        caf = jnp.where(m_ab, ct_af[k], 0.0)
        cbf_sh = jnp.where(m_ab, ct_bf[k], 0.0)
        ct_pwr = ct_pwr + caf * (0.5 + alb_c[k]) + cbf_sh * l_col[k]
        ct_alb[k] = caf * pwr + jnp.where(m_em, ct_bf[k], 0.0)
        ct_lcol[k] = cbf_sh * pwr
    ct_from_p = list(cto2)
    ct_nd = tuple(cto2[k] * EPS + ctd2[k] for k in range(3))

    # light loop transpose (selected values: no per-side split needed)
    g_lr = []
    ct_n = list(z3)
    ct_rgh = zero
    ct_met = zero
    ct_d = list(z3)
    for li in range(L):
        lr = p["lr"][li]
        (is_dir, lvec, invl, ln, dotln, diff, lrefl, dl,
         m, m2, m4, m8, m16, s32, spec, contrib) = lights_pr[li]
        glr = [zero] * 11
        ct_con = tuple(jnp.where(lok[li], ct_lcol[k], 0.0)
                       for k in range(3))
        ct_diff = zero
        ct_spec = zero
        for k in range(3):
            glr[7] = glr[7] + ct_con[k] * (o_col[k] * diff * lr[8 + k]
                                           + spec)
            clp = ct_con[k] * lr[7]
            glr[8 + k] = o_col[k] * diff * clp
            ct_ocol_k = clp * diff * lr[8 + k]
            ct_alb[k] = ct_alb[k] + ct_ocol_k * one_mmet
            ct_met = ct_met - ct_ocol_k * alb_c[k]
            ct_diff = ct_diff + clp * o_col[k] * lr[8 + k]
            ct_spec = ct_spec + clp
        ct_rgh = ct_rgh - ct_spec * s32
        ct_m = ct_spec * one_mrgh * 32.0 * (m16 * m8 * m4 * m2 * m)
        ct_dl = jnp.where(dl >= 0.0, ct_m, 0.0)
        for k in range(3):
            ct_d[k] = ct_d[k] + ct_dl * lrefl[k]
        ct_lrefl = _vscale(d, ct_dl)
        ct_ln = list(ct_lrefl)
        ct_dotln = -2.0 * _vdot(norm_c, ct_lrefl)
        for k in range(3):
            ct_n[k] = ct_n[k] - 2.0 * dotln * ct_lrefl[k]
        ct_dotln = ct_dotln + jnp.where(dotln >= 0.0, ct_diff, 0.0)
        for k in range(3):
            ct_ln[k] = ct_ln[k] + ct_dotln * norm_c[k]
            ct_n[k] = ct_n[k] + ct_dotln * ln[k]
        t_l = _vdot(lvec, ct_ln)
        gl = t_l * invl * invl * invl
        ct_lvec = tuple(invl * ct_ln[k] - gl * lvec[k] for k in range(3))
        for k in range(3):
            glr[3 + k] = jnp.where(is_dir, ct_lvec[k], 0.0)
            glr[k] = jnp.where(is_dir, 0.0, ct_lvec[k])
            ct_from_p[k] = ct_from_p[k] - jnp.where(is_dir, 0.0,
                                                    ct_lvec[k])
        g_lr.append(glr)

    # next_dir = where(choose, refr, refl): split the direction cotangent
    ct_refl = tuple(jnp.where(nch, c, 0.0) for c in ct_nd)
    ct_refr = tuple(jnp.where(choose, c, 0.0) for c in ct_nd)

    # refl = norm(w2), w2 = d - 2*(d.nr)*nr   [~choose lanes]
    ct_w2 = _norm_bwd(w2, ct_refl)
    t_nr = _vdot(nrc, ct_w2)
    ct_nr = list(z3)
    for k in range(3):
        ct_d[k] = ct_d[k] + ct_w2[k] - 2.0 * t_nr * nrc[k]
        ct_nr[k] = -2.0 * (d[k] * t_nr + dn_r * ct_w2[k])

    # refr = finite0(norm(w3))   [choose lanes; nrc == nf there]
    ct_nn3 = tuple(jnp.where(jnp.isfinite(c3), c, 0.0)
                   for c3, c in zip(nn3, ct_refr))
    ct_w3 = _norm_bwd(w3, ct_nn3)
    ct_eta = _vdot(d, ct_w3)
    ct_s3 = _vdot(nrc, ct_w3)
    for k in range(3):
        ct_d[k] = ct_d[k] + eta * ct_w3[k]
        ct_nr[k] = ct_nr[k] + s3 * ct_w3[k]
    ct_cos = ct_s3 * eta
    ct_eta = ct_eta + ct_s3 * cos
    ct_ksafe = ct_s3 * 0.5 / sq
    ct_kk = jnp.where(kk >= 1e-12, ct_ksafe, 0.0)
    ct_eta = ct_eta + ct_kk * (-2.0 * eta * (1.0 - cos * cos))
    ct_cos = ct_cos + ct_kk * (eta * eta * 2.0 * cos)
    # cos = -(nrc.d)
    for k in range(3):
        ct_nr[k] = ct_nr[k] - ct_cos * d[k]
        ct_d[k] = ct_d[k] - ct_cos * nrc[k]
    ct_gls = 0.5 * ct_eta

    # nrc = norm(w1), w1 = n_c + rough_c*v_c  (merged: the reflection and
    # refraction chains feed disjoint lanes of the ONE sampled direction)
    ct_w1 = _norm_bwd(w1, ct_nr)
    ct_rough = _vdot(v_c, ct_w1)
    for k in range(3):
        ct_n[k] = ct_n[k] + ct_w1[k]
    ct_rgh = ct_rgh + jnp.where(cond_c, 0.0, ct_rough)

    # material-base transposes + attribute assembly (one side)
    NCOL = len(atE) if isinstance(atE, (tuple, list)) else atE.shape[0] // 8
    d_atE = [zero] * NCOL
    ct_gls_t = ct_gls
    if maps:
        ct_alb, ct_rgh, ct_met, ct_gls_t = _tex_base_bwd(
            maps, {"tex": tex_c, "at": atE}, ct_alb, ct_rgh, ct_met,
            ct_gls_t)
    for j in range(3):
        d_atE[_C_ALB + j] = d_atE[_C_ALB + j] + ct_alb[j]
    d_atE[_C_RGH] = d_atE[_C_RGH] + ct_rgh
    d_atE[_C_MET] = d_atE[_C_MET] + ct_met
    d_atE[_C_GLS] = d_atE[_C_GLS] + ct_gls_t
    ct_o_s, ct_d_s, ct_t = _side_bwd(layout, atE, sp, live_i,
                                     ct_from_p, ct_n, d_atE)
    ct_te = jnp.where(nch, ct_t, 0.0)
    ct_tx = jnp.where(choose, ct_t, 0.0)
    wt_at, wt_o, wt_d = _winner_t_bwd_both(layout, atE, o, d, row,
                                           ct_te, ct_tx)
    for j in range(NCOL):
        d_atE[j] = d_atE[j] + wt_at[j]
    g_o = tuple(ct_o_s[k] + wt_o[k] for k in range(3))
    g_d = tuple(ct_d[k] + ct_d_s[k] + wt_d[k] for k in range(3))
    return {"o": g_o, "d": g_d, "pwr": ct_pwr, "A": g_A,
            "B": tuple(ctB2), "dk": g_dk, "lr": g_lr,
            "atE": tuple(d_atE)}


# --- backward megakernel ----------------------------------------------------

def _misc_rows(L):
    """Rows in the accumulated misc-cotangent block: 11 per light + decay."""
    n = L * 11 + 1
    return n + ((-n) % 8)


def _bwd_kernel(layout, need_exit, L, n_tri, *refs):
    same_row = _same_row(layout, need_exit)
    refs = list(refs)
    lights_s = refs.pop(0)
    dk_s = refs.pop(0)
    (o_r, d_r, pwr_r, live_r, A_r, B_r, u_r,
     te_r, tx_r, row_r, xrow_r) = refs[:11]
    refs = refs[11:]
    if L:
        lok_r = refs.pop(0)
    atE_r = refs.pop(0)
    if need_exit and not same_row:
        atX_r = refs.pop(0)
    if n_tri:
        g3e_r, h3e_r = refs.pop(0), refs.pop(0)
        if need_exit:
            g3x_r, h3x_r = refs.pop(0), refs.pop(0)
    (cto_r, ctd_r, ctp_r, ctA_r, ctB_r,
     do_o, dd_o, dp_o, dA_o, dB_o, datE_o) = refs[:11]
    refs = refs[11:]
    if need_exit and not same_row:
        datX_o = refs.pop(0)
    if n_tri:
        dg3e_o, dh3e_o = refs.pop(0), refs.pop(0)
        if need_exit:
            dg3x_o, dh3x_o = refs.pop(0), refs.pop(0)
    (dmisc_o,) = refs

    def v3r(ref):
        x = ref[...]
        return _v3(x, 0)

    u8b = u_r[...]                                          # (64, W)
    u = _u_logical(u8b, _att, need_exit)
    te_sv = te_r[...]
    live = live_r[...] > 0.5
    ones = jnp.ones_like(te_sv)
    lr = [[lights_s[li, j] * ones for j in range(11)] for li in range(L)]
    lokb = lok_r[...] if L else None
    lok = [_att(lokb, li) > 0.5 for li in range(L)] if L else []
    p = {"o": v3r(o_r), "d": v3r(d_r),
         "pwr": pwr_r[...], "A": v3r(A_r), "B": v3r(B_r),
         "lr": lr, "dk": dk_s[0, 0] * ones, "atE": atE_r[...]}
    if need_exit and not same_row:
        p["atX"] = atX_r[...]
    if n_tri:
        p["g3e"], p["h3e"] = v3r(g3e_r), h3e_r[...]
        if need_exit:
            p["g3x"], p["h3x"] = v3r(g3x_r), h3x_r[...]

    # same_row: the residual xrow slot carries the saved refract draw
    choose_sv = (xrow_r[...] > 0.5) if same_row else None
    primal = partial(_step_comp, layout, need_exit, L,
                     u=u, live=live, te_sv=te_sv, tx_sv=tx_r[...],
                     row=row_r[...], xrow=xrow_r[...], lok=lok,
                     same_row=same_row, choose_sv=choose_sv)
    _, vjp = jax.vjp(lambda pp: primal(pp)[:5], p)
    g = vjp((v3r(cto_r), v3r(ctd_r), ctp_r[...],
             v3r(ctA_r), v3r(ctB_r)))[0]

    def put3(ref, v):
        ref[...] = jnp.concatenate(v, axis=0)

    put3(do_o, g["o"])
    put3(dd_o, g["d"])
    dp_o[...] = g["pwr"]
    put3(dA_o, g["A"])
    put3(dB_o, g["B"])
    datE_o[...] = g["atE"]
    if need_exit and not same_row:
        datX_o[...] = g["atX"]
    if n_tri:
        put3(dg3e_o, g["g3e"])
        dh3e_o[...] = g["h3e"]
        if need_exit:
            put3(dg3x_o, g["g3x"])
            dh3x_o[...] = g["h3x"]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dmisc_o[...] = jnp.zeros_like(dmisc_o)

    # per-ray partials of the broadcast scalars (sublane-reduced here);
    # the lane reduction happens outside the kernel
    for li in range(L):
        for j in range(11):
            k = li * 11 + j
            dmisc_o[k:k + 1, :] += jnp.sum(g["lr"][li][j], axis=0,
                                           keepdims=True)
    dmisc_o[L * 11:L * 11 + 1, :] += jnp.sum(g["dk"], axis=0,
                                             keepdims=True)


def _fetch_full(tab, idx, hp=jax.lax.Precision.HIGHEST):
    """XLA-side one-hot fetch over the whole ray batch: (C_cols, Rp)."""
    oh = jax.nn.one_hot(idx, tab.shape[0], dtype=tab.dtype)     # (Rp, P)
    return jax.lax.dot(oh, tab, precision=hp).T


def _scatter_full(idx, ct_rows, P, hp=jax.lax.Precision.HIGHEST):
    """Transpose of `_fetch_full`: accumulate (C, Rp) cotangents into the
    (P, C) table — one MXU matmul contracting the full ray batch."""
    oh = jax.nn.one_hot(idx, P, dtype=ct_rows.dtype)            # (Rp, P)
    return jax.lax.dot_general(oh, ct_rows, (((0,), (1,)), ((), ())),
                               precision=hp)                     # (P, C)


def _call_step_bwd(layout, need_exit, L, AT, HT, attr, lights, dk,
                   res_lane, cts_lane):
    """Run the backward megakernel; returns LANE-MAJOR cotangents for
    (attr, lights, dk, o, d, pwr, A, B, AT, HT).

    The winner/exit attribute rows are fetched here (one one-hot MXU
    matmul over the full batch) and their cotangents scattered back the
    same way, so the kernel body itself is dot-free.
    """
    segs, tri_start, n_tri = layout
    ATp = pallas_tri._pad_p(AT)
    HTp = pallas_tri._pad_p(HT)
    (oT, dT, pwrT, liveT, AT_r, BT_r, u8,
     te, tx, row, xrow, lok) = res_lane
    Rp = oT.shape[1]
    ctoT, ctdT, ctpT, ctAT, ctBT = cts_lane
    P_pad = attr.shape[0]
    MR = _misc_rows(L)
    dk_s = jnp.asarray(dk, jnp.float32).reshape(1, 1)

    same_row = _same_row(layout, need_exit)
    atE = _fetch_full(attr, row[0])
    args_ext, specs_ext = [], []
    if need_exit and not same_row:
        atX = _fetch_full(attr, xrow[0])
    if n_tri:
        Pt = ATp.shape[0]
        rt_e = jnp.clip(row[0] - tri_start, 0, Pt - 1)
        g3e = _fetch_full(ATp[:, 6:9], rt_e)
        h3e = _fetch_full(HTp[:, 2:3], rt_e)
        if need_exit:
            rt_x = jnp.clip(xrow[0] - tri_start, 0, Pt - 1)
            g3x = _fetch_full(ATp[:, 6:9], rt_x)
            h3x = _fetch_full(HTp[:, 2:3], rt_x)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    RT = _pick_tile(_TILE_BWD, Rp)
    if RT != Rp and RT % (128 * _SUBL):
        # Mosaic needs the block's lane width (RT/8) to be a multiple of
        # 128 unless the block spans the whole array: bump to 1024 rays
        # when the padding allows, else run the batch as one grid program.
        RT = 128 * _SUBL if Rp % (128 * _SUBL) == 0 else Rp
    W, WT = Rp // _SUBL, RT // _SUBL
    f32 = jnp.float32

    def comp(x):
        """(C, Rp) lane-major -> (C*8, W) component bundle; row-major
        contiguity makes this a free reinterpretation in XLA."""
        return x.reshape(x.shape[0] * _SUBL, W)

    def b(c):
        return pl.BlockSpec((c * _SUBL, WT), lambda i: (0, i))

    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))

    def shp(c):
        return jax.ShapeDtypeStruct((c * _SUBL, W), f32)

    in_specs = [smem, smem,
                b(3), b(3), b(1), b(1), b(3), b(3), b(n_uni(need_exit)),
                b(1), b(1), b(1), b(1)]
    args = [lights, dk_s] + [comp(x) for x in (
        oT, dT, pwrT, liveT, AT_r, BT_r, u8, te, tx, row, xrow)]
    if L:
        in_specs.append(b(L))
        args.append(comp(lok))
    in_specs.append(b(24))
    args.append(comp(atE))
    if need_exit and not same_row:
        in_specs.append(b(24))
        args.append(comp(atX))
    if n_tri:
        in_specs += [b(3), b(1)]
        args += [comp(g3e), comp(h3e)]
        if need_exit:
            in_specs += [b(3), b(1)]
            args += [comp(g3x), comp(h3x)]
    in_specs += [b(3), b(3), b(1), b(3), b(3)]
    args += [comp(x) for x in (ctoT, ctdT, ctpT, ctAT, ctBT)]

    out_specs = [b(3), b(3), b(1), b(3), b(3), b(24)]
    out_shapes = [shp(3), shp(3), shp(1), shp(3), shp(3), shp(24)]
    if need_exit and not same_row:
        out_specs.append(b(24))
        out_shapes.append(shp(24))
    if n_tri:
        out_specs += [b(3), b(1)]
        out_shapes += [shp(3), shp(1)]
        if need_exit:
            out_specs += [b(3), b(1)]
            out_shapes += [shp(3), shp(1)]
    out_specs.append(acc((MR, WT)))
    out_shapes.append(jax.ShapeDtypeStruct((MR, WT), f32))

    kern = partial(_bwd_kernel, layout, need_exit, L, n_tri)
    outs = list(pl.pallas_call(
        kern,
        grid=(Rp // RT,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(*args))

    def rows(x):
        """(C*8, W) component bundle -> (C, Rp) lane-major."""
        return x.reshape(x.shape[0] // _SUBL, Rp)

    d_oT, d_dT, d_pwrT, d_AT_, d_BT_ = [rows(x) for x in outs[:5]]
    d_atE = rows(outs[5])
    outs = outs[6:]
    d_attr = _scatter_full(row[0], d_atE, P_pad)
    if need_exit and not same_row:
        d_atX = rows(outs.pop(0))
        d_attr = d_attr + _scatter_full(xrow[0], d_atX, P_pad)
    if n_tri:
        d_g3e, d_h3e = rows(outs.pop(0)), rows(outs.pop(0))
        dg3 = _scatter_full(rt_e, d_g3e, Pt)
        dh3 = _scatter_full(rt_e, d_h3e, Pt)
        if need_exit:
            d_g3x, d_h3x = rows(outs.pop(0)), rows(outs.pop(0))
            dg3 = dg3 + _scatter_full(rt_x, d_g3x, Pt)
            dh3 = dh3 + _scatter_full(rt_x, d_h3x, Pt)
        z6 = jnp.zeros((Pt, 6), f32)
        d_AT_w = jnp.concatenate([z6, dg3], axis=1)[:AT.shape[0]]
        d_HT_w = jnp.concatenate([jnp.zeros((Pt, 2), f32), dh3],
                                 axis=1)[:HT.shape[0]]
    else:
        d_AT_w, d_HT_w = jnp.zeros_like(AT), jnp.zeros_like(HT)
    (d_misc,) = outs
    dm = jnp.sum(d_misc, axis=1)
    d_lights = dm[:L * 11].reshape(L, 11) if L else jnp.zeros_like(lights)
    d_dk = dm[L * 11]
    return (d_attr, d_lights, d_dk, d_oT, d_dT, d_pwrT,
            d_AT_, d_BT_, d_AT_w, d_HT_w)


# --- whole-trace backward megakernel -----------------------------------------

def _comp8(x):
    """Per-tile component relayout: lane row (1, RT) -> (8, WT) block.

    Row-major reshape puts 8 contiguous WT-lane segments of the row on
    the 8 sublanes; Mosaic lowers both directions natively (lane-concat
    of mismatched-sublane slices does NOT lower — hence reshape). WT
    should be a 128-multiple on real TPU; the caller gates on that."""
    RT = x.shape[1]
    return jnp.reshape(x, (_SUBL, RT // _SUBL))


def _compL(x):
    """Whole-trace-backward relayout: lane row (1, RT) -> (RT/128, 128).

    Unlike :func:`_comp8`, the target lane dim is pinned to the native
    128: Mosaic lowers that shape cast even for SLICED source rows at any
    RT (measured: (1,2048)->(8,256) fails infer-vector-layout,
    (1,2048)->(16,128) lowers), which is what lets the backward
    megakernel tile at 8192 lanes like the forward. At RT=1024 this is
    the original (8, 128) block."""
    RT = x.shape[1]
    w = min(RT, 128)  # tiny interpret-mode test batches
    return jnp.reshape(x, (RT // w, w))


def _compL_v3(x):
    return tuple(_compL(x[c:c + 1, :]) for c in range(3))


def _uncomp8(b):
    """Inverse of :func:`_comp8`: (8, WT) block -> (1, RT) lane row."""
    return jnp.reshape(b, (1, b.shape[0] * b.shape[1]))


def _comp_v3(x):
    return tuple(_comp8(x[c:c + 1, :]) for c in range(3))


def _uncomp_v3(v):
    return jnp.concatenate([_uncomp8(c) for c in v], axis=0)


def _trace_bwd_kernel(layout, need_exit, L, K, n_tri, tri_start, skip,
                      maps, has_gf, *refs):
    same_row = _same_row(layout, need_exit)
    refs = list(refs)
    attr = refs.pop(0)
    gattr = refs.pop(0) if has_gf else None
    if n_tri:
        ATg, HTg = refs.pop(0), refs.pop(0)
    lights_s, dk_s = refs.pop(0), refs.pop(0)
    res_r, u8_r, ctA_r, ctB_r = refs[:4]
    refs = refs[4:]
    do_o, dd_o, dattr_o = refs[:3]
    refs = refs[3:]
    if n_tri:
        dATg_o, dHTg_o = refs.pop(0), refs.pop(0)
    dmisc_o, ct_s = refs
    k = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (k == 0))
    def _zero_acc():
        dattr_o[...] = jnp.zeros_like(dattr_o)
        dmisc_o[...] = jnp.zeros_like(dmisc_o)
        if n_tri:
            dATg_o[...] = jnp.zeros_like(dATg_o)
            dHTg_o[...] = jnp.zeros_like(dHTg_o)

    # cotangent-carry scratch geometry: 10 logical rows (cto 3, ctd 3,
    # ctp 1, ctA 3) as (G, 128) component blocks, G = RT/128
    RT_ = ctA_r.shape[1]
    G = RT_ // min(RT_, 128)

    def cblk(i):
        return ct_s[G * i:G * (i + 1), :]

    @pl.when(k == 0)
    def _init_ct():
        z = jnp.zeros((G, ct_s.shape[1]), jnp.float32)
        for r in range(7):                       # cto(3) ctd(3) ctp(1)
            ct_s[G * r:G * (r + 1), :] = z
        ctA0 = _compL_v3(ctA_r[...])
        for c in range(3):
            ct_s[G * (7 + c):G * (8 + c), :] = ctA0[c]

    res = res_r[0, :, :]                                   # (CR, RT)
    u_l = u8_r[0, :, :]                                    # (8, RT)
    o_l, d_l, A_l = res[0:3, :], res[3:6, :], res[8:11, :]
    te_l = res[_R_TE:_R_TE + 1, :]
    tx_l = res[_R_TX:_R_TX + 1, :]
    row_l = res[_R_ROW:_R_ROW + 1, :]
    xrow_l = res[_R_XROW:_R_XROW + 1, :]
    row_i = row_l.astype(jnp.int32)
    xrow_i = xrow_l.astype(jnp.int32)

    # hoist the cotangent-carry reads so the dead-skip passthrough below
    # can rewrite ct_pwr without feeding the gated body its own output
    cto = tuple(cblk(c) for c in range(3))
    ctd = tuple(cblk(3 + c) for c in range(3))
    ctp = cblk(6)
    ctA = tuple(cblk(7 + c) for c in range(3))
    ctB = _compL_v3(ctB_r[...])                             # constant carry

    if skip:
        # whole-tile dead skip, mirroring the forward: the dead suffix of
        # a tile (live is monotone non-increasing, so all-dead persists
        # and is walked FIRST by the reversed grid) carries ct_o = ct_d =
        # 0 — they start zero at the deepest step, and a dead step's
        # trace outputs never read o/d — so its backward reduces to
        # ct_pwr *= dk with every accumulator contribution where-masked
        # to zero by live=0. Written as the cheap passthrough plus a
        # gated body, like the forward kernel.
        ct_s[G * 6:G * 7, :] = ctp * dk_s[0, 0]

        @pl.when(k == K - 1)
        def _dead_primary():
            do_o[...] = jnp.zeros_like(do_o)
            dd_o[...] = jnp.zeros_like(dd_o)

        body_gate = pl.when(jnp.max(res[7:8, :]) > 0.0)
    else:
        def body_gate(f):
            return f()

    P_pad, RT = attr.shape[0], o_l.shape[1]

    @body_gate
    def _bwd_body():
        # winner/exit attribute fetch, in-kernel (one one-hot MXU dot
        # each)
        iota_rows = jax.lax.broadcasted_iota(jnp.int32, (P_pad, RT), 0)

        def fetch_lane(tab, oh):
            # exact 3-pass: this fetch sets the replay's linearization
            # point (see _onehot_dot's CAUTION)
            return _onehot_dot(tab[...], oh, (((0,), (0,)), ((), ())),
                               passes=3)

        if "nofetch" in os.environ.get("MRT_BWD_ABLATE", ""):
            def fetch_lane(tab, oh):  # noqa: F811 — ablation stub
                return jnp.zeros((tab.shape[1], RT), jnp.float32)

        NC = attr.shape[1]
        use_gf = has_gf and not need_exit
        if use_gf:
            # group-keyed backward fetch: the residual rows carry the
            # sweep's EXACT winner group and object-space normal, so the
            # per-row columns come from the residual and every shared
            # column from the tiny (G_pad, NC) group table — no flat
            # (P_pad, RT) fetch (it was ~4.7 of Mesh.json's 12.7
            # ms/sample backward). ohE is still built once below, for
            # the na-column scatter.
            gb = _gf_res_base(L, need_exit, maps)
            wg_l = res[gb:gb + 1, :]
            wg_i = jnp.where(wg_l < _BIG * 0.5, wg_l, -1.0) \
                .astype(jnp.int32)
            G_pad = gattr.shape[0]
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (G_pad, RT), 0)
            ohg = (iota_g == wg_i).astype(jnp.float32)
            at_g = fetch_lane(gattr, ohg)                  # (NC, RT)
            atE_cols = []
            for c in range(NC):
                if _C_NA <= c < _C_NA + 3:
                    j = gb + 1 + (c - _C_NA)
                    atE_cols.append(_compL(res[j:j + 1, :]))
                else:
                    atE_cols.append(_compL(at_g[c:c + 1, :]))
            atE_tuple = tuple(atE_cols)
        ohE = (iota_rows == row_i).astype(jnp.float32)
        if not use_gf:
            atE_l = fetch_lane(attr, ohE)                  # (NC, RT)
            atE_tuple = tuple(_compL(atE_l[c:c + 1, :]) for c in range(NC))
        p = {"o": _compL_v3(o_l), "d": _compL_v3(d_l),
             "pwr": _compL(res[6:7, :]), "A": _compL_v3(A_l),
             "atE": atE_tuple}
        zeros8 = jnp.zeros_like(p["pwr"])
        # B enters only additively (B2 = B + A*b): its value shapes no
        # cotangent, so the replay runs it at zero instead of saving it
        p["B"] = (zeros8, zeros8, zeros8)
        ones8 = jnp.ones_like(p["pwr"])
        p["dk"] = dk_s[0, 0] * ones8
        p["lr"] = [[lights_s[li, j] * ones8 for j in range(11)]
                   for li in range(L)]
        choose_c = None
        if same_row:
            # the xrow residual slot carries the forward's refract draw;
            # the exit winner IS the entry winner, no second fetch
            choose_c = _compL(xrow_l) > 0.5
        elif need_exit:
            ohX = (iota_rows == xrow_i).astype(jnp.float32)
            atX_l = fetch_lane(attr, ohX)
            p["atX"] = tuple(_compL(atX_l[c:c + 1, :])
                             for c in range(NC))
        if n_tri:
            Pt = ATg.shape[0]
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (Pt, RT), 0)
            ohTe = (iota_t == jnp.clip(row_i - tri_start, 0, Pt - 1)
                    ).astype(jnp.float32)
            g3e_l = fetch_lane(ATg, ohTe)                  # (3, RT)
            h3e_l = fetch_lane(HTg, ohTe)                  # (1, RT)
            p["g3e"], p["h3e"] = _compL_v3(g3e_l), _compL(h3e_l)
            if need_exit:
                ohTx = (iota_t == jnp.clip(xrow_i - tri_start, 0, Pt - 1)
                        ).astype(jnp.float32)
                g3x_l = fetch_lane(ATg, ohTx)
                h3x_l = fetch_lane(HTg, ohTx)
                p["g3x"], p["h3x"] = _compL_v3(g3x_l), _compL(h3x_l)

        u = _u_logical(u_l, lambda a, j: _compL(a[j:j + 1, :]), need_exit)
        live = _compL(res[7:8, :]) > 0.5
        lok = [_compL(res[_R_LOK + li:_R_LOK + li + 1, :]) > 0.5
               for li in range(L)]

        ablate = os.environ.get("MRT_BWD_ABLATE", "")
        if "novjp" in ablate:
            # ablation: skip the replay transpose entirely — measures the
            # fetch + scatter + pipeline floor of the kernel
            g = {k: jax.tree_util.tree_map(jnp.zeros_like, v)
                 for k, v in p.items()}
        else:
            tex_sv = None
            if maps:
                # saved texel values (piecewise-constant — see
                # _tex_res_rows_side): entry side rows, then exit side
                jrow = [_R_LOK + L]

                def take_side():
                    vals = []
                    for s in _tex_slots(maps):
                        n = 3 if s == 0 else 1
                        j0 = jrow[0]
                        rowsv = [_compL(res[j0 + c:j0 + c + 1, :])
                                 for c in range(n)]
                        jrow[0] = j0 + n
                        vals.append((s, tuple(rowsv) if s == 0
                                     else rowsv[0]))
                    return vals

                tex_sv = {"e": take_side(),
                          "x": take_side() if need_exit else None}
            if os.environ.get("MRT_BWD_HAND", "1") == "1":
                # hand-derived transpose: ~2F vector ops vs the machine
                # replay's ~3F (primal + mechanical transpose); equality
                # vs the machine path pinned by
                # test_hand_bwd_matches_machine
                if same_row:
                    g = _step_comp_bwd_same(
                        layout, L, p, u, live, _compL(te_l),
                        _compL(tx_l), _compL(row_l), choose_c, lok,
                        (cto, ctd, ctp, ctA, ctB),
                        maps=maps, tex_sv=tex_sv)
                else:
                    g = _step_comp_bwd(layout, need_exit, L, p, u, live,
                                       _compL(te_l), _compL(tx_l),
                                       _compL(row_l), _compL(xrow_l),
                                       lok, (cto, ctd, ctp, ctA, ctB),
                                       maps=maps, tex_sv=tex_sv)
            else:
                primal = partial(_step_comp, layout, need_exit, L,
                                 u=u, live=live, te_sv=_compL(te_l),
                                 tx_sv=_compL(tx_l), row=_compL(row_l),
                                 xrow=_compL(xrow_l), lok=lok,
                                 analytic="nowt" not in ablate,
                                 maps=maps, tex_sv=tex_sv,
                                 same_row=same_row, choose_sv=choose_c)
                _, vjp = jax.vjp(lambda pp: primal(pp)[:5], p)
                g = vjp((cto, ctd, ctp, ctA, ctB))[0]

        for c in range(3):
            ct_s[G * c:G * (c + 1), :] = g["o"][c]
            ct_s[G * (3 + c):G * (4 + c), :] = g["d"][c]
            ct_s[G * (7 + c):G * (8 + c), :] = g["A"][c]
        ct_s[G * 6:G * 7, :] = g["pwr"]

        # scatter cotangents: contract the (C, RT) cotangent rows against
        # the SAME (P, RT) one-hots the fetch built (lane-dim contraction,
        # dims ((1,),(1,))), accumulating into resident (C, P) output
        # blocks across the grid. The earlier transposed-one-hot scheme
        # (reshape idx to an (RT, 1) column, iota-compare an (RT, P)
        # matrix) built O(RT/8) vector registers PER STEP just for the
        # one-hot — at an 8192-lane tile that was ~2 ms/sample, dwarfing
        # the replay itself.
        def scat(ct_comps, oh):
            rows = jnp.concatenate([_uncomp8(c) for c in ct_comps], axis=0)
            return _onehot_dot(rows, oh, (((1,), (1,)), ((), ())))

        if "noscat" in ablate:
            d_at = jnp.zeros_like(dattr_o)
        else:
            # the gf path scatters per-row like the flat path (fr/ip/r/na
            # columns pull back to PER-ROW leaves — frames, inst_pos,
            # prim_r rows are replicated per primitive, so a group-table
            # fold would concentrate their gradients on one row; round-5
            # bug caught by grad_check --scene Mesh, inst_dir rel 3.8) —
            # only the FETCH side uses the group table
            d_at = scat([g["atE"][c] for c in range(NC)], ohE)
            if need_exit and not same_row:
                d_at = d_at + scat([g["atX"][c] for c in range(NC)],
                                   ohX)
        dattr_o[...] += d_at
        if n_tri:
            dg = scat(g["g3e"], ohTe)                       # (3, Pt)
            dh = scat([g["h3e"]], ohTe)                     # (1, Pt)
            if need_exit:
                dg = dg + scat(g["g3x"], ohTx)
                dh = dh + scat([g["h3x"]], ohTx)
            dATg_o[...] += dg
            dHTg_o[...] += dh

        for li in range(L):
            for j in range(11):
                r = li * 11 + j
                dmisc_o[r:r + 1, :] += jnp.sum(g["lr"][li][j], axis=0,
                                               keepdims=True)
        dmisc_o[L * 11:L * 11 + 1, :] += jnp.sum(g["dk"], axis=0,
                                                 keepdims=True)

        @pl.when(k == K - 1)
        def _primary():
            do_o[...] = _uncomp_v3(g["o"])
            dd_o[...] = _uncomp_v3(g["d"])


def _call_trace_bwd(layout, need_exit, L, K, consts, attr, lights, dk,
                    res, u8s, ctA, ctB, maps=None, gattr=None):
    """Whole-trace backward: returns (d_attr, d_lights, d_dk, d_oT, d_dT,
    d_AT, d_HT) for the trace's differentiable inputs. With ``gattr``
    (entry-only group scenes) the attribute FETCH runs off the group
    table + residual winner group/normal rows; the cotangent scatter
    stays PER-ROW into ``d_attr`` (fr/ip/r/na columns pull back to
    per-row leaves — frames, inst_pos, prim_r are replicated per
    primitive row), and the side table itself gets a zero cotangent."""
    segs, tri_start, n_tri = layout
    AT, HT = consts[6], consts[7]
    ATp = pallas_tri._pad_p(AT)
    HTp = pallas_tri._pad_p(HT)
    Rp = ctA.shape[1]
    P_pad = attr.shape[0]
    MR = _misc_rows(L)
    has_gf = gattr is not None and not need_exit
    if gattr is not None and need_exit:
        gattr = None  # exit-side normals are not saved; flat fetch
    CR = _res_rows(L, need_exit, maps, gf=gattr is not None)
    dk_s = jnp.asarray(dk, jnp.float32).reshape(1, 1)
    # 16384 lanes fit only the lean bodies: textured replays carry the
    # atlas split blocks + dual-side texel chains and overflow scoped
    # VMEM at 16384 (dof: 17.1M vs the 16M limit) — keep them at 8192
    # unless MRT_TRACE_BWD_RT explicitly overrides (experiments with a
    # raised --xla_tpu_scoped_vmem_limit_kib)
    want = (min(_TILE_TBWD, 8192)
            if maps and "MRT_TRACE_BWD_RT" not in os.environ
            else _TILE_TBWD)
    RT = _pick_tile(want, Rp)
    # the in-kernel winner fetch/scatter keeps ~(rows, RT) f32 one-hot
    # operands (attr + tri-plane tables, entry and exit sides) on the
    # scoped-VMEM stack: wide tables shrink the lane tile instead of
    # falling back to the per-step scan (Mesh: 2056 rows -> RT 512)
    rows_oh = P_pad + (pallas_tri._pad_p(consts[6]).shape[0] if n_tri
                       else 0)
    # floor 1024: the (1, RT) -> (RT/128, 128) component relayout needs
    # >= 8 target sublanes to lower (Mosaic shape-cast limitation)
    while RT > 1024 and rows_oh * RT * 8 > 12 * 2 ** 20:
        RT //= 2
    # component blocks are (RT/128, 128): the misc accumulator and the
    # ct scratch are sized by the native 128-lane width and the block
    # sublane count G
    WT = min(RT, 128)
    G = RT // WT
    f32 = jnp.float32

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def cspec(arr):
        return pl.BlockSpec(arr.shape, lambda i, k: (0,) * arr.ndim)

    r3 = pl.BlockSpec((3, RT), lambda i, k: (0, i))
    resspec = pl.BlockSpec((1, CR, RT), lambda i, k: (K - 1 - k, 0, i))
    NU = n_uni(need_exit)
    u8spec = pl.BlockSpec((1, NU, RT), lambda i, k: (K - 1 - k, 0, i))
    acc = lambda shape: pl.BlockSpec(shape, lambda i, k: (0, 0))

    in_specs = [cspec(attr)]
    args = [attr]
    if has_gf:
        in_specs.append(cspec(gattr))
        args.append(gattr)
    if n_tri:
        ATg, HTg = ATp[:, 6:9], HTp[:, 2:3]
        in_specs += [cspec(ATg), cspec(HTg)]
        args += [ATg, HTg]
    in_specs += [smem, smem, resspec, u8spec, r3, r3]
    args += [lights, dk_s, res, u8s, ctA, ctB]

    NC = attr.shape[1]
    out_shapes = [jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((3, Rp), f32),
                  jax.ShapeDtypeStruct((NC, P_pad), f32)]
    out_specs = [r3, r3, acc((NC, P_pad))]
    if n_tri:
        Pt = ATp.shape[0]
        out_shapes += [jax.ShapeDtypeStruct((3, Pt), f32),
                       jax.ShapeDtypeStruct((1, Pt), f32)]
        out_specs += [acc((3, Pt)), acc((1, Pt))]
    out_shapes.append(jax.ShapeDtypeStruct((MR, WT), f32))
    out_specs.append(acc((MR, WT)))

    skip = os.environ.get("MRT_STEP_SKIP", "1") == "1"
    kern = partial(_trace_bwd_kernel, layout, need_exit, L, K, n_tri,
                   tri_start, skip, maps, has_gf)
    outs = list(pl.pallas_call(
        kern,
        grid=(Rp // RT, K),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((10 * G, WT), f32)],
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(*args))

    d_oT, d_dT, d_attr_t = outs[:3]
    d_attr = d_attr_t.T
    outs = outs[3:]
    if n_tri:
        dg3, dh3 = outs.pop(0).T, outs.pop(0).T
        z6 = jnp.zeros((dg3.shape[0], 6), f32)
        d_AT_w = jnp.concatenate([z6, dg3], axis=1)[:AT.shape[0]]
        d_HT_w = jnp.concatenate([jnp.zeros((dh3.shape[0], 2), f32), dh3],
                                 axis=1)[:HT.shape[0]]
    else:
        d_AT_w, d_HT_w = jnp.zeros_like(AT), jnp.zeros_like(HT)
    (d_misc,) = outs
    dm = jnp.sum(d_misc, axis=1)
    d_lights = dm[:L * 11].reshape(L, 11) if L else jnp.zeros_like(lights)
    d_dk = dm[L * 11]
    return d_attr, d_lights, d_dk, d_oT, d_dT, d_AT_w, d_HT_w


_TRACE_FNS: dict = {}


def _get_trace_fn(layout, need_exit, L, K, side_mode, maps=None):
    """Custom-vjp whole-trace: (consts, attr, gattr?, lights, dk, oT, dT,
    u8s[, TEXT, metaf]) -> (A (3,Rp), B (3,Rp), first_live (1,Rp)).
    ``gattr`` is derived from ``attr`` outside (a gather), used by the
    FORWARD kernels only; it gets a zero cotangent because the backward
    kernel's analytic d_attr is already the complete gradient w.r.t. the
    table (the gather's own transpose would double-count). With ``maps``
    the split atlas ``TEXT`` and the f32-cast shape table ``metaf`` ride
    as trailing args; both are constants of the trace (the nearest-texel
    fetch is piecewise-constant — see :func:`enabled_for`) and get zero
    cotangents."""
    key = (layout, need_exit, L, K, side_mode, maps)
    if key in _TRACE_FNS:
        return _TRACE_FNS[key]

    def split(args):
        tex = None
        if maps is not None:
            tex = (args[-2], args[-1])
            args = args[:-2]
        if side_mode:
            return args[0], args[1], args[2], args[3:], tex
        return args[0], args[1], None, args[2:], tex

    def side_kw(side):
        if side_mode == "g":
            return {"gattr": side}
        if side_mode == "2":
            return {"attr2": side}
        return {}

    @jax.custom_vjp
    def fn(*args):
        consts, attr, side, (lights, dk, oT, dT, u8s), tex = split(args)
        return _call_trace(layout, need_exit, L, K, consts, attr, lights,
                           dk, oT, dT, u8s, tex=tex, maps=maps,
                           **side_kw(side))

    def fn_fwd(*args):
        consts, attr, side, (lights, dk, oT, dT, u8s), tex = split(args)
        A, B, fl, res = _call_trace(layout, need_exit, L, K, consts, attr,
                                    lights, dk, oT, dT, u8s, train=True,
                                    tex=tex, maps=maps, **side_kw(side))
        return (A, B, fl), (consts, attr, side, lights, dk, res, u8s, tex)

    def fn_bwd(resid, cts):
        consts, attr, side, lights, dk, res, u8s, tex = resid
        ctA, ctB, _ctfl = cts
        gf = side_mode == "g" and not need_exit
        (d_attr, d_lights, d_dk, d_oT, d_dT, d_AT,
         d_HT) = _call_trace_bwd(layout, need_exit, L, K, consts, attr,
                                 lights, dk, res, u8s, ctA, ctB,
                                 maps=maps, gattr=side if gf else None)
        d_consts = (jnp.zeros_like(consts[0]), jnp.zeros_like(consts[1]),
                    jnp.zeros_like(consts[2]), jnp.zeros_like(consts[3]),
                    jnp.zeros_like(consts[4]), jnp.zeros_like(consts[5]),
                    d_AT, d_HT, jnp.zeros_like(consts[8]),
                    None if consts[9] is None
                    else jnp.zeros_like(consts[9]))
        out = (d_consts, d_attr)
        if side_mode:
            # side tables (group table / block-rearranged copy) are
            # derived from attr OUTSIDE; the in-kernel d_attr is already
            # the complete table gradient, so they get zero cotangents
            out = out + (jnp.zeros_like(side),)
        out = out + (d_lights, d_dk, d_oT, d_dT, jnp.zeros_like(u8s))
        if maps is not None:
            out = out + (jnp.zeros_like(tex[0]), jnp.zeros_like(tex[1]))
        return out

    fn.defvjp(fn_fwd, fn_bwd)
    _TRACE_FNS[key] = fn
    return fn


def trace_enabled(scene, Rp, inference=False) -> bool:
    """Whole-trace kernel eligibility on top of :func:`enabled_for`.

    Inference traces run at any padded width; training additionally needs
    the backward tile's component width (RT/8) lane-aligned on real TPU,
    i.e. Rp a multiple of 1024, and a prim table narrow enough that the
    backward kernel's in-kernel (P_pad, 1024) one-hot fetch/scatter fits
    scoped VMEM (the 1024-lane tile is fixed by the relayout alignment, so
    wide tables can't shrink it — Instance-class scenes fall back to the
    per-step scan, whose backward fetches outside the kernel).
    ``MRT_TRACE_KERNEL=0`` falls back to the per-step scan."""
    if os.environ.get("MRT_TRACE_KERNEL", "1") != "1":
        return False
    if not enabled_for(scene, inference=inference):
        return False
    if inference:
        return True
    # training tables up to _MAX_GRAD_ROWS run in-kernel: the backward
    # tile shrinks with the table (see _call_trace_bwd's rows_oh clamp)
    # instead of falling back to the per-step scan
    if _padded_rows(scene.kind_counts) > _MAX_GRAD_ROWS and not _interpret():
        return False
    return _interpret() or Rp % (_SUBL * 128) == 0


def trace_packed(scene, consts, attr, lights, decay, oT, dT, u8s,
                 tex=None, inference=False, gattr=None, attr2=None):
    """Whole-trace entry point on lane-major primaries; the scan-free
    replacement for bounce+1 :func:`step_packed` calls. Returns
    (A (3,Rp), B (3,Rp), first_live (1,Rp) f32)."""
    layout = _seg_layout(scene.kind_counts)
    K = u8s.shape[0]
    maps, tex_args = None, ()
    if tex is not None:
        maps = (tuple(scene.map_slots), int(tex[1].shape[0]),
                tuple(scene.mapped_kinds))
        if inference:
            return _call_trace(layout, scene.any_refract, scene.n_lights, K,
                               consts, attr, lights,
                               jnp.asarray(decay, jnp.float32), oT, dT, u8s,
                               tex=tex, maps=maps, gattr=gattr, attr2=attr2)
        # training: the shape table rides as f32 (custom_vjp cotangents
        # must be floats; the kernels re-cast entries to int32 on read)
        tex_args = (tex[0], tex[1].astype(jnp.float32))
    side = gattr if gattr is not None else attr2
    side_mode = "g" if gattr is not None else ("2" if attr2 is not None
                                               else None)
    fn = _get_trace_fn(layout, scene.any_refract, scene.n_lights, K,
                       side_mode, maps)
    gf = (side,) if side is not None else ()
    return fn(consts, attr, *gf, lights, jnp.asarray(decay, jnp.float32),
              oT, dT, u8s, *tex_args)


def trace_segment(scene, consts, attr, lights, decay, oT, dT, u8s,
                  tex=None, c0=None, gattr=None, attr2=None):
    """One segment of a whole-trace render (INFERENCE only, no VJP).

    Like :func:`trace_packed` but resumable: with ``c0`` (the (14, Rp)
    carry a previous segment returned, lane-permuted however the caller
    likes) the kernel continues mid-trace; always returns
    ``(A, B, first_live, carry (14, Rp))`` so the caller can compact live
    lanes first between segments (`tracer.trace_fused`)."""
    layout = _seg_layout(scene.kind_counts)
    K = u8s.shape[0]
    maps = None
    if tex is not None:
        maps = (tuple(scene.map_slots), int(tex[1].shape[0]),
                tuple(scene.mapped_kinds))
    return _call_trace(layout, scene.any_refract, scene.n_lights, K,
                       consts, attr, lights, jnp.asarray(decay, jnp.float32),
                       oT, dT, u8s, tex=tex, maps=maps, c0=c0,
                       want_cout=True, gattr=gattr, attr2=attr2)


# --- differentiable wrapper -------------------------------------------------

_STEP_FNS: dict = {}


def _get_step_fn(layout, need_exit, L, side_mode=None):
    """Custom-vjp bounce step on LANE-MAJOR carries (o/d/A/B (3,Rp),
    pwr/live (1,Rp), u8 (8,Rp); Rp a multiple of `_TILE_PAD`). The scan in
    `tracer.trace_fused` carries exactly these rows, so neither direction
    pays per-step transposes."""
    key = (layout, need_exit, L, side_mode)
    if key in _STEP_FNS:
        return _STEP_FNS[key]

    def split(args):
        if side_mode:
            return args[0], args[1], args[2], args[3:]
        return args[0], args[1], None, args[2:]

    def side_kw(side):
        if side_mode == "g":
            return {"gattr": side}
        if side_mode == "2":
            return {"attr2": side}
        return {}

    @jax.custom_vjp
    def fn(*args):
        consts, attr, side, (lights, dk, oT, dT, pwrT, liveT, AT_r, BT_r,
                             u8) = split(args)
        return _call_step(layout, need_exit, L, consts, attr, lights, dk,
                          oT, dT, pwrT, liveT, AT_r, BT_r, u8,
                          **side_kw(side))

    def fn_fwd(*args):
        consts, attr, side, (lights, dk, oT, dT, pwrT, liveT, AT_r, BT_r,
                             u8) = split(args)
        out, resid = _call_step(layout, need_exit, L, consts, attr, lights,
                                dk, oT, dT, pwrT, liveT, AT_r, BT_r, u8,
                                train=True, **side_kw(side))
        te, tx, row, xrow = resid[:4]
        lok = resid[4] if L else te  # placeholder when L == 0
        res_lane = (oT, dT, pwrT, liveT, AT_r, BT_r, u8,
                    te, tx, row, xrow, lok)
        res = (attr, side, lights, dk, res_lane, consts)
        return out, res

    def fn_bwd(res, cts):
        attr, side, lights, dk, res_lane, consts = res
        AT, HT = consts[6], consts[7]
        ct = (cts[0], cts[1], cts[2], cts[4], cts[5])  # live2 ct dropped
        (d_attr, d_lights, d_dk, d_oT, d_dT, d_pwrT, d_AT_r, d_BT_r,
         d_AT, d_HT) = _call_step_bwd(layout, need_exit, L, AT, HT, attr,
                                      lights, dk, res_lane, ct)
        d_consts = (jnp.zeros_like(consts[0]), jnp.zeros_like(consts[1]),
                    jnp.zeros_like(consts[2]), jnp.zeros_like(consts[3]),
                    jnp.zeros_like(consts[4]), jnp.zeros_like(consts[5]),
                    d_AT, d_HT, jnp.zeros_like(consts[8]),
                    None if consts[9] is None
                    else jnp.zeros_like(consts[9]))
        live_ct = jnp.zeros_like(d_pwrT)
        u8_ct = jnp.zeros((n_uni(need_exit), d_pwrT.shape[1]),
                          d_pwrT.dtype)
        out = (d_consts, d_attr)
        if side_mode:
            out = out + (jnp.zeros_like(side),)
        return out + (d_lights, d_dk,
                      d_oT, d_dT, d_pwrT, live_ct, d_AT_r, d_BT_r, u8_ct)

    fn.defvjp(fn_fwd, fn_bwd)
    _STEP_FNS[key] = fn
    return fn


def step_packed(scene, consts, attr, lights, decay, rayT, A_T, B_T, u8,
                tex=None, gattr=None, attr2=None):
    """Lane-major bounce step from pre-packed tables (the scan hot path).

    ``rayT`` = (oT (3,Rp), dT (3,Rp), pwrT (1,Rp), liveT (1,Rp) f32);
    returns (rayT2, A_T2, B_T2) with liveT2 as 0/1 floats. With ``tex``
    (textured scenes) the call is inference-only — no custom VJP.
    """
    oT, dT, pwrT, liveT = rayT
    layout = _seg_layout(scene.kind_counts)
    if tex is not None:
        maps = (tuple(scene.map_slots), int(tex[1].shape[0]),
                tuple(scene.mapped_kinds))
        o2, d2, pwr2, live2, A2, B2 = _call_step(
            layout, scene.any_refract, scene.n_lights, consts, attr,
            lights, jnp.asarray(decay, jnp.float32),
            oT, dT, pwrT, liveT, A_T, B_T, u8, tex=tex, maps=maps,
            gattr=gattr, attr2=attr2)
    else:
        side = gattr if gattr is not None else attr2
        side_mode = "g" if gattr is not None else ("2" if attr2 is not None
                                                   else None)
        fn = _get_step_fn(layout, scene.any_refract, scene.n_lights,
                          side_mode)
        gf = (side,) if side is not None else ()
        o2, d2, pwr2, live2, A2, B2 = fn(
            consts, attr, *gf, lights, jnp.asarray(decay, jnp.float32),
            oT, dT, pwrT, liveT, A_T, B_T, u8)
    return (o2, d2, pwr2, live2), A2, B2


def lane_pad(R):
    """Rays are padded to a multiple of the largest step-kernel tile
    (production batch sizes), or to a 128-lane multiple for small batches
    — `_pick_tile` then shrinks the kernel tile to match."""
    unit = _TILE_PAD if R >= _TILE_PAD else 128
    return (-R) % unit


def step(scene, frames, decay, ray, A, B, u, u_emit, tri_pack=None):
    """One fused bounce step (row-major convenience API, used by tests).

    ``ray`` = (o, d, pwr, live_bool); returns (ray2, A2, B2, live2_bool)
    exactly like the jnp reference. Forward is the bounce-step megakernel;
    backward is the sweep-free backward megakernel (residual replay
    differentiated in-kernel). The production path (`tracer.trace_fused`)
    uses :func:`step_packed` to keep the scan carry lane-major.
    """
    o, d, pwr, live = ray
    layout = _seg_layout(scene.kind_counts)
    tri_pack_ = tri_pack
    if tri_pack_ is None and layout[2]:
        from . import intersect

        tri_pack_ = intersect.triangle_pack(scene, frames)
    consts, attr, gattr, attr2, lights, tex = pack_step(scene, frames,
                                                        tri_pack_)
    if scene.any_refract:
        u8 = jnp.concatenate([u.T, u_emit[None]], axis=0)
    else:  # packed rows [u0 u1 u2 u_emit] (see n_uni)
        u8 = jnp.concatenate([u[:, :3].T, u_emit[None]], axis=0)
    R = o.shape[0]
    pad = lane_pad(R)
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        pwr = jnp.pad(pwr, ((0, pad),))
        live = jnp.pad(live, ((0, pad),))
        A = jnp.pad(A, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        u8 = jnp.pad(u8, ((0, 0), (0, pad)))
    rayT = (o.T, d.T, pwr[None], live.astype(jnp.float32)[None])
    rayT2, A2, B2 = step_packed(scene, consts, attr, lights, decay,
                                rayT, A.T, B.T, u8, tex=tex, gattr=gattr,
                                attr2=attr2)
    o2, d2, pwr2, live2 = rayT2
    return ((o2.T[:R], d2.T[:R], pwr2[0, :R], live2[0, :R] > 0.5),
            A2.T[:R], B2.T[:R], live2[0, :R] > 0.5)
