"""Wavefront path tracer: fixed-depth bounce scan + reverse shading fold.

The reference traces each pixel with a recursive-iterator bounce loop
(``RaytraceIterator::next``, /root/reference/src/rt.rs:1014-1066) and then
folds the collected path back-to-front in ``reduce_light`` (rt.rs:956-994).
The TPU-native shape is the same computation over a *batch* of rays:

* forward: ``lax.scan`` of length ``bounce+1`` carrying ray SoA state with a
  live mask (no early exit — dead lanes are masked), emitting one per-bounce
  hit record;
* backward: ``lax.scan(reverse=True)`` over the records implementing the
  reverse fold, including the stochastic emit termination and the exact
  shading constants (80% dielectric diffuse, 0.85 refraction cap, 0.5
  indirect, spec^32, eta = 1 + 0.5*glass, pwr decay 1-loss).

Everything is differentiable w.r.t. the scene's float leaves; stochastic
branch *choices* are comparisons (no gradient path), while the chosen values
carry gradients — the standard detached-control estimator.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops import intersect, linalg, rng
from ..ops.linalg import EPS
from .compiler import CameraArrays, SceneArrays
from . import camera as camera_mod
from . import schema


def _closest_hit(scene, frames, o, d, tri_pack=None):
    """All-kind fused Pallas closest-hit on TPU; triangle-segment Pallas
    reduction for oversized meshes; dense jnp sweep otherwise
    (CPU/tests). Two superseded kernel generations (a per-ray SMEM-table
    loop and a ray-tiled dense sweep) were removed in round 4 — their
    measured lessons live in BASELINE.md ("superseded kernels")."""
    from ..ops import pallas_hit3, pallas_tri

    if pallas_hit3.enabled_for(scene):
        return pallas_hit3.closest_hit(scene, frames, o, d,
                                       need_exit=scene.any_refract,
                                       tri_pack=tri_pack)
    if pallas_tri.enabled_for(scene):
        return intersect.closest_hit_tri_pallas(scene, frames, o, d,
                                                need_exit=scene.any_refract,
                                                tri_pack=tri_pack)
    return intersect.closest_hit(scene, frames, o, d,
                                 need_exit=scene.any_refract,
                                 tri_pack=tri_pack)


def _any_hit(scene, frames, o, d, tri_pack=None):
    """Occlusion query for shadow rays (boolean, gradient-free)."""
    from ..ops import pallas_hit3

    if pallas_hit3.enabled_for(scene):
        return pallas_hit3.any_hit(scene, frames, o, d, tri_pack=tri_pack)
    return intersect.any_hit(scene, frames, o, d, tri_pack=tri_pack)


def _resort_on(scene: SceneArrays) -> bool:
    """Whether to re-sort rays between bounce steps (see _resort_perm).

    ``MRT_RESORT=1`` forces it on, ``0`` off. Default: OFF — measured a
    2x LOSS on Mesh.json (1.64M vs 3.28M rays/s, TPU v5e): the per-step
    argsort plus ~10 lane gathers cost more than the tile-uniform culling
    they re-enable recovers, because interior live tiles stay live after
    a diffuse bounce regardless of ordering (BASELINE.md round-2 table).
    Kept opt-in: radiance is bitwise-identical either way, and scenes
    with sparser live sets may yet profit.
    """
    import os

    v = os.environ.get("MRT_RESORT", "auto")
    if v in ("0", "1"):
        return v == "1"
    return False


def _resort_perm(ox, oy, oz, dx, dy, dz, live):
    """Lane permutation restoring wavefront coherence mid-trace.

    Sort key: live rays first, ordered by Morton cell of the ray origin
    inside the live wavefront's bounding box (8^3 grid) then direction
    octant; dead rays last. Applying it between bounce steps makes each
    kernel ray tile spatially tight again, so the step kernel's
    tile-uniform work elision (whole-tile dead skip, triangle super-block
    AABB culling) keeps firing after diffuse bounces scatter the rays the
    camera laid out coherently. The reference never needs this: its
    per-ray recursion (rt.rs:1014-1066) has no SIMD tiles to keep uniform.

    All inputs are (R,) vectors (lane-major rows sliced by the caller);
    returns an int32 (R,) permutation, stable within equal keys.
    """
    alive = live > 0.5
    big = jnp.float32(3.4e38)

    def axis_cell(v):
        lo = jnp.min(jnp.where(alive, v, big))
        hi = jnp.max(jnp.where(alive, v, -big))
        span = jnp.maximum(hi - lo, 1e-6)
        c = ((v - lo) / span * 8.0).astype(jnp.int32)
        return jnp.clip(c, 0, 7)

    def spread3(v):  # 3-bit value -> bits at positions 0, 3, 6
        return (v & 1) | ((v & 2) << 2) | ((v & 4) << 4)

    morton = (spread3(axis_cell(ox)) | (spread3(axis_cell(oy)) << 1)
              | (spread3(axis_cell(oz)) << 2))
    octant = ((dx > 0).astype(jnp.int32) * 4 + (dy > 0).astype(jnp.int32) * 2
              + (dz > 0).astype(jnp.int32))
    key = jnp.where(alive, morton * 8 + octant, jnp.int32(1 << 30))
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def _compact_cuts(scene: SceneArrays, steps: int, inference: bool):
    """Step indices where the whole-trace render compacts live lanes first.

    Deep bounces in open scenes are straggler-bound: on Mesh.json at
    bounce 8 only ~2% of lanes are live but ~54% of 512-lane kernel tiles
    still hold at least one (measured, BASELINE.md) — every such tile pays
    full sweeps for a handful of rays. Splitting the whole-trace kernel at
    a few depths and packing live lanes first between segments turns tile
    occupancy back into lane occupancy for the remaining bounces, at the
    cost of one carry round-trip + gathers per cut. A cumsum partition —
    NOT the argsort that made MRT_RESORT a loss — and each ray keeps its
    uniform stream (ids ride along), so radiance is bit-identical.

    Default: inference-only, scenes with a triangle segment OR a
    cull-eligible sphere segment (their sweeps are the expensive ones,
    and both scene classes are open — lanes die to the sky; Instance.json
    measured 2.62 -> 3.93M rays/s from compaction alone, round 5).
    Closed small scenes keep lanes live and would only pay.
    ``MRT_COMPACT=0`` disables, ``=1`` forces for all scenes;
    ``MRT_COMPACT_AT`` overrides the cut depths."""
    import os

    from ..ops import pallas_hit3

    if not inference:
        return []
    env = os.environ.get("MRT_COMPACT", "")
    if env == "0":
        return []
    sph_cull = pallas_hit3._sph_cull_rows(
        pallas_hit3._seg_layout(scene.kind_counts)) is not None
    if env != "1" and not (scene.kind_counts[schema.KIND_TRIANGLE]
                           or sph_cull):
        return []
    # measured defaults: {3,6} best on Mesh.json (16.6 ms/sample vs 16.8+
    # for the variants, round 4); sphere-cull scenes prefer one more cut
    # ({2,4,6}: Instance 4.10M vs 3.93M rays/s, round 5)
    default_at = "2,4,6" if sph_cull and not \
        scene.kind_counts[schema.KIND_TRIANGLE] else "3,6"
    at = os.environ.get("MRT_COMPACT_AT", default_at)
    cuts = sorted({int(x) for x in at.split(",") if x.strip()})
    return [c for c in cuts if 0 < c < steps]


def _compact_perm(live_row):
    """Stable live-first lane partition of a (Rp,) 0/1 float row.

    ``perm[slot] = lane``: live lanes keep their relative order in the
    leading slots, dead lanes follow. No argsort, and no O(Rp) serial
    cumsum either (a 131k 1D scan measured ~0.5 ms on v5e): the prefix
    sums run two-level — an intra-row scan of the (Rp/512, 512) reshape
    as an MXU matmul against a triangular ones matrix (both sides 0/1 or
    exact small ints, so the TPU's default bf16 truncation is exact),
    plus a tiny cross-row scan."""
    Rp = live_row.shape[0]
    T = 512
    if Rp % T:                                 # tiny test batches
        T = 128 if Rp % 128 == 0 else 1
    a2 = (live_row > 0.5).reshape(-1, T)
    af = a2.astype(jnp.float32)
    # inclusive scan along rows: af @ upper-triangular ones
    tri = jnp.triu(jnp.ones((T, T), jnp.float32))
    ic = jax.lax.stop_gradient(jax.lax.dot(af, tri)).astype(jnp.int32) \
        - a2.astype(jnp.int32)                 # exclusive intra-row ranks
    row_n = ic[:, -1:] + a2[:, -1:].astype(jnp.int32)      # live per row
    row_off = jnp.cumsum(row_n[:, 0]) - row_n[:, 0]        # (rows,) small
    na = row_off[-1] + row_n[-1, 0]
    dic = (jnp.arange(T, dtype=jnp.int32)[None, :] - ic)   # dead ranks
    drow_n = T - row_n
    drow_off = jnp.cumsum(drow_n[:, 0]) - drow_n[:, 0]
    pos = jnp.where(a2, row_off[:, None] + ic,
                    na + drow_off[:, None] + dic)
    return jnp.zeros((Rp,), jnp.int32).at[pos.reshape(-1)].set(
        jnp.arange(Rp, dtype=jnp.int32))


def _keyed_perm(key_row, n_keys):
    """Stable ascending partition of a (Rp,) small-int key row — the
    counting-sort generalization of :func:`_compact_perm` (which is the
    2-key case), one masked two-level prefix sum per key value. Used by
    the octant-sorted compaction (``MRT_COMPACT_KEY=oct``): sorting live
    lanes by direction octant at a cut re-coheres diffuse wavefronts so
    the next segment's tile-uniform slab culling can fire, at the cost
    of ``n_keys`` prefix passes instead of one."""
    Rp = key_row.shape[0]
    T = 512
    if Rp % T:                                 # tiny test batches
        T = 128 if Rp % 128 == 0 else 1
    k2 = key_row.reshape(-1, T)
    tri = jnp.triu(jnp.ones((T, T), jnp.float32))
    pos = jnp.zeros(k2.shape, jnp.int32)
    base = jnp.int32(0)
    for k in range(n_keys):
        a2 = k2 == k
        af = a2.astype(jnp.float32)
        ic = jax.lax.stop_gradient(jax.lax.dot(af, tri)).astype(jnp.int32) \
            - a2.astype(jnp.int32)
        row_n = ic[:, -1:] + a2[:, -1:].astype(jnp.int32)
        row_off = jnp.cumsum(row_n[:, 0]) - row_n[:, 0]
        pos = jnp.where(a2, base + row_off[:, None] + ic, pos)
        base = base + row_off[-1] + row_n[-1, 0]
    return jnp.zeros((Rp,), jnp.int32).at[pos.reshape(-1)].set(
        jnp.arange(Rp, dtype=jnp.int32))


def _light_dirs_to(scene: SceneArrays, point):
    """Un-normalized vector toward each light from ``point`` (rt.rs:975-978).

    point: (R,3) -> (R,L,3). For directional lights the vector is
    ``-normalize(dir)`` independent of position.
    """
    lp = scene.light_pos[None] - point[:, None, :]             # (R,L,3)
    ld = -linalg.normalize(scene.light_dir)[None]               # (1,L,3)
    return jnp.where(scene.light_is_dir[None, :, None], ld, lp)


def _bounce_step(scene: SceneArrays, frames, attrs, decay, key, carry, i,
                 tri_pack=None, u=None):
    """One wavefront bounce: closest hit, shadow rays, reflect/refract pick.

    Shared between the record-emitting path (:func:`trace_records`) and the
    fused-shading path (:func:`trace_fused`); semantics per rt.rs:1014-1066.
    Returns ``(new_carry, rec)`` where ``rec`` holds this bounce's shading
    inputs.
    """
    o, d, pwr, live = carry
    R = o.shape[0]
    P = scene.n_prims
    L = scene.n_lights
    hit = _closest_hit(scene, frames, o, d, tri_pack=tri_pack)
    live_i = live & hit.hit

    # Winner attributes arrive via one MXU one-hot matmul each (entry
    # and exit) instead of ~30 per-ray gathers — the gathers dominated
    # the step time on TPU.
    at_e = intersect.fetch_attrs(attrs, hit.idx_entry, P)

    # Keep dead lanes finite so no NaNs leak into gradients.
    te = jnp.where(live_i, hit.t_entry, 1.0)
    entry_p = o + d * te[:, None]
    n_entry = intersect.normal_from_attrs(at_e, entry_p)
    n_entry = jnp.where(jnp.isfinite(n_entry), n_entry, 0.0)
    mat_e = intersect.material_from_attrs(scene, at_e, entry_p)

    # The exit hit only matters for refraction (rt.rs:1054-1058); fully
    # opaque scenes (static any_refract=False) compile without it.
    if scene.any_refract:
        at_x = intersect.fetch_attrs(attrs, hit.idx_exit, P)
        tx = jnp.where(live_i, hit.t_exit, 1.0)
        exit_p = o + d * tx[:, None]
        n_exit = intersect.normal_from_attrs(at_x, exit_p)
        n_exit = jnp.where(jnp.isfinite(n_exit), n_exit, 0.0)
        mat_x = intersect.material_from_attrs(scene, at_x, exit_p)

    if u is None:
        u = rng.uniform(jax.random.fold_in(key, i), (R, 7))

    # per-light shadow rays from the entry hit (rt.rs:1027-1046)
    if L > 0:
        lvec = _light_dirs_to(scene, entry_p)               # (R,L,3)
        ldir = linalg.normalize(lvec)
        sorig = entry_p[:, None, :] + ldir * EPS            # Ray::cast_default
        occ = _any_hit(scene, frames,
                       sorig.reshape(R * L, 3),
                       ldir.reshape(R * L, 3),
                       tri_pack=tri_pack).reshape(R, L)
        light_ok = (~occ) & live_i[:, None]
    else:
        light_ok = jnp.zeros((R, 0), bool)

    # reflect from the entry hit (rt.rs:559-572)
    diel_e = (mat_e["metal_scalar"] == 0.0) & (mat_e["opacity"] != 0.0)
    rough_r = jnp.where(diel_e & (u[:, 0] < 0.8), 1.0, mat_e["rough"])
    nr = rng.sphere_rand(n_entry, rough_r, u[:, 1], u[:, 2])
    refl = linalg.safe_normalize(linalg.reflect(d, nr))

    if scene.any_refract:
        # refract from the exit hit (rt.rs:574-589, 1054-1058)
        diel_x = (mat_x["metal_scalar"] == 0.0) & (mat_x["opacity"] != 0.0)
        rough_f = jnp.where(diel_x & (u[:, 3] < 0.8), 1.0, mat_x["rough"])
        nf = rng.sphere_rand(n_exit, rough_f, u[:, 4], u[:, 5])
        eta = 1.0 + 0.5 * mat_x["glass"]
        refr, refr_ok = linalg.refract(d, eta, nf)
        refr = linalg.safe_normalize(refr)
        refr = jnp.where(jnp.isfinite(refr), refr, 0.0)
        choose = (u[:, 6] < jnp.minimum(1.0 - mat_e["opacity"], 0.85)) & refr_ok

        next_dir = jnp.where(choose[:, None], refr, refl)
        from_p = jnp.where(choose[:, None], exit_p, entry_p)
        pick = lambda a, b: jnp.where(
            choose[:, None] if a.ndim == 2 else choose, a, b)
        norm = pick(n_exit, n_entry)
        color = pick(mat_x["color"], mat_e["color"])
        rough = pick(mat_x["rough"], mat_e["rough"])
        metal = pick(mat_x["metal"], mat_e["metal"])
        emit = pick(mat_x["emit"], mat_e["emit"])
    else:
        # opaque scene: `choose` is always False (opacity==1 everywhere,
        # rt.rs:1054's probability is min(1-1, 0.85)=0)
        next_dir = refl
        from_p = entry_p
        norm, color = n_entry, mat_e["color"]
        rough, metal, emit = mat_e["rough"], mat_e["metal"], mat_e["emit"]

    next_orig = from_p + next_dir * EPS                     # Ray::cast
    next_pwr = pwr * decay

    rec = {
        "live": live_i,
        "p": from_p,
        "norm": norm,
        "dir": d,
        "pwr": pwr,
        "color": color,
        "rough": rough,
        "metal": metal,
        "emit": emit,
        "light_ok": light_ok,
    }
    return (next_orig, next_dir, next_pwr, live_i), rec


def _direct_light(scene: SceneArrays, rec):
    """Per-bounce direct-light term of ``reduce_light`` (rt.rs:973-987).

    ``rec`` needs p/norm/dir/rough/metal/color/light_ok; returns (R,3).
    Uses the *chosen* hit point but the entry-point shadow mask — the
    reference quirk (shadow rays cast from p0, shading from use_p).
    """
    R = rec["p"].shape[0]
    if scene.n_lights == 0:
        return jnp.zeros((R, 3), rec["p"].dtype)
    lvec = _light_dirs_to(scene, rec["p"])                      # (R,L,3)
    ln = linalg.normalize(lvec)
    diff = jnp.maximum(linalg.dot(ln, rec["norm"][:, None, :]), 0.0)
    spec = jax.lax.integer_pow(
        jnp.maximum(linalg.dot(rec["dir"][:, None, :],
                               linalg.reflect(ln, rec["norm"][:, None, :])),
                    0.0), 32) * (1.0 - rec["rough"][:, None])
    o_col = (rec["color"] * (1.0 - rec["metal"])[:, None])[:, None, :]
    contrib = (o_col * diff[..., None] * scene.light_color[None]
               + spec[..., None]) * scene.light_pwr[None, :, None]
    return jnp.sum(jnp.where(rec["light_ok"][..., None], contrib, 0.0),
                   axis=1)


def trace_records(scene: SceneArrays, frames, attrs, bounce: int,
                  orig, dirs, loss, key, remat: bool = False,
                  tri_pack=None):
    """Run the forward bounce loop, returning stacked per-bounce records.

    Args:
      scene: compiled scene.
      frames: (P,3,3) instance matrices.
      attrs: (P,K) packed attribute matrix (:func:`intersect.prim_attributes`).
      bounce: static max bounce (path length = bounce+1 records).
      orig, dirs: (R,3) primary rays (E-offset origins).
      loss: scalar energy loss per bounce.
      key: PRNG key; draws are fold_in(key, step).
      remat: checkpoint each step (for memory-lean gradients).
    Returns:
      dict of records with leading axis ``bounce+1``.
    """
    R = orig.shape[0]
    decay = 1.0 - jnp.minimum(loss, 1.0)

    def step(carry, i):
        return _bounce_step(scene, frames, attrs, decay, key, carry, i,
                            tri_pack=tri_pack)

    step_fn = jax.checkpoint(step) if remat else step
    init = (orig, dirs, jnp.ones((R,), orig.dtype), jnp.ones((R,), bool))
    _, records = jax.lax.scan(step_fn, init, jnp.arange(bounce + 1))
    return records


def _fold_update(scene: SceneArrays, rec, A, B, u_emit):
    """One forward composition step of the affine shading fold.

    ``col = A (.) col_tail + B``; per bounce B += A*b, A *= a with
    a/b per rt.rs:966-992 (see trace_fused). Returns (A2, B2).
    """
    live = rec["live"]
    b_emit = u_emit < rec["emit"]                           # rt.rs:966-970
    l_col = _direct_light(scene, rec)
    pwr_c = rec["pwr"][:, None]
    a = jnp.where(b_emit[:, None], 0.0, pwr_c * (0.5 + rec["color"]))
    b = jnp.where(b_emit[:, None], rec["color"], pwr_c * l_col)
    a = jnp.where(live[:, None], a, 1.0)
    b = jnp.where(live[:, None], b, 0.0)
    return A * a, B + A * b


def fused_step_reference(scene: SceneArrays, frames, attrs, decay,
                         ray, A, B, u, u_emit, tri_pack=None):
    """One full fused bounce step from explicit uniforms (no RNG inside).

    The semantic reference for the Pallas bounce-step megakernel — its
    custom-VJP backward replays exactly this function — and the jnp
    fallback path with injected uniforms.
    Returns (ray2, A2, B2, live2).
    """
    ray2, rec = _bounce_step(scene, frames, attrs, decay, None, ray, 0,
                             tri_pack=tri_pack, u=u)
    A2, B2 = _fold_update(scene, rec, A, B, u_emit)
    return ray2, A2, B2, rec["live"]


def trace_fused(scene: SceneArrays, frames, attrs, bounce: int,
                orig, dirs, loss, key_trace, key_shade,
                remat: bool = False, tri_pack=None,
                inference: bool = False):
    """Forward bounce loop with the shading fold composed *forward*.

    ``reduce_light`` (rt.rs:956-994) is an affine recurrence in the radiance:
    ``col_i = a_i (.) col_{i+1} + b_i`` with per-bounce coefficients

      a_i = [live] * [not emit] * pwr_i * (0.5 + color_i)
      b_i = [live] * where(emit, color_i, pwr_i * l_col_i)

    (dead lanes pass through: a=1, b=0). Composing the maps front-to-back —
    carry (A, B) with ``col = A (.) col_tail + B``; per bounce B += A*b,
    A *= a — yields the identical radiance WITHOUT materializing the
    per-bounce record stack that the reverse scan re-reads from HBM. Same
    RNG draws as trace_records+shade_records (fold_in(key_shade, i) for the
    emit test), so results match the record path up to float reassociation.
    """
    R = orig.shape[0]
    decay = 1.0 - jnp.minimum(loss, 1.0)
    steps = bounce + 1
    resort = _resort_on(scene)
    # read once at function entry, like every MRT_* knob that selects an
    # ALGORITHM: all of them are trace-time constants, so flipping the
    # env after a compile for identical shapes keeps the cached program
    # (retracing/eager callers — the tests — see the new value)
    compact_key = os.environ.get("MRT_COMPACT_KEY", "")

    from ..ops import pallas_step

    use_kernel = pallas_step.enabled_for(scene, inference=inference)
    if use_kernel and scene.has_maps and not inference:
        # textured TRAINING runs only through the whole-trace kernel (the
        # per-step scan's texel fetch has no VJP); misaligned widths /
        # wide tables fall back to the jnp path below
        use_kernel = (not resort) and pallas_step.trace_enabled(
            scene, R + pallas_step.lane_pad(R), inference=False)
    if use_kernel:
        # Megakernel path: the scan carries LANE-MAJOR rows (transpose/pad
        # once outside), the scene tables are packed once, and all bounce
        # uniforms are drawn up front as scan inputs — the per-step device
        # program is the fused kernel plus the carry plumbing, nothing
        # else. Same fold_in RNG streams as the jnp path below.
        from ..models import schema as _schema

        if tri_pack is None and scene.kind_counts[_schema.KIND_TRIANGLE]:
            tri_pack = intersect.triangle_pack(scene, frames)
        consts, attr, gattr, attr2, lights, tex = pallas_step.pack_step(
            scene, frames, tri_pack)
        pad = pallas_step.lane_pad(R)
        o_p, d_p = orig, dirs
        if pad:
            o_p = jnp.pad(orig, ((0, pad), (0, 0)))
            d_p = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
        Rp = R + pad
        # opaque scenes pack only the consumed uniform rows
        # [u0 u1 u2 u_emit] (pallas_step.n_uni) — same draws, half the
        # stack/DMA/compaction-payload traffic
        nu = pallas_step.n_uni(scene.any_refract)
        us = []
        for i in range(steps):
            u = rng.uniform(jax.random.fold_in(key_trace, i), (R, 7))
            ue = rng.uniform(jax.random.fold_in(key_shade, i), (R,))
            u_t = u.T if nu == 8 else u[:, :3].T
            u8 = jnp.concatenate([u_t, ue[None]], axis=0)
            if pad:
                u8 = jnp.pad(u8, ((0, 0), (0, pad)))
            us.append(u8)
        u8s = jnp.stack(us)                               # (steps, nu, Rp)

        if (not resort
                and pallas_step.trace_enabled(scene, Rp, inference=inference)):
            # whole-trace megakernel: all bounce+1 steps in ONE pallas_call
            # (grid = ray tiles x steps, carry in VMEM scratch) — no scan,
            # no per-step carry round-trips, residuals streamed in-kernel;
            # the backward is the matching whole-trace kernel.
            cuts = _compact_cuts(scene, steps, inference)
            if cuts:
                # segmented render with live-first compaction at the cuts
                # (see _compact_cuts); lane j holds ray rid[j], and every
                # ray keeps its uniform stream because the not-yet-consumed
                # uniform rows ride the SAME permutation as the carry.
                # TPU gather/scatter cost scales with the number of INDEX
                # ops, not bytes (131k-lane gather ~0.3 ms, scatter ~4x
                # that), so each cut does exactly one small perm-building
                # scatter and ONE fused payload gather: [carry(14) |
                # rid(1, exact f32 ints) | remaining uniforms]
                u_rem = u8s.reshape(steps * nu, Rp)
                ridf = jnp.arange(Rp, dtype=jnp.float32)[None]
                base = 0
                c0 = flT = None
                bounds = [0] + cuts + [steps]
                for s0, s1 in zip(bounds[:-1], bounds[1:]):
                    u_seg = u_rem[(s0 - base) * nu:(s1 - base) * nu]
                    A_T, B_T, fl_seg, cout = pallas_step.trace_segment(
                        scene, consts, attr, lights, decay, o_p.T, d_p.T,
                        u_seg.reshape(s1 - s0, nu, Rp), tex=tex, c0=c0,
                        gattr=gattr, attr2=attr2)
                    if s0 == 0:
                        flT = fl_seg          # ray order: seg 1 unpermuted
                    if s1 < steps:
                        if compact_key == "oct":
                            # live lanes sorted by direction octant
                            # (dead last): re-coheres diffuse wavefronts
                            # for the next segment's slab culling
                            okey = ((cout[3] > 0) + (cout[4] > 0) * 2
                                    + (cout[5] > 0) * 4).astype(jnp.int32)
                            key = jnp.where(cout[7] > 0.5, okey, 8)
                            perm = _keyed_perm(key, 9)
                        else:
                            perm = _compact_perm(cout[7])
                        payload = jnp.concatenate(
                            [cout, ridf, u_rem[(s1 - base) * nu:]], axis=0)
                        payload = payload[:, perm]
                        cout = payload[:14]
                        ridf = payload[14:15]
                        u_rem = payload[15:]
                        base = s1
                    c0 = cout
                rid = ridf[0].astype(jnp.int32)
                inv = jnp.zeros((Rp,), jnp.int32).at[rid].set(
                    jnp.arange(Rp, dtype=jnp.int32))
                A_T, B_T = A_T[:, inv], B_T[:, inv]
            else:
                A_T, B_T, flT = pallas_step.trace_packed(
                    scene, consts, attr, lights, decay, o_p.T, d_p.T, u8s,
                    tex=tex, inference=inference, gattr=gattr, attr2=attr2)
            A, B = A_T.T[:R], B_T.T[:R]
            first_live = flT[0, :R] > 0.5
            base = jnp.broadcast_to(scene.sky_color * scene.sky_pwr, (R, 3))
            col = B + A * base
            # empty path -> bare sky color, *without* pwr (rt.rs:957-959)
            return jnp.where(first_live[:, None], col,
                             jnp.broadcast_to(scene.sky_color, (R, 3)))

        def stepk(carry, xs):
            rayT, A_T, B_T, firstT, ridT = carry
            i, u8 = xs
            if resort:
                # each ray keeps its own uniform stream across permutations
                u8 = u8[:, ridT]
            rayT2, A2, B2 = pallas_step.step_packed(
                scene, consts, attr, lights, decay, rayT, A_T, B_T, u8,
                tex=tex, gattr=gattr, attr2=attr2)
            firstT = jnp.where(i == 0, rayT2[3], firstT)
            if resort:
                perm = _resort_perm(rayT2[0][0], rayT2[0][1], rayT2[0][2],
                                    rayT2[1][0], rayT2[1][1], rayT2[1][2],
                                    rayT2[3][0])
                rayT2 = tuple(a[:, perm] for a in rayT2)
                A2, B2 = A2[:, perm], B2[:, perm]
                firstT = firstT[:, perm]
                ridT = ridT[perm]
            return (rayT2, A2, B2, firstT, ridT), None

        step_fn = jax.checkpoint(stepk) if remat else stepk
        one = jnp.ones((1, Rp), orig.dtype)
        init = ((o_p.T, d_p.T, one, one),
                jnp.ones((3, Rp), orig.dtype), jnp.zeros((3, Rp), orig.dtype),
                jnp.zeros((1, Rp), orig.dtype), jnp.arange(Rp, dtype=jnp.int32))
        (_, A_T, B_T, firstT, ridT), _ = jax.lax.scan(
            step_fn, init, (jnp.arange(steps), u8s))
        if resort:
            # lane j holds ray ridT[j]: gather lanes back to ray order
            inv = jnp.zeros((Rp,), jnp.int32).at[ridT].set(
                jnp.arange(Rp, dtype=jnp.int32))
            A_T, B_T, firstT = A_T[:, inv], B_T[:, inv], firstT[:, inv]
        A, B = A_T.T[:R], B_T.T[:R]
        first_live = firstT[0, :R] > 0.5
    else:
        def step(carry, i):
            ray, A, B, first_live, rid = carry
            u = rng.uniform(jax.random.fold_in(key_trace, i), (R, 7))
            u_emit = rng.uniform(jax.random.fold_in(key_shade, i), (R,))
            if resort:
                u, u_emit = u[rid], u_emit[rid]
            ray2, A2, B2, live = fused_step_reference(
                scene, frames, attrs, decay, ray, A, B, u, u_emit,
                tri_pack=tri_pack)
            first_live = jnp.where(i == 0, live, first_live)
            if resort:
                o2, d2 = ray2[0], ray2[1]
                perm = _resort_perm(o2[:, 0], o2[:, 1], o2[:, 2],
                                    d2[:, 0], d2[:, 1], d2[:, 2],
                                    ray2[3].astype(o2.dtype))
                ray2 = tuple(a[perm] for a in ray2)
                A2, B2 = A2[perm], B2[perm]
                first_live, rid = first_live[perm], rid[perm]
            return (ray2, A2, B2, first_live, rid), None

        step_fn = jax.checkpoint(step) if remat else step
        init = ((orig, dirs, jnp.ones((R,), orig.dtype),
                 jnp.ones((R,), bool)),
                jnp.ones((R, 3), orig.dtype), jnp.zeros((R, 3), orig.dtype),
                jnp.zeros((R,), bool), jnp.arange(R, dtype=jnp.int32))
        (_, A, B, first_live, rid), _ = jax.lax.scan(step_fn, init,
                                                     jnp.arange(steps))
        if resort:
            inv = jnp.zeros((R,), jnp.int32).at[rid].set(
                jnp.arange(R, dtype=jnp.int32))
            A, B, first_live = A[inv], B[inv], first_live[inv]
    base = jnp.broadcast_to(scene.sky_color * scene.sky_pwr, (R, 3))
    col = B + A * base
    # empty path -> bare sky color, *without* pwr (rt.rs:957-959)
    return jnp.where(first_live[:, None], col,
                     jnp.broadcast_to(scene.sky_color, (R, 3)))


def shade_records(scene: SceneArrays, records, key):
    """Reverse fold of ``reduce_light`` (rt.rs:956-994) over stacked records.

    Returns (R,3) radiance per primary ray.
    """
    n_steps, R = records["live"].shape
    L = scene.n_lights
    base = jnp.broadcast_to(scene.sky_color * scene.sky_pwr, (R, 3))

    def body(col, rec_i):
        rec, i = rec_i
        k = jax.random.fold_in(key, i)
        u_emit = rng.uniform(k, (R,))
        b_emit = u_emit < rec["emit"]                           # rt.rs:966-970

        if L > 0:
            lvec = _light_dirs_to(scene, rec["p"])              # (R,L,3)
            ln = linalg.normalize(lvec)
            diff = jnp.maximum(linalg.dot(ln, rec["norm"][:, None, :]), 0.0)
            spec = jax.lax.integer_pow(
                jnp.maximum(linalg.dot(rec["dir"][:, None, :],
                                       linalg.reflect(ln, rec["norm"][:, None, :])),
                            0.0), 32) * (1.0 - rec["rough"][:, None])
            o_col = (rec["color"] * (1.0 - rec["metal"])[:, None])[:, None, :]
            contrib = (o_col * diff[..., None] * scene.light_color[None]
                       + spec[..., None]) * scene.light_pwr[None, :, None]
            l_col = jnp.sum(jnp.where(rec["light_ok"][..., None], contrib, 0.0),
                            axis=1)                              # rt.rs:973-987
        else:
            l_col = jnp.zeros((R, 3), col.dtype)

        d_col = 0.5 * col + rec["color"] * col                   # rt.rs:990
        new = jnp.where(b_emit[:, None], rec["color"],
                        (d_col + l_col) * rec["pwr"][:, None])   # rt.rs:992
        return jnp.where(rec["live"][:, None], new, col), None

    col, _ = jax.lax.scan(body, base, (records, jnp.arange(n_steps)), reverse=True)
    # empty path -> bare sky color, *without* pwr (rt.rs:957-959)
    return jnp.where(records["live"][0][:, None], col,
                     jnp.broadcast_to(scene.sky_color, (R, 3)))


def trace_radiance(scene: SceneArrays, cam: CameraArrays, render_wh,
                   bounce: int, loss, coords, key, remat: bool = False,
                   fused: bool | None = None, inference: bool = False):
    """Full per-pixel radiance: camera rays -> bounce scan -> shading fold.

    One path per coordinate; the caller accumulates samples (the reference's
    ``Sampler::execute`` outer loop, sampler.rs:28-78). The shading fold runs
    fused into the forward scan by default (:func:`trace_fused` — no record
    stack in HBM); ``fused=False`` (or ``MRT_NO_FUSE=1``) selects the
    record-emitting two-scan path, which draws the same RNG stream and agrees
    up to float reassociation.
    """
    if fused is None:
        import os

        fused = os.environ.get("MRT_NO_FUSE", "0") != "1"
    k_cam, k_trace, k_shade = jax.random.split(key, 3)
    u_aprt = rng.uniform(k_cam, (coords.shape[0], 2))
    orig, dirs = camera_mod.gen_rays(cam, render_wh, coords, u_aprt)
    frames = intersect.build_frames(scene)
    attrs = intersect.prim_attributes(scene, frames)
    # hoist the per-triangle Woop constants out of the bounce scan
    from ..models import schema as _schema
    tri_pack = None
    if intersect._use_tri_mxu(scene.kind_counts[_schema.KIND_TRIANGLE]):
        tri_pack = intersect.triangle_pack(scene, frames)
    if fused:
        return trace_fused(scene, frames, attrs, bounce, orig, dirs,
                           loss, k_trace, k_shade, remat=remat,
                           tri_pack=tri_pack, inference=inference)
    records = trace_records(scene, frames, attrs, bounce, orig, dirs,
                            loss, k_trace, remat=remat, tri_pack=tri_pack)
    return shade_records(scene, records, k_shade)
