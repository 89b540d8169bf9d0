"""Sorted wavefront renderer — per-bounce kernels over HBM ray state (Pallas+XLA).

The fused kernels (megakernel/bvh_megakernel/wavefront) keep whole paths on-chip,
which is optimal while the working set is small. For LARGE scenes the cost moves
into BVH traversal, and the tile-synchronized walk degrades with ray incoherence:
an incoherent (8,128) tile visits the UNION of the subtrees its 1024 rays touch
(~73% of all nodes measured on a 5k-tri scene vs ~2% for one ray).

This module is the classic GPU wavefront recast for TPU (SURVEY.md §7 "wavefront
formulation"), with XLA doing what GPU global-memory queues do:

  bounce loop (host-unrolled, one jit):
    1. SORT the live ray batch by (direction octant, quantized origin cell) —
       jnp.argsort + gathers, pure XLA. Rays that will traverse similar subtrees
       land in the same (8,128) tile, shrinking each tile's union (−38% node
       visits, −34% leaf tests on the 5k-tri sim). Dead rays sort to the tail,
       where whole tiles fail the root test and exit traversal after ONE node —
       stream compaction without compaction: occupancy work scales with live rays.
    2. one Pallas BOUNCE KERNEL launch over the ray tiles: tile-synchronized BVH
       traversal (shared with kernels/bvh_megakernel.py via make_traversal) +
       reference-semantics shading (make_shader), reading/writing the SoA ray
       state in HBM.

Path radiance accumulates per ray; pixels are assembled at the end with one
scatter-add keyed by the pixel id that rides along through every sort. Per-path
radiance is bit-identical to the fused BVH megakernel (same reference RNG streams
keyed by absolute (pixel, sample), same traversal order); only the per-pixel
reduction order differs (allclose, not bitwise).

MEASURED VERDICT (v5e, 5k-tri sphere_field, 256², 4 bounces, 16 spp): the HBM
state round-trips are nearly free — sort=False runs within ~10% of the fused BVH
megakernel (156 vs 140 ms) — but each in-situ sort costs ~50 ms and buys NO
kernel time: real bounce-1+ rays (origins on surfaces, cosine-distributed
directions) are already as coherent per tile as octant/cell-sorted random rays,
so the union sizes barely move. The random-ray simulation that predicted −38%
node visits does not transfer to real path distributions. Defaults therefore:
`sort=False`; the fused kernels stay the production path, and this module stands
as (a) the honest negative result, (b) the HBM-state bounce architecture needed
when scene tables outgrow VMEM, and (c) a per-bounce hook point (future NEE/MIS
stages slot between bounces here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.kernels import rng as krng
from oclpathtracer_tpu.kernels.bvh_megakernel import (
    make_shader,
    make_traversal,
    pack_bvh_scene,
)
from oclpathtracer_tpu.kernels.megakernel import (
    BLOCK,
    LANE,
    SUB,
    _camera_constants,
    _interpret,
)
from oclpathtracer_tpu.scene.types import Scene

# Origin-cell quantization for the sort key: 16^3 cells x 8 octants = 32k bins.
_CELLS = 16


def _make_bounce_kernel(cfg: RenderConfig, n_nodes: int, max_leaf: int,
                        flat_table: bool = False, flat_nodes: bool = False):
    """One path segment for a tile of rays: traversal + shade, state in/out."""

    def kernel(table_ref, nodes_f_ref, nodes_i_ref,
               o_ref, d_ref, mask_ref, rad_ref, live_ref, st_ref,
               o_out, d_out, mask_out, rad_out, live_out, st_out):
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        # Concretely-laid-out zero tile (see megakernel layout note).
        vzero = (sub_ids * LANE + lane_ids).astype(jnp.float32) * 0.0

        o = (o_ref[0, 0], o_ref[1, 0], o_ref[2, 0])
        d = (d_ref[0, 0], d_ref[1, 0], d_ref[2, 0])
        mask = (mask_ref[0, 0], mask_ref[1, 0], mask_ref[2, 0])
        rad = (rad_ref[0, 0], rad_ref[1, 0], rad_ref[2, 0])
        live_f = live_ref[0]
        state = st_ref[0]

        nearest_hit_multi = make_traversal(
            table_ref, nodes_f_ref, nodes_i_ref, n_nodes, max_leaf, vzero,
            flat_table=flat_table, flat_nodes=flat_nodes)
        shade_one = make_shader(cfg, vzero)

        (tc,) = nearest_hit_multi([(o, d, live_f)])
        o, d, mask, rad, live_f, state = shade_one(
            (o, d, mask, rad, live_f, state), tc)

        for c in range(3):
            o_out[c, 0] = o[c]
            d_out[c, 0] = d[c]
            mask_out[c, 0] = mask[c]
            rad_out[c, 0] = rad[c]
        live_out[0] = live_f
        st_out[0] = state

    return kernel


def _vec3_spec():
    return pl.BlockSpec((3, 1, SUB, LANE), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _scalar_spec():
    return pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _bounce_step(table, nodes_f, nodes_i, cfg, max_leaf, o, d, mask, rad,
                 live, state):
    """Run the bounce kernel over the whole ray batch. All ray args are
    (3, R) f32 / (R,) f32 / (R,) u32 with R a BLOCK multiple."""
    R = live.shape[0]
    nb = R // BLOCK
    # SMEM placement for scalar-broadcast tables — same policy/rationale as
    # bvh_megakernel.render_samples_bvh_stats (nodes first, then the table
    # slimmed to the parity-scan columns this kernel reads).
    from oclpathtracer_tpu.kernels.bvh_megakernel import scan_columns
    smem_budget = 900 * 1024
    cols = scan_columns("parity")
    node_bytes = int(nodes_f.size + nodes_i.size) * 4
    table_bytes = int(table.shape[0]) * len(cols) * 4
    flat_nodes = node_bytes <= smem_budget
    flat_table = flat_nodes and (node_bytes + table_bytes <= smem_budget)
    kernel = _make_bounce_kernel(cfg, int(nodes_f.shape[0]), max_leaf,
                                 flat_table=flat_table, flat_nodes=flat_nodes)
    if flat_nodes:
        nodes_f = nodes_f.reshape(-1)
        nodes_i = nodes_i.reshape(-1)
    if flat_table:
        table = table[:, jnp.asarray(cols)].reshape(-1)
    tspace = pltpu.SMEM if flat_table else pltpu.VMEM
    nspace = pltpu.SMEM if flat_nodes else pltpu.VMEM

    def v3(x):
        return x.reshape(3, nb, SUB, LANE)

    def v1(x):
        return x.reshape(nb, SUB, LANE)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=tspace),       # tri table
            pl.BlockSpec(memory_space=nspace),       # nodes_f
            pl.BlockSpec(memory_space=nspace),       # nodes_i
            _vec3_spec(), _vec3_spec(), _vec3_spec(), _vec3_spec(),
            _scalar_spec(), _scalar_spec(),
        ],
        out_specs=(
            _vec3_spec(), _vec3_spec(), _vec3_spec(), _vec3_spec(),
            _scalar_spec(), _scalar_spec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.uint32),
        ),
        interpret=_interpret(),
    )(table, nodes_f, nodes_i, v3(o), v3(d), v3(mask), v3(rad), v1(live),
      v1(state))
    o, d, mask, rad = (x.reshape(3, R) for x in outs[:4])
    live, state = outs[4].reshape(R), outs[5].reshape(R)
    return o, d, mask, rad, live, state


def _sort_key(o, d, live, lo, hi):
    """i32 bin: direction octant (major) | origin cell (minor); dead rays last."""
    octant = ((d[0] > 0).astype(jnp.int32) * 4
              + (d[1] > 0).astype(jnp.int32) * 2
              + (d[2] > 0).astype(jnp.int32))
    key = octant
    for a in range(3):
        q = jnp.clip(((o[a] - lo[a]) / (hi[a] - lo[a] + 1e-9)
                      * _CELLS).astype(jnp.int32), 0, _CELLS - 1)
        key = key * _CELLS + q
    return jnp.where(live > 0.5, key, jnp.int32(8 * _CELLS ** 3))


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "max_leaf",
                                              "sort"))
def render_samples_sorted_stats(table, nodes_f, nodes_i, cfg: RenderConfig,
                                start_sample, n_samples: int,
                                max_leaf: int = 32, sort: bool = False):
    """SUM of `n_samples` progressive frames + traced-segment count.

    Same signature/semantics as render_samples_bvh_stats; per-path radiance is
    bit-identical, per-pixel sums allclose (scatter-add order)."""
    n_pix = cfg.n_pixels
    n_rays = n_pix * n_samples
    R = pl.cdiv(n_rays, BLOCK) * BLOCK

    ridx = jnp.arange(R, dtype=jnp.int32)
    pix = ridx % n_pix
    sample = jnp.asarray(start_sample, jnp.int32) + ridx // n_pix
    valid = (ridx < n_rays).astype(jnp.float32)

    # Camera (generateRay, GenerateColors.cl:263-288) on the reference streams —
    # the jnp twin of the fused kernels' start_path.
    view, hol, upd, angle, eye = _camera_constants(cfg)
    W, H = cfg.width, cfg.height
    aspect = np.float32(W / H)
    state = krng.seed_from(pix, sample)
    state, u1 = krng.next_float(state)
    state, u2 = krng.next_float(state)
    x = (pix % W).astype(jnp.float32) + u1 - 0.5
    y = (pix // W).astype(jnp.float32) + u2 - 0.5
    sx = (2.0 * ((x + 0.5) * (1.0 / W)) - 1.0) * angle * aspect
    sy = -(1.0 - 2.0 * ((y + 0.5) * (1.0 / H))) * angle
    dx = sx * hol[0] - sy * upd[0] + view[0]
    dy = sx * hol[1] - sy * upd[1] + view[1]
    dz = sx * hol[2] - sy * upd[2] + view[2]
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    d = jnp.stack([dx * inv_len, dy * inv_len, dz * inv_len])
    o = jnp.stack([jnp.full((R,), e, jnp.float32) for e in eye])
    mask = jnp.ones((3, R), jnp.float32) * valid
    rad = jnp.zeros((3, R), jnp.float32)
    live = valid

    # Scene bounds (BVH root box) for the origin-cell key.
    root_lo = nodes_f[0, 0:3]
    root_hi = nodes_f[0, 3:6]

    segs = jnp.float32(0.0)
    for b in range(cfg.bounces):
        segs = segs + jnp.sum(live)
        if b > 0 and sort:
            # Re-bin by coherence; dead rays sink to the tail where whole tiles
            # fail the root test and exit traversal immediately.
            perm = jnp.argsort(_sort_key(o, d, live, root_lo, root_hi))
            o, d, mask, rad = (a[:, perm] for a in (o, d, mask, rad))
            live, state, pix = live[perm], state[perm], pix[perm]
        o, d, mask, rad, live, state = _bounce_step(
            table, nodes_f, nodes_i, cfg, max_leaf, o, d, mask, rad, live,
            state)

    # max(radiance, 0) at path end (GenerateColors.cl:260), then pixel assembly.
    rad = jnp.maximum(rad, 0.0)
    img = jnp.zeros((n_pix, 3), jnp.float32).at[pix].add(rad.T)
    return img, segs


def render_sorted(scene: Scene, cfg: RenderConfig, total_spp: int,
                  samples_per_call: int = 0, leaf_size: int = 32) -> jnp.ndarray:
    """Progressive mean image via the sorted wavefront."""
    table, nodes_f, nodes_i = pack_bvh_scene(scene, leaf_size=leaf_size)
    chunk = samples_per_call or min(total_spp, 8)
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    s = 0
    while s < total_spp:
        n = min(chunk, total_spp - s)
        img, _ = render_samples_sorted_stats(table, nodes_f, nodes_i, cfg, s, n,
                                             max_leaf=leaf_size)
        acc = acc + img
        s += n
    return acc / total_spp
