"""8-wide BVH megakernel — batched sibling tests + bitmask-stack traversal.

VERDICT r4 item 4: the skip-link walk (kernels/bvh_megakernel.py) spends one
while-iteration per node TOUCHED — scalar bookkeeping, an any()-reduce, and
scf region boundaries per box test. This kernel restructures the node data so
each internal node's ≤8 children sit contiguously (core/bvh.widen_bvh) and one
iteration slab-tests ALL siblings in a single vector batch:

  * expansion: 8 child boxes tested back-to-back (48 scalar loads feeding
    straight-line vector slab math — the per-box tests overlap in the
    scheduler instead of serializing through the cursor), per-child hit
    reduced with the PACKED trick (2 children per i32 sum, 11-bit fields)
    into one scalar bitmask;
  * traversal: a scalar bitmask STACK (≤ depth levels of (mask, group) pairs
    held in registers; depth is static from the build — log8 of the scene).
    Each iteration pops the lowest set bit of the top mask: a leaf child runs
    the usual leaf window; an internal child expands its group and pushes.
    Iterations are spent only on HIT children — misses cost one batched box
    test inside the parent's expansion, no iteration of their own.

Popping the LOWEST bit makes the visit order exactly the skip-walk's
pre-order, so images are BITWISE-IDENTICAL to the skip-link kernel (extra
speculative leaf visits from the stale best-t cannot win a best-hit — any
triangle inside a prunable box has t ≥ the box's t_near ≥ best_t; pinned by
tests/test_kernels.py::test_wide_bvh_bitwise_matches_skip_walk).

Memory: group records are 8×(6 f32 + 3 i32) = 288 B — SMEM-resident far past
the tri table's own budget (the group count is ~T/leaf/7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core.bvh import build_bvh, reorder_geometry, widen_bvh
from oclpathtracer_tpu.kernels import rng as krng
from oclpathtracer_tpu.kernels.bvh_megakernel import (
    _pad_leaf_window,
    make_flat_tl,
    make_leaf_kit,
    make_shader,
    scan_columns,
)
from oclpathtracer_tpu.kernels.megakernel import (
    BLOCK,
    LANE,
    SUB,
    _camera_constants,
    _cross3,
    _interpret,
    _normalize3,
    decode_fast_tc,
    decode_tp_tc,
    pack_scene,
)
from oclpathtracer_tpu.scene.types import Scene

WIDE = 8


def pack_wide_bvh_scene(scene: Scene, leaf_size: int = 32,
                        scan: str = "parity"):
    """(table, wn_f (G,8,6) f32, wn_i (G,8,3) i32, depth, classes).

    Same build + leaf order as pack_bvh_scene (branching 8), regrouped into
    wide nodes. table layout follows the scan (pack_scene / pack_scene_tp)."""
    bvh = build_bvh(scene.geometry, leaf_size=leaf_size, branching=WIDE)
    wide = widen_bvh(bvh, WIDE)
    rgeom = reorder_geometry(scene.geometry, bvh)
    rscene = scene._replace(geometry=rgeom)
    classes = ()
    if scan == "tp":
        from oclpathtracer_tpu.kernels.megakernel import pack_scene_tp

        table, classes = pack_scene_tp(rscene)
    else:
        table = pack_scene(rscene)
    table = _pad_leaf_window(table, leaf_size)
    wn_f = jnp.concatenate([wide.child_min, wide.child_max], -1)  # (G, 8, 6)
    wn_i = jnp.stack([wide.child_kind, wide.child_a, wide.child_b], -1)
    return table, wn_f, wn_i, wide.depth, classes


def make_wide_traversal(table_ref, wn_f_ref, wn_i_ref, n_groups: int,
                        max_leaf: int, max_depth: int, vzero,
                        scan: str = "parity", flat_table: bool = False,
                        flat_nodes: bool = False):
    """Single-stream wide traversal: (o, d, active_f[, m]) → best-hit tuple."""
    fast = scan == "fast"
    tp = scan == "tp"
    frac = fast or tp
    tl = make_flat_tl(table_ref, scan, flat_table)
    fresh_tc, leaf_test_for = make_leaf_kit(tl, vzero, scan)

    if not flat_nodes:
        raise ValueError(
            "wide groups must be SMEM-resident (288 B/group — ~0.5 MB at "
            "100k tris; a scene exceeding the budget should use the "
            "skip-link kernel's VMEM node path instead)")

    def wf(idx):
        return wn_f_ref[idx]

    def wi(idx):
        return wn_i_ref[idx]

    def sel_scalar(vals, idx):
        r = vals[0]
        for i in range(1, len(vals)):
            r = jnp.where(idx == i, vals[i], r)
        return r

    def set_scalar(vals, idx, new):
        return tuple(jnp.where(idx == i, new, v) for i, v in enumerate(vals))

    def traverse(o, d, inv_d, active_f, m):
        leaf_test = leaf_test_for(m)

        def prune_lt(tc, t_near):
            # best-t prune: t_near < best (fraction-compared for fast/tp).
            if frac:
                return t_near * tc[1] < tc[0]
            return t_near < tc[0]

        def expand(gi, tc):
            """Slab-test all 8 children of group gi → scalar i32 bitmask."""
            hits = []
            for c in range(WIDE):
                base = (gi * WIDE + c) * 6
                bmin = (wf(base + 0), wf(base + 1), wf(base + 2))
                bmax = (wf(base + 3), wf(base + 4), wf(base + 5))
                t1 = tuple((bmin[k] - o[k]) * inv_d[k] for k in range(3))
                t2 = tuple((bmax[k] - o[k]) * inv_d[k] for k in range(3))
                t_near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1[0], t2[0]),
                                jnp.minimum(t1[1], t2[1])),
                    jnp.minimum(t1[2], t2[2]))
                t_far = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1[0], t2[0]),
                                jnp.maximum(t1[1], t2[1])),
                    jnp.maximum(t1[2], t2[2]))
                hits.append((t_far >= jnp.maximum(t_near, 0.0))
                            & prune_lt(tc, t_near) & (active_f > 0.5))
            # Packed any()-reduces: two children per i32 sum (11-bit fields;
            # 1024 lanes < 2^11).
            mask = jnp.int32(0)
            for c0 in range(0, WIDE, 2):
                acc = hits[c0].astype(jnp.int32)
                acc = acc + hits[c0 + 1].astype(jnp.int32) * 2048
                tot = jnp.sum(acc)
                mask = mask | jnp.where((tot & 2047) > 0,
                                        jnp.int32(1 << c0), 0)
                mask = mask | jnp.where((tot >> 11) > 0,
                                        jnp.int32(1 << (c0 + 1)), 0)
            return mask

        tc0 = fresh_tc()
        mask0 = expand(jnp.int32(0), tc0)
        masks0 = (mask0,) + tuple(jnp.int32(0) for _ in range(max_depth - 1))
        bases0 = tuple(jnp.int32(0) for _ in range(max_depth))
        level0 = jnp.where(mask0 > 0, jnp.int32(0), jnp.int32(-1))

        def cond(c):
            return c[0] >= 0

        def body(c):
            level, masks, bases, tc = c
            mcur = sel_scalar(masks, level)
            gb = sel_scalar(bases, level)
            # Lowest set bit: last-assignment-wins select chain 7→0.
            cidx = jnp.int32(0)
            for bbit in range(WIDE - 1, -1, -1):
                cidx = jnp.where((mcur >> bbit) & 1 > 0, jnp.int32(bbit), cidx)
            mnew = mcur - (jnp.int32(1) << cidx)
            masks = set_scalar(masks, level, mnew)

            child = gb * WIDE + cidx
            kind = wi(child * 3 + 0)
            ca = wi(child * 3 + 1)
            cb = wi(child * 3 + 2)
            is_leaf = kind == 2

            def do_leaf(tc2):
                def k_body(k, tc3):
                    return leaf_test(ca + k, tc3, o, d, valid=k < cb)

                return jax.lax.fori_loop(0, max_leaf, k_body, tc2,
                                         unroll=max_leaf)

            tc = jax.lax.cond(is_leaf, do_leaf, lambda t_: t_, tc)

            # Internal child: expand and (if any hits) push one level.
            cm = jax.lax.cond(kind == 1,
                              lambda _: expand(ca, tc),
                              lambda _: jnp.int32(0), 0)
            push = cm > 0
            nlevel = jnp.where(push, level + 1, level)
            masks = set_scalar(masks, nlevel, jnp.where(push, cm,
                                                        sel_scalar(masks,
                                                                   nlevel)))
            bases = set_scalar(bases, nlevel, jnp.where(push, ca,
                                                        sel_scalar(bases,
                                                                   nlevel)))
            # Pop exhausted levels (post-update: the top mask may be 0 now).
            def pop_cond(lv):
                return (lv >= 0) & (sel_scalar(masks, lv) == 0)

            nlevel = jax.lax.while_loop(pop_cond, lambda lv: lv - 1, nlevel)
            return nlevel, masks, bases, tc

        _, _, _, tc = jax.lax.while_loop(cond, body,
                                         (level0, masks0, bases0, tc0))
        return tc

    return traverse


def _make_kernel(cfg: RenderConfig, n_groups: int, max_leaf: int,
                 max_depth: int, n_samples: int, scan: str = "parity",
                 emi_const: tuple = (0.0, 0.0, 0.0), classes: tuple = (),
                 flat_table: bool = False, flat_nodes: bool = True):
    fast = scan == "fast"
    tp = scan == "tp"
    W, H = cfg.width, cfg.height
    bounces = cfg.bounces
    view, hol, upd, angle, eye = _camera_constants(cfg)
    aspect = np.float32(W / H)

    def kernel(start_ref, table_ref, wn_f_ref, wn_i_ref, out_ref, seg_ref):
        b = pl.program_id(0)
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        pid = b * BLOCK + sub_ids * LANE + lane_ids
        px = (pid % W).astype(jnp.float32)
        py = (pid // W).astype(jnp.float32)
        vzero = pid.astype(jnp.float32) * 0.0
        vone = vzero + 1.0
        zeros, ones = vzero, vone

        traverse = make_wide_traversal(table_ref, wn_f_ref, wn_i_ref,
                                       n_groups, max_leaf, max_depth, vzero,
                                       scan=scan, flat_table=flat_table,
                                       flat_nodes=flat_nodes)

        def start_path(sample_idx):
            state = krng.seed_from(pid, sample_idx)
            state, u1 = krng.next_float(state)
            state, u2 = krng.next_float(state)
            x = px + u1 - 0.5
            y = py + u2 - 0.5
            sx = (2.0 * ((x + 0.5) * (1.0 / W)) - 1.0) * angle * aspect
            sy = -(1.0 - 2.0 * ((y + 0.5) * (1.0 / H))) * angle
            d = _normalize3((sx * hol[0] - sy * upd[0] + view[0],
                             sx * hol[1] - sy * upd[1] + view[1],
                             sx * hol[2] - sy * upd[2] + view[2]))
            o = (vzero + eye[0], vzero + eye[1], vzero + eye[2])
            return (o, d, (ones, ones, ones), (zeros, zeros, zeros), vone,
                    state)

        shade_one = make_shader(cfg, vzero)

        def sample_body(s, acc):
            r0, g0, b0, sg = acc
            path = start_path(start_ref[0] + s)

            def bounce_body(_, carry):
                path, sg = carry
                o, d, mask, rad, active_f, state = path
                sg = sg + active_f
                inv_d = tuple(1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20)
                              for c in d)
                m = _cross3(o, d) if tp else None
                tc = traverse(o, d, inv_d, active_f, m)
                if tp:
                    tc = decode_tp_tc(tc, classes, vzero, vone)
                elif fast:
                    tc = decode_fast_tc(tc, emi_const)
                return shade_one(path, tc), sg

            path, sg = jax.lax.fori_loop(0, bounces, bounce_body, (path, sg))
            rad = path[3]
            return (r0 + jnp.maximum(rad[0], 0.0),
                    g0 + jnp.maximum(rad[1], 0.0),
                    b0 + jnp.maximum(rad[2], 0.0), sg)

        acc = jax.lax.fori_loop(0, n_samples, sample_body,
                                (zeros, zeros, zeros, zeros))
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]
        seg_ref[0, 0] = acc[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "max_leaf",
                                             "max_depth", "scan", "emi_const",
                                             "classes"))
def render_samples_wide_bvh_stats(table, wn_f, wn_i, cfg: RenderConfig,
                                  start_sample, n_samples: int,
                                  max_leaf: int = 32, max_depth: int = 8,
                                  scan: str = "parity",
                                  emi_const: tuple = (0.0, 0.0, 0.0),
                                  classes: tuple = ()):
    """SUM of n_samples frames via the 8-wide BVH kernel + segment count.

    Bitwise-identical to render_samples_bvh_stats on the same build
    (branching 8, same leaf_size) — see the module docstring."""
    n_pix = cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    smem_budget = 900 * 1024
    cols = scan_columns(scan)
    node_bytes = int(wn_f.size + wn_i.size) * 4
    table_bytes = int(table.shape[0]) * len(cols) * 4
    flat_nodes = node_bytes <= smem_budget
    flat_table = flat_nodes and (node_bytes + table_bytes <= smem_budget)
    kernel = _make_kernel(cfg, int(wn_f.shape[0]), max_leaf, max_depth,
                          n_samples, scan=scan, emi_const=emi_const,
                          classes=classes, flat_table=flat_table,
                          flat_nodes=flat_nodes)
    if flat_nodes:
        wn_f = wn_f.reshape(-1)
        wn_i = wn_i.reshape(-1)
    if flat_table:
        table = table[:, jnp.asarray(cols)].reshape(-1)
    tspace = pltpu.SMEM if flat_table else pltpu.VMEM
    nspace = pltpu.SMEM if flat_nodes else pltpu.VMEM
    out, segs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=tspace),
            pl.BlockSpec(memory_space=nspace),
            pl.BlockSpec(memory_space=nspace),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 3, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, SUB, LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(jnp.asarray(start_sample, jnp.int32).reshape(1), table, wn_f, wn_i)
    img = out.transpose(0, 2, 3, 1).reshape(nb * BLOCK, 3)
    seg_flat = segs.reshape(nb * BLOCK)
    return img[:n_pix], jnp.sum(seg_flat[:n_pix])
