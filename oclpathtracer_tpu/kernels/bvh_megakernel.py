"""Path-trace megakernel with tile-synchronized BVH traversal (Pallas/TPU).

Same shading/bounce structure as kernels/megakernel.py (which keeps the reference's
brute-force scan — optimal for its 36 triangles), but the nearest-hit search walks
the flattened skip-link BVH (core/bvh.py), making render cost ~log in scene size.

TPU traversal design (SURVEY.md §7 hard-part 2 — no per-lane pointer chasing):
  * the whole (8,128) ray tile walks ONE shared node sequence — the node cursor is
    a scalar, node AABBs are scalar reads broadcast to the tile;
  * every lane slab-tests its own ray against the node box; the tile descends iff
    ANY active lane hits (jnp.any → scalar), else follows the skip link. Coherent
    tiles (primary rays) prune like a scalar tracer; fully incoherent tiles
    degrade toward visiting the union of touched subtrees — never worse than a
    constant factor over per-ray traversal on a vector ISA, and with zero gathers;
  * leaf triangle ranges are contiguous (BVH leaf order), tested with the same
    incremental best-hit tracking as the linear kernel.

Scene data (BVH-reordered tri table + node tables) lives in SMEM while it fits
(flattened 1-D, slimmed to the scan's columns — see make_traversal; ~13.5k tris
for the fast scan), spilling to 2-D VMEM beyond; scalar element reads broadcast
to the tile either way. RNG/shading semantics are identical to the linear
megakernel (reference streams + quirks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core.bvh import FlatBVH, build_bvh, reorder_geometry
from oclpathtracer_tpu.kernels import rng as krng
from oclpathtracer_tpu.kernels.megakernel import (
    BLOCK,
    INV_PI,
    LANE,
    SUB,
    TWO_PI,
    T_MAX,
    _add3,
    _camera_constants,
    _cross3,
    _dot3,
    _interpret,
    _neg3,
    _normalize3,
    _safe_denom,
    _scale3,
    _where3,
    decode_fast_tc,
    decode_tp_tc,
    pack_scene,
)
from oclpathtracer_tpu.scene.types import Scene


def _pack_nodes(bvh: FlatBVH):
    n = bvh.num_nodes
    nodes_f = np.zeros((n, 8), np.float32)
    nodes_f[:, 0:3] = np.asarray(bvh.nodes_min)
    nodes_f[:, 3:6] = np.asarray(bvh.nodes_max)
    nodes_i = np.zeros((n, 4), np.int32)
    nodes_i[:, 0] = np.asarray(bvh.skip)
    nodes_i[:, 1] = np.asarray(bvh.tri_start)
    nodes_i[:, 2] = np.asarray(bvh.tri_count)
    return jnp.asarray(nodes_f), jnp.asarray(nodes_i)


def _pad_leaf_window(table: jnp.ndarray, leaf_size: int) -> jnp.ndarray:
    # Pad with max_leaf all-zero rows: the kernel's leaf loop always reads a
    # full leaf_size window [start, start+leaf_size) and masks lanes by
    # k < count — zero triangles have det == 0 (backface-culled; tp: d·N == 0)
    # so the pad rows can never be selected, and the window stays in-bounds
    # for the last leaf.
    return jnp.concatenate(
        [table, jnp.zeros((leaf_size, table.shape[1]), table.dtype)])


def pack_bvh_scene(scene: Scene, leaf_size: int = 8, branching: int = 8):
    """(tri_table (T,24) in BVH leaf order, nodes_f (N,8) f32, nodes_i (N,4) i32).

    nodes_f row: [bmin.xyz, bmax.xyz, pad, pad]; nodes_i row: [skip, tri_start,
    tri_count, pad]. branching=8 by default: traversal cost is iteration-bound
    and a wide tree has ~1.6× fewer union visits per incoherent tile (core/bvh.py).
    """
    bvh = build_bvh(scene.geometry, leaf_size=leaf_size, branching=branching)
    rgeom = reorder_geometry(scene.geometry, bvh)
    rscene = scene._replace(geometry=rgeom)
    table = _pad_leaf_window(pack_scene(rscene), leaf_size)
    nodes_f, nodes_i = _pack_nodes(bvh)
    return table, nodes_f, nodes_i


def pack_bvh_scene_tp(scene: Scene, leaf_size: int = 8, branching: int = 8):
    """pack_bvh_scene for the tp leaf test: tri table in pack_scene_tp layout
    (triple-product constants + class code). Returns (table, nodes_f, nodes_i,
    classes) — classes is the static tuple decode_tp_tc needs."""
    from oclpathtracer_tpu.kernels.megakernel import pack_scene_tp

    bvh = build_bvh(scene.geometry, leaf_size=leaf_size, branching=branching)
    rgeom = reorder_geometry(scene.geometry, bvh)
    rscene = scene._replace(geometry=rgeom)
    table, classes = pack_scene_tp(rscene)
    table = _pad_leaf_window(table, leaf_size)
    nodes_f, nodes_i = _pack_nodes(bvh)
    return table, nodes_f, nodes_i, classes


def scan_columns(scan: str) -> tuple:
    """Logical pack_scene columns a leaf test reads: the slim flattened-table
    layout keeps exactly these, in this order. fast: p1/e1/e2/normal/albedo +
    fused code (16 cols); tp: N/e1/e2/C1/C2/k + class code (17 cols, the
    pack_scene_tp layout); parity: + emissive/rough/mtype in place of the
    code (20 cols)."""
    if scan == "fast":
        return tuple(range(15)) + (23,)
    if scan == "tp":
        return tuple(range(17))
    return tuple(range(20))


def make_leaf_kit(tl, vzero, scan: str):
    """Shared leaf-test machinery for BOTH traversals (skip-walk and wide).

    tl(j, c): scalar load of logical pack_scene column c of triangle j.
    Returns (fresh_tc, leaf_test_for) where leaf_test_for(m) binds a stream's
    cross(o, d) for the tp scan and yields
    leaf_test(j, tc, o, d, valid=None) → tc."""
    zeros = vzero
    fast = scan == "fast"
    tp = scan == "tp"

    def fresh_tc():
        if tp:
            return (vzero + T_MAX,                  # t numerator
                    vzero + 1.0,                    # t denominator (> 0)
                    (zeros, zeros, zeros),          # raw N (unnormalized)
                    zeros)                          # class code (0 = miss)
        if fast:
            return (vzero + T_MAX,                  # t numerator
                    vzero + 1.0,                    # t denominator (> 0)
                    (zeros, zeros, zeros),          # normal
                    (zeros, zeros, zeros),          # albedo
                    zeros)  # rough + 4*mtype + 16*is_emitter code
        return (vzero + T_MAX,                      # best_t
                (zeros, zeros, zeros),              # bn
                (zeros, zeros, zeros),              # balb
                (zeros, zeros, zeros),              # bemi
                zeros,                              # brough
                zeros)  # bmty as f32 (Mosaic: no i1-vector truncs)

    def tri_test_tp(j, tc, o, d, m, valid=None):
        """Triple-product leaf test — same form as megakernel.tri_body_tp
        (pack_scene_tp table layout, fraction-ordered best hit)."""
        bnum, bden, bN, bcode = tc
        nv = (tl(j, 0), tl(j, 1), tl(j, 2))
        e1 = (tl(j, 3), tl(j, 4), tl(j, 5))
        e2 = (tl(j, 6), tl(j, 7), tl(j, 8))
        c1 = (tl(j, 9), tl(j, 10), tl(j, 11))
        c2 = (tl(j, 12), tl(j, 13), tl(j, 14))
        det = _dot3(d, nv)
        tnum = tl(j, 15) - _dot3(o, nv)
        unum = _dot3(e2, m) - _dot3(d, c1)
        vnum = _dot3(d, c2) - _dot3(e1, m)
        inside = jnp.minimum(jnp.minimum(unum, vnum),
                             det - (unum + vnum)) >= 0.0
        sel = ((det >= 1e-8) & inside & (tnum > 0.0)
               & (tnum * bden < bnum * det))
        if valid is not None:
            sel = sel & valid
        bnum = jnp.where(sel, tnum, bnum)
        bden = jnp.where(sel, det, bden)
        bN = _where3(sel, (vzero + nv[0], vzero + nv[1],
                           vzero + nv[2]), bN)
        bcode = jnp.where(sel, tl(j, 16), bcode)
        return bnum, bden, bN, bcode

    def tri_test_fast(j, tc, o, d, valid=None):
        """Division-free leaf test — same form as megakernel.tri_body_fast."""
        bnum, bden, bn, balb, bcode = tc
        p1 = (tl(j, 0), tl(j, 1), tl(j, 2))
        e1 = (tl(j, 3), tl(j, 4), tl(j, 5))
        e2 = (tl(j, 6), tl(j, 7), tl(j, 8))
        pvec = _cross3(d, e2)
        det = _dot3(e1, pvec)
        tvec = (o[0] - p1[0], o[1] - p1[1], o[2] - p1[2])
        unum = _dot3(tvec, pvec)
        qvec = _cross3(tvec, e1)
        vnum = _dot3(d, qvec)
        tnum = _dot3(e2, qvec)
        inside = jnp.minimum(jnp.minimum(unum, vnum),
                             det - (unum + vnum)) >= 0.0
        sel = ((det >= 1e-8) & inside & (tnum > 0.0)
               & (tnum * bden < bnum * det))
        if valid is not None:
            sel = sel & valid
        bnum = jnp.where(sel, tnum, bnum)
        bden = jnp.where(sel, det, bden)
        bn = _where3(sel, (vzero + tl(j, 9),
                           vzero + tl(j, 10),
                           vzero + tl(j, 11)), bn)
        balb = _where3(sel, (vzero + tl(j, 12),
                             vzero + tl(j, 13),
                             vzero + tl(j, 14)), balb)
        bcode = jnp.where(sel, tl(j, 23), bcode)
        return bnum, bden, bn, balb, bcode

    def tri_test(j, tc, o, d, valid=None):
        best_t, bn, balb, bemi, brough, bmty = tc
        p1 = (tl(j, 0), tl(j, 1), tl(j, 2))
        e1 = (tl(j, 3), tl(j, 4), tl(j, 5))
        e2 = (tl(j, 6), tl(j, 7), tl(j, 8))
        pvec = _cross3(d, e2)
        det = _dot3(e1, pvec)
        front = det >= 1e-8
        inv_det = 1.0 / jnp.where(front, det, 1.0)
        tvec = (o[0] - p1[0], o[1] - p1[1], o[2] - p1[2])
        u = _dot3(tvec, pvec) * inv_det
        qvec = _cross3(tvec, e1)
        v = _dot3(d, qvec) * inv_det
        t = _dot3(e2, qvec) * inv_det
        sel = (front & (u >= 0.0) & (u <= 1.0)
               & (v >= 0.0) & (u + v <= 1.0)
               & (t > 0.0) & (t < best_t))
        if valid is not None:
            sel = sel & valid
        best_t = jnp.where(sel, t, best_t)

        def bc(c):
            return vzero + c

        bn = _where3(sel, (bc(tl(j, 9)), bc(tl(j, 10)),
                           bc(tl(j, 11))), bn)
        balb = _where3(sel, (bc(tl(j, 12)), bc(tl(j, 13)),
                             bc(tl(j, 14))), balb)
        bemi = _where3(sel, (bc(tl(j, 15)), bc(tl(j, 16)),
                             bc(tl(j, 17))), bemi)
        brough = jnp.where(sel, tl(j, 18), brough)
        bmty = jnp.where(sel, tl(j, 19), bmty)
        return best_t, bn, balb, bemi, brough, bmty

    def leaf_test_for(m):
        """Scan-specific leaf test; tp binds the stream's cross(o, d)."""
        if tp:
            return lambda j, tc, o, d, valid=None: tri_test_tp(
                j, tc, o, d, m, valid)
        return tri_test_fast if fast else tri_test

    return fresh_tc, leaf_test_for


def make_flat_tl(table_ref, scan: str, flat_table: bool):
    """tl(j, c): logical pack_scene column c of triangle j, through the slim
    flattened SMEM layout when flat_table (see make_traversal docstring)."""
    if flat_table:
        cols = scan_columns(scan)
        phys = {c: i for i, c in enumerate(cols)}
        ncols = len(cols)

        def tl(j, c):
            return table_ref[j * ncols + phys[c]]
    else:
        def tl(j, c):
            return table_ref[j, c]
    return tl


def make_traversal(table_ref, nodes_f_ref, nodes_i_ref, n_nodes: int,
                   max_leaf: int, vzero, scan: str = "parity",
                   window: int = 1, flat_table: bool = False,
                   flat_nodes: bool = False):
    """Build the tile-synchronized BVH traversal for a Pallas kernel body.

    `vzero` is the kernel's concretely-laid-out (8,128) zero tile. Shared by
    the BVH megakernel and the sorted-wavefront bounce kernel. scan="fast"
    uses the division-free leaf test (see kernels/megakernel._make_kernel)
    and returns the fast 5-channel best-hit tuple — decode with
    megakernel.decode_fast_tc.

    flat_table/flat_nodes: the ref is 1-D and SLIM (scan_columns(scan) only:
    (T*16,) fast / (T*20,) parity; nodes (N*8,)+(N*4,)) living in SMEM
    instead of 2-D in VMEM. Traversal and leaf tests are ALL scalar element
    loads broadcast to the tile, and SMEM scalar loads are ~10× faster than
    VMEM ones (kernels/megakernel.py SMEM_TABLE_MAX_TRIS comment). Measured
    on v5e (sphere_field, 256², 4 bounces, fast scan, same session): 12.8k
    tris 4.2 → 7.0 Mrays/s (+66%: nodes SMEM +13%, slim table fully SMEM
    +47%); 5.1k tris 13.9 vs 8.3 recorded round 2. Nodes always fit
    (48 B/node, budget-gated); the slim fast table fits ~13.5k tris in the
    ~900 KB budget, beyond which it stays in VMEM and leaf-load latency
    dominates again.

    window > 1 = SPECULATIVE WINDOWED traversal: each while iteration slab-
    tests `window` CONSECUTIVE pre-order nodes (cur..cur+window-1) and resolves
    the skip-link chain through them in scalar selects. The measured cost of
    the tile-synchronized walk is per-iteration overhead (scalar bookkeeping,
    the any()-reduce, scf region boundaries), not vector math — and chains
    advance through consecutive nodes whenever a node is hit (descend = +1) or
    a leaf is passed (its skip IS +1), breaking only on internal-node misses,
    so one iteration typically consumes several nodes. Speculative box tests
    use the iteration-start best-t (conservative: may visit nodes a fully
    sequential prune would cull — never skips one). Per-slot any()-reduces are
    PACKED: two slots share one i32 sum (11-bit fields, lane count 1024 < 2^11).
    """
    zeros = vzero
    fast = scan == "fast"
    tp = scan == "tp"
    frac = fast or tp  # best-t tracked as a (num, den) fraction

    # Flattened tables are SLIMMED to the columns the scan reads
    # (scan_columns(scan)) — 64 B/tri for fast vs 96 full — so bigger
    # scenes stay SMEM-resident; tl maps logical -> slim position.
    tl = make_flat_tl(table_ref, scan, flat_table)
    fresh_tc, _leaf_test = make_leaf_kit(tl, vzero, scan)
    if flat_nodes:
        def nf(n, c):
            return nodes_f_ref[n * 8 + c]

        def ni(n, c):
            return nodes_i_ref[n * 4 + c]
    else:
        def nf(n, c):
            return nodes_f_ref[n, c]

        def ni(n, c):
            return nodes_i_ref[n, c]

    def _nearest_hit_multi(rays):
        """Tile-synchronized stackless BVH traversal, MERGED across the
        group's `interleave` streams: one while loop carries one scalar node
        cursor per stream, so the k independent slab-test/any()-reduce chains
        overlap instead of serializing (the reduce feeding the next cursor is
        the latency bottleneck of tile-synchronized traversal).

        rays: list of (o, d, active_f) per stream; active_f is the f32 0/1
        lane mask (bools must not cross scf boundaries on Mosaic). Returns a
        list of best-hit tuples."""
        inv_ds = [tuple(1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20)
                        for c in d) for (_, d, _) in rays]
        # tp leaf test: one cross(o, d) per stream per traversal feeds every
        # leaf triangle's unum/vnum triple products (megakernel tri_body_tp).
        ms = [_cross3(o, d) for (o, d, _) in rays] if tp else [None] * len(rays)

        k_streams = len(rays)

        def cond(c):
            alive = c[0][0] < n_nodes
            for i in range(1, k_streams):
                alive = alive | (c[i][0] < n_nodes)
            return alive

        def step_stream(node, tc, o, d, inv_d, active_f, m):
            """One traversal step for one stream (no-op once node == end)."""
            done = node >= n_nodes
            nd = jnp.minimum(node, n_nodes - 1)
            bmin = (nf(nd, 0), nf(nd, 1), nf(nd, 2))
            bmax = (nf(nd, 3), nf(nd, 4), nf(nd, 5))
            # Slab test per lane.
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
            if frac:
                # best-t prune without the divide: t = num/den with den > 0,
                # so t_near < t  ⟺  t_near*den < num.
                nearer = t_near * tc[1] < tc[0]
            else:
                nearer = t_near < tc[0]
            box_hit = ((t_far >= jnp.maximum(t_near, 0.0))
                       & nearer & (active_f > 0.5))
            any_hit = jnp.any(box_hit) & ~done

            skip = ni(nd, 0)
            start = ni(nd, 1)
            count = ni(nd, 2)
            is_leaf = count > 0

            def do_leaf(tc):
                # Full leaf_size window, lanes masked by k < count (the table
                # is padded, see pack_bvh_scene) — straight-line unrolled
                # vector code instead of a serialized per-triangle lax.cond.
                leaf_test = _leaf_test(m)

                def k_body(k, tc2):
                    return leaf_test(start + k, tc2, o, d, valid=k < count)

                return jax.lax.fori_loop(0, max_leaf, k_body, tc,
                                         unroll=max_leaf)

            tc = jax.lax.cond(any_hit & is_leaf, do_leaf, lambda t_: t_, tc)
            nxt = jnp.where(any_hit & ~is_leaf, nd + 1, skip)
            return jnp.where(done, node, nxt), tc

        def step_stream_windowed(node, tc, o, d, inv_d, active_f, m):
            """One windowed traversal iteration (see make_traversal docstring):
            speculatively test nodes node..node+window-1, chase the skip-link
            chain through them, leaf-test every visited hit leaf in order."""
            done = node >= n_nodes
            base = jnp.minimum(node, n_nodes - 1)

            box_hits, skips, starts, counts, valids = [], [], [], [], []
            for w in range(window):
                nd = jnp.minimum(base + w, n_nodes - 1)
                valids.append(base + w < n_nodes)
                bmin = (nf(nd, 0), nf(nd, 1), nf(nd, 2))
                bmax = (nf(nd, 3), nf(nd, 4), nf(nd, 5))
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
                if frac:
                    nearer = t_near * tc[1] < tc[0]
                else:
                    nearer = t_near < tc[0]
                box_hits.append((t_far >= jnp.maximum(t_near, 0.0))
                                & nearer & (active_f > 0.5))
                skips.append(ni(nd, 0))
                starts.append(ni(nd, 1))
                counts.append(ni(nd, 2))

            # Packed any()-reduce: two slots per i32 sum (11-bit count fields).
            anys = []
            for w0 in range(0, window, 2):
                acc = box_hits[w0].astype(jnp.int32)
                if w0 + 1 < window:
                    acc = acc + box_hits[w0 + 1].astype(jnp.int32) * 2048
                total = jnp.sum(acc)
                anys.append((total & 2047) > 0)
                if w0 + 1 < window:
                    anys.append((total >> 11) > 0)

            # Scalar chain resolve: visited_w, then the new cursor. Skip links
            # point forward, so each slot is consumed at most once, in order.
            cur = node
            visited = []
            for w in range(window):
                at_w = (cur == base + w) & ~done & valids[w]
                hit_w = anys[w] & at_w
                is_leaf_w = counts[w] > 0
                nxt_w = jnp.where(hit_w & ~is_leaf_w, base + w + 1, skips[w])
                visited.append(hit_w & is_leaf_w)  # needs a leaf test
                cur = jnp.where(at_w, nxt_w, cur)

            # One shared leaf-test body, driven over the visited hit leaves.
            leaf_test = _leaf_test(m)

            def leaf_w(w, tc):
                def sel_scalar(vals):
                    r = vals[0]
                    for i in range(1, window):
                        r = jnp.where(w == i, vals[i], r)
                    return r

                start = sel_scalar(starts)
                count = sel_scalar(counts)
                run = sel_scalar(visited)

                def do_leaf(tc2):
                    def k_body(k, tc3):
                        return leaf_test(start + k, tc3, o, d,
                                         valid=k < count)

                    return jax.lax.fori_loop(0, max_leaf, k_body, tc2,
                                             unroll=max_leaf)

                return jax.lax.cond(run, do_leaf, lambda t_: t_, tc)

            tc = jax.lax.fori_loop(0, window, leaf_w, tc)
            return cur, tc

        step = step_stream if window == 1 else step_stream_windowed

        def body(c):
            out = []
            for i in range(k_streams):
                node, tc = c[i]
                o, d, active_f = rays[i]
                out.append(step(node, tc, o, d, inv_ds[i], active_f, ms[i]))
            return tuple(out)

        init = tuple((jnp.int32(0), fresh_tc()) for _ in range(k_streams))
        final = jax.lax.while_loop(cond, body, init)
        return [final[i][1] for i in range(k_streams)]

    return _nearest_hit_multi


def make_shader(cfg: RenderConfig, vzero):
    """Build the post-traversal bounce shader (reference BRDF semantics + quirks,
    GenerateColors.cl:223-261) over (8,128) tiles. path = (o, d, mask, rad,
    active_f, state); tc = best-hit tuple from the traversal."""
    bg = tuple(np.float32(c) for c in cfg.bg_color)
    eboost = np.float32(cfg.emissive_boost)
    roffset = np.float32(cfg.ray_offset)
    zeros = vzero
    ones = vzero + 1.0
    vone = ones

    def _shade_one(path, tc):
        """Post-traversal part of one bounce for one stream."""
        o, d, mask, rad, active_f, state = path
        active = active_f > 0.5
        best_t, bn, balb, bemi, brough, bmty = tc
        hit = best_t < T_MAX

        miss = active & ~hit
        rad = (rad[0] + jnp.where(miss, mask[0] * bg[0], 0.0),
               rad[1] + jnp.where(miss, mask[1] * bg[1], 0.0),
               rad[2] + jnp.where(miss, mask[2] * bg[2], 0.0))
        active = active & hit

        rad = (rad[0] + jnp.where(active, mask[0] * bemi[0] * eboost, 0.0),
               rad[1] + jnp.where(active, mask[1] * bemi[1] * eboost, 0.0),
               rad[2] + jnp.where(active, mask[2] * bemi[2] * eboost, 0.0))

        n = _where3(_dot3(bn, d) < 0.0, bn, _neg3(bn))
        wo = _neg3(d)

        state, ud1 = krng.next_float(state)
        state, ud2 = krng.next_float(state)

        use_y = jnp.abs(n[0]) > 0.001
        axis = _where3(use_y, (zeros, ones, zeros), (ones, zeros, zeros))
        tt = _normalize3(_cross3(axis, n))
        ss = _cross3(n, tt)

        phi = TWO_PI * ud1
        cphi = jnp.cos(phi)
        sphi = jnp.sin(phi)

        sin_d = jnp.sqrt(ud2)
        cos_d = jnp.sqrt(1.0 - ud2)
        wi_d = _normalize3(_add3(_add3(
            _scale3(ss, cphi * sin_d), _scale3(tt, sphi * sin_d)),
            _scale3(n, cos_d)))
        pdf_d = _dot3(wi_d, n) * INV_PI
        f_d = _scale3(balb, INV_PI)

        r2 = brough * brough
        cos_h = jnp.sqrt(
            (1.0 - ud2) / jnp.maximum(ud2 * (r2 - 1.0) + 1.0, 1e-12))
        sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_h * cos_h))
        wh = _normalize3(_add3(_add3(
            _scale3(ss, cphi * sin_h), _scale3(tt, sphi * sin_h)),
            _scale3(n, cos_h)))
        wi_s = _add3(_neg3(wo), _scale3(wh, 2.0 * _dot3(wo, wh)))
        same_hemi = _dot3(wi_s, n) * _dot3(wo, n) >= 0.0
        denom_ndf = cos_h * cos_h * (r2 - 1.0) + 1.0
        d_ndf = r2 * INV_PI / jnp.maximum(denom_ndf * denom_ndf, 1e-12)
        pdf_s = d_ndf * cos_h / _safe_denom(4.0 * _dot3(wo, wh))
        fs_scalar = d_ndf / _safe_denom(
            4.0 * _dot3(wi_s, n) * _dot3(wo, n)) * 2.0
        f_s = _scale3(balb, fs_scalar)
        pdf_s = jnp.where(same_hemi, pdf_s, 0.0)
        f_s = _where3(same_hemi, f_s, (zeros, zeros, zeros))

        bspec = bmty >= 1.5
        wi = _where3(bspec, wi_s, wi_d)
        pdf = jnp.where(bspec, pdf_s, pdf_d)
        f = _where3(bspec, f_s, f_d)

        alive = active & (pdf > 0.0)
        safe_pdf = jnp.where(pdf > 0.0, pdf, 1.0)
        factor = _dot3(wi, n) / safe_pdf
        mask = (jnp.where(alive, mask[0] * f[0] * factor, mask[0]),
                jnp.where(alive, mask[1] * f[1] * factor, mask[1]),
                jnp.where(alive, mask[2] * f[2] * factor, mask[2]))

        hitp = _add3(o, _scale3(d, best_t))
        o = _add3(hitp, _scale3(wi, roffset))
        d = _where3(alive, wi, d)
        return (o, d, mask, rad, jnp.where(alive, vone, vzero), state)

    return _shade_one


def _make_kernel(cfg: RenderConfig, n_nodes: int, max_leaf: int, n_samples: int,
                 interleave: int = 0, scan: str = "parity",
                 emi_const: tuple = (0.0, 0.0, 0.0), window: int = 1,
                 flat_table: bool = False, flat_nodes: bool = False,
                 classes: tuple = ()):
    if scan not in ("parity", "fast", "tp"):
        raise ValueError(f"scan must be 'parity', 'fast' or 'tp', got {scan!r}")
    fast = scan == "fast"
    tp = scan == "tp"
    if tp and not classes:
        raise ValueError("scan='tp' needs the classes tuple from pack_bvh_scene_tp")
    # Default 1: unlike the linear megakernel, measured speed here is bound by
    # traversal-loop iteration overhead (scalar bookkeeping + scf region
    # boundaries), not VPU dependency chains — merged k-stream traversal was
    # neutral-to-slightly-negative on v5e (8.3 → 7.8 Mrays/s at k=4, 5k tris).
    # The knob stays for experimentation; output is bitwise-invariant in it.
    interleave = interleave or 1
    if n_samples % interleave:
        raise ValueError(f"interleave {interleave} must divide n_samples")
    W, H = cfg.width, cfg.height
    bounces = cfg.bounces
    view, hol, upd, angle, eye = _camera_constants(cfg)
    aspect = np.float32(W / H)
    bg = tuple(np.float32(c) for c in cfg.bg_color)
    eboost = np.float32(cfg.emissive_boost)
    roffset = np.float32(cfg.ray_offset)

    def kernel(start_ref, table_ref, nodes_f_ref, nodes_i_ref, out_ref, seg_ref):
        b = pl.program_id(0)
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        pid = b * BLOCK + sub_ids * LANE + lane_ids
        px = (pid % W).astype(jnp.float32)
        py = (pid // W).astype(jnp.float32)

        # Mosaic layout note: loop-carried tiles must NOT be splat constants
        # (jnp.zeros / broadcast_to get a "replicated" layout, the loop body
        # produces a concrete one, and layout inference rejects the relayout).
        # vzero is iota-derived — concretely laid out — and seeds every carry.
        vzero = pid.astype(jnp.float32) * 0.0  # varies in BOTH dims -> {0,0} layout
        vone = vzero + 1.0

        zeros = vzero
        ones = vone

        nearest_hit_multi = make_traversal(
            table_ref, nodes_f_ref, nodes_i_ref, n_nodes, max_leaf, vzero,
            scan=scan, window=window, flat_table=flat_table,
            flat_nodes=flat_nodes)

        def start_path(sample_idx):
            """Seed + camera ray for one progressive frame (path-state tuple)."""
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
            o = (vzero + eye[0],
                 vzero + eye[1],
                 vzero + eye[2])
            # active is an f32 0/1 lane mask (no carried vector<i1>)
            return (o, d, (ones, ones, ones), (zeros, zeros, zeros), vone, state)

        shade_one = make_shader(cfg, vzero)

        # `interleave` independent samples step through the bounce loop together;
        # their traversals run MERGED (see nearest_hit_multi). Accumulation order
        # over samples is unchanged (group-major, in-group ascending) → output is
        # bitwise-invariant in the interleave factor.
        def group_body(g, acc):
            r0, g0, b0, sg = acc
            paths = tuple(start_path(start_ref[0] + g * interleave + i)
                          for i in range(interleave))

            def bounce_body(_, carry):
                paths, sg = carry
                for p in paths:
                    sg = sg + p[4]  # entrants this bounce
                tcs = nearest_hit_multi([(p[0], p[1], p[4]) for p in paths])
                if tp:
                    tcs = [decode_tp_tc(tc, classes, vzero, vone)
                           for tc in tcs]
                elif fast:
                    tcs = [decode_fast_tc(tc, emi_const) for tc in tcs]
                return tuple(shade_one(p, tc)
                             for p, tc in zip(paths, tcs)), sg

            paths, sg = jax.lax.fori_loop(0, bounces, bounce_body, (paths, sg))
            for p in paths:
                rad = p[3]
                # max(radiance, 0) — GenerateColors.cl:260
                r0 = r0 + jnp.maximum(rad[0], 0.0)
                g0 = g0 + jnp.maximum(rad[1], 0.0)
                b0 = b0 + jnp.maximum(rad[2], 0.0)
            return r0, g0, b0, sg

        acc = jax.lax.fori_loop(0, n_samples // interleave, group_body,
                                (zeros, zeros, zeros, zeros))
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]
        seg_ref[0, 0] = acc[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "max_leaf",
                                              "interleave", "scan",
                                              "emi_const", "window",
                                              "classes"))
def render_samples_bvh_stats(table, nodes_f, nodes_i, cfg: RenderConfig,
                             start_sample, n_samples: int, max_leaf: int = 8,
                             interleave: int = 0, scan: str = "parity",
                             emi_const: tuple = (0.0, 0.0, 0.0),
                             window: int = 1, classes: tuple = ()):
    """SUM of n_samples frames via the BVH megakernel + traced-segment count.

    interleave: samples stepped together with merged traversals (0 = auto);
    output is bitwise-invariant in it. scan/emi_const: see
    kernels/megakernel._make_kernel (division-free leaf tests + best-t prune).
    window: speculative nodes tested per traversal iteration (make_traversal);
    radiance/segments are invariant in it (only pruning work changes)."""
    n_pix = cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    # Memory placement: every traversal/leaf access is a scalar element load
    # broadcast to the tile, and SMEM scalar loads are ~10× faster than VMEM
    # ones — so pack as much as fits into the ~1 MB scalar memory, FLATTENED
    # to 1-D (2-D SMEM refs pad every row to 128 lanes) and SLIMMED to the
    # columns the scan reads (scan_columns: 64 B/tri fast, 80 parity). Nodes
    # first (hot on every traversal step, tiny: 48 B/node), then the table.
    # What doesn't fit stays 2-D in VMEM (correct, latency-bound).
    smem_budget = 900 * 1024
    cols = scan_columns(scan)
    node_bytes = int(nodes_f.size + nodes_i.size) * 4
    table_bytes = int(table.shape[0]) * len(cols) * 4
    flat_nodes = node_bytes <= smem_budget
    flat_table = flat_nodes and (node_bytes + table_bytes <= smem_budget)
    kernel = _make_kernel(cfg, int(nodes_f.shape[0]), max_leaf, n_samples,
                          interleave, scan=scan, emi_const=emi_const,
                          window=window, flat_table=flat_table,
                          flat_nodes=flat_nodes, classes=classes)
    if flat_nodes:
        nodes_f = nodes_f.reshape(-1)
        nodes_i = nodes_i.reshape(-1)
    if flat_table:
        table = table[:, jnp.asarray(cols)].reshape(-1)
    tspace = pltpu.SMEM if flat_table else pltpu.VMEM
    nspace = pltpu.SMEM if flat_nodes else pltpu.VMEM
    out, segs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # start_sample
            # Direct (dynamically indexed) scalar loads are legal from
            # VMEM/SMEM only — ANY would require async_copy.
            pl.BlockSpec(memory_space=tspace),       # tri table
            pl.BlockSpec(memory_space=nspace),       # nodes_f
            pl.BlockSpec(memory_space=nspace),       # nodes_i
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
    )(jnp.asarray(start_sample, jnp.int32).reshape(1), table, nodes_f, nodes_i)
    img = out.transpose(0, 2, 3, 1).reshape(nb * BLOCK, 3)
    seg_flat = segs.reshape(nb * BLOCK)
    return img[:n_pix], jnp.sum(seg_flat[:n_pix])


def render_bvh(scene: Scene, cfg: RenderConfig, total_spp: int,
               samples_per_call: int = 0, leaf_size: int = 8,
               scan: str = "auto", window: int = 4) -> jnp.ndarray:
    """Progressive mean image via the BVH megakernel.

    window=4 default: +19% on iteration-overhead-bound scenes (small/coherent),
    neutral on leaf-work-bound ones (large incoherent) — see make_traversal."""
    scan, table, nodes_f, nodes_i, emi, classes = prepare_bvh_scan(
        scene, scan, leaf_size=leaf_size)
    chunk = samples_per_call or total_spp
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    s = 0
    while s < total_spp:
        n = min(chunk, total_spp - s)
        img, _ = render_samples_bvh_stats(table, nodes_f, nodes_i, cfg, s, n,
                                          max_leaf=leaf_size, scan=scan,
                                          emi_const=emi, window=window,
                                          classes=classes)
        acc = acc + img
        s += n
    return acc / total_spp


def prepare_bvh_scan(scene: Scene, requested: str = "auto",
                     leaf_size: int = 8, branching: int = 8):
    """Resolve the scan + build BVH tables: (scan, table, nodes_f, nodes_i,
    emi_const, classes) — exactly the kwargs render_samples_bvh_stats takes.

    auto = the fastest leaf test the scene supports (tp -> fast -> parity,
    the same ladder as megakernel.resolve_scan); explicit requests are
    validated against their support predicates and raise (a silent
    substitution would hide that the requested arithmetic never ran)."""
    from oclpathtracer_tpu.kernels.megakernel import (
        fast_scan_supported,
        scene_emissive_const,
        tp_scan_supported,
    )

    scan = requested
    if scan == "auto":
        scan = ("tp" if tp_scan_supported(scene)
                else "fast" if fast_scan_supported(scene) else "parity")
    elif scan == "tp" and not tp_scan_supported(scene):
        raise ValueError("scan='tp' requested but tp_scan_supported(scene) "
                         "is False; use scan='auto' to fall back")
    elif scan == "fast" and not fast_scan_supported(scene):
        raise ValueError("scan='fast' requested but the scene fails "
                         "fast_scan_supported; use scan='auto'")
    if scan == "tp":
        table, nodes_f, nodes_i, classes = pack_bvh_scene_tp(
            scene, leaf_size=leaf_size, branching=branching)
        return scan, table, nodes_f, nodes_i, (0.0, 0.0, 0.0), classes
    emi = scene_emissive_const(scene) if scan == "fast" else (0.0, 0.0, 0.0)
    table, nodes_f, nodes_i = pack_bvh_scene(scene, leaf_size=leaf_size,
                                             branching=branching)
    return scan, table, nodes_f, nodes_i, emi, ()
