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

Scene data lives in VMEM as one (T, 24) f32 table (BVH-reordered) + node tables;
scalar element reads from VMEM broadcast to the tile. RNG/shading semantics are
identical to the linear megakernel (reference streams + quirks).
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
    pack_scene,
)
from oclpathtracer_tpu.scene.types import Scene


def pack_bvh_scene(scene: Scene, leaf_size: int = 8):
    """(tri_table (T,24) in BVH leaf order, nodes_f (N,8) f32, nodes_i (N,4) i32).

    nodes_f row: [bmin.xyz, bmax.xyz, pad, pad]; nodes_i row: [skip, tri_start,
    tri_count, pad].
    """
    bvh = build_bvh(scene.geometry, leaf_size=leaf_size)
    rgeom = reorder_geometry(scene.geometry, bvh)
    rscene = scene._replace(geometry=rgeom)
    table = pack_scene(rscene)

    n = bvh.num_nodes
    nodes_f = np.zeros((n, 8), np.float32)
    nodes_f[:, 0:3] = np.asarray(bvh.nodes_min)
    nodes_f[:, 3:6] = np.asarray(bvh.nodes_max)
    nodes_i = np.zeros((n, 4), np.int32)
    nodes_i[:, 0] = np.asarray(bvh.skip)
    nodes_i[:, 1] = np.asarray(bvh.tri_start)
    nodes_i[:, 2] = np.asarray(bvh.tri_count)
    return table, jnp.asarray(nodes_f), jnp.asarray(nodes_i)


def _make_kernel(cfg: RenderConfig, n_nodes: int, max_leaf: int, n_samples: int):
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

        def nearest_hit(o, d, active_f):
            """Tile-synchronized stackless BVH traversal. `active_f` is the f32
            0/1 lane mask (bools must not cross scf boundaries on Mosaic)."""
            inv_d = tuple(
                1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20) for c in d)

            best_t = vzero + T_MAX
            bn = (zeros, zeros, zeros)
            balb = (zeros, zeros, zeros)
            bemi = (zeros, zeros, zeros)
            brough = zeros
            bmty = zeros  # material type carried as f32 (Mosaic: no i1-vector truncs)

            def tri_test(j, tc):
                best_t, bn, balb, bemi, brough, bmty = tc
                p1 = (table_ref[j, 0], table_ref[j, 1], table_ref[j, 2])
                e1 = (table_ref[j, 3], table_ref[j, 4], table_ref[j, 5])
                e2 = (table_ref[j, 6], table_ref[j, 7], table_ref[j, 8])
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
                best_t = jnp.where(sel, t, best_t)

                def bc(c):
                    return vzero + c

                bn = _where3(sel, (bc(table_ref[j, 9]), bc(table_ref[j, 10]),
                                   bc(table_ref[j, 11])), bn)
                balb = _where3(sel, (bc(table_ref[j, 12]), bc(table_ref[j, 13]),
                                     bc(table_ref[j, 14])), balb)
                bemi = _where3(sel, (bc(table_ref[j, 15]), bc(table_ref[j, 16]),
                                     bc(table_ref[j, 17])), bemi)
                brough = jnp.where(sel, table_ref[j, 18], brough)
                bmty = jnp.where(sel, table_ref[j, 19], bmty)
                return best_t, bn, balb, bemi, brough, bmty

            def cond(c):
                node = c[0]
                return node < n_nodes

            def body(c):
                node, tc = c
                best_t = tc[0]
                bmin = (nodes_f_ref[node, 0], nodes_f_ref[node, 1],
                        nodes_f_ref[node, 2])
                bmax = (nodes_f_ref[node, 3], nodes_f_ref[node, 4],
                        nodes_f_ref[node, 5])
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
                box_hit = ((t_far >= jnp.maximum(t_near, 0.0))
                           & (t_near < best_t) & (active_f > 0.5))
                any_hit = jnp.any(box_hit)

                skip = nodes_i_ref[node, 0]
                start = nodes_i_ref[node, 1]
                count = nodes_i_ref[node, 2]
                is_leaf = count > 0

                def do_leaf(tc):
                    def k_body(k, tc2):
                        return jax.lax.cond(
                            k < count, lambda t2_: tri_test(start + k, t2_),
                            lambda t2_: t2_, tc2)

                    return jax.lax.fori_loop(0, max_leaf, k_body, tc)

                tc = jax.lax.cond(any_hit & is_leaf, do_leaf, lambda t_: t_, tc)
                node = jnp.where(any_hit & ~is_leaf, node + 1, skip)
                return node, tc

            _, tc = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), (best_t, bn, balb, bemi, brough, bmty)))
            return tc

        def trace_one_sample(sample_idx):
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

            mask = (ones, ones, ones)
            rad = (zeros, zeros, zeros)
            active_f = vone  # f32 0/1 lane mask (no carried vector<i1>)
            segs = zeros

            def bounce_body(_, carry):
                o, d, mask, rad, active_f, state, segs = carry
                active = active_f > 0.5
                segs = segs + active_f

                best_t, bn, balb, bemi, brough, bmty = nearest_hit(o, d, active_f)
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
                return o, d, mask, rad, jnp.where(alive, vone, vzero), state, segs

            carry = (o, d, mask, rad, active_f, state, segs)
            carry = jax.lax.fori_loop(0, bounces, bounce_body, carry)
            rad, segs = carry[3], carry[6]
            return (jnp.maximum(rad[0], 0.0), jnp.maximum(rad[1], 0.0),
                    jnp.maximum(rad[2], 0.0)), segs

        def sample_body(k, acc):
            r, s = trace_one_sample(start_ref[0] + k)
            return acc[0] + r[0], acc[1] + r[1], acc[2] + r[2], acc[3] + s

        acc = jax.lax.fori_loop(0, n_samples, sample_body,
                                (zeros, zeros, zeros, zeros))
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]
        seg_ref[0, 0] = acc[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "max_leaf"))
def render_samples_bvh_stats(table, nodes_f, nodes_i, cfg: RenderConfig,
                             start_sample, n_samples: int, max_leaf: int = 8):
    """SUM of n_samples frames via the BVH megakernel + traced-segment count."""
    n_pix = cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    kernel = _make_kernel(cfg, int(nodes_f.shape[0]), max_leaf, n_samples)
    out, segs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # start_sample
            # Whole tables resident in VMEM: direct (dynamically indexed) scalar
            # loads are legal from VMEM/SMEM only — ANY would require async_copy.
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes_f
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes_i
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
               samples_per_call: int = 0, leaf_size: int = 8) -> jnp.ndarray:
    """Progressive mean image via the BVH megakernel."""
    table, nodes_f, nodes_i = pack_bvh_scene(scene, leaf_size=leaf_size)
    chunk = samples_per_call or total_spp
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    s = 0
    while s < total_spp:
        n = min(chunk, total_spp - s)
        img, _ = render_samples_bvh_stats(table, nodes_f, nodes_i, cfg, s, n,
                                          max_leaf=leaf_size)
        acc = acc + img
        s += n
    return acc / total_spp
