"""Path-regeneration megakernel — the TPU-native "wavefront" integrator.

The problem with a fixed bounce loop (kernels/megakernel.py): lanes whose paths
terminate early (miss, dead pdf) idle as masked no-ops for the remaining bounces.
On the Cornell workload the mean path length is ~3 of up to 16 bounces — >5×
wasted lanes at high bounce counts.

GPUs fix this with wavefront + stream compaction (per-bounce kernels, global queues
of surviving rays). On TPU, global compaction would round-trip the full ray state
through HBM every bounce — exactly the traffic the fused kernel exists to avoid —
and the vector ISA has no scatter to build queues with (SURVEY.md §7 hard-part 1).

The TPU-native answer is IN-LANE PATH REGENERATION: each lane owns its pixel's
whole sample STREAM. One while_loop steps "trace one segment" per iteration; when
a lane's path terminates it immediately re-seeds and starts the pixel's next
progressive sample in the same iteration stream. Occupancy stays ~100% until the
tail; there is no cross-lane communication at all. Iterations ≈ total segments /
lanes instead of samples × bounces.

Semantics, streams, and outputs are identical to kernels/megakernel.py (reference
RNG per (pixel, frame); per-path draw order camera×2 then 2/bounce; radiance
clamped at path end per GenerateColors.cl:260) — pinned by tests against the same
parity integrator.
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
    TRI_UNROLL_CAP,
    chunk_bounds,
    decode_fast_tc,
    decode_tp_tc,
    merge_frac_tc,
    merge_parity_tc,
    pack_scene,
    resolve_scan_chunks,
    resolve_tri_unroll,
)
from oclpathtracer_tpu.scene.types import Scene


def resolve_stream_interleave(n_samples: int, bounces: int,
                              requested: int = 0) -> int:
    """0 = auto: widest stream count that still wins at this bounce depth.

    Like megakernel.resolve_interleave, k independent per-lane path STREAMS give
    the VPU k independent instruction chains. Unlike the megakernel's grouped
    form, streams need not divide n_samples (stream i owns samples ≡ i mod k and
    simply runs dry early). Measured (v5e, 512² Cornell, 64 spp, full tri
    unroll), parity scan round 1, k=1/2/4/8: 4-bounce 628/701/743/796 Mrays/s;
    8-bounce -/680/717/727; 16-bounce 586/641/640/601. Round 3 (slimmer tp/fast
    tracked state → less spill pressure), same-session: 16-bounce tp k=2/4/8 =
    666/821/786 (+23% at 4), fast k=2/4 = 727/742, parity k=2/4 = 654/653
    (flat); 4-bounce k=8/16: tp 986/1011, fast 889/957, parity 823/843 — so
    auto is 16 shallow, 4 deep. k>1 changes accumulation order (per-stream
    partials summed in stream order) so output is allclose-but-not-bitwise vs
    k=1."""
    if requested:
        return requested
    k = 16 if bounces <= 8 else 4
    return min(k, max(n_samples, 1))


def _make_kernel(cfg: RenderConfig, n_tris: int, n_samples: int,
                 interleave: int = 0, scan: str = "parity",
                 emi_const: tuple = (0.0, 0.0, 0.0), classes: tuple = (),
                 scan_chunks: int = 0):
    if scan not in ("parity", "fast", "tp"):
        raise ValueError(f"scan must be 'parity', 'fast' or 'tp', got {scan!r}")
    fast = scan == "fast"
    tp = scan == "tp"
    if tp and not classes:
        raise ValueError("scan='tp' needs the classes tuple from pack_scene_tp")
    auto_k = interleave == 0
    interleave = resolve_stream_interleave(n_samples, cfg.bounces, interleave)
    if auto_k and _interpret():
        # Bound the AUTO stream count off-TPU — interpret-mode trace time
        # grows with streams × unrolled scan size and the knob is perf-only
        # (any k is allclose; tests pinning bitwise behavior pass k
        # explicitly). See megakernel._make_kernel for the same rule.
        interleave = min(interleave, 4)
    # Deliberately no `interleave` arg here (unlike megakernel): wavefront
    # auto chunking stays chunks=1 — chunked chains measured flat-to-negative
    # under in-lane regeneration (round-3 paired A/Bs, docs/PERFORMANCE.md).
    scan_chunks = resolve_scan_chunks(n_tris, scan_chunks)
    if n_tris > TRI_UNROLL_CAP or scan_chunks > n_tris:
        scan_chunks = 1
    W, H = cfg.width, cfg.height
    bounces = cfg.bounces
    view, hol, upd, angle, eye = _camera_constants(cfg)
    aspect = np.float32(W / H)
    bg = tuple(np.float32(c) for c in cfg.bg_color)
    eboost = np.float32(cfg.emissive_boost)
    roffset = np.float32(cfg.ray_offset)

    def kernel(table_ref, start_ref, base_ref, out_ref, seg_ref):
        b = pl.program_id(0)
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        # base_ref: ABSOLUTE pixel id of this invocation's first block — nonzero
        # under shard_map tiling. RNG/camera key on the absolute id, so sharded
        # output is bitwise layout-invariant (same contract as megakernel).
        pid = base_ref[0] + b * BLOCK + sub_ids * LANE + lane_ids
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
        izeros = pid * 0

        def camera_ray(state):
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
            return state, o, d

        # Per-lane, per-stream state:
        #   s_idx: which progressive sample this stream is on (stream i owns
        #          samples ≡ i mod interleave)
        #   b_idx: current bounce within the path
        #   live:  path in flight
        #   rad:   CURRENT path's radiance (flushed to acc with the reference's
        #          max(.,0) clamp when the path ends)
        def init_path(s_idx):
            state = krng.seed_from(pid, start_ref[0] + s_idx)
            state, o, d = camera_ray(state)
            return state, o, d

        # live is carried as an f32 0/1 mask (Mosaic: no carried vector<i1>).
        def init_stream(i):
            state0, o0, d0 = init_path(izeros + i)
            return dict(
                s_idx=izeros + i, b_idx=izeros,
                live_f=vone if i < n_samples else vzero,
                state=state0, o=o0, d=d0,
                mask=(ones, ones, ones),
                rad=(zeros, zeros, zeros),
                acc=(zeros, zeros, zeros),
            )

        keys = tuple(sorted(init_stream(0).keys()))

        def pack(streams, segs):
            return tuple(tuple(c[k] for k in keys) for c in streams) + (segs,)

        def unpack(t):
            return [dict(zip(keys, s)) for s in t[:-1]], t[-1]

        def cond(t):
            streams, _ = unpack(t)
            total = streams[0]["live_f"]
            for c in streams[1:]:
                total = total + c["live_f"]
            return jnp.sum(total) > 0.0

        def seg_step(c, segs):
            """One traced segment for one stream; returns (stream', segs')."""
            o, d, mask, rad = c["o"], c["d"], c["mask"], c["rad"]
            state = c["state"]
            live = c["live_f"] > 0.5
            s_idx, b_idx = c["s_idx"], c["b_idx"]
            acc = c["acc"]

            segs = segs + c["live_f"]

            # ---- one traced segment (identical math to megakernel bounce) ----

            # tp scan: one cross(o, d) per segment feeds every triangle's
            # unum/vnum triple products (megakernel.material_classes comment).
            m = _cross3(o, d) if tp else None

            def tri_body_tp(j, tc):
                """Triple-product scan — same form as megakernel.tri_body_tp
                (tp table layout from pack_scene_tp)."""
                bnum, bden, bN, bcode = tc
                nv = (table_ref[j, 0], table_ref[j, 1], table_ref[j, 2])
                e1 = (table_ref[j, 3], table_ref[j, 4], table_ref[j, 5])
                e2 = (table_ref[j, 6], table_ref[j, 7], table_ref[j, 8])
                c1 = (table_ref[j, 9], table_ref[j, 10], table_ref[j, 11])
                c2 = (table_ref[j, 12], table_ref[j, 13], table_ref[j, 14])
                det = _dot3(d, nv)
                tnum = table_ref[j, 15] - _dot3(o, nv)
                unum = _dot3(e2, m) - _dot3(d, c1)
                vnum = _dot3(d, c2) - _dot3(e1, m)
                inside = jnp.minimum(jnp.minimum(unum, vnum),
                                     det - (unum + vnum)) >= 0.0
                sel = ((det >= 1e-8) & inside & (tnum > 0.0)
                       & (tnum * bden < bnum * det))
                bnum = jnp.where(sel, tnum, bnum)
                bden = jnp.where(sel, det, bden)
                bN = _where3(sel, (vzero + nv[0], vzero + nv[1],
                                   vzero + nv[2]), bN)
                bcode = jnp.where(sel, table_ref[j, 16], bcode)
                return bnum, bden, bN, bcode

            def tri_body_fast(j, tc):
                """Division-free scan — same form as megakernel.tri_body_fast
                (see kernels/megakernel._make_kernel docstring)."""
                bnum, bden, bn, balb, bcode = tc
                p1 = (table_ref[j, 0], table_ref[j, 1], table_ref[j, 2])
                e1 = (table_ref[j, 3], table_ref[j, 4], table_ref[j, 5])
                e2 = (table_ref[j, 6], table_ref[j, 7], table_ref[j, 8])
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
                bnum = jnp.where(sel, tnum, bnum)
                bden = jnp.where(sel, det, bden)
                bn = _where3(sel, (vzero + table_ref[j, 9],
                                   vzero + table_ref[j, 10],
                                   vzero + table_ref[j, 11]), bn)
                balb = _where3(sel, (vzero + table_ref[j, 12],
                                     vzero + table_ref[j, 13],
                                     vzero + table_ref[j, 14]), balb)
                bcode = jnp.where(sel, table_ref[j, 23], bcode)
                return bnum, bden, bn, balb, bcode

            def tri_body(j, tc):
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

                def bc(x):
                    return vzero + x

                best_t = jnp.where(sel, t, best_t)
                bn = _where3(sel, (bc(table_ref[j, 9]), bc(table_ref[j, 10]),
                                   bc(table_ref[j, 11])), bn)
                balb = _where3(sel, (bc(table_ref[j, 12]), bc(table_ref[j, 13]),
                                     bc(table_ref[j, 14])), balb)
                bemi = _where3(sel, (bc(table_ref[j, 15]), bc(table_ref[j, 16]),
                                     bc(table_ref[j, 17])), bemi)
                brough = jnp.where(sel, table_ref[j, 18], brough)
                bmty = jnp.where(sel, table_ref[j, 19], bmty)
                return best_t, bn, balb, bemi, brough, bmty

            def run_scan(body, fresh, merge):
                """In-order scan, or scan_chunks independent chains merged in
                chunk order (see megakernel.resolve_scan_chunks)."""
                if scan_chunks <= 1:
                    return jax.lax.fori_loop(
                        0, n_tris, body, fresh(),
                        unroll=resolve_tri_unroll(n_tris))
                parts = []
                for lo, hi in chunk_bounds(n_tris, scan_chunks):
                    tc = fresh()
                    for j in range(lo, hi):
                        tc = body(j, tc)
                    parts.append(tc)
                out = parts[0]
                for p in parts[1:]:
                    out = merge(out, p)
                return out

            if tp:
                ftc = run_scan(
                    tri_body_tp,
                    lambda: (vzero + T_MAX, vone, (zeros, zeros, zeros), zeros),
                    merge_frac_tc)
                best_t, bn, balb, bemi, brough, bmty = decode_tp_tc(
                    ftc, classes, vzero, vone)
                hit = best_t < T_MAX
            elif fast:
                ftc = run_scan(
                    tri_body_fast,
                    lambda: (vzero + T_MAX, vone, (zeros, zeros, zeros),
                             (zeros, zeros, zeros), zeros),
                    merge_frac_tc)
                best_t, bn, balb, bemi, brough, bmty = decode_fast_tc(
                    ftc, emi_const)
                hit = best_t < T_MAX
            else:
                best_t, bn, balb, bemi, brough, bmty = run_scan(
                    tri_body,
                    lambda: (vzero + T_MAX, (zeros, zeros, zeros),
                             (zeros, zeros, zeros), (zeros, zeros, zeros),
                             zeros, zeros),
                    merge_parity_tc)
                hit = best_t < T_MAX

            miss = live & ~hit
            rad = (rad[0] + jnp.where(miss, mask[0] * bg[0], 0.0),
                   rad[1] + jnp.where(miss, mask[1] * bg[1], 0.0),
                   rad[2] + jnp.where(miss, mask[2] * bg[2], 0.0))
            on_path = live & hit

            rad = (rad[0] + jnp.where(on_path, mask[0] * bemi[0] * eboost, 0.0),
                   rad[1] + jnp.where(on_path, mask[1] * bemi[1] * eboost, 0.0),
                   rad[2] + jnp.where(on_path, mask[2] * bemi[2] * eboost, 0.0))

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

            survive = on_path & (pdf > 0.0)
            safe_pdf = jnp.where(pdf > 0.0, pdf, 1.0)
            factor = _dot3(wi, n) / safe_pdf
            mask = (jnp.where(survive, mask[0] * f[0] * factor, mask[0]),
                    jnp.where(survive, mask[1] * f[1] * factor, mask[1]),
                    jnp.where(survive, mask[2] * f[2] * factor, mask[2]))

            hitp = _add3(o, _scale3(d, best_t))
            o = _add3(hitp, _scale3(wi, roffset))
            d = _where3(survive, wi, d)

            b_idx = b_idx + 1
            # Path terminates on: miss, dead pdf, or the bounce budget.
            path_done = live & (~survive | (b_idx >= bounces))

            # ---- flush finished path into the accumulator (max(rad,0) clamp,
            # GenerateColors.cl:260), then regenerate in-lane ----
            acc = (acc[0] + jnp.where(path_done, jnp.maximum(rad[0], 0.0), 0.0),
                   acc[1] + jnp.where(path_done, jnp.maximum(rad[1], 0.0), 0.0),
                   acc[2] + jnp.where(path_done, jnp.maximum(rad[2], 0.0), 0.0))

            s_next = s_idx + interleave * path_done.astype(jnp.int32)
            regen = path_done & (s_next < n_samples)
            live = (live & ~path_done) | regen
            s_idx = s_next
            b_idx = jnp.where(path_done, 0, b_idx)
            rad = _where3(path_done, (zeros, zeros, zeros), rad)
            mask = _where3(path_done, (ones, ones, ones), mask)

            new_state, new_o, new_d = init_path(s_idx)
            state = jnp.where(regen, new_state, state)
            o = _where3(regen, new_o, o)
            d = _where3(regen, new_d, d)

            c = dict(c)
            c.update(s_idx=s_idx, b_idx=b_idx, live_f=jnp.where(live, vone, vzero),
                     state=state, o=o, d=d,
                     mask=mask, rad=rad, acc=acc)
            return c, segs

        def step(t):
            streams, segs = unpack(t)
            out = []
            for c in streams:
                c, segs = seg_step(c, segs)
                out.append(c)
            return pack(out, segs)

        streams0 = [init_stream(i) for i in range(interleave)]
        streams, segs = unpack(
            jax.lax.while_loop(cond, step, pack(streams0, zeros)))
        # Per-stream partials summed in ascending stream order (deterministic;
        # equals the k=1 order exactly when interleave == 1).
        acc = streams[0]["acc"]
        for c in streams[1:]:
            acc = _add3(acc, c["acc"])
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]
        seg_ref[0, 0] = segs

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "interleave",
                                              "scan", "emi_const", "classes",
                                              "scan_chunks", "n_rays"))
def render_samples_wavefront_stats(table: jnp.ndarray, cfg: RenderConfig,
                                   start_sample, n_samples: int,
                                   interleave: int = 0, scan: str = "parity",
                                   emi_const: tuple = (0.0, 0.0, 0.0),
                                   classes: tuple = (), scan_chunks: int = 0,
                                   pid_base=0, n_rays: int | None = None):
    """SUM of n_samples frames via path regeneration + traced-segment count.

    interleave: independent per-lane path streams (0 = auto; see
    resolve_stream_interleave). 1 is bitwise-identical to the megakernel;
    k>1 reorders the per-lane accumulation (allclose, not bitwise).
    scan: "parity" | "fast" | "tp" — see kernels/megakernel._make_kernel.
    scan_chunks: independent scan chains merged post-hoc (0 = auto; see
    megakernel.resolve_scan_chunks).
    pid_base/n_rays: shard_map tiling — a device rendering pixels
    [pid_base, pid_base + n_rays) passes its offset so RNG/camera stay keyed
    on absolute ids (bitwise layout invariance; same as megakernel).
    """
    n_pix = n_rays if n_rays is not None else cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    kernel = _make_kernel(cfg, int(table.shape[0]), n_samples, interleave,
                          scan=scan, emi_const=emi_const, classes=classes,
                          scan_chunks=scan_chunks)
    out, segs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(table, jnp.asarray(start_sample, jnp.int32).reshape(1),
      jnp.asarray(pid_base, jnp.int32).reshape(1))
    img = out.transpose(0, 2, 3, 1).reshape(nb * BLOCK, 3)
    seg_flat = segs.reshape(nb * BLOCK)
    return img[:n_pix], jnp.sum(seg_flat[:n_pix])


def render_wavefront(scene: Scene, cfg: RenderConfig, total_spp: int,
                     samples_per_call: int = 0, scan: str = "auto",
                     interleave: int = 0, scan_chunks: int = 0) -> jnp.ndarray:
    """Progressive mean image via the path-regeneration kernel."""
    from oclpathtracer_tpu.kernels.megakernel import prepare_scan

    scan, table, emi, classes = prepare_scan(scene, scan)
    chunk = samples_per_call or total_spp
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    s = 0
    while s < total_spp:
        n = min(chunk, total_spp - s)
        img, _ = render_samples_wavefront_stats(table, cfg, s, n, scan=scan,
                                                emi_const=emi, classes=classes,
                                                interleave=interleave,
                                                scan_chunks=scan_chunks)
        acc = acc + img
        s += n
    return acc / total_spp
