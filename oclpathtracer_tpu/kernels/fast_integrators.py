"""Fused Pallas kernels for the integrator ladder's lower rungs: AO and
direct-NEE (BASELINE.json configs 2 and 3).

Same architecture as kernels/megakernel.py (lane-per-ray (8,128) tiles, scene
table in SMEM, gather-free best-hit tracking, reference RNG streams); each sample
is two ray segments — a camera ray and a cosine/shadow ray — fused on-chip.

Bit-comparison twins: integrators/ao.render_ao_sample_ref and
integrators/direct.render_direct_sample_ref consume identical streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.integrators.ao import DEFAULT_AO_RADIUS
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
    _scale3,
    _where3,
    pack_scene,
    resolve_tri_unroll,
)
from oclpathtracer_tpu.scene.types import Scene

# Light table layout (L, 16) f32:
#  0:3 p1 | 3:6 p2 | 6:9 p3 | 9:12 normal | 12:15 emissive | 15 cdf (normalized)
LIGHT_COLS = 16


def pack_lights(scene: Scene):
    """(light_table (L,16) f32, total_area f32) for the NEE kernel."""
    g = scene.geometry
    li = np.asarray(scene.lights.tri_idx)
    areas = np.asarray(scene.lights.area, np.float64)
    total = float(areas.sum())
    cdf = np.cumsum(areas) / total
    tbl = np.zeros((len(li), LIGHT_COLS), np.float32)
    tbl[:, 0:3] = np.asarray(g.p1)[li]
    tbl[:, 3:6] = np.asarray(g.p2)[li]
    tbl[:, 6:9] = np.asarray(g.p3)[li]
    tbl[:, 9:12] = np.asarray(scene.lights.normal)
    tbl[:, 12:15] = np.asarray(scene.materials.emissive)[np.asarray(g.mat_id)[li]]
    tbl[:, 15] = cdf.astype(np.float32)
    return jnp.asarray(tbl), np.float32(total)


def _nearest_hit_factory(table_ref, n_tris, vzero, with_materials: bool):
    """Returns a scan(o, d) → (best_t, bn[, balb, bemi, brough, bmty])."""

    def scan(o, d):
        best_t = vzero + T_MAX
        bn = (vzero, vzero, vzero)
        extras = ((vzero, vzero, vzero), (vzero, vzero, vzero), vzero, vzero) \
            if with_materials else None

        def tri_body(j, tc):
            if with_materials:
                best_t, bn, balb, bemi, brough, bmty = tc
            else:
                best_t, bn = tc
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
            bn = _where3(sel, (vzero + table_ref[j, 9], vzero + table_ref[j, 10],
                               vzero + table_ref[j, 11]), bn)
            if not with_materials:
                return best_t, bn
            balb = _where3(sel, (vzero + table_ref[j, 12], vzero + table_ref[j, 13],
                                 vzero + table_ref[j, 14]), balb)
            bemi = _where3(sel, (vzero + table_ref[j, 15], vzero + table_ref[j, 16],
                                 vzero + table_ref[j, 17]), bemi)
            brough = jnp.where(sel, table_ref[j, 18], brough)
            bmty = jnp.where(sel, table_ref[j, 19], bmty)
            return best_t, bn, balb, bemi, brough, bmty

        init = (best_t, bn) + (extras if with_materials else ())
        return jax.lax.fori_loop(0, n_tris, tri_body, init,
                                 unroll=resolve_tri_unroll(n_tris))

    return scan


def _any_hit_factory(table_ref, n_tris, vzero):
    """scan(o, d, t_max tile) → blocked f32 0/1 (reference cull semantics)."""

    def scan(o, d, t_max):
        def tri_body(j, blocked):
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
                   & (t > 0.0) & (t < t_max))
            return jnp.where(sel, vzero + 1.0, blocked)

        return jax.lax.fori_loop(0, n_tris, tri_body, vzero,
                                 unroll=resolve_tri_unroll(n_tris))

    return scan


def _camera_and_tiles(cfg, base_ref):
    W, H = cfg.width, cfg.height
    b = pl.program_id(0)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    pid = base_ref[0] + b * BLOCK + sub_ids * LANE + lane_ids
    px = (pid % W).astype(jnp.float32)
    py = (pid // W).astype(jnp.float32)
    vzero = pid.astype(jnp.float32) * 0.0
    return pid, px, py, vzero


def _gen_camera_ray(cfg, px, py, vzero, state):
    W, H = cfg.width, cfg.height
    view, hol, upd, angle, eye = _camera_constants(cfg)
    aspect = np.float32(W / H)
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
    return state, o, d


def _tangent_frame(n, vzero, vone):
    use_y = jnp.abs(n[0]) > 0.001
    axis = _where3(use_y, (vzero, vone, vzero), (vone, vzero, vzero))
    tt = _normalize3(_cross3(axis, n))
    ss = _cross3(n, tt)
    return ss, tt


def _make_ao_kernel(cfg: RenderConfig, n_tris: int, n_samples: int, radius: float):
    roffset = np.float32(cfg.ray_offset)
    rad_f = np.float32(radius)

    def kernel(table_ref, start_ref, base_ref, out_ref):
        pid, px, py, vzero = _camera_and_tiles(cfg, base_ref)
        vone = vzero + 1.0
        nearest = _nearest_hit_factory(table_ref, n_tris, vzero, False)
        any_hit = _any_hit_factory(table_ref, n_tris, vzero)

        def one_sample(k, acc):
            state = krng.seed_from(pid, start_ref[0] + k)
            state, o, d = _gen_camera_ray(cfg, px, py, vzero, state)
            best_t, bn = nearest(o, d)
            hit = best_t < T_MAX
            n = _where3(_dot3(bn, d) < 0.0, bn, _neg3(bn))

            state, u1 = krng.next_float(state)
            state, u2 = krng.next_float(state)
            ss, tt = _tangent_frame(n, vzero, vone)
            phi = TWO_PI * u1
            sin_t = jnp.sqrt(u2)
            cos_t = jnp.sqrt(1.0 - u2)
            wi = _normalize3(_add3(_add3(
                _scale3(ss, jnp.cos(phi) * sin_t),
                _scale3(tt, jnp.sin(phi) * sin_t)), _scale3(n, cos_t)))

            hitp = _add3(o, _scale3(d, best_t))
            so = _add3(hitp, _scale3(wi, roffset))
            blocked = any_hit(so, wi, vzero + rad_f) > 0.5
            vis = jnp.where(hit, jnp.where(blocked, 0.0, 1.0), 1.0)
            return acc + vis

        acc = jax.lax.fori_loop(0, n_samples, one_sample, vzero)
        out_ref[0, 0] = acc
        out_ref[0, 1] = acc
        out_ref[0, 2] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "radius", "n_rays"))
def render_ao_pallas(table, cfg: RenderConfig, start_sample, n_samples: int,
                     radius: float = DEFAULT_AO_RADIUS, pid_base=0,
                     n_rays: int | None = None):
    """SUM of n_samples 1-spp AO frames (reference RNG streams): (n_rays, 3)."""
    n_pix = n_rays if n_rays is not None else cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    kernel = _make_ao_kernel(cfg, int(table.shape[0]), n_samples, radius)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 3, SUB, LANE), jnp.float32),
        interpret=_interpret(),
    )(table, jnp.asarray(start_sample, jnp.int32).reshape(1),
      jnp.asarray(pid_base, jnp.int32).reshape(1))
    return out.transpose(0, 2, 3, 1).reshape(nb * BLOCK, 3)[:n_pix]


def _make_direct_kernel(cfg: RenderConfig, n_tris: int, n_lights: int,
                        n_samples: int):
    roffset = np.float32(cfg.ray_offset)
    eboost = np.float32(cfg.emissive_boost)
    bg = tuple(np.float32(c) for c in cfg.bg_color)

    def kernel(table_ref, light_ref, area_ref, start_ref, base_ref, out_ref):
        pid, px, py, vzero = _camera_and_tiles(cfg, base_ref)
        vone = vzero + 1.0
        nearest = _nearest_hit_factory(table_ref, n_tris, vzero, True)
        any_hit = _any_hit_factory(table_ref, n_tris, vzero)

        def one_sample(k, acc):
            state = krng.seed_from(pid, start_ref[0] + k)
            state, o, d = _gen_camera_ray(cfg, px, py, vzero, state)
            best_t, bn, balb, bemi, brough, bmty = nearest(o, d)
            hit = best_t < T_MAX
            n = _where3(_dot3(bn, d) < 0.0, bn, _neg3(bn))
            hitp = _add3(o, _scale3(d, best_t))

            rad = (jnp.where(hit, bemi[0] * eboost, 0.0),
                   jnp.where(hit, bemi[1] * eboost, 0.0),
                   jnp.where(hit, bemi[2] * eboost, 0.0))

            # ---- light sample (≡ integrators/direct.sample_lights)
            state, u_tri = krng.next_float(state)
            state, ua = krng.next_float(state)
            state, ub = krng.next_float(state)

            # inverse-CDF pick, then attribute select over the (small) light table
            li = vzero.astype(jnp.int32)
            for l in range(n_lights):
                li = li + (u_tri > light_ref[l, 15]).astype(jnp.int32)
            li = jnp.minimum(li, n_lights - 1)

            def pick(col):
                v = vzero
                for l in range(n_lights):
                    v = jnp.where(li == l, vzero + light_ref[l, col], v)
                return v

            a = (pick(0), pick(1), pick(2))
            bb = (pick(3), pick(4), pick(5))
            cc = (pick(6), pick(7), pick(8))
            ln = (pick(9), pick(10), pick(11))
            le = (pick(12), pick(13), pick(14))

            su = jnp.sqrt(ua)
            w0 = 1.0 - su
            w1 = su * (1.0 - ub)
            w2 = su * ub
            lp = (a[0] * w0 + bb[0] * w1 + cc[0] * w2,
                  a[1] * w0 + bb[1] * w1 + cc[1] * w2,
                  a[2] * w0 + bb[2] * w1 + cc[2] * w2)

            to_l = (lp[0] - hitp[0], lp[1] - hitp[1], lp[2] - hitp[2])
            dist2 = jnp.maximum(_dot3(to_l, to_l), 1e-12)
            dist = jnp.sqrt(dist2)
            wi = _scale3(to_l, 1.0 / dist)
            cos_x = _dot3(wi, n)
            cos_l = jnp.abs(_dot3(_neg3(wi), ln))

            so = _add3(hitp, _scale3(wi, roffset))
            blocked = any_hit(so, wi, dist - 2.0 * roffset) > 0.5

            # eval_brdf (core/brdf.eval_brdf): diffuse + GGX eval, cos_i>0 gate
            wo = _neg3(d)
            f_d = _scale3(balb, INV_PI)
            wh = _normalize3(_add3(wo, wi))
            cos_h = _dot3(wh, n)
            r2 = brough * brough
            denom_ndf = cos_h * cos_h * (r2 - 1.0) + 1.0
            d_ndf = r2 * INV_PI / jnp.maximum(denom_ndf * denom_ndf, 1e-12)
            denom = jnp.maximum(4.0 * _dot3(wi, n) * _dot3(wo, n), 1e-8)
            f_s = _scale3(balb, d_ndf / denom * 2.0)
            is_spec = bmty >= 1.5
            f = _where3(is_spec, f_s, f_d)
            f = _where3(cos_x > 0.0, f, (vzero, vzero, vzero))

            pdf_a = 1.0 / area_ref[0]
            geom = cos_x * cos_l / dist2 / pdf_a
            on_light = jnp.maximum(jnp.maximum(bemi[0], bemi[1]), bemi[2]) > 0.0
            usable = hit & ~blocked & (cos_x > 0.0) & ~on_light
            rad = (rad[0] + jnp.where(usable, f[0] * le[0] * eboost * geom, 0.0),
                   rad[1] + jnp.where(usable, f[1] * le[1] * eboost * geom, 0.0),
                   rad[2] + jnp.where(usable, f[2] * le[2] * eboost * geom, 0.0))

            rad = _where3(hit, rad, (vzero + bg[0], vzero + bg[1], vzero + bg[2]))
            return (acc[0] + rad[0], acc[1] + rad[1], acc[2] + rad[2])

        acc = jax.lax.fori_loop(0, n_samples, one_sample, (vzero, vzero, vzero))
        out_ref[0, 0] = acc[0]
        out_ref[0, 1] = acc[1]
        out_ref[0, 2] = acc[2]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "n_rays"))
def render_direct_pallas(table, light_table, total_area, cfg: RenderConfig,
                         start_sample, n_samples: int, pid_base=0,
                         n_rays: int | None = None):
    """SUM of n_samples 1-spp direct-NEE frames (reference RNG streams)."""
    n_pix = n_rays if n_rays is not None else cfg.n_pixels
    nb = pl.cdiv(n_pix, BLOCK)
    kernel = _make_direct_kernel(cfg, int(table.shape[0]),
                                 int(light_table.shape[0]), n_samples)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
        out_specs=pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 3, SUB, LANE), jnp.float32),
        interpret=_interpret(),
    )(table, light_table,
      jnp.asarray(total_area, jnp.float32).reshape(1),
      jnp.asarray(start_sample, jnp.int32).reshape(1),
      jnp.asarray(pid_base, jnp.int32).reshape(1))
    return out.transpose(0, 2, 3, 1).reshape(nb * BLOCK, 3)[:n_pix]
