"""Secondary-visibility boundary gradients — the shadow/indirect term.

diff/edge.py integrates PRIMARY visibility boundaries: triangle silhouettes as
seen from the CAMERA, crossing the pixel-footprint integral. But the pixel
value also integrates over bounce directions at every path vertex, and THAT
integral has its own discontinuities: the rim of the area light (and of any
occluder) as seen from the shading point. Moving a light vertex moves the rim
in every bounce hemisphere — the radiance jump there is Le·boost vs whatever
lies behind — and plain AD sees none of it (emission pickup is piecewise
constant in the vertices: `radiance += mask·emissive·3`, GenerateColors.cl:241,
with no geometric factor). Round 4 measured this as the dominant error in the
Cornell light's vertex gradients (diff/edge.py bias note); this module supplies
the missing term (VERDICT r4 item 1).

Derivation. At a depth-b path vertex x with incoming direction d and
throughput m_{b-1}, the remaining pixel contribution is

    m_{b-1} ⊙ [ e(x) + ∫_Ω f(−d→ω) cosθ_x L_i(x, ω; rem) dω ]

with rem = bounces − b remaining scatter events in L_i. The hemisphere
integral's domain jump across the rim contour ∂A(θ) on the unit sphere gives

    d/dθ (∫_Ω …) ⊇ ∮_{∂A} f cosθ_x (L_in − L_out)(ω) (n̂ · ∂ω/∂θ) dl_ω

(f and cosθ_x are continuous across the rim; only L_i jumps). Everything is
closed-form on the sphere: for a rim point P(s) = (1−s)A + sB of edge (A, B),

    ω = (P − x)/r,  τ = dω/ds = (I − ωωᵀ)(B − A)/r,  dl = |τ| ds,
    n̂ = ω × τ̂ oriented away from the rim's interior,
    n̂ · ∂ω/∂A = (1−s) n̂/r,   n̂ · ∂ω/∂B = s n̂/r        (n̂ ⊥ ω)

— the velocity pullback needs no vjp at all. L_in/L_out are probed with CRN
path samples at ±δ (radians) across the rim, traced with the true remaining
bounce budget, so occlusion of the rim (a box between x and the light) makes
ΔL ≈ 0 automatically — correctness comes from the estimator, not a
classifier, exactly like the primary module.

Scope and estimator structure (TPU-first: every shape static):
  * rim set = edges of a STATIC triangle subset (default: the emissive
    triangles — the one rim whose motion plain AD + primary edges provably
    miss; occluder secondary silhouettes can be added by passing their ids);
  * prefix points = one deterministic mid-pixel path per pixel, extended to
    `max_prefix_depth` vertices with CRN-sampled bounces, weighted by the
    running throughput (depth 1 = the first-hit term, which dominates: each
    extra depth is attenuated by one albedo·cos factor);
  * the full (pixels × rim samples) pairing is evaluated as one fused batch —
    no data-dependent shapes, no scatter except the final static-index
    fold-back into (T, 3) vertex cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oclpathtracer_tpu.config import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.core.brdf import eval_brdf, sample_brdf
from oclpathtracer_tpu.core.intersect import intersect_world
from oclpathtracer_tpu.diff.edge import rays_at
from oclpathtracer_tpu.integrators.path import UNIFORMS_PER_BOUNCE, trace_paths
from oclpathtracer_tpu.scene.types import Scene


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def emissive_tris(scene: Scene) -> tuple:
    """Static tuple of triangle indices with any emission — the light rim."""
    emi = np.asarray(scene.materials.emissive)[np.asarray(scene.geometry.mat_id)]
    return tuple(int(i) for i in np.nonzero(emi.max(axis=-1) > 0.0)[0])


def _radiance_rays(scene: Scene, cfg: RenderConfig, o, d, bounces: int,
                   key: jax.Array, spp: int) -> jnp.ndarray:
    """Mean radiance of `spp` CRN path samples along arbitrary rays (N, 3).

    Streams key on (key, draw, row index) — two calls with the same key share
    streams row-for-row (the CRN property the ± rim probes rely on)."""
    n = o.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)

    def body(acc, i):
        us = rng.pixel_uniforms(rng.sample_key(key, i), ids,
                                UNIFORMS_PER_BOUNCE * bounces)
        bounce_us = us.reshape(n, bounces, UNIFORMS_PER_BOUNCE)
        radiance, _ = trace_paths(o, d, scene, bounce_us, cfg)
        return acc + radiance, None

    acc, _ = jax.lax.scan(body, jnp.zeros((n, 3), jnp.float32),
                          jnp.arange(spp, dtype=jnp.int32))
    return acc / spp


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tri_idx", "samples_per_edge", "spp", "delta", "max_prefix_depth",
    "pixel_stride", "probe_fn"))
def _secondary_grads(scene: Scene, cfg: RenderConfig, weight: jnp.ndarray,
                     key: jax.Array, tri_idx: tuple, samples_per_edge: int,
                     spp: int, delta: float, max_prefix_depth: int,
                     pixel_stride: int = 1, probe_fn=None):
    T_total = scene.geometry.p1.shape[0]
    sel = np.asarray(tri_idx, np.int32)
    Tsel = sel.shape[0]
    S = samples_per_edge
    E = 3 * Tsel
    geom = scene.geometry
    mats = scene.materials

    # Rim edges of the selected triangles, _edge_soa layout:
    # [0:T)=(p1,p2|p3), [T:2T)=(p2,p3|p1), [2T:3T)=(p3,p1|p2).
    p1, p2, p3 = geom.p1[sel], geom.p2[sel], geom.p3[sel]
    A = jnp.concatenate([p1, p2, p3], 0)
    B = jnp.concatenate([p2, p3, p1], 0)
    C = jnp.concatenate([p3, p1, p2], 0)
    # Pack orientation normal (cross(e2, e1), megakernel/pack_scene): a rim is
    # a local discontinuity from x only when its face is front-facing there —
    # the scan culls backfaces (GenerateColors.cl:100), so a backfacing
    # face's motion cannot move any visible boundary.
    n_tri = jnp.cross(p3 - p1, p2 - p1)
    n_edge = jnp.tile(n_tri, (3, 1))  # (E, 3), unnormalized (sign only)

    s = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S           # (S,)
    P = (1.0 - s)[None, :, None] * A[:, None, :] + \
        s[None, :, None] * B[:, None, :]                        # (E, S, 3)
    P_flat = P.reshape(E * S, 3)
    edge_ab = jnp.repeat(B - A, S, axis=0)                      # (E·S, 3)
    edge_c = jnp.repeat(C, S, axis=0)
    edge_n = jnp.repeat(n_edge, S, axis=0)
    s_flat = jnp.tile(s, E)                                     # (E·S,)
    R = E * S

    # Prefix rays: one mid-pixel path per pixel (midpoint quadrature of the
    # jitter integral; the boundary integrand is smooth in the sub-pixel
    # offset, so the footprint error is second-order). pixel_stride > 1
    # subsamples the image quadrature and rescales — the production knob for
    # large images (the probe batch is n_prefix × 3·|tri_idx|·S rows).
    n_pix = (cfg.n_pixels + pixel_stride - 1) // pixel_stride
    pids = jnp.arange(n_pix, dtype=jnp.int32) * pixel_stride
    coords = jnp.stack([(pids % cfg.width).astype(jnp.float32) + 0.5,
                        (pids // cfg.width).astype(jnp.float32) + 0.5], -1)
    o, d = rays_at(coords, cfg)
    weight = weight[pids] * pixel_stride
    mask = jnp.ones((n_pix, 3), jnp.float32)
    active = jnp.ones((n_pix,), bool)
    pkey = jax.random.fold_in(key, 0x5ECD)

    dA_acc = jnp.zeros((E, 3), jnp.float32)
    dB_acc = jnp.zeros((E, 3), jnp.float32)

    depth_cap = min(max_prefix_depth, cfg.bounces - 1)
    for depth in range(1, depth_cap + 1):
        rec = intersect_world(o, d, geom)
        hit = active & rec.hit
        x = rec.point                                           # (N, 3)
        nrm = jnp.where((_dot(rec.normal, d) < 0.0)[:, None],
                        rec.normal, -rec.normal)
        albedo = mats.albedo[rec.mat_id]
        rough = mats.roughness[rec.mat_id]
        mty = mats.mtype[rec.mat_id]
        wo = -d
        wcur = weight * mask                                    # (N, 3)
        rem = cfg.bounces - depth

        # ---- rim geometry as seen from every x: pairwise (N, R, ...)
        rel = P_flat[None, :, :] - x[:, None, :]                # (N, R, 3)
        r = jnp.linalg.norm(rel, axis=-1)                       # (N, R)
        safe_r = jnp.maximum(r, 1e-6)
        om = rel / safe_r[..., None]
        tau = (edge_ab[None] - om * _dot(om, edge_ab[None])[..., None]) \
            / safe_r[..., None]                                 # dω/ds
        tn = jnp.linalg.norm(tau, axis=-1)                      # (N, R)
        that = tau / jnp.maximum(tn, 1e-12)[..., None]
        nh = jnp.cross(om, that)                                # unit, ⊥ ω, τ
        # Orient away from the rim interior: the interior's direction on the
        # sphere is the projection of (C − P) at the rim point.
        dc = (edge_c[None] - P_flat[None]) \
            - om * _dot(om, edge_c[None] - P_flat[None])[..., None]
        nh = jnp.where((_dot(nh, dc) > 0.0)[..., None], -nh, nh)
        front = _dot(om, edge_n[None]) >= 1e-8                  # face cull
        cosx = _dot(om, nrm[:, None, :])                        # (N, R)

        # ---- CRN radiance probes just inside / outside the rim. probe_fn
        # ((M, 3) o, (M, 3) d, rem bounces, depth → (M, 3) mean radiance;
        # paired calls share streams row-for-row) = the kernel-probe hook.
        d_in = _normalize(om - delta * nh)
        d_out = _normalize(om + delta * nh)
        o_in = (x[:, None, :] + d_in * cfg.ray_offset).reshape(-1, 3)
        o_out = (x[:, None, :] + d_out * cfg.ray_offset).reshape(-1, 3)
        if probe_fn is None:
            dkey = jax.random.fold_in(key, 0x5EC0 + depth)
            probe = lambda oo, dd: _radiance_rays(scene, cfg, oo, dd, rem,
                                                  dkey, spp)
        else:
            probe = lambda oo, dd: probe_fn(oo, dd, rem, depth)
        L_in = probe(o_in, d_in.reshape(-1, 3)).reshape(n_pix, R, 3)
        L_out = probe(o_out, d_out.reshape(-1, 3)).reshape(n_pix, R, 3)

        f = eval_brdf(wo[:, None, :], om, nrm[:, None, :], albedo[:, None, :],
                      rough[:, None], mty[:, None])             # (N, R, 3)
        dl = tn / S
        coeff = jnp.sum(wcur[:, None, :] * f * (L_in - L_out), -1) * cosx * dl
        coeff = jnp.where(hit[:, None] & front & (tn > 1e-8) & (r > 1e-4),
                          coeff, 0.0)

        # ---- closed-form velocity pullback, summed over prefixes
        per = coeff / safe_r                                    # (N, R)
        dA_acc = dA_acc + jnp.einsum(
            "nr,nrk->rk", per * (1.0 - s_flat)[None], nh).reshape(E, S, 3).sum(1)
        dB_acc = dB_acc + jnp.einsum(
            "nr,nrk->rk", per * s_flat[None], nh).reshape(E, S, 3).sum(1)

        # ---- extend the prefix one CRN-sampled bounce
        if depth < depth_cap:
            us = rng.pixel_uniforms(rng.sample_key(pkey, depth), pids, 2)
            bs = sample_brdf(wo, nrm, albedo, rough, mty, us[:, 0], us[:, 1])
            alive = hit & (bs.pdf > 0.0)
            safe_pdf = jnp.where(bs.pdf > 0.0, bs.pdf, 1.0)
            factor = bs.f * (_dot(bs.wi, nrm) / safe_pdf)[:, None]
            mask = jnp.where(alive[:, None], mask * factor, 0.0)
            o = x + bs.wi * cfg.ray_offset
            d = jnp.where(alive[:, None], bs.wi, d)
            active = alive

    # Fold directed-edge cotangents back to the subset's vertices, then
    # scatter into the full (T, 3) arrays at the STATIC selection indices.
    dp1_s = dA_acc[0:Tsel] + dB_acc[2 * Tsel:3 * Tsel]
    dp2_s = dA_acc[Tsel:2 * Tsel] + dB_acc[0:Tsel]
    dp3_s = dA_acc[2 * Tsel:3 * Tsel] + dB_acc[Tsel:2 * Tsel]
    zeros = jnp.zeros((T_total, 3), jnp.float32)
    return (zeros.at[sel].add(dp1_s), zeros.at[sel].add(dp2_s),
            zeros.at[sel].add(dp3_s))


def secondary_boundary_vertex_grads(scene: Scene, cfg: RenderConfig,
                                    weight: jnp.ndarray, key: jax.Array,
                                    tri_idx=None, samples_per_edge: int = 32,
                                    spp: int = 4, delta: float = 0.01,
                                    max_prefix_depth: int = 1,
                                    pixel_stride: int = 1, probe_fn=None):
    """Secondary-visibility term of d(Σ_p w_p·I_p)/d(vertices) — (dp1, dp2, dp3).

    weight: (n_pixels, 3) = ∂loss/∂I per pixel/channel. tri_idx: static
    triangle ids whose edges form the moving rim (default: the emissive
    triangles). samples_per_edge: quadrature points per rim edge. spp: CRN
    path samples per radiance probe. delta: angular probe offset (radians) —
    measured on the Cornell light, the estimate converges by δ ≤ 0.01 (larger
    δ under-reads thin-sliver views of the light, e.g. walls near the
    ceiling). max_prefix_depth: path-vertex depths to integrate (1 = first
    hit — the dominant term; each deeper level is attenuated by one
    albedo·cos factor and costs one more full probe batch). pixel_stride:
    image-quadrature subsampling for large images.

    Documented restriction: near-mirror (GGX, roughness ≪ 0.1) receivers are
    under-resolved — the rim crosses the mirror lobe on a measure-zero set a
    finite quadrature misses; their true contribution is the light's moving
    specular reflection. Validated on diffuse receivers (tests/test_diff_
    secondary.py): isolation scene ≈ ±10%, Cornell light vs multi-key FD
    ≈ ±15% (FD's own key-to-key spread is ±15% there).
    """
    if tri_idx is None:
        tri_idx = emissive_tris(scene)
    if len(tri_idx) == 0:
        z = jnp.zeros_like(scene.geometry.p1)
        return z, z, z
    return _secondary_grads(scene, cfg, weight, key, tuple(tri_idx),
                            samples_per_edge, spp, delta, max_prefix_depth,
                            pixel_stride, probe_fn)
