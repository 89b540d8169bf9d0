"""Training-step benchmark: jnp-backward vs the adjoint-kernel step (VERDICT r3 #3).

Times one inverse-rendering SGD step three ways on the canonical scene and
prints a JSON line per variant:

  jnp      — make_train_step: forward AND backward through the jnp integrator
             (the semantic anchor; what rounds 1-3 shipped as "training").
  hybrid   — make_fast_loss_fn: Pallas forward, backward through the jnp twin.
  kernel   — make_kernel_train_step: Pallas forward AND hand-derived adjoint
             backward (kernels/grad_megakernel.py) — no jnp anywhere.

Mrays/s = traced segments the step's renders+adjoints process / wall time.
Segments per spp-frame window are measured exactly once via the megakernel's
own per-bounce tally on the same reference streams (the adjoint kernel traces
the identical paths). The kernel step runs 4 kernel passes per step (2 forward,
2 adjoint) on 2·spp frames total → segments/step = 2 × (fwd segs + adj segs)
= 4 × segs(spp window). Same-session ratios are the signal (the tunnel chip
drifts ±30%, docs/PERFORMANCE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BOUNCES = 4
SPP = 8
STEPS = 6


def main() -> None:
    from oclpathtracer_tpu import RenderConfig
    from oclpathtracer_tpu.core import rng
    from oclpathtracer_tpu.diff import extract_params, make_train_step
    from oclpathtracer_tpu.diff.fast import (
        extract_class_params,
        make_fast_loss_fn,
        make_kernel_train_step,
    )
    from oclpathtracer_tpu.kernels.megakernel import (
        prepare_scan,
        render_samples_pallas_stats,
    )
    from oclpathtracer_tpu.runtime import enable_compilation_cache
    from oclpathtracer_tpu.scene import load_cornell_box

    enable_compilation_cache()
    scene = load_cornell_box()
    cfg = RenderConfig(width=SIZE, height=SIZE, bounces=BOUNCES)
    key = rng.make_key(0)

    # Exact traced segments in one spp-frame window (reference streams).
    scan, table, emi, classes = prepare_scan(scene, "auto")
    _, segs = render_samples_pallas_stats(table, cfg, 0, SPP, scan=scan,
                                          emi_const=emi, classes=classes)
    segs = float(segs)

    def time_steps(step_fn, params, *args):
        params, loss = step_fn(params, *args)  # compile
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(STEPS):
            t0 = time.perf_counter()
            params, loss = step_fn(params, *args)
            jax.block_until_ready(loss)
            best = min(best, time.perf_counter() - t0)
        return best, float(loss)

    results = {}

    # kernel step: 2 forward + 2 adjoint passes over spp frames each.
    kstep = make_kernel_train_step(scene, cfg, SPP, lr=1e-3)
    cparams = extract_class_params(scene)
    target = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    dt, loss = time_steps(lambda p, t: kstep(p, t, jnp.int32(0)), cparams, target)
    results["kernel"] = (dt, 4 * segs / dt / 1e6, loss)

    # hybrid: Pallas forward ×2, jnp-twin backward (value_and_grad of the
    # pairwise loss → 2 twin VJPs ≈ 2 fwd + 2 bwd twin sweeps).
    floss = make_fast_loss_fn(scene, cfg, SPP)
    params = extract_params(scene, albedo=True, emissive=True)
    grad_fn = jax.jit(jax.value_and_grad(floss))

    def hstep(p, t):
        loss, g = grad_fn(p, t, jnp.int32(0))
        p = jax.tree.map(lambda a, b: None if a is None else a - 1e-3 * b, p, g,
                         is_leaf=lambda x: x is None)
        return p, loss

    dt, loss = time_steps(hstep, params, target)
    results["hybrid"] = (dt, 4 * segs / dt / 1e6, loss)

    # jnp: everything through integrators/path.py (threefry streams — segment
    # count differs slightly from the reference streams; same workload scale).
    jstep = make_train_step(scene, cfg, SPP, lr=1e-3)
    dt, loss = time_steps(lambda p, t: jstep(p, t, jnp.int32(0), key), params,
                          target)
    results["jnp"] = (dt, 2 * segs / dt / 1e6, loss)  # 1 fwd + 1 bwd sweep

    for name, (dt, mrays, loss) in results.items():
        print(json.dumps({
            "metric": f"train_step_{name}",
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "step_seconds": round(dt, 4),
            "loss": round(loss, 6),
            "speedup_vs_jnp": round(results["jnp"][0] / dt, 2),
        }))

    # ---- VERTEX steps (round 5, VERDICT r4 item 2): boundary-term training.
    # Both variants run the SAME estimator quadrature (primary 108 edges × 64
    # samples, secondary light rim 16/edge at pixel stride 4), so the ratio
    # isolates the probe/forward backend: all-jnp (what round 4 shipped) vs
    # Pallas forwards + Pallas arbitrary-ray probes + jnp interior at spp/4.
    import optax

    from oclpathtracer_tpu.diff import (
        make_edge_aware_loss_fn,
        make_vertex_train_step,
    )

    vparams = extract_params(scene, albedo=False, vertices=True)
    eloss = make_edge_aware_loss_fn(
        scene, cfg, SPP, samples_per_edge=64, edge_spp=4,
        secondary_samples_per_edge=16, secondary_spp=2,
        secondary_pixel_stride=4)
    egrad = jax.jit(jax.value_and_grad(eloss))

    def vjstep(p, t):
        loss, g = egrad(p, t, key)
        p = p._replace(vertices=tuple(
            a - 1e-4 * b for a, b in zip(p.vertices, g.vertices)))
        return p, loss

    dt_j, loss = time_steps(vjstep, vparams, target)

    vstep, vinit = make_vertex_train_step(
        scene, cfg, SPP, optax.sgd(1e-4), interior_spp=max(SPP // 4, 1),
        samples_per_edge=64, edge_spp=4, secondary=True,
        secondary_samples_per_edge=16, secondary_spp=2,
        secondary_pixel_stride=4)
    state_box = [vinit(vparams)]

    def vkstep(p, t):
        p, state_box[0], loss = vstep(p, state_box[0], t, jnp.int32(0), key)
        return p, loss

    dt_k, loss_k = time_steps(vkstep, vparams, target)
    for name, dt, l in (("vertex_jnp", dt_j, loss), ("vertex_kernel", dt_k,
                                                     loss_k)):
        print(json.dumps({
            "metric": f"train_step_{name}",
            "value": round(dt * 1000, 1),
            "unit": "ms/step",
            "loss": round(l, 6),
            "speedup_vs_vertex_jnp": round(dt_j / dt, 2),
        }))


if __name__ == "__main__":
    main()
