"""Fast differentiable path: Pallas forward + jnp-twin backward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.diff import extract_params
from oclpathtracer_tpu.diff.fast import make_fast_loss_fn, make_fast_renderer
from oclpathtracer_tpu.kernels.megakernel import pack_scene

CFG = RenderConfig(width=32, height=32, bounces=3)


@pytest.mark.slow  # interpret-mode kernel render dominates wall-time
def test_fast_forward_matches_twin(scene):
    render, twin = make_fast_renderer(scene, CFG, 2)
    params = extract_params(scene, albedo=True)
    a = np.asarray(render(params, jnp.int32(0)))
    b = np.asarray(twin(params, jnp.int32(0)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fast_gradient_equals_twin_gradient(scene):
    render, twin = make_fast_renderer(scene, CFG, 2)
    params = extract_params(scene, albedo=True)

    def loss_fast(p):
        return jnp.sum(render(p, jnp.int32(0)) ** 2)

    def loss_twin(p):
        return jnp.sum(twin(p, jnp.int32(0)) ** 2)

    g_fast = jax.grad(loss_fast)(params)
    g_twin = jax.grad(loss_twin)(params)
    # bwd differentiates the twin at the kernel's forward VALUE — the only
    # difference is the forward residual entering the loss cotangent (<=1e-4).
    np.testing.assert_allclose(np.asarray(g_fast.albedo),
                               np.asarray(g_twin.albedo), rtol=1e-3, atol=1e-3)


@pytest.mark.slow  # two full edge-sampled gradients (jnp + kernel probes)
def test_kernel_probe_boundary_grads_match_jnp_probes():
    """The primary boundary estimator with Pallas arbitrary-ray probes agrees
    with the jnp-probe version (VERDICT r4 item 2 plumbing). Streams differ
    between the two probe backends, so agreement is to MC noise — checked on
    the occluder scene's dominant silhouette coordinates."""
    from tests.test_diff import _occluder_scene
    from oclpathtracer_tpu.core import rng
    from oclpathtracer_tpu.diff.edge import boundary_vertex_grads, rays_at
    from oclpathtracer_tpu.diff.fast import pack_scene_table
    from oclpathtracer_tpu.diff.inverse import render_spp
    from oclpathtracer_tpu.kernels.megakernel import trace_rays_pallas_stats

    scene = _occluder_scene()
    cfg = RenderConfig(width=32, height=32, bounces=2)
    key = rng.make_key(3)
    n = cfg.n_pixels
    img = render_spp(scene, cfg, 16, key)
    weight = 2.0 * img / n
    spp = 8

    g_jnp = boundary_vertex_grads(scene, cfg, weight, key,
                                  samples_per_edge=128, spp=spp, delta=0.03)

    table = pack_scene_table(scene)

    def probe(coords):
        o, d = rays_at(coords, cfg)
        out, _ = trace_rays_pallas_stats(table, o, d, cfg, spp, scan="parity")
        return out / spp

    g_ker = boundary_vertex_grads(scene, cfg, weight, key,
                                  samples_per_edge=128, spp=spp, delta=0.03,
                                  probe_fn=probe)
    mags = np.abs(np.asarray(g_jnp[0]))
    top = np.argsort(mags.ravel())[::-1][:3]
    for flat in top:
        i, c = np.unravel_index(flat, mags.shape)
        a = float(np.asarray(g_jnp[0])[i, c])
        b = float(np.asarray(g_ker[0])[i, c])
        assert np.isclose(a, b, rtol=0.1), f"p1[{i},{c}]: jnp {a} vs kernel {b}"


@pytest.mark.slow  # full kernel vertex step in interpret mode
def test_vertex_train_step_runs_and_improves():
    """make_vertex_train_step executes end-to-end and its gradients move a
    translated occluder back toward the target (loss drop over a few steps
    with a fixed frame pair)."""
    import optax

    from tests.test_diff import _occluder_scene
    from oclpathtracer_tpu.core import rng
    from oclpathtracer_tpu.diff import extract_params, make_vertex_train_step
    from oclpathtracer_tpu.diff.fast import pack_scene_table
    from oclpathtracer_tpu.diff.inverse import apply_params
    from oclpathtracer_tpu.kernels.megakernel import (
        render_samples_pallas_stats)

    scene = _occluder_scene()
    cfg = RenderConfig(width=24, height=24, bounces=2)
    spp = 4
    target, _ = render_samples_pallas_stats(pack_scene_table(scene), cfg, 0,
                                            2 * spp, scan="parity")
    target = target / (2 * spp)

    params = extract_params(scene, albedo=False, vertices=True)
    p1, p2, p3 = params.vertices
    shift = jnp.asarray([0.15, 0.1, 0.0], jnp.float32)
    sel = jnp.asarray([0.0, 0.0, 1.0])[:, None]  # row 2 = the occluder tri
    params = params._replace(vertices=(p1 + sel * shift, p2 + sel * shift,
                                       p3 + sel * shift))

    step, init = make_vertex_train_step(
        scene, cfg, spp, optax.sgd(2e-3), interior_spp=0,
        samples_per_edge=32, edge_spp=2, secondary=False)
    state = init(params)
    key = rng.make_key(5)

    losses = []
    p = params
    for i in range(4):
        p, state, l = step(p, state, target, jnp.int32(0), key)
        losses.append(float(l))
    assert np.isfinite(losses).all(), losses
    # The occluder rows must have moved back toward the target (gradient
    # signal present), and the fixed-frame loss must not increase.
    moved = float(jnp.abs(p.vertices[0][2] - params.vertices[0][2]).sum())
    assert moved > 0.0
    assert losses[-1] <= losses[0] * 1.05, losses


@pytest.mark.slow  # interpret-mode kernel render dominates wall-time
def test_fast_loss_optimizes(scene):
    import optax

    loss = make_fast_loss_fn(scene, CFG, 2)
    render, _ = make_fast_renderer(scene, CFG, 4)
    target = render(extract_params(scene, albedo=True), jnp.int32(1000))

    params = extract_params(scene, albedo=True)._replace(
        albedo=jnp.clip(extract_params(scene).albedo + 0.15, 0.0, 1.0))
    opt = optax.adam(0.02)
    state = opt.init(params)

    @jax.jit
    def step(params, state, i):
        l, g = jax.value_and_grad(loss)(params, target, i)
        up, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: None if p is None else p + u,
                              params, up, is_leaf=lambda x: x is None)
        return params, state, l

    true_albedo = np.asarray(extract_params(scene).albedo)
    err0 = float(np.abs(np.asarray(params.albedo) - true_albedo).mean())
    losses = []
    for i in range(10):
        params, state, l = step(params, state, jnp.int32(i))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    # The pairwise loss VALUE is itself a noisy estimate (can even be negative);
    # the stable signal is parameter recovery.
    err1 = float(np.abs(np.asarray(params.albedo) - true_albedo).mean())
    assert err1 < err0, f"albedo error did not drop: {err0} -> {err1} ({losses})"
