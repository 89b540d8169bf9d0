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
