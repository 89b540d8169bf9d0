"""Differentiable rendering — losses, parameterizations, inverse-render train steps.

Capability the reference does not have at all (it is a forward-only OpenCL renderer);
this is the north-star extension (BASELINE.json config 5): gradients of the rendered
image w.r.t. material albedo, light emission, and vertex positions, with parameter
gradients psum-reduced across the tile-sharded mesh.

Gradient semantics:
  * albedo / emission: plain AD through any integrator — the estimator is
    continuous in these, so reverse-mode matches finite differences to Monte-Carlo
    noise (tests/test_diff.py pins this with common random numbers);
  * roughness (SceneParams.roughness): exact under plain AD through the NEE /
    direct-lighting estimator (integrators/direct.py), where the GGX lobe is
    EVALUATED at a given light direction — smooth in roughness
    (tests/test_diff.py FD-parity + recovery). Through the pure BRDF-sampling
    path estimator (the reference's formulation) the weight f·cosθ/pdf is
    r-independent at fixed sampled direction, so the true gradient is all
    lobe-redistribution across radiance discontinuities: plain AD reads ~0
    there and a score-function estimator has variance ∝ 1/r² (unusable at the
    reference's r=0.008) — measured r5, documented restriction: train
    roughness through the direct/NEE loss;
  * vertex positions: plain AD yields the interior (shading/geometry) terms;
    PRIMARY visibility-edge terms come from the edge-sampling boundary
    estimator in diff/edge.py and SECONDARY (shadow/indirect light-rim)
    terms from diff/secondary.py — make_edge_aware_loss_fn adds both to
    jax.grad's vertex gradients (FD-parity pinned on silhouette-moving
    coordinates in tests/test_diff.py and on Cornell light coordinates in
    tests/test_diff_secondary.py).
"""

from oclpathtracer_tpu.diff.losses import l2_loss, mse_loss
from oclpathtracer_tpu.diff.edge import (
    boundary_vertex_grads,
    make_edge_aware_loss_fn,
    project_to_screen,
)
from oclpathtracer_tpu.diff.secondary import secondary_boundary_vertex_grads
from oclpathtracer_tpu.diff.vertex import make_vertex_train_step
from oclpathtracer_tpu.diff.inverse import (
    SceneParams,
    apply_params,
    extract_params,
    make_loss_fn,
    make_optax_train_step,
    make_train_step,
    make_sharded_train_step,
    make_unbiased_loss_fn,
)

__all__ = [
    "mse_loss",
    "l2_loss",
    "SceneParams",
    "apply_params",
    "boundary_vertex_grads",
    "extract_params",
    "make_edge_aware_loss_fn",
    "make_loss_fn",
    "make_unbiased_loss_fn",
    "make_optax_train_step",
    "make_train_step",
    "make_sharded_train_step",
    "make_vertex_train_step",
    "project_to_screen",
    "secondary_boundary_vertex_grads",
]
