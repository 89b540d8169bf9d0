"""Differentiable rendering — losses, parameterizations, inverse-render train steps.

Capability the reference does not have at all (it is a forward-only OpenCL renderer);
this is the north-star extension (BASELINE.json config 5): gradients of the rendered
image w.r.t. material albedo, light emission, and vertex positions, with parameter
gradients psum-reduced across the tile-sharded mesh.

Gradient semantics:
  * albedo / emission / roughness: plain AD through the integrator — the estimator is
    continuous in these, so reverse-mode matches finite differences to Monte-Carlo
    noise (tests/test_diff.py pins this with common random numbers);
  * vertex positions: plain AD yields the interior (shading/geometry) terms;
    visibility-edge terms come from the edge-sampling boundary estimator in
    diff/edge.py — make_edge_aware_loss_fn adds them to jax.grad's vertex
    gradients (FD-parity pinned on silhouette-moving coordinates in
    tests/test_diff.py; secondary-visibility bias documented in diff/edge.py).
"""

from oclpathtracer_tpu.diff.losses import l2_loss, mse_loss
from oclpathtracer_tpu.diff.edge import (
    boundary_vertex_grads,
    make_edge_aware_loss_fn,
    project_to_screen,
)
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
    "project_to_screen",
]
