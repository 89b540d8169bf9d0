"""Progressive accumulation.

The reference stores the running average in GAMMA space and de-gammas / re-gammas
every frame (GenerateColors.cl:314-321) — precision churn with no benefit. We keep a
LINEAR float32 (sum, count) accumulator and apply gamma only at export (SURVEY.md
§2.2). `reference_average` emulates the reference's recurrence for parity tests,
including its off-by-one: at frame 1 the frame-0 sample is multiplied by
(cRes.z - 1) = 0 and discarded (GenerateColors.cl:320).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Accumulator(NamedTuple):
    """Linear-space running sum; a pytree, shardable and checkpointable."""

    sum: jnp.ndarray      # (N, 3) f32 linear radiance sum
    count: jnp.ndarray    # () i32 samples accumulated

    @staticmethod
    def zeros(n_pixels: int) -> "Accumulator":
        return Accumulator(
            sum=jnp.zeros((n_pixels, 3), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def add(self, radiance: jnp.ndarray) -> "Accumulator":
        return Accumulator(sum=self.sum + radiance, count=self.count + 1)

    def add_sum(self, radiance_sum: jnp.ndarray, n: int) -> "Accumulator":
        """Fold in a pre-summed chunk of n samples (the Pallas kernels return
        per-chunk sums, accumulated on-device)."""
        return Accumulator(sum=self.sum + radiance_sum, count=self.count + n)

    def mean(self) -> jnp.ndarray:
        return self.sum / jnp.maximum(self.count, 1).astype(jnp.float32)


def linear_to_srgb_gamma22(x: jnp.ndarray) -> jnp.ndarray:
    """gammaCorrect — x^(1/2.2) with alpha forced to 1 in the reference
    (GenerateColors.cl:290-294); rgb-only here."""
    return jnp.power(jnp.maximum(x, 0.0), 1.0 / 2.2)


def gamma22_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """readFromGamma — x^2.2 (GenerateColors.cl:296-300)."""
    return jnp.power(jnp.maximum(x, 0.0), 2.2)


def reference_average(frames: jnp.ndarray) -> jnp.ndarray:
    """Replay the reference's progressive recurrence over `frames` (S, N, 3) of
    linear per-frame radiance; returns the gamma-space framebuffer after the last
    frame (GenerateColors.cl:314-321). Frame 0 is stored then discarded at frame 1."""
    import jax

    def step(fb, sf):
        s, frame = sf
        first = s == 0
        avg = (gamma22_to_linear(fb) * (s - 1).astype(jnp.float32) + frame) / jnp.maximum(
            s, 1
        ).astype(jnp.float32)
        new_fb = jnp.where(first, linear_to_srgb_gamma22(frame), linear_to_srgb_gamma22(avg))
        return new_fb, None

    s_idx = jnp.arange(frames.shape[0], dtype=jnp.int32)
    fb0 = jnp.zeros_like(frames[0])
    fb, _ = jax.lax.scan(step, fb0, (s_idx, frames))
    return fb
