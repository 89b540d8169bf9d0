"""Benchmark: Mrays/s on the Cornell-box 4-bounce path trace (BASELINE.json metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The reference
publishes no numbers (BASELINE.md: intentionally-naive code, nothing measured), so
vs_baseline compares against this repo's own first recorded end-to-end TPU figure
(BASELINE_SELF_MRAYS) — ratchet it up as kernels improve, never down.

Workload: the reference's canonical scene/resolution (512x512, cornellbox.bin,
36 tris — RaytraceTest.cpp:219) at the 4-bounce depth BASELINE.json's headline
metric names, progressive 1-spp frames with the REFERENCE's RNG streams. Hot path:
the fused Pallas megakernel (kernels/megakernel.py).

Ray accounting counts TRACED segments (lanes alive at each bounce's intersection),
not pixels x bounces — dead lanes don't inflate the number. The count is the
kernel's own per-bounce live-lane tally, so it is exact for what it executes.

Hot path: the fused Pallas megakernel at its auto knobs — triple-product tp
scan, 16-way sample interleave, chunked best-hit chains, peeled bounce-0 scan
(kernels/megakernel.py; allclose to the reference-exact parity scan, decisions
differ only at ulp comparison boundaries). Timing is best-of-N compiled
invocations: the tunnel TPU's absolute throughput drifts run to run (shared
chip), and best-of is the standard way to report the kernel's own speed.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# First recorded end-to-end figure for this exact workload (TPU v5e, Pallas
# megakernel, round 1). vs_baseline = value / BASELINE_SELF_MRAYS.
BASELINE_SELF_MRAYS = 16.0

WIDTH = HEIGHT = 512
BOUNCES = 4
SPP_WARM = 4
SPP_BENCH = 64
REPEATS = 5


def main() -> None:
    from oclpathtracer_tpu import RenderConfig
    from oclpathtracer_tpu.kernels.megakernel import (
        prepare_scan,
        render_samples_pallas_stats,
    )
    from oclpathtracer_tpu.runtime import enable_compilation_cache
    from oclpathtracer_tpu.scene import load_cornell_box

    enable_compilation_cache()
    scene = load_cornell_box()
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, bounces=BOUNCES)
    scan, table, emi, classes = prepare_scan(scene, "auto")

    def run():
        out, segs = render_samples_pallas_stats(table, cfg, SPP_WARM, SPP_BENCH,
                                                scan=scan, emi_const=emi,
                                                classes=classes)
        jax.block_until_ready(out)
        return out, int(segs)

    out, _ = run()  # warm-up / compile
    assert np.isfinite(np.asarray(out)).all(), "bench render produced non-finite"

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _, segs = run()
        best = min(best, time.perf_counter() - t0)

    mrays = segs / best / 1e6
    print(json.dumps({
        "metric": "cornell_4bounce_path_trace",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_SELF_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
