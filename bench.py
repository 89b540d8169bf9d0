"""Benchmark: Mrays/s on the Cornell-box 4-bounce path trace (BASELINE.json metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "anchor_value",
"ratio_vs_anchor"}. The reference publishes no numbers (BASELINE.md:
intentionally-naive code, nothing measured), so vs_baseline compares against
this repo's own first recorded end-to-end TPU figure (BASELINE_SELF_MRAYS).

Workload: the reference's canonical scene/resolution (512x512, cornellbox.bin,
36 tris — RaytraceTest.cpp:219) at the 4-bounce depth BASELINE.json's headline
metric names, progressive 1-spp frames with the REFERENCE's RNG streams.

DRIFT-PROOFING. The shared tunnel TPU's absolute speed drifts +/-30% within
minutes (docs/PERFORMANCE.md preamble), so a lone absolute number cannot show
round-over-round progress. This bench therefore times TWO configs in the same
process, PAIRED-ALTERNATING (A B A B ...):

  A (anchor): reference-exact parity scan, interleave=8, chunks=1 — the frozen
     round-1 configuration. Its code has not changed since round 1, so its
     in-session rate calibrates the chip's speed *right now*.
  B (value):  the auto config — tp scan + tp0 peel + auto interleave/chunks —
     i.e. whatever the current round's kernel defaults to.

"value"/"anchor_value" are each config's best-of rate (the kernel's own speed
this session); "ratio_vs_anchor" is the MEDIAN of per-pair B/A rate ratios —
the drift-immune number the judge can compare across rounds. Ray accounting
counts TRACED segments (lanes alive at each bounce), from the kernel's own
per-bounce tally — dead lanes don't inflate it.
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
BOUNCES_DEEP = 16   # the reference's BOUNCES cap (GenerateColors.cl:5)
SPP_WARM = 4
SPP_BENCH = 64
SPP_BENCH_DEEP = 32
PAIRS = 6


def main() -> None:
    from oclpathtracer_tpu import RenderConfig
    from oclpathtracer_tpu.kernels.megakernel import (
        prepare_scan,
        render_samples_pallas_stats,
    )
    from oclpathtracer_tpu.runtime import enable_compilation_cache
    from oclpathtracer_tpu.scene import load_cornell_box

    from oclpathtracer_tpu.kernels.wavefront import (
        render_samples_wavefront_stats,
    )

    enable_compilation_cache()
    scene = load_cornell_box()
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, bounces=BOUNCES)
    cfg16 = RenderConfig(width=WIDTH, height=HEIGHT, bounces=BOUNCES_DEEP)

    # B: the current auto config (what the driver actually runs).
    scan_b, table_b, emi_b, classes_b = prepare_scan(scene, "auto")
    # A: the frozen round-1 anchor — parity scan, interleave=8, chunks=1.
    _, table_a, emi_a, classes_a = prepare_scan(scene, "parity")

    @jax.jit
    def run_b():
        return render_samples_pallas_stats(table_b, cfg, SPP_WARM, SPP_BENCH,
                                           scan=scan_b, emi_const=emi_b,
                                           classes=classes_b)

    @jax.jit
    def run_a():
        return render_samples_pallas_stats(table_a, cfg, SPP_WARM, SPP_BENCH,
                                           scan="parity", emi_const=emi_a,
                                           classes=classes_a, interleave=8,
                                           scan_chunks=1)

    # Second pair: the 16-bounce deep-path headline (VERDICT r4 item 7).
    # A16 anchor: the same frozen round-1 megakernel config at the reference's
    # 16-bounce cap; B16: the auto backend's deep-bounce pick (wavefront
    # path-regeneration — render/driver.py:74-86).
    @jax.jit
    def run_b16():
        return render_samples_wavefront_stats(table_b, cfg16, SPP_WARM,
                                              SPP_BENCH_DEEP, scan=scan_b,
                                              emi_const=emi_b,
                                              classes=classes_b)

    @jax.jit
    def run_a16():
        return render_samples_pallas_stats(table_a, cfg16, SPP_WARM,
                                           SPP_BENCH_DEEP, scan="parity",
                                           emi_const=emi_a, classes=classes_a,
                                           interleave=8, scan_chunks=1)

    def timed(fn):
        t0 = time.perf_counter()
        out, segs = fn()
        jax.block_until_ready(out)
        return int(segs) / (time.perf_counter() - t0)

    # Warm-up / compile every config before any timing.
    for fn, name in ((run_b, "auto"), (run_a, "anchor"),
                     (run_b16, "auto16"), (run_a16, "anchor16")):
        out, _ = fn()
        jax.block_until_ready(out)
        assert np.isfinite(np.asarray(out)).all(), f"non-finite ({name})"

    rates_a, rates_b, ratios = [], [], []
    rates_a16, rates_b16, ratios16 = [], [], []
    for _ in range(PAIRS):
        ra = timed(run_a)
        rb = timed(run_b)
        rates_a.append(ra)
        rates_b.append(rb)
        ratios.append(rb / ra)
        ra16 = timed(run_a16)
        rb16 = timed(run_b16)
        rates_a16.append(ra16)
        rates_b16.append(rb16)
        ratios16.append(rb16 / ra16)

    mrays_b = max(rates_b) / 1e6
    mrays_a = max(rates_a) / 1e6
    print(json.dumps({
        "metric": "cornell_4bounce_path_trace",
        "value": round(mrays_b, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_b / BASELINE_SELF_MRAYS, 3),
        "anchor_value": round(mrays_a, 2),
        "ratio_vs_anchor": round(float(np.median(ratios)), 4),
        "value_16b": round(max(rates_b16) / 1e6, 2),
        "anchor_16b": round(max(rates_a16) / 1e6, 2),
        "ratio_vs_anchor_16b": round(float(np.median(ratios16)), 4),
    }))


if __name__ == "__main__":
    main()
