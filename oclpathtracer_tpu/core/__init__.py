from oclpathtracer_tpu.core import brdf, camera, intersect, rng

__all__ = ["brdf", "camera", "intersect", "rng"]
