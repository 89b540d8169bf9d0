from oclpathtracer_tpu.integrators.path import trace_paths, render_sample
from oclpathtracer_tpu.integrators.primary import render_primary
from oclpathtracer_tpu.integrators.ao import render_ao
from oclpathtracer_tpu.integrators.direct import render_direct

__all__ = [
    "trace_paths",
    "render_sample",
    "render_primary",
    "render_ao",
    "render_direct",
]
