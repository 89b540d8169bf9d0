from oclpathtracer_tpu.render.accumulate import Accumulator, linear_to_srgb_gamma22
from oclpathtracer_tpu.render.driver import (
    render_progressive, make_render_step, make_kernel_render_step)
from oclpathtracer_tpu.render.image import write_ppm, write_png, to_u8

__all__ = [
    "Accumulator",
    "linear_to_srgb_gamma22",
    "render_progressive",
    "make_render_step",
    "make_kernel_render_step",
    "write_ppm",
    "write_png",
    "to_u8",
]
