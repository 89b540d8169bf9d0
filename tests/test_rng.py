"""RNG tests: exact reference-LCG replay + threefry sharding invariance."""

import numpy as np
import jax
import jax.numpy as jnp

from oclpathtracer_tpu.core import rng
from oclpathtracer_tpu.integrators.parity import ref_uniforms


def _py_hash(x: int) -> int:
    return (1103515245 * x + 12345) & 0xFFFFFFFF


def _py_next(s: int):
    """Pure-python port of getRandomFloat (GenerateColors.cl:61-71)."""
    s = ((s ^ 61) ^ (s >> 16)) & 0xFFFFFFFF
    s = (s + (s << 3)) & 0xFFFFFFFF
    s = (s ^ (s >> 4)) & 0xFFFFFFFF
    s = (s * 0x27D4EB2D) & 0xFFFFFFFF
    s = (s ^ (s >> 15)) & 0xFFFFFFFF
    s = (1103515245 * s + 12345) & 0xFFFFFFFF
    return s, np.float32(np.float32(s) * np.float32(2.3283064365386963e-10))


def test_ref_hash_matches_python():
    xs = np.array([0, 1, 2, 999, 2**31, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(rng.ref_hash_u32(jnp.asarray(xs)))
    want = np.array([_py_hash(int(x)) for x in xs], dtype=np.uint32)
    assert (got == want).all()


def test_ref_stream_matches_python():
    for pid, frame in [(0, 0), (17, 0), (123456, 42), (512 * 512 - 1, 9999)]:
        s = (pid + _py_hash(frame)) & 0xFFFFFFFF
        want = []
        for _ in range(8):
            s, u = _py_next(s)
            want.append(u)
        got = np.asarray(
            ref_uniforms(jnp.asarray([pid], jnp.int32), jnp.int32(frame), 8)
        )[0]
        np.testing.assert_array_equal(got, np.array(want, np.float32))


def test_ref_floats_in_unit_interval():
    us = np.asarray(ref_uniforms(jnp.arange(1000, dtype=jnp.int32), jnp.int32(3), 16))
    assert (us >= 0).all() and (us < 1.0000001).all()
    # Should look uniform-ish.
    assert 0.45 < us.mean() < 0.55


def test_threefry_pixel_keying_is_layout_invariant():
    """Uniforms for a pixel depend only on (key, sample, absolute pixel id) — any
    subset/order of pixels yields identical rows (north-star requirement)."""
    key = rng.sample_key(rng.make_key(7), jnp.int32(5))
    full = rng.pixel_uniforms(key, jnp.arange(64, dtype=jnp.int32), 6)
    shard = rng.pixel_uniforms(key, jnp.asarray([3, 17, 63, 5], jnp.int32), 6)
    np.testing.assert_array_equal(np.asarray(shard), np.asarray(full)[[3, 17, 63, 5]])


def test_threefry_samples_distinct_across_frames():
    key = rng.make_key(0)
    a = rng.pixel_uniforms(rng.sample_key(key, jnp.int32(0)), jnp.arange(16, dtype=jnp.int32), 4)
    b = rng.pixel_uniforms(rng.sample_key(key, jnp.int32(1)), jnp.arange(16, dtype=jnp.int32), 4)
    assert not np.allclose(np.asarray(a), np.asarray(b))
