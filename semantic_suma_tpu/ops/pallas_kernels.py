"""Hand-written Pallas TPU kernels.

The engine's hot path is deliberately XLA-op based — it is sort/gather
latency-bound, and PERF.md documents why a Pallas rewrite of those ops
loses (no in-kernel scatter, gathers already run at the stride-engine
rate). This module holds the kernels where hand-writing IS the right
tool: dense stencils whose whole working set fits VMEM, where one
kernel guarantees a single HBM round trip for the entire pass.

First citizen: the range-image bilateral filter — the direct Pallas
replacement of the reference's ``bilateral_filter.frag`` GLSL compute
shader (169-tap spatial/range Gaussian over the [H, W] range image,
horizontal wrap, re-projection along the view ray). Functional parity
with :func:`semantic_suma_tpu.ops.filters.bilateral_filter` is asserted
in ``tests/test_projection.py``; the TPU A/B lives in
``scripts/bench_pallas.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilateral_kernel(rng_ref, valid_ref, out_ref, *, radius: int,
                      ssf: float, srf: float, h: int):
    """One program over the whole [H, W] image in VMEM: every tap is a
    (wrapped) roll of the resident block — zero HBM traffic between taps.

    The tap loop is a ``fori_loop`` with DYNAMIC roll shifts: a fully
    unrolled 169-tap chain keeps every rolled temporary live and blows
    the 16 MB scoped-VMEM stack (measured: 80 MB requested); the loop
    form keeps exactly one tap's temporaries resident."""
    rng = rng_ref[:]
    validf = (valid_ref[:] > 0).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, rng.shape, 0)
    hh, ww = rng.shape
    sum_wr = jnp.zeros_like(rng)
    sum_w = jnp.zeros_like(rng)
    # static unrolled taps: Mosaic's dynamic_rotate rejects the 900-lane
    # (non-128-multiple) dimension, so shifts must be compile-time
    # constants; the unrolled chain's stack liveness needs the raised
    # scoped-VMEM limit set by the caller (~80 MB of 128 MB on v5e)
    for dy in range(-radius, radius + 1):
        r_y = pltpu.roll(rng, (-dy) % hh, 0)
        v_y = pltpu.roll(validf, (-dy) % hh, 0)
        ok_row = ((rows + dy >= 0) & (rows + dy < h)).astype(jnp.float32)
        v_y = v_y * ok_row
        for dx in range(-radius, radius + 1):
            nb_r = pltpu.roll(r_y, (-dx) % ww, 1)
            nb_v = pltpu.roll(v_y, (-dx) % ww, 1) > 0.5
            dr = rng - nb_r
            w = jnp.where(nb_v,
                          jnp.exp((dx * dx + dy * dy) * ssf + dr * dr * srf),
                          0.0)
            sum_wr = sum_wr + w * nb_r
            sum_w = sum_w + w
    out_ref[:] = jnp.where(sum_w > 0,
                           sum_wr / jnp.maximum(sum_w, 1e-12), rng)


@partial(jax.jit, static_argnames=("radius", "interpret"))
def bilateral_filter_pallas(vertex_map: jnp.ndarray,
                            vertex_valid: jnp.ndarray,
                            sigma_space: float = 4.5,
                            sigma_range: float = 30.0,
                            radius: int = 6,
                            interpret: bool = False):
    """Pallas port of ``ops.filters.bilateral_filter`` (same contract).

    ``interpret=True`` runs the kernel in the Pallas interpreter —
    used on non-TPU backends (tests) where Mosaic cannot compile.
    """
    h, w = vertex_map.shape[:2]
    rng = jnp.linalg.norm(vertex_map, axis=-1)
    ray = vertex_map / jnp.maximum(rng, 1e-12)[..., None]
    ssf = -0.5 / (sigma_space * sigma_space)
    srf = -0.5 / (sigma_range * sigma_range)

    filtered = pl.pallas_call(
        partial(_bilateral_kernel, radius=radius, ssf=ssf, srf=srf, h=h),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(rng.astype(jnp.float32), vertex_valid.astype(jnp.int32))

    out = jnp.where(vertex_valid[..., None], filtered[..., None] * ray,
                    vertex_map)
    return out
