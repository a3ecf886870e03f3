"""Range-image filters: normal map + semantic erosion, flood-fill, bilateral.

TPU-native equivalents of the reference fragment shaders
``gen_normalmap.frag`` (cross-product normals + label-boundary erosion),
``floodfill.frag`` (depth-consistent label fill with reciprocal decay) and
``bilateral_filter.frag`` (13x13 range bilateral smoothing). All are
expressed as shifted-array arithmetic over dense [H, W] maps — pure VPU
work that XLA fuses into a handful of elementwise passes; the horizontal
axis wraps (the range image covers 360 degrees).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp




def _shift_x(a: jnp.ndarray, off: int) -> jnp.ndarray:
    """Horizontal shift with wrap-around (range image is 360 deg)."""
    return jnp.roll(a, -off, axis=1)


def _shift_y(a: jnp.ndarray, off: int, fill):
    """Vertical shift; rows shifted in from outside are `fill`."""
    if off == 0:
        return a
    moved = jnp.roll(a, -off, axis=0)
    h = a.shape[0]
    rows = jnp.arange(h)
    inside = (rows + off >= 0) & (rows + off < h)
    shape = [h] + [1] * (a.ndim - 1)
    return jnp.where(inside.reshape(shape), moved, fill)


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


@partial(jax.jit, static_argnames=())
def compute_normals(vertex_map: jnp.ndarray, vertex_valid: jnp.ndarray):
    """Cross-product normal map (gen_normalmap.frag:41-98).

    normal = normalize(cross(normalize(v(x+1,y)-v), normalize(v(x,y+1)-v)))
    with horizontal wrap; invalid where the pixel or either forward
    neighbor is invalid, both backward neighbors are invalid, or the cross
    product degenerates.

    Returns (normal_map [H,W,3], normal_valid [H,W] bool).
    """
    p = vertex_map
    pv = vertex_valid

    u = _shift_x(p, 1)
    uv = _shift_x(pv, 1)
    v = _shift_y(p, 1, 0.0)
    vv = _shift_y(pv, 1, False)
    sv = _shift_x(pv, -1)
    tv = _shift_y(pv, -1, False)

    du = _normalize(u - p)
    dv = _normalize(v - p)
    w = jnp.cross(du, dv)
    wlen = jnp.linalg.norm(w, axis=-1)

    valid = pv & uv & vv & ~(~sv & ~tv) & (wlen > 1e-7)
    normal = jnp.where(valid[..., None], w / jnp.maximum(wlen, 1e-12)[..., None], 0.0)
    return normal, valid


@jax.jit
def erode_semantics(sem_label: jnp.ndarray, sem_prob: jnp.ndarray,
                    vertex_valid: jnp.ndarray):
    """Label-boundary erosion fused into the normal pass in the reference
    (gen_normalmap.frag:68-85, kernel_size=2 => 4-neighborhood at offset 1).

    A pixel keeps its label only if no 4-neighbor carries a different
    non-zero label; otherwise (and on invalid pixels) it becomes unlabeled.
    """
    p = sem_label
    neighbors = [
        _shift_x(p, 1), _shift_x(p, -1),
        _shift_y(p, 1, 0), _shift_y(p, -1, 0),
    ]
    conflict = jnp.zeros_like(p, dtype=bool)
    for nb in neighbors:
        conflict = conflict | ((nb != p) & (nb != 0))
    keep = vertex_valid & ~conflict
    return jnp.where(keep, p, 0), jnp.where(keep, sem_prob, 1.0)


@partial(jax.jit, static_argnames=("kernel_size",))
def flood_fill(sem_label: jnp.ndarray, sem_prob: jnp.ndarray,
               vertex_map: jnp.ndarray, kernel_size: int = 3):
    """Fill unlabeled pixels from depth-consistent neighbors
    (floodfill.frag:34-84): for offsets 1..kernel_size-1 and directions
    (+x, +y, -x, -y) in priority order, take the first neighbor whose label
    is non-zero and whose range differs by < 0.007 * range(p); the adopted
    probability decays as prob / (offset + 1).
    """
    depth = jnp.linalg.norm(vertex_map, axis=-1)
    out_label = sem_label
    out_prob = sem_prob
    taken = sem_label != 0  # already labeled pixels never change

    for off in range(1, kernel_size):
        for shift in (lambda a: _shift_x(a, off),
                      lambda a: _shift_y(a, off, 0),  # weak 0 keeps int dtype
                      lambda a: _shift_x(a, -off),
                      lambda a: _shift_y(a, -off, 0)):
            # neighbors are read from the *original* maps (single-pass shader)
            n_label = shift(sem_label)
            n_prob = shift(sem_prob)
            n_depth = shift(depth)
            ok = (~taken) & (n_label != 0) & (
                jnp.abs(depth - n_depth) < 0.007 * depth)
            out_label = jnp.where(ok, n_label, out_label)
            out_prob = jnp.where(ok, n_prob / (off + 1.0), out_prob)
            taken = taken | ok
    return out_label, out_prob


@partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(vertex_map: jnp.ndarray, vertex_valid: jnp.ndarray,
                     sigma_space: float = 4.5, sigma_range: float = 30.0,
                     radius: int = 6):
    """Range bilateral filter (bilateral_filter.frag:27-80): smooth each
    pixel's *range* (not xyz) over a (2R+1)^2 window with Gaussian weights in
    pixel distance and range difference, then re-project along the view ray.

    Horizontal distance uses the true wrapped pixel distance (the reference
    computes distance to the wrapped column index, which explodes across the
    seam — a shader bug we do not reproduce).
    """
    rng = jnp.linalg.norm(vertex_map, axis=-1)
    ray = vertex_map / jnp.maximum(rng, 1e-12)[..., None]
    ssf = -0.5 / (sigma_space * sigma_space)
    srf = -0.5 / (sigma_range * sigma_range)

    sum_wr = jnp.zeros_like(rng)
    sum_w = jnp.zeros_like(rng)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb_r = _shift_y(_shift_x(rng, dx), dy, 0.0)
            nb_v = _shift_y(_shift_x(vertex_valid, dx), dy, False)
            dr = rng - nb_r
            wgt = jnp.where(nb_v,
                            jnp.exp((dx * dx + dy * dy) * ssf + dr * dr * srf),
                            0.0)
            sum_wr = sum_wr + wgt * nb_r
            sum_w = sum_w + wgt
    filtered = jnp.where(sum_w > 0, sum_wr / jnp.maximum(sum_w, 1e-12), rng)
    out = jnp.where(vertex_valid[..., None], filtered[..., None] * ray, vertex_map)
    return out
