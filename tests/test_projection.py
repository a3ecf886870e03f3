"""Projection / z-buffer / filter kernel tests against numpy oracles."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import DataConfig
from semantic_suma_tpu.ops.zbuffer import zbuffer_argmin
from semantic_suma_tpu.ops.projection import (project_scan, spherical_pixel,
                                              pixel_rays)
from semantic_suma_tpu.ops.filters import (compute_normals, erode_semantics,
                                           flood_fill, bilateral_filter)

CFG = DataConfig(width=90, height=16)


def test_zbuffer_nearest_wins():
    ids = jnp.asarray([3, 3, 3, 5, 7, -1, 99999], jnp.int32)
    depth = jnp.asarray([2.0, 1.0, 3.0, 4.0, 0.5, 0.1, 0.1], jnp.float32)
    winner, wdepth = zbuffer_argmin(ids, depth, 10)
    w = np.asarray(winner)
    assert w[3] == 1 and w[5] == 3 and w[7] == 4
    assert w[0] == -1 and w[9] == -1
    assert np.asarray(wdepth)[3] == 1.0
    assert np.isinf(np.asarray(wdepth)[0])


def test_zbuffer_tie_deterministic():
    ids = jnp.asarray([2, 2, 2], jnp.int32)
    depth = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    winner, _ = zbuffer_argmin(ids, depth, 4)
    assert np.asarray(winner)[2] == 0  # stable sort: first input wins ties


def np_project(points, cfg):
    """Oracle for spherical_pixel, mirroring gen_vertexmap.vert math."""
    pts = np.asarray(points, np.float64)
    d = np.linalg.norm(pts, axis=-1)
    yaw = np.arctan2(pts[:, 1], pts[:, 0])
    pitch = -np.arcsin(pts[:, 2] / np.maximum(d, 1e-12))
    x01 = 0.5 * (-yaw / np.pi + 1.0)
    y01 = 1.0 - (np.degrees(pitch) + cfg.fov_up) / cfg.fov
    px = np.clip(np.floor(x01 * cfg.width), 0, cfg.width - 1).astype(int)
    py = np.floor(y01 * cfg.height)
    inside = (d >= cfg.min_depth) & (d <= cfg.max_depth) & (py >= 0) & (py < cfg.height)
    return px, np.clip(py, 0, cfg.height - 1).astype(int), d, inside


def random_cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = np.radians(rng.uniform(-24.5, 2.5, n))
    r = rng.uniform(2.5, 70.0, n)
    pts = np.stack([r * np.cos(pitch) * np.cos(yaw),
                    r * np.cos(pitch) * np.sin(yaw),
                    r * np.sin(pitch)], 1).astype(np.float32)
    return pts


def test_spherical_pixel_matches_oracle():
    pts = random_cloud()
    px, py, d, inside = spherical_pixel(jnp.asarray(pts), CFG)
    opx, opy, od, oinside = np_project(pts, CFG)
    # ignore points razor-close to texel boundaries (float32 vs float64 floor)
    x01 = 0.5 * (-np.arctan2(pts[:, 1], pts[:, 0]) / np.pi + 1.0)
    frac = np.abs(x01 * CFG.width - np.round(x01 * CFG.width))
    ok = frac > 1e-3
    np.testing.assert_array_equal(np.asarray(px)[ok], opx[ok])
    np.testing.assert_array_equal(np.asarray(inside), oinside)
    np.testing.assert_allclose(np.asarray(d), od, rtol=1e-5)


def test_project_scan_nearest_per_pixel():
    pts = random_cloud(8000, seed=1)
    res = project_scan(jnp.asarray(pts), cfg=CFG)
    opx, opy, od, oinside = np_project(pts, CFG)
    # oracle z-buffer
    best = {}
    for i in np.flatnonzero(oinside):
        key = (opy[i], opx[i])
        if key not in best or od[i] < od[best[key]]:
            best[key] = i
    vm = np.asarray(res.vertex_map)
    vv = np.asarray(res.vertex_valid)
    assert vv.sum() == len(best)
    for (r, c), i in best.items():
        np.testing.assert_allclose(vm[r, c], pts[i], atol=1e-6)


def test_pixel_rays_inverts_projection():
    rays = np.asarray(pixel_rays(CFG))
    # a point along each pixel-center ray must project back to that pixel
    pts = rays.reshape(-1, 3) * 20.0
    px, py, _, inside = spherical_pixel(jnp.asarray(pts, jnp.float32), CFG)
    ids = np.arange(pts.shape[0])
    np.testing.assert_array_equal(np.asarray(px), ids % CFG.width)
    np.testing.assert_array_equal(np.asarray(py), ids // CFG.width)
    assert np.all(np.asarray(inside))


def test_normals_flat_ground():
    # synthetic flat ground plane z = -2 observed from origin
    h, w = CFG.height, CFG.width
    rays = np.asarray(pixel_rays(CFG))
    # choose pixels whose rays point downward
    t = -2.0 / np.where(rays[..., 2] < -0.05, rays[..., 2], np.nan)
    vm = rays * np.nan_to_num(t)[..., None]
    valid = np.isfinite(t) & (np.nan_to_num(t) > 2.0) & (np.nan_to_num(t) < 70.0)
    vm = np.where(valid[..., None], vm, 0.0).astype(np.float32)
    normal, nvalid = compute_normals(jnp.asarray(vm), jnp.asarray(valid))
    n = np.asarray(normal)[np.asarray(nvalid)]
    assert n.shape[0] > 100
    # normals of a ground plane are +-z
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)


def test_erosion_removes_boundaries():
    lab = np.zeros((8, 12), np.int32)
    lab[:, :6] = 40
    lab[:, 6:] = 50
    prob = np.full(lab.shape, 0.9, np.float32)
    valid = np.ones(lab.shape, bool)
    el, ep = erode_semantics(jnp.asarray(lab), jnp.asarray(prob), jnp.asarray(valid))
    el = np.asarray(el)
    assert el[0, 5] == 0 and el[0, 6] == 0      # boundary eroded
    assert el[0, 2] == 40 and el[0, 9] == 50    # interior kept
    # wrap-around: column 0 and 11 are neighbors across the seam
    assert el[0, 0] == 0 and el[0, 11] == 0


def test_floodfill_fills_depth_consistent():
    h, w = 6, 10
    vm = np.zeros((h, w, 3), np.float32)
    vm[..., 0] = 10.0  # all pixels at range 10 along x
    lab = np.zeros((h, w), np.int32)
    prob = np.zeros((h, w), np.float32)
    lab[2, 4] = 40
    prob[2, 4] = 0.8
    fl, fp = flood_fill(jnp.asarray(lab), jnp.asarray(prob), jnp.asarray(vm))
    fl = np.asarray(fl)
    fp = np.asarray(fp)
    assert fl[2, 3] == 40 and fl[2, 5] == 40  # offset-1 neighbors filled
    np.testing.assert_allclose(fp[2, 3], 0.4)  # prob / (1+1)
    assert fl[2, 4] == 40 and fp[2, 4] == 0.8  # original untouched
    assert fl[2, 6] == 40 and abs(fp[2, 6] - 0.8 / 3) < 1e-6  # offset 2


def test_bilateral_smooths_range_noise():
    rng = np.random.default_rng(3)
    rays = np.asarray(pixel_rays(CFG))
    clean_r = np.full((CFG.height, CFG.width), 20.0)
    noisy_r = clean_r + rng.normal(0, 0.05, clean_r.shape)
    vm = (rays * noisy_r[..., None]).astype(np.float32)
    valid = np.ones(clean_r.shape, bool)
    out = np.asarray(bilateral_filter(jnp.asarray(vm), jnp.asarray(valid),
                                      sigma_space=2.0, sigma_range=0.5))
    out_r = np.linalg.norm(out, axis=-1)
    assert np.std(out_r - 20.0) < 0.5 * np.std(noisy_r - 20.0)


def test_zbuffer_runs_matches_oracle():
    """zbuffer_runs (one sort + ONE scatter, flagged argmins via run scans)
    against a brute-force oracle, including large-N bit-packing paths."""
    from semantic_suma_tpu.ops.zbuffer import zbuffer_runs
    rng = np.random.default_rng(0)
    n, cells = 5000, 64 * 90
    ids = rng.integers(-1, cells + 2, size=n).astype(np.int32)
    depth = rng.uniform(0.1, 80.0, size=n).astype(np.float32)
    f1 = rng.random(n) < 0.4
    f2 = rng.random(n) < 0.2

    wa, (w1, w2), (d1, d2) = zbuffer_runs(
        jnp.asarray(ids), jnp.asarray(depth),
        (jnp.asarray(f1), jnp.asarray(f2)), cells)
    wa, w1, w2 = np.asarray(wa), np.asarray(w1), np.asarray(w2)
    d1 = np.asarray(d1)

    # oracle: quantized-depth winner per cell, ties -> lowest index
    db = 31 - int(cells).bit_length()
    q = np.clip((depth * (1 << db) / 100.0).astype(np.int64), 0,
                (1 << db) - 1)
    for c in rng.choice(cells, 200, replace=False):
        cand = np.nonzero((ids == c))[0]
        if cand.size == 0:
            assert wa[c] == -1 and w1[c] == -1 and w2[c] == -1
            continue
        best = cand[np.lexsort((cand, q[cand]))][0]
        assert wa[c] == best
        for flag, w in ((f1, w1), (f2, w2)):
            fc = cand[flag[cand]]
            if fc.size == 0:
                assert w[c] == -1
            else:
                assert w[c] == fc[np.lexsort((fc, q[fc]))][0]
        if w1[c] >= 0:
            # winner depths are decoded from the quantized sort key
            # (floor of the bucket) — exact to one bucket width
            bucket = 100.0 / (1 << db)
            assert 0.0 <= depth[w1[c]] - d1[c] <= bucket + 1e-6


def test_pallas_bilateral_matches_xla():
    """The hand-written Pallas bilateral kernel (the GLSL
    bilateral_filter.frag replacement, ops/pallas_kernels.py) must match
    the XLA formulation exactly (same taps, same weights); on non-TPU
    backends it runs under the Pallas interpreter."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from semantic_suma_tpu.ops.filters import bilateral_filter
    from semantic_suma_tpu.ops.pallas_kernels import bilateral_filter_pallas

    rng = np.random.default_rng(3)
    h, w = 16, 128
    pts = rng.normal(size=(h, w, 3)).astype(np.float32) * 5 + 10
    valid = rng.uniform(size=(h, w)) < 0.9
    vm = jnp.asarray(pts)
    vv = jnp.asarray(valid)
    a = bilateral_filter(vm, vv, radius=3)
    b = bilateral_filter_pallas(vm, vv, radius=3,
                                interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
