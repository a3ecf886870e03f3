"""Composed old/new model rendering (reference ``render_compose.frag:26-48``
+ per-scan composed tracking while a loop candidate is live,
``SurfelMapping.cpp:351``)."""
import pytest
import jax.numpy as jnp
import numpy as np

from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.core.pipeline import SurfelSLAM
from semantic_suma_tpu.io.simulation import SimulationReader
from semantic_suma_tpu.ops.icp import Maps


def _maps(h, w, z, valid):
    v = jnp.full((h, w, 3), z, jnp.float32)
    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
    val = jnp.asarray(valid, bool)
    return Maps(vertex=v, normal=n, vertex_valid=val, normal_valid=val,
                sem_label=jnp.full((h, w), int(z), jnp.int32),
                sem_prob=jnp.full((h, w), 0.5, jnp.float32))


def test_compose_views_semantics():
    """Pixelwise merge rules of render_compose.frag:26-48: new wins where
    valid; old fills pixels the new render left empty, gated by the
    old/new vertex distance."""
    h, w = 2, 4
    # new valid in the left half, old valid everywhere
    new_valid = np.zeros((h, w), bool)
    new_valid[:, :2] = True
    old = _maps(h, w, 7.0, np.ones((h, w), bool))
    new = _maps(h, w, 1.0, new_valid)

    comp = sm.compose_views(old, new, max_distance=100.0)
    comp_v = np.asarray(comp.vertex[..., 2])
    assert np.all(comp_v[:, :2] == 1.0)          # new wins where valid
    assert np.all(comp_v[:, 2:] == 7.0)          # old fills the gaps
    assert bool(np.all(np.asarray(comp.valid)))
    assert np.all(np.asarray(comp.sem_label)[:, 2:] == 7)

    # distance gate: where the NEW map has a (valid) vertex far from the
    # old one, the old pixel must NOT leak through a half-valid new pixel
    half = Maps(vertex=new.vertex, normal=new.normal,
                vertex_valid=jnp.ones((h, w), bool),   # vertex known...
                normal_valid=jnp.asarray(new_valid),   # ...normal missing
                sem_label=new.sem_label, sem_prob=new.sem_prob)
    comp2 = sm.compose_views(old, half, max_distance=2.0)
    # right half: new invalid overall (normal missing) but vertex valid and
    # |1 - 7| > max_distance -> old must be rejected
    assert not np.any(np.asarray(comp2.valid)[:, 2:])


@pytest.mark.slow
def test_composed_tracking_fires_on_live_candidate(monkeypatch):
    """While a loop candidate is live, each scan's model view must be the
    composed old+new render (SurfelMapping.cpp:351) — the compose path runs
    and the loop still closes.

    The compose itself happens inside a jitted program (the fused verify
    or the tracking compose), so the observable is the driver's
    ``set_model_maps`` call that installs the composed view for the next
    scan's ICP — counted here via a wrapper."""
    from tests.test_loop_closure import loop_cfg

    cfg = loop_cfg()
    assert cfg.loop.compose_rendering

    n = 75
    reader = SimulationReader(cfg.data, n_scans=n, radius=16.0, step=1.6,
                              noise_sigma=0.03, seed=2)
    slam = SurfelSLAM(cfg)

    calls = {"n": 0}
    real = slam.set_model_maps

    def counting(maps):
        calls["n"] += 1
        return real(maps)

    monkeypatch.setattr(slam, "set_model_maps", counting)
    live_scans = 0
    for i in range(n):
        s = reader.read(i)
        before = calls["n"]
        slam.process_scan(s.points, s.labels, s.probs, s.valid)
        lc = slam._loop
        if lc.unverified or lc.already_verified:
            live_scans += 1
            # the composed model view was installed for the next scan
            assert calls["n"] > before
    assert live_scans >= 1, "no candidate ever went live"
    assert slam._loop.num_loop_closures >= 1
