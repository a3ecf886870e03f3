"""Cumulative bisection of _update_stage_a cost + layout experiments."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import math

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.models.labels import is_movable


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    dc, mc = cfg.data, cfg.map
    act_n = mc.active_capacity
    hw = dc.height * dc.width
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    pos = jax.random.uniform(k1, (act_n, 3), jnp.float32, -40, 40)
    nrm = jax.random.normal(k2, (act_n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    f = jnp.zeros((act_n, sm.NUM_F), jnp.float32)
    f = f.at[:, sm._WPOS].set(pos).at[:, sm._WNRM].set(nrm)
    f = f.at[:, sm._RADIUS].set(0.1).at[:, sm._CONF].set(1.0)
    i = jnp.zeros((act_n, sm.NUM_I), jnp.int32).at[:, sm._VALID].set(1)
    act = sm.PackedSurfels(f=f, i=i)
    frame_img = jax.random.normal(k3, (hw, 10), jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32)
    ts = jnp.asarray(10, jnp.int32)

    proj = jax.jit(lambda a, : sm._project_surfels(a, pose, dc,
                                                   facing_eps=0.0))(act)
    jax.block_until_ready(proj)

    def v1(a_, fi, p_):  # gather + observed only
        pid = p_.py * dc.width + p_.px
        g = fi[pid]
        m_valid = g[:, 6] > 0.5
        return a_.valid & (p_.cosv > 0.0) & p_.inside & m_valid

    def v2(a_, fi, p_):  # + transform + compat
        pid = p_.py * dc.width + p_.px
        g = fi[pid]
        v_meas, n_meas = g[:, 0:3], g[:, 3:6]
        m_valid = g[:, 6] > 0.5
        observed = a_.valid & (p_.cosv > 0.0) & p_.inside & m_valid
        v_g = v_meas @ pose[:3, :3].T + pose[:3, 3]
        n_g = n_meas @ pose[:3, :3].T
        n_g = n_g / jnp.maximum(jnp.linalg.norm(n_g, axis=-1, keepdims=True),
                                1e-12)
        dist = jnp.abs(jnp.sum(a_.wnormal * (v_g - a_.wpos), axis=-1))
        angle = jnp.linalg.norm(jnp.cross(n_g, a_.wnormal), axis=-1)
        compat = observed & (dist < mc.max_distance) & (angle < 0.7)
        return compat, dist, angle

    def v3(a_, fi, p_):  # + odds + slerp + averages (full-ish, no outputs cut)
        return sm._update_stage_a(a_, fi, pose, p_, ts, dc, mc, True)

    timeit("v1 gather+observed", jax.jit(v1), act, frame_img, proj)
    timeit("v2 +transform+compat", jax.jit(v2), act, frame_img, proj)
    timeit("v3 full stage_a", jax.jit(v3), act, frame_img, proj)

    # recompute proj INSIDE (fused) to see materialization effects
    def v3b(a_, fi):
        p_ = sm._project_surfels(a_, pose, dc, facing_eps=0.0)
        return sm._update_stage_a(a_, fi, pose, p_, ts, dc, mc, True)
    timeit("v3b proj+stage_a fused", jax.jit(v3b), act, frame_img)

    # layout test: transposed storage [16, N]
    ft = f.T  # [16, N]
    def v4(ft_, fi, p_):
        pid = p_.py * dc.width + p_.px
        g = fi[pid]
        v_meas = g[:, 0:3]
        wpos = ft_[10:13].T
        wnrm = ft_[13:16].T
        dist = jnp.abs(jnp.sum(wnrm * (v_meas - wpos), axis=-1))
        return dist
    timeit("v4 transposed slice math", jax.jit(v4), ft, frame_img, proj)


if __name__ == "__main__":
    main()
