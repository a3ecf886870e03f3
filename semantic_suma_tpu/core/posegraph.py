"""Pose-graph optimization on SE(3): Gauss-Newton with PCG normal equations.

Replaces the reference's GTSAM wrapper (``/root/reference/src/core/
Posegraph.{h,cpp}``: BetweenFactor<Pose3> + Levenberg-Marquardt) with a
TPU-native solver:

* Factors: odometry/loop ``BetweenFactor`` residuals
  ``r = log(Z^-1 (X_i^-1 X_j))`` with diagonal information, plus a prior on
  the first pose (Posegraph.cpp:41-60).
* Linearization uses right-perturbations ``X exp(d)`` with first-order
  adjoint Jacobians; the normal equations are solved matrix-free by
  **block-Jacobi-preconditioned conjugate gradient**, whose matvec is an
  edge-wise gather/scatter — scaling to thousands of poses without the dense
  6N x 6N factorization GTSAM's LM builds, and mapping naturally to
  ``psum``-based sharding across devices.
* Levenberg damping on the diagonal gives the LM behavior of
  ``Posegraph::optimize`` (Posegraph.cpp:90-104).

Everything is jit-compatible with static edge-capacity padding.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie


class PoseGraphData(NamedTuple):
    """Padded, device-friendly problem description."""

    poses: jnp.ndarray        # [N, 4, 4] current estimates
    edge_i: jnp.ndarray       # [E] int32 source index
    edge_j: jnp.ndarray       # [E] int32 target index
    edge_z: jnp.ndarray       # [E, 4, 4] measured relative pose i->j
    edge_info: jnp.ndarray    # [E, 6] diagonal information
    edge_valid: jnp.ndarray   # [E] bool
    n_poses: jnp.ndarray      # int32 (poses beyond are ignored)


def _so3_left_jacobian_inv_approx(omega):
    """First-order inverse left Jacobian: I - 0.5 hat(omega)."""
    return jnp.eye(3, dtype=omega.dtype) - 0.5 * lie.hat(omega)


def _between_residual(xi, xj, z):
    """r = log(Z^-1 X_i^-1 X_j) in [v, omega] order."""
    rel = lie.se3_inverse(z) @ (lie.se3_inverse(xi) @ xj)
    return lie.se3_log(rel)


def _residuals(poses, data: PoseGraphData):
    xi = poses[data.edge_i]
    xj = poses[data.edge_j]
    r = jax.vmap(_between_residual)(xi, xj, data.edge_z)
    return jnp.where(data.edge_valid[:, None], r, 0.0)


def _edge_jacobians(poses, data: PoseGraphData):
    """Jacobians of each edge residual w.r.t. right-perturbations of X_i and
    X_j, computed with jax.jacfwd through the exact residual (6x6 each).
    Autodiff replaces hand-derived adjoint formulas — exact at the current
    linearization point, and fully fused by XLA."""

    def res_fn(di, dj, xi, xj, z):
        return _between_residual(xi @ lie.se3_exp(di), xj @ lie.se3_exp(dj), z)

    zeros = jnp.zeros((data.edge_i.shape[0], 6), poses.dtype)
    xi = poses[data.edge_i]
    xj = poses[data.edge_j]
    ji = jax.vmap(jax.jacfwd(res_fn, argnums=0))(zeros, zeros, xi, xj, data.edge_z)
    jj = jax.vmap(jax.jacfwd(res_fn, argnums=1))(zeros, zeros, xi, xj, data.edge_z)
    mask = data.edge_valid[:, None, None]
    return jnp.where(mask, ji, 0.0), jnp.where(mask, jj, 0.0)


def _normal_matvec(x, ji, jj, data: PoseGraphData, n, lam, jtj_diag):
    """(JᵀWJ + lam*diag) @ x without materializing the matrix."""
    xi = x[data.edge_i]
    xj = x[data.edge_j]
    # per-edge residual-space product
    ri = jnp.einsum("eab,eb->ea", ji, xi) + jnp.einsum("eab,eb->ea", jj, xj)
    ri = ri * data.edge_info
    out = jnp.zeros_like(x)
    out = out.at[data.edge_i].add(jnp.einsum("eba,eb->ea", ji, ri))
    out = out.at[data.edge_j].add(jnp.einsum("eba,eb->ea", jj, ri))
    # prior on pose 0 (large fixed information, Posegraph.cpp:41-46)
    out = out.at[0].add(1e6 * x[0])
    return out + lam * jtj_diag * x


def _block_diag(ji, jj, data: PoseGraphData, n):
    """6x6 diagonal blocks of JᵀWJ for the block-Jacobi preconditioner."""
    wi = ji * data.edge_info[:, :, None]
    wj = jj * data.edge_info[:, :, None]
    bi = jnp.einsum("eba,ebc->eac", ji, wi)
    bj = jnp.einsum("eba,ebc->eac", jj, wj)
    blocks = jnp.zeros((n, 6, 6), ji.dtype)
    blocks = blocks.at[data.edge_i].add(bi)
    blocks = blocks.at[data.edge_j].add(bj)
    blocks = blocks.at[0].add(1e6 * jnp.eye(6, dtype=ji.dtype))
    return blocks


@partial(jax.jit, static_argnames=("max_gn_iters", "max_cg_iters", "dense"))
def optimize(data: PoseGraphData, max_gn_iters: int = 10,
             max_cg_iters: int = 64, lam: float = 1e-6,
             tol: float = 1e-6, dense: bool = False):
    """Gauss-Newton with PCG (or dense-Cholesky) inner solves.

    ``dense=True`` assembles the full 6Nx6N normal matrix and solves by
    Cholesky on the MXU — for small graphs (N <= ~1024) this is ~10x
    faster on TPU than the matrix-free PCG, whose ~64x10 sequential tiny
    iterations are latency-bound (measured ~600 ms/solve at N=256 vs the
    dense path's tens of ms). PCG remains the scalable path for huge
    graphs. Returns (poses, final_error)."""
    n = data.poses.shape[0]
    mask = (jnp.arange(n) < data.n_poses)[:, None]

    def error_of(poses):
        r = _residuals(poses, data)
        return jnp.sum(r * r * data.edge_info)

    def gn_body(carry):
        poses, _, it, done = carry
        r = _residuals(poses, data)
        ji, jj = _edge_jacobians(poses, data)

        # gradient g = Jᵀ W r
        wr = r * data.edge_info
        g = jnp.zeros((n, 6), poses.dtype)
        g = g.at[data.edge_i].add(jnp.einsum("eba,eb->ea", ji, wr))
        g = g.at[data.edge_j].add(jnp.einsum("eba,eb->ea", jj, wr))

        if dense:
            wi = ji * data.edge_info[:, :, None]
            wj = jj * data.edge_info[:, :, None]
            bii = jnp.einsum("eba,ebc->eac", ji, wi)
            bjj = jnp.einsum("eba,ebc->eac", jj, wj)
            bij = jnp.einsum("eba,ebc->eac", ji, wj)
            bji = jnp.einsum("eba,ebc->eac", jj, wi)
            ei, ej = data.edge_i, data.edge_j
            h = jnp.zeros((n, 6, n, 6), poses.dtype)
            h = h.at[ei, :, ei, :].add(bii)
            h = h.at[ej, :, ej, :].add(bjj)
            h = h.at[ei, :, ej, :].add(bij)
            h = h.at[ej, :, ei, :].add(bji)
            h = h.at[0, :, 0, :].add(1e6 * jnp.eye(6, dtype=poses.dtype))
            n6 = n * 6
            hm = h.reshape(n6, n6)
            dmask = jnp.repeat(mask[:, 0], 6)
            # pad poses get an identity row/col so the factorization stays
            # SPD; their rhs is zero, so dx there is exactly zero
            hm = jnp.where(dmask[:, None] & dmask[None, :], hm, 0.0)
            diag = jnp.diag(hm)
            hm = hm + jnp.diag(jnp.where(dmask, lam * diag + 1e-6, 1.0))
            rhs = (-g * mask).reshape(-1)
            chol = jax.scipy.linalg.cho_factor(hm, lower=True)
            dx = jax.scipy.linalg.cho_solve(chol, rhs).reshape(n, 6) * mask
        else:
            blocks = _block_diag(ji, jj, data, n)
            blocks_reg = blocks + 1e-6 * jnp.eye(6, dtype=poses.dtype)
            chol = jax.vmap(
                lambda b: jax.scipy.linalg.cho_factor(b, lower=True))(
                blocks_reg)

            def precond(v):
                return jax.vmap(
                    lambda c, rhs: jax.scipy.linalg.cho_solve((c, True), rhs)
                )(chol[0], v)

            jtj_diag = jax.vmap(jnp.diag)(blocks)

            def matvec(v):
                return _normal_matvec(v * mask, ji, jj, data, n, lam,
                                      jtj_diag) * mask

            b = -g * mask

            def cg_body(carry):
                x, rr, p, rz, k = carry
                ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-30)
                x = x + alpha * p
                rr = rr - alpha * ap
                z = precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return x, rr, p, rz_new, k + 1

            def cg_cond(carry):
                _, rr, _, _, k = carry
                return (k < max_cg_iters) & (jnp.sum(rr * rr) > tol * tol)

            x0 = jnp.zeros_like(b)
            z0 = precond(b)
            dx, *_ = jax.lax.while_loop(
                cg_cond, cg_body, (x0, b, z0, jnp.sum(b * z0),
                                   jnp.zeros((), jnp.int32)))

        new_poses = jax.vmap(lambda p, d: p @ lie.se3_exp(d))(poses, dx * mask)
        new_poses = jnp.where(mask[:, :, None], new_poses, poses)

        err_old = error_of(poses)
        err_new = error_of(new_poses)
        improved = err_new < err_old
        poses_out = jnp.where(improved, new_poses, poses)
        done = ~improved | (jnp.abs(err_old - err_new)
                            < 1e-9 * jnp.maximum(err_old, 1.0))
        return poses_out, jnp.minimum(err_new, err_old), it + 1, done

    def gn_cond(carry):
        _, _, it, done = carry
        return (it < max_gn_iters) & ~done

    init = (data.poses, error_of(data.poses), jnp.zeros((), jnp.int32),
            jnp.asarray(False))
    poses, err, _, _ = jax.lax.while_loop(gn_cond, gn_body, init)
    return poses, err


class Posegraph:
    """Host-side incremental pose-graph container mirroring the reference
    API (setInitial / addEdge / optimize / poses)."""

    def __init__(self, edge_capacity: int = 16384):
        self._poses: list[np.ndarray] = []
        self._edges: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self.edge_capacity = edge_capacity
        # incrementally-filled numpy mirrors of _edges (the per-call python
        # fill loop costs ~50 us/edge — hundreds of ms on big graphs)
        self._buf_i = np.zeros(edge_capacity, np.int32)
        self._buf_j = np.zeros(edge_capacity, np.int32)
        self._buf_z = np.tile(np.eye(4, dtype=np.float32),
                              (edge_capacity, 1, 1))
        self._buf_info = np.zeros((edge_capacity, 6), np.float32)
        self._cached = 0

    def _edge_arrays(self):
        e = len(self._edges)
        if self._cached > e:  # list replaced/shrunk (checkpoint load)
            self._cached = 0
        for k in range(self._cached, min(e, self.edge_capacity)):
            i, j, z, info = self._edges[k]
            self._buf_i[k] = i
            self._buf_j[k] = j
            self._buf_z[k] = z
            self._buf_info[k] = info
        self._cached = min(e, self.edge_capacity)
        return self._buf_i, self._buf_j, self._buf_z, self._buf_info

    def set_initial(self, idx: int, pose) -> None:
        pose = np.asarray(pose, np.float32)
        while len(self._poses) <= idx:
            self._poses.append(np.eye(4, dtype=np.float32))
        self._poses[idx] = pose

    def add_edge(self, i: int, j: int, z, info=None) -> None:
        if info is None:
            info = np.ones(6, np.float32)
        self._edges.append((i, j, np.asarray(z, np.float32),
                            np.asarray(info, np.float32)))

    def pose(self, idx: int) -> np.ndarray:
        return self._poses[idx]

    def poses(self) -> list[np.ndarray]:
        return list(self._poses)

    def translations(self, n: int | None = None) -> np.ndarray:
        """[n, 3] pose translations (vectorized candidate search)."""
        n = len(self._poses) if n is None else min(n, len(self._poses))
        if n == 0:
            return np.zeros((0, 3), np.float32)
        return np.stack([p[:3, 3] for p in self._poses[:n]])

    def size(self) -> int:
        return len(self._poses)

    def clone(self) -> "Posegraph":
        g = Posegraph(self.edge_capacity)
        g._poses = [p.copy() for p in self._poses]
        g._edges = list(self._edges)
        return g

    def to_device(self, pose_capacity: int | None = None,
                  device=None) -> PoseGraphData:
        n = len(self._poses)
        e = len(self._edges)
        # pad the pose axis to the next power of two: `optimize` is jitted
        # over these shapes, so sizing to the exact count would recompile
        # the whole GN+PCG program at every new trajectory length (minutes
        # of recompilation on a KITTI-length run); pow2 padding bounds the
        # number of distinct programs to log2(N) (the n_poses mask already
        # ignores the pad rows)
        # floors of 256 poses / 1024 edges: each new (cap_n, cap_e) tier is
        # a fresh jit compile (~1-1.5 s on CPU, uncached per process), so
        # KITTI-scale runs should cross at most a handful of tiers
        cap_n = pose_capacity or max(256, 1 << max(1, n - 1).bit_length())
        if e > self.edge_capacity:
            raise ValueError(f"edge capacity {self.edge_capacity} "
                             f"exceeded ({e})")
        cap_e = min(self.edge_capacity,
                    max(1024, 1 << max(1, e - 1).bit_length()))
        poses = np.tile(np.eye(4, dtype=np.float32), (cap_n, 1, 1))
        poses[:n] = np.stack(self._poses) if n else poses[:0]
        bi, bj, bz, binfo = self._edge_arrays()
        ei = bi[:cap_e].copy()
        ej = bj[:cap_e].copy()
        ez = bz[:cap_e].copy()
        einfo = binfo[:cap_e].copy()
        ev = np.zeros(cap_e, bool)
        ev[:e] = True
        # device_put NUMPY directly: wrapping in jnp.asarray first would
        # land each leaf on the DEFAULT device (a remote TPU round trip
        # per leaf, ~30 ms each) before moving it to the target
        put = (jnp.asarray if device is None
               else (lambda a: jax.device_put(np.asarray(a), device)))
        return PoseGraphData(
            poses=put(poses), edge_i=put(ei),
            edge_j=put(ej), edge_z=put(ez),
            edge_info=put(einfo), edge_valid=put(ev),
            n_poses=put(np.asarray(n, np.int32)))

    def optimize(self, max_iterations: int = 10) -> float:
        """Run GN+PCG on device; writes results back. Returns final error."""
        if len(self._poses) < 2 or not self._edges:
            return 0.0
        # Small graphs run on the LOCAL CPU backend: the problem is a few
        # hundred 6-DoF poses (host-resident state), and on a remote TPU
        # the sequential GN/PCG chain is latency-bound (~0.6 s per
        # optimization measured) — the reference runs this exact stage on
        # CPU too (GTSAM, Posegraph.cpp:90-104). On CPU the matrix-free
        # PCG's tiny iterations cost microseconds, so it beats the dense
        # Cholesky (whose pow2-padded 6Nx6N factorization pays cubically).
        small = len(self._poses) <= 1024
        device = None
        if small:
            try:
                device = jax.devices("cpu")[0]
            except RuntimeError:  # pragma: no cover
                device = None
        data = self.to_device(device=device)
        poses, err = optimize(data, max_gn_iters=max_iterations)
        poses = np.asarray(poses)
        for i in range(len(self._poses)):
            self._poses[i] = poses[i]
        return float(err)
