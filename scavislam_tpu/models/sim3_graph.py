"""Sim3 pose-graph optimization: scale-drift-aware loop closure (mono mode).

The reference scaffolds a monocular mode behind ``#ifdef MONO`` that is never
enabled: Sim3 vertices/edges in g2o (anchored_points.h:180-218, error
log(S_21 * S_1w * S_w2)) and RanSaC<Sim3Model> (ransac_models.cpp:85-136).
This module provides the TPU-native substrate that mode would optimize with:
a 7-dof pose-graph LM over similarity transforms — the standard fix for
monocular scale drift at loop closure (Strasdat et al., "Scale Drift-Aware
Large Scale Monocular SLAM", RSS 2010, the same author's companion work).

Design: static shapes (pad + mask edges), one jitted LM step. Per-edge
residual r = log(S_meas^-1 * S_i * S_j^-1) in the [ups, omega, sigma]
tangent; local Jacobians of the 14 edge dofs come from jax.jacfwd around
zero (vmapped over edges — 14 JVPs on a 7-vector function, compiled once),
normal equations assembled by scatter-add, dense Cholesky solve on the MXU
(pose-graph windows are 100-200 nodes; 7N x 7N dense is small device work).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import Sim3


def _edge_residual(eps_i, eps_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """r = log(S_m^-1 * (exp(eps_i) S_i) * (exp(eps_j) S_j)^-1), 7-vector."""
    Si = Sim3.exp(eps_i) @ Sim3(Ri, ti, si)
    Sj = Sim3.exp(eps_j) @ Sim3(Rj, tj, sj)
    Sm = Sim3(Rm, tm, sm)
    return (Sm.inverse() @ Si @ Sj.inverse()).log()


_dr_deps_i = jax.jacfwd(_edge_residual, argnums=0)
_dr_deps_j = jax.jacfwd(_edge_residual, argnums=1)


@partial(jax.jit, static_argnames=("n_nodes",))
def _gn_step(R, t, s, ei, ej, Rm, tm, sm, e_valid, fixed_mask, lam,
             n_nodes: int):
    """One Levenberg-Marquardt normal-equation step. Returns (delta, chi2)
    with delta (N, 7) local updates (applied left-multiplicatively)."""
    z7 = jnp.zeros(7, jnp.float32)

    def per_edge(i, j, Rm_e, tm_e, sm_e):
        args = (R[i], t[i], s[i], R[j], t[j], s[j], Rm_e, tm_e, sm_e)
        r = _edge_residual(z7, z7, *args)
        Ji = _dr_deps_i(z7, z7, *args)
        Jj = _dr_deps_j(z7, z7, *args)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(per_edge)(ei, ej, Rm, tm, sm)  # (E,7),(E,7,7)x2
    w = e_valid.astype(jnp.float32)
    chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))

    # assemble H (N*7, N*7), b (N*7) by scatter-add of the edge blocks
    Hii = jnp.einsum("eki,ekj,e->eij", Ji, Ji, w)
    Hjj = jnp.einsum("eki,ekj,e->eij", Jj, Jj, w)
    Hij = jnp.einsum("eki,ekj,e->eij", Ji, Jj, w)
    bi = jnp.einsum("eki,ek,e->ei", Ji, r, w)
    bj = jnp.einsum("eki,ek,e->ei", Jj, r, w)

    H = jnp.zeros((n_nodes, 7, n_nodes, 7), jnp.float32)
    H = H.at[ei, :, ei, :].add(Hii)
    H = H.at[ej, :, ej, :].add(Hjj)
    H = H.at[ei, :, ej, :].add(Hij)
    H = H.at[ej, :, ei, :].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((n_nodes, 7), jnp.float32)
    b = b.at[ei].add(bi)
    b = b.at[ej].add(bj)

    # gauge fixing by projection: zero the fixed nodes' rows/columns and put
    # 1 on their diagonal so their delta solves to exactly 0. (A huge
    # diagonal boost instead — the g2o trick — is catastrophic in f32: the
    # 1e12 entries swamp the ~1-scale blocks and the solve returns NaN.)
    free = 1.0 - fixed_mask.astype(jnp.float32)
    fdof = jnp.repeat(free, 7)
    Hf = H.reshape(n_nodes * 7, n_nodes * 7)
    Hf = Hf * fdof[:, None] * fdof[None, :]
    Hf = Hf + jnp.diag(lam * fdof + (1.0 - fdof))
    bf = b.reshape(-1) * fdof
    delta = jnp.linalg.solve(Hf, -bf).reshape(n_nodes, 7)
    return delta, chi2


@partial(jax.jit, static_argnames=("n_nodes",))
def _apply(R, t, s, delta, n_nodes: int):
    upd = Sim3.exp(delta)
    comp = Sim3(upd.R, upd.t, upd.s) @ Sim3(R, t, s)
    return comp.R, comp.t, comp.s


def optimize_sim3_pose_graph(
    nodes: Sim3,  # batched (N, ...) world-from-node or node-from-world poses
    edge_i, edge_j,  # (E,) int32 node indices
    edge_meas: Sim3,  # (E, ...) measured S_i_from_j
    edge_valid,  # (E,) bool
    fixed_mask=None,  # (N,) bool, default: node 0
    iters: int = 10,
    lam: float = 1e-4,
):
    """LM on the Sim3 pose graph. Returns (nodes, chi2_history)."""
    R, t, s = nodes.R, nodes.t, nodes.s
    n = R.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.zeros(n, bool).at[0].set(True)
    ei = jnp.asarray(edge_i, jnp.int32)
    ej = jnp.asarray(edge_j, jnp.int32)
    ev = jnp.asarray(edge_valid, bool)
    lam_f = jnp.float32(lam)
    history = []
    for _ in range(iters):
        delta, chi2 = _gn_step(R, t, s, ei, ej, edge_meas.R, edge_meas.t,
                               edge_meas.s, ev, fixed_mask, lam_f, n)
        R, t, s = _apply(R, t, s, delta, n)
        history.append(float(chi2))
    return Sim3(R, t, s), history
