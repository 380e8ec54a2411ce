"""Sim(3) pose-graph optimization (monocular loop-closure backend).

The SE(3) graph (backend/pose_graph.py) cannot express monocular scale
drift: a mono loop closure observes that the revisited segment runs at
a different SCALE than when first mapped, and the correction must
redistribute log-scale along the loop as well as rotation/translation.
Same LM machinery as the SE(3) solver with 7-DoF nodes
(S_k = (s_k, R_k, t_k), world->cam, odometry enters at s=1) and 7-dim
edge residuals

    r = log_dec(S_ij_meas^-1 o S_i o S_j^-1)

via vmapped forward-mode autodiff (exact Jacobians of the actual
residual — no hand-derived Sim3 adjoints to get wrong). Dense (7K x 7K)
solve — mono graphs at a few hundred keyframes are trivial on the MXU;
the SE(3) module's matrix-free PCG generalizes the same way if a
deployment ever grows past ~1k mono keyframes.

No reference counterpart (its backend never ran, bundle_adjuster.h);
this carries the reference's monocular pipeline to the loop-closing
backend it needed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viso_tpu.backend import robust
from viso_tpu.geometry import sim3


class Sim3Graph(NamedTuple):
    s: jnp.ndarray          # (K,) node scales
    R: jnp.ndarray          # (K, 3, 3) world->cam
    t: jnp.ndarray          # (K, 3)
    node_mask: jnp.ndarray  # (K,)
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    s_ij: jnp.ndarray       # (E,) measured relative scale
    R_ij: jnp.ndarray       # (E, 3, 3) measured S_i o S_j^-1
    t_ij: jnp.ndarray       # (E, 3)
    edge_weight: jnp.ndarray  # (E,)
    edge_mask: jnp.ndarray    # (E,)


class PGParams(NamedTuple):
    iters: int = 25
    huber: float = 0.5
    lam0: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 0.5
    num_fixed: int = 1
    # Scale residuals are log-ratios (~0.1 for 10% drift) while
    # translation residuals are meters: weight the scale row so a 10%
    # scale error counts like ~a half-meter one.
    scale_weight: float = 5.0


def edge_residual(si, Ri, ti, sj, Rj, tj, s_ij, R_ij, t_ij, sw):
    rel = sim3.compose(si, Ri, ti, *sim3.inverse(sj, Rj, tj))
    err = sim3.compose(*sim3.inverse(s_ij, R_ij, t_ij), *rel)
    r = sim3.log_decomposed(*err)
    return r * jnp.concatenate(
        [jnp.ones(6, r.dtype), jnp.asarray([sw], r.dtype)]
    )


def _edge_residual_perturbed(xi2, si, Ri, ti, sj, Rj, tj,
                             s_ij, R_ij, t_ij, sw):
    si_p, Ri_p, ti_p = sim3.left_update(xi2[:7], si, Ri, ti)
    sj_p, Rj_p, tj_p = sim3.left_update(xi2[7:], sj, Rj, tj)
    return edge_residual(
        si_p, Ri_p, ti_p, sj_p, Rj_p, tj_p, s_ij, R_ij, t_ij, sw
    )


def residuals(graph: Sim3Graph, params: PGParams = PGParams()):
    si, Ri, ti = (
        graph.s[graph.edge_i], graph.R[graph.edge_i], graph.t[graph.edge_i]
    )
    sj, Rj, tj = (
        graph.s[graph.edge_j], graph.R[graph.edge_j], graph.t[graph.edge_j]
    )
    r = jax.vmap(edge_residual, in_axes=(0,) * 9 + (None,))(
        si, Ri, ti, sj, Rj, tj,
        graph.s_ij, graph.R_ij, graph.t_ij, params.scale_weight,
    )
    return jnp.where(graph.edge_mask[:, None], r, 0.0)


def compute_cost(graph: Sim3Graph, params: PGParams = PGParams()):
    r = residuals(graph, params)
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = graph.edge_weight * graph.edge_mask
    return jnp.sum(w * robust.huber_cost(r_norm, params.huber))


def _gn_step(s, R, t, graph: Sim3Graph, lam, params: PGParams, K):
    si, Ri, ti = s[graph.edge_i], R[graph.edge_i], t[graph.edge_i]
    sj, Rj, tj = s[graph.edge_j], R[graph.edge_j], t[graph.edge_j]

    def res_fn(xi2, si, Ri, ti, sj, Rj, tj, s_ij, R_ij, t_ij):
        return _edge_residual_perturbed(
            xi2, si, Ri, ti, sj, Rj, tj, s_ij, R_ij, t_ij,
            params.scale_weight,
        )

    zeros = jnp.zeros((graph.edge_i.shape[0], 14), R.dtype)
    r = jax.vmap(res_fn)(
        zeros, si, Ri, ti, sj, Rj, tj, graph.s_ij, graph.R_ij, graph.t_ij
    )
    J = jax.vmap(jax.jacfwd(res_fn))(
        zeros, si, Ri, ti, sj, Rj, tj, graph.s_ij, graph.R_ij, graph.t_ij
    )  # (E, 7, 14)
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = (
        graph.edge_weight
        * graph.edge_mask
        * robust.huber_weight(r_norm, params.huber)
    )
    free = graph.node_mask & (jnp.arange(K) >= params.num_fixed)
    f = free.astype(R.dtype)

    Ji = J[..., :7] * w[:, None, None]
    Jj = J[..., 7:] * w[:, None, None]
    ei, ej = graph.edge_i, graph.edge_j
    H = jnp.zeros((K, K, 7, 7), R.dtype)
    b = jnp.zeros((K, 7), R.dtype)
    H = H.at[ei, ei].add(jnp.einsum("eai,eaj->eij", Ji, J[..., :7]))
    H = H.at[ej, ej].add(jnp.einsum("eai,eaj->eij", Jj, J[..., 7:]))
    H = H.at[ei, ej].add(jnp.einsum("eai,eaj->eij", Ji, J[..., 7:]))
    H = H.at[ej, ei].add(jnp.einsum("eai,eaj->eij", Jj, J[..., :7]))
    b = b.at[ei].add(-jnp.einsum("eai,ea->ei", Ji, r))
    b = b.at[ej].add(-jnp.einsum("eai,ea->ei", Jj, r))

    eye7 = jnp.eye(7, dtype=R.dtype)
    diag_blocks = H[jnp.arange(K), jnp.arange(K)]
    diag_scale = jnp.einsum("kii->k", diag_blocks) / 7.0 + 1e-6
    H = H.at[jnp.arange(K), jnp.arange(K)].add(
        lam * diag_scale[:, None, None] * eye7
    )
    H = H * f[:, None, None, None] * f[None, :, None, None]
    H = H.at[jnp.arange(K), jnp.arange(K)].add(
        (1.0 - f)[:, None, None] * eye7
    )
    b = b * f[:, None]

    H_flat = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
    delta = jnp.linalg.solve(H_flat, b.reshape(7 * K)).reshape(K, 7)
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0) * f[:, None]
    s_new, R_new, t_new = jax.vmap(sim3.left_update)(delta, s, R, t)
    return s_new, R_new, t_new


@partial(jax.jit, static_argnames=("params",))
def solve(graph: Sim3Graph, params: PGParams = PGParams()):
    """LM Sim(3) pose-graph optimization; returns (graph, info)."""
    K = graph.R.shape[0]

    def body(state, _):
        s, R, t, lam, cost = state
        s_n, R_n, t_n = _gn_step(s, R, t, graph, lam, params, K)
        new_cost = compute_cost(
            graph._replace(s=s_n, R=R_n, t=t_n), params
        )
        accept = new_cost < cost
        s = jnp.where(accept, s_n, s)
        R = jnp.where(accept, R_n, R)
        t = jnp.where(accept, t_n, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * params.lam_down, 1e-9),
            jnp.minimum(lam * params.lam_up, 1e6),
        )
        return (s, R, t, lam, cost), cost

    cost0 = compute_cost(graph, params)
    init = (
        graph.s, graph.R, graph.t,
        jnp.asarray(params.lam0, graph.R.dtype), cost0,
    )
    (s, R, t, lam, cost), hist = jax.lax.scan(
        body, init, None, length=params.iters
    )
    return graph._replace(s=s, R=R, t=t), {
        "initial_cost": cost0,
        "final_cost": cost,
        "cost_history": hist,
    }


def solve_padded(pg_s, pg_R, pg_t, edges, params: PGParams = PGParams()):
    """Power-of-two-bucketed Sim3 solve (same contract as the SE(3)
    module's solve_padded). `edges`: (i, j, s_ij, R_ij, t_ij, weight).
    Returns (Sim3Graph, info) with padded arrays — slice [:len(pg_R)].
    """
    import numpy as np

    from viso_tpu.backend.pose_graph import _bucket

    K = len(pg_R)
    E = len(edges)
    Kp = _bucket(K)
    Ep = _bucket(E)

    s = np.ones(Kp, np.float32)
    R = np.zeros((Kp, 3, 3), np.float32)
    R[:] = np.eye(3)
    t = np.zeros((Kp, 3), np.float32)
    s[:K] = np.asarray(pg_s)
    R[:K] = np.stack(pg_R)
    t[:K] = np.stack(pg_t)
    node_mask = np.zeros(Kp, bool)
    node_mask[:K] = True

    ei = np.zeros(Ep, np.int32)
    ej = np.zeros(Ep, np.int32)
    s_ij = np.ones(Ep, np.float32)
    R_ij = np.zeros((Ep, 3, 3), np.float32)
    R_ij[:] = np.eye(3)
    t_ij = np.zeros((Ep, 3), np.float32)
    w = np.zeros(Ep, np.float32)
    edge_mask = np.zeros(Ep, bool)
    for k, (i, j, sm, Rm, tm, wt) in enumerate(edges):
        ei[k], ej[k] = i, j
        s_ij[k], R_ij[k], t_ij[k] = sm, Rm, tm
        w[k] = wt
        edge_mask[k] = True

    g = Sim3Graph(
        s=jnp.asarray(s), R=jnp.asarray(R), t=jnp.asarray(t),
        node_mask=jnp.asarray(node_mask),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        s_ij=jnp.asarray(s_ij), R_ij=jnp.asarray(R_ij),
        t_ij=jnp.asarray(t_ij),
        edge_weight=jnp.asarray(w), edge_mask=jnp.asarray(edge_mask),
    )
    return solve(g, params)
