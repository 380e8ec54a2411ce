"""Measure the LM-iteration time model for distributed-BA scaling bounds.

Runs the single-device BA solver on THIS process's default backend (the
real TPU when attached) at two landmark counts and fits

    T_iter(L) = a * L + b

where `a*L` is the landmark-sharded work (splits across devices) and `b`
is the replicated work (reduced camera solve, damping, accept logic —
Amdahl term). tools/bench_dist_ba.py consumes this to derive a
MEASUREMENT-grounded 2-host efficiency bound instead of assumed
flop-rate constants (VERDICT r4 #4b).

Timing forces a value readback (block_until_ready is not a reliable
fence on the tunneled backend) and amortizes the link round-trip over
back-to-back dispatches.

Usage: python tools/calib_ba_iter.py [--cams 16] [--iters 10]
Prints one JSON line: {"a_s_per_lm_iter": ..., "b_s_per_iter": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _build_problem(C, L, rng):
    import jax.numpy as jnp

    from viso_tpu.backend import ba
    from viso_tpu.geometry import se3

    pts = np.stack(
        [rng.uniform(-10, 10, L), rng.uniform(-4, 4, L), rng.uniform(5, 60, L)],
        axis=-1,
    ).astype(np.float32)
    Rs = np.zeros((C, 3, 3), np.float32)
    ts = np.zeros((C, 3), np.float32)
    obs = np.zeros((C, L, 2), np.float32)
    mask = np.zeros((C, L), bool)
    for c in range(C):
        R_c, t_c = se3.se3_exp(
            jnp.asarray([0.5 * c, 0.01 * c, 0, 0, 0.002 * c, 0], jnp.float32)
        )
        Rs[c], ts[c] = np.asarray(R_c), np.asarray(t_c)
        pc = pts @ Rs[c].T + ts[c]
        mask[c] = (pc[:, 2] > 1.0) & (np.abs(pc[:, 0] / pc[:, 2]) < 0.9)
        obs[c] = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-3)
    return ba.BAProblem(
        R=jnp.asarray(Rs), t=jnp.asarray(ts),
        points=jnp.asarray(
            pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
        ),
        obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        cam_mask=jnp.ones(C, bool), point_mask=jnp.ones(L, bool),
    )


def _time_solve(prob, params, reps=10):
    from viso_tpu.backend import ba

    out, info = ba.solve(prob, params)
    float(info["final_cost"])          # warm + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out, info = ba.solve(prob, params)
    float(info["final_cost"])          # fence via value readback
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--landmarks", type=int, nargs=2, default=[65536, 8192])
    args = ap.parse_args()

    import jax

    from viso_tpu.backend import ba

    rng = np.random.default_rng(0)
    params = ba.BAParams(iters=args.iters, num_fixed=2)
    L1, L2 = args.landmarks
    t1 = _time_solve(_build_problem(args.cams, L1, rng), params)
    t2 = _time_solve(_build_problem(args.cams, L2, rng), params)
    it1, it2 = t1 / args.iters, t2 / args.iters
    a = max((it1 - it2) / (L1 - L2), 0.0)
    b = max(it2 - a * L2, 0.0)
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "cams": args.cams,
                "iters": args.iters,
                "t_iter_s": {str(L1): it1, str(L2): it2},
                "a_s_per_lm_iter": a,
                "b_s_per_iter": b,
            }
        )
    )


if __name__ == "__main__":
    main()
