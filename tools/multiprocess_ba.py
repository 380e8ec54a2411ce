"""Multi-process distributed-BA check (SURVEY.md §4d).

Spawns N CPU processes that form a jax.distributed cluster (each with 2
virtual devices), runs landmark-sharded BA over the global 2N-device
mesh, and verifies every process computes the same final cost as a
single-device solve. This exercises *cross-process* collectives — the
same code path that rides ICI/DCN on a real multi-host pod slice.

Usage:  python tools/multiprocess_ba.py [--procs 2]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(proc_id: int, num_procs: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    import numpy as np
    import jax.numpy as jnp

    from viso_tpu.backend import ba
    from viso_tpu.geometry import se3
    from viso_tpu.parallel import dist_ba, mesh as mesh_mod

    assert jax.process_count() == num_procs
    rng = np.random.default_rng(0)
    C, L = 5, 96
    pts = np.stack(
        [rng.uniform(-4, 4, L), rng.uniform(-3, 3, L), rng.uniform(8, 16, L)],
        axis=-1,
    ).astype(np.float32)
    Rs, ts, obs, mask = [], [], [], []
    for c in range(C):
        xi = jnp.asarray(
            [0.4 * c, 0.05 * c, 0.02 * c, 0.01 * c, -0.02 * c, 0.005 * c],
            jnp.float32,
        )
        R_c, t_c = se3.se3_exp(xi)
        Rs.append(np.asarray(R_c))
        ts.append(np.asarray(t_c))
        pc = pts @ np.asarray(R_c).T + np.asarray(t_c)
        obs.append(pc[:, :2] / pc[:, 2:3] + rng.normal(0, 1e-3, (L, 2)))
        mask.append(pc[:, 2] > 1.0)
    R0 = np.stack(Rs).copy()
    t0 = np.stack(ts).copy()
    for c in range(2, C):
        dR, dt = se3.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        R0[c] = np.asarray(dR) @ R0[c]
        t0[c] = np.asarray(dR) @ t0[c] + np.asarray(dt)
    prob = ba.BAProblem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        obs_uv=jnp.asarray(np.stack(obs), jnp.float32),
        obs_mask=jnp.asarray(np.stack(mask)),
        cam_mask=jnp.ones(C, bool),
        point_mask=jnp.ones(L, bool),
    )
    params = ba.BAParams(iters=8, num_fixed=2)
    # Reference: single-device local solve.
    out_local, info_local = ba.solve(prob, params)
    # Distributed over the global mesh (all processes' devices).
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 2 * num_procs, mesh.devices
    out_dist, info_dist = dist_ba.solve_sharded(prob, params, mesh)
    c_local = float(info_local["final_cost"])
    c_dist = float(info_dist["final_cost"])
    ok = abs(c_local - c_dist) <= 1e-3 * max(abs(c_local), 1e-9)
    print(
        f"[proc {proc_id}] devices={jax.device_count()} "
        f"local={c_local:.6g} dist={c_dist:.6g} ok={ok}",
        flush=True,
    )
    if not ok:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=29571)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.procs, args.port)
        return
    procs = []
    for pid in range(args.procs):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # keep the axon sitecustomize out
        env["PYTHONPATH"] = os.path.abspath(os.path.dirname(__file__) + "/..")
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(pid),
                    "--procs", str(args.procs),
                    "--port", str(args.port),
                ],
                env=env,
            )
        )
    rc = 0
    for p in procs:
        rc |= p.wait()
    if rc == 0:
        print(f"MULTIPROCESS BA OK ({args.procs} processes)")
    sys.exit(rc)


if __name__ == "__main__":
    main()
