"""Distributed BA must produce the same result as single-device BA on an
8-virtual-device CPU mesh (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.backend import ba
from viso_tpu.parallel import dist_ba, mesh as mesh_mod

from tests.test_ba import synthetic_window, pose_errors


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device(rng):
    prob, (R_true, t_true, pts) = synthetic_window(rng, C=5, L=96)
    params = ba.BAParams(iters=10, num_fixed=2)
    out_single, info_single = ba.solve(prob, params)
    m = mesh_mod.make_mesh()
    out_shard, info_shard = dist_ba.solve_sharded(prob, params, m)
    # Bitwise equality is not expected (reduction orders differ), but the
    # optimized states must agree tightly.
    assert np.allclose(
        np.asarray(out_shard.R), np.asarray(out_single.R), atol=1e-4
    )
    assert np.allclose(
        np.asarray(out_shard.t), np.asarray(out_single.t), atol=1e-3
    )
    # Landmark depth is the weakly-constrained direction of the problem:
    # f32 reduction-order differences between the sharded and single-device
    # Schur builds amplify to a few 1e-3 along the ray even when the costs
    # agree to ~1e-6 relative. Gate points at 1e-2 and rely on the cost
    # check below for optimality agreement.
    assert np.allclose(
        np.asarray(out_shard.points), np.asarray(out_single.points), atol=1e-2
    )
    assert np.isclose(
        float(info_shard["final_cost"]), float(info_single["final_cost"]),
        rtol=1e-3,
    )


def test_sharded_ba_padding(rng):
    # Landmark count not divisible by the mesh size.
    prob, (R_true, t_true, pts) = synthetic_window(rng, C=4, L=61)
    params = ba.BAParams(iters=6, num_fixed=2)
    out, info = dist_ba.solve_sharded(prob, params)
    assert out.points.shape[0] == 61
    assert float(info["final_cost"]) < float(info["initial_cost"])
    errs = pose_errors(out.R, out.t, R_true, t_true)
    assert errs[2:, 0].max() < 0.5
