"""Distributed window BA as a live engine mode (north-star config 5).

The same stereo run with `distribute_ba=True` must ride the
8-virtual-device CPU mesh (landmark-sharded LM+Schur,
parallel/dist_ba.py) and produce the single-device trajectory up to f32
reduction-order noise.
"""

import numpy as np

import jax

from viso_tpu.slam.engine import StereoVO, VOConfig
from viso_tpu.utils import metrics

from tests.test_engine import INTR, H, W, corridor, render_forward, small_config  # noqa: F401


def _run(frames, **kw):
    vo = StereoVO(small_config(**kw))
    for il, ir in frames:
        vo.process(il, ir)
    R_est, t_est = vo.trajectory()
    vo.close()
    return metrics.camera_centers(R_est, t_est)


def test_distributed_engine_matches_single_device(corridor):  # noqa: F811
    n = 14
    frames, (Rs, ts) = render_forward(corridor, n, stereo=True)
    c_single = _run(frames)
    c_dist = _run(frames, distribute_ba=True)
    c_gt = metrics.camera_centers(Rs, ts)
    ate_s = metrics.ate_rmse(c_single, c_gt, align=True, with_scale=False)
    ate_d = metrics.ate_rmse(c_dist, c_gt, align=True, with_scale=False)
    # Both track; the distributed solve is the same math with different
    # reduction order, so trajectories agree to a few cm over ~3.5 m.
    assert ate_s < 0.05, ate_s
    assert ate_d < 0.05, ate_d
    assert np.abs(c_single - c_dist).max() < 0.05


def test_distributed_slam_engine(corridor):  # noqa: F811
    # Full SLAM engine (loop DB + pose graph hooks active) with its
    # window BA on the mesh.
    from viso_tpu.slam.full import StereoSLAM
    from viso_tpu.slam.loop_closure import LoopParams

    frames, (Rs, ts) = render_forward(corridor, 10, stereo=True)
    vo = StereoSLAM(
        small_config(distribute_ba=True),
        loop_params=LoopParams(capacity=16, num_features=64, guard=4),
    )
    for il, ir in frames:
        vo.process(il, ir)
    R_est, t_est = vo.trajectory()
    c_est = metrics.camera_centers(R_est, t_est)
    c_gt = metrics.camera_centers(Rs, ts)
    ate = metrics.ate_rmse(c_est, c_gt, align=True, with_scale=False)
    vo.close()
    assert ate < 0.05, ate


def test_distributed_solver_cached(corridor):  # noqa: F811
    # The sharded executable must be built once and reused — a re-wrapped
    # shard_map per keyframe would recompile every call.
    from viso_tpu.backend import ba
    from viso_tpu.parallel import dist_ba, mesh as mesh_mod

    mesh = mesh_mod.make_mesh()
    params = ba.BAParams(iters=2)
    s1 = dist_ba.make_sharded_solver(mesh, params)
    s2 = dist_ba.make_sharded_solver(mesh, params)
    assert s1 is s2
    assert (
        dist_ba.make_sharded_solver(mesh, ba.BAParams(iters=3)) is not s1
    )


def test_psum_bytes_independent_of_landmarks():
    from viso_tpu.parallel import dist_ba

    # The reduced-system traffic depends only on the camera count:
    # the (6C)^2 term dominates; 16 cameras ≈ 37 KB/iter.
    assert 36_000 < dist_ba.psum_bytes_per_iter(16) < 40_000
