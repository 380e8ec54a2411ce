"""White-box tests of the SLAM loop layer's pose-graph bookkeeping.

These exercise the worker-side hook logic DIRECTLY (synchronously, with
the descriptor database stubbed out) so the throttle/flush/rollback
contracts have fast, deterministic coverage independent of full SLAM
runs:

  * join() flushes a solve left pending behind the event throttle
    (a run whose last loops land inside the throttle window must still
    get its corrections; ADVICE r3 #1).
  * A rejected solve rolls back EVERY loop edge accumulated since the
    last accepted solve, not just the newest (ADVICE r3 #2), and
    rewinds the throttle clock.
  * A hook failure appends a placeholder node so node ids stay dense
    and later hooks / trajectory() survive (ADVICE r3 #4).
"""

import numpy as np
import pytest

from viso_tpu.slam.engine import VOConfig
from viso_tpu.slam.full import StereoSLAM
from viso_tpu.slam.loop_closure import LoopCandidate, LoopParams
from viso_tpu.slam.mono_full import MonoSLAM


def _tiny_cfg():
    return VOConfig(
        height=64, width=80, max_keyframes=2, max_landmarks=64,
        num_features=32, pyramid_levels=2, track_landmarks=32,
    )


def _tiny_params():
    return LoopParams(capacity=16, num_features=8, guard=0)


@pytest.fixture
def slam():
    s = StereoSLAM(_tiny_cfg(), _tiny_params())
    # The database is not under test: detection results are injected
    # per-push via _push below.
    s.loop_db.add = lambda *a, **k: None
    yield s
    s.close()


def _push(s, node_id, center, cand=None, mono=False):
    """Run the worker-side hook synchronously for a node at the given
    camera center (R = I, world->cam t = -center)."""
    s.loop_db.detect_fused = lambda *a, **k: cand
    s.loop_db.detect_fused_sim3 = lambda *a, **k: cand
    R = np.eye(3, dtype=np.float32)
    t = -np.asarray(center, np.float32)
    s._next_node = node_id + 1
    s._hook_task_impl(
        node_id, None, None, None, None, R, t,
        node_id * 3, 100, -(10**9),
    )


def _line(s, n, cand_at=None, cand=None):
    """n nodes along +x at 1 m spacing; optionally inject a loop
    candidate when inserting node `cand_at`."""
    for k in range(n):
        _push(s, k, [float(k), 0.0, 0.0],
              cand=cand if k == cand_at else None)


def test_join_flushes_pending_solve(slam):
    s = slam
    # Block the event throttle so the loop edge stays pending.
    s.loop_params.min_event_gap_kf = 100
    s._last_event_node = 0
    # Consistent candidate: measured T_cur o T_cand^-1 equals what raw
    # odometry says for node 5 vs node 0 (centers [5,0,0] vs [0,0,0]:
    # t_rel = -(c_cur - c_cand) with R = I).
    cand = LoopCandidate(
        db_index=0, matches=50, inliers=60,
        R_rel=np.eye(3, dtype=np.float32),
        t_rel=np.asarray([-5.0, 0.0, 0.0], np.float32),
    )
    _line(s, 6, cand_at=5, cand=cand)
    assert s._pg_dirty and len(s._pending_loop_edges) == 1
    assert len(s.pg_edges) == 6           # 5 sequential + 1 loop
    # The throttle blocked the solve; join() must flush it.
    s.join()
    assert not s._pg_dirty
    assert s._pending_loop_edges == []    # accepted => made permanent
    assert len(s.loops) == 1
    assert len(s.pg_edges) == 6
    # Solved estimates stay close to the (consistent) odometry.
    assert np.linalg.norm(s.pg_t[5] - (-np.asarray([5, 0, 0]))) < 0.2


def test_rejected_solve_rolls_back_all_pending_edges(slam):
    s = slam
    s.loop_params.min_event_gap_kf = 100
    s.loop_params.max_correction_m = 0.05
    s._last_event_node = 0
    # Two ALIASED candidates: each claims the current node sits AT
    # node 0 while odometry places it meters away.
    alias = LoopCandidate(
        db_index=0, matches=50, inliers=90,
        R_rel=np.eye(3, dtype=np.float32),
        t_rel=np.zeros(3, np.float32),
    )
    for k in range(6):
        _push(s, k, [float(k), 0.0, 0.0],
              cand=alias if k in (4, 5) else None)
    assert len(s._pending_loop_edges) == 2
    n_seq = 5
    assert len(s.pg_edges) == n_seq + 2
    s.join()   # flush -> solve diverges beyond the ceiling -> reject
    assert s._pending_loop_edges == [] and s._pending_loops == []
    assert len(s.pg_edges) == n_seq       # BOTH loop edges dropped
    assert s.loops == []
    assert s._last_event_node < 0         # throttle clock rewound
    # Odometry estimates survive untouched.
    for k in range(6):
        assert np.allclose(s.pg_t[k], -np.asarray([k, 0, 0]), atol=1e-5)


def test_hook_failure_appends_placeholder_node(slam):
    s = slam
    real_impl = s._hook_task_impl

    def boom(*a, **k):
        raise RuntimeError("synthetic device error")

    s._hook_task_impl = boom
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    s._next_node = 1
    s._hook_task(0, None, None, None, None, R, t, 0, 100, -(10**9))
    assert len(s.hook_errors) == 1
    assert len(s.pg_raw_R) == len(s.pg_R) == len(s.pg_frame) == 1
    # Node ids stay dense: the next (healthy) hook keys off node 1.
    s._hook_task_impl = real_impl
    _push(s, 1, [1.0, 0.0, 0.0])
    assert len(s.pg_raw_R) == 2
    assert len(s.pg_edges) == 1           # sequential edge 0 -> 1


def test_rejected_midtrajectory_alias_despite_calm_newest_node(slam):
    """A diverged solve whose damage concentrates MID-trajectory must be
    rejected even when the newest node barely moves (VERDICT r4 weak #8:
    the r4 gate checked only the newest node). Construction: a long
    out-and-back line whose endpoints coincide, with an aliased edge
    binding the MIDPOINT (the far end of the line) to node 0 — the
    consistent ends pin the newest node while the middle collapses."""
    s = slam
    s.loop_params.min_event_gap_kf = 100
    s.loop_params.max_correction_m = 0.5
    s._last_event_node = 0
    n = 13          # out to x=6 at node 6, back to x=0 at node 12
    centers = [min(k, (n - 1) - k) * 1.0 for k in range(n)]
    # Aliased edge: claims node 6 (at x=6) sits AT node 0 (x=0).
    alias = LoopCandidate(
        db_index=0, matches=50, inliers=90,
        R_rel=np.eye(3, dtype=np.float32),
        t_rel=np.zeros(3, np.float32),
    )
    # Consistent edge closing the real end-to-end loop (node 12 at
    # x=0 == node 0): keeps the newest node pinned near its init.
    consistent = LoopCandidate(
        db_index=0, matches=50, inliers=90,
        R_rel=np.eye(3, dtype=np.float32),
        t_rel=np.zeros(3, np.float32),
    )
    for k in range(n):
        cand = alias if k == 6 else (consistent if k == n - 1 else None)
        _push(s, k, [centers[k], 0.0, 0.0], cand=cand)
    assert len(s._pending_loop_edges) == 2
    edges_snapshot = list(s.pg_edges)
    R_init = [r.copy() for r in s.pg_R]
    t_init = [t.copy() for t in s.pg_t]
    s.join()
    # Prove the scenario discriminates: solving the rejected graph moves
    # the NEWEST node less than the ceiling (the r4 gate would have
    # accepted) while some mid-trajectory node blows past it.
    from viso_tpu.backend import pose_graph

    out, _ = pose_graph.solve_padded(
        R_init, t_init, edges_snapshot, pose_graph.PGParams(iters=25)
    )
    R_sol = np.asarray(out.R)[:n]
    t_sol = np.asarray(out.t)[:n]
    c_init = -np.einsum("nji,nj->ni", np.stack(R_init), np.stack(t_init))
    c_sol = -np.einsum("nji,nj->ni", R_sol, t_sol)
    jumps = np.linalg.norm(c_sol - c_init, axis=-1)
    assert jumps[-1] <= s.loop_params.max_correction_m, jumps
    assert jumps.max() > s.loop_params.max_correction_m, jumps
    # The solve is torn between odometry (midpoint at x=6) and the alias
    # (midpoint at x=0): mid-trajectory nodes move way beyond the 0.5 m
    # ceiling while the newest node stays near x=0. The widened gate
    # must reject and roll back ALL pending edges.
    assert s._pending_loop_edges == [] and s.loops == []
    assert len(s.pg_edges) == n - 1       # both loop edges dropped
    for k in range(n):
        assert np.allclose(
            s.pg_t[k], -np.asarray([centers[k], 0, 0]), atol=1e-5
        )


def test_mono_sim3_rejects_absurd_scale_edge():
    s = MonoSLAM(_tiny_cfg(), _tiny_params())
    s.loop_db.add = lambda *a, **k: None
    try:
        s.loop_params.min_event_gap_kf = 100
        s._last_event_node = 0
        # Scale-carrying loop edge claiming a 50x relative scale: the
        # solve-health scale gate must reject and roll it back.
        cand = LoopCandidate(
            db_index=0, matches=50, inliers=90,
            R_rel=np.eye(3, dtype=np.float32),
            t_rel=np.asarray([-5.0, 0.0, 0.0], np.float32),
            s_rel=50.0,
        )
        _line(s, 6, cand_at=5, cand=cand)
        assert len(s._pending_loop_edges) == 1
        s.join()
        assert s._pending_loop_edges == []
        assert len(s.pg_edges) == 5       # loop edge rolled back
        assert s.loops == []
        assert all(abs(sc - 1.0) < 1e-3 for sc in s.pg_s)
    finally:
        s.close()
