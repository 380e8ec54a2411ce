"""Pallas TPU kernel for the dense FAST-9/16 corner score.

The XLA formulation (ops/fast.py) builds 16 `jnp.roll` copies of the
image; on TPU those materialize as 16 full-image buffers plus lazy
layout shuffles. This kernel keeps ONE image copy in VMEM and evaluates
the segment test with static sub-slices of it — pure VPU elementwise
work with no extra HBM traffic. A KITTI frame (1240 x 376 x f32 =
1.8 MB) fits VMEM whole, so the kernel runs gridless; larger frames are
processed in row bands with a 3-pixel halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viso_tpu.ops.fast import _CIRCLE, _ARC

_VMEM_BYTES_LIMIT = 8 * 1024 * 1024


def _kernel(img_ref, out_ref, *, threshold):
    """Full-size FAST score with circle pixels fetched via pltpu.roll.

    Rolls are cyclic — the 3-px border is wrap-contaminated — so the
    border is zeroed with an iota mask. No pads/concats (Mosaic rejects
    offset-mismatched concatenates), only elementwise VPU work.
    """
    img = img_ref[:]
    h, w = img.shape
    diffs = []
    for dr, dc in _CIRCLE:
        shifted = pltpu.roll(pltpu.roll(img, (-dr) % h, 0), (-dc) % w, 1)
        diffs.append(shifted - img)
    brighter = [d > threshold for d in diffs]
    darker = [d < -threshold for d in diffs]
    is_b = jnp.zeros_like(img, dtype=jnp.bool_)
    is_d = jnp.zeros_like(img, dtype=jnp.bool_)
    for s in range(16):
        arc_b = brighter[s]
        arc_d = darker[s]
        for k in range(1, _ARC):
            arc_b = arc_b & brighter[(s + k) % 16]
            arc_d = arc_d & darker[(s + k) % 16]
        is_b = is_b | arc_b
        is_d = is_d | arc_d
    v_b = sum(jnp.where(b, d - threshold, 0.0) for b, d in zip(brighter, diffs))
    v_d = sum(jnp.where(dk, -d - threshold, 0.0) for dk, d in zip(darker, diffs))
    score = jnp.maximum(jnp.where(is_b, v_b, 0.0), jnp.where(is_d, v_d, 0.0))
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (rows >= 3) & (rows < h - 3) & (cols >= 3) & (cols < w - 3)
    out_ref[:] = jnp.where(valid, score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold",))
def score_map_pallas(img, threshold: float):
    """Dense FAST score map via one gridless Pallas call (image in VMEM)."""
    img = jnp.asarray(img, jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, threshold=float(threshold)),
        out_shape=jax.ShapeDtypeStruct(img.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img)


def supported(img_shape) -> bool:
    """Gridless whole-image kernel fits VMEM and a TPU-family backend.

    Opt-in via VISO_TPU_PALLAS_FAST=1: the current Mosaic toolchain in
    this environment crashes compiling the 16-way rolled segment test at
    KITTI frame sizes (remote tpu_compile_helper exit 1), and the
    padded-slice XLA formulation is already fused and fast; the kernel is
    kept for toolchains where it compiles.
    """
    import os

    if os.environ.get("VISO_TPU_PALLAS_FAST") != "1":
        return False
    h, w = img_shape
    if h * w * 4 > _VMEM_BYTES_LIMIT:
        return False
    platform = jax.devices()[0].platform
    return platform not in ("cpu", "gpu")
