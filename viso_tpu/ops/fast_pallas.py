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


def _score_block(img, threshold):
    """FAST score for the interior of a block; zero on the 3-px margin.

    img: (h, w) array already resident in VMEM.
    """
    h, w = img.shape
    ih, iw = h - 6, w - 6
    center = jax.lax.slice(img, (3, 3), (3 + ih, 3 + iw))
    diffs = []
    for dr, dc in _CIRCLE:
        shifted = jax.lax.slice(img, (3 + dr, 3 + dc), (3 + dr + ih, 3 + dc + iw))
        diffs.append(shifted - center)
    brighter = [d > threshold for d in diffs]
    darker = [d < -threshold for d in diffs]
    is_b = jnp.zeros_like(center, dtype=jnp.bool_)
    is_d = jnp.zeros_like(center, dtype=jnp.bool_)
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
    return jnp.pad(score, ((3, 3), (3, 3)))


def _kernel(img_ref, out_ref, *, threshold):
    out_ref[:] = _score_block(img_ref[:], threshold)


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
    """Gridless whole-image kernel fits VMEM and a TPU-family backend."""
    h, w = img_shape
    if h * w * 4 > _VMEM_BYTES_LIMIT:
        return False
    platform = jax.devices()[0].platform
    return platform not in ("cpu", "gpu")
