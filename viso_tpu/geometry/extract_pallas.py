"""Pallas DMA window extraction — the TPU fast path for patch windows.

`sampling.extract_windows` (vmap of `dynamic_slice`) lowers to an XLA
gather that costs ~2.5-4 ms for 1024-2048 windows on v5e regardless of
window size — bound by the gather unit, not bandwidth — and it is the
dominant cost of the tracking front-end. This module replaces it with a
Pallas kernel issuing ONE 2-D DMA per feature.

Mosaic constraints shape the design (measured on v5e):
  * DMA slice offsets and shapes in the sublane (row) dim must be
    multiples of 8; in the lane (col) dim, multiples of 128.
  * So each feature copies an aligned (R, C) tile whose origin is the
    requested window origin rounded down to (8, 128) alignment, with
    R >= h+7 and C >= w+127 rounding up — coverage at any offset.
  * The image is padded on-device to (mult-of-8, mult-of-128) >= (R, C)
    first (~5 us for a full KITTI frame) vs the gather's milliseconds.

The hat-weight samplers (`sampling.sample_patch_grid*`) take the window
origin explicitly and support rectangular windows, so downstream code is
agnostic to the over-copy; bigger windows only ADD clamp margin.

Measured: 1024 16x16 windows from a 376x1240 f32 image as (24, 256)
tiles: 0.94 ms vs 2.6-4.1 ms for the gather path.

Replaces the per-patch scalar reads of the reference's hot loops
(`/root/reference/src/viso.cpp:269-349`, `viso.cpp:688-731`) at the
memory-system level: one DMA per feature instead of P*P*4 scalar loads.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


def use_pallas() -> bool:
    flag = os.environ.get("VISO_TPU_DMA_EXTRACT", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _rows_for(h: int) -> int:
    return (h + 14) & ~7        # >= h+7, multiple of 8


def _cols_for(w: int) -> int:
    return (w + 254) & ~127     # >= w+127, multiple of 128


# DMA semaphore slots: sflag space is 2 KB total (256 sems) and the
# surrounding machinery needs a few, so cap well below that.
_SEMS = 128


def _kernel(rows, cols, total, indexed, base_ref, img_ref, out_ref, sems):
    """Single-invocation kernel: issue one HBM->HBM copy per feature,
    recycling _SEMS semaphore slots in a sliding wave. No VMEM staging:
    the DMA engines write the output tiles directly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # base_ref is FLAT 1-D (stride 3): a 2-D (N, 3) scalar operand would
    # be lane-padded to (N, 128) in SMEM — 1 MB at N=2048, the whole
    # SMEM budget.
    def copy(j, slot):
        x0 = pl.multiple_of(base_ref[3 * j], 128)
        y0 = pl.multiple_of(base_ref[3 * j + 1], 8)
        if indexed:
            k = base_ref[3 * j + 2]
            src = img_ref.at[k, pl.ds(y0, rows), pl.ds(x0, cols)]
        else:
            src = img_ref.at[pl.ds(y0, rows), pl.ds(x0, cols)]
        return pltpu.make_async_copy(src, out_ref.at[j], sems.at[slot])

    def issue(j, _):
        slot = jax.lax.rem(j, _SEMS)

        @pl.when(j >= _SEMS)
        def _():
            copy(j - _SEMS, slot).wait()

        copy(j, slot).start()
        return 0

    jax.lax.fori_loop(0, total, issue, 0)

    first = max(0, total - _SEMS)

    def drain(j, _):
        copy(j, jax.lax.rem(j, _SEMS)).wait()
        return 0

    jax.lax.fori_loop(first, total, drain, 0)


def _dma_extract(img, base, h: int, w: int, k=None):
    """Copy an aligned (R, C) tile per feature covering [base, base+(h,w)).

    img (H, W) or (B, H, W) with per-feature image index k (N,).
    base (N, 2) int32 (x0, y0) window origins, assumed in-bounds for
    (h, w) windows. Returns (tiles (N, R, C), aligned_base (N, 2)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    indexed = img.ndim == 3
    H, W = img.shape[-2], img.shape[-1]
    N = base.shape[0]
    rows, cols = _rows_for(h), _cols_for(w)
    Hp = max((H + 7) & ~7, rows)
    Wp = max((W + 127) & ~127, cols)
    if (Hp, Wp) != (H, W):
        pad = ((0, 0),) * (img.ndim - 2) + ((0, Hp - H), (0, Wp - W))
        img = jnp.pad(img, pad)

    bx = jnp.clip(base[:, 0] & ~127, 0, Wp - cols)
    by = jnp.clip(base[:, 1] & ~7, 0, Hp - rows)
    aligned = jnp.stack([bx, by], axis=-1)
    kcol = (
        jnp.zeros(N, jnp.int32) if k is None else k.astype(jnp.int32)
    )
    sbase = jnp.stack([bx, by, kcol], axis=-1).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_SEMS,))],
    )
    out = pl.pallas_call(
        partial(_kernel, rows, cols, N, indexed),
        out_shape=jax.ShapeDtypeStruct((N, rows, cols), img.dtype),
        grid_spec=grid_spec,
    )(sbase, img)
    return out, aligned


def _centered_base(img_hw, centers, win: int):
    H, W = img_hw
    b = jnp.floor(centers).astype(jnp.int32) - win // 2
    return jnp.clip(
        b, jnp.zeros(2, jnp.int32), jnp.array([W - win, H - win], jnp.int32)
    )


def extract_windows_fast(img, centers, win: int):
    """Drop-in upgrade of `sampling.extract_windows`.

    Returns (windows (N, R, C), base (N, 2) int32 (x0, y0)); the window
    covers at least [x0', x0'+win) x [y0', y0'+win) for the origin the
    gather path would choose. On TPU the windows are aligned DMA tiles;
    elsewhere (CPU tests) the exact (win, win) gather windows. Consumers
    must treat the window shape as opaque and use `base` for coordinates.
    """
    from viso_tpu.geometry import sampling

    if use_pallas() and centers.shape[0] >= 64 and win <= 129:
        base = _centered_base(img.shape, centers, win)
        out = _dma_extract(img, base, win, win)
        if out is not None:
            return out
    return sampling.extract_windows(img, centers, win)


def extract_windows_indexed_fast(imgs, k, centers, win: int):
    """Indexed variant over a stacked image set (K, H, W)."""
    from viso_tpu.geometry import sampling

    if use_pallas() and centers.shape[0] >= 64 and win <= 129:
        base = _centered_base(imgs.shape[-2:], centers, win)
        out = _dma_extract(imgs, base, win, win, k=k)
        if out is not None:
            return out
    return sampling.extract_windows_indexed(imgs, k, centers, win)


def extract_rects_fast(img, base, h: int, w: int):
    """Rectangular windows at explicit origins (stereo scanline strips).

    base (N, 2) int32 (x0, y0), in-bounds for (h, w). Returns
    (windows (N, R, C), base' (N, 2)); base' == base on the fallback
    path, tile-aligned on the TPU path.
    """
    if use_pallas() and base.shape[0] >= 64 and w <= 1921:
        out = _dma_extract(img, base, h, w)
        if out is not None:
            return out

    def one(b):
        return jax.lax.dynamic_slice(img, (b[1], b[0]), (h, w))

    return jax.vmap(one)(base), base
