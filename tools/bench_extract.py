"""Micro-benchmark: window extraction strategies on the attached device.

Current production path: vmap(dynamic_slice) -> XLA gather (~2.5 ms for
1024x16x16 on v5e over the tunnel). Candidate: Pallas kernel issuing one
2-D DMA per window with scalar-prefetched bases.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/viso_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viso_tpu.geometry import sampling


def timeit(fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _extract_kernel(rows, win, K, base_ref, img_ref, out_ref, sems):
    i = pl.program_id(0)

    def issue(j, _):
        x0 = base_ref[i * K + j, 0]
        y0 = pl.multiple_of(base_ref[i * K + j, 1], 8)
        pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, rows), pl.ds(x0, win)],
            out_ref.at[j],
            sems.at[j],
        ).start()
        return 0

    jax.lax.fori_loop(0, K, issue, 0)

    def wait(j, _):
        pltpu.make_async_copy(
            img_ref.at[pl.ds(0, rows), pl.ds(0, win)],
            out_ref.at[j],
            sems.at[j],
        ).wait()
        return 0

    jax.lax.fori_loop(0, K, wait, 0)


@partial(jax.jit, static_argnames=("win", "K"))
def extract_windows_pallas(img, centers, win: int, K: int = 128):
    """Mosaic DMA slices need 8-aligned sublane (row) offsets; rows are
    aligned down and the window grows by 8 rows to keep coverage. The
    hat-weight samplers take the (possibly asymmetric) base explicitly,
    so callers are agnostic to the over-copy."""
    H, W = img.shape
    N = centers.shape[0]
    rows = win + 8
    base = jnp.floor(centers).astype(jnp.int32) - win // 2
    base = jnp.clip(
        base, jnp.zeros(2, jnp.int32), jnp.array([W - win, H - rows], jnp.int32)
    )
    base = base.at[:, 1].set(base[:, 1] & ~7)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (K, rows, win), lambda i, base: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    out = pl.pallas_call(
        partial(_extract_kernel, rows, win, K),
        out_shape=jax.ShapeDtypeStruct((N, rows, win), img.dtype),
        grid_spec=grid_spec,
    )(base, img)
    return out, base


def main():
    H, W = 376, 1240
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    for N in (1024, 2048):
        centers = jnp.asarray(
            np.stack([rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], -1),
            jnp.float32,
        )
        for win in (16, 24):
            cur = jax.jit(
                lambda c, w=win: sampling.extract_windows(img, c, w)
            )
            ms_cur = timeit(lambda: cur(centers)) * 1e3
            got_ref, base_ref_v = cur(centers)
            # Value-level oracle: sampled patches must agree regardless of
            # window origin/shape.
            half = win // 4
            vals_ref = sampling.sample_patch_grid(
                got_ref, base_ref_v, centers, half
            )
            best = None
            for K in (64, 128, 256):
                if N % K:
                    continue
                try:
                    f = lambda c, w=win, k=K: extract_windows_pallas(img, c, w, k)
                    got, base_v = f(centers)
                    vals = sampling.sample_patch_grid(got, base_v, centers, half)
                    ok = bool(jnp.max(jnp.abs(vals - vals_ref)) < 1e-3)
                    ms = timeit(lambda: f(centers)) * 1e3
                    print(
                        f"N={N} win={win} K={K}: pallas {ms:6.2f} ms"
                        f" (match={ok})"
                    )
                    if best is None or ms < best:
                        best = ms
                except Exception as e:  # noqa
                    print(f"N={N} win={win} K={K}: FAILED {type(e).__name__}: {e}")
            print(f"N={N} win={win}: current {ms_cur:6.2f} ms, pallas best {best}")


if __name__ == "__main__":
    main()
