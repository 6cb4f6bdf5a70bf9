"""Weighted histogram (binning) kernels.

The O(N) hot step of every density pipeline (reference ``np.bincount`` at
``mcsamples.py:1554,1827``): scatter-add sample weights into 1024 (1D) or
256^2 (2D) fine bins. On device this is an XLA scatter-add into an
HBM-resident accumulator; under ``shard_map`` each shard computes a partial
histogram that is ``psum``-reduced over the mesh (bins are tiny, so the
collective is cheap — see ``getdist_tpu.parallel``).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["weighted_bincount", "weighted_bincount_2d", "bin_indices_1d"]


@partial(jax.jit, static_argnames=("length",))
def weighted_bincount(indices, weights, length):
    """Sum of weights per bin: scatter-add equivalent of
    ``np.bincount(indices, weights, minlength=length)`` (indices must be
    in range)."""
    return jnp.zeros(length, dtype=weights.dtype).at[indices].add(weights)


@partial(jax.jit, static_argnames=("xsize", "ysize"))
def weighted_bincount_2d(ix, iy, weights, xsize, ysize):
    """2D weighted histogram, returned (ysize, xsize) with y the leading
    axis (reference ``_make2Dhist``, ``mcsamples.py:1724-1728``)."""
    flat = ix + iy * xsize
    return weighted_bincount(flat, weights, xsize * ysize).reshape((ysize, xsize))


@partial(jax.jit, static_argnames=("nbins",))
def bin_indices_1d(values, binmin, fine_width, nbins):
    """Integer fine-bin index per sample: round((v - binmin) / width),
    clipped into range (reference ``_binSamples``, ``mcsamples.py:1486-1498``
    does no clipping because ranges are chosen to cover the samples; we clip
    for safety under f32)."""
    ix = ((values - binmin) / fine_width + 0.5).astype(jnp.int32)
    return jnp.clip(ix, 0, nbins - 1)
