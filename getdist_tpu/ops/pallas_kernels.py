"""Pallas TPU kernels for the binning hot path.

The XLA one-hot-matmul histogram materializes (block, 256) bf16 one-hot
matrices in HBM: for the 435-pair benchmark that is ~440 GB of traffic and
dominates the pipeline (~1.8 s measured). This kernel builds the one-hots
in VMEM inside the MXU loop, so HBM traffic drops to the index/weight reads
and the kernel runs compute-bound.

Layout notes (Mosaic block constraints): indices are passed transposed as
(N, P) so each sample block is (block, P) with the last dimension equal to
the full array dimension; the pair's two columns are selected in-kernel by
masked lane reduction (P is small). Pair indices arrive via scalar
prefetch; grid is (pairs, sample-blocks) with the (256, 256) accumulator
living in the revisited output block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pair_histograms"]


def _pair_hist_kernel(pair_a_ref, pair_b_ref, ix_ref, w_ref, out_ref):
    block, nparam = ix_ref.shape
    i = pl.program_id(1)
    k = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # select the pair's two index columns by masked reduction over the
    # (small) parameter axis — avoids dynamic lane slicing
    param_lane = jax.lax.broadcasted_iota(jnp.int32, (block, nparam), 1)
    ix_block = ix_ref[...].astype(jnp.int32)
    col_a = jnp.sum(jnp.where(param_lane == pair_a_ref[k], ix_block, 0), axis=1)
    col_b = jnp.sum(jnp.where(param_lane == pair_b_ref[k], ix_block, 0), axis=1)

    # compare -> astype is the Mosaic-friendly one-hot pattern (where() with
    # scalar branches trips an i1 relayout bug); weight multiply is exact
    # since each one-hot element is 0 or 1
    lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
    onehot_a = (col_a[:, None] == lanes).astype(jnp.bfloat16)
    onehot_b = (col_b[:, None] == lanes).astype(jnp.bfloat16)
    weighted_b = onehot_b * w_ref[:, 0].astype(jnp.bfloat16)[:, None]
    out_ref[0] += jax.lax.dot_general(
        weighted_b, onehot_a, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pair_histograms(ix_t, weights, pair_a, pair_b, block=4096, interpret=False):
    """(K, 256, 256) weighted 2D histograms for K parameter pairs.

    ix_t: (N, P) integer fine-bin indices in [0, 256) (samples-major; pass
    uint8 to quarter the index HBM traffic); weights: (N,); pair_a/pair_b:
    (K,) int32 parameter indices. Rows = b, cols = a (matching
    ``_pair_hist_256``). N must be a multiple of ``block`` (pad with
    zero-weight samples).
    """
    n, p = ix_t.shape
    k = pair_a.shape[0]
    assert n % block == 0, "sample count must be a multiple of the block size"
    nblk = n // block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k, nblk),
        in_specs=[
            pl.BlockSpec((block, p), lambda kk, ii, pa, pb: (ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda kk, ii, pa, pb: (ii, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 256, 256), lambda kk, ii, pa, pb: (kk, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _pair_hist_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 256, 256), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 256 * 256 * n * k,
            bytes_accessed=(p * ix_t.dtype.itemsize + 4) * n * k + 4 * 256 * 256 * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pair_a, pair_b, ix_t, weights[:, None])
