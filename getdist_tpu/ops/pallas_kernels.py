"""Pallas TPU kernels for the binning hot path.

The XLA one-hot-matmul histogram materializes (block, 256) bf16 one-hot
matrices in HBM: for the 435-pair benchmark that is ~440 GB of traffic and
dominates the pipeline (~1.8 s measured). This kernel builds the one-hots
in VMEM inside the MXU loop, so HBM traffic drops to the index/weight reads
and the kernel runs compute-bound (~2.7x the XLA variant measured).

Design (measured by per-stage knockouts on v5e):
- pair columns are pre-gathered on the XLA side into (K/G, 2G, N) uint8
  stacks, so the kernel indexes sublanes statically instead of doing a
  masked reduction over the parameter axis per step (-220 ms at K=435,
  N=1M);
- G pairs are processed per grid step (sharing the lane iota, the bf16
  weight column and the index block);
- one-hots are built compare -> astype: jnp.where with scalar or even
  array branches trips Mosaic relayout/compile bugs on this toolchain;
- the weight multiply is exact because one-hot elements are 0/1 and the
  products are accumulated in f32 (preferred_element_type);
- block sizes > 4096 crash the AOT compile helper at full grid sizes
  ("Failed to find host..."), so 4096 is the ceiling here.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pair_histograms", "group_pairs", "pair_histograms_grouped"]


def _make_kernel(group, block):
    def kernel(cols_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        for j in range(group):
            col_a = cols_ref[0, 2 * j].astype(jnp.int32)
            col_b = cols_ref[0, 2 * j + 1].astype(jnp.int32)
            onehot_a = (col_a[:, None] == lanes).astype(jnp.bfloat16)
            weighted_b = (col_b[:, None] == lanes).astype(jnp.bfloat16) * wb
            out_ref[0, j] += jax.lax.dot_general(
                weighted_b, onehot_a, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "group", "interpret"))
def pair_histograms(ix_pm, weights, pair_a, pair_b, block=4096, group=8, interpret=False):
    """(K, 256, 256) weighted 2D histograms for K parameter pairs.

    ix_pm: (P, N) integer fine-bin indices in [0, 256), parameter-major
    (pass uint8 to quarter the index HBM traffic); weights: (N,);
    pair_a/pair_b: (K,) int32 parameter indices. Rows = b, cols = a
    (matching ``_pair_hist_256``). N must be a multiple of ``block`` (pad
    with zero-weight samples). ``group`` pairs are computed per grid step.
    """
    p, n = ix_pm.shape
    k = pair_a.shape[0]
    assert n % block == 0, "sample count must be a multiple of the block size"
    k_pad = (-k) % group
    pa = jnp.pad(pair_a, (0, k_pad))
    pb = jnp.pad(pair_b, (0, k_pad))
    kp = k + k_pad

    # XLA-side pre-gather of each pair's two index rows, interleaved
    # [a0, b0, a1, b1, ...] in groups of `group` pairs
    cols = jnp.stack([jnp.take(ix_pm, pa, axis=0), jnp.take(ix_pm, pb, axis=0)], axis=1)
    cols = cols.reshape(kp // group, 2 * group, n)

    out = pl.pallas_call(
        _make_kernel(group, block),
        grid=(kp // group, n // block),
        in_specs=[
            pl.BlockSpec((1, 2 * group, block), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp // group, group, 256, 256), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 256 * 256 * n * kp,
            bytes_accessed=(2 * ix_pm.dtype.itemsize + 4) * n * kp + 4 * 256 * 256 * kp,
            transcendentals=0,
        ),
        # the default 16MB scoped-vmem compiler limit is conservative (v5e
        # has 128MB VMEM); the unrolled G-pair loop's temporaries need ~20MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cols, weights[:, None])
    return out.reshape(kp, 256, 256)[:k]


def group_pairs(pairs, group=8):
    """Group pairs by their b (row) parameter for the anchored kernel.

    Returns numpy (grp_a (Kg, group), grp_b (Kg,), inv_perm (K,)): each
    group shares one b; short groups are padded with a=b slots that the
    inverse permutation drops. Host-side, for static pair lists.
    """
    from collections import defaultdict

    byb = defaultdict(list)
    for k, (a, b) in enumerate(pairs):
        byb[int(b)].append((int(a), k))
    grp_a, grp_b, orig = [], [], []
    for b, items in sorted(byb.items()):
        for c in range(0, len(items), group):
            chunk = items[c : c + group]
            pad = group - len(chunk)
            grp_b.append(b)
            grp_a.append([a for a, _ in chunk] + [b] * pad)
            orig.append([k for _, k in chunk] + [-1] * pad)
    inv = np.zeros(len(pairs), np.int32)
    for pos, k in enumerate(np.array(orig, np.int32).reshape(-1)):
        if k >= 0:
            inv[k] = pos
    return np.array(grp_a, np.int32), np.array(grp_b, np.int32), inv


def _make_grouped_kernel(group, block, int8_weights=False):
    def kernel(cols_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        col_b = cols_ref[0, group].astype(jnp.int32)
        # one shared weighted b-side one-hot per step (the win over the
        # ungrouped kernel: 1 + G one-hot builds instead of 2G, one weight
        # multiply instead of G)
        if int8_weights:
            # int8 MXU runs at 2x the bf16 rate; int8*int8 elementwise
            # multiply is unsupported in Mosaic, so weight via int32
            w32 = w_ref[:, 0].astype(jnp.int32)[:, None]
            weighted_b = ((col_b[:, None] == lanes).astype(jnp.int32) * w32).astype(jnp.int8)
        else:
            wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
            weighted_b = (col_b[:, None] == lanes).astype(jnp.bfloat16) * wb
        oh_dtype = jnp.int8 if int8_weights else jnp.bfloat16
        acc_dtype = jnp.int32 if int8_weights else jnp.float32
        for j in range(group):
            col_a = cols_ref[0, j].astype(jnp.int32)
            onehot_a = (col_a[:, None] == lanes).astype(oh_dtype)
            out_ref[0, j] += jax.lax.dot_general(
                weighted_b, onehot_a, (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "group", "interpret", "int8_weights"))
def pair_histograms_grouped(
    ix_pm, weights, grp_a, grp_b, inv_perm, block=4096, group=8, interpret=False, int8_weights=False
):
    """b-anchored variant of :func:`pair_histograms`: ~1.4x faster when the
    pair list is known statically (use :func:`group_pairs` host-side).

    ix_pm: (P, N) uint8 fine-bin indices, parameter-major; grp_a (Kg, group),
    grp_b (Kg,), inv_perm (K,) from group_pairs. Returns (K, 256, 256) f32
    in original pair order. N must be a multiple of ``block``.

    int8_weights: when all weights are integers in [0, 127], int8 one-hots
    with int32 accumulation run the dots at 2x the bf16 MXU rate (measured
    517 -> 441 ms at 30p/1M on v5e); exact, callers must guarantee the
    weight range.
    """
    p, n = ix_pm.shape
    assert n % block == 0, "sample count must be a multiple of the block size"
    kg = grp_b.shape[0]
    nrow = 2 * group  # rows: a_0..a_{G-1}, then b replicated to keep 8-row tiling
    rows = jnp.concatenate([grp_a, jnp.broadcast_to(grp_b[:, None], (kg, group))], axis=1)
    cols = jnp.take(ix_pm, rows.reshape(-1), axis=0).reshape(kg, nrow, n)
    w_in = weights.astype(jnp.int8) if int8_weights else weights
    out = pl.pallas_call(
        _make_grouped_kernel(group, block, int8_weights),
        grid=(kg, n // block),
        in_specs=[
            pl.BlockSpec((1, nrow, block), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kg, group, 256, 256), jnp.int32 if int8_weights else jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 256 * 256 * n * kg * group,
            bytes_accessed=(nrow * ix_pm.dtype.itemsize + 4) * n * kg + 4 * group * 256 * 256 * kg,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cols, w_in[:, None])
    out = jnp.take(out.reshape(kg * group, 256, 256), inv_perm, axis=0)
    return out.astype(jnp.float32) if int8_weights else out
