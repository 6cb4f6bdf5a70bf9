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

__all__ = [
    "pair_histograms",
    "group_pairs",
    "pair_histograms_grouped",
    "tile_plan",
    "pair_histograms_tiled",
]


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


# ---------------------------------------------------------------------------
# v6: tile-decomposed pair histograms with HBM-materialized one-hots
# ---------------------------------------------------------------------------
#
# The parameter set is padded to NG groups of G; every pair (a < b) lands in
# exactly one group tile: NG*(NG-1)/2 off-diagonal tiles of G*G pairs plus NG
# diagonal tiles of G*(G-1)/2 pairs. For 30 params with G=6 that is exactly
# 435 dot slots (zero padding waste). The weighted one-hots are materialized
# per sample chunk by a streaming Pallas builder kernel, so the dot kernels
# are pure MXU work while the pipeline overlaps the one-hot HBM reads --
# measured 242 ms vs 441 ms for the in-kernel-build v4 at 30p/1M int8 on
# v5e (per-stage numbers in docs/performance.md).


def tile_plan(n_params, pairs, group=6):
    """Host-side plan: (ng, off tile group-index tables, gather permutation).

    Returns (ng, a_tbl, b_tbl, gather) with gather[k] the flat slot of
    pairs[k] in concat(off.reshape(-1, 256, 256), diag.reshape(-1, ...)).
    """
    ng = -(-n_params // group)
    off_tiles = [(a, b) for a in range(ng) for b in range(a + 1, ng)]
    diag_pairs = [(i, j) for i in range(group) for j in range(i + 1, group)]
    off_index = {t: i for i, t in enumerate(off_tiles)}
    diag_index = {p: i for i, p in enumerate(diag_pairs)}
    n_off = len(off_tiles) * group * group
    gather = np.empty(len(pairs), np.int32)
    for k, (a, b) in enumerate(pairs):
        ga, gb = a // group, b // group
        ia, jb = a % group, b % group
        if ga == gb:
            gather[k] = n_off + ga * len(diag_pairs) + diag_index[(ia, jb)]
        else:
            gather[k] = off_index[(ga, gb)] * group * group + ia * group + jb
    a_tbl = np.array([a for a, _ in off_tiles], np.int32)
    b_tbl = np.array([b for _, b in off_tiles], np.int32)
    return ng, a_tbl, b_tbl, gather


def _tile_builder_kernel(block, n_params, group, oh_dtype):
    def kernel(ix_ref, w_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        for p_ix in range(n_params):
            col = ix_ref[p_ix].astype(jnp.int32)
            match = col[:, None] == lanes
            out_ref[p_ix // group, p_ix % group] = (match.astype(jnp.bfloat16) * wb).astype(oh_dtype)

    return kernel


def _tile_off_kernel(group, oh_dtype, acc_dtype):
    def kernel(wa_ref, wb_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        zero = jnp.zeros((), oh_dtype)
        for ia in range(group):
            ua = (wa_ref[0, ia] != zero).astype(oh_dtype)
            for jb in range(group):
                out_ref[0, ia * group + jb] += jax.lax.dot_general(
                    wb_ref[0, jb], ua, (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
                )

    return kernel


def _tile_diag_kernel(group, oh_dtype, acc_dtype):
    diag_pairs = [(i, j) for i in range(group) for j in range(i + 1, group)]

    def kernel(w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        zero = jnp.zeros((), oh_dtype)
        unweighted = {}
        for slot, (ia, jb) in enumerate(diag_pairs):
            if ia not in unweighted:
                unweighted[ia] = (w_ref[0, ia] != zero).astype(oh_dtype)
            out_ref[0, slot] += jax.lax.dot_general(
                w_ref[0, jb], unweighted[ia], (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_params", "gather", "group", "n_chunks", "block", "build_block", "int8_weights", "interpret"),
)
def pair_histograms_tiled(
    ix_pm,
    weights,
    n_params,
    gather,
    group=6,
    n_chunks=4,
    block=1024,
    build_block=4096,
    int8_weights=False,
    interpret=False,
):
    """Tile-decomposed (K, 256, 256) pair histograms (the v6 kernel).

    ix_pm: (P, N) uint8 fine-bin indices; gather: tuple from
    :func:`tile_plan` mapping pair order to tile slots; weights must be
    integers in [0, 127] when int8_weights (exact int8 MXU path at 2x the
    bf16 rate). N must divide by n_chunks * build_block and
    n_chunks * block.
    """
    p, n = ix_pm.shape
    ng = -(-n_params // group)
    p_pad = ng * group
    ix = jnp.pad(ix_pm, ((0, p_pad - p), (0, 0)))
    nc = n // n_chunks
    oh_dtype = jnp.int8 if int8_weights else jnp.bfloat16
    acc_dtype = jnp.int32 if int8_weights else jnp.float32
    off_tiles = [(a, b) for a in range(ng) for b in range(a + 1, ng)]
    n_diag = group * (group - 1) // 2
    a_tbl = jnp.asarray(np.array([a for a, _ in off_tiles], np.int32))
    b_tbl = jnp.asarray(np.array([b for _, b in off_tiles], np.int32))

    ix_c = ix.reshape(p_pad, n_chunks, nc).transpose(1, 0, 2)
    w_c = weights.reshape(n_chunks, nc).astype(jnp.float32)

    def chunk_body(carry, xs):
        off_acc, diag_acc = carry
        ixk, wk = xs
        W = pl.pallas_call(
            _tile_builder_kernel(build_block, p_pad, group, oh_dtype),
            grid=(nc // build_block,),
            in_specs=[
                pl.BlockSpec((p_pad, build_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((build_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ng, group, build_block, 256), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ng, group, nc, 256), oh_dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(ixk, wk[:, None])

        if off_tiles:
            grid_off = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(len(off_tiles), nc // block),
                in_specs=[
                    pl.BlockSpec(
                        (1, group, block, 256), lambda t, i, at, bt: (at[t], 0, i, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, group, block, 256), lambda t, i, at, bt: (bt[t], 0, i, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, group * group, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM
                ),
            )
            off = pl.pallas_call(
                lambda at, bt, wa, wb, o: _tile_off_kernel(group, oh_dtype, acc_dtype)(wa, wb, o),
                grid_spec=grid_off,
                out_shape=jax.ShapeDtypeStruct((len(off_tiles), group * group, 256, 256), acc_dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=2 * 256 * 256 * nc * len(off_tiles) * group * group,
                    bytes_accessed=2 * group * nc * 256 * len(off_tiles),
                    transcendentals=0,
                ),
                interpret=interpret,
            )(a_tbl, b_tbl, W, W)
        else:
            off = jnp.zeros_like(off_acc)

        diag = pl.pallas_call(
            _tile_diag_kernel(group, oh_dtype, acc_dtype),
            grid=(ng, nc // block),
            in_specs=[
                pl.BlockSpec((1, group, block, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, n_diag, 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ng, n_diag, 256, 256), acc_dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(W)
        return (off_acc + off, diag_acc + diag), None

    off0 = jnp.zeros((len(off_tiles), group * group, 256, 256), acc_dtype)
    diag0 = jnp.zeros((ng, n_diag, 256, 256), acc_dtype)
    (off, diag), _ = jax.lax.scan(chunk_body, (off0, diag0), (ix_c, w_c))
    flat = jnp.concatenate(
        [off.reshape(-1, 256, 256), diag.reshape(-1, 256, 256)], axis=0
    )
    out = jnp.take(flat, jnp.asarray(np.array(gather, np.int32)), axis=0)
    return out.astype(jnp.float32) if int8_weights else out
