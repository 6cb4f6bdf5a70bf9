"""v7 probe: tile-decomposed pair histograms with IN-KERNEL one-hot builds.

The v6 kernel materializes weighted one-hot stacks in HBM (builder pass +
~5x re-read by the dot kernels); the measured histogram stage sits ~50 ms
above its int8 MXU floor (docs/performance.md). This probe asks whether
building the one-hots inside the dot kernels closes that gap at LARGE
group sizes, where the build redundancy amortizes much better than the v4
kernel's 1+G builds per G dots:

  group=10: 3 off tiles x (20 builds / 100 dots) + 3 diag x (10/45)
  group=15: 1 off tile  x (30 builds / 225 dots) + 2 diag x (15/105)

(v4 was 9 builds / 8 dots -> 441 ms; v6 is 30 builds once + pure-MXU dots
-> 192 ms.) Also times v6 with n_chunks=1 (no scan accumulator rounds).

Run on TPU: python scripts/probe_v7_fused_build.py
Correctness only (CPU, interpret mode): ... --check-only
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from getdist_tpu.ops.pallas_kernels import pair_histograms_tiled, tile_plan  # noqa: E402


def _off_fused_kernel(group, block):
    """Off-diagonal tile: build a-side (unweighted) and b-side (weighted)
    int8 one-hots in VMEM, then the group x group dot slots."""

    def kernel(ixa_ref, ixb_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        w32 = w_ref[:, 0].astype(jnp.int32)[:, None]
        wb = []
        for jb in range(group):
            col = ixb_ref[0, jb].astype(jnp.int32)
            wb.append(((col[:, None] == lanes).astype(jnp.int32) * w32).astype(jnp.int8))
        for ia in range(group):
            col = ixa_ref[0, ia].astype(jnp.int32)
            ua = (col[:, None] == lanes).astype(jnp.int8)
            for jb in range(group):
                out_ref[0, ia * group + jb] += jax.lax.dot_general(
                    wb[jb], ua, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )

    return kernel


def _diag_fused_kernel(group, block):
    diag_pairs = [(i, j) for i in range(group) for j in range(i + 1, group)]

    def kernel(ix_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        w32 = w_ref[:, 0].astype(jnp.int32)[:, None]
        cols, un, wt = {}, {}, {}
        for p in range(group):
            cols[p] = ix_ref[0, p].astype(jnp.int32)
        for slot, (ia, jb) in enumerate(diag_pairs):
            if ia not in un:
                un[ia] = (cols[ia][:, None] == lanes).astype(jnp.int8)
            if jb not in wt:
                wt[jb] = ((cols[jb][:, None] == lanes).astype(jnp.int32) * w32).astype(jnp.int8)
            out_ref[0, slot] += jax.lax.dot_general(
                wt[jb], un[ia], (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_params", "gather", "group", "block", "interpret"))
def pair_histograms_fusedbuild(ix_pm, weights, n_params, gather, group=10, block=1024, interpret=False):
    """(K, 256, 256) int32 pair histograms, one-hots built in-kernel.

    Same tile plan / gather convention as pair_histograms_tiled; weights
    must be integers in [0, 127] (int8 dot path).
    """
    p, n = ix_pm.shape
    ng = -(-n_params // group)
    p_pad = ng * group
    ix = jnp.pad(ix_pm, ((0, p_pad - p), (0, 0))).reshape(ng, group, n)
    w = weights.astype(jnp.float32)[:, None]
    off_tiles = [(a, b) for a in range(ng) for b in range(a + 1, ng)]
    n_diag = group * (group - 1) // 2
    vmem = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    if off_tiles:
        a_tbl = jnp.asarray(np.array([a for a, _ in off_tiles], np.int32))
        b_tbl = jnp.asarray(np.array([b for _, b in off_tiles], np.int32))
        grid_off = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(off_tiles), n // block),
            in_specs=[
                pl.BlockSpec((1, group, block), lambda t, i, at, bt: (at[t], 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, group, block), lambda t, i, at, bt: (bt[t], 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda t, i, at, bt: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, group * group, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        )
        off = pl.pallas_call(
            lambda at, bt, ixa, ixb, w_, o: _off_fused_kernel(group, block)(ixa, ixb, w_, o),
            grid_spec=grid_off,
            out_shape=jax.ShapeDtypeStruct((len(off_tiles), group * group, 256, 256), jnp.int32),
            compiler_params=vmem,
            cost_estimate=pl.CostEstimate(
                flops=2 * 256 * 256 * n * len(off_tiles) * group * group,
                bytes_accessed=(2 * group + 4) * n * len(off_tiles),
                transcendentals=0,
            ),
            interpret=interpret,
        )(a_tbl, b_tbl, ix, ix, w)
        off_flat = off.reshape(-1, 256, 256)
    else:
        off_flat = jnp.zeros((0, 256, 256), jnp.int32)

    diag = pl.pallas_call(
        _diag_fused_kernel(group, block),
        grid=(ng, n // block),
        in_specs=[
            pl.BlockSpec((1, group, block), lambda t, i: (t, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda t, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_diag, 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, n_diag, 256, 256), jnp.int32),
        compiler_params=vmem,
        interpret=interpret,
    )(ix, w)
    flat = jnp.concatenate([off_flat, diag.reshape(-1, 256, 256)], axis=0)
    out = jnp.take(flat, jnp.asarray(np.array(gather, np.int32)), axis=0)
    return out.astype(jnp.float32)


def check(interpret=True, n=4096, p=7, group=3, block=512):
    rng = np.random.RandomState(0)
    ix = rng.randint(0, 256, (p, n)).astype(np.uint8)
    w = rng.randint(1, 5, n).astype(np.float32)
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    ng, _, _, gather = tile_plan(p, pairs, group=group)
    got = np.asarray(
        pair_histograms_fusedbuild(
            jnp.asarray(ix), jnp.asarray(w), p, tuple(gather.tolist()), group=group, block=block,
            interpret=interpret,
        )
    )
    for k, (a, b) in enumerate(pairs):
        want = np.bincount(
            ix[b].astype(np.int64) * 256 + ix[a].astype(np.int64), weights=w, minlength=256 * 256
        ).reshape(256, 256)
        assert np.array_equal(got[k], want), (k, a, b, np.abs(got[k] - want).max())
    print(f"check OK: {len(pairs)} pairs exact (group={group}, interpret={interpret})")


def timeit(label, fn, *a):
    # sync with a device-side scalar reduction: np.asarray of the full
    # (435, 256, 256) output costs seconds of tunnel transfer and swamps
    # the kernel time
    def sync(r):
        return float(jnp.sum(jax.tree_util.tree_leaves(r)[0][-1]))

    s = sync(fn(*a))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*a)
        s += sync(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: med {sorted(ts)[2] * 1000:.0f} ms (sync {s:.0f})", flush=True)


def main():
    if "--check-only" in sys.argv:
        check(interpret=True)
        return
    rng = np.random.RandomState(0)
    n, p = 1 << 20, 30
    ix = jnp.asarray(rng.randint(0, 256, (p, n)).astype(np.uint8))
    w = jnp.asarray(rng.randint(1, 5, n).astype(np.float32))
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]

    for group in (10, 15):
        ng, _, _, gather = tile_plan(p, pairs, group=group)
        timeit(
            f"v7 fused-build group={group}",
            lambda g=tuple(gather.tolist()), gr=group: pair_histograms_fusedbuild(ix, w, p, g, group=gr),
        )

    ng, _, _, gather6 = tile_plan(p, pairs, group=6)
    for nch in (4, 1):
        timeit(
            f"v6 materialized group=6 n_chunks={nch}",
            lambda nc=nch: pair_histograms_tiled(
                ix, w, p, tuple(gather6.tolist()), group=6, n_chunks=nc, int8_weights=True
            ),
        )


if __name__ == "__main__":
    main()
