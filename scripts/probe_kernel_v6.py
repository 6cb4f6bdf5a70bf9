"""v6 probe: tile-decomposed pair histograms with HBM-materialized one-hots.

Idea: params padded to 32 = 4 groups of 8. Every pair (a<b) lands in exactly
one 8x8 group tile: 6 off-diagonal tiles (64 pairs each) + 4 diagonal tiles
(28 i<j pairs each) = 496 dot slots (vs 544 in the v4 b-anchored kernel).
One-hots are built ONCE per sample chunk by XLA (int8, HBM-resident), so the
Pallas kernels do nothing but MXU dots while the pipeline streams the
one-hot blocks -- the VPU build cost that kept v4 at ~2.4x its int8 floor is
paid once per chunk instead of once per (group, block) step.
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

P_PAD = 32
G = 8  # params per group
NG = P_PAD // G  # 4 groups
OFF_TILES = [(a, b) for a in range(NG) for b in range(a + 1, NG)]  # 6
DIAG_PAIRS = [(i, j) for i in range(G) for j in range(i + 1, G)]  # 28


def _off_kernel(block, acc_dtype):
    def kernel(u_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for ia in range(G):
            ua = u_ref[0, ia]
            for jb in range(G):
                out_ref[0, ia * G + jb] += jax.lax.dot_general(
                    w_ref[0, jb], ua, (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
                )

    return kernel


def _diag_kernel(block, acc_dtype):
    def kernel(u_ref, w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for slot, (ia, jb) in enumerate(DIAG_PAIRS):
            out_ref[0, slot] += jax.lax.dot_general(
                w_ref[0, jb], u_ref[0, ia], (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_chunks", "block", "int8_weights"))
def tile_pair_histograms(ix_pm, weights, n_chunks=8, block=2048, int8_weights=True):
    """(6, 64, 256, 256) + (4, 28, 256, 256) accumulated over sample chunks."""
    p, n = ix_pm.shape
    assert p <= P_PAD
    ix = jnp.pad(ix_pm, ((0, P_PAD - p), (0, 0)))
    nc = n // n_chunks
    oh_dtype = jnp.int8 if int8_weights else jnp.bfloat16
    acc_dtype = jnp.int32 if int8_weights else jnp.float32

    ix_c = ix.reshape(P_PAD, n_chunks, nc).transpose(1, 0, 2)  # (chunks, 32, nc)
    w_c = weights.reshape(n_chunks, nc)

    a_tbl = np.array([a for a, _ in OFF_TILES], np.int32)
    b_tbl = np.array([b for _, b in OFF_TILES], np.int32)

    def chunk_body(carry, xs):
        off_acc, diag_acc = carry
        ixk, wk = xs
        lanes = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 256), 2)
        match = ixk.reshape(P_PAD, nc, 1) == lanes
        U = match.astype(oh_dtype).reshape(NG, G, nc, 256)
        if int8_weights:
            W = jnp.where(match, wk.astype(jnp.int8)[None, :, None], jnp.int8(0)).reshape(NG, G, nc, 256)
        else:
            W = jnp.where(match, wk.astype(jnp.bfloat16)[None, :, None], jnp.bfloat16(0)).reshape(
                NG, G, nc, 256
            )

        grid_off = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(OFF_TILES), nc // block),
            in_specs=[
                pl.BlockSpec((1, G, block, 256), lambda t, i, at, bt: (at[t], 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, block, 256), lambda t, i, at, bt: (bt[t], 0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, G * G, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        )
        off = pl.pallas_call(
            lambda at, bt, u, w, o: _off_kernel(block, acc_dtype)(u, w, o),
            grid_spec=grid_off,
            out_shape=jax.ShapeDtypeStruct((len(OFF_TILES), G * G, 256, 256), acc_dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 256 * 256 * nc * len(OFF_TILES) * G * G,
                bytes_accessed=2 * G * nc * 256 * len(OFF_TILES) + 4 * G * G * 256 * 256 * len(OFF_TILES),
                transcendentals=0,
            ),
        )(jnp.asarray(a_tbl), jnp.asarray(b_tbl), U, W)

        grid_diag = pl.GridSpec(
            grid=(NG, nc // block),
            in_specs=[
                pl.BlockSpec((1, G, block, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, block, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, len(DIAG_PAIRS), 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        )
        diag = pl.pallas_call(
            _diag_kernel(block, acc_dtype),
            grid_spec=grid_diag,
            out_shape=jax.ShapeDtypeStruct((NG, len(DIAG_PAIRS), 256, 256), acc_dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 256 * 256 * nc * NG * len(DIAG_PAIRS),
                bytes_accessed=2 * G * nc * 256 * NG + 4 * len(DIAG_PAIRS) * 256 * 256 * NG,
                transcendentals=0,
            ),
        )(U, W)
        return (off_acc + off, diag_acc + diag), None

    off0 = jnp.zeros((len(OFF_TILES), G * G, 256, 256), acc_dtype)
    diag0 = jnp.zeros((NG, len(DIAG_PAIRS), 256, 256), acc_dtype)
    (off, diag), _ = jax.lax.scan(chunk_body, (off0, diag0), (ix_c, w_c))
    return off, diag


def gather_pairs(off, diag, pairs):
    """(K, 256, 256) in pair order from the tile outputs."""
    off_tile_index = {t: i for i, t in enumerate(OFF_TILES)}
    diag_slot = {p: i for i, p in enumerate(DIAG_PAIRS)}
    out = []
    for a, b in pairs:
        ga, gb = a // G, b // G
        ia, jb = a % G, b % G
        if ga == gb:
            out.append(diag[ga, diag_slot[(ia, jb)]])
        else:
            out.append(off[off_tile_index[(ga, gb)], ia * G + jb])
    return jnp.stack(out)


if __name__ == "__main__":
    from getdist_tpu.ops import pallas_kernels as PK

    rng = np.random.RandomState(0)
    N, P = 1 << 20, 30
    ix = rng.randint(0, 256, (P, N)).astype(np.uint8)
    w_int = rng.randint(1, 5, N)
    ixj = jnp.asarray(ix)
    wj = jnp.asarray(w_int.astype(np.float32))
    pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]

    # correctness vs v4 on a small slice
    ns = 1 << 14
    off, diag = tile_pair_histograms(ixj[:, :ns], wj[:ns], n_chunks=1, block=2048)
    got = gather_pairs(off, diag, pairs[:5]).astype(np.float32)
    ga, gb, inv = PK.group_pairs(pairs)
    ref = PK.pair_histograms_grouped(
        ixj[:, :ns], wj[:ns], jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv), int8_weights=True
    )[:5]
    print("max abs diff vs v4:", float(jnp.max(jnp.abs(got - np.asarray(ref)))))

    for nch, blk in [(8, 2048), (8, 4096), (4, 2048), (16, 2048), (8, 1024)]:
        try:
            o, d = tile_pair_histograms(ixj, wj, n_chunks=nch, block=blk)
            _ = float(jnp.sum(o)) + float(jnp.sum(d))
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                o, d = tile_pair_histograms(ixj, wj, n_chunks=nch, block=blk)
                _ = float(jnp.sum(o[0, 0])) + float(jnp.sum(d[0, 0]))
            print(f"v6 int8 chunks={nch} block={blk}: {(time.perf_counter() - t0) / reps * 1000:.0f} ms", flush=True)
        except Exception as e:
            print(f"v6 chunks={nch} block={blk} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)

    # current v4 baseline
    _ = PK.pair_histograms_grouped(ixj, wj, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv), int8_weights=True)
    t0 = time.perf_counter()
    for _ in range(3):
        r = PK.pair_histograms_grouped(
            ixj, wj, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv), int8_weights=True
        )
        _ = float(jnp.sum(r[0]))
    print(f"v4 int8 baseline: {(time.perf_counter() - t0) / 3 * 1000:.0f} ms")


# ---- v6b: materialize only W; U = min(W, 1) computed in-kernel -------------

def _off_kernel_b(block):
    def kernel(wa_ref, wb_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for ia in range(G):
            ua = (wa_ref[0, ia] != jnp.int8(0)).astype(jnp.int8)
            for jb in range(G):
                out_ref[0, ia * G + jb] += jax.lax.dot_general(
                    wb_ref[0, jb], ua, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )

    return kernel


def _diag_kernel_b(block):
    def kernel(w_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        us = {}
        for slot, (ia, jb) in enumerate(DIAG_PAIRS):
            if ia not in us:
                us[ia] = (w_ref[0, ia] != jnp.int8(0)).astype(jnp.int8)
            out_ref[0, slot] += jax.lax.dot_general(
                w_ref[0, jb], us[ia], (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_chunks", "block", "unroll"))
def tile_pair_histograms_b(ix_pm, weights, n_chunks=8, block=2048, unroll=False):
    p, n = ix_pm.shape
    ix = jnp.pad(ix_pm, ((0, P_PAD - p), (0, 0)))
    nc = n // n_chunks
    ix_c = ix.reshape(P_PAD, n_chunks, nc).transpose(1, 0, 2)
    w_c = weights.reshape(n_chunks, nc)
    a_tbl = jnp.asarray(np.array([a for a, _ in OFF_TILES], np.int32))
    b_tbl = jnp.asarray(np.array([b for _, b in OFF_TILES], np.int32))

    def chunk_body(carry, xs):
        off_acc, diag_acc = carry
        ixk, wk = xs
        lanes = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 256), 2)
        match = ixk.reshape(P_PAD, nc, 1) == lanes
        W = jnp.where(match, wk.astype(jnp.int8)[None, :, None], jnp.int8(0)).reshape(NG, G, nc, 256)

        grid_off = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(len(OFF_TILES), nc // block),
            in_specs=[
                pl.BlockSpec((1, G, block, 256), lambda t, i, at, bt: (at[t], 0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, block, 256), lambda t, i, at, bt: (bt[t], 0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, G * G, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        )
        off = pl.pallas_call(
            lambda at, bt, wa, wb, o: _off_kernel_b(block)(wa, wb, o),
            grid_spec=grid_off,
            out_shape=jax.ShapeDtypeStruct((len(OFF_TILES), G * G, 256, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(a_tbl, b_tbl, W, W)

        diag = pl.pallas_call(
            _diag_kernel_b(block),
            grid=(NG, nc // block),
            in_specs=[pl.BlockSpec((1, G, block, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, len(DIAG_PAIRS), 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NG, len(DIAG_PAIRS), 256, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(W)
        return (off_acc + off, diag_acc + diag), None

    off0 = jnp.zeros((len(OFF_TILES), G * G, 256, 256), jnp.int32)
    diag0 = jnp.zeros((NG, len(DIAG_PAIRS), 256, 256), jnp.int32)
    if unroll:
        acc = (off0, diag0)
        for k in range(n_chunks):
            acc, _ = chunk_body(acc, (ix_c[k], w_c[k]))
        return acc
    (off, diag), _ = jax.lax.scan(chunk_body, (off0, diag0), (ix_c, w_c))
    return off, diag


if __name__ == "__main__" and "--v6b" in sys.argv:
    rng = np.random.RandomState(0)
    N, P = 1 << 20, 30
    ix = rng.randint(0, 256, (P, N)).astype(np.uint8)
    wj = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
    ixj = jnp.asarray(ix)
    pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]
    ns = 1 << 14
    off, diag = tile_pair_histograms_b(ixj[:, :ns], wj[:ns], n_chunks=1, block=2048)
    offr, diagr = tile_pair_histograms(ixj[:, :ns], wj[:ns], n_chunks=1, block=2048)
    print("v6b vs v6 diff:", float(jnp.max(jnp.abs(off - offr))), float(jnp.max(jnp.abs(diag - diagr))))
    import itertools
    for nch, blk, unr in itertools.product((4, 8), (1024, 2048, 4096), (False, True)):
        try:
            o, d = tile_pair_histograms_b(ixj, wj, n_chunks=nch, block=blk, unroll=unr)
            _ = float(jnp.sum(o[0, 0]))
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                o, d = tile_pair_histograms_b(ixj, wj, n_chunks=nch, block=blk, unroll=unr)
                _ = float(jnp.sum(o[0, 0])) + float(jnp.sum(d[0, 0]))
                times.append(time.perf_counter() - t0)
            print(f"v6b chunks={nch} block={blk} unroll={unr}: med {sorted(times)[len(times)//2]*1000:.0f} ms  min {min(times)*1000:.0f} ms", flush=True)
        except Exception as e:
            print(f"v6b chunks={nch} block={blk} unroll={unr} FAILED: {type(e).__name__} {str(e)[:160]}", flush=True)
