"""Batched 2D linear convolution as DFT matmuls inside one Pallas kernel.

Why this exists (measured, docs/performance.md): the fused 2D pipeline's
tail is dominated by (435, 320, 320) FFT convolutions. XLA's TPU FFT runs
~20x off a bandwidth-bound estimate (~43-74 ms per batched convolution),
and expressing the DFT as plain XLA einsums only reaches 52 ms because the
(435, 320, 320) complex intermediates round-trip through HBM.  This kernel
keeps the whole per-pair transform chain in VMEM: the only HBM traffic is
the input grid, the kernel spectrum, and the output slice, and the matmuls
run on the MXU.

Math: for pair k with zero-padded grid H and kernel W (both placed at the
origin of a P x P frame), the full linear convolution is

    full = real( B (F H F) o (F W F) B ),   B = conj(F) / P,

with F the symmetric P x P DFT matrix (F[j, l] = exp(-2 pi i j l / P)) --
symmetry means no transposes anywhere.  A complex product of a complex
matrix with a real one costs 2 MXU matmuls; complex x complex costs 4 and
the final real-part-only product costs 2, so one convolution is 12 matmuls
per pair plus a 6-matmul kernel-spectrum pass that is shared across every
convolution that reuses the same kernels (main smoothing, mult-bias
rounds, edge-mask normalizations).

'same'/'valid' output conventions are a slice of the full convolution:
``full[offset : offset + out_size]`` per axis (offset = half_m for 'same'
on an n-grid, 2 * half_m for the reference's padded-extension variants,
matching `_conv2d_same_kf` / the `_mask_conv` slices in ops/batched.py and
the reference semantics of getdist/convolve.py:405 convolveFFTn).

P defaults to 384 = 3 * 128: one MXU-aligned size that covers every frame
in the fused program (fine_bins + 2*winw + 2*winw = 376 worst case), so a
single compiled kernel shape and one shared DFT matrix serve all call
sites.  f32 only; precision of the MXU passes is configurable ("highest"
by default -- the DFT matrix entries are O(1) and the chain is numerically
benign, ~1e-6 relative against the rfft path).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "dft_conv_spectrum",
    "dft_conv2d",
    "dft_conv_spectrum_xla",
    "dft_conv2d_xla",
    "dft_conv2d_ref",
    "DEFAULT_PAD",
]

DEFAULT_PAD = 384

# Hardware finding that motivates this module twice over (measured,
# scripts/probe_xla_fft_batch.py): XLA's TPU *irfftn* silently returns
# ~30% wrong values for batch sizes >= 385 (the forward rfftn is exact at
# every batch size).  The 435-pair fused pipeline sat right on top of that
# cliff, so on TPU the rfft convolution path was both slow (~177 ms for
# the 3-conv tail) AND ~3e-2 wrong.  This kernel is exact at every batch
# size tested (1..512) and ~2-4x faster.

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=4)
def _dft_mats(pad):
    """(Fr, Fi, Br, Bi) numpy f32: symmetric DFT matrix and its inverse/P."""
    j = np.arange(pad)
    ang = -2.0 * np.pi * np.outer(j, j) / pad
    fr = np.cos(ang)
    fi = np.sin(ang)
    return (
        fr.astype(np.float32),
        fi.astype(np.float32),
        (fr / pad).astype(np.float32),
        (-fi / pad).astype(np.float32),
    )


def _mm(a, b, precision):
    """MXU matmul with f32 accumulation.  Mosaic accepts only DEFAULT (one
    bf16 pass, ~8e-3 relative here) and HIGHEST (six passes, f32-exact);
    "split3" emulates the missing HIGH tier with a manual two-term bf16
    split of both operands and three passes (residual lo x lo term ~ eps^2
    ~ 1.5e-5 relative -- the production sweet spot)."""
    if precision == "split3":
        a_hi, a_lo = _bf16_split(a)
        b_hi, b_lo = _bf16_split(b)

        def d(x, y):
            return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_PRECISIONS[precision], preferred_element_type=jnp.float32
    )


def _spec_kernel(precision):
    def kernel(fr_ref, fi_ref, kp_ref, ur_ref, ui_ref):
        fr = fr_ref[...]
        fi = fi_ref[...]
        kp = kp_ref[0]
        tr = _mm(fr, kp, precision)
        ti = _mm(fi, kp, precision)
        ur_ref[0] = _mm(tr, fr, precision) - _mm(ti, fi, precision)
        ui_ref[0] = _mm(tr, fi, precision) + _mm(ti, fr, precision)

    return kernel


def _conv_kernel(precision):
    # padding of the input frame and the output-convention slice both live
    # on the XLA side: unaligned in-kernel pad/slice ops are exactly the
    # Mosaic relayout territory this repo's kernels avoid (see
    # ops/pallas_kernels.py design notes)
    def kernel(fr_ref, fi_ref, br_ref, bi_ref, g_ref, ur_ref, ui_ref, out_ref):
        fr = fr_ref[...]
        fi = fi_ref[...]
        gp = g_ref[0]
        # forward transform of the (real) grid: U_h = F gp F
        tr = _mm(fr, gp, precision)
        ti = _mm(fi, gp, precision)
        uhr = _mm(tr, fr, precision) - _mm(ti, fi, precision)
        uhi = _mm(tr, fi, precision) + _mm(ti, fr, precision)
        # spectral product with the precomputed kernel spectrum
        er = uhr * ur_ref[0] - uhi * ui_ref[0]
        ei = uhr * ui_ref[0] + uhi * ur_ref[0]
        # inverse transform, real part only: out = Re(B E B)
        br = br_ref[...]
        bi = bi_ref[...]
        t2r = _mm(br, er, precision) - _mm(bi, ei, precision)
        t2i = _mm(br, ei, precision) + _mm(bi, er, precision)
        out_ref[0] = _mm(t2r, br, precision) - _mm(t2i, bi, precision)

    return kernel


@functools.partial(jax.jit, static_argnames=("pad", "precision", "interpret"))
def dft_conv_spectrum(kernels, pad=DEFAULT_PAD, precision="highest", interpret=False):
    """Per-pair kernel spectra (ur, ui), each (K, pad, pad) f32.

    kernels: (K, m, m) f32, kernel origin at element [0, 0] of the padded
    frame (i.e. pass the window as-is; the conv offset handles centering).
    """
    k, m, _ = kernels.shape
    fr, fi, _, _ = _dft_mats(pad)
    kp = jnp.pad(kernels.astype(jnp.float32), ((0, 0), (0, pad - m), (0, pad - m)))
    ur, ui = pl.pallas_call(
        _spec_kernel(precision),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, pad, pad), jnp.float32),
            jax.ShapeDtypeStruct((k, pad, pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * pad**3 * k, bytes_accessed=4 * (3 * pad * pad * k + 2 * pad * pad), transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(fr), jnp.asarray(fi), kp)
    return ur, ui


@functools.partial(jax.jit, static_argnames=("out_size", "offset", "pad", "precision", "interpret"))
def dft_conv2d(grids, ur, ui, out_size, offset, pad=DEFAULT_PAD, precision="highest", interpret=False):
    """Batched linear convolution against precomputed kernel spectra.

    grids: (K, I, I) f32 with I + m - 1 <= pad; returns the
    (K, out_size, out_size) slice ``full[offset : offset + out_size]``
    of each full convolution.
    """
    k, in_size, _ = grids.shape
    assert offset + out_size <= pad
    fr, fi, br, bi = _dft_mats(pad)
    gp = jnp.pad(grids.astype(jnp.float32), ((0, 0), (0, pad - in_size), (0, pad - in_size)))
    full = pl.pallas_call(
        _conv_kernel(precision),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pad, pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, pad, pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * 2 * pad**3 * k,
            bytes_accessed=4 * (4 * pad * pad * k + 4 * pad * pad),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(fr), jnp.asarray(fi), jnp.asarray(br), jnp.asarray(bi), gp, ur, ui)
    return jax.lax.slice(full, (0, offset, offset), (k, offset + out_size, offset + out_size))


def _dft_mats_f64(pad, precision):
    """DFT matrices at the precision the XLA twins run: full f64 entries
    for the "f64" chain (the f32-rounded defaults would cap its accuracy),
    the shared f32 ones otherwise."""
    if precision != "f64":
        return _dft_mats(pad)
    j = np.arange(pad)
    ang = -2.0 * np.pi * np.outer(j, j) / pad
    fr = np.cos(ang)
    fi = np.sin(ang)
    return fr, fi, fr / pad, -fi / pad


def _xla_prec(precision):
    return _PRECISIONS["highest" if precision in ("split3", "f64") else precision]


def _xla_lmm(m, x, precision):
    # (pad, pad) x (K, pad, pad) with explicit MXU precision
    return jnp.einsum("ij,kjl->kil", m, x, precision=_xla_prec(precision))


def _xla_rmm(x, m, precision):
    # (K, pad, pad) x (pad, pad)
    return jnp.einsum("kij,jl->kil", x, m, precision=_xla_prec(precision))


def _xla_dtype(precision, fallback=jnp.float32):
    # "f64": the whole transform chain runs in f64 — XLA:TPU emulates f64
    # matmuls at only ~3.5x the f32 cost and 3e-15 accuracy (measured,
    # docs/performance.md round 4). The f32 DFT-matmul floor is ~1e-5 of
    # the grid peak on sharp shapes (spectrum magnitudes ~ total mass);
    # f64 chains reach the host parity pipeline's own precision.
    return jnp.float64 if precision == "f64" else fallback


# the XLA twins hold ~10 live (K, pad, pad) intermediates; at parity-bench
# scale in f64 that is tens of GB, so the batch axis is processed in fixed
# chunks (67 MB per f64 array at pad 512) via lax.map
_XLA_CHUNK = 32


def _chunked_over_batch(fn, x, chunk=_XLA_CHUNK):
    k = x.shape[0]
    if k <= chunk:
        return fn(x)
    n_pad = (-k) % chunk
    xp = jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1))
    blocks = xp.reshape((xp.shape[0] // chunk, chunk) + xp.shape[1:])
    out = jax.lax.map(fn, blocks)
    return out.reshape((-1,) + out.shape[2:])[:k]


@functools.partial(jax.jit, static_argnames=("pad", "precision"))
def dft_conv_spectrum_xla(kernels, pad=DEFAULT_PAD, precision="highest"):
    """Plain-XLA twin of :func:`dft_conv_spectrum` for frame sizes the
    Pallas kernel's Mosaic toolchain refuses (measured: pad=512 fails with
    'failed to legalize operation func.return'). Same math as batched
    einsums; the complex intermediates round-trip HBM, so it is slower,
    but any MXU-aligned pad compiles. split3 maps to HIGHEST (this path
    exists for the parity mode, which needs f32-exact products anyway)."""
    k, m, _ = kernels.shape
    dt = _xla_dtype(precision)
    fr, fi, _, _ = (jnp.asarray(a, dt) for a in _dft_mats_f64(pad, precision))

    def spec_chunk(kp):
        tr = _xla_lmm(fr, kp, precision)
        ti = _xla_lmm(fi, kp, precision)
        ur = _xla_rmm(tr, fr, precision) - _xla_rmm(ti, fi, precision)
        ui = _xla_rmm(tr, fi, precision) + _xla_rmm(ti, fr, precision)
        return jnp.stack([ur, ui], axis=1)

    kp = jnp.pad(kernels.astype(dt), ((0, 0), (0, pad - m), (0, pad - m)))
    out = _chunked_over_batch(spec_chunk, kp)
    return out[:, 0], out[:, 1]


@functools.partial(jax.jit, static_argnames=("out_size", "offset", "pad", "precision"))
def dft_conv2d_xla(grids, ur, ui, out_size, offset, pad=DEFAULT_PAD, precision="highest"):
    """Plain-XLA twin of :func:`dft_conv2d` (see
    :func:`dft_conv_spectrum_xla`)."""
    k, in_size, _ = grids.shape
    dt = _xla_dtype(precision)
    fr, fi, br, bi = (jnp.asarray(a, dt) for a in _dft_mats_f64(pad, precision))

    def conv_chunk(args):
        gp, ur_c, ui_c = args
        tr = _xla_lmm(fr, gp, precision)
        ti = _xla_lmm(fi, gp, precision)
        uhr = _xla_rmm(tr, fr, precision) - _xla_rmm(ti, fi, precision)
        uhi = _xla_rmm(tr, fi, precision) + _xla_rmm(ti, fr, precision)
        er = uhr * ur_c - uhi * ui_c
        ei = uhr * ui_c + uhi * ur_c
        t2r = _xla_lmm(br, er, precision) - _xla_lmm(bi, ei, precision)
        t2i = _xla_lmm(br, ei, precision) + _xla_lmm(bi, er, precision)
        out = _xla_rmm(t2r, br, precision) - _xla_rmm(t2i, bi, precision)
        return out[:, offset : offset + out_size, offset : offset + out_size]

    gp = jnp.pad(grids.astype(dt), ((0, 0), (0, pad - in_size), (0, pad - in_size)))
    if k <= _XLA_CHUNK:
        return conv_chunk((gp, ur.astype(dt), ui.astype(dt))).astype(grids.dtype)
    n_pad = (-k) % _XLA_CHUNK
    stacked = [jnp.pad(a, ((0, n_pad), (0, 0), (0, 0))) for a in (gp, ur.astype(dt), ui.astype(dt))]
    blocks = [a.reshape((-1, _XLA_CHUNK) + a.shape[1:]) for a in stacked]
    out = jax.lax.map(conv_chunk, tuple(blocks))
    return out.reshape((-1,) + out.shape[2:])[:k].astype(grids.dtype)


def dft_conv2d_ref(grids, kernels, out_size, offset, pad=DEFAULT_PAD):
    """Pure-jnp twin of spectrum+conv (einsum DFTs) for unit tests."""
    k, m, _ = kernels.shape
    fr, fi, br, bi = (jnp.asarray(a) for a in _dft_mats(pad))
    f = fr + 1j * fi
    b = br + 1j * bi
    kp = jnp.pad(kernels.astype(jnp.complex64), ((0, 0), (0, pad - m), (0, pad - m)))
    gp = jnp.pad(
        grids.astype(jnp.complex64),
        ((0, 0), (0, pad - grids.shape[1]), (0, pad - grids.shape[2])),
    )
    kf = jnp.einsum("ij,kjl,lm->kim", f, kp, f)
    gf = jnp.einsum("ij,kjl,lm->kim", f, gp, f)
    full = jnp.einsum("ij,kjl,lm->kim", b, gf * kf, b).real
    return full[:, offset : offset + out_size, offset : offset + out_size]
