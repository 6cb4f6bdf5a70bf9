"""Attribute the 2D bandwidth stage: optimizer vmap, FFT/DCT transforms,
and their DFT-matmul replacements, at production geometry (435, 256, 256).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B
from getdist_tpu.ops.fft import dct


def t(label, f, n=3):
    out = f()
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        s += float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    K, size = 435, 256
    hists = jnp.asarray(np.abs(rng.standard_normal((K, size, size))).astype(np.float32))
    neff = jnp.full((K,), 2.5e5, jnp.float32)
    corr = jnp.asarray(rng.uniform(-0.4, 0.4, K).astype(np.float32))
    do_corr = jnp.ones((K,), bool)
    fb_t = jnp.full((K,), 1e-3, jnp.float32)

    opt = jax.jit(jax.vmap(lambda h, n_, c, d, ft: B._kernel_bandwidth_2d(h, n_, c, d, ft)))
    t("optimizer vmap (no shear)", lambda: opt(hists, neff, corr, do_corr, fb_t))

    power = jnp.asarray(np.abs(rng.standard_normal((K, size, size))).astype(np.float32))
    sel = jnp.asarray((np.arange(K) % 3 == 0))
    opt_sh = jax.jit(
        jax.vmap(lambda h, n_, c, d, ft, p, s: B._kernel_bandwidth_2d(h, n_, c, d, ft, p, s))
    )
    t("optimizer vmap (shear both-branch)", lambda: opt_sh(hists, neff, corr, do_corr, fb_t, power, sel))

    normed = hists / jnp.sum(hists, axis=(1, 2), keepdims=True)

    @jax.jit
    def xla_power(x):
        spec = jnp.fft.fft2(x)
        return (spec * jnp.conj(spec)).real

    t("fft2 power XLA", lambda: xla_power(normed))

    @jax.jit
    def xla_dct2(x):
        return dct(dct(x, axis=1), axis=2)[:, 1:, 1:] ** 2

    t("dct2^2 XLA", lambda: xla_dct2(normed))

    # matmul equivalents
    jj = np.arange(size)
    ang = -2.0 * np.pi * np.outer(jj, jj) / size
    fr = jnp.asarray(np.cos(ang).astype(np.float32))
    fi = jnp.asarray(np.sin(ang).astype(np.float32))
    # DCT-II as matmul: C[k, n] = 2 cos(pi k (2n+1) / (2N))
    cmat = jnp.asarray((2.0 * np.cos(np.pi * np.outer(jj, 2 * jj + 1) / (2 * size))).astype(np.float32))

    @jax.jit
    def mm_power(x):
        p = jax.lax.Precision.HIGHEST
        # Y = F x (complex x real): 2 matmuls; Z = Y F^T = Y F (symmetric): 4
        yr = jnp.einsum("kab,cb->kac", x, fr, precision=p)
        yi = jnp.einsum("kab,cb->kac", x, fi, precision=p)
        zr = jnp.einsum("kac,da->kdc", yr, fr, precision=p) - jnp.einsum("kac,da->kdc", yi, fi, precision=p)
        zi = jnp.einsum("kac,da->kdc", yr, fi, precision=p) + jnp.einsum("kac,da->kdc", yi, fr, precision=p)
        return zr * zr + zi * zi

    out_mm = t("fft2 power matmul f32", lambda: mm_power(normed))
    ref = xla_power(normed)
    print("  max rel err:", float(jnp.max(jnp.abs(out_mm - ref)) / jnp.max(ref)), flush=True)

    @jax.jit
    def mm_dct2(x):
        p = jax.lax.Precision.HIGHEST
        y = jnp.einsum("kab,cb->kac", x, cmat, precision=p)
        z = jnp.einsum("kac,da->kdc", y, cmat, precision=p)
        return z[:, 1:, 1:] ** 2

    out_d = t("dct2^2 matmul f32", lambda: mm_dct2(normed))
    refd = xla_dct2(normed)
    print("  max rel err:", float(jnp.max(jnp.abs(out_d - refd)) / jnp.max(refd)), flush=True)


if __name__ == "__main__":
    main()
