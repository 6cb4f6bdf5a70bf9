#!/usr/bin/env python
"""Probe: XLA TPU irfftn silently corrupts outputs at batch >= 385.

Found 2026-08-17 while validating the Pallas DFT-matmul convolution
(ops/dft_conv.py): the forward rfftn is bit-exact at every batch size,
but irfftn of the same spectra returns ~30% wrong values once the batch
dimension exceeds 384 — with no warning or error.  The 435-pair fused
KDE pipeline sat exactly on this cliff, so every TPU convolution it ran
through jnp.fft.irfftn was ~3e-2 wrong relative to peak.

Run on a real chip.  Expected output: batch<=384 exact, batch>=385 broken.
"""

import numpy as np

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    size = 320
    for batch in (256, 384, 385, 400, 435, 512):
        g = jnp.asarray(rng.rand(batch, size, size).astype(np.float32))
        idx = batch - 1

        @jax.jit
        def roundtrip(x):
            return jnp.fft.irfftn(jnp.fft.rfftn(x, (size, size), axes=(1, 2)), (size, size), axes=(1, 2))

        full = roundtrip(g)
        single = roundtrip(g[idx : idx + 1])
        fwd_b = jax.jit(lambda x: jnp.fft.rfftn(x, (size, size), axes=(1, 2)))(g)
        fwd_1 = jax.jit(lambda x: jnp.fft.rfftn(x, (size, size), axes=(1, 2)))(g[idx : idx + 1])
        fe = float(jnp.max(jnp.abs(fwd_b[idx] - fwd_1[0]))) / float(jnp.max(jnp.abs(fwd_1)))
        ie = float(jnp.max(jnp.abs(full[idx] - single[0]))) / float(jnp.max(jnp.abs(single)))
        re = float(jnp.max(jnp.abs(full[idx] - g[idx])))
        print(f"batch {batch}: rfftn err {fe:.2e}  irfftn-vs-single err {ie:.2e}  roundtrip-vs-input err {re:.2e}", flush=True)


if __name__ == "__main__":
    main()
