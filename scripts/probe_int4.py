"""Does the v5e MXU run int4 x int4 -> int32 matmuls at better than the
int8 rate?  Times a big dot in int8 vs int4 (XLA and Pallas)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

M = N = 2048
K = 1 << 17  # 131072
REPS = 8
OPS = 2 * M * N * K * REPS


def t(label, f):
    out = f()
    s = float(jnp.sum(out[:2, :2]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        s += float(jnp.sum(out[:2, :2]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.1f} ms -> {OPS / best / 1e12:.0f} TOPS", flush=True)


def main():
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(0, 5, (M, K)).astype(np.int8))
    b8 = jnp.asarray(rng.randint(0, 2, (K, N)).astype(np.int8))

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def run8(a, b):
        def body(acc, _):
            return acc + dot(a, b), None

        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.int32), None, length=REPS)
        return acc

    t("XLA int8", lambda: run8(a8, b8))

    a4 = a8.astype(jnp.int4)
    b4 = b8.astype(jnp.int4)

    @jax.jit
    def run4(a, b):
        def body(acc, _):
            return acc + dot(a, b), None

        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.int32), None, length=REPS)
        return acc

    try:
        t("XLA int4", lambda: run4(a4, b4))
    except Exception as e:
        print("XLA int4 failed:", repr(e)[:300], flush=True)

    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    @jax.jit
    def runbf(a, b):
        def body(acc, _):
            return acc + jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ), None

        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32), None, length=REPS)
        return acc

    t("XLA bf16", lambda: runbf(abf, bbf))

    # Pallas int4 dot (the actual deployment shape: block-deep contractions)
    def pk(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            a_ref[...].T, b_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    for name, aa, bb in (("int8", a8, b8), ("int4", a4, b4)):
        blk = 2048
        f = jax.jit(
            lambda a, b: pl.pallas_call(
                pk,
                grid=(K // blk,),
                in_specs=[
                    pl.BlockSpec((M, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((blk, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            )(a, b)
        )
        try:
            out = f(aa, bb)
            s = float(jnp.sum(out[:2, :2]))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(aa, bb)
                s += float(jnp.sum(out[:2, :2]))
                best = min(best, time.perf_counter() - t0)
            ops = 2 * M * N * K
            print(f"Pallas {name}: {best * 1000:.1f} ms -> {ops / best / 1e12:.0f} TOPS", flush=True)
        except Exception as e:
            print(f"Pallas {name} failed:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
