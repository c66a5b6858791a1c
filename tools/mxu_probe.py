#!/usr/bin/env python
"""Feasibility probe: int8 const-matrix x batch matmul inside a Pallas TPU
kernel (the shape of a Montgomery-reduction-by-constant-N step), plus a
mont_mul A/B if the basic op compiles.

The idea under test: in mont_mul, the reduction half multiplies by the CONST
modulus N — as 8-bit sublimbs that is a (2L8 x L8) constant Toeplitz matrix
times a (L8, B) batch, which the MXU can do in O(10) cycles where the VPU
pays ~L vector ops. Usage: python tools/mxu_probe.py [B]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return np.asarray(x)


def main():
    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dev = jax.devices()[0]
    print(f"device={dev} B={B}", flush=True)

    M, K = 96, 48  # out-columns x in-sublimbs
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 127, (M, K)).astype(np.int8)
    vec = rng.integers(0, 127, (K, B)).astype(np.int8)

    def kernel(mat_ref, vec_ref, out_ref):
        out_ref[:, :] = jax.lax.dot_general(
            mat_ref[:, :], vec_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    fn = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, B), jnp.int32),
    )
    jfn = jax.jit(fn)
    t0 = time.time()
    out = fetch(jfn(mat, vec))
    print(f"int8 dot compile={time.time()-t0:.1f}s", flush=True)
    exp = mat.astype(np.int32) @ vec.astype(np.int32)
    assert np.array_equal(out, exp), "int8 matmul wrong"
    times = []
    for _ in range(3):
        t0 = time.time()
        fetch(jfn(mat, vec))
        times.append(time.time() - t0)
    print(f"int8 dot OK run={min(times)*1e3:.2f} ms", flush=True)

    # chained variant: 200 dependent matmuls — per-op device cost
    def kernel_chain(mat_ref, vec_ref, out_ref):
        m = mat_ref[:, :]

        def body(_i, acc):
            o = jax.lax.dot_general(
                m, acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # fold back to int8 range to keep the chain int8 x int8
            return (o & 0x7F).astype(jnp.int8)[:K, :]

        acc = jax.lax.fori_loop(0, 200, body, vec_ref[:, :])
        out_ref[:, :] = acc.astype(jnp.int32)

    # bf16 variant: 8-bit sublimb values are exact in bf16, products (< 2^16)
    # and 48-term f32 accumulations (< 2^23) stay exact — and bf16 matmul is
    # the MXU's native diet, unlike int8 which may lower to VPU loops
    def kernel_chain_bf16(mat_ref, vec_ref, out_ref):
        m = mat_ref[:, :].astype(jnp.bfloat16)

        def body(_i, acc):
            o = jax.lax.dot_general(
                m, acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oi = o.astype(jnp.int32)
            return (oi & 0x7F).astype(jnp.bfloat16)[:K, :]

        acc = jax.lax.fori_loop(0, 200, body, vec_ref[:, :].astype(jnp.bfloat16))
        out_ref[:, :] = acc.astype(jnp.int32)

    fn2 = pl.pallas_call(
        kernel_chain,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B), jnp.int32),
    )
    jfn2 = jax.jit(fn2)
    t0 = time.time()
    fetch(jfn2(mat, vec))
    print(f"chain compile={time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        fetch(jfn2(mat, vec))
        times.append(time.time() - t0)
    print(f"200-chain int8 run={min(times)*1e3:.2f} ms -> {min(times)*1e6/200:.2f} us/matmul", flush=True)

    fn3 = pl.pallas_call(
        kernel_chain_bf16,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B), jnp.int32),
    )
    jfn3 = jax.jit(fn3)
    t0 = time.time()
    fetch(jfn3(mat, vec))
    print(f"bf16 chain compile={time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        fetch(jfn3(mat, vec))
        times.append(time.time() - t0)
    print(f"200-chain bf16 run={min(times)*1e3:.2f} ms -> {min(times)*1e6/200:.2f} us/matmul", flush=True)


if __name__ == "__main__":
    main()
