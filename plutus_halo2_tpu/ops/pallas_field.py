"""Generic Pallas field kernels: static-exponent power ladders.

Used for the hot fixed-exponent chains of the verifier — sqrt in G1
decompression ((p+1)/4), Fermat inversions (p-2 / q-2) — which in the XLA
graph are lax.scan ladders paying per-iteration dispatch (~50-100us/mul,
perf_probe). Here one pallas_call runs the whole ladder as a 4-bit fixed-
window walk (pallas_core.pow_win_loop) from an SMEM digit schedule: ~490
muls for a 381-bit exponent vs 760 for bit-at-a-time square-and-multiply.
Layout: (B, W, L) canonical inputs -> same out; W is a static width axis
(e.g. proof points) folded into sublanes."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import FieldSpec
from .pallas_core import KField, pow_win_loop, window_digits

LANES = 128


def make_pow_kernel(spec: FieldSpec, exponent: int, width: int,
                    lanes: int = LANES, interpret: bool = False):
    """Build pow(x (B, width, L) Montgomery) -> x^exponent (B, width, L)."""
    kf = KField(spec)
    L = spec.L
    digits = window_digits(exponent)

    def kernel(consts_ref, dig_ref, x_ref, out_ref):
        F = kf.bind(consts_ref[:, :], unroll_mul=not interpret)
        # canon: consumers are XLA-level canonical-domain code
        out_ref[:, :, :] = F.canon(pow_win_loop(F, x_ref[:, :, :], dig_ref))

    def pow_(x):
        B = x.shape[0]
        assert B % lanes == 0 and x.shape[1] == width
        nbt = B // lanes
        xk = jnp.moveaxis(x, 0, -1)  # (width, L, B)
        out = pl.pallas_call(
            kernel,
            grid=(nbt,),
            in_specs=[
                pl.BlockSpec((6, L + 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((width, L, lanes), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((width, L, lanes), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((width, L, B), jnp.uint32),
            interpret=interpret,
        )(kf.const_args(), digits, xk)
        return jnp.moveaxis(out, -1, 0)

    return pow_
