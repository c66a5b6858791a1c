"""Generic Pallas field kernels: static-exponent power ladders.

Used for the hot fixed-exponent chains of the verifier — sqrt in G1
decompression ((p+1)/4), Fermat inversions (p-2 / q-2) — which in the XLA
graph are lax.scan ladders paying per-iteration dispatch (~50-100us/mul,
perf_probe). Here one pallas_call runs the whole ladder as a 4-bit fixed-
window walk with the 16-entry power table in a VMEM scratch selected by
dynamic slice (pallas_core.pow_win_loop_tab) from an SMEM digit schedule:
~490 muls for a 381-bit exponent vs 760 for bit-at-a-time square-and-multiply.

Layout: (B, W, L) canonical inputs -> same out; W is a static width axis
(e.g. proof points), processed in `width_chunk`-wide slabs on the grid.
Measured sweep at width 16, batch 1024 (TPU v5e): chunk 8 = 71 ms,
chunk 16 = 76 ms, chunk 4 = 92 ms, chunk 2 = 91 ms — wide slabs spill
vregs, narrow slabs pay per-grid-instance overhead; 8 is the knee.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import FieldSpec
from .pallas_core import KField, pow_win_loop_tab, window_digits

LANES = 128


def make_pow_kernel(spec: FieldSpec, exponent: int, width: int,
                    lanes: int = LANES, interpret: bool = False,
                    width_chunk: int = 8):
    """Build pow(x (B, width, L) Montgomery) -> x^exponent (B, width, L)."""
    kf = KField(spec)
    L = spec.L
    digits = window_digits(exponent)
    wc = min(width_chunk, width)
    n_wt = -(-width // wc)
    width_p = n_wt * wc

    def kernel(consts_ref, dig_ref, x_ref, out_ref, tab_ref):
        F = kf.bind(consts_ref[:, :], unroll_mul=not interpret)
        # canon: consumers are XLA-level canonical-domain code
        out_ref[:, :, :] = F.canon(
            pow_win_loop_tab(F, x_ref[:, :, :], dig_ref, tab_ref)
        )

    def pow_(x):
        B = x.shape[0]
        assert B % lanes == 0 and x.shape[1] == width
        nbt = B // lanes
        if width_p != width:
            # pad with ones (any nonzero works; padded rows are dropped)
            pad = jnp.broadcast_to(
                jnp.asarray(spec.one_mont), (B, width_p - width, L)
            ).astype(jnp.uint32)
            x = jnp.concatenate([x, pad], axis=1)
        xk = jnp.moveaxis(x, 0, -1)  # (width_p, L, B)
        out = pl.pallas_call(
            kernel,
            grid=(nbt, n_wt),
            in_specs=[
                pl.BlockSpec((6, L + 1), lambda b, w: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((wc, L, lanes), lambda b, w: (w, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wc, L, lanes), lambda b, w: (w, 0, b), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((width_p, L, B), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((16, wc, L, lanes), jnp.uint32),  # power table
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(kf.const_args(), digits, xk)
        return jnp.moveaxis(out, -1, 0)[:, :width]

    return pow_
