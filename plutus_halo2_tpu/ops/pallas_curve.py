"""Pallas TPU kernels for batched G1 arithmetic: windowed MSM.

Replaces ops/curve.msm's XLA graph on the hot path. The XLA version is
latency-bound: every field mul is a separate fori_loop/while dispatch
(~50-100us regardless of batch, perf_probe). Here the whole MSM runs inside
one pallas_call per (batch-tile, point-chunk): the CIOS limb loop is
straight-line Mosaic vector code, the window table lives in VMEM, and the
batch rides the 128-wide lane axis.

Decomposition: grid (batch_tiles, point_chunks). Each instance computes the
full 64-window double-and-add for its <=8 points jointly: one shared
accumulator, per-window one-hot table selects and a halving tree over the
chunk. Chunk partials are tree-added by a tiny XLA epilogue. Point identity /
exceptional cases are safe: complete RCB15 formulas, same as ops/curve.py.

Layout: points (..., 3, L, B), scalars (..., L_fr, B) — see ops/pallas_core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import FP_SPEC, FR_SPEC
from .pallas_core import KField, kfp

LANES = 128
CHUNK = 8  # points per kernel instance (VMEM: table 16*CHUNK*3*L*LANES*4B ~ 4.9MB)


# ---------------------------------------------------------------------------
# point ops on (X, Y, Z) tuples of (..., L, B) values, generic over KField
# ---------------------------------------------------------------------------

def k_add(F: KField, b3, p, q):
    """Complete addition, RCB15 Algorithm 7 (a=0); b3 = 3*4 Montgomery col."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    m, a_, s_ = F.mont_mul, F.add, F.sub
    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = a_(X1, Y1)
    t4 = a_(X2, Y2)
    t3 = m(t3, t4)
    t4 = a_(t0, t1)
    t3 = s_(t3, t4)
    t4 = a_(Y1, Z1)
    X3 = a_(Y2, Z2)
    t4 = m(t4, X3)
    X3 = a_(t1, t2)
    t4 = s_(t4, X3)
    X3 = a_(X1, Z1)
    Y3 = a_(X2, Z2)
    X3 = m(X3, Y3)
    Y3 = a_(t0, t2)
    Y3 = s_(X3, Y3)
    X3 = a_(t0, t0)
    t0 = a_(X3, t0)
    t2 = m(b3, t2)
    Z3 = a_(t1, t2)
    t1 = s_(t1, t2)
    Y3 = m(b3, Y3)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s_(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a_(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a_(Z3, t0)
    return (X3, Y3, Z3)


def k_double(F: KField, b3, p):
    """Complete doubling, RCB15 Algorithm 9 (a=0)."""
    X, Y, Z = p
    m, a_, s_ = F.mont_mul, F.add, F.sub
    t0 = m(Y, Y)
    Z3 = a_(t0, t0)
    Z3 = a_(Z3, Z3)
    Z3 = a_(Z3, Z3)
    t1 = m(Y, Z)
    t2 = m(Z, Z)
    t2 = m(b3, t2)
    X3 = m(t2, Z3)
    Y3 = a_(t0, t2)
    Z3 = m(t1, Z3)
    t1 = a_(t2, t2)
    t2 = a_(t1, t2)
    t0 = s_(t0, t2)
    Y3 = m(t0, Y3)
    Y3 = a_(X3, Y3)
    t1 = m(X, Y)
    X3 = m(t0, t1)
    X3 = a_(X3, X3)
    return (X3, Y3, Z3)


def k_identity(F: KField, shape):
    """(0 : 1 : 0) with per-coordinate shape `shape` = (..., B)."""
    return (F.zeros(shape), F.one(shape), F.zeros(shape))


def k_select(F: KField, cond, p, q):
    return tuple(F.select(cond, a, b) for a, b in zip(p, q))


# ---------------------------------------------------------------------------
# the MSM kernel
# ---------------------------------------------------------------------------

def _window_values(scalars, j: int):
    """4-bit window j (MSB-first over 64 windows) from (..., L_fr, B) canonical
    Fr limbs: returns (..., B) uint32 in [0, 16). Window j covers bits
    [4*(63-j), 4*(63-j)+4) = limb (63-j)//4, shift 4*((63-j)%4)."""
    w = 63 - j
    limb_idx = w // 4
    shift = np.uint32(4 * (w % 4))
    return (scalars[..., limb_idx, :] >> shift) & np.uint32(0xF)


def make_msm_kernel(K: int, lanes: int = LANES, chunk: int = CHUNK,
                    interpret: bool = False):
    """Build a jittable msm(points (B, K, 3, L), scalars (B, K, L_fr)) ->
    (B, 3, L) using a Pallas kernel gridded over (batch//lanes, ceil(K/chunk)).
    K is static; the point axis is zero-padded to a chunk multiple (scalar 0
    contributes the identity through the complete formulas... scalar 0 selects
    table entry 0 which is the identity point, so padding is exact)."""
    L, Lr = FP_SPEC.L, FR_SPEC.L
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    b3_col = FP_SPEC.to_mont(12).reshape(-1, 1)  # 3*b, b=4

    def kernel(consts_ref, b3_ref, points_ref, windows_ref, out_ref, table_ref):
        F = kfp.bind(consts_ref[:, :])
        b3 = b3_ref[:, :]
        pts = points_ref[:, :, :, :]  # (chunk, 3, L, B)
        p0 = (pts[:, 0], pts[:, 1], pts[:, 2])

        # table_ref[w] = w * P per point: (chunk, 16, 3, L, B) VMEM scratch
        ident = k_identity(F, (chunk, lanes))
        table_ref[:, 0] = jnp.stack(ident, axis=1)
        table_ref[:, 1] = pts

        def build(i, cur):
            nxt = k_add(F, b3, cur, p0)
            table_ref[:, pl.ds(i + 2, 1)] = jnp.stack(nxt, axis=1)[:, None]
            return nxt

        jax.lax.fori_loop(0, 14, build, p0)

        widx = jax.lax.broadcasted_iota(jnp.uint32, (chunk, 16, 1, 1, lanes), 1)

        def window_step(j, acc):
            acc = k_double(F, b3, k_double(F, b3, k_double(F, b3, k_double(F, b3, acc))))
            w = windows_ref[pl.ds(j, 1), :, :][0]  # (chunk, B)
            onehot = w[:, None, None, None, :] == widx  # (chunk, 16, 1, 1, B)
            table = table_ref[:, :, :, :, :]
            # Mosaic: no unsigned reductions — limbs < 2^16 are int32-safe
            sel = jnp.sum(
                jnp.where(onehot, table, 0).astype(jnp.int32), axis=1
            ).astype(jnp.uint32)  # (chunk, 3, L, B)
            # halving tree over the chunk axis
            t = (sel[:, 0], sel[:, 1], sel[:, 2])
            kk = chunk
            while kk > 1:
                half = kk // 2
                added = k_add(
                    F,
                    b3,
                    tuple(c[:half] for c in t),
                    tuple(c[half : 2 * half] for c in t),
                )
                if kk % 2:
                    added = tuple(
                        jnp.concatenate([a, c[2 * half : kk]], axis=0)
                        for a, c in zip(added, t)
                    )
                    half += 1
                t = added
                kk = half
            return k_add(F, b3, acc, tuple(c[0] for c in t))

        acc = jax.lax.fori_loop(0, 64, window_step, k_identity(F, (lanes,)))
        out_ref[0, :, :, :] = jnp.stack(acc, axis=0)

    def msm(points, scalars):
        B = points.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        nbt = B // lanes
        # pad K axis (scalar 0 selects the identity table entry — exact padding)
        if Kp != K:
            pad_pts = jnp.zeros((B, Kp - K, 3, L), dtype=jnp.uint32)
            pad_sc = jnp.zeros((B, Kp - K, Lr), dtype=jnp.uint32)
            points = jnp.concatenate([points, pad_pts], axis=1)
            scalars = jnp.concatenate([scalars, pad_sc], axis=1)
        # kernel layout: points (Kp, 3, L, B); windows (64, Kp, B)
        pts_k = jnp.moveaxis(points, 0, -1)
        from .curve import _nibbles_msb_first

        windows = jnp.moveaxis(_nibbles_msb_first(scalars), 1, -1)

        partials = pl.pallas_call(
            kernel,
            grid=(nbt, n_chunks),
            in_specs=[
                pl.BlockSpec((4, L + 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (chunk, 3, L, lanes),
                    lambda b, c: (c, 0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (64, chunk, lanes),
                    lambda b, c: (0, c, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, L, lanes), lambda b, c: (c, 0, 0, b), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks, 3, L, B), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((chunk, 16, 3, L, lanes), jnp.uint32)],
            interpret=interpret,
        )(kfp.const_args(), b3_col, pts_k, windows)

        # XLA epilogue: tree-add the chunk partials, back in (B, ..., L) layout
        from . import curve as jc

        parts = jnp.moveaxis(partials, -1, 0)  # (B, n_chunks, 3, L)
        return jc.tree_sum(parts)

    return msm
