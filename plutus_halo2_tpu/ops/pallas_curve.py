"""Pallas TPU kernels for batched G1 arithmetic: windowed MSM.

Replaces ops/curve.msm's XLA graph on the hot path. The XLA version is
latency-bound: every field mul is a separate fori_loop/while dispatch
(~50-100us regardless of batch, perf_probe). Here the whole MSM runs inside
one pallas_call per batch tile: the CIOS limb loop is straight-line Mosaic
vector code, window tables live in VMEM, and the batch rides the 128-wide
lane axis.

Decomposition (v2): grid (batch_tiles,). Each instance processes ALL K points
through per-window partial sums —

  for each chunk of <= 8 points:  build the signed-window table (entries
      0..8, 7 complete adds); for each of the 64 windows: one-hot select by
      digit magnitude, negate Y where the digit is negative, halving-tree over
      the chunk, accumulate into the window-sum scratch wsum[w]
  finally: one shared 256-doubling chain  acc = 16*acc + wsum[w]

versus v1 which paid the full doubling chain once per chunk. Signed 4-bit
digits (magnitude <= 8) halve both the table build and the one-hot select
width relative to unsigned nibbles; point negation is a free Y-negate.

Point identity / exceptional cases are safe: complete RCB15 formulas, same as
ops/curve.py. Zero-padded points (scalar 0) select table entry 0 == identity.

Layout: points (..., 3, L, B), scalars (..., L_fr, B) — see ops/pallas_core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import FR_SPEC
from .pallas_core import FP24_SPEC, KField, fp24_from_fp25, fp25_from_fp24, kfp

LANES = 128
CHUNK = 8  # points per table-build round (VMEM: table 9*CHUNK*3*L*LANES*4B ~ 2.8MB)
# default signed-window width: 5-bit measured faster than 4-bit for the
# verifier's K>=8 MSMs on v5e (73.8 vs 77.7 ms at K=16, B=1024) AND ~2x
# cheaper to Mosaic-compile (fewer window steps -> smaller program)
WBITS = 5


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


def table_select(table, mag, tent: int, mode: str = "onehot"):
    """Branchless windowed-table gather: table (chunk, TENT, 3, L, B),
    mag (chunk, B) in [0, tent) -> (chunk, 3, L, B).

    mode="onehot" (DEFAULT): TENT compare+mask+sum passes over the full
    table. Measured FASTER than the select tree for the verifier's K<=32
    MSMs on v5e (K=8: 89 vs 105 ms, K=16: 98 vs 104 ms at B=1024,
    fetch-inclusive) — the tree's per-level reshapes cost Mosaic relayout
    copies that outweigh the saved compare/sum passes.
    mode="tree": bit-decomposed select tree — level k halves the candidate
    set with one jnp.where keyed on mag bit k; TENT = 2^(w-1)+1, the top
    entry rides one final select. Kept for large-K experiments."""
    chunk = table.shape[0]
    if mode == "onehot":
        widx = jax.lax.broadcasted_iota(
            jnp.uint32, (chunk, tent, 1, 1, table.shape[-1]), 1
        )
        onehot = mag[:, None, None, None, :] == widx
        # Mosaic: no unsigned reductions — limbs < 2^16 are int32-safe
        return jnp.sum(
            jnp.where(onehot, table, 0).astype(jnp.int32), axis=1
        ).astype(jnp.uint32)
    pow2 = tent - 1  # 2^(wbits-1)
    t_top = table[:, pow2]
    t = table[:, :pow2]
    bit = 0
    n = pow2
    while n > 1:
        t = t.reshape(chunk, n // 2, 2, *t.shape[2:])
        cond = ((mag >> bit) & 1).astype(bool)[:, None, None, None, :]
        t = jnp.where(cond, t[:, :, 1], t[:, :, 0])
        n //= 2
        bit += 1
    t = t[:, 0]
    top = (mag == pow2)[:, None, None, :]
    return jnp.where(top, t_top, t)


def k_tree_reduce(F: KField, b3, t, k: int):
    """Halving-tree point sum over leading axis of size k (coords (k, L, B))."""
    while k > 1:
        half = k // 2
        added = k_add(
            F,
            b3,
            tuple(c[:half] for c in t),
            tuple(c[half : 2 * half] for c in t),
        )
        if k % 2:
            added = tuple(
                jnp.concatenate([a, c[2 * half : k]], axis=0)
                for a, c in zip(added, t)
            )
            half += 1
        t = added
        k = half
    return tuple(c[0] for c in t)


# ---------------------------------------------------------------------------
# signed digit decomposition (XLA level, cheap uint32 work)
# ---------------------------------------------------------------------------

def n_windows(wbits: int, nbits: int = 256) -> int:
    """Signed-digit window count: ceil(nbits / wbits) for an (nbits-1)-bit
    scalar. The extra bit keeps the top window's raw digit small enough
    (<= 2^(wbits-1) - 1) to absorb a signed-recoding carry without flipping —
    a 255-bit budget fails on e.g. q-1 whose top 5-bit digit is 28."""
    return -(-nbits // wbits)


def signed_digits_msb(scalars, wbits: int = 4, nbits: int = 256):
    """(..., L) 16-bit limbs of (nbits-1)-bit scalars -> (mags, negs) each
    (NW, ...), MSB window first: scalar = sum_w d_w * 2^(wbits*(NW-1-w)) with
    d_w = (-1)^negs * mags, mags <= 2^(wbits-1)."""
    NW = n_windows(wbits, nbits)
    l = scalars.astype(jnp.uint32)
    if wbits == 4:
        parts = jnp.stack([(l >> s) & 0xF for s in (0, 4, 8, 12)], axis=-1)
        digs = parts.reshape(*scalars.shape[:-1], -1)[..., :NW]  # LSB first
    else:
        bits = (l[..., :, None] >> jnp.arange(16, dtype=jnp.uint32)) & 1
        bits = bits.reshape(*scalars.shape[:-1], -1)[..., : NW * wbits]
        weights = (1 << jnp.arange(wbits, dtype=jnp.uint32)).astype(jnp.uint32)
        digs = jnp.sum(
            bits.reshape(*scalars.shape[:-1], NW, wbits) * weights, axis=-1
        )
    dig_s = jnp.moveaxis(digs, -1, 0)  # (NW, ...)
    half, base = 1 << (wbits - 1), 1 << wbits

    def body(carry, d):
        d = d + carry
        flip = d > half
        mag = jnp.where(flip, base - d, d)
        return flip.astype(jnp.uint32), (mag, flip)

    _, (mags, negs) = jax.lax.scan(body, jnp.zeros_like(dig_s[0]), dig_s)
    return mags[::-1], negs[::-1]  # MSB window first


# ---------------------------------------------------------------------------
# the MSM kernel
# ---------------------------------------------------------------------------

def make_msm_kernel(K: int, lanes: int = LANES, chunk: int = CHUNK,
                    interpret: bool = False, wbits: int = WBITS,
                    select_mode: str = "onehot"):
    """Build a jittable msm(points (B, K, 3, L), scalars (B, K, L_fr)) ->
    (B, 3, L) using a Pallas kernel gridded over (batch//lanes,). K is static;
    the point axis is zero-padded to a chunk multiple (scalar 0 selects table
    entry 0 which is the identity point, so padding is exact). wbits selects
    the signed-window width: 5-bit trades a bigger per-chunk table build
    (15 adds vs 7) for 20% fewer window steps (51 vs 64) — the win for the
    verifier's K>=16 MSMs; 4-bit wins for small K."""
    L, Lr = FP24_SPEC.L, FR_SPEC.L
    NW = n_windows(wbits)  # window count: 64 (4-bit) / 52 (5-bit)
    TENT = (1 << (wbits - 1)) + 1  # table entries 0..2^(wbits-1)
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    b3_col = FP24_SPEC.to_mont(12).reshape(-1, 1)  # 3*b, b=4

    def kernel(consts_ref, b3_ref, points_ref, mags_ref, negs_ref, out_ref,
               wsum_ref, table_ref):
        """Grid (batch_tiles, n_chunks): the chunk axis rides the grid so the
        chunk body compiles ONCE; the window-sum scratch persists across the
        sequential chunk steps (initialized at c == 0, the shared doubling
        chain + output write happen at the last chunk)."""
        F = kfp.bind(consts_ref[:, :], unroll_mul=not interpret)
        b3 = b3_ref[:, :]
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            # window sums start at the identity
            ident_w = k_identity(F, (NW, lanes))
            wsum_ref[:, :, :, :] = jnp.stack(ident_w, axis=1)

        pts = points_ref[:, :, :, :]  # (chunk, 3, L, B) — this chunk's block
        p0 = (pts[:, 0], pts[:, 1], pts[:, 2])
        # table_ref[:, w] = w * P per point: entries 0..2^(wbits-1)
        ident = k_identity(F, (chunk, lanes))
        table_ref[:, 0] = jnp.stack(ident, axis=1)
        table_ref[:, 1] = pts

        def build(i, cur):
            nxt = k_add(F, b3, cur, p0)
            table_ref[:, pl.ds(i + 2, 1)] = jnp.stack(nxt, axis=1)[:, None]
            return nxt

        jax.lax.fori_loop(0, TENT - 2, build, p0)

        def window_step(j, _):
            mag = mags_ref[pl.ds(j, 1), :, :][0]  # (chunk, B) — chunk block
            neg = negs_ref[pl.ds(j, 1), :, :][0]
            table = table_ref[:, :, :, :, :]
            sel = table_select(table, mag, TENT, select_mode)  # (chunk, 3, L, B)
            y = sel[:, 1]
            y = jnp.where(neg[:, None, :].astype(bool), F.neg(y), y)
            t = k_tree_reduce(F, b3, (sel[:, 0], y, sel[:, 2]), chunk)
            prev = wsum_ref[pl.ds(j, 1)][0]  # (3, L, B)
            new = k_add(F, b3, (prev[0], prev[1], prev[2]), t)
            wsum_ref[pl.ds(j, 1)] = jnp.stack(new, axis=0)[None]
            return 0

        jax.lax.fori_loop(0, NW, window_step, 0)

        # one shared doubling chain over the window sums, at the last chunk
        @pl.when(c == n_chunks - 1)
        def _():
            def final_step(j, acc):
                for _ in range(wbits):
                    acc = k_double(F, b3, acc)
                w = wsum_ref[pl.ds(j, 1)][0]
                return k_add(F, b3, acc, (w[0], w[1], w[2]))

            acc = jax.lax.fori_loop(0, NW, final_step, k_identity(F, (lanes,)))
            # canon: the MSM result feeds XLA-level canonical-domain code
            out_ref[:, :, :] = jnp.stack([F.canon(c) for c in acc], axis=0)

    def msm(points, scalars):
        B = points.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        nbt = B // lanes
        # domain boundary: XLA runs 25-limb R25 Montgomery; the kernel runs
        # 24-limb R24 (3 vregs per element instead of 4)
        points = fp24_from_fp25(points)
        # pad K axis (scalar 0 selects the identity table entry — exact padding)
        if Kp != K:
            pad_pts = jnp.zeros((B, Kp - K, 3, L), dtype=jnp.uint32)
            pad_sc = jnp.zeros((B, Kp - K, Lr), dtype=jnp.uint32)
            points = jnp.concatenate([points, pad_pts], axis=1)
            scalars = jnp.concatenate([scalars, pad_sc], axis=1)
        # kernel layout: points (Kp, 3, L, B); digit planes (NW, Kp, B)
        pts_k = jnp.moveaxis(points, 0, -1)
        mags, negs = signed_digits_msb(scalars, wbits)
        mags = jnp.moveaxis(mags, 1, -1)
        negs = jnp.moveaxis(negs, 1, -1).astype(jnp.uint32)

        out = pl.pallas_call(
            kernel,
            grid=(nbt, n_chunks),
            in_specs=[
                pl.BlockSpec((6, L + 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (chunk, 3, L, lanes), lambda b, c: (c, 0, 0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (NW, chunk, lanes), lambda b, c: (0, c, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (NW, chunk, lanes), lambda b, c: (0, c, b), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, L, lanes), lambda b, c: (0, 0, b), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((3, L, B), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((NW, 3, L, lanes), jnp.uint32),  # window sums
                pltpu.VMEM((chunk, TENT, 3, L, lanes), jnp.uint32),  # chunk table
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(kfp.const_args(), b3_col, pts_k, mags, negs)

        return fp25_from_fp24(jnp.moveaxis(out, -1, 0))  # (B, 3, 25)

    return msm


# ---------------------------------------------------------------------------
# hinted-decompression kernel (point parsing, the verify front-end)
# ---------------------------------------------------------------------------

def make_decompress_kernel(K: int, lanes: int = LANES, interpret: bool = False,
                           subgroup_rounds: int | None = None):
    """Build decompress(pt_raw (B, K, 48) uint8, y_hints (B, K, L25)) ->
    (points (B, K, 3, L25), valid (B, K)): the HINTED branch of
    ops/curve.decompress as one Pallas kernel — the per-point field work
    (to-Montgomery lifts, the y^2 == x^3 + 4 hint check, sign normalization
    per the blst conventions of CompressUncompress.hs:51-97, and the
    R24 -> R25 domain conversion out) runs as Mosaic vector code over all K
    points at once; only the byte unpacking / flag logic stays in XLA.
    Bit-identical to jc.decompress(..., y_hint=...) for hints < 2^384 (the
    kernel reads the hint's low 24 limbs; compute_y_hints always emits
    canonical < p values. An oversized malicious hint is reinterpreted mod
    2^384 — it stays a wrong hint and can only flip its row to reject).

    ~8 mont_muls per point vs the XLA graph's dispatch-bound ~13 ms/batch
    stage (STAGES.md round-4 budget).

    subgroup_rounds: when set, the kernel ALSO computes the per-row
    random-weighted aggregate subgroup test (the default strict mode —
    same math/bools as make_subgroup_kernel / jc.aggregate_subgroup_check)
    on the just-decompressed points while they are still in-register in the
    R24 domain, saving the separate kernel's dispatch + R25->R24 re-entry
    boundary (~3.5 ms/1024-batch). The wrapper then takes weights
    (rounds, K) and returns (points, valid, sub_ok (B,))."""
    from ..refimpl.field import BLS_X, P
    from .curve import _BETA_MONT
    from .pallas_core import host_reencode24

    L = FP24_SPEC.L
    r24 = 1 << (16 * L)
    # plain-multiplier columns (see mont_mul: out = a*b/R24):
    one_raw = np.zeros(L, np.uint32)
    one_raw[0] = 1  # from_mont multiplier
    from .limb import FP_SPEC, int_to_limbs
    from .pallas_core import staged_broadcast

    r25_col = int_to_limbs(FP_SPEC.R % P, L).reshape(-1, 1)  # R24 -> R25
    b_col = FP24_SPEC.to_mont(4).reshape(-1, 1)  # curve b, R24 Montgomery
    # carry-test helpers: value + helper overflows the L-limb window iff
    # value >= C (C = p for the x-range check, (p+1)/2 for the sign test)
    pad0 = lambda v: np.concatenate([v, np.zeros(1, np.uint32)])  # noqa: E731
    ge_p = pad0(int_to_limbs(r24 - P, L)).reshape(-1, 1)
    ge_half = pad0(int_to_limbs(r24 - ((P + 1) >> 1), L)).reshape(-1, 1)

    rounds = subgroup_rounds
    SW = 3  # subgroup aggregation window width (see make_subgroup_kernel)
    SNW = n_windows(SW, 16 + 1)
    STENT = (1 << (SW - 1)) + 1
    beta_col = host_reencode24(_BETA_MONT).reshape(-1, 1)
    zbits = np.array([[int(c) for c in bin(BLS_X)[2:]]], dtype=np.int32)

    def kernel(consts_ref, onec_ref, r25_ref, b_ref, gep_ref, geh_ref,
               *refs):
        if rounds:
            (beta_ref, zbits_ref, x_ref, hint_ref, sign_ref, inf_ref,
             mags_ref, negs_ref, pts_ref, ok_ref, sub_ref) = refs
        else:
            x_ref, hint_ref, sign_ref, pts_ref, ok_ref = refs
        F = kfp.bind(consts_ref[:, :], unroll_mul=not interpret)
        r2 = F._row("r2")
        onec = onec_ref[:, :]
        r25c = r25_ref[:, :]

        x_raw = x_ref[:, :, :]  # (K, L, B) canonical integer limbs < 2^381
        hint = hint_ref[:, :, :]
        sign = sign_ref[:, :]  # (K, B)

        def ge_test(val, helper_ref):
            # val (K, L, B) canonical; helper (L+1, 1)
            ext = jnp.concatenate([val, jnp.zeros_like(val[:, :1, :])], axis=1)
            z = F.normalize(
                ext + staged_broadcast(helper_ref[:, :], ext.shape)
            )
            # static slice + reshape (an int-index squeeze lowers to an
            # unsupported dynamic_slice in Mosaic)
            return z[:, L : L + 1, :].reshape(val.shape[0], val.shape[-1]) > 0

        x_ge_p = ge_test(x_raw, gep_ref)
        xm = F.mont_mul(x_raw, r2)  # x * R24
        rhs = F.add(
            F.mont_mul(F.mont_mul(xm, xm), xm),
            staged_broadcast(b_ref[:, :], xm.shape).astype(jnp.uint32),
        )
        ym = F.mont_mul(hint, r2)
        root_ok = F.eq(F.mont_mul(ym, ym), rhs)  # (K, B)
        # sign: compressed flag wants the lexicographically larger root iff
        # set; y > -y  <=>  2y > p  <=>  y >= (p+1)/2 on canonical y
        y_can = F.canon(F.mont_mul(ym, onec))
        y_gt = ge_test(y_can, geh_ref)
        want_neg = (sign != 0) ^ y_gt
        y_sel = F.select(want_neg, F.neg(ym), ym)
        # domain out: value*R24 -> value*R25 (24-limb carrier; canonical < N)
        x_out = F.canon(F.mont_mul(xm, r25c))
        y_out = F.canon(F.mont_mul(y_sel, r25c))
        z_out = staged_broadcast(r25c, x_out.shape).astype(jnp.uint32)  # 1·R25
        pts_ref[:, :, :, :] = jnp.stack([x_out, y_out, z_out], axis=1)
        ok_ref[:, :] = (root_ok & ~x_ge_p).astype(jnp.uint32)

        if not rounds:
            return

        # ---- fused aggregate subgroup test (points still in R24) ---------
        b3 = F.add(F.add(b_ref[:, :], b_ref[:, :]), b_ref[:, :])
        one24 = F.one((K, lanes))
        zero24 = F.zeros((K, lanes))
        infb = inf_ref[:, :] != 0  # (K, B): encoded identity points
        P0 = (
            F.select(infb, zero24, xm),
            F.select(infb, one24, y_sel),
            F.select(infb, zero24, one24),
        )
        # 5-entry window table [0P..4P] as one stacked value (K, 5, 3, L, B)
        entries = [k_identity(F, (K, lanes)), P0]
        for _ in range(STENT - 2):
            entries.append(k_add(F, b3, entries[-1], P0))
        table = jnp.stack(
            [jnp.stack(e, axis=1) for e in entries], axis=1
        )
        qs = []
        for r in range(rounds):
            acc = k_identity(F, (lanes,))
            for w in range(SNW):  # MSB window first
                for _ in range(SW):
                    acc = k_double(F, b3, acc)
                i = r * SNW + w
                mag = mags_ref[pl.ds(i, 1), :, :].reshape(K, lanes)
                neg = negs_ref[pl.ds(i, 1), :, :].reshape(K, lanes)
                sel = table_select(table, mag, STENT)
                y = sel[:, 1]
                y = jnp.where(neg[:, None, :].astype(bool), F.neg(y), y)
                t = k_tree_reduce(F, b3, (sel[:, 0], y, sel[:, 2]), K)
                acc = k_add(F, b3, acc, t)
            qs.append(acc)
        Q = tuple(
            jnp.stack([q[coord] for q in qs], axis=0) for coord in range(3)
        )  # coords (rounds, L, B)

        # endomorphism membership on the aggregates: phi(Q) == [z^2]Q - Q
        def zmul(p):
            def body(i, a):
                a = k_double(F, b3, a)
                return jax.lax.cond(
                    zbits_ref[0, i] != 0,
                    lambda v: k_add(F, b3, v, p),
                    lambda v: v,
                    a,
                )

            return jax.lax.fori_loop(0, 64, body, k_identity(F, (rounds, lanes)))

        tq = zmul(zmul(Q))
        rhs_p = k_add(F, b3, tq, (Q[0], F.neg(Q[1]), Q[2]))
        phi_x = F.mont_mul(Q[0], beta_ref[:, :])
        x1z2 = F.mont_mul(phi_x, rhs_p[2])
        x2z1 = F.mont_mul(rhs_p[0], Q[2])
        y1z2 = F.mont_mul(Q[1], rhs_p[2])
        y2z1 = F.mont_mul(rhs_p[1], Q[2])
        q_inf = F.is_zero(Q[2])  # (rounds, B)
        r_inf = F.is_zero(rhs_p[2])
        fin = F.eq(x1z2, x2z1) & F.eq(y1z2, y2z1) & ~q_inf & ~r_inf
        ok_r = fin | q_inf
        bad = jnp.sum((~ok_r).astype(jnp.int32), axis=0)  # (B,)
        sub_ref[:, :] = (bad == 0)[None].astype(jnp.uint32)

    def decompress(pt_raw, y_hints, weights=None):
        pt_raw = jnp.asarray(pt_raw)
        B = pt_raw.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        assert pt_raw.shape[1] == K and y_hints.shape[1] == K
        nbt = B // lanes

        flags = pt_raw[..., 0].astype(jnp.uint32)  # (B, K)
        comp_flag = (flags & 0x80) != 0
        inf_flag = (flags & 0x40) != 0
        sign_flag = ((flags & 0x20) != 0).astype(jnp.uint32)

        x_bytes = pt_raw.at[..., 0].set((flags & 0x1F).astype(pt_raw.dtype))
        # big-endian bytes -> LE 16-bit limbs (381 bits fit 24 limbs exactly)
        le = x_bytes[..., ::-1].astype(jnp.uint32)
        pairs = le.reshape(*le.shape[:-1], 24, 2)
        x24 = pairs[..., 0] | (pairs[..., 1] << 8)  # (B, K, 24)

        # kernel layout: batch -> lanes
        x_k = jnp.moveaxis(x24, 0, -1)  # (K, 24, B)
        h_k = jnp.moveaxis(y_hints[..., :L].astype(jnp.uint32), 0, -1)
        s_k = jnp.moveaxis(sign_flag, 0, -1)  # (K, B)

        col = lambda: pl.BlockSpec((L, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
        colx = lambda: pl.BlockSpec((L + 1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
        plane = lambda: pl.BlockSpec((K, lanes), lambda b: (0, b), memory_space=pltpu.VMEM)  # noqa: E731
        kplane = lambda: pl.BlockSpec((K, L, lanes), lambda b: (0, 0, b), memory_space=pltpu.VMEM)  # noqa: E731
        in_specs = [
            pl.BlockSpec((6, L + 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            col(), col(), col(), colx(), colx(),
        ]
        args = [kfp.const_args(), one_raw.reshape(-1, 1), r25_col, b_col,
                ge_p, ge_half]
        out_specs = [
            pl.BlockSpec((K, 3, L, lanes), lambda b: (0, 0, 0, b), memory_space=pltpu.VMEM),
            plane(),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((K, 3, L, B), jnp.uint32),
            jax.ShapeDtypeStruct((K, B), jnp.uint32),
        ]
        if rounds:
            assert weights is not None and weights.shape == (rounds, K)
            # 16-bit weights -> (rounds*SNW, K, B) signed digit planes,
            # round-major (identical recoding to make_subgroup_kernel)
            w = jnp.asarray(weights, jnp.uint32)
            w_limbs = jnp.stack([w & 0xFFFF, (w >> 16) & 0xFFFF], axis=-1)
            mags, negs = signed_digits_msb(w_limbs, SW, nbits=16 + 1)
            mags = jnp.moveaxis(mags, 0, 1).reshape(rounds * SNW, K)
            negs = jnp.moveaxis(negs, 0, 1).reshape(rounds * SNW, K)
            RNW = rounds * SNW
            mags = jnp.broadcast_to(
                mags.astype(jnp.uint32)[:, :, None], (RNW, K, B)
            )
            negs = jnp.broadcast_to(
                negs.astype(jnp.uint32)[:, :, None], (RNW, K, B)
            )
            inf_k = jnp.moveaxis(inf_flag.astype(jnp.uint32), 0, -1)  # (K, B)
            in_specs += [
                col(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                kplane(), kplane(), plane(), plane(),
                pl.BlockSpec((RNW, K, lanes), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((RNW, K, lanes), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            ]
            args += [beta_col, zbits, x_k, h_k, s_k, inf_k, mags, negs]
            out_specs.append(
                pl.BlockSpec((1, lanes), lambda b: (0, b), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((1, B), jnp.uint32))
        else:
            in_specs += [kplane(), kplane(), plane()]
            args += [x_k, h_k, s_k]

        outs = pl.pallas_call(
            kernel,
            grid=(nbt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        pts_k, ok_k = outs[0], outs[1]

        # back to XLA layout, pad the (always-zero) 25th limb
        pts = jnp.moveaxis(pts_k, -1, 0)  # (B, K, 3, 24)
        pts = jnp.concatenate([pts, jnp.zeros_like(pts[..., :1])], axis=-1)
        ok = jnp.moveaxis(ok_k, -1, 0).astype(bool)  # (B, K)

        # infinity handling + flag semantics (identical to jc.decompress)
        from . import curve as jc

        ident = jc.identity(pts.shape[:-2])
        rest_zero = jnp.all(x_bytes[..., 1:] == 0, axis=-1) & ((flags & 0x1F) == 0)
        inf_ok = inf_flag & (sign_flag == 0) & rest_zero
        point = jc.select(inf_flag, ident, pts)
        valid = comp_flag & jnp.where(inf_flag, inf_ok, ok)
        if rounds:
            return point, valid, outs[2][0].astype(bool)
        return point, valid

    return decompress


# ---------------------------------------------------------------------------
# aggregate subgroup-membership kernel (strict decompression semantics)
# ---------------------------------------------------------------------------

def make_subgroup_kernel(K: int, rounds: int | None = None, lanes: int = LANES,
                         chunk: int = CHUNK, interpret: bool = False,
                         wbits: int = 3):
    """Build check(points (B, K, 3, L25), weights (rounds, K) uint32) ->
    (B,) bool: per-row random-weighted aggregate q-subgroup membership (the
    affordable batch form of the reference's per-point
    bls12_381_G1_uncompress subgroup check — soundness analysis in
    ops/curve.aggregate_subgroup_check, bit-identical results).

    Structure mirrors make_msm_kernel: per-chunk signed-window tables feed
    rounds*NW window sums (NW = 6 for the 16-bit weights — the whole point
    of short weights). wbits=3 rebalances table-build vs window-step cost
    for SHORT scalars: the 5-entry table costs 3 adds/chunk vs 15 at
    wbits=5, and the narrow one-hot select moves 5/17ths of the VMEM
    traffic — the opposite trade from the 255-bit MSM where window count
    dominates. Then per round a shared doubling chain folds the sums
    into the aggregate Q_r and ONE batched endomorphism test
    phi(Q) == [z^2 - 1] Q (Bowe 2019 criterion, ops/curve.subgroup_check)
    runs over the (rounds, ..., B) stack — 2 scalar ladders per ROW instead
    of 2 per point. rounds defaults to curve.DEFAULT_SUBGROUP_ROUNDS (the one
    shared default: evasion <= 3^-rounds)."""
    from ..refimpl.field import BLS_X
    from .curve import _BETA_MONT, DEFAULT_SUBGROUP_ROUNDS
    from .pallas_core import host_reencode24

    if rounds is None:
        rounds = DEFAULT_SUBGROUP_ROUNDS

    L = FP24_SPEC.L
    NBITS = 16 + 1  # weight bits + signed-recode carry bit
    NW = n_windows(wbits, NBITS)
    TENT = (1 << (wbits - 1)) + 1
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    RNW = rounds * NW
    b3_col = FP24_SPEC.to_mont(12).reshape(-1, 1)
    beta_col = host_reencode24(_BETA_MONT).reshape(-1, 1)
    zbits = np.array([[int(c) for c in bin(BLS_X)[2:]]], dtype=np.int32)  # (1, 64)

    def kernel(consts_ref, b3_ref, beta_ref, zbits_ref, points_ref, mags_ref,
               negs_ref, out_ref, wsum_ref, table_ref):
        F = kfp.bind(consts_ref[:, :], unroll_mul=not interpret)
        b3 = b3_ref[:, :]
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            ident_w = k_identity(F, (RNW, lanes))
            wsum_ref[:, :, :, :] = jnp.stack(ident_w, axis=1)

        pts = points_ref[:, :, :, :]  # (chunk, 3, L, B)
        p0 = (pts[:, 0], pts[:, 1], pts[:, 2])
        ident = k_identity(F, (chunk, lanes))
        table_ref[:, 0] = jnp.stack(ident, axis=1)
        table_ref[:, 1] = pts

        def build(i, cur):
            nxt = k_add(F, b3, cur, p0)
            table_ref[:, pl.ds(i + 2, 1)] = jnp.stack(nxt, axis=1)[:, None]
            return nxt

        jax.lax.fori_loop(0, TENT - 2, build, p0)

        def window_step(j, _):
            mag = mags_ref[pl.ds(j, 1), :, :][0]  # (chunk, B)
            neg = negs_ref[pl.ds(j, 1), :, :][0]
            table = table_ref[:, :, :, :, :]
            sel = table_select(table, mag, TENT)
            y = sel[:, 1]
            y = jnp.where(neg[:, None, :].astype(bool), F.neg(y), y)
            t = k_tree_reduce(F, b3, (sel[:, 0], y, sel[:, 2]), chunk)
            prev = wsum_ref[pl.ds(j, 1)][0]
            new = k_add(F, b3, (prev[0], prev[1], prev[2]), t)
            wsum_ref[pl.ds(j, 1)] = jnp.stack(new, axis=0)[None]
            return 0

        jax.lax.fori_loop(0, RNW, window_step, 0)

        @pl.when(c == n_chunks - 1)
        def _():
            # per-round doubling-chain fold -> aggregates Q (rounds, ., lanes)
            # (static unroll over rounds — Mosaic has no dynamic_update_slice
            # on values, and rounds is small)
            qs = []
            for r0 in range(rounds):
                def final_step(j, acc, r0=r0):
                    for _ in range(wbits):
                        acc = k_double(F, b3, acc)
                    w = wsum_ref[pl.ds(r0 * NW + j, 1)][0]
                    return k_add(F, b3, acc, (w[0], w[1], w[2]))

                qs.append(
                    jax.lax.fori_loop(0, NW, final_step, k_identity(F, (lanes,)))
                )
            Q = tuple(
                jnp.stack([q[coord] for q in qs], axis=0) for coord in range(3)
            )

            # endomorphism membership test on the aggregates, all rounds at
            # once: phi(Q) == [z^2] Q - Q  (sign of z squares away)
            def zmul(p):
                def body(i, acc):
                    acc = k_double(F, b3, acc)
                    return jax.lax.cond(
                        zbits_ref[0, i] != 0,
                        lambda a: k_add(F, b3, a, p),
                        lambda a: a,
                        acc,
                    )

                return jax.lax.fori_loop(0, 64, body, k_identity(F, (rounds, lanes)))

            t = zmul(zmul(Q))
            rhs = k_add(F, b3, t, (Q[0], F.neg(Q[1]), Q[2]))
            phi_x = F.mont_mul(Q[0], beta_ref[:, :])
            x1z2 = F.mont_mul(phi_x, rhs[2])
            x2z1 = F.mont_mul(rhs[0], Q[2])
            y1z2 = F.mont_mul(Q[1], rhs[2])
            y2z1 = F.mont_mul(rhs[1], Q[2])
            q_inf = F.is_zero(Q[2])  # (rounds, B)
            r_inf = F.is_zero(rhs[2])
            fin = (
                F.eq(x1z2, x2z1) & F.eq(y1z2, y2z1) & ~q_inf & ~r_inf
            )
            ok_r = fin | q_inf  # identity aggregate: member
            bad = jnp.sum((~ok_r).astype(jnp.int32), axis=0)  # (B,)
            out_ref[:, :] = (bad == 0)[None].astype(jnp.uint32)

    def check(points, weights):
        B = points.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        assert points.shape[1] == K
        nbt = B // lanes
        points = fp24_from_fp25(points)
        if Kp != K:
            pad_pts = jnp.zeros((B, Kp - K, 3, L), dtype=jnp.uint32)
            points = jnp.concatenate([points, pad_pts], axis=1)
        pts_k = jnp.moveaxis(points, 0, -1)  # (Kp, 3, L, B)

        # 16-bit weights -> (RNW, Kp) signed digit planes, lane-broadcast
        w = jnp.asarray(weights, jnp.uint32)
        w_limbs = jnp.stack([w & 0xFFFF, (w >> 16) & 0xFFFF], axis=-1)
        mags, negs = signed_digits_msb(w_limbs, wbits, nbits=NBITS)
        # (NW, rounds, K) -> (rounds*NW, Kp): round-major like the window loop
        mags = jnp.moveaxis(mags, 0, 1).reshape(rounds * NW, K)
        negs = jnp.moveaxis(negs, 0, 1).reshape(rounds * NW, K)
        if Kp != K:
            zpad = jnp.zeros((RNW, Kp - K), jnp.uint32)
            mags = jnp.concatenate([mags.astype(jnp.uint32), zpad], axis=1)
            negs = jnp.concatenate([negs.astype(jnp.uint32), zpad], axis=1)
        mags = jnp.broadcast_to(mags.astype(jnp.uint32)[:, :, None], (RNW, Kp, B))
        negs = jnp.broadcast_to(negs.astype(jnp.uint32)[:, :, None], (RNW, Kp, B))

        ok = pl.pallas_call(
            kernel,
            grid=(nbt, n_chunks),
            in_specs=[
                pl.BlockSpec((6, L + 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (chunk, 3, L, lanes), lambda b, c: (c, 0, 0, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RNW, chunk, lanes), lambda b, c: (0, c, b), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (RNW, chunk, lanes), lambda b, c: (0, c, b), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, lanes), lambda b, c: (0, b), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((RNW, 3, L, lanes), jnp.uint32),  # window sums
                pltpu.VMEM((chunk, TENT, 3, L, lanes), jnp.uint32),  # chunk table
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(kfp.const_args(), b3_col, beta_col, zbits, pts_k, mags, negs)
        return ok[0].astype(bool)

    return check
