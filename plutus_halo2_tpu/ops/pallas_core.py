"""Kernel-layout field arithmetic for Pallas TPU kernels.

Same math as ops/limb.py but in the layout Pallas kernels want: the 128-wide
TPU *lane* axis is the proof-batch axis (last), limbs live on the sublane axis
(-2), and any extra leading axes (tower coefficients, MSM points) fold into
sublanes. All functions are pure jnp on VALUES — they compose inside a
pallas_call body (where each op is a Mosaic vector instruction, not a
dispatched XLA kernel) and also run under plain jit/interpret mode for tests.

Shapes: a field element batch is (..., L, B) uint32 of 16-bit limbs,
little-endian along axis -2. The Montgomery domain, oversized limb counts and
carry discipline are identical to ops/limb.py (same FieldSpec constants), so
results are bit-identical to the (..., L)-layout ops after a transpose.

Pallas kernels may not capture array constants from the enclosing trace, so
the field constants (modulus columns etc.) are bundled as explicit kernel
inputs: pass ``KField.const_args()`` to ``pallas_call`` and rebind inside the
kernel with ``kf.bind(consts_ref[...])``. Outside kernels the unbound object
materializes the same constants as ordinary jnp arrays.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from .limb import FP_SPEC, FR_SPEC, MASK16, FieldSpec, int_to_limbs, mont_mul_cios

__all__ = [
    "KField", "kfp", "kfr", "FP24_SPEC", "to_kernel_layout",
    "from_kernel_layout", "fp24_from_fp25", "fp25_from_fp24",
    "host_reencode24",
]

# Kernel-side Fp uses 24 limbs — 381 bits fit 24x16 = 384 exactly, so field
# elements occupy THREE (8, 128) vregs instead of four (25 sublanes round up
# to 32): ~25% fewer vector ops on every kernel Fp mul/add/sub. The price is
# a thin R/N margin (R = 2^384, N ~ 2^380.26, N/R = 2^-3.74), which is still
# ample for the [0, 2N) lazy domain: mul inputs < 2N give
# T < N(4N/R + 1) < 1.33N. Lazy SUMS (reduce_lazy et al.) are forbidden on
# this spec (margin_bits=2) — kernels never use them. The XLA level stays on
# the 25-limb FP_SPEC (R25 = 2^400 Montgomery domain); values cross the
# kernel boundary through the domain conversions below.
FP24_SPEC = FieldSpec(FP_SPEC.N, 24, "fp24", margin_bits=2)

# value-level multipliers for the R25 <-> R24 Montgomery domain change:
#   mont_mul_R25(v*R25, R24 mod N)            = v*R24
#   mont_mul_R25(v*R24, R25*(R25/R24) mod N)  = v*R25   (R25/R24 = 2^16)
_R24_RAW = int_to_limbs(FP24_SPEC.R % FP_SPEC.N, FP_SPEC.L)
_R25_FROM_R24_RAW = int_to_limbs(
    FP_SPEC.R * (FP_SPEC.R // FP24_SPEC.R) % FP_SPEC.N, FP_SPEC.L
)


def fp24_from_fp25(x):
    """XLA level: (..., 25) R25-Montgomery canonical -> (..., 24) R24."""
    y = mont_mul_cios(FP_SPEC, x, jnp.asarray(_R24_RAW))
    # canonical (< N < 2^381): limb 24 (bits 384..399) is zero
    return y[..., : FP24_SPEC.L]


def fp25_from_fp24(y):
    """XLA level: (..., 24) R24-Montgomery canonical -> (..., 25) R25."""
    y25 = jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1)
    return mont_mul_cios(FP_SPEC, y25, jnp.asarray(_R25_FROM_R24_RAW))


def host_reencode24(arr) -> np.ndarray:
    """Host: np (..., 25) R25-Montgomery -> (..., 24) R24-Montgomery."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, FP_SPEC.L)
    out = np.stack(
        [FP24_SPEC.to_mont(FP_SPEC.from_mont_int(row)) for row in flat]
    )
    return out.reshape(*arr.shape[:-1], FP24_SPEC.L)


def to_kernel_layout(x):
    """(B, ..., L) host/XLA layout -> (..., L, B) kernel layout."""
    return jnp.moveaxis(x, 0, -1)


def from_kernel_layout(x):
    """(..., L, B) -> (B, ..., L)."""
    return jnp.moveaxis(x, -1, 0)


def _carry_once(x):
    """One value-preserving 16-bit carry fold along the limb axis."""
    lo = x & MASK16
    hi = x >> 16
    hi_up = jnp.concatenate([jnp.zeros_like(hi[..., :1, :]), hi[..., :-1, :]], axis=-2)
    return lo + hi_up


def staged_broadcast(x, shape):
    """broadcast_to in Mosaic-friendly stages: lanes first, then leading dims
    (a single broadcast touching both sublanes and lanes is unimplemented)."""
    if x.shape == tuple(shape):
        return x
    if x.shape[-1] != shape[-1]:
        x = jnp.broadcast_to(x, (*x.shape[:-1], shape[-1]))
    return jnp.broadcast_to(x, shape)


class KField:
    """Field ops bound to a FieldSpec, kernel layout (..., L, B).

    Domain discipline (lazy reduction): every op accepts and produces values
    in [0, 2N) — not fully reduced. mont_mul with inputs < 2N yields
    T = (a*b + m*N)/R < (4N^2 + RN)/R = N(1 + 4N/R) < N(1 + 2^-15) < 2N with
    our oversized R (N/R <= 2^-17), so the conditional subtraction classic
    CIOS ends with is dropped entirely. add/sub conditionally subtract 2N
    instead of N (same cost as before). Exact zero is preserved by every op
    (sub(x,x) = 2N -> cond-sub -> 0), so is_zero stays sound; eq/compare
    sites must canonicalize via canon() first (a value v ≡ w (mod N) may
    differ from w by N). Kernel *boundary* outputs that flow back into
    XLA-level canonical-domain code must be canon()ed."""

    # names of the packed constant rows (each a (L+1,)-padded uint32 row)
    CONST_ROWS = ("n", "neg_n", "one_mont", "r2", "n2", "neg_n2")

    def __init__(self, spec: FieldSpec, unroll_mul: bool = False):
        self.spec = spec
        self.L = spec.L
        # unroll_mul=True emits the CIOS limb loop as straight-line code —
        # Mosaic compiles ONE big block faster than many small scf.for
        # regions; False wraps it in a fori_loop — XLA-CPU (tests, interpret
        # mode) compiles the shared body ~12x faster than an unrolled one.
        self.unroll_mul = unroll_mul
        self.n0p = np.uint32(spec.nprime_limbs[0])
        pad = lambda v: np.concatenate([v, np.zeros(1, np.uint32)])
        from .limb import int_to_limbs

        n2 = pad(int_to_limbs(2 * spec.N, spec.L))
        neg_n2 = pad(int_to_limbs(spec.R - 2 * spec.N, spec.L))
        self._np_consts = np.stack(
            [
                pad(spec.n_limbs),
                pad(spec.neg_n_limbs),
                pad(spec.one_mont),
                pad(spec.r2_limbs),
                n2,
                neg_n2,
            ]
        )  # (6, L+1)
        self._bound = None  # (6, L+1) jnp value when inside a kernel

    # -- constants plumbing --------------------------------------------------
    def const_args(self) -> np.ndarray:
        """Host-side constant bundle to pass as a pallas_call input:
        (6, L+1) uint32."""
        return self._np_consts

    def bind(self, consts, unroll_mul: bool | None = None) -> "KField":
        """In-kernel: rebind to a consts VALUE read from the kernel input ref
        (shape (6, L+1)); optionally override the mul emission style (pass
        unroll_mul=not interpret from kernels)."""
        out = copy.copy(self)
        out._bound = consts
        if unroll_mul is not None:
            out.unroll_mul = unroll_mul
        return out

    def _row(self, name: str, ext: bool = False):
        """Constant as (L(+1), 1) column for lane broadcast."""
        i = self.CONST_ROWS.index(name)
        if self._bound is not None:
            row = self._bound[i]
        else:
            row = jnp.asarray(self._np_consts[i])
        row = row if ext else row[: self.L]
        return row[:, None]

    # -- constructors ---------------------------------------------------------
    def zeros(self, shape):
        """shape = (..., B) -> zero elements (..., L, B)."""
        return jnp.zeros((*shape[:-1], self.L, shape[-1]), dtype=jnp.uint32)

    def one(self, shape):
        return staged_broadcast(
            self._row("one_mont"), (*shape[:-1], self.L, shape[-1])
        ).astype(jnp.uint32)

    # -- carries -----------------------------------------------------------
    def normalize(self, cols):
        """Exact carry resolution along axis -2 (columns < 2^31 -> canonical
        16-bit limbs; final carry out of the top column dropped).

        Kogge-Stone parallel prefix over the (generate, propagate) carry
        monoid: after two value-preserving folds every column is <= 2^16, so
        g in {0,1} and carries resolve in ceil(log2 K) combine steps on
        (K, B)-shaped data — O(K log K) work instead of the O(K^2) of a
        pairwise lookahead matrix."""
        cols = _carry_once(_carry_once(cols))
        K = cols.shape[-2]
        G = (cols >> 16).astype(jnp.uint32)  # in {0, 1}: generates a carry
        Pp = ((cols & MASK16) == MASK16).astype(jnp.uint32)  # propagates

        def _up(x, k):
            return jnp.concatenate(
                [jnp.zeros_like(x[..., :k, :]), x[..., :-k, :]], axis=-2
            )

        shift = 1
        while shift < K:
            # extend each position's aggregate window downward by `shift`
            G = G | (Pp & _up(G, shift))
            Pp = Pp & _up(Pp, shift)
            shift *= 2
        carry_in = _up(G, 1)  # carry into k = carry out of the prefix [0, k-1]
        return (cols + carry_in) & MASK16

    def _cond_sub_n(self, s):
        """s: (..., L+1, B) canonical limbs, value < 2N -> (..., L, B) < N."""
        z = self.normalize(s + staged_broadcast(self._row("neg_n", ext=True), s.shape))
        ge = z[..., -1:, :] > 0
        return jnp.where(ge, z[..., : self.L, :], s[..., : self.L, :])

    def _cond_sub_2n(self, s):
        """s: (..., L+1, B) canonical limbs, value < 4N -> (..., L, B) < 2N."""
        z = self.normalize(s + staged_broadcast(self._row("neg_n2", ext=True), s.shape))
        ge = z[..., -1:, :] > 0
        return jnp.where(ge, z[..., : self.L, :], s[..., : self.L, :])

    def canon(self, a):
        """Lazy-domain value (..., L, B) < 2N -> canonical < N. Apply at
        kernel boundaries (outputs consumed by XLA-level canonical code) and
        before limbwise equality comparisons."""
        pad = jnp.zeros_like(a[..., :1, :])
        return self._cond_sub_n(jnp.concatenate([a, pad], axis=-2))

    # -- ring ops (domain: inputs and outputs in [0, 2N)) ---------------------
    def add(self, a, b):
        pad = jnp.zeros_like(a[..., :1, :])
        s = jnp.concatenate([a, pad], axis=-2) + jnp.concatenate([b, pad], axis=-2)
        return self._cond_sub_2n(self.normalize(s))

    def sub(self, a, b):
        # a + 2N - b via complement: a + 2N + (~b) + 1 - R; b < 2N keeps the
        # true value in (0, 4N), one conditional 2N-subtraction suffices
        pad = jnp.zeros_like(a[..., :1, :])
        comp_b = jnp.concatenate([MASK16 - b, pad], axis=-2)
        a_ext = jnp.concatenate([a, pad], axis=-2)
        one = jnp.concatenate(
            [jnp.ones_like(a[..., :1, :]), jnp.zeros_like(a)], axis=-2
        )
        s = self.normalize(
            a_ext + staged_broadcast(self._row("n2", ext=True), a_ext.shape) + comp_b + one
        )
        s = jnp.concatenate([s[..., :-1, :], jnp.zeros_like(s[..., :1, :])], axis=-2)
        return self._cond_sub_2n(s)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mont_mul(self, a, b):
        """CIOS Montgomery product, Python-unrolled over the L limb steps
        (inside a Pallas kernel each step is straight-line Mosaic vector code;
        there is no XLA per-op dispatch to amortize).

        Two-accumulator form: tl holds column-aligned low halves; the high
        halves of each step's two products (a_i*b and q = m*N) contribute at
        column +1 and are folded in during the per-step shift-down, saving the
        padded concat-adds of the classic single-accumulator loop (~16 vector
        ops/step on (L, B) data vs ~22 on (L+2, B)).

        Column bound: tl gains < 2^17 per step plus sub-1 carry residue, so
        columns stay < L*2^17 + L < 2^23 for L <= 32 — far from uint32
        overflow. tl[0] is exact mod 2^16 at every step (all column-0
        contributions land in-place; wrap-around of tl[0]*n0p is harmless mod
        2^16), so m is exact. Lazy domain: inputs < 2N give
        T = (a*b + m*N)/R < N(1 + 4N/R) < N(1 + 2^-15) < 2N, so NO final
        conditional subtraction — the [0, 2N) invariant is preserved and the
        classic CIOS cond-sub (~8% of the op) is saved."""
        L = self.L
        # the per-limb-sliced operand must be natively lane-wide: slicing a
        # lane-broadcast value makes Mosaic emit an unsupported two-axis
        # (1,1)->(L,B) broadcast; the product is commutative, so swap
        if a.shape[-1] == 1 and b.shape[-1] != 1:
            a, b = b, a
        batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
        lanes = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])[0]
        n_col = staged_broadcast(self._row("n"), (L, lanes))
        a = staged_broadcast(a, (*batch, L, lanes))
        b = staged_broadcast(b, (*batch, L, lanes))
        tl0 = jnp.zeros((*batch, L, lanes), dtype=jnp.uint32)
        z1 = jnp.zeros((*batch, 1, lanes), dtype=jnp.uint32)
        zL1 = jnp.zeros((*batch, L - 1, lanes), dtype=jnp.uint32)

        # Loop emission is selectable (see __init__): fori_loop shares one
        # traced body (fast XLA-CPU compile); unrolled is one straight-line
        # block (fast Mosaic compile AND runtime — measured 7.5x faster
        # Mosaic compile and ~25% faster runtime than the loop form). In the
        # loop form the per-step operand limb a_i is peeled by rotating a
        # copy of `a` one limb per step and reading row 0 (static slices
        # only — no dynamic sublane indexing); the unrolled form slices a_i
        # statically, saving the rotation copy (~7% of the op).
        def step(tl, ai):
            p = ai * b  # exact: both operands < 2^16
            tl = tl + (p & MASK16)
            m = (tl[..., 0:1, :] * self.n0p) & MASK16
            q = m * n_col
            tl = tl + (q & MASK16)
            # column 0 is now 0 mod 2^16; divide by 2^16: drop column 0,
            # fold its carry and both products' high halves (column +1 pre-
            # shift = column 0 post-shift) into the shifted accumulator
            hsum = (p >> 16) + (q >> 16)
            carry0 = tl[..., 0:1, :] >> 16
            return (
                jnp.concatenate([tl[..., 1:, :], z1], axis=-2)
                + hsum
                + jnp.concatenate([carry0, zL1], axis=-2)
            )

        if self.unroll_mul:
            tl = tl0
            for i in range(L):
                tl = step(tl, a[..., i : i + 1, :])
        else:

            def body(_i, carry):
                tl, arot = carry
                ai = arot[..., 0:1, :]
                arot = jnp.concatenate(
                    [arot[..., 1:, :], arot[..., 0:1, :]], axis=-2
                )
                return (step(tl, ai), arot)

            tl, _ = jax.lax.fori_loop(0, L, body, (tl0, a))
        out = self.normalize(jnp.concatenate([tl, z1], axis=-2))
        # value < 2N < R: the top column is zero, drop it (no cond-sub)
        return out[..., : self.L, :]

    def sqr(self, a):
        return self.mont_mul(a, a)

    def mul(self, a, b):
        return self.mont_mul(a, b)

    def pow_static(self, a, exponent: int, unroll: bool = False):
        """a^exponent for a static exponent. unroll=True emits straight-line
        code (use inside kernels); unroll=False wraps the square-and-multiply
        ladder in a lax.scan (use at the XLA level)."""
        if exponent == 0:
            return self.one(a.shape[:-2] + a.shape[-1:])
        bits = [int(c) for c in bin(exponent)[2:]]
        if unroll:
            acc = a
            for bit in bits[1:]:
                acc = self.sqr(acc)
                if bit:
                    acc = self.mont_mul(acc, a)
            return acc
        bits_arr = jnp.asarray(np.array(bits[1:], dtype=np.uint32))

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = jnp.where(bit.astype(bool), self.mont_mul(acc, a), acc)
            return acc, None

        out, _ = jax.lax.scan(body, a, bits_arr)
        return out

    # -- predicates / selects ----------------------------------------------
    def is_zero(self, a):
        """Exact-zero test. Sound in the lazy domain: every op maps exact-0
        inputs to exact-0 outputs (sub(x,x) = 2N -> cond-sub-2N -> 0), and no
        op emits the alternative zero representative N."""
        return jnp.all(a == 0, axis=-2)

    def eq(self, a, b):
        """Value equality mod N: canonicalizes both sides first (lazy-domain
        representatives may differ by N)."""
        return jnp.all(self.canon(a) == self.canon(b), axis=-2)

    def select(self, cond, a, b):
        """cond (..., B) bool -> limbwise select."""
        return jnp.where(cond[..., None, :], a, b)


def window_digits(exponent: int, wbits: int = 4) -> np.ndarray:
    """MSB-first fixed-window digits of a static exponent: (1, NW) int32.
    Kernel-side companion of pow_win_loop (digits ride in SMEM because Pallas
    kernels cannot capture array constants)."""
    bits = bin(exponent)[2:]
    padlen = -(-len(bits) // wbits) * wbits
    bits = bits.zfill(padlen)
    return np.array(
        [[int(bits[k : k + wbits], 2) for k in range(0, padlen, wbits)]],
        dtype=np.int32,
    )


def pow_win_loop_tab(F: KField, a, digits_ref, tab_ref):
    """pow_win_loop with the 16-entry power table in a VMEM scratch ref
    (shape (16, *a.shape)), selected per window by ONE dynamic slice instead
    of a 16-wide one-hot compare/sum — the select was ~40% of the ladder for
    wide operands (perf_probe sqrtp). Semantics identical to pow_win_loop."""
    import jax.experimental.pallas as pl

    nw = digits_ref.shape[-1]
    tab_ref[0] = F.one(a.shape[:-2] + a.shape[-1:])
    tab_ref[1] = a
    cur = a
    for i in range(14):
        cur = F.mont_mul(cur, a)
        tab_ref[i + 2] = cur

    def _select(d):
        return tab_ref[pl.ds(d, 1)][0]

    def body(i, acc):
        acc = F.sqr(F.sqr(F.sqr(F.sqr(acc))))
        return F.mont_mul(acc, _select(digits_ref[0, i]))

    return jax.lax.fori_loop(1, nw, body, _select(digits_ref[0, 0]))


def pow_win_loop(F: KField, a, digits_ref):
    """a^e for a static exponent whose MSB-first 4-bit window digits sit in
    SMEM (1, NW): builds the 16-entry power table once, then a fori_loop of
    4 squarings + one branchless one-hot table multiply per window — ~490
    muls for a 381-bit exponent vs 760 for square-and-always-multiply (the
    kernel analog of the reference's fixed powMod chains, BlsTypes.hs:185-192)."""
    nw = digits_ref.shape[-1]
    tab = [F.one(a.shape[:-2] + a.shape[-1:]), a]
    for _ in range(14):
        tab.append(F.mont_mul(tab[-1], a))
    table = jnp.stack(tab, axis=0)  # (16, ..., L, B)
    idx = jax.lax.broadcasted_iota(jnp.int32, table.shape, 0)

    def _select(d):
        return jnp.sum(
            jnp.where(idx == d, table, 0).astype(jnp.int32), axis=0
        ).astype(jnp.uint32)

    def body(i, acc):
        acc = F.sqr(F.sqr(F.sqr(F.sqr(acc))))
        return F.mont_mul(acc, _select(digits_ref[0, i]))

    return jax.lax.fori_loop(1, nw, body, _select(digits_ref[0, 0]))


kfp = KField(FP24_SPEC)
kfr = KField(FR_SPEC)
