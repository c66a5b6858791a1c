"""Vectorized multi-precision modular arithmetic for TPU (JAX).

Replaces the reference's arbitrary-precision `Integer` field arithmetic
(BlsTypes.hs:105-368) with fixed-width limb arrays that batch over leading
axes and map onto TPU vector/matrix units:

  - field elements: (..., L) uint32 arrays of 16-bit limbs, little-endian,
    canonical (value < N), Montgomery domain for multiplication chains;
  - products: 8-bit sublimb Toeplitz matmul (one dot_general per product —
    MXU-friendly, log-depth, no per-limb Python unrolling so compiled HLO
    stays compact even inside pairing loops);
  - carries: two lazy fold rounds then an exact carry-lookahead resolved with
    jax.lax.associative_scan (log-depth);
  - Montgomery: separated-operand one-shot reduction m = T*N' mod R,
    T' = (T + m*N)/R with R = 2^(16*L) chosen so that N/R <= 2^-17, keeping
    a single conditional subtraction sufficient.

Limb counts are deliberately oversized (L=17 for Fr, L=25 for Fp) to buy the
redundancy margin. All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)
MASK8 = np.uint32(0xFF)


def int_to_limbs(x: int, L: int) -> np.ndarray:
    out = np.zeros(L, dtype=np.uint32)
    for i in range(L):
        out[i] = (x >> (16 * i)) & 0xFFFF
    assert x >> (16 * L) == 0, "value does not fit limb count"
    return out


def limbs_to_int(a) -> int:
    a = np.asarray(a)
    return sum(int(v) << (16 * i) for i, v in enumerate(a.reshape(-1)))


class FieldSpec:
    """Precomputed constants for one prime field.

    margin_bits: required log2(R/N) headroom. The default 17 supports the
    lazy-sum helpers (reduce_lazy/sum_lazy/dot_lazy fold raw sums of up to
    2^15 products in one Montgomery pass). margin_bits >= 2 is enough for
    plain mul/add/sub chains in the [0, 2N) lazy domain (pallas_core) —
    specs built with a smaller margin MUST NOT be used with the lazy-sum
    helpers."""

    def __init__(self, modulus: int, limbs: int, name: str, margin_bits: int = 17):
        self.N = modulus
        self.L = limbs
        self.name = name
        self.margin_bits = margin_bits
        R = 1 << (16 * limbs)
        assert modulus < R and (modulus << margin_bits) < R, (
            f"need N/R <= 2^-{margin_bits} margin"
        )
        self.R = R
        self.R_mod = R % modulus
        self.R2_mod = (R * R) % modulus
        self.N_inv_neg = (-pow(modulus, -1, R)) % R  # N' with N*N' = -1 mod R
        self.n_limbs = int_to_limbs(modulus, limbs)
        self.nprime_limbs = int_to_limbs(self.N_inv_neg, limbs)
        self.neg_n_limbs = int_to_limbs(R - modulus, limbs)  # R - N for cond-subtract
        self.one_mont = int_to_limbs(self.R_mod, limbs)
        self.r2_limbs = int_to_limbs(self.R2_mod, limbs)
        self.zero = np.zeros(limbs, dtype=np.uint32)
        # static Toeplitz gather index matrix for 8-bit convolution
        L8 = 2 * limbs
        K = 2 * L8 - 1
        idx = np.zeros((K, L8), dtype=np.int32)
        for k in range(K):
            for j in range(L8):
                idx[k, j] = (k - j) % (2 * L8)  # wraps into the zero-padding
        self.conv_idx = idx

        def _sublimbs(l16):
            out = np.zeros(2 * len(l16), dtype=np.int32)
            out[0::2] = l16 & 0xFF
            out[1::2] = l16 >> 8
            return out

        def _const_conv_matrix(const_limbs, out_cols):
            """C[j, k] = c8_{k-j}: x8 @ C = conv(x, const) 8-bit columns."""
            c8 = _sublimbs(const_limbs)
            C = np.zeros((L8, out_cols), dtype=np.int32)
            for j in range(L8):
                for k in range(out_cols):
                    d = k - j
                    if 0 <= d < L8:
                        C[j, k] = c8[d]
            return C

        # x * N' keeping only columns < R (mod-R product): 2L 8-bit columns
        self.conv_nprime_mat = _const_conv_matrix(self.nprime_limbs, L8)
        # x * N, all columns (padded to 2*L8 for 16-bit recombination)
        self.conv_n_mat = _const_conv_matrix(self.n_limbs, 2 * L8)

    # -- host-side conversions ------------------------------------------------
    def to_mont(self, x: int) -> np.ndarray:
        return int_to_limbs((x % self.N) * self.R_mod % self.N, self.L)

    def from_mont_int(self, limbs) -> int:
        v = limbs_to_int(limbs)
        return v * pow(self.R_mod, -1, self.N) % self.N

    def encode(self, x: int) -> np.ndarray:
        """Canonical (non-Montgomery) limb encoding."""
        return int_to_limbs(x % self.N, self.L)


FR_SPEC = FieldSpec(
    0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001, 17, "fr"
)
FP_SPEC = FieldSpec(
    0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    25,
    "fp",
)


# ---------------------------------------------------------------------------
# carry machinery
# ---------------------------------------------------------------------------

def _lazy_round(cols):
    """One fold of 16-bit carries: value-preserving, shrinks limb magnitude."""
    lo = cols & MASK16
    hi = cols >> 16
    hi_shifted = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
    return lo + hi_shifted


def _tril_mask(K: int):
    return jnp.asarray(np.tril(np.ones((K, K), dtype=bool), k=-1))


def normalize(cols):
    """Exact carry resolution: (..., K) columns (< 2^31 each) -> (..., K)
    canonical 16-bit limbs. The final carry out of the top column is dropped;
    callers size K so the true value fits.

    Carry-lookahead without sequential scans: generate/propagate flags plus a
    cumsum + one outer comparison (O(K^2) cheap elementwise work, ~7 HLO ops —
    compile-friendly, which matters when this is inlined thousands of times)."""
    cols = _lazy_round(_lazy_round(cols))
    K = cols.shape[-1]
    # limbs now <= 2^16: exact carry-lookahead
    g = cols >> 16  # in {0, 1}
    p = (cols & MASK16) == MASK16
    # s_j = #non-propagating positions up to j (inclusive)
    s = jnp.cumsum(jnp.where(p, 0, 1).astype(jnp.int32), axis=-1)
    s_km1 = jnp.concatenate([jnp.zeros_like(s[..., :1]), s[..., :-1]], axis=-1)
    # carry into k  <=>  exists j < k with g_j and all-propagate over (j, k-1]
    eqmat = s_km1[..., :, None] == s[..., None, :]
    hit = g[..., None, :].astype(bool) & eqmat & _tril_mask(K)
    carry_in = jnp.any(hit, axis=-1).astype(jnp.uint32)
    return (cols + carry_in) & MASK16


# ---------------------------------------------------------------------------
# products
# ---------------------------------------------------------------------------

def _to_sublimbs(a):
    """(..., L) limbs -> (..., 2L) 8-bit-ish sublimbs. The hi half is NOT
    masked: limbs slightly above 2^16 (lazy forms) keep their excess in hi,
    preserving value; convolution column bounds stay far below 2^31."""
    lo = a & MASK8
    hi = a >> 8
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], -1)


def _recombine16(c8):
    """(..., 2K) 8-bit columns -> (..., K) 16-bit columns."""
    c8 = c8.reshape(*c8.shape[:-1], c8.shape[-1] // 2, 2)
    return c8[..., 0] + (c8[..., 1] << 8)


def _conv_const_columns(spec: FieldSpec, x, which: str):
    """Product with a static constant via one static-matrix matmul.
    which='nprime': x*N' mod R as (..., L) 16-bit columns;
    which='n': full x*N as (..., 2L) 16-bit columns.
    x limbs may be lazy up to 2^16 (sublimb hi <= 256 keeps sums < 2^26)."""
    mat = spec.conv_nprime_mat if which == "nprime" else spec.conv_n_mat
    x8 = _to_sublimbs(x)
    c8 = jnp.einsum("...j,jk->...k", x8.astype(jnp.int32), jnp.asarray(mat)).astype(
        jnp.uint32
    )
    return _recombine16(c8)


def _conv_columns(spec: FieldSpec, a, b):
    """Full product as 16-bit columns: (..., L),(..., L) -> (..., 2L) lazy
    columns (each < 2^31). One batched Toeplitz matvec."""
    L8 = 2 * spec.L
    a8 = _to_sublimbs(a)
    b8 = _to_sublimbs(b)
    a8p = jnp.concatenate([a8, jnp.zeros_like(a8)], axis=-1)  # zero pad region
    toep = jnp.take(a8p, jnp.asarray(spec.conv_idx), axis=-1)  # (..., 2L8-1, L8)
    c8 = jnp.einsum(
        "...kj,...j->...k", toep.astype(jnp.int32), b8.astype(jnp.int32)
    ).astype(jnp.uint32)  # 8-bit column sums < 2^22
    c8 = jnp.concatenate([c8, jnp.zeros_like(c8[..., :1])], axis=-1)  # to 2*L8
    return _recombine16(c8)


# ---------------------------------------------------------------------------
# field ops (all return canonical limbs < N)
# ---------------------------------------------------------------------------

def _cond_sub_n(spec: FieldSpec, s):
    """s (..., L+1) canonical limbs with value < 2N: subtract N if >= N."""
    neg_n = jnp.asarray(np.concatenate([spec.neg_n_limbs, np.zeros(1, np.uint32)]))
    z = normalize(s + neg_n)  # s + (R - N); top limb catches the R overflow
    ge = z[..., -1:] > 0  # s >= N  <=>  s + R - N >= R
    return jnp.where(ge, z[..., : spec.L], s[..., : spec.L])


def add(spec: FieldSpec, a, b):
    s = jnp.concatenate([a, jnp.zeros_like(a[..., :1])], axis=-1) + jnp.concatenate(
        [b, jnp.zeros_like(b[..., :1])], axis=-1
    )
    return _cond_sub_n(spec, normalize(s))


def sub(spec: FieldSpec, a, b):
    # a + N - b, computed as a + N + (complement(b)) + 1 - R
    n = jnp.asarray(np.concatenate([spec.n_limbs, np.zeros(1, np.uint32)]))
    comp_b = jnp.concatenate(
        [(MASK16 - b), jnp.zeros_like(b[..., :1])], axis=-1
    )
    a_ext = jnp.concatenate([a, jnp.zeros_like(a[..., :1])], axis=-1)
    one = jnp.concatenate(
        [jnp.ones_like(a[..., :1]), jnp.zeros_like(a)], axis=-1
    )
    s = normalize(a_ext + n + comp_b + one)
    # value is a + N - b + R with a+N-b < 2N < R, so the top limb is exactly
    # the +R from the complement trick: drop it
    s = jnp.concatenate([s[..., :-1], jnp.zeros_like(s[..., :1])], axis=-1)
    return _cond_sub_n(spec, s)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub(spec, zero, a)


def mont_mul_conv(spec: FieldSpec, a, b):
    """Montgomery product via 8-bit convolutions (matmul-shaped; one exact
    normalization — the m computation only needs congruence mod R, which
    survives lazy columns)."""
    L = spec.L
    t = _conv_columns(spec, a, b)  # (..., 2L) lazy columns of a*b
    t = _lazy_round(_lazy_round(t))  # limbs <= 2^16, value preserved
    # m must be exact (< R), else the final quotient can exceed 2N and break
    # the single conditional subtraction.
    m = normalize(_conv_const_columns(spec, t[..., :L], "nprime"))
    # S = T + m*N is divisible by R; low L limbs of the exact form are zero
    mn = _conv_const_columns(spec, m, "n")
    pad = jnp.zeros_like(t[..., :1])
    S = jnp.concatenate([t, pad], axis=-1) + jnp.concatenate([mn, pad], axis=-1)
    S = normalize(S)
    out = S[..., L:]  # L+1 limbs, value < N(1 + 2^-17)
    return _cond_sub_n(spec, out)


def mont_mul_cios(spec: FieldSpec, a, b):
    """Montgomery product via a lazy CIOS fori_loop: simple elementwise HLO,
    L sequential steps vectorized over the batch.

    The loop body uses in-place `.at[].add` slice updates deliberately: a
    scatter-free concat/rotate variant (the form the Pallas kernels use) was
    measured >7x SLOWER to compile on XLA:CPU (the test/dryrun backend) with
    no measurable effect on the TPU path, where the hot ops run as Pallas
    kernels anyway.

    Column bound: each physical column lives <= L shifts and gains at most
    ~4*2^16 + carry per step, staying < 2^23 — far from uint32 overflow. The
    low column is exact mod 2^16 at every step (all its contributions land
    in-place), so m_i is exact and the classic CIOS bound gives a final
    value < N(1 + 2^-17) with our oversized R."""
    L = spec.L
    n_limbs = jnp.asarray(spec.n_limbs)
    n0p = jnp.uint32(spec.nprime_limbs[0])
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*batch, L))
    b = jnp.broadcast_to(b, (*batch, L))
    t0 = jnp.zeros((*batch, L + 2), dtype=jnp.uint32)

    def body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)
        p = ai * b  # exact: both < 2^16 -> < 2^32
        t = t.at[..., :L].add(p & MASK16)
        t = t.at[..., 1 : L + 1].add(p >> 16)
        m = (t[..., :1] * n0p) & MASK16
        q = m * n_limbs
        t = t.at[..., :L].add(q & MASK16)
        t = t.at[..., 1 : L + 1].add(q >> 16)
        t = t.at[..., 1].add(t[..., 0] >> 16)  # column 0 is now 0 mod 2^16
        return jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)

    t = jax.lax.fori_loop(0, L, body, t0)
    out = normalize(t)[..., : L + 1]
    return _cond_sub_n(spec, out)


# Default Montgomery multiply. The conv form wins on narrow dependent chains
# (perf_probe: 22us vs 92us per mul) but its per-element Toeplitz gather
# materializes (..., 2L, 4L) intermediates, which destroys wide batched shapes
# (decompress/MSM measured 4-6x slower at batch 256). CIOS is latency-bound
# but shape-independent; the hot wide paths move to Pallas kernels
# (ops/pallas_*.py) where the limb loop is straight-line Mosaic vector code.
mont_mul = mont_mul_cios


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def mont_pow_static(spec: FieldSpec, a, exponent: int):
    """a^exponent (Montgomery domain) for a static exponent: lax.scan over the
    exponent bits, MSB first — the kernel analog of the reference's fixed
    addition chains (powMod, BlsTypes.hs:185-192)."""
    if exponent == 0:
        one = jnp.asarray(spec.one_mont)
        return jnp.broadcast_to(one, a.shape).astype(jnp.uint32)
    bits = [int(b) for b in bin(exponent)[2:]]
    bits_arr = jnp.asarray(np.array(bits[1:], dtype=np.uint32))  # skip leading 1

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        acc = jnp.where(bit.astype(bool), mont_mul(spec, acc, a), acc)
        return acc, None

    out, _ = jax.lax.scan(body, a, bits_arr)
    return out


def mont_inv(spec: FieldSpec, a):
    """a^-1 via Fermat (exponent N-2) — used only at batch-inversion roots."""
    return mont_pow_static(spec, a, spec.N - 2)


def to_mont(spec: FieldSpec, a):
    """Canonical limbs -> Montgomery domain."""
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs))


def from_mont(spec: FieldSpec, a):
    one = jnp.concatenate(
        [jnp.ones_like(a[..., :1]), jnp.zeros_like(a[..., 1:])], axis=-1
    )
    return mont_mul(spec, a, one)


def reduce_lazy(spec: FieldSpec, x):
    """Reduce a lazy limb array (raw sums of < 2^15 canonical elements, limbs
    < 2^31) to canonical form: one Montgomery pass with b = R mod N."""
    assert spec.margin_bits >= 17, "lazy sums need the 2^17 R/N margin"
    x = _lazy_round(_lazy_round(x))
    return mont_mul(spec, x, jnp.asarray(spec.one_mont))


def dot_lazy(spec: FieldSpec, a, b, axis=-2):
    """Inner product over a static axis: elementwise Montgomery products,
    then a raw limb sum reduced in one Montgomery pass (the kernel analog of
    the verifier's innerProduct, verification_halo2_kzg.hbs:64-69)."""
    prods = mont_mul(spec, a, b)
    return reduce_lazy(spec, jnp.sum(prods, axis=axis))


def sum_lazy(spec: FieldSpec, a, axis=-2):
    return reduce_lazy(spec, jnp.sum(a, axis=axis))


def batch_inv(spec: FieldSpec, xs, axis: int = -2, inv_fn=None):
    """Montgomery-trick batch inversion along a static axis (the reference's
    batchInverses, LagrangePolynomialEvaluation.hs:60-76), with a single
    Fermat chain at the root (overridable with a Pallas ladder via inv_fn).
    Zero inputs produce zeros (callers guard)."""
    xs_m = jnp.moveaxis(xs, axis, 0)  # (K, ..., L)

    def fwd(acc, x):
        nxt = mont_mul(spec, acc, x)
        return nxt, acc  # prefix products EXCLUSIVE

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), xs_m.shape[1:]).astype(jnp.uint32)
    total, prefix_excl = jax.lax.scan(fwd, one, xs_m)
    inv_total = (inv_fn or (lambda t: mont_inv(spec, t)))(total)

    def bwd(acc, inp):
        x, pre = inp
        out = mont_mul(spec, acc, pre)
        acc = mont_mul(spec, acc, x)
        return acc, out

    _, inv_rev = jax.lax.scan(bwd, inv_total, (xs_m[::-1], prefix_excl[::-1]))
    return jnp.moveaxis(inv_rev[::-1], 0, axis)


def is_zero(spec: FieldSpec, a):
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond (...,) bool -> limbwise select between (..., L) arrays."""
    return jnp.where(cond[..., None], a, b)


# convenience: spec-bound namespaces -----------------------------------------

class Field:
    """Thin bound wrapper so call sites read fr.mul(a, b)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L

    def add(self, a, b):
        return add(self.spec, a, b)

    def sub(self, a, b):
        return sub(self.spec, a, b)

    def neg(self, a):
        return neg(self.spec, a)

    def mul(self, a, b):
        return mont_mul(self.spec, a, b)

    def sqr(self, a):
        return mont_sqr(self.spec, a)

    def pow(self, a, e: int):
        return mont_pow_static(self.spec, a, e)

    def inv(self, a):
        return mont_inv(self.spec, a)

    def to_mont(self, a):
        return to_mont(self.spec, a)

    def from_mont(self, a):
        return from_mont(self.spec, a)

    def is_zero(self, a):
        return is_zero(self.spec, a)

    def eq(self, a, b):
        return eq(self.spec, a, b)

    def const(self, x: int):
        """Montgomery-domain constant as a jnp array."""
        return jnp.asarray(self.spec.to_mont(x))

    def batch_inv(self, xs, axis=-2, inv_fn=None):
        return batch_inv(self.spec, xs, axis, inv_fn=inv_fn)

    def dot_lazy(self, a, b, axis=-2):
        return dot_lazy(self.spec, a, b, axis)

    def sum_lazy(self, a, axis=-2):
        return sum_lazy(self.spec, a, axis)

    def zeros(self, shape=()):
        return jnp.zeros((*shape, self.spec.L), dtype=jnp.uint32)

    def one(self, shape=()):
        return jnp.broadcast_to(jnp.asarray(self.spec.one_mont), (*shape, self.spec.L)).astype(jnp.uint32)


fr = Field(FR_SPEC)
fp = Field(FP_SPEC)
