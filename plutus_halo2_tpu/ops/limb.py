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
    """Precomputed constants for one prime field."""

    def __init__(self, modulus: int, limbs: int, name: str):
        self.N = modulus
        self.L = limbs
        self.name = name
        R = 1 << (16 * limbs)
        assert modulus < R and (modulus << 17) < R, "need N/R <= 2^-17 margin"
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


def _carry_combine(a, b):
    # carry transfer functions f(c) = g | (p & c); composition b∘a
    ga, pa = a
    gb, pb = b
    return (gb | (pb & ga), pa & pb)


def normalize(cols):
    """Exact carry resolution: (..., K) columns (< 2^31 each) -> (..., K)
    canonical 16-bit limbs. The final carry out of the top column is dropped;
    callers size K so the true value fits."""
    cols = _lazy_round(_lazy_round(cols))
    # limbs now <= 2^16: exact carry-lookahead
    g = (cols >> 16).astype(jnp.uint32)  # in {0, 1}
    p = ((cols & MASK16) == MASK16).astype(jnp.uint32)
    gp, _pp = jax.lax.associative_scan(_carry_combine, (g, p), axis=-1)
    carry_in = jnp.concatenate(
        [jnp.zeros_like(gp[..., :1]), gp[..., :-1]], axis=-1
    )
    return (cols + carry_in) & MASK16


# ---------------------------------------------------------------------------
# products
# ---------------------------------------------------------------------------

def _to_sublimbs(a):
    """(..., L) 16-bit limbs -> (..., 2L) 8-bit sublimbs."""
    lo = a & MASK8
    hi = (a >> 8) & MASK8
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], -1)


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
    # recombine 8-bit columns into 16-bit columns: t_k = c_{2k} + 256*c_{2k+1}
    c8 = jnp.concatenate([c8, jnp.zeros_like(c8[..., :1])], axis=-1)  # to 2*L8
    c8 = c8.reshape(*c8.shape[:-1], 2 * spec.L, 2)
    return c8[..., 0] + (c8[..., 1] << 8)


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
    one = jnp.zeros_like(a_ext).at[..., 0].set(1)
    s = normalize(a_ext + n + comp_b + one)
    # value is a + N - b + R with a+N-b < 2N < R, so the top limb is exactly
    # the +R from the complement trick: drop it
    s = s.at[..., -1].set(0)
    return _cond_sub_n(spec, s)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub(spec, zero, a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a*b*R^-1 mod N, canonical inputs/outputs."""
    L = spec.L
    t = _conv_columns(spec, a, b)  # (..., 2L) lazy
    t_ext = jnp.concatenate([t, jnp.zeros_like(t[..., :1])], axis=-1)
    T = normalize(t_ext)  # exact 16-bit limbs of a*b, 2L+1 limbs
    # m = (T mod R) * N' mod R
    m_cols = _conv_columns(spec, T[..., :L], jnp.asarray(spec.nprime_limbs))
    m = normalize(m_cols[..., :L])  # mod R: keep low L columns
    # T + m*N, then divide by R (drop low L limbs — they are zero)
    mn = _conv_columns(spec, m, jnp.asarray(spec.n_limbs))
    mn_ext = jnp.concatenate([mn, jnp.zeros_like(mn[..., :1])], axis=-1)
    S = normalize(T + mn_ext)
    out = S[..., L:]  # L+1 limbs, value < N(1 + 2^-17)
    return _cond_sub_n(spec, out)


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
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(spec, a, one)


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

    def zeros(self, shape=()):
        return jnp.zeros((*shape, self.spec.L), dtype=jnp.uint32)

    def one(self, shape=()):
        return jnp.broadcast_to(jnp.asarray(self.spec.one_mont), (*shape, self.spec.L)).astype(jnp.uint32)


fr = Field(FR_SPEC)
fp = Field(FP_SPEC)
