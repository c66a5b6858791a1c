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

from .limb import FP_SPEC, FR_SPEC, MASK16, FieldSpec

__all__ = ["KField", "kfp", "kfr", "to_kernel_layout", "from_kernel_layout"]


def to_kernel_layout(x):
    """(B, ..., L) host/XLA layout -> (..., L, B) kernel layout."""
    return jnp.moveaxis(x, 0, -1)


def from_kernel_layout(x):
    """(..., L, B) -> (B, ..., L)."""
    return jnp.moveaxis(x, -1, 0)


def _shift_down(x, k: int = 1):
    """Drop k low limbs, append k zero limbs at the top (value //= 2^(16k))."""
    zeros = jnp.zeros_like(x[..., :k, :])
    return jnp.concatenate([x[..., k:, :], zeros], axis=-2)


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


def _tril_mask(K: int):
    """Strict lower-triangular (K, K, 1) mask built from 2D iota (Pallas-safe:
    no captured array constants)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 1)
    return col < row


class KField:
    """Field ops bound to a FieldSpec, kernel layout (..., L, B)."""

    # names of the packed constant rows (each a (L+1,)-padded uint32 row)
    CONST_ROWS = ("n", "neg_n", "one_mont", "r2")

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L
        self.n0p = np.uint32(spec.nprime_limbs[0])
        pad = lambda v: np.concatenate([v, np.zeros(1, np.uint32)])
        self._np_consts = np.stack(
            [
                pad(spec.n_limbs),
                pad(spec.neg_n_limbs),
                pad(spec.one_mont),
                pad(spec.r2_limbs),
            ]
        )  # (4, L+1)
        self._bound = None  # (4, L+1) jnp value when inside a kernel

    # -- constants plumbing --------------------------------------------------
    def const_args(self) -> np.ndarray:
        """Host-side constant bundle to pass as a pallas_call input:
        (4, L+1) uint32."""
        return self._np_consts

    def bind(self, consts) -> "KField":
        """In-kernel: rebind to a consts VALUE read from the kernel input ref
        (shape (4, L+1))."""
        out = copy.copy(self)
        out._bound = consts
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
        16-bit limbs; final carry out of the top column dropped)."""
        cols = _carry_once(_carry_once(cols))
        K = cols.shape[-2]
        g = cols >> 16  # in {0, 1}
        p = (cols & MASK16) == MASK16
        # inclusive prefix sum along the limb axis, log-step (Mosaic has no
        # cumsum primitive)
        s = jnp.where(p, 0, 1).astype(jnp.int32)
        shift = 1
        while shift < K:
            shifted = jnp.concatenate(
                [jnp.zeros_like(s[..., :shift, :]), s[..., :-shift, :]], axis=-2
            )
            s = s + shifted
            shift *= 2
        s_km1 = jnp.concatenate(
            [jnp.zeros_like(s[..., :1, :]), s[..., :-1, :]], axis=-2
        )
        eqmat = s_km1[..., :, None, :] == s[..., None, :, :]  # (..., K, K, B)
        hit = g[..., None, :, :].astype(bool) & eqmat & _tril_mask(K)
        carry_in = jnp.any(hit, axis=-2).astype(jnp.uint32)
        return (cols + carry_in) & MASK16

    def _cond_sub_n(self, s):
        """s: (..., L+1, B) canonical limbs, value < 2N -> (..., L, B) < N."""
        z = self.normalize(s + staged_broadcast(self._row("neg_n", ext=True), s.shape))
        ge = z[..., -1:, :] > 0
        return jnp.where(ge, z[..., : self.L, :], s[..., : self.L, :])

    # -- ring ops ------------------------------------------------------------
    def add(self, a, b):
        pad = jnp.zeros_like(a[..., :1, :])
        s = jnp.concatenate([a, pad], axis=-2) + jnp.concatenate([b, pad], axis=-2)
        return self._cond_sub_n(self.normalize(s))

    def sub(self, a, b):
        # a + N - b via complement: a + N + (~b) + 1 - R
        pad = jnp.zeros_like(a[..., :1, :])
        comp_b = jnp.concatenate([MASK16 - b, pad], axis=-2)
        a_ext = jnp.concatenate([a, pad], axis=-2)
        one = jnp.concatenate(
            [jnp.ones_like(a[..., :1, :]), jnp.zeros_like(a)], axis=-2
        )
        s = self.normalize(
            a_ext + staged_broadcast(self._row("n", ext=True), a_ext.shape) + comp_b + one
        )
        s = jnp.concatenate([s[..., :-1, :], jnp.zeros_like(s[..., :1, :])], axis=-2)
        return self._cond_sub_n(s)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mont_mul(self, a, b):
        """CIOS Montgomery product, Python-unrolled over the L limb steps
        (inside a Pallas kernel each step is straight-line Mosaic vector code;
        there is no XLA per-op dispatch to amortize)."""
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
        t = jnp.zeros((*batch, L + 2, lanes), dtype=jnp.uint32)
        z1 = jnp.zeros((*batch, 1, lanes), dtype=jnp.uint32)
        z2 = jnp.zeros((*batch, 2, lanes), dtype=jnp.uint32)
        zL1 = jnp.zeros((*batch, L - 1, lanes), dtype=jnp.uint32)

        for i in range(L):
            ai = a[..., i : i + 1, :]
            p = ai * b  # exact: both operands < 2^16
            t = t + jnp.concatenate([p & MASK16, z2], axis=-2)
            t = t + jnp.concatenate([z1, p >> 16, z1], axis=-2)
            m = (t[..., 0:1, :] * self.n0p) & MASK16
            q = m * n_col
            t = t + jnp.concatenate([q & MASK16, z2], axis=-2)
            t = t + jnp.concatenate([z1, q >> 16, z1], axis=-2)
            # fold column 0's carry into column 1, then shift down one limb
            carry0 = t[..., 0:1, :] >> 16
            t = t + jnp.concatenate([z1, carry0, z1, zL1], axis=-2)
            t = _shift_down(t)
        out = self.normalize(t)[..., : L + 1, :]
        return self._cond_sub_n(out)

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
        return jnp.all(a == 0, axis=-2)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-2)

    def select(self, cond, a, b):
        """cond (..., B) bool -> limbwise select."""
        return jnp.where(cond[..., None, :], a, b)


kfp = KField(FP_SPEC)
kfr = KField(FR_SPEC)
