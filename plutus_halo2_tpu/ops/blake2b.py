"""Batched Blake2b-256 for TPU (JAX).

Kernel replacement for the `blake2b_256` Plutus builtin that drives the
reference's Fiat-Shamir transcript (Transcript.hs:85-88, transcript.ak:80-90).
64-bit words are modeled as (lo, hi) uint32 pairs; the per-block compression
function is traced once inside a lax.scan over blocks, so compiled size stays
flat regardless of message length. Message length is static per call site
(the transcript layout of a circuit is static), batch dims broadcast."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_IV = np.array(
    [
        0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
        0x510E527FADE682D1, 0x9B05688C2B3E6C1F, 0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
    ],
    dtype=np.uint64,
)
_IV_LO = (_IV & 0xFFFFFFFF).astype(np.uint32)
_IV_HI = (_IV >> 32).astype(np.uint32)

_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int32,
)
_SIGMA12 = np.concatenate([_SIGMA, _SIGMA[:2]], axis=0)  # 12 rounds


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    hi = a[1] + b[1] + carry
    return (lo, hi)


def _xor64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _ror64(a, r: int):
    lo, hi = a
    if r == 32:
        return (hi, lo)
    if r > 32:
        lo, hi = hi, lo
        r -= 32
    rr = np.uint32(r)
    rl = np.uint32(32 - r)
    return ((lo >> rr) | (hi << rl), (hi >> rr) | (lo << rl))


def _compress(h, m_lo, m_hi, t_lo, f_flag):
    """One Blake2b compression. h: list of 8 (lo, hi) pairs; m_lo/m_hi:
    (..., 16) message words; t_lo: uint32 byte counter (messages < 2^32);
    f_flag: bool. The 12 rounds run as a lax.scan over the SIGMA schedule so
    the round body is traced once (compile-size discipline)."""
    v = list(h) + [(jnp.uint32(_IV_LO[i]), jnp.uint32(_IV_HI[i])) for i in range(8)]
    v[12] = (v[12][0] ^ t_lo, v[12][1])
    fmask = jnp.where(f_flag, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    v[14] = (v[14][0] ^ fmask, v[14][1] ^ fmask)
    v = [(jnp.broadcast_to(a, m_lo.shape[:-1]), jnp.broadcast_to(b, m_lo.shape[:-1])) for a, b in v]

    def round_body(vs, sigma_row):
        sel_lo = jnp.take(m_lo, sigma_row, axis=-1)
        sel_hi = jnp.take(m_hi, sigma_row, axis=-1)
        m = [(sel_lo[..., i], sel_hi[..., i]) for i in range(16)]
        v = list(vs)

        def G(a, b, c, d, x, y):
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = _add64(_add64(va, vb), x)
            vd = _ror64(_xor64(vd, va), 32)
            vc = _add64(vc, vd)
            vb = _ror64(_xor64(vb, vc), 24)
            va = _add64(_add64(va, vb), y)
            vd = _ror64(_xor64(vd, va), 16)
            vc = _add64(vc, vd)
            vb = _ror64(_xor64(vb, vc), 63)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd

        G(0, 4, 8, 12, m[0], m[1])
        G(1, 5, 9, 13, m[2], m[3])
        G(2, 6, 10, 14, m[4], m[5])
        G(3, 7, 11, 15, m[6], m[7])
        G(0, 5, 10, 15, m[8], m[9])
        G(1, 6, 11, 12, m[10], m[11])
        G(2, 7, 8, 13, m[12], m[13])
        G(3, 4, 9, 14, m[14], m[15])
        return tuple(v), None

    v, _ = jax.lax.scan(round_body, tuple(v), jnp.asarray(_SIGMA12))

    return [
        (h[i][0] ^ v[i][0] ^ v[i + 8][0], h[i][1] ^ v[i][1] ^ v[i + 8][1])
        for i in range(8)
    ]


def blake2b_256(msg):
    """msg: (..., MLEN) uint8 with static MLEN -> (..., 32) uint8 digest."""
    mlen = msg.shape[-1]
    nblocks = max(1, -(-mlen // 128))
    pad = nblocks * 128 - mlen
    if pad:
        msg = jnp.concatenate(
            [msg, jnp.zeros((*msg.shape[:-1], pad), dtype=jnp.uint8)], axis=-1
        )
    # words: (..., nblocks, 16, 8) LE bytes -> lo/hi (..., nblocks, 16)
    b = msg.reshape(*msg.shape[:-1], nblocks, 16, 8).astype(jnp.uint32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)

    batch_shape = msg.shape[:-1]
    h0 = [
        (
            jnp.broadcast_to(jnp.uint32(_IV_LO[i] ^ (0x01010020 if i == 0 else 0)), batch_shape),
            jnp.broadcast_to(jnp.uint32(_IV_HI[i]), batch_shape),
        )
        for i in range(8)
    ]

    lo_s = jnp.moveaxis(lo, -2, 0)  # (nblocks, ..., 16)
    hi_s = jnp.moveaxis(hi, -2, 0)
    t_per_block = jnp.asarray(
        [min((i + 1) * 128, mlen) for i in range(nblocks)], dtype=jnp.uint32
    )
    f_per_block = jnp.asarray(
        [i == nblocks - 1 for i in range(nblocks)], dtype=jnp.bool_
    )

    def body(h, xs):
        blo, bhi, t, f = xs
        h = _compress(h, blo, bhi, t, f)
        return h, None

    # scan over the pytree state (list of (lo, hi) tuples)
    h_final, _ = jax.lax.scan(body, h0, (lo_s, hi_s, t_per_block, f_per_block))

    return _digest_bytes(h_final)


def _digest_bytes(h_final):
    out = []
    for i in range(4):  # first 4 words = 32 bytes
        lo_w, hi_w = h_final[i]
        for w in (lo_w, hi_w):
            out.extend(
                [
                    (w & 0xFF).astype(jnp.uint8),
                    ((w >> 8) & 0xFF).astype(jnp.uint8),
                    ((w >> 16) & 0xFF).astype(jnp.uint8),
                    ((w >> 24) & 0xFF).astype(jnp.uint8),
                ]
            )
    return jnp.stack(out, axis=-1)


def blake2b_256_prefixes(buf, lengths):
    """Hash S nested prefixes buf[..., :l] of ONE buffer in a single chained
    pass. The Fiat-Shamir transcript is a growing bytestring, so every
    squeeze hashes a prefix of the same buffer: all full 128-byte blocks
    share the running compression state, and each prefix costs exactly one
    extra final-block compression — max_blocks + S compressions total instead
    of sum_s blocks(l_s) (~S x fewer than blake2b_256_multi).

    buf: (..., TOTAL) uint8; lengths: static list of S prefix lengths >= 1.
    Returns (..., S, 32) digests."""
    S = len(lengths)
    batch_shape = buf.shape[:-1]
    fbs = [(l - 1) // 128 for l in lengths]  # final-block index per prefix
    max_fb = max(fbs)
    need = (max_fb + 1) * 128
    if need > buf.shape[-1]:
        buf = jnp.concatenate(
            [buf, jnp.zeros((*batch_shape, need - buf.shape[-1]), dtype=jnp.uint8)],
            axis=-1,
        )

    b = buf[..., :need].reshape(*batch_shape, max_fb + 1, 16, 8).astype(jnp.uint32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)

    h0 = [
        (
            jnp.broadcast_to(jnp.uint32(_IV_LO[i] ^ (0x01010020 if i == 0 else 0)), batch_shape),
            jnp.broadcast_to(jnp.uint32(_IV_HI[i]), batch_shape),
        )
        for i in range(8)
    ]

    # chain states: h_states[j] = state after compressing blocks 0..j-1 as
    # non-final blocks (t = 128*j)
    if max_fb > 0:
        lo_s = jnp.moveaxis(lo[..., :max_fb, :], -2, 0)
        hi_s = jnp.moveaxis(hi[..., :max_fb, :], -2, 0)
        t_sched = jnp.asarray(
            [(j + 1) * 128 for j in range(max_fb)], dtype=jnp.uint32
        )

        def body(h, xs):
            blo, bhi, t = xs
            h_new = _compress(h, blo, bhi, t, jnp.bool_(False))
            return h_new, h_new

        _, states = jax.lax.scan(body, h0, (lo_s, hi_s, t_sched))
        # states leaves: (max_fb, ...) — state after block j at index j
        h_states = [h0] + [
            [(a[j], b_[j]) for a, b_ in states] for j in range(max_fb)
        ]
    else:
        h_states = [h0]

    # one batched final compression over the S prefixes
    # final-block words with bytes >= (l - fb*128) masked to zero: build the
    # byte mask statically per prefix, apply on the byte view
    mask = np.zeros((S, 128), dtype=np.uint8)
    for s, l in enumerate(lengths):
        mask[s, : l - fbs[s] * 128] = 1
    fin_bytes = jnp.stack(
        [buf[..., fbs[s] * 128 : (fbs[s] + 1) * 128] for s in range(S)], axis=-2
    ) * jnp.asarray(mask)  # (..., S, 128)
    fb_words = fin_bytes.reshape(*batch_shape, S, 16, 8).astype(jnp.uint32)
    flo = fb_words[..., 0] | (fb_words[..., 1] << 8) | (fb_words[..., 2] << 16) | (fb_words[..., 3] << 24)
    fhi = fb_words[..., 4] | (fb_words[..., 5] << 8) | (fb_words[..., 6] << 16) | (fb_words[..., 7] << 24)

    h_in = [
        (
            jnp.stack([h_states[fbs[s]][i][0] for s in range(S)], axis=-1),
            jnp.stack([h_states[fbs[s]][i][1] for s in range(S)], axis=-1),
        )
        for i in range(8)
    ]  # 8 x (lo, hi) with shape (..., S)
    t_fin = jnp.asarray(list(lengths), dtype=jnp.uint32)
    h_out = _compress(h_in, flo, fhi, t_fin, jnp.bool_(True))
    return _digest_bytes(h_out)


def blake2b_256_multi(msgs, lengths):
    """Hash S messages of different static lengths in one traced scan.

    msgs: (..., S, MAXPAD) uint8 where MAXPAD is a multiple of 128 covering
    the longest message (zero-padded); lengths: static list of S ints.
    Returns (..., S, 32) digests. Used by the transcript: all squeeze prefixes
    are hashed in parallel (their contents do not depend on each other)."""
    S = len(lengths)
    assert msgs.shape[-2] == S
    maxpad = msgs.shape[-1]
    nb = maxpad // 128
    nblocks = [max(1, -(-l // 128)) for l in lengths]
    assert max(nblocks) <= nb

    b = msgs.reshape(*msgs.shape[:-1], nb, 16, 8).astype(jnp.uint32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    lo_s = jnp.moveaxis(lo, -2, 0)  # (nb, ..., S, 16)
    hi_s = jnp.moveaxis(hi, -2, 0)

    t_sched = np.zeros((nb, S), dtype=np.uint32)
    f_sched = np.zeros((nb, S), dtype=bool)
    act_sched = np.zeros((nb, S), dtype=bool)
    for s, l in enumerate(lengths):
        for blk in range(nblocks[s]):
            t_sched[blk, s] = min((blk + 1) * 128, l)
            f_sched[blk, s] = blk == nblocks[s] - 1
            act_sched[blk, s] = True

    batch_shape = msgs.shape[:-1]  # (..., S)
    h0 = [
        (
            jnp.broadcast_to(jnp.uint32(_IV_LO[i] ^ (0x01010020 if i == 0 else 0)), batch_shape),
            jnp.broadcast_to(jnp.uint32(_IV_HI[i]), batch_shape),
        )
        for i in range(8)
    ]

    def body(h, xs):
        blo, bhi, t, f, act = xs
        h_new = _compress(h, blo, bhi, t, f)
        h = [
            (jnp.where(act, a_new, a_old), jnp.where(act, b_new, b_old))
            for (a_new, b_new), (a_old, b_old) in zip(h_new, h)
        ]
        return h, None

    h_final, _ = jax.lax.scan(
        body,
        h0,
        (lo_s, hi_s, jnp.asarray(t_sched), jnp.asarray(f_sched), jnp.asarray(act_sched)),
    )
    return _digest_bytes(h_final)
