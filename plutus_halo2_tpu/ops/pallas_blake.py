"""Pallas TPU kernel for the Fiat-Shamir transcript hashes.

Replaces ops/blake2b.blake2b_256_prefixes + the follow-up blake2b_256 of
each squeeze (h2 = H(h1)) with ONE pallas_call. The XLA graph form was
measured at ~40 ms/batch at B=1024 on v5e — the single largest non-MSM cost
in the verifier core — because its ~38 compressions x 12 rounds lower to
thousands of tiny fused ops. In-kernel the same math is straight vector
code on the VPU (<1 ms/batch): the Blake2b state rides vregs as four
(4, B)-shaped quarters (the standard 4-wide SIMD formulation: column step,
then diagonal step on rotated quarters), 64-bit words as (lo, hi) uint32
pairs, and the SIGMA message schedule as dynamic VMEM row reads driven from
SMEM.

Semantics are bit-identical to ops/blake2b.py (same IV/param block, same
prefix-chaining structure: every squeeze hashes a prefix of the one
transcript buffer, so all full blocks share the running chain state and
each squeeze costs one final-block compression plus one 32-byte h2
compression). Reference semantics: Transcript.hs:85-88, transcript.ak:80-90.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blake2b import _IV_HI, _IV_LO, _SIGMA12

LANES = 128

# h0 = IV with the digest-length-32 parameter block folded into word 0
_H0_LO = _IV_LO.copy()
_H0_LO[0] ^= 0x01010020
_H0_HI = _IV_HI.copy()

# quarters: a = v[0..3], b = v[4..7], c = v[8..11], d = v[12..15]
_H0Q = np.stack([_H0_LO[:4], _H0_HI[:4], _H0_LO[4:], _H0_HI[4:]])  # (4, 4)
_IVQ = np.stack([_IV_LO[:4], _IV_HI[:4], _IV_LO[4:], _IV_HI[4:]])  # (4, 4)


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return (lo, a[1] + b[1] + carry)


def _xor64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _ror64(a, r: int):
    lo, hi = a
    if r == 32:
        return (hi, lo)
    if r > 32:
        lo, hi = hi, lo
        r -= 32
    rr, rl = np.uint32(r), np.uint32(32 - r)
    return ((lo >> rr) | (hi << rl), (hi >> rr) | (lo << rl))


def _rotq(x, k: int):
    """Rotate a (lo, hi) pair of (4, B) arrays along the word axis by k."""
    return tuple(jnp.concatenate([w[k:], w[:k]], axis=0) for w in x)


def _G4(va, vb, vc, vd, mx, my):
    """Four G functions at once on (4, B) quarters."""
    va = _add64(_add64(va, vb), mx)
    vd = _ror64(_xor64(vd, va), 32)
    vc = _add64(vc, vd)
    vb = _ror64(_xor64(vb, vc), 24)
    va = _add64(_add64(va, vb), my)
    vd = _ror64(_xor64(vd, va), 16)
    vc = _add64(vc, vd)
    vb = _ror64(_xor64(vb, vc), 63)
    return va, vb, vc, vd


def make_transcript_kernel(lengths, lanes: int = LANES,
                           interpret: bool = False):
    """Build hashes(buf (B, TOTAL) uint8) -> (h1, h2) each (B, S, 8) uint32
    digest words (LE64 order: lo0, hi0, lo1, hi1, ...). h1[s] is the digest
    of buf[:, :lengths[s]]; h2[s] = blake2b_256(h1[s]) — the squeeze pair
    the transcript turns into a challenge (Transcript.hs:85-88)."""
    S = len(lengths)
    fbs = [(l - 1) // 128 for l in lengths]
    max_fb = max(fbs)
    need = (max_fb + 1) * 128
    assert all(l >= 1 for l in lengths)

    # kernels may not capture array constants: the 8 IV/h0 quarters ride a
    # (8, 4, 1) VMEM input and lane-broadcast inside; the per-squeeze final
    # lengths ride a (1, S, 1) input
    iv_in = np.concatenate([_H0Q, _IVQ]).astype(np.uint32)[:, :, None]
    t_in = np.array(list(lengths), dtype=np.uint32)[None, :, None]  # (1, S, 1)
    # final-block byte mask per prefix (multiplicative 0/1), applied in the
    # XLA wrapper
    mask = np.zeros((S, 128), dtype=np.uint8)
    for s, l in enumerate(lengths):
        mask[s, : l - fbs[s] * 128] = 1

    def kernel(iv_ref, tfin_ref, msg_ref, fin_lo_ref, fin_hi_ref, out1_ref,
               out2_ref, states_ref, mblk_ref):
        B = msg_ref.shape[-1]

        def bcq(i, shape):  # iv_ref row -> (4, *shape[1:]) uint32
            col = iv_ref[i]  # (4, 1)
            if len(shape) == 2:
                return jnp.broadcast_to(col, shape).astype(jnp.uint32)
            # staged: lanes first, then the squeeze axis (a single broadcast
            # touching both sublanes and lanes is unimplemented in Mosaic)
            x = jnp.broadcast_to(col, (4, shape[-1]))
            return jnp.broadcast_to(x[:, None, :], shape).astype(jnp.uint32)

        def compress(ha, hb, read_word, t_row0, final: bool, shape):
            """One (possibly squeeze-batched) compression. Quarters have
            shape `shape` = (4, B) or (4, S, B); read_word(w) -> (lo, hi)
            rows of shape (1, ...); t_row0: the t counter already broadcast
            to shape[1:]."""
            a, b = ha, hb
            c = (bcq(4, shape), bcq(5, shape))
            row_idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            d_lo = bcq(6, shape) ^ jnp.where(row_idx == 0, t_row0[None], 0)
            d_hi = bcq(7, shape)
            if final:
                fm = jnp.where(row_idx == 2, jnp.uint32(0xFFFFFFFF), 0)
                d_lo = d_lo ^ fm
                d_hi = d_hi ^ fm
            d = (d_lo, d_hi)

            # the 12 rounds are emitted straight-line with STATIC SIGMA
            # indices (dynamic message reads measured slower; the body is
            # tiny so the unrolled emission stays small)
            def msel(r, idxs):
                los, his = [], []
                for i in idxs:
                    lo, hi = read_word(int(_SIGMA12[r, i]))
                    los.append(lo)
                    his.append(hi)
                return (jnp.concatenate(los, axis=0), jnp.concatenate(his, axis=0))

            for r in range(12):
                a, b, c, d = _G4(a, b, c, d, msel(r, (0, 2, 4, 6)),
                                 msel(r, (1, 3, 5, 7)))
                b, c, d = _rotq(b, 1), _rotq(c, 2), _rotq(d, 3)
                a, b, c, d = _G4(a, b, c, d, msel(r, (8, 10, 12, 14)),
                                 msel(r, (9, 11, 13, 15)))
                b, c, d = _rotq(b, 3), _rotq(c, 2), _rotq(d, 1)
            return (
                (ha[0] ^ a[0] ^ c[0], ha[1] ^ a[1] ^ c[1]),
                (hb[0] ^ b[0] ^ d[0], hb[1] ^ b[1] ^ d[1]),
            )

        # ---- chain over the full blocks; state after block j at index j+1
        ha0 = (bcq(0, (4, B)), bcq(1, (4, B)))
        hb0 = (bcq(2, (4, B)), bcq(3, (4, B)))
        states_ref[0] = jnp.stack([ha0[0], ha0[1], hb0[0], hb0[1]], axis=0)

        def chain_body(j, carry):
            ha, hb = carry
            mblk_ref[:, :, :] = msg_ref[pl.ds(j, 1)][0]

            def read_word(w):
                blk = mblk_ref[w]  # (2, B)
                return blk[0:1, :], blk[1:2, :]

            t = jnp.broadcast_to(((j + 1) * 128).astype(jnp.uint32), (B,))
            ha, hb = compress(ha, hb, read_word, t, False, (4, B))
            states_ref[pl.ds(j + 1, 1)] = jnp.stack(
                [ha[0], ha[1], hb[0], hb[1]], axis=0
            )[None]
            return (ha, hb)

        jax.lax.fori_loop(0, max_fb, chain_body, (ha0, hb0))

        # ---- ALL squeezes at once: the S final-block compressions are
        # independent, so they batch on a sublane axis -> ONE compression of
        # (4, S, B) quarters + ONE for the h2s, instead of 2*S sequential.
        # The chain-state each squeeze resumes from is a STATIC index (the
        # squeeze lengths are static), so this is a plain static gather.
        sshape = (4, S, B)
        st = [states_ref[fbs[s]] for s in range(S)]  # each (4, 4, B)
        hin = [
            jnp.stack([st[s][q] for s in range(S)], axis=1) for q in range(4)
        ]  # 4 x (4, S, B)
        ha = (hin[0], hin[1])
        hb = (hin[2], hin[3])

        def read_fin(w):
            # word-major 3D lo/hi refs: Mosaic handles leading static
            # indexing of 3D refs; 4D reads lowered as unsupported gathers
            return fin_lo_ref[w][None], fin_hi_ref[w][None]  # (1, S, B)

        t1 = jnp.broadcast_to(tfin_ref[0][:, :], (S, B)).astype(jnp.uint32)
        h1a, h1b = compress(ha, hb, read_fin, t1, True, sshape)
        out1_ref[:, :, :, :] = jnp.stack(
            [h1a[0], h1a[1], h1b[0], h1b[1]], axis=0
        ).transpose(2, 0, 1, 3)

        # h2 = blake2b_256 of each 32-byte h1 digest: the digest is the LE64
        # concat of words 0..3 (the a-quarter), so its message words ARE
        # (lo, hi) of that quarter — no byte shuffling.
        zero_row = jnp.zeros((1, S, B), jnp.uint32)

        def read_m2(w):
            if w < 4:
                return h1a[0][w : w + 1], h1a[1][w : w + 1]
            return zero_row, zero_row

        ha0s = (bcq(0, sshape), bcq(1, sshape))
        hb0s = (bcq(2, sshape), bcq(3, sshape))
        t2 = jnp.full((S, B), 32, jnp.uint32)
        h2a, h2b = compress(ha0s, hb0s, read_m2, t2, True, sshape)
        out2_ref[:, :, :, :] = jnp.stack(
            [h2a[0], h2a[1], h2b[0], h2b[1]], axis=0
        ).transpose(2, 0, 1, 3)

    def hashes(buf):
        B = buf.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        nbt = B // lanes
        if need > buf.shape[-1]:
            buf = jnp.concatenate(
                [buf, jnp.zeros((B, need - buf.shape[-1]), jnp.uint8)], axis=-1
            )

        def pack_words(bytes_arr):
            """(B, n, 128) uint8 -> (n, 16, 2, B) uint32 LE64 (lo, hi)."""
            n = bytes_arr.shape[1]
            w8 = bytes_arr.reshape(B, n, 16, 8).astype(jnp.uint32)
            lo = w8[..., 0] | (w8[..., 1] << 8) | (w8[..., 2] << 16) | (w8[..., 3] << 24)
            hi = w8[..., 4] | (w8[..., 5] << 8) | (w8[..., 6] << 16) | (w8[..., 7] << 24)
            return jnp.moveaxis(jnp.stack([lo, hi], axis=-1), 0, -1)

        words_k = pack_words(buf[:, :need].reshape(B, max_fb + 1, 128))
        fin_bytes = jnp.stack(
            [buf[:, fbs[s] * 128 : (fbs[s] + 1) * 128] for s in range(S)], axis=1
        ) * jnp.asarray(mask)[None]  # (B, S, 128)
        fin_k = jnp.moveaxis(pack_words(fin_bytes), 1, 0)  # (16, S, 2, B)
        fin_lo, fin_hi = fin_k[:, :, 0], fin_k[:, :, 1]  # (16, S, B)

        out1, out2 = pl.pallas_call(
            kernel,
            grid=(nbt,),
            in_specs=[
                pl.BlockSpec((8, 4, 1), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # IV/h0 quarters
                pl.BlockSpec((1, S, 1), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # final lengths
                pl.BlockSpec(
                    (max_fb + 1, 16, 2, lanes), lambda b: (0, 0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (16, S, lanes), lambda b: (0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (16, S, lanes), lambda b: (0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((S, 4, 4, lanes), lambda b: (0, 0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 4, 4, lanes), lambda b: (0, 0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S, 4, 4, B), jnp.uint32),
                jax.ShapeDtypeStruct((S, 4, 4, B), jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.VMEM((max_fb + 1, 4, 4, lanes), jnp.uint32),  # chain states
                pltpu.VMEM((16, 2, lanes), jnp.uint32),  # current block
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(jnp.asarray(iv_in), jnp.asarray(t_in), words_k, fin_lo, fin_hi)

        def to_words(o):
            # (S, 4{alo,ahi,blo,bhi}, 4, B) -> (B, S, 8): digest words are
            # the a-quarter interleaved (lo0, hi0, lo1, hi1, ...)
            o = jnp.moveaxis(o, -1, 0)  # (B, S, 4, 4)
            return jnp.stack([o[..., 0, :], o[..., 1, :]], axis=-1).reshape(B, S, 8)

        return to_words(out1), to_words(out2)

    return hashes
