"""Pallas transcript-hash kernel vs the XLA blake2b path and hashlib."""

import hashlib

import numpy as np
import pytest

import jax

from plutus_halo2_tpu.ops.blake2b import blake2b_256, blake2b_256_prefixes
from plutus_halo2_tpu.ops.pallas_blake import make_transcript_kernel


def _words_to_bytes(w):
    """(..., 8) uint32 LE64 words -> (..., 32) uint8."""
    b = np.zeros((*w.shape[:-1], 32), np.uint8)
    for i in range(8):
        for k in range(4):
            b[..., 4 * i + k] = (w[..., i] >> (8 * k)) & 0xFF
    return b


@pytest.mark.parametrize("lengths", [
    (1, 17, 128, 129, 300, 301, 555),   # block boundaries + odd sizes
    (128, 256, 384),                    # exact multiples
    (77,),                              # single squeeze, single block
])
def test_transcript_kernel_matches_xla_and_hashlib(lengths):
    B = 128
    rng = np.random.default_rng(42)
    total = max(lengths) + 5
    buf = rng.integers(0, 256, size=(B, total), dtype=np.uint8)
    buf[1:] = buf[0]  # mostly-identical rows + one distinct row
    buf[0, 0] ^= 0xAB

    kern = make_transcript_kernel(list(lengths), interpret=True)
    h1w, h2w = jax.jit(kern)(buf)
    h1 = _words_to_bytes(np.asarray(h1w))
    h2 = _words_to_bytes(np.asarray(h2w))

    # XLA oracle
    h1x = np.asarray(blake2b_256_prefixes(buf, list(lengths)))
    S = len(lengths)
    h2x = np.asarray(
        blake2b_256(h1x.reshape(B * S, 32)).reshape(B, S, 32)
    )
    assert np.array_equal(h1, h1x)
    assert np.array_equal(h2, h2x)

    # independent hashlib check on the distinct row
    for s, l in enumerate(lengths):
        exp1 = hashlib.blake2b(bytes(buf[0, :l]), digest_size=32).digest()
        assert bytes(h1[0, s]) == exp1
        assert bytes(h2[0, s]) == hashlib.blake2b(exp1, digest_size=32).digest()
