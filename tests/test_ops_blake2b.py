"""Blake2b-256 kernel vs hashlib (the refimpl transcript's hash)."""

import hashlib

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.ops.blake2b import blake2b_256


@pytest.mark.parametrize("mlen", [0, 32, 127, 128, 129, 1000])
def test_blake2b_lengths(mlen):
    rng = np.random.default_rng(mlen)
    msgs = rng.integers(0, 256, size=(3, mlen), dtype=np.uint8)
    out = np.asarray(jax.jit(blake2b_256)(msgs))
    for i in range(msgs.shape[0]):
        expect = hashlib.blake2b(msgs[i].tobytes(), digest_size=32).digest()
        assert out[i].tobytes() == expect, f"mlen={mlen} row {i}"


def test_blake2b_multi():
    from plutus_halo2_tpu.ops.blake2b import blake2b_256_multi

    lengths = [1, 130, 64, 255]
    rng = np.random.default_rng(7)
    maxpad = 384
    msgs = np.zeros((2, len(lengths), maxpad), dtype=np.uint8)
    raws = []
    for s, l in enumerate(lengths):
        data = rng.integers(0, 256, size=(2, l), dtype=np.uint8)
        msgs[:, s, :l] = data
        raws.append(data)
    out = np.asarray(jax.jit(lambda m: blake2b_256_multi(m, tuple(lengths)))(msgs))
    for s, l in enumerate(lengths):
        for b in range(2):
            expect = hashlib.blake2b(raws[s][b].tobytes(), digest_size=32).digest()
            assert out[b, s].tobytes() == expect, f"s={s} b={b}"


def test_blake2b_prefixes_vs_hashlib():
    """Nested-prefix chained hashing (the transcript pattern) vs hashlib."""
    import hashlib

    import numpy as np

    from plutus_halo2_tpu.ops.blake2b import blake2b_256_prefixes

    rng = np.random.default_rng(7)
    total = 1000
    buf = rng.integers(0, 256, size=(3, total), dtype=np.uint8)
    lengths = [1, 100, 127, 128, 129, 255, 256, 300, 640, 1000]
    out = np.asarray(blake2b_256_prefixes(buf, lengths))
    assert out.shape == (3, len(lengths), 32)
    for b in range(3):
        for s, l in enumerate(lengths):
            exp = hashlib.blake2b(bytes(buf[b, :l]), digest_size=32).digest()
            assert bytes(out[b, s]) == exp, f"prefix {l}"
