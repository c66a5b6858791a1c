"""Pallas MSM kernel vs the refimpl oracle (interpret mode on CPU)."""

import random

import numpy as np
import pytest

from plutus_halo2_tpu.ops import curve as jc
from plutus_halo2_tpu.ops import pallas_curve
from plutus_halo2_tpu.ops.limb import FR_SPEC
from plutus_halo2_tpu.refimpl import curve as rc
from plutus_halo2_tpu.refimpl.field import Q


# two cases stay in the fast tier (one per window width); the rest are
# compile-heavy interpret runs covering the same code paths at other K
@pytest.mark.parametrize(
    "K,wbits",
    [(8, 4), (11, 5)]
    + [pytest.param(*c, marks=pytest.mark.slow) for c in [(3, 4), (11, 4), (3, 5)]],
)
def test_pallas_msm_matches_refimpl(K, wbits):
    rng = random.Random(21)
    B = 4
    lanes = 4  # small lane count is fine in interpret mode
    host_pts = [rc.g1_mul(rc.G1_GEN, rng.randrange(1, 2**64)) for _ in range(K)]
    # include an identity point and a zero scalar among the inputs
    host_pts[0] = None
    scal_rows = []
    pts_batch = np.stack(
        [np.stack([jc.host_point_to_mont(p) for p in host_pts])] * B
    )
    for b in range(B):
        scal = [rng.randrange(Q) for _ in range(K)]
        scal[min(1, K - 1)] = 0
        scal_rows.append(scal)
    scalars = np.stack(
        [np.stack([FR_SPEC.encode(s) for s in row]) for row in scal_rows]
    )

    msm = pallas_curve.make_msm_kernel(K, lanes=lanes, chunk=4, interpret=True, wbits=wbits)
    out = np.asarray(msm(pts_batch, scalars))

    for b in range(B):
        expected = None
        for p, s in zip(host_pts, scal_rows[b]):
            expected = rc.g1_add(expected, rc.g1_mul(p, s))
        got = jc.host_point_from_mont(out[b])
        assert got == expected, f"row {b}"
