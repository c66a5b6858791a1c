"""Mesh/sharding layer: point-sharded MSM bit-exactness on the virtual
8-device CPU mesh, and the 2-axis (dp x mp) verification path.

The reference has no distributed layer (SURVEY §2.4) — correctness here is
defined against the single-device ops (jc.msm) and the refimpl oracle."""

import random

import numpy as np
import pytest

from plutus_halo2_tpu.ops import curve as jc
from plutus_halo2_tpu.ops.limb import FR_SPEC
from plutus_halo2_tpu.refimpl import curve as rc
from plutus_halo2_tpu.refimpl.field import Q


def _cpu_devices(n):
    import jax

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


def _rand_msm(rng, K, B=None):
    host_pts = [rc.g1_mul(rc.G1_GEN, rng.randrange(1, 2**64)) for _ in range(K)]
    host_pts[0] = None  # identity among the inputs
    scal = [rng.randrange(Q) for _ in range(K)]
    scal[min(1, K - 1)] = 0
    pts = np.stack([jc.host_point_to_mont(p) for p in host_pts])
    scs = np.stack([FR_SPEC.encode(s) for s in scal])
    if B is not None:
        pts = np.broadcast_to(pts[None], (B, *pts.shape)).copy()
        scs = np.broadcast_to(scs[None], (B, *scs.shape)).copy()
    expected = None
    for p, s in zip(host_pts, scal):
        expected = rc.g1_add(expected, rc.g1_mul(p, s))
    return pts, scs, expected


@pytest.mark.slow
def test_sharded_msm_matches_single_device():
    """sharded_msm over a 4-device CPU mesh == refimpl.

    4 devices, not 8: the XLA:CPU SPMD compile of the windowed-MSM body
    blows up superlinearly in mesh size (4-dev ~35 s, 8-dev >25 min);
    8-device coverage of the same code path lives in dryrun_multichip,
    which the driver compiles with the full verifier around it."""
    from plutus_halo2_tpu.parallel.mesh import make_mesh, sharded_msm

    rng = random.Random(41)
    K = 8
    devs = _cpu_devices(4)
    pts, scs, expected = _rand_msm(rng, K)
    mesh = make_mesh(devs, axis="shard")
    out = np.asarray(sharded_msm(mesh, pts, scs))
    got = jc.host_point_from_mont(out)
    # the refimpl expectation doubles as the single-device check:
    # jc.msm == refimpl is already covered by test_ops_curve::test_msm_vs_ref
    # (compiling jc.msm a second time here costs ~2.5 min on XLA:CPU)
    assert got == expected


def test_shard_map_msm_batched():
    """shard_map_msm (the in-verifier form) with K not divisible by the axis:
    padding with identity points keeps it exact."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from plutus_halo2_tpu.parallel.mesh import shard_map, shard_map_msm

    rng = random.Random(42)
    K, B = 11, 2  # 11 % 4 != 0 -> exercises the pad path
    devs = _cpu_devices(4)
    pts, scs, expected = _rand_msm(rng, K, B=B)
    mesh = Mesh(np.asarray(devs), ("mp",))

    fn = shard_map(
        lambda p, s: shard_map_msm(p, s, "mp"),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    out = np.asarray(jax.jit(fn)(pts, scs))
    for b in range(B):
        assert jc.host_point_from_mont(out[b]) == expected, f"row {b}"


@pytest.mark.slow
def test_verify_2d_dp_mp():
    """Full verification on a 2x2 (dp x mp) mesh: batch sharded over dp, MSM
    points sharded over mp, with a corrupted row to prove verdicts are
    per-proof. (4 devices, not 8 — see test_sharded_msm_matches_single_device
    on the XLA:CPU manual-partitioning compile blowup.)"""
    import jax

    from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
    from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
    from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
    from plutus_halo2_tpu.parallel.mesh import make_mesh_2d, verify_2d
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.prover import prove
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

    devs = _cpu_devices(4)
    circuit = SimpleMulCircuit()
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"2d"))
    inputs = [42, 42, 42]
    proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"p"), dtype=np.uint8)
    B = 4
    proofs = np.stack([proof] * B)
    proofs[2, 100] ^= 0x40  # corrupt one row
    ver = JaxVerifier(plan, use_pallas=False)
    pis = ver.encode_public_inputs([inputs] * B)

    mesh = make_mesh_2d(dp=2, mp=2, devices=devs)
    out = np.asarray(verify_2d(ver, mesh, proofs, pis))
    assert out.tolist() == [True, True, False, True]
