"""End-to-end prove/verify tests on the spec implementation: accept valid
proofs, reject tampered proofs / wrong inputs — the same accept/reject matrix
the reference bakes into its generated Aiken tests
(code_emitters_aiken.rs:547-641: valid, negated inputs, byte-flipped proof,
trivial inputs)."""

import pytest

from plutus_halo2_tpu.models.circuits import LookupRangeCircuit, SimpleMulCircuit
from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.prover import prove
from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS
from plutus_halo2_tpu.refimpl.verifier import verify

SRS = TrapdoorSRS.from_seed(b"test-srs")


def _roundtrip(circuit, flavor, inputs):
    pk, plan = keygen(circuit, flavor=flavor, srs=SRS)
    proof = prove(pk, plan, circuit, inputs)
    return plan, proof


@pytest.mark.slow
@pytest.mark.parametrize("flavor", [FLAVOR_HALO2, FLAVOR_GWC])
def test_simple_mul_accept_reject(flavor):
    circuit = SimpleMulCircuit()
    inputs = [42, 42, 42]
    plan, proof = _roundtrip(circuit, flavor, inputs)

    ok, _ = verify(plan, proof, inputs)
    assert ok, f"valid proof must verify ({flavor})"

    # byte-flip inside the first scalar region (the reference flips a byte
    # after the G1 prefix, examples/simple_mul.rs:113-120)
    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok, _ = verify(plan, bytes(bad), inputs)
    assert not ok, "tampered proof must fail"

    # negated public inputs change the transcript -> challenges -> reject
    ok, _ = verify(plan, proof, [-42, -42, -42])
    assert not ok, "negated inputs must fail"

    # trivial all-1 inputs (the reference's fourth generated negative case,
    # code_emitters_aiken.rs:627-639) must also reject
    ok, _ = verify(plan, proof, [1] * len(inputs))
    assert not ok, "trivial all-1 inputs must fail"


@pytest.mark.slow
def test_simple_mul_wrong_witness_rejected():
    circuit = SimpleMulCircuit()
    inputs = [42, 42, 42]
    # witness that doesn't satisfy the circuit relation: an honest prover
    # refuses (non-zero quotient remainder)...
    bad_circuit = SimpleMulCircuit(c=123456789)
    pk, plan2 = keygen(bad_circuit, flavor=FLAVOR_HALO2, srs=SRS)
    with pytest.raises(ValueError, match="not satisfied"):
        prove(pk, plan2, bad_circuit, inputs)
    # ...and a forged truncated quotient is rejected by the verifier
    forged = prove(pk, plan2, bad_circuit, inputs, allow_unsatisfied=True)
    ok, _ = verify(plan2, forged, inputs)
    assert not ok, "forged quotient must fail verification"


@pytest.mark.slow
@pytest.mark.parametrize("flavor", [FLAVOR_HALO2, FLAVOR_GWC])
def test_lookup_circuit_accept(flavor):
    circuit = LookupRangeCircuit(values=(3, 9, 14), bits=4)
    inputs = [7]
    plan, proof = _roundtrip(circuit, flavor, inputs)
    ok, traces = verify(plan, proof, inputs)
    assert ok, f"valid lookup proof must verify ({flavor}): {traces}"


@pytest.mark.slow
def test_lookup_circuit_out_of_range_rejected():
    circuit = LookupRangeCircuit(values=(3, 99, 14), bits=4)  # 99 >= 2^4
    with pytest.raises(ValueError, match="not present in table"):
        _roundtrip(circuit, FLAVOR_HALO2, [7])
