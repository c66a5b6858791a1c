"""ATMS circuit family: Jubjub/Schnorr/Rescue units + end-to-end
prove/verify in both KZG flavors and the lookup variant (the reference's
atms / atms_with_lookups examples, src/circuits/atms_circuit.rs &
atms_with_lookups_circuit.rs)."""

import pytest

from plutus_halo2_tpu.models.atms import (
    AtmsCircuit,
    AtmsLookupCircuit,
    prepare_test_signatures,
)
from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2
from plutus_halo2_tpu.refimpl import jubjub as jj
from plutus_halo2_tpu.refimpl import rescue as rs
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.prover import prove
from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS
from plutus_halo2_tpu.refimpl.verifier import verify

MSG = 424242
SRS = TrapdoorSRS.from_seed(b"atms-test-srs")


# ---------------------------------------------------------------------------
# host primitives
# ---------------------------------------------------------------------------

def test_jubjub_group_laws():
    g = jj.GEN
    assert jj.is_on_curve(g)
    assert jj.mul(g, jj.ORDER) == jj.IDENTITY
    p7, p11 = jj.mul(g, 7), jj.mul(g, 11)
    assert jj.add(p7, p11) == jj.mul(g, 18)
    assert jj.add(p7, jj.neg(p7)) == jj.IDENTITY
    assert jj.add(p7, jj.IDENTITY) == p7


def test_schnorr_sign_verify():
    sk, pk = jj.keygen(b"party")
    sig = jj.sign(sk, MSG, rs.hash_fr)
    assert jj.verify(pk, MSG, sig, rs.hash_fr)
    assert not jj.verify(pk, MSG + 1, sig, rs.hash_fr)
    R, s = sig
    assert not jj.verify(pk, MSG, (R, (s + 1) % jj.ORDER), rs.hash_fr)


def test_rescue_sponge():
    a = rs.hash_fr([1, 2, 3])
    assert a == rs.hash_fr([1, 2, 3])
    assert a != rs.hash_fr([1, 2, 4])
    assert rs.hash_fr([1, 2]) != rs.hash_fr([1, 2, 0])  # padding separates


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def atms_data():
    pks, sigs, _comm = prepare_test_signatures(2, 1, MSG)
    return pks, sigs


@pytest.mark.slow
@pytest.mark.parametrize("flavor", [FLAVOR_HALO2, FLAVOR_GWC])
def test_atms_accept_reject(atms_data, flavor):
    pks, sigs = atms_data
    circuit = AtmsCircuit(pks, sigs, MSG, 1)
    pk, plan = keygen(circuit, flavor=flavor, srs=SRS)
    proof = prove(pk, plan, circuit, circuit.public_inputs())

    ok, _ = verify(plan, proof, circuit.public_inputs())
    assert ok, f"valid ATMS proof must verify ({flavor})"

    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok, _ = verify(plan, bytes(bad), circuit.public_inputs())
    assert not ok, "tampered ATMS proof must fail"

    comm, msg, thr = circuit.public_inputs()
    ok, _ = verify(plan, proof, [comm, msg + 1, thr])
    assert not ok, "wrong message must fail"


@pytest.mark.slow
def test_atms_threshold_unsatisfied_rejected(atms_data):
    pks, sigs = atms_data
    # demand threshold 2 with only 1 signature: honest prover refuses
    circuit = AtmsCircuit(pks, sigs, MSG, 2)
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=SRS)
    with pytest.raises(ValueError, match="not satisfied"):
        prove(pk, plan, circuit, circuit.public_inputs())


@pytest.mark.slow
def test_atms_reference_scale_50_of_90():
    """The reference's headline ATMS benchmark scale (README.md:220): 50-of-90
    parties, so the circuit/MSM/transcript sizes match the reference's
    benchmark row (not a toy party count). Native proving at k=14-15 takes
    ~a minute on the host."""
    pks, sigs, _comm = prepare_test_signatures(90, 50, MSG, seed=b"atms-50-90")
    circuit = AtmsCircuit(pks, sigs, MSG, 50)
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=SRS)
    proof = prove(pk, plan, circuit, circuit.public_inputs())
    ok, _ = verify(plan, proof, circuit.public_inputs())
    assert ok, "50-of-90 ATMS proof must verify"
    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok, _ = verify(plan, bytes(bad), circuit.public_inputs())
    assert not ok, "tampered 50-of-90 ATMS proof must fail"


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("os").environ.get("PH2_XL_TESTS") != "1",
    reason="228-of-408 native proving takes ~10 min on the host; set PH2_XL_TESTS=1",
)
def test_atms_reference_scale_228_of_408():
    """The reference's largest ATMS benchmark row (README.md:221): 228-of-408
    parties. Exercises the verifier at the reference's largest MSM and
    transcript sizes."""
    pks, sigs, _comm = prepare_test_signatures(408, 228, MSG, seed=b"atms-228-408")
    circuit = AtmsCircuit(pks, sigs, MSG, 228)
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=SRS)
    proof = prove(pk, plan, circuit, circuit.public_inputs())
    ok, _ = verify(plan, proof, circuit.public_inputs())
    assert ok, "228-of-408 ATMS proof must verify"
    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok, _ = verify(plan, bytes(bad), circuit.public_inputs())
    assert not ok, "tampered 228-of-408 ATMS proof must fail"


@pytest.mark.slow
def test_atms_with_lookups(atms_data):
    pks, sigs = atms_data
    circuit = AtmsLookupCircuit(pks, sigs, MSG, 1)
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=SRS)
    proof = prove(pk, plan, circuit, circuit.public_inputs())
    ok, _ = verify(plan, proof, circuit.public_inputs())
    assert ok, "ATMS+lookup proof must verify"
    assert len(plan.lookups) == 1
