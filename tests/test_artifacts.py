"""Committed-artifact replay: every circuit's exported artifact set
(proof hex, public inputs, VK JSON) must round-trip through `plan_from_vk`
— the verification-only plan builder (no SRS / assignment / commitment
work) — and verify with the spec verifier. This is the consumer-side
contract of the reference's exported VK constants + proof files
(proof_serialization.rs, code_emitters_plinth.rs:786-888): a verifier
built ONLY from committed artifacts accepts the committed proof and
rejects the committed tampered proof."""

import os

import pytest

from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
from plutus_halo2_tpu.refimpl.keygen import plan_from_vk
from plutus_halo2_tpu.refimpl.verifier import verify
from plutus_halo2_tpu.utils.serialization import parse_public_inputs, vk_from_json

ART = os.path.join(os.path.dirname(__file__), "..", "examples", "artifacts")


def _load(name):
    with open(os.path.join(ART, f"{name}_vk.json")) as f:
        vk = vk_from_json(f.read())
    with open(os.path.join(ART, f"{name}_proof.hex")) as f:
        proof = bytes.fromhex(f.read().strip())
    with open(os.path.join(ART, f"{name}_proof_invalid.hex")) as f:
        bad = bytes.fromhex(f.read().strip())
    with open(os.path.join(ART, f"{name}_public_input.hex")) as f:
        inputs = parse_public_inputs(f.read())
    return vk, proof, bad, inputs


def test_lookup_table_artifacts_verify():
    from plutus_halo2_tpu.models.circuits import LookupRangeCircuit

    vk, proof, bad, inputs = _load("lookup_table")
    plan = plan_from_vk(LookupRangeCircuit(values=(3, 9, 14), bits=4), vk)
    ok, _ = verify(plan, proof, inputs)
    assert ok, "committed lookup_table proof must verify from artifacts alone"
    ok_bad, _ = verify(plan, bad, inputs)
    assert not ok_bad


@pytest.mark.slow
def test_atms_228_408_artifacts_verify():
    """The reference's largest benchmark row (README.md:221) replayed from
    the committed k=22 artifacts WITHOUT re-proving (the native prove took
    73 minutes): plan_from_vk needs only the circuit STRUCTURE, so dummy
    party data of the right count builds the same plan the prover used."""
    from plutus_halo2_tpu.models.atms import AtmsCircuit

    vk, proof, bad, inputs = _load("atms_228_408")
    assert vk.k == 22 and vk.n == 1 << 22
    circuit = AtmsCircuit([(0, 1)] * 408, [None] * 408, 0, 228)
    plan = plan_from_vk(circuit, vk, flavor=FLAVOR_HALO2)
    ok, _ = verify(plan, proof, inputs)
    assert ok, "committed 228/408 proof must verify from artifacts alone"
    ok_bad, _ = verify(plan, bad, inputs)
    assert not ok_bad


@pytest.mark.slow
def test_atms_with_lookups_artifacts_verify():
    from plutus_halo2_tpu.models.atms import AtmsLookupCircuit

    vk, proof, bad, inputs = _load("atms_with_lookups")
    circuit = AtmsLookupCircuit([(0, 1)] * 2, [None] * 2, 0, 1)
    plan = plan_from_vk(circuit, vk, flavor=FLAVOR_HALO2)
    ok, _ = verify(plan, proof, inputs)
    assert ok
    ok_bad, _ = verify(plan, bad, inputs)
    assert not ok_bad
