"""VerificationService tests — the submit-and-poll flow of the reference's
submitter (aiken-verifier/submitter/src/main.rs:39-225) against the TPU batch
queue instead of Cardano."""

import hashlib

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.prover import prove
from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS
from plutus_halo2_tpu.serving import ProofBundle, VerificationService


@pytest.fixture(scope="module")
def setup():
    circuit = SimpleMulCircuit()
    inputs = (42, 42, 42)
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"serve-srs"))
    proof = prove(pk, plan, circuit, list(inputs))
    return plan, proof, inputs


def test_bundle_tag_matches_reference_derivation(setup):
    _, proof, inputs = setup
    bundle = ProofBundle(proof, inputs)
    h = hashlib.blake2b(digest_size=32)
    h.update(proof)
    for v in inputs:
        h.update(int(v).to_bytes(32, "big"))
    assert bundle.tag == h.digest()
    # tampering the proof changes the tag (distinct NFT name on-chain)
    other = ProofBundle(proof[:-1] + bytes([proof[-1] ^ 1]), inputs)
    assert other.tag != bundle.tag


@pytest.mark.slow
def test_service_accept_reject_and_padding(setup):
    plan, proof, inputs = setup
    svc = VerificationService(
        plan, batch_size=4, linger_s=0.05, device=jax.devices("cpu")[0]
    )
    try:
        tampered = bytearray(proof)
        tampered[100] ^= 0x40
        bundles = [
            ProofBundle(proof, inputs),
            ProofBundle(bytes(tampered), inputs),
            ProofBundle(proof, inputs),
            ProofBundle(proof, inputs),
            ProofBundle(bytes(tampered), inputs),  # second (partial) batch
        ]
        futures = [svc.submit(b) for b in bundles]
        results = [f.result(timeout=900) for f in futures]
        assert [ok for _, ok in results] == [True, False, True, True, False]
        assert [tag for tag, _ in results] == [b.tag for b in bundles]
        assert svc.verified == 5
    finally:
        svc.close()


def test_service_propagates_errors(setup):
    plan, proof, inputs = setup
    svc = VerificationService(
        plan, batch_size=2, linger_s=0.01, device=jax.devices("cpu")[0]
    )
    try:
        bad = ProofBundle(proof[:-8], inputs)  # wrong proof length
        fut = svc.submit(bad)
        with pytest.raises(Exception):
            fut.result(timeout=300)
    finally:
        svc.close()
