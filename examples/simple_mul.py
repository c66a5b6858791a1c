#!/usr/bin/env python
"""simple_mul example driver — the analog of the reference's
`cargo run --example simple_mul [gwc_kzg]` (examples/simple_mul.rs):
keygen, prove natively, self-verify with the spec verifier, export artifacts,
and verify a batch on device.

Usage: python examples/simple_mul.py [gwc_kzg] [--device]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.prover import prove
from plutus_halo2_tpu.refimpl.verifier import verify
from plutus_halo2_tpu.utils.serialization import (
    export_proof,
    export_public_inputs,
    serialize_proof,
    vk_to_json,
)


def main():
    flavor = FLAVOR_GWC if "gwc_kzg" in sys.argv[1:] else FLAVOR_HALO2
    on_device = "--device" in sys.argv[1:]

    constant, a, b = 7, 2, 3
    c = constant * a * a * b * b
    circuit = SimpleMulCircuit(constant, a, b, c)
    inputs = [42, 42, 42]

    print(f"flavor: {flavor}")
    pk, plan = keygen(circuit, flavor=flavor)
    print(f"k={plan.vk.k} n={plan.vk.n} blinding={plan.vk.blinding_factors}")

    proof = prove(pk, plan, circuit, inputs)
    print(f"proof: {len(proof)} bytes")

    ok, _ = verify(plan, proof, inputs)
    print(f"spec verifier accepts: {ok}")
    assert ok

    # invalid proof: flip a byte inside the first scalar after the points
    # (the reference's examples do the same, examples/simple_mul.rs:113-120)
    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok_bad, _ = verify(plan, bytes(bad), inputs)
    print(f"spec verifier rejects tampered proof: {not ok_bad}")
    assert not ok_bad

    # negated and trivial all-1 public inputs must reject (the reference
    # embeds the same negative cases, code_emitters_aiken.rs:594-639)
    from plutus_halo2_tpu.refimpl.field import Q

    ok_neg, _ = verify(plan, proof, [(-v) % Q for v in inputs])
    ok_triv, _ = verify(plan, proof, [1] * len(inputs))
    print(f"spec verifier rejects negated inputs: {not ok_neg}")
    print(f"spec verifier rejects trivial all-1 inputs: {not ok_triv}")
    assert not ok_neg and not ok_triv

    out_dir = os.path.join(os.path.dirname(__file__), "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "simple_mul_proof.hex"), "w") as f:
        f.write(export_proof(proof))
    with open(os.path.join(out_dir, "simple_mul_proof.json"), "w") as f:
        f.write(serialize_proof(proof))
    # invalid-proof fixture next to the valid one (examples/simple_mul.rs:113-120)
    with open(os.path.join(out_dir, "simple_mul_proof_invalid.hex"), "w") as f:
        f.write(export_proof(bytes(bad)))
    with open(os.path.join(out_dir, "simple_mul_public_input.hex"), "w") as f:
        f.write(export_public_inputs(inputs))
    with open(os.path.join(out_dir, "simple_mul_vk.json"), "w") as f:
        f.write(vk_to_json(plan.vk))
    print(f"artifacts written to {out_dir}")

    if on_device:
        import plutus_halo2_tpu

        plutus_halo2_tpu.enable_compilation_cache()
        from plutus_halo2_tpu.models.verifier_jax import JaxVerifier

        verifier = JaxVerifier(plan)
        batch = np.stack([np.frombuffer(proof, dtype=np.uint8)] * 8)
        pis = verifier.encode_public_inputs([inputs] * 8)
        out = np.asarray(verifier.verify(batch, pis))
        print(f"device verdicts: {out.tolist()}")


if __name__ == "__main__":
    main()
