#!/usr/bin/env python
"""lookup_table example driver — analog of the reference's
`cargo run --example lookup_table` (examples/lookup_table.rs): a pow2
range-check circuit with a tag/value lookup table, proven natively and
verified with both multi-open flavors."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plutus_halo2_tpu.models.circuits import LookupRangeCircuit
from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.prover import prove
from plutus_halo2_tpu.refimpl.verifier import verify


def main():
    flavor = FLAVOR_GWC if "gwc_kzg" in sys.argv[1:] else FLAVOR_HALO2
    circuit = LookupRangeCircuit(values=(3, 9, 14), bits=4)
    inputs = [7]

    pk, plan = keygen(circuit, flavor=flavor)
    print(f"flavor={flavor} k={plan.vk.k} n={plan.vk.n} lookups={len(plan.lookups)}")
    proof = prove(pk, plan, circuit, inputs)
    print(f"proof: {len(proof)} bytes")
    ok, _ = verify(plan, proof, inputs)
    print(f"verifies: {ok}")
    assert ok

    # negative matrix (code_emitters_aiken.rs:594-639): tampered proof,
    # negated inputs, trivial all-1 inputs — all must reject
    from plutus_halo2_tpu.refimpl.field import Q

    bad = bytearray(proof)
    bad[48 * 2 + 2] ^= 0x40
    ok_bad, _ = verify(plan, bytes(bad), inputs)
    ok_neg, _ = verify(plan, proof, [(-v) % Q for v in inputs])
    ok_triv, _ = verify(plan, proof, [1] * len(inputs))
    print(f"rejects tampered/negated/trivial: {not ok_bad}/{not ok_neg}/{not ok_triv}")
    assert not (ok_bad or ok_neg or ok_triv)

    out_dir = os.path.join(os.path.dirname(__file__), "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    from plutus_halo2_tpu.utils.serialization import (
        export_proof,
        export_public_inputs,
        vk_to_json,
    )

    with open(os.path.join(out_dir, "lookup_table_proof.hex"), "w") as f:
        f.write(export_proof(proof))
    with open(os.path.join(out_dir, "lookup_table_proof_invalid.hex"), "w") as f:
        f.write(export_proof(bytes(bad)))
    with open(os.path.join(out_dir, "lookup_table_public_input.hex"), "w") as f:
        f.write(export_public_inputs(inputs))
    with open(os.path.join(out_dir, "lookup_table_vk.json"), "w") as f:
        f.write(vk_to_json(plan.vk))


if __name__ == "__main__":
    main()
