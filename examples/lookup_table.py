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


if __name__ == "__main__":
    main()
