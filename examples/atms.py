#!/usr/bin/env python
"""ATMS example driver — the analog of the reference's
`cargo run --example atms [gwc_kzg]` and `--example atms_with_lookups`
(examples/atms.rs, examples/atms_with_lookups.rs): prepare threshold
signatures, keygen, prove natively, self-verify with the spec verifier,
export artifacts, optionally verify a batch on device.

Usage: python examples/atms.py [gwc_kzg] [--lookups] [--device]
                               [--parties N] [--threshold T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plutus_halo2_tpu.models.atms import (
    AtmsCircuit,
    AtmsLookupCircuit,
    prepare_test_signatures,
)
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


def _arg(name, default):
    argv = sys.argv[1:]
    if name in argv:
        return int(argv[argv.index(name) + 1])
    return default


def main():
    flavor = FLAVOR_GWC if "gwc_kzg" in sys.argv[1:] else FLAVOR_HALO2
    with_lookups = "--lookups" in sys.argv[1:]
    on_device = "--device" in sys.argv[1:]
    n_parties = _arg("--parties", 2)
    threshold = _arg("--threshold", 1)
    msg = 424242

    cls = AtmsLookupCircuit if with_lookups else AtmsCircuit
    name = "atms_with_lookups" if with_lookups else "atms"
    if (n_parties, threshold) != (2, 1):
        # non-default scale (e.g. the reference's 50/90 and 228/408 benchmark
        # scales, README.md:220-221): keep the default artifacts intact
        name = f"{name}_{threshold}_{n_parties}"
    print(f"circuit: {name}  flavor: {flavor}  parties: {n_parties}  threshold: {threshold}")

    pks, sigs, pks_comm = prepare_test_signatures(n_parties, threshold, msg)
    circuit = cls(pks, sigs, msg, threshold)
    inputs = circuit.public_inputs()

    t0 = time.time()
    pk, plan = keygen(circuit, flavor=flavor)
    print(f"k={plan.vk.k} n={plan.vk.n} perm_sets={plan.num_permutation_sets} "
          f"lookups={len(plan.lookups)} keygen={time.time()-t0:.1f}s")

    t0 = time.time()
    proof = prove(pk, plan, circuit, inputs)
    print(f"proof: {len(proof)} bytes in {time.time()-t0:.1f}s")

    ok, _ = verify(plan, proof, inputs)
    print(f"spec verifier accepts: {ok}")
    assert ok

    # circuit-correct flip offset: the first scalar byte after the G1
    # commitment prefix, the reference's per-circuit choice (atms.rs:111 uses
    # 48*16+2, atms_with_lookups.rs:135 uses 48*20+2) — derived here from the
    # plan's own static layout instead of a hard-coded point count
    from plutus_halo2_tpu.models.layout import build_layout

    first_scalar = min(build_layout(plan).scalar_offsets.values())
    bad = bytearray(proof)
    bad[first_scalar + 2] ^= 0x40
    print(f"invalid-proof flip offset: {first_scalar + 2} "
          f"(= first scalar + 2; {first_scalar // 48} leading points)")
    ok_bad, _ = verify(plan, bytes(bad), inputs)
    print(f"spec verifier rejects tampered proof: {not ok_bad}")
    assert not ok_bad

    ok_msg, _ = verify(plan, proof, [inputs[0], msg + 1, threshold])
    print(f"spec verifier rejects wrong message: {not ok_msg}")
    assert not ok_msg

    # trivial all-1 inputs (code_emitters_aiken.rs:627-639) must reject
    ok_triv, _ = verify(plan, proof, [1] * len(inputs))
    print(f"spec verifier rejects trivial all-1 inputs: {not ok_triv}")
    assert not ok_triv

    out_dir = os.path.join(os.path.dirname(__file__), "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{name}_proof_invalid.hex"), "w") as f:
        f.write(export_proof(bytes(bad)))
    with open(os.path.join(out_dir, f"{name}_proof.hex"), "w") as f:
        f.write(export_proof(proof))
    with open(os.path.join(out_dir, f"{name}_proof.json"), "w") as f:
        f.write(serialize_proof(proof))
    with open(os.path.join(out_dir, f"{name}_public_input.hex"), "w") as f:
        f.write(export_public_inputs(inputs))
    with open(os.path.join(out_dir, f"{name}_vk.json"), "w") as f:
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
