#!/usr/bin/env python
"""Submit proof artifacts to a local VerificationService — the analog of
`cargo run --bin submitter` (aiken-verifier/submitter/src/main.rs), which
reads serialized_proof.hex / serialized_public_input.hex, tags the submission
with blake2b_256(proof ∥ inputs), submits on-chain, and polls.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/submit.py \
      [--circuit simple_mul|lookup_table] [--flavor halo2|gwc19] \
      [--copies N] [--batch B] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="simple_mul", choices=["simple_mul", "lookup_table"])
    ap.add_argument("--flavor", default="halo2", choices=["halo2", "gwc19"])
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="pin to host CPU device")
    args = ap.parse_args()

    import jax

    from plutus_halo2_tpu.models.circuits import LookupRangeCircuit, SimpleMulCircuit
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.prover import prove
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS
    from plutus_halo2_tpu.serving import ProofBundle, VerificationService

    circuit = SimpleMulCircuit() if args.circuit == "simple_mul" else LookupRangeCircuit()
    inputs = [42] * circuit.num_public_inputs
    pk, plan = keygen(circuit, flavor=args.flavor, srs=TrapdoorSRS.from_seed(b"submit-srs"))
    proof = prove(pk, plan, circuit, inputs)

    dev = jax.devices("cpu")[0] if args.cpu else jax.devices()[0]
    svc = VerificationService(plan, batch_size=args.batch, device=dev)

    futures = []
    t0 = time.time()
    for i in range(args.copies):
        p = bytearray(proof)
        if i % 3 == 2:  # every third submission is a tampered proof
            p[100] ^= 0x40
        futures.append(svc.submit(ProofBundle(bytes(p), tuple(inputs))))
    for i, fut in enumerate(futures):
        tag, ok = fut.result(timeout=600)
        print(f"submission {i}: tag={tag.hex()[:16]}… accepted={ok}")
    dt = time.time() - t0
    print(
        f"{len(futures)} submissions in {dt:.2f}s "
        f"({svc.dispatches} device dispatches, device={dev})"
    )
    svc.close()


if __name__ == "__main__":
    main()
