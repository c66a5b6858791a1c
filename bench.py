#!/usr/bin/env python
"""Benchmark: batched simple_mul Halo2 proof verification throughput on TPU.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.json north star): >= 10_000 simple_mul
verifications/s per v5e chip.

Tries batch sizes from BENCH_BATCHES (comma list, largest first) and falls
back to the next candidate if the backend rejects a shape."""

import json
import os
import sys
import time

import numpy as np


def run_once(batch: int, iters: int):
    import jax

    from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
    from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
    from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.prover import prove
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

    circuit = SimpleMulCircuit()
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"bench-srs"))
    inputs = [42, 42, 42]
    base_proofs = [
        np.frombuffer(prove(pk, plan, circuit, inputs, seed=f"bench-{i}".encode()), dtype=np.uint8)
        for i in range(4)
    ]
    reps = -(-batch // len(base_proofs))
    proofs = np.stack((base_proofs * reps)[:batch])
    # a couple of deliberately corrupted rows keep the accept path honest
    proofs = proofs.copy()
    proofs[1, 100] ^= 0x40

    verifier = JaxVerifier(plan)
    pis = verifier.encode_public_inputs([inputs] * batch)

    dev = jax.devices()[0]
    proofs_d = jax.device_put(proofs, dev)
    pis_d = jax.device_put(pis, dev)

    t0 = time.time()
    out = np.asarray(verifier.verify(proofs_d, pis_d))
    compile_time = time.time() - t0
    assert out[0] and not out[1], f"bench sanity failed: {out[:4]}"

    times = []
    for _ in range(iters):
        t0 = time.time()
        verifier.verify(proofs_d, pis_d)[0].block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    throughput = batch / best

    print(
        json.dumps(
            {
                "metric": "simple_mul_halo2_verifications_per_sec_per_chip",
                "value": round(throughput, 2),
                "unit": "proofs/s",
                "vs_baseline": round(throughput / 10_000.0, 4),
                "batch": batch,
                "steady_state_sec": round(best, 4),
                "compile_sec": round(compile_time, 1),
                "device": str(dev),
            }
        )
    )


def main():
    batches = [
        int(b)
        for b in os.environ.get(
            "BENCH_BATCHES", os.environ.get("BENCH_BATCH", "1024,64")
        ).split(",")
    ]
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()

    last_err = None
    for batch in batches:
        try:
            run_once(batch, iters)
            return
        except Exception as e:  # noqa: BLE001 — backend shape limits fall through
            last_err = e
            print(f"# batch={batch} failed: {type(e).__name__}: {e}", file=sys.stderr)
    raise SystemExit(f"all batch sizes failed; last error: {last_err}")


if __name__ == "__main__":
    main()
