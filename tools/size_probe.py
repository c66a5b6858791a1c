#!/usr/bin/env python
"""Per-stage compiled-program size probe.

STAGES.md establishes that compiled-executable SIZE — loaded through the
device tunnel at ~64 KB/s — dominates both cold and warm starts in this
environment, so all compile-time work targets program size. This tool
compiles each verifier stage with the persistent cache pointed at a FRESH
directory and reports the serialized executable bytes the cache writes
(plus wall compile time), giving the size ledger the compile campaign
optimizes against.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/size_probe.py \
           [BATCH] [stage ...]
Stages: msm, pairing, sqrtp, core, verify, verifyh, rlc (default: all).
"""

import os
import sys
import tempfile
import time

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
STAGES = set(sys.argv[2:]) or {"msm", "pairing", "sqrtp", "core", "verify",
                               "verifyh", "rlc"}

CACHE = tempfile.mkdtemp(prefix="size_probe_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def cache_delta(before):
    now = {}
    for root, _dirs, files in os.walk(CACHE):
        for fn in files:
            p = os.path.join(root, fn)
            now[p] = os.path.getsize(p)
    new = {p: s for p, s in now.items() if p not in before}
    return now, sum(new.values())


def report(name, fn, *args, jit=True):
    """jit=False: fn is already a pipeline of jitted programs (the staged
    verifier paths) — call it directly so the probe measures the MARGINAL
    programs it compiles, not a monolithic re-trace."""
    before, _ = cache_delta({})
    t0 = time.time()
    out = (jax.jit(fn) if jit else fn)(*args)
    _ = [np.asarray(x) for x in jax.tree.leaves(out)]
    dt = time.time() - t0
    _, nbytes = cache_delta(before)
    print(f"{name:24s} compile={dt:8.1f}s  cache_bytes={nbytes/1e6:8.2f} MB",
          flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device={dev} batch={BATCH} cache={CACHE}", flush=True)

    from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
    from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
    from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
    from plutus_halo2_tpu.ops import curve as jc
    from plutus_halo2_tpu.ops.limb import FR_SPEC
    from plutus_halo2_tpu.refimpl import curve as rc
    from plutus_halo2_tpu.refimpl.field import Q
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.prover import prove
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

    circuit = SimpleMulCircuit()
    pk, plan = keygen(circuit, flavor=FLAVOR_HALO2,
                      srs=TrapdoorSRS.from_seed(b"bench-srs"))
    inputs = [42, 42, 42]
    proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"probe"),
                          dtype=np.uint8)
    proofs_np = np.stack([proof] * BATCH)
    proofs = jax.device_put(proofs_np, dev)
    ver = JaxVerifier(plan)
    pis = jax.device_put(ver.encode_public_inputs([inputs] * BATCH), dev)
    hints = jax.device_put(ver.compute_y_hints(proofs_np), dev)

    if "msm" in STAGES:
        from plutus_halo2_tpu.ops import pallas_curve

        K = 16
        pts = np.stack(
            [np.stack([jc.host_point_to_mont(rc.g1_mul(rc.G1_GEN, i + 2))
                       for i in range(K)])] * BATCH
        )
        scs = np.stack(
            [np.stack([FR_SPEC.encode(12345 + i) for i in range(K)])] * BATCH
        )
        report(f"pallas msm K={K}", pallas_curve.make_msm_kernel(K),
               jax.device_put(pts, dev), jax.device_put(scs, dev))

    if "pairing" in STAGES:
        ident = np.asarray(jc.host_point_to_mont(None))
        pts_b = jax.device_put(
            np.broadcast_to(ident, (BATCH, 3, ident.shape[-1])).copy(), dev
        )
        report("pallas pairing", ver._pallas_pairing(), pts_b, pts_b)

    if "sqrtp" in STAGES:
        from plutus_halo2_tpu.ops.limb import FP_SPEC
        from plutus_halo2_tpu.ops.pallas_core import FP24_SPEC
        from plutus_halo2_tpu.ops.pallas_field import make_pow_kernel

        width = 16
        vals = np.stack(
            [np.stack([FP24_SPEC.to_mont(7 + i) for i in range(width)])] * BATCH
        )
        report("pallas sqrt pow w=16",
               make_pow_kernel(FP24_SPEC, (FP_SPEC.N + 1) >> 2, width),
               jax.device_put(vals, dev))

    if "core" in STAGES:
        def reduced(*a):
            el, er, av = ver._core_impl(*a)
            return (jnp.sum(el, dtype=jnp.uint32), jnp.sum(er, dtype=jnp.uint32),
                    jnp.all(av))

        report("core (hinted)", reduced, proofs, pis, hints)

    # the staged paths (jit=False): each row reports the MARGINAL programs it
    # compiles on top of the rows above it — the pairing payload and the core
    # program are shared, so "rlc" should be small once "verifyh" has run
    if "verify" in STAGES:
        report("verify (hintless)", ver.verify, proofs, pis, jit=False)

    if "verifyh" in STAGES:
        report("verify (hinted)", ver.verify, proofs, pis, hints, jit=False)

    if "rlc" in STAGES:
        w = jax.device_put(ver.rlc_weights(BATCH, np.random.default_rng(1)), dev)
        report("rlc group=8 (hinted)",
               lambda *a: ver.verify_rlc_device(*a, group=8)[0],
               proofs, pis, w, hints, jit=False)

    if "monolith" in STAGES:
        # the single-program form shard_map/multichip uses (pairing payload
        # embedded inline) — kept for comparison with the staged rows
        sw = jax.device_put(ver.subgroup_weights(np.random.default_rng(7)), dev)
        report("monolithic verify",
               lambda p_, i_, h_: ver._verify_impl(p_, i_, h_, sw),
               proofs, pis, hints)


if __name__ == "__main__":
    main()
