#!/usr/bin/env python
"""Stage-level TPU microbenchmarks: times each verifier stage and both
Montgomery-mul variants at a given batch size, to locate the latency floor.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_probe.py [BATCH] [stage...]
Stages: mul, chain, pairing, msm, blake, decompress (default: all)."""

import sys
import time

import numpy as np

import jax  # noqa: E402 — after axon site registration via PYTHONPATH


def fetch(out):
    """Force completion: block_until_ready is unreliable through the axon
    tunnel, so materialize every output leaf on the host."""
    return [np.asarray(x) for x in jax.tree.leaves(out)]


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = fetch(jfn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        fetch(jfn(*args))
        times.append(time.time() - t0)
    print(f"{name:32s} run={min(times)*1e3:9.2f} ms  compile={compile_s:7.1f} s", flush=True)
    return out


def main():
    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()
    import jax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    stages = set(sys.argv[2:]) or {
        "mul", "chain", "pairing", "msm", "blake", "decompress", "sqrtp", "verify"
    }
    dev = jax.devices()[0]
    print(f"device={dev} batch={B}", flush=True)

    from plutus_halo2_tpu.ops import curve as jc, limb
    from plutus_halo2_tpu.ops import pairing as jp
    from plutus_halo2_tpu.ops.blake2b import blake2b_256
    from plutus_halo2_tpu.refimpl import curve as rc

    spec = limb.FP_SPEC
    a = jax.device_put(np.stack([spec.to_mont(3)] * B), dev)
    b = jax.device_put(np.stack([spec.to_mont(5)] * B), dev)

    if "mul" in stages:
        timeit("mont_mul_cios x1", lambda x, y: limb.mont_mul_cios(spec, x, y), a, b)
        timeit("mont_mul_conv x1", lambda x, y: limb.mont_mul_conv(spec, x, y), a, b)

    if "chain" in stages:
        # 1000 sequential dependent muls — measures per-mul latency floor
        def chain(mulfn):
            def f(x, y):
                import jax as _jax

                def body(c, _):
                    return mulfn(spec, c, y), None

                out, _ = _jax.lax.scan(body, x, None, length=1000)
                return out

            return f

        timeit("1000 seq cios muls", chain(limb.mont_mul_cios), a, b)
        timeit("1000 seq conv muls", chain(limb.mont_mul_conv), a, b)

    if "blake" in stages:
        msgs = jax.device_put(np.zeros((B, 1152), dtype=np.uint8), dev)
        timeit("blake2b_256 1152B", blake2b_256, msgs)

    if "decompress" in stages:
        raw = np.stack(
            [np.frombuffer(rc.g1_compress(rc.g1_mul(rc.G1_GEN, 7)), dtype=np.uint8)] * B
        )
        npts = 16
        raw16 = jax.device_put(np.stack([raw] * npts, axis=1), dev)
        timeit("decompress 16 pts", lambda r: jc.decompress(r)[0], raw16)

    if "sqrtp" in stages:
        # the in-verifier decompression sqrt: pallas pow kernel (24-limb
        # kernel domain), width = #points
        from plutus_halo2_tpu.ops.pallas_core import FP24_SPEC
        from plutus_halo2_tpu.ops.pallas_field import make_pow_kernel

        width = 16
        vals = np.stack(
            [np.stack([FP24_SPEC.to_mont(7 + i) for i in range(width)])] * B
        )
        vals_d = jax.device_put(vals, dev)
        powk = make_pow_kernel(FP24_SPEC, (spec.N + 1) >> 2, width)
        timeit(f"pallas sqrt pow w={width}", powk, vals_d)

    if "msm" in stages or "msmp" in stages or "msmp5" in stages:
        import os

        K = int(os.environ.get("PROBE_MSM_K", "24"))
        pts = np.stack(
            [np.stack([jc.host_point_to_mont(rc.g1_mul(rc.G1_GEN, i + 2)) for i in range(K)])] * B
        )
        scs = np.stack([np.stack([limb.FR_SPEC.encode(12345 + i) for i in range(K)])] * B)
        pts_d, scs_d = jax.device_put(pts, dev), jax.device_put(scs, dev)
        if "msm" in stages:
            timeit(f"msm K={K}", jc.msm, pts_d, scs_d)
        for stage, wbits in (("msmp", 4), ("msmp5", 5)):
            if stage not in stages:
                continue
            from plutus_halo2_tpu.ops import pallas_curve
            from plutus_halo2_tpu.refimpl.field import Q

            pmsm = pallas_curve.make_msm_kernel(K, wbits=wbits)
            out = timeit(f"pallas msm K={K} w={wbits}", pmsm, pts_d, scs_d)[0]
            got = jc.host_point_from_mont(np.asarray(out)[0])
            exp = None
            for i in range(K):
                exp = rc.g1_add(exp, rc.g1_mul(rc.g1_mul(rc.G1_GEN, i + 2), 12345 + i))
            assert got == exp, f"pallas msm (w={wbits}) wrong on TPU"
            print(f"pallas msm w={wbits} result verified", flush=True)

    if "verify" in stages:
        from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
        from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
        from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
        from plutus_halo2_tpu.refimpl.keygen import keygen
        from plutus_halo2_tpu.refimpl.prover import prove
        from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

        circuit = SimpleMulCircuit()
        pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"bench-srs"))
        inputs = [42, 42, 42]
        proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"probe"), dtype=np.uint8)
        proofs = jax.device_put(np.stack([proof] * B), dev)
        ver = JaxVerifier(plan)
        pis = jax.device_put(ver.encode_public_inputs([inputs] * B), dev)
        sw = jax.device_put(ver.subgroup_weights(np.random.default_rng(7)), dev)
        out = timeit("full verify",
                     lambda p_, i_: ver._verify_impl(p_, i_, sub_weights=sw),
                     proofs, pis)
        assert bool(out[0][0]), "verify probe rejected a valid proof"

    if "core" in stages:
        # everything except the pairing: transcript + challenges + scalar
        # side + decompression (hinted) + multiopen MSM
        from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
        from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
        from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
        from plutus_halo2_tpu.refimpl.keygen import keygen
        from plutus_halo2_tpu.refimpl.prover import prove
        from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

        circuit = SimpleMulCircuit()
        pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"bench-srs"))
        inputs = [42, 42, 42]
        proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"probe"), dtype=np.uint8)
        proofs_np = np.stack([proof] * B)
        proofs = jax.device_put(proofs_np, dev)
        ver = JaxVerifier(plan)
        pis = jax.device_put(ver.encode_public_inputs([inputs] * B), dev)
        hints = jax.device_put(ver.compute_y_hints(proofs_np), dev)

        def reduced(fn):
            # tiny outputs: a fetch of the full (B, 3, L) el/er pair skews
            # the wall time by ~100 ms of tunnel transfer
            def f(*a):
                el, er, av = fn(*a)
                return jnp.sum(el, dtype=jnp.uint32), jnp.sum(er, dtype=jnp.uint32), jnp.all(av)

            return f

        import jax.numpy as jnp

        timeit("core (no pairing, hinted)", reduced(ver._core_impl), proofs, pis, hints)
        timeit("core (no pairing, hintless)", reduced(ver._core_impl), proofs, pis)

    if "subk" in stages:
        # the aggregate subgroup kernel (default strict mode), K=16 rounds=2
        import os

        from plutus_halo2_tpu.ops import pallas_curve as pc

        Ks = int(os.environ.get("PROBE_SUB_K", "16"))
        rounds = int(os.environ.get("PROBE_SUB_ROUNDS", "2"))
        pts = np.stack(
            [np.stack([jc.host_point_to_mont(rc.g1_mul(rc.G1_GEN, i + 2))
                       for i in range(Ks)])] * B
        )
        w = jc.subgroup_weights(Ks, rounds, np.random.default_rng(1))
        subk = pc.make_subgroup_kernel(Ks, rounds=rounds)
        out = timeit(f"pallas subgroup K={Ks} r={rounds}", subk,
                     jax.device_put(pts, dev), w)[0]
        assert bool(np.asarray(out)[0]), "honest subgroup row rejected"

    if "verifyh" in stages:
        from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
        from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
        from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
        from plutus_halo2_tpu.refimpl.keygen import keygen
        from plutus_halo2_tpu.refimpl.prover import prove
        from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

        circuit = SimpleMulCircuit()
        pk, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"bench-srs"))
        inputs = [42, 42, 42]
        proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"probe"), dtype=np.uint8)
        proofs_np = np.stack([proof] * B)
        proofs = jax.device_put(proofs_np, dev)
        ver = JaxVerifier(plan)
        pis = jax.device_put(ver.encode_public_inputs([inputs] * B), dev)
        hints = jax.device_put(ver.compute_y_hints(proofs_np), dev)
        sw = jax.device_put(ver.subgroup_weights(np.random.default_rng(7)), dev)
        out = timeit("full verify (y-hints)",
                     lambda p_, i_, h_: ver._verify_impl(p_, i_, h_, sw),
                     proofs, pis, hints)
        assert bool(out[0][0]), "hinted verify probe rejected a valid proof"

    if "pairing" in stages or "pairingp" in stages:
        from plutus_halo2_tpu.refimpl.field import Q, fr_inv

        tau = 0xDEADBEEF
        poly = lambda t: (3 * t * t + 7) % Q
        z, yv = 5, poly(5)
        a = (poly(tau) - yv) * fr_inv(tau - z) % Q
        W = rc.g1_mul(rc.G1_GEN, a)
        # e(W, tau G2) * e(er, G2) == 1 requires er = -tau*a*G1
        er = rc.g1_mul(rc.G1_GEN, (-tau * a) % Q)
        prep1 = jp.prepare_g2(rc.g2_mul(rc.G2_GEN, tau))
        prep2 = jp.prepare_g2(rc.G2_GEN)
        elx = jax.device_put(np.stack([spec.to_mont(W[0])] * B), dev)
        ely = jax.device_put(np.stack([spec.to_mont(W[1])] * B), dev)
        erx = jax.device_put(np.stack([spec.to_mont(er[0])] * B), dev)
        ery = jax.device_put(np.stack([spec.to_mont(er[1])] * B), dev)
        inf = jax.device_put(np.zeros(B, dtype=bool), dev)

        if "pairingp" in stages:
            from plutus_halo2_tpu.ops import pallas_pairing

            check = pallas_pairing.make_pairing_check(prep1, prep2)
            el_p = np.stack([jc.host_point_to_mont(W)] * B)
            er_p = np.stack([jc.host_point_to_mont(er)] * B)
            # corrupt one row to exercise the reject path
            el_p[1] = jc.host_point_to_mont(rc.g1_mul(rc.G1_GEN, 99))
            el_d = jax.device_put(el_p, dev)
            er_d = jax.device_put(er_p, dev)
            out = timeit("pallas pairing_check", check, el_d, er_d)[0]
            assert bool(out[0]) and not bool(out[1]), f"pallas pairing wrong: {out[:4]}"
            print("pallas pairing result verified", flush=True)
            return

        timeit(
            "miller (2 pairs)",
            lambda ax, ay, bx, by, i: jp.miller_prepared(
                [((ax, ay, i), prep1), ((bx, by, i), prep2)]
            ),
            elx, ely, erx, ery, inf,
        )
        timeit(
            "pairing_check (2 pairs)",
            lambda ax, ay, bx, by, i: jp.pairing_check(
                [((ax, ay, i), prep1), ((bx, by, i), prep2)]
            ),
            elx, ely, erx, ery, inf,
        )


if __name__ == "__main__":
    main()
