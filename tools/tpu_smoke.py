#!/usr/bin/env python
"""Stepwise TPU smoke test: runs each kernel family on the TPU in sequence to
isolate backend failures. Run with no other JAX process alive (the axon
tunnel is single-client)."""

import sys
import time

import numpy as np


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[ok] {name}: {out} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        sys.exit(1)


def main():
    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    step("arange-sum", lambda: int(jnp.arange(8).sum()))

    from plutus_halo2_tpu.ops import curve as jc, limb
    from plutus_halo2_tpu.ops.blake2b import blake2b_256
    from plutus_halo2_tpu.refimpl import curve as rc

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spec = limb.FP_SPEC

    a1 = jax.device_put(np.stack([spec.to_mont(3)] * B), dev)
    step(
        "montmul",
        lambda: spec.from_mont_int(
            np.asarray(jax.jit(lambda x, y: limb.mont_mul(spec, x, y))(a1, a1))[0]
        )
        == 9,
    )

    msgs = jax.device_put(np.zeros((B, 300), dtype=np.uint8), dev)
    import hashlib

    step(
        "blake2b",
        lambda: np.asarray(jax.jit(blake2b_256)(msgs))[0].tobytes()
        == hashlib.blake2b(bytes(300), digest_size=32).digest(),
    )

    a = jax.device_put(np.stack([jc.host_point_to_mont(rc.g1_mul(rc.G1_GEN, 5))] * B), dev)
    step("point-add", lambda: bool(np.asarray(jax.jit(jc.add)(a, a))[0, 0, 0] >= 0))

    s = jax.device_put(np.stack([limb.FR_SPEC.encode(12345)] * B), dev)
    step(
        "scalar-mul",
        lambda: jc.host_point_from_mont(np.asarray(jax.jit(jc.mul)(a, s))[0])
        == rc.g1_mul(rc.G1_GEN, 5 * 12345),
    )

    raw = np.stack(
        [np.frombuffer(rc.g1_compress(rc.g1_mul(rc.G1_GEN, 7)), dtype=np.uint8)] * B
    )
    raw_d = jax.device_put(raw, dev)
    step(
        "decompress",
        lambda: bool(np.asarray(jax.jit(jc.decompress)(raw_d)[1])[0]),
    )

    from plutus_halo2_tpu.ops import pairing as jp
    from plutus_halo2_tpu.ops import tower
    from plutus_halo2_tpu.refimpl.field import Q, fr_inv

    tau = 0xDEADBEEF
    poly = lambda t: (3 * t * t + 7) % Q
    z, yv = 5, poly(5)
    C = rc.g1_mul(rc.G1_GEN, poly(tau))
    W = rc.g1_mul(rc.G1_GEN, (poly(tau) - yv) * fr_inv(tau - z) % Q)
    s_g2 = rc.g2_mul(rc.G2_GEN, tau)
    er = rc.g1_neg(
        rc.g1_add(rc.g1_add(rc.g1_mul(W, z), C), rc.g1_neg(rc.g1_mul(rc.G1_GEN, yv)))
    )
    prep1 = jp.prepare_g2(s_g2)
    prep2 = jp.prepare_g2(rc.G2_GEN)
    elx = jax.device_put(np.stack([limb.FP_SPEC.to_mont(W[0])] * B), dev)
    ely = jax.device_put(np.stack([limb.FP_SPEC.to_mont(W[1])] * B), dev)
    erx = jax.device_put(np.stack([limb.FP_SPEC.to_mont(er[0])] * B), dev)
    ery = jax.device_put(np.stack([limb.FP_SPEC.to_mont(er[1])] * B), dev)
    inf = jax.device_put(np.zeros(B, dtype=bool), dev)
    step(
        "pairing-check",
        lambda: bool(
            np.asarray(
                jax.jit(
                    lambda ax, ay, bx, by, i: jp.pairing_check(
                        [((ax, ay, i), prep1), ((bx, by, i), prep2)]
                    )
                )(elx, ely, erx, ery, inf)
            )[0]
        ),
    )

    print("ALL TPU SMOKE STEPS PASSED", flush=True)


if __name__ == "__main__":
    main()
