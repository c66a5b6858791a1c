#!/usr/bin/env python
"""TPU smoke of the staged verifier pipeline (round-4 restructure).

Runs at B=128 (one lane tile) on the real chip: exact verify (core ->
shared pair tile -> combine), RLC mode (shared programs), the aggregate
subgroup kernel (honest accept + adversarial non-subgroup reject), and rough
steady-state timings. Uses the repo persistent compilation cache.
"""

import sys
import time

import numpy as np

import plutus_halo2_tpu

plutus_halo2_tpu.enable_compilation_cache()

import jax  # noqa: E402

from plutus_halo2_tpu.models.circuits import SimpleMulCircuit  # noqa: E402
from plutus_halo2_tpu.models.plan import FLAVOR_HALO2  # noqa: E402
from plutus_halo2_tpu.models.verifier_jax import JaxVerifier  # noqa: E402
from plutus_halo2_tpu.refimpl.keygen import keygen  # noqa: E402
from plutus_halo2_tpu.refimpl.prover import prove  # noqa: E402
from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
dev = jax.devices()[0]
print("device:", dev, "batch:", B, flush=True)

circuit = SimpleMulCircuit()
pk, plan = keygen(circuit, flavor=FLAVOR_HALO2,
                  srs=TrapdoorSRS.from_seed(b"bench-srs"))
inputs = [42, 42, 42]
proof = np.frombuffer(prove(pk, plan, circuit, inputs, seed=b"smoke"),
                      dtype=np.uint8)

proofs = np.stack([proof] * B)
proofs[1, 100] ^= 0x40  # corrupted row

# adversarial non-subgroup encoding in row 2 (valid curve point, h-torsion)
from plutus_halo2_tpu.refimpl import curve as rc  # noqa: E402
from plutus_halo2_tpu.refimpl.field import P as FP  # noqa: E402

x = 100
while True:
    rhs = (x**3 + 4) % FP
    y = pow(rhs, (FP + 1) >> 2, FP)
    if y * y % FP == rhs and not rc.g1_in_subgroup((x, y)):
        break
    x += 1
proofs[2, 0:48] = np.frombuffer(rc.g1_compress((x, y)), dtype=np.uint8)

ver = JaxVerifier(plan)  # default: aggregate subgroup mode
pis = ver.encode_public_inputs([inputs] * B)
hints = jax.device_put(ver.compute_y_hints(proofs), dev)
proofs_d = jax.device_put(proofs, dev)
pis_d = jax.device_put(pis, dev)
rng = np.random.default_rng(5)

t0 = time.time()
out = np.asarray(ver.verify(proofs_d, pis_d, hints, sub_rng=rng))
print(f"exact+aggregate first call: {time.time()-t0:.1f}s "
      f"verdicts[:4]={out[:4].tolist()}", flush=True)
assert out[0] and not out[1] and not out[2] and out[3], out[:4]

# steady state (pipelined)
_ = np.asarray(ver.verify(proofs_d, pis_d, hints, sub_rng=rng))
t0 = time.time()
outs = [ver.verify(proofs_d, pis_d, hints, sub_rng=rng) for _ in range(8)]
np.asarray(outs[-1])
dt = (time.time() - t0) / 8
print(f"exact steady: {dt*1000:.1f} ms/batch -> {B/dt:.0f} proofs/s", flush=True)

# RLC mode
w = jax.device_put(ver.rlc_weights(B, rng), dev)
t0 = time.time()
out_r = ver.verify_rlc(proofs_d, pis_d, hints, group=8, rng=rng)
print(f"rlc first call: {time.time()-t0:.1f}s verdicts[:4]={out_r[:4].tolist()}",
      flush=True)
assert out_r[0] and not out_r[1] and not out_r[2] and out_r[3], out_r[:4]
t0 = time.time()
outs = [ver.verify_rlc_device(proofs_d, pis_d, w, hints, group=8, sub_rng=rng)[0]
        for _ in range(8)]
np.asarray(outs[-1])
dt = (time.time() - t0) / 8
print(f"rlc steady: {dt*1000:.1f} ms/batch -> {B/dt:.0f} proofs/s", flush=True)

# direct Pallas subgroup-kernel check vs the XLA oracle (the e2e rows above
# reject the evil row in every mode because the swapped bytes shift the
# challenges; the kernel check is where aggregate-vs-off actually differs)
from plutus_halo2_tpu.ops import curve as jc  # noqa: E402

g = [rc.g1_mul(rc.G1_GEN, 3 + i) for i in range(3)]
rows = [[g[0], g[1], g[2], None], [g[0], (x, y), g[2], g[1]],
        [None] * 4, [(x, y), (x, y), g[1], g[0]]]
pts = np.stack([np.stack([jc.host_point_to_mont(p) for p in r]) for r in rows])
pts_b = np.broadcast_to(pts[:, None], (4, B // 4, 4, 3, pts.shape[-1])).reshape(
    B, 4, 3, pts.shape[-1]
)
wsub = jc.subgroup_weights(4, rounds=2, rng=np.random.default_rng(11))
from plutus_halo2_tpu.ops.pallas_curve import make_subgroup_kernel  # noqa: E402

t0 = time.time()
ok_k = np.asarray(jax.jit(make_subgroup_kernel(4, rounds=2))(
    jax.device_put(pts_b, dev), wsub))
print(f"subgroup kernel compile+run: {time.time()-t0:.1f}s", flush=True)
exp = [True, False, True, False]
got = ok_k.reshape(4, B // 4)[:, 0].tolist()
assert got == exp, f"subgroup kernel wrong: {got}"
print("subgroup kernel verdicts OK:", got, flush=True)

# subgroup off for comparison
ver_off = JaxVerifier(plan, subgroup_check="off")
out_off = np.asarray(ver_off.verify(proofs_d, pis_d, hints))
assert out_off[0] and not out_off[1], out_off[:4]
_ = np.asarray(ver_off.verify(proofs_d, pis_d, hints))
t0 = time.time()
outs = [ver_off.verify(proofs_d, pis_d, hints) for _ in range(8)]
np.asarray(outs[-1])
dt = (time.time() - t0) / 8
print(f"off steady: {dt*1000:.1f} ms/batch -> {B/dt:.0f} proofs/s", flush=True)
print("TPU smoke OK", flush=True)
