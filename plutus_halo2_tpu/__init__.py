"""plutus_halo2_tpu — TPU-native Halo2/KZG verification framework.

A from-scratch JAX/Pallas re-design of the capabilities of
input-output-hk/plutus-halo2-verifier-gen (reference mounted read-only at
/root/reference): BLS12-381 field/curve/pairing arithmetic, the Cardano-friendly
Blake2b-256 Fiat-Shamir transcript, circuit-specialized Halo2 verification with
both KZG multi-open flavors (Halo2-book and GWC19), batched and sharded over TPU
device meshes.

Layout:
  refimpl/  — pure-Python executable spec (ground-truth oracle + native prover)
  ops/      — TPU compute kernels (vectorized limb arithmetic, curve, hash)
  models/   — CircuitPlan IR + plan-specialized jitted verifiers
  parallel/ — mesh/sharding utilities (batch DP, sharded MSM)
  utils/    — serialization, config, tracing
"""

__version__ = "0.1.0"
