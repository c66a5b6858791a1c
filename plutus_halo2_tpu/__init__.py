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


def enable_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache. The circuit-specialized
    verifier compiles once per (plan, batch shape); the cache makes that a
    one-time cost per machine."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "PH2_TPU_CACHE", os.path.expanduser("~/.cache/plutus_halo2_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
