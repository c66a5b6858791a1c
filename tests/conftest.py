"""Test configuration.

We need a virtual 8-device CPU mesh for sharding tests (multi-chip TPU
hardware is not available). NOTE: do NOT set JAX_PLATFORMS=cpu here — with the
axon TPU plugin present that combination wedges device transfers. Instead we
leave platform discovery alone, force 8 host CPU devices, and tests pin
computations to jax.devices("cpu") explicitly where needed."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # Persistent XLA compilation cache: the limb-arithmetic graphs are
    # compile-heavy; repeated test runs amortize to near-zero.
    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache(
        os.path.join(os.path.dirname(__file__), "..", ".xla_cache")
    )
    # Pin the default device to host CPU: unit tests are correctness tests and
    # eager dispatch over the remote TPU tunnel is latency-bound. Bench code
    # targets the TPU explicitly.
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    import jax

    return jax.devices("cpu")
