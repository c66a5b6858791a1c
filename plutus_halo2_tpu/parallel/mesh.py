"""Mesh/sharding utilities: batch data-parallel verification and
point-sharded MSM.

The reference has no distributed layer (SURVEY §2.4); these are the TPU-native
replacements: proofs shard over the batch axis of a device mesh (DP over
ICI/DCN), large MSMs shard their point axis with a cross-device point-add
reduction. Designed against jax.sharding.Mesh so the same code drives one
chip, one host, or a multi-host slice."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve as jc


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "batch"):
    """Place arrays with their leading dim sharded over the mesh axis."""
    out = []
    for a in arrays:
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def data_parallel_verify(verifier, mesh: Mesh, proof_bytes, public_inputs,
                         axis_name: str = "batch"):
    """Batch-DP verification: shard the proof batch over the mesh; XLA runs
    the identical per-shard program with no cross-device communication (the
    verdict stays sharded; gather is the caller's choice)."""
    proof_s, pis_s = shard_batch(mesh, proof_bytes, public_inputs, axis_name=axis_name)
    fn = jax.jit(
        verifier._verify_impl,
        in_shardings=(
            NamedSharding(mesh, P(axis_name, None)),
            NamedSharding(mesh, P(axis_name, None, None)),
        ),
        out_shardings=NamedSharding(mesh, P(axis_name)),
    )
    return fn(proof_s, pis_s)


def sharded_msm(mesh: Mesh, points, scalars, axis_name: str = "shard"):
    """MSM with the point axis sharded across devices: each device computes a
    partial windowed MSM over its K/n slice, then partial sums are combined
    with an all-gather + local point-add tree (projective point addition is
    not a psum-able monoid over raw limbs, so the reduction is explicit).

    points: (K, 3, L) uint32, scalars: (K, L_fr) uint32; K divisible by mesh
    size. Returns the (3, L) projective sum replicated on all devices."""
    n_dev = mesh.devices.size

    def local(points_shard, scalars_shard):
        acc = jc.msm(points_shard, scalars_shard)  # (3, L)
        all_parts = jax.lax.all_gather(acc, axis_name)  # (n_dev, 3, L)
        total = all_parts[0]
        for i in range(1, n_dev):
            total = jc.add(total, all_parts[i])
        return total

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None)),
        out_specs=P(),
        check_rep=False,
    )
    return fn(points, scalars)
