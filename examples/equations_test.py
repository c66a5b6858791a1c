#!/usr/bin/env python
"""Gate-equation vector generator — the analog of the reference's
`cargo run --example equations_test` (examples/equations_test.rs:50-57), which
renders `gates_test.hbs` into a standalone Aiken expected-value unit test for
every gate polynomial of the circuit.

Here: for each circuit we derive deterministic pseudo-random evaluations for
every advice/fixed query leaf, evaluate each gate expression with the
pure-Python spec environment, and emit the vectors as JSON.
`tests/test_gate_equations.py` replays the same vectors through the TPU
(JAX limb) expression evaluator and asserts bit-exact equality — the same
gate-equation regression the generated `lib/gates_test.ak` provides.

Usage: python examples/equations_test.py [--atms]
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plutus_halo2_tpu.refimpl.field import Q


def det_scalar(tag: str) -> int:
    """Deterministic field element from a tag (blake2b, like the transcript)."""
    return int.from_bytes(hashlib.blake2b(tag.encode(), digest_size=32).digest(), "little") % Q


def gate_vectors(name: str, plan) -> dict:
    """Evaluate every gate expression of a plan at deterministic leaf values."""
    from plutus_halo2_tpu.refimpl.verifier import _ScalarEnv

    advice = [det_scalar(f"{name}:advice:{i}") for i in range(len(plan.advice_queries))]
    fixed = [det_scalar(f"{name}:fixed:{i}") for i in range(len(plan.fixed_queries))]
    env = _ScalarEnv(
        vars_={},
        advice_evals=advice,
        fixed_evals=fixed,
        instance_evals=[],
        perm_common_evals=[],
        perm_z_evals=[],
        lookup_evals=[],
    )
    from plutus_halo2_tpu.models.plan import eval_expr

    expected = [hex(eval_expr(g, env)) for g in plan.gates]
    return {
        "circuit": name,
        "advice_evals": [hex(v) for v in advice],
        "fixed_evals": [hex(v) for v in fixed],
        "gate_values": expected,
    }


def build_plans(include_atms: bool):
    from plutus_halo2_tpu.models.circuits import (
        LookupRangeCircuit,
        MulChainCircuit,
        SimpleMulCircuit,
    )
    from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

    srs = TrapdoorSRS.from_seed(b"equations-test")
    out = []
    for name, circuit in [
        ("simple_mul", SimpleMulCircuit()),
        ("lookup_table", LookupRangeCircuit()),
        ("mul_chain", MulChainCircuit(length=16)),
    ]:
        _, plan = keygen(circuit, flavor=FLAVOR_HALO2, srs=srs)
        out.append((name, plan))
    if include_atms:
        from plutus_halo2_tpu.models.atms import AtmsCircuit

        _, plan = keygen(AtmsCircuit(), flavor=FLAVOR_HALO2, srs=srs)
        out.append(("atms", plan))
    return out


def main():
    vectors = [gate_vectors(name, plan) for name, plan in build_plans("--atms" in sys.argv[1:])]
    out_path = os.path.join(os.path.dirname(__file__), "artifacts", "gates_test_vectors.json")
    with open(out_path, "w") as f:
        json.dump(vectors, f, indent=1)
    for v in vectors:
        print(f"{v['circuit']}: {len(v['gate_values'])} gate equations")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
