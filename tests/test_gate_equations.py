"""Gate-equation expected-value tests — the analog of the reference's
generated `lib/gates_test.ak` (templates/gates_test.hbs:7-79, driven by
examples/equations_test.rs): each gate polynomial is evaluated at known leaf
values and checked against an expected scalar.

Here the spec (pure bigint) environment produces the expected values and the
TPU (JAX Montgomery-limb) environment must reproduce them bit-exactly."""

import json
import os

import numpy as np


def _plans():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from equations_test import build_plans, det_scalar, gate_vectors

    return build_plans(include_atms=False), det_scalar, gate_vectors


def test_gate_equations_jax_bit_exact():
    import jax.numpy as jnp

    from plutus_halo2_tpu.models.plan import eval_expr
    from plutus_halo2_tpu.models.verifier_jax import _FrEnv
    from plutus_halo2_tpu.ops.limb import FR_SPEC

    plans, det_scalar, gate_vectors = _plans()
    for name, plan in plans:
        expected = gate_vectors(name, plan)
        advice = [
            jnp.asarray(FR_SPEC.to_mont(int(h, 16))) for h in expected["advice_evals"]
        ]
        fixed = [
            jnp.asarray(FR_SPEC.to_mont(int(h, 16))) for h in expected["fixed_evals"]
        ]
        env = _FrEnv(
            vars_={},
            advice_evals=advice,
            fixed_evals=fixed,
            perm_common_evals=[],
            perm_z_evals=[],
            lookup_evals=[],
        )
        for gi, gate in enumerate(plan.gates):
            got = FR_SPEC.from_mont_int(np.asarray(eval_expr(gate, env)))
            want = int(expected["gate_values"][gi], 16)
            assert got == want, f"{name} gate {gi}: {got:#x} != {want:#x}"


def test_gate_vectors_artifact_fresh():
    """If the committed artifact exists, it must match regeneration (the
    analog of CI regenerating gates_test.ak and running aiken check)."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "artifacts", "gates_test_vectors.json"
    )
    if not os.path.exists(path):
        return
    with open(path) as f:
        committed = json.load(f)
    plans, _, gate_vectors = _plans()
    regenerated = [gate_vectors(name, plan) for name, plan in plans]
    by_name = {v["circuit"]: v for v in committed}
    for v in regenerated:
        assert by_name.get(v["circuit"]) == v, f"stale vectors for {v['circuit']}"
