"""End-to-end replay of the reference's committed simple_mul proof through
the framework's OWN derivation path (not fixture-fed structure).

Cross-validation layers (all against data committed in /root/reference):
  1. the CircuitPlan's derived multiopen structure (point sets + commitment
     map ordering) equals ProofData.hs:176-198 exactly;
  2. every scalar-eval proof offset in our static layout parses the committed
     proof bytes to the reference's hand-transcribed values
     (ProofData.hs:54-148) — binding the whole layout, not just advice evals;
  3. q_eval_sets / f_eval / v derived through our multiopen code from the
     PLAN-derived structure + the PROOF-parsed evals reproduce
     Halo2MultiOpenMSM.hs:24-43's expected values.

Provenance note (why vanishing_s is not re-derived through the gate fold
here): ProofData.hs commits vanishing_s for its challenge point
x_current = 0x65e2... but commits NO beta/gamma/y/theta anywhere in the
reference tree, and its challenge set differs from the committed proof's
Cardano-friendly transcript walk (transcript.ak:246-349 yields
x = 0x12ed... for the same proof bytes) — the reference's own unit test
feeds vanishing_s as an input for the same reason (Halo2MultiOpenMSM.hs
uses the commitmentMap literal). The gate/permutation fold is instead
covered by the full accept/reject e2e tests (test_refimpl_e2e,
test_jax_verifier) and the gate-equation vector replay
(test_gate_equations)."""

import numpy as np

from plutus_halo2_tpu.models.circuits import SimpleMulCircuit
from plutus_halo2_tpu.models.layout import build_layout
from plutus_halo2_tpu.models.plan import FLAVOR_HALO2
from plutus_halo2_tpu.refimpl import lagrange as lg
from plutus_halo2_tpu.refimpl import multiopen as mo
from plutus_halo2_tpu.refimpl.keygen import keygen
from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS
from plutus_halo2_tpu.utils import fixtures as fx


def _plan():
    pk, plan = keygen(
        SimpleMulCircuit(), flavor=FLAVOR_HALO2, srs=TrapdoorSRS.from_seed(b"replay")
    )
    return plan


def _parse_scalar(proof: bytes, off: int) -> int:
    return int.from_bytes(proof[off : off + 32], "little")


def test_plan_structure_matches_proofdata():
    """Plan-derived point sets + commitment map == ProofData.hs:176-198."""
    plan = _plan()
    # pointSets = [[cur, next], [cur], [cur, next, last]]
    assert plan.point_sets == [
        ["cur", "next"],
        ["cur"],
        ["cur", "next", "last"],
    ]
    # commitmentMap rows: (commitment ref, set idx, eval refs) in order
    expected = [
        (("advice_com", 0), 0, [("advice_eval", 0), ("advice_eval", 2)]),
        (("advice_com", 1), 1, [("advice_eval", 1)]),
        (("perm_z_com", 0), 2, [("perm_z", 0, "cur"), ("perm_z", 0, "next"), ("perm_z", 0, "last")]),
        (("perm_z_com", 1), 2, [("perm_z", 1, "cur"), ("perm_z", 1, "next"), ("perm_z", 1, "last")]),
        (("perm_z_com", 2), 0, [("perm_z", 2, "cur"), ("perm_z", 2, "next")]),
        # fixed query 0 reads our fixed column 1 and vice versa — column
        # numbering is a circuit-construction artifact; the committed proof
        # layout (test below) pins the actual eval order
        (("fixed_com", 1), 1, [("fixed_eval", 0)]),
        (("fixed_com", 0), 1, [("fixed_eval", 1)]),
        (("perm_common_com", 0), 1, [("perm_common", 0)]),
        (("perm_common_com", 1), 1, [("perm_common", 1)]),
        (("perm_common_com", 2), 1, [("perm_common", 2)]),
        (("vanishing_g",), 1, [("vanishing_s",)]),
        (("vanishing_rand",), 1, [("random_eval",)]),
    ]
    got = [(cd[0], cd[1], list(cd[3])) for cd in plan.commitment_data]
    assert got == expected


def test_layout_parses_committed_proof_evals():
    """Every scalar offset in the static layout reads the committed proof to
    the reference's transcribed value (ProofData.hs:54-148)."""
    plan = _plan()
    lay = build_layout(plan)
    proof = bytes.fromhex(fx.SIMPLE_MUL_PROOF_HEX)
    c = fx.MULTIOPEN_CASE

    def chk(name, expected):
        got = _parse_scalar(proof, lay.scalar_offsets[name])
        assert got == expected, f"{name}: {got:#x} != {expected:#x}"

    for i, v in enumerate(c["advice_evals"]):
        chk(f"advice_eval_{i}", v)
    for i, v in enumerate(c["fixed_evals"]):
        chk(f"fixed_eval_{i}", v)
    for i, v in enumerate(c["perm_common_evals"]):
        chk(f"perm_common_{i}", v)
    for s, key in enumerate(["a", "b", "c"]):
        whichs = ["cur", "next", "last"] if s != 2 else ["cur", "next"]
        for w, v in zip(whichs, c["perm_evals"][key]):
            chk(f"perm_z_{s}_{w}", v)
    chk("random_eval", c["random_eval"])
    for i, v in enumerate(c["q_evals"]):
        chk(f"q_eval_{i}", v)


def test_multiopen_replay_from_plan_structure():
    """f_eval / v / q_eval_sets via OUR plan-derived structure + proof-parsed
    evals reproduce Halo2MultiOpenMSM.hs:24-43 — the structure is not taken
    from the fixture, only the challenges and the commitment points are."""
    plan = _plan()
    lay = build_layout(plan)
    proof = bytes.fromhex(fx.SIMPLE_MUL_PROOF_HEX)
    c = fx.MULTIOPEN_CASE

    # evals parsed from the committed proof bytes via our layout
    def eval_of(ref):
        tag = ref[0]
        if tag == "advice_eval":
            return _parse_scalar(proof, lay.scalar_offsets[f"advice_eval_{ref[1]}"])
        if tag == "fixed_eval":
            return _parse_scalar(proof, lay.scalar_offsets[f"fixed_eval_{ref[1]}"])
        if tag == "perm_common":
            return _parse_scalar(proof, lay.scalar_offsets[f"perm_common_{ref[1]}"])
        if tag == "perm_z":
            return _parse_scalar(proof, lay.scalar_offsets[f"perm_z_{ref[1]}_{ref[2]}"])
        if tag == "random_eval":
            return _parse_scalar(proof, lay.scalar_offsets["random_eval"])
        if tag == "vanishing_s":
            return c["vanishing_s"]  # gate fold: see module docstring
        raise AssertionError(ref)

    # commitment points: only needed as placeholders for build_q's MSM side —
    # the eval side is what the expected vectors pin down
    rot_x = {"cur": c["x_current"], "next": c["x_next"], "last": c["x_last"]}
    point_sets = [[rot_x[r] for r in rots] for rots in plan.point_sets]
    dummy_pt = fx.SIMPLE_MUL_A1_UNCOMPRESSED
    cmap = [
        (dummy_pt, cd[1], [rot_x[r] for r in cd[2]], [eval_of(e) for e in cd[3]])
        for cd in plan.commitment_data
    ]

    x1_powers = lg.powers(plan.x1_powers_count, c["x1"])
    x4_powers = lg.powers(plan.x4_powers_count, c["x4"])
    _q_coms, q_eval_sets = mo.build_q(cmap, len(point_sets), x1_powers)
    assert q_eval_sets == c["expected_q_eval_sets"]

    f_eval = mo.evaluate_lagrange_polynomials(
        point_sets, q_eval_sets, c["x2"], c["x3"], c["q_evals"]
    )
    assert f_eval == c["expected_f_eval"]
    v = mo.compute_v(f_eval, x4_powers, c["q_evals"])
    assert v == c["expected_v"]
