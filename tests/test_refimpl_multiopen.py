"""Multiopen + Lagrange golden tests vs the reference's committed vectors
(Halo2MultiOpenMSM.hs:24-52, ProofData.hs:33-215, lagrange.ak:133-187,
omega_rotations.ak:48-81)."""

from plutus_halo2_tpu.refimpl import lagrange as lg
from plutus_halo2_tpu.refimpl import multiopen as mo
from plutus_halo2_tpu.utils import fixtures as fx


def _case_commitment_map():
    c = fx.MULTIOPEN_CASE
    x_cur, x_next, x_last = c["x_current"], c["x_next"], c["x_last"]
    a1 = fx.SIMPLE_MUL_A1_UNCOMPRESSED
    a2 = fx.SIMPLE_MUL_A2_UNCOMPRESSED
    f1, f2 = fx.SIMPLE_MUL_FIXED_COMMITMENTS
    p1, p2, p3 = fx.SIMPLE_MUL_PERMUTATION_COMMITMENTS
    # ProofData.hs:186-200 commitmentMap (permutation z commitments come from
    # the proof; transcribed there as uncompressed — recover from proof walk)
    from plutus_halo2_tpu.refimpl.transcript import Transcript

    proof = bytes.fromhex(fx.SIMPLE_MUL_PROOF_HEX)
    t = Transcript(proof, fx.SIMPLE_MUL_TRANSCRIPT_REPR)
    t.common_scalar(3)
    for pi in fx.SIMPLE_MUL_PUBLIC_INPUTS:
        t.common_scalar(pi)
    t.read_point(), t.read_point()
    t.squeeze_challenge(), t.squeeze_challenge(), t.squeeze_challenge()
    pc_a = t.read_point()
    pc_b = t.read_point()
    pc_c = t.read_point()

    pa, pb, pcv = c["perm_evals"]["a"], c["perm_evals"]["b"], c["perm_evals"]["c"]
    ae = c["advice_evals"]
    fe = c["fixed_evals"]
    pce = c["perm_common_evals"]
    cur_next = [x_cur, x_next]
    cur = [x_cur]
    cur_next_last = [x_cur, x_next, x_last]
    return [
        (a1, 0, cur_next, [ae[0], ae[2]]),
        (a2, 1, cur, [ae[1]]),
        (pc_a, 2, cur_next_last, pa),
        (pc_b, 2, cur_next_last, pb),
        (pc_c, 0, cur_next, pcv),
        (f1, 1, cur, [fe[0]]),
        (f2, 1, cur, [fe[1]]),
        (p1, 1, cur, [pce[0]]),
        (p2, 1, cur, [pce[1]]),
        (p3, 1, cur, [pce[2]]),
        (c["vanishing_g"], 1, cur, [c["vanishing_s"]]),
        (c["vanishing_rand"], 1, cur, [c["random_eval"]]),
    ]


def test_q_eval_sets_f_eval_and_v():
    c = fx.MULTIOPEN_CASE
    point_sets = [
        [c["x_current"], c["x_next"]],
        [c["x_current"]],
        [c["x_current"], c["x_next"], c["x_last"]],
    ]
    cmap = _case_commitment_map()
    x1_powers = lg.powers(8, c["x1"])
    x4_powers = lg.powers(4, c["x4"])

    _q_coms, q_eval_sets = mo.build_q(cmap, len(point_sets), x1_powers)
    assert q_eval_sets == c["expected_q_eval_sets"]

    f_eval = mo.evaluate_lagrange_polynomials(point_sets, q_eval_sets, c["x2"], c["x3"], c["q_evals"])
    assert f_eval == c["expected_f_eval"]

    v = mo.compute_v(f_eval, x4_powers, c["q_evals"])
    assert v == c["expected_v"]


def test_omega_rotations_atms():
    got = lg.rotated_omegas(fx.ATMS_OMEGA, fx.ATMS_OMEGA_INV, -6, 0)
    assert got == fx.ATMS_ROTATIONS_M6_TO_0


def test_lagrange_basis_atms():
    c = fx.ATMS_LAGRANGE_CASE
    got = lg.lagrange_polynomial_basis(c["x"], c["xn"], c["barycentric_weight"], c["rotations"])
    assert got == c["expected_basis"]


def test_gwc_toy_case_independent_vector():
    """GWC19 finalMSM/finalEval cross-check against an INDEPENDENTLY derived
    toy case (GwcMultiOpenMSM.hs:96-135): the expectation below is computed
    with plain integer arithmetic written straight from the Haskell formula —
    no group_queries_by_rotation / build_msm_gwc involved — and the resulting
    points are additionally pinned as compressed-byte literals, shrinking the
    prover<->verifier self-consistency surface on the GWC accumulation
    ordering. Queries: q0@cur, q1@next, q2@cur (tests first-occurrence
    grouping with an interleaved rotation)."""
    from plutus_halo2_tpu.refimpl.curve import G1_GEN, g1_compress, g1_mul
    from plutus_halo2_tpu.refimpl.field import Q
    from plutus_halo2_tpu.refimpl.multiopen import build_msm_gwc, eval_msm

    a = [5, 7, 11]   # commitment dlogs
    e = [13, 17, 19]  # claimed evals
    b = [3, 23]      # witness dlogs per rotation group (cur, next)
    z = [29, 31]     # rotated evaluation points per group
    v, u = 37, 41

    # independent expectation, straight from the spec formula:
    #   left  = sum_i u^i w_i
    #   right = sum_i u^i z_i w_i + sum_i u^i sum_j v^j c_ij
    #           - (sum_i u^i sum_j v^j e_ij) G1
    inner_com = [(a[0] + v * a[2]) % Q, a[1] % Q]
    inner_ev = [(e[0] + v * e[2]) % Q, e[1] % Q]
    left_dlog = (b[0] + u * b[1]) % Q
    right_dlog = (
        (z[0] * b[0] + u * z[1] * b[1])
        + (inner_com[0] + u * inner_com[1])
        - (inner_ev[0] + u * inner_ev[1])
    ) % Q
    assert left_dlog == 946 and right_dlog == 28606

    queries = [
        ("cur", g1_mul(G1_GEN, a[0]), e[0]),
        ("next", g1_mul(G1_GEN, a[1]), e[1]),
        ("cur", g1_mul(G1_GEN, a[2]), e[2]),
    ]
    witnesses = [g1_mul(G1_GEN, b[0]), g1_mul(G1_GEN, b[1])]
    left_msm, right_msm = build_msm_gwc(v, u, queries, witnesses, z)
    left_pt, right_pt = eval_msm(left_msm), eval_msm(right_msm)
    assert left_pt == g1_mul(G1_GEN, left_dlog)
    assert right_pt == g1_mul(G1_GEN, right_dlog)
    # pinned vectors (computed once from the dlogs above)
    assert g1_compress(left_pt).hex() == (
        "ac8db093785990afcbe7a4639f80d7974f493b1358dc63b6a6a71978b5d31dc4"
        "f097ca3cbdc3009d56d74b06a4ec39d0"
    )
    assert g1_compress(right_pt).hex() == (
        "a59c2a121999a1a0fac2a391c5dab2f7dcbb09f6b3b9fabd819e61437e70125b"
        "2dfe3e16c2a67c4e055252e41d7e6c5e"
    )
