"""Plan-specialized batched Halo2 verifier for TPU (JAX).

The TPU-native replacement for the reference's *generated* on-chain verifiers
(plinth-verifier/templates/verification_halo2_kzg.hbs / _gwc19_kzg.hbs): where
the reference emits Plinth/Aiken source per circuit, we specialize one jitted
function per CircuitPlan at trace time. Everything static (proof layout,
query structure, point sets, expression list, pairing ladders) is baked in;
the batch axis runs over proofs.

Pipeline per batch element:
  proof bytes -> transcript buffer (scatter) -> all Fiat-Shamir challenges
  (parallel blake2b over static prefixes) -> scalar work over Fr (Lagrange
  basis, gate/permutation/lookup fold, quotient eval) -> multi-open MSM
  (either flavor) -> combined pairing check with host-prepared G2 ladders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as jc
from ..ops import pairing as jpair
from ..ops.blake2b import blake2b_256, blake2b_256_prefixes
from ..ops.limb import FP_SPEC, FR_SPEC, fp, fr
from ..refimpl.field import Q
from .layout import build_layout
from .plan import CircuitPlan, FLAVOR_GWC, FLAVOR_HALO2, eval_expr, rot_offset

_R256 = pow(2, 256, Q)


def _pow_const(base: int, k: int) -> int:
    return pow(base, k, Q)


class _FrEnv:
    """Scalar-expression environment over Montgomery Fr limb arrays."""

    def __init__(self, vars_, advice_evals, fixed_evals, perm_common_evals,
                 perm_z_evals, lookup_evals):
        self.vars = vars_
        self.advice_evals = advice_evals
        self.fixed_evals = fixed_evals
        self.perm_common_evals = perm_common_evals
        self.perm_z_evals = perm_z_evals
        self.lookup_evals = lookup_evals

    def add(self, a, b):
        return fr.add(a, b)

    def mul(self, a, b):
        return fr.mul(a, b)

    def neg(self, a):
        return fr.neg(a)

    def pow(self, a, k):
        # static small exponents in gate expressions: repeated squaring
        if k == 0:
            return fr.one(a.shape[:-1])
        result = None
        base = a
        kk = k
        while kk:
            if kk & 1:
                result = base if result is None else fr.mul(result, base)
            kk >>= 1
            if kk:
                base = fr.sqr(base)
        return result

    def const(self, v):
        return jnp.asarray(FR_SPEC.to_mont(v))

    def var(self, name):
        return self.vars[name]

    def advice(self, qi):
        return self.advice_evals[qi]

    def fixed(self, qi):
        return self.fixed_evals[qi]

    def instance(self, qi):
        raise NotImplementedError("instance queries in gates are not supported")

    def instance_col(self, col):
        return self.vars["instance_eval"]

    def perm_common(self, i):
        return self.perm_common_evals[i]

    def perm_z(self, s, which):
        return self.perm_z_evals[s][which]

    def lookup(self, i, which):
        return self.lookup_evals[i][which]

    def identity(self):
        return self.vars["x"]

    def l0(self):
        return self.vars["evaluation_at_0"]

    def l_last(self):
        return self.vars["last_evaluation"]

    def l_active(self):
        return self.vars["active_rows"]


def _precompute_delta_pows(expr, out):
    """Host-side: fold ('pow', ('var','delta'), k) into constants."""
    if not isinstance(expr, tuple):
        return expr
    if expr[0] == "pow" and expr[1] == ("var", "delta"):
        from ..refimpl.field import FR_DELTA

        return ("const", pow(FR_DELTA, expr[2], Q))
    return tuple(
        _precompute_delta_pows(e, out) if isinstance(e, tuple) else e for e in expr
    )


class JaxVerifier:
    """verify(proof_bytes (B, PLEN) uint8, public_inputs (B, n_pi, L) canonical
    Fr limbs) -> (B,) bool. Build once per plan; jit once per batch shape.

    Hot stages (MSM, pairing, fixed-exponent ladders) run as Pallas kernels
    when targeting TPU with a lane-aligned batch (B % 128 == 0); otherwise the
    pure-XLA graph path is used. Both paths are bit-exact."""

    def __init__(self, plan: CircuitPlan, use_pallas: bool | None = None,
                 subgroup_check: bool | str = "aggregate",
                 subgroup_rounds: int = jc.DEFAULT_SUBGROUP_ROUNDS):
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        # Strict decompression semantics: the reference rejects proof points
        # outside the q-order subgroup inside bls12_381_G1_uncompress
        # (CIP-0381, bls_utils.ak:36-45). Modes:
        #   "aggregate" (DEFAULT) — per-row random-weighted aggregate
        #       membership test (ops/curve.aggregate_subgroup_check; Pallas
        #       kernel on TPU). Exact for honest rows; adversarial
        #       non-subgroup encodings evade with prob <= 3^-subgroup_rounds
        #       per submission (default ops/curve.DEFAULT_SUBGROUP_ROUNDS = 1
        #       round: <= 1/3; raise subgroup_rounds for tighter byte-level
        #       parity at ~7 ms/round per 1024-batch). The proof verdict
        #       itself is unaffected either way — the verification equation
        #       is cofactor-insensitive.
        #   "exact" / True — deterministic per-point endomorphism check
        #       (~9x verify cost; full byte-level parity).
        #   "off" / False — trust encodings to be subgroup members.
        if subgroup_check is True:
            subgroup_check = "exact"
        if subgroup_check is False:
            subgroup_check = "off"
        assert subgroup_check in ("aggregate", "exact", "off")
        self.subgroup_check = subgroup_check
        self.subgroup_rounds = subgroup_rounds
        self._pallas_cache = {}
        self.plan = plan
        self.layout = build_layout(plan)
        vk = plan.vk
        self.n_pi = vk.num_public_inputs

        # host constants
        self.fixed_coms = np.stack(
            [jc.host_point_to_mont(p) for p in vk.fixed_commitments]
        ) if vk.fixed_commitments else np.zeros((0, 3, FP_SPEC.L), np.uint32)
        self.perm_coms = np.stack(
            [jc.host_point_to_mont(p) for p in vk.permutation_commitments]
        ) if vk.permutation_commitments else np.zeros((0, 3, FP_SPEC.L), np.uint32)
        self.prep_sg2 = jpair.prepare_g2(vk.s_g2)
        from ..refimpl.curve import G2_GEN

        self.prep_g2 = jpair.prepare_g2(G2_GEN)

        # rotation multiplier constants omega^off for every rotation used
        self.rot_mult = {}
        for r in ["cur", "next", "prev", "last"]:
            off = rot_offset(r, vk.blinding_factors)
            base = vk.omega if off >= 0 else vk.omega_inv
            self.rot_mult[off] = FR_SPEC.to_mont(pow(base, abs(off), Q))

        # vanishing-region rotations: -(bf+1) .. 0 (hbs:142-151)
        bf = vk.blinding_factors
        self.van_rotations = np.stack(
            [FR_SPEC.to_mont(pow(vk.omega_inv, k, Q)) for k in range(bf + 1, 0, -1)]
            + [FR_SPEC.to_mont(1)]
        )
        # instance rotations: omega^0 .. omega^(n_pi-1)
        self.inst_rotations = np.stack(
            [FR_SPEC.to_mont(pow(vk.omega, i, Q)) for i in range(max(self.n_pi, 1))]
        )
        self.bary_mont = FR_SPEC.to_mont(vk.barycentric_weight)
        self.r256_mont = FR_SPEC.to_mont(_R256)
        self.one_fr = FR_SPEC.to_mont(1)

        self.exprs = [
            _precompute_delta_pows(e, None) for e in plan.vanishing_expressions()
        ]

        self._jitted = {}
        # static MSM sizes (after dedup), recorded at trace time per MSM
        self.msm_term_counts: list[int] = []
        # when set (by parallel.mesh.verify_2d), _msm point-shards over this
        # mesh axis and reduces via all_gather + point-add tree
        self.msm_axis_name: str | None = None

    # -- pallas kernel plumbing ----------------------------------------------
    def _pallas_ok(self, B: int) -> bool:
        from ..ops.pallas_curve import LANES

        return self.use_pallas and B % LANES == 0

    def _pallas_msm(self, K: int):
        key = ("msm", K)
        if key not in self._pallas_cache:
            from ..ops.pallas_curve import make_msm_kernel

            self._pallas_cache[key] = make_msm_kernel(K)
        return self._pallas_cache[key]

    def _pallas_pow(self, spec_name: str, exponent: int, width: int):
        key = ("pow", spec_name, exponent, width)
        if key not in self._pallas_cache:
            from ..ops.pallas_core import FP24_SPEC, fp24_from_fp25, fp25_from_fp24
            from ..ops.pallas_field import make_pow_kernel

            if spec_name == "fr":
                self._pallas_cache[key] = make_pow_kernel(FR_SPEC, exponent, width)
            else:
                # kernel-side Fp is 24-limb R24 Montgomery; convert at the
                # boundary so callers keep the XLA-level 25-limb R25 layout
                pow24 = make_pow_kernel(FP24_SPEC, exponent, width)
                self._pallas_cache[key] = lambda x: fp25_from_fp24(
                    pow24(fp24_from_fp25(x))
                )
        return self._pallas_cache[key]

    def _pallas_pairing(self):
        key = ("pairing",)
        if key not in self._pallas_cache:
            from ..ops.pallas_pairing import make_pairing_check

            self._pallas_cache[key] = make_pairing_check(self.prep_sg2, self.prep_g2)
        return self._pallas_cache[key]

    def _pallas_transcript(self):
        key = ("transcript",)
        if key not in self._pallas_cache:
            from ..ops.pallas_blake import make_transcript_kernel

            self._pallas_cache[key] = make_transcript_kernel(
                [mlen for _name, mlen in self.layout.squeezes]
            )
        return self._pallas_cache[key]

    def _pallas_decompress(self, K: int, subgroup_rounds: int | None = None):
        key = ("decompress", K, subgroup_rounds)
        if key not in self._pallas_cache:
            from ..ops.pallas_curve import make_decompress_kernel

            self._pallas_cache[key] = make_decompress_kernel(
                K, subgroup_rounds=subgroup_rounds
            )
        return self._pallas_cache[key]

    def _pallas_subgroup(self, K: int):
        key = ("subgroup", K, self.subgroup_rounds)
        if key not in self._pallas_cache:
            from ..ops.pallas_curve import make_subgroup_kernel

            self._pallas_cache[key] = make_subgroup_kernel(
                K, rounds=self.subgroup_rounds
            )
        return self._pallas_cache[key]

    def subgroup_weights(self, rng=None) -> np.ndarray | None:
        """Fresh per-batch aggregation weights for the default "aggregate"
        subgroup mode ((rounds, n_points) uint32), or None in other modes."""
        if self.subgroup_check != "aggregate":
            return None
        return jc.subgroup_weights(
            len(self.layout.point_offsets), self.subgroup_rounds, rng
        )

    def _msm(self, B: int, pts_arr, coeff_arr):
        def base(p, s):
            if self._pallas_ok(B):
                return self._pallas_msm(p.shape[-3])(p, s)
            return jc.msm(p, s)

        if self.msm_axis_name is not None:
            # inside a shard_map context: split the point axis over the mesh
            # axis, reduce partials with all_gather + point-add tree
            from ..parallel.mesh import shard_map_msm

            return shard_map_msm(pts_arr, coeff_arr, self.msm_axis_name, base_msm=base)
        return base(pts_arr, coeff_arr)

    # ------------------------------------------------------------------
    def encode_public_inputs(self, pis) -> np.ndarray:
        """Host: (B, n_pi) ints -> (B, n_pi, L) canonical Fr limbs."""
        return np.stack(
            [np.stack([FR_SPEC.encode(v % Q) for v in row]) for row in pis]
        ) if len(pis) else np.zeros((0, self.n_pi, FR_SPEC.L), np.uint32)

    # -- staged-program plumbing --------------------------------------------
    # Compiled-program SIZE is the dominant cold/warm-start cost in this
    # environment (STAGES.md size ledger: the Mosaic pairing payload alone is
    # ~26 MB and the executable loads at ~240 KB/s through the device tunnel).
    # verify()/verify_rlc() therefore run as a short PIPELINE of separately
    # jitted programs instead of one monolith, so the expensive payloads are
    # each compiled ONCE and shared across every call site:
    #   core     proof bytes -> (el, er, all_valid)        [shared exact/RLC]
    #   pair     fixed-width (PAIR_TILE) pairing check     [shared by exact
    #            chunks, RLC group check, RLC re-check, host re-check]
    #   agg/post/final  small RLC-only glue programs
    # All dispatches are async; only the caller's fetch syncs, so the extra
    # program boundaries pipeline away in steady state.

    def _prog(self, name, fn, **static):
        key = (name, tuple(sorted(static.items())))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(partial(fn, **static) if static else fn)
        return self._jitted[key]

    def _pair_width(self, n: int) -> int:
        """Width of the shared pairing program covering an n-row stage: the
        Pallas lane tile on TPU (every lane-aligned call site chunks to it,
        so ONE compiled program serves them all), n itself on the XLA path
        (which also covers non-lane-aligned batches on TPU, as before)."""
        from ..ops.pallas_curve import LANES

        return LANES if (self.use_pallas and n % LANES == 0) else n

    def _pair_cond_impl(self, el, er, enable):
        """The shared pairing program body: ONE compiled program serves every
        call site (exact chunks, RLC group check, RLC re-check, host
        re-check). `enable` is a traced device scalar — jax.lax.cond executes
        only the taken branch at runtime, so the RLC re-check tile costs
        nothing on clean batches (enable = any-suspects) with NO host sync
        and no duplicated Mosaic payload. Padding/disabled slots report True
        (identity pairs are trivially true anyway)."""
        W = el.shape[0]
        return jax.lax.cond(
            enable,
            lambda a, b: self._pairing_check(a, b),
            lambda a, b: jnp.ones((W,), bool),
            el, er,
        )

    def _pair_staged(self, el, er, enable=None):
        """el/er (B, 3, L) -> list of per-chunk (W,) bool device arrays from
        the shared fixed-width pairing program. B must be a multiple of the
        pair width on the Pallas path (callers guarantee lane alignment).
        enable: optional device bool scalar gating the whole stage (see
        _pair_cond_impl); defaults to on."""
        B = el.shape[0]
        W = self._pair_width(B)
        if enable is None:
            if not hasattr(self, "_enable_true"):
                self._enable_true = jnp.asarray(True)  # one device scalar
            enable = self._enable_true
        prog = self._prog("pair", self._pair_cond_impl)
        if W == B:
            return [prog(el, er, enable)]
        assert B % W == 0, f"batch {B} not a multiple of pair width {W}"
        return [
            prog(el[s : s + W], er[s : s + W], enable)
            for s in range(0, B, W)
        ]

    @staticmethod
    def _combine_impl(valid, *oks):
        return jnp.concatenate(oks, axis=0) & valid

    def verify(self, proof_bytes, public_inputs, y_hints=None, sub_rng=None):
        """y_hints: optional (B, n_points, L) canonical Fp limbs — UNTRUSTED
        candidate y-coordinates for every compressed proof point (see
        compute_y_hints). When supplied, decompression checks y^2 == x^3 + 4
        plus the sign bit (2 Fp muls per point) instead of running the
        379-step (p+1)/4 sqrt ladder the reference performs on-chain
        (CompressUncompress.hs:81-97). A wrong hint can only flip the verdict
        to reject, never to accept, so hints need no trust.

        sub_rng: randomness source for the default aggregate subgroup check's
        fresh per-batch weights (np.random.default_rng() when omitted)."""
        el, er, all_valid = self._core_staged(
            proof_bytes, public_inputs, y_hints, sub_rng
        )
        oks = self._pair_staged(el, er)
        return self._prog("combine", self._combine_impl)(all_valid, *oks)

    def _core_staged(self, proof_bytes, public_inputs, y_hints, sub_rng):
        sw = self.subgroup_weights(sub_rng)
        args = [proof_bytes, public_inputs]
        kwargs = {}
        if y_hints is not None:
            kwargs["y_hints"] = y_hints
        if sw is not None:
            kwargs["sub_weights"] = sw
        return self._prog("core", self._core_impl)(*args, **kwargs)

    # -- RLC batched pairing ------------------------------------------------
    def verify_rlc(self, proof_bytes, public_inputs, y_hints=None,
                   group: int = 8, rng=None):
        """Batch verification with ONE pairing check per `group` proofs.

        Each group's pairing sides are aggregated with fresh random 128-bit
        weights: e(sum_b w_b el_b, sG2) * e(sum_b w_b er_b, G2) == 1 holds for
        honest rows and fails except with probability <= group/2^128 when any
        row's individual equation fails (standard random-linear-combination
        batching; the per-row scalar/transcript work and decompression
        validity stay exact per proof). Rows of a failing group are re-checked
        individually — exact verdicts, a bad row never taints its group-mates.
        The pairing is ~45% of the per-proof verify budget, so serving users
        that accept batch semantics amortize it by ~group.

        Returns (B,) bool verdicts (numpy). Requires B % group == 0."""
        B = proof_bytes.shape[0]
        assert B % group == 0, f"batch {B} not a multiple of group {group}"
        if rng is None:
            rng = np.random.default_rng()
        weights = self.rlc_weights(B, rng)
        out = self.verify_rlc_device(
            proof_bytes, public_inputs, weights, y_hints, group=group,
            sub_rng=rng,
        )
        return self.rlc_finalize(*out)

    def rlc_weights(self, B: int, rng=None) -> np.ndarray:
        """Fresh nonzero 128-bit RLC weights as (B, L) canonical Fr limbs."""
        if rng is None:
            rng = np.random.default_rng()
        w_ints = [int.from_bytes(rng.bytes(16), "little") | 1 for _ in range(B)]
        return np.stack([FR_SPEC.encode(w) for w in w_ints])

    def verify_rlc_device(self, proof_bytes, public_inputs, weights,
                          y_hints=None, *, group: int = 8, sub_rng=None):
        """The device-side leg of verify_rlc: returns
        (verdicts, n_suspects, group_ok, all_valid, el, er, R) where R is the
        in-flight exact re-check width this call used. `verdicts` is already
        exact whenever n_suspects <= R; rlc_finalize handles the overflow.
        Runs as a pipeline of shared programs (see _pair_staged): the
        Mosaic pairing payload is compiled ONCE and reused for both the
        group-aggregate check and the suspect re-check, and the core program
        is the same one exact verify() uses. All dispatches are async, so
        serving / bench loops pipeline batches without a host sync."""
        B = proof_bytes.shape[0]
        el, er, all_valid = self._core_staged(
            proof_bytes, public_inputs, y_hints, sub_rng
        )

        # group aggregation (pads the group axis up to a lane multiple so the
        # shared Pallas pairing program serves any group size — e.g. at
        # batch 1024 group=16 gives G=64 aggregates, padded to one 128 tile)
        from ..ops.pallas_curve import LANES

        pallas = self._pallas_ok(B)
        G = B // group
        Wp = -(-G // LANES) * LANES if pallas else G
        el_g, er_g = self._prog("agg", self._agg_impl, group=group, W=Wp)(
            el, er, all_valid, weights
        )
        group_ok_p = jnp.concatenate(self._pair_staged(el_g, er_g), axis=0)

        # suspect gather + bounded exact re-check through the SAME pairing
        # program (padding slots carry the identity pair — trivially true);
        # the re-check tile is lax.cond-gated on any-suspects, so honest
        # batches skip its pairing entirely (device-side branch, no sync)
        R = min(self._RLC_RECHECK, B)
        R = -(-R // LANES) * LANES if pallas else R  # pad to the pair width
        verdicts0, n_sus, group_ok, idx_w, el_s, er_s = self._prog(
            "rlc_post", self._post_impl, group=group, R=R
        )(group_ok_p, all_valid, el, er)
        row_ok = jnp.concatenate(
            self._pair_staged(el_s, er_s, enable=n_sus > 0), axis=0
        )
        verdicts = self._prog("rlc_final", self._final_impl)(
            verdicts0, idx_w, row_ok
        )
        return verdicts, n_sus, group_ok, all_valid, el, er, R

    def rlc_finalize(self, verdicts, n_sus, group_ok, all_valid, el, er,
                     R: int) -> np.ndarray:
        """Host tail of verify_rlc: exact verdicts out. Only when more than
        R rows (the re-check width verify_rlc_device reported for this batch)
        sat in failing groups (mass-corruption / adversarial flood) does this
        fall back to host-chunked exact re-checks."""
        verdicts = np.asarray(verdicts)
        # shape read only — no device fetch of group_ok on the fast path
        group = verdicts.shape[0] // group_ok.shape[0]
        if int(n_sus) > R:
            group_ok = np.asarray(group_ok)
            all_valid = np.asarray(all_valid)
            verdicts = np.repeat(group_ok, group) & all_valid
            suspects = np.nonzero(np.repeat(~group_ok, group) & all_valid)[0]
            verdicts[suspects] = self._recheck_rows(el, er, suspects)
        return verdicts

    _RLC_RECHECK = 128  # rows exactly re-checked in-flight per RLC batch

    def _agg_impl(self, el, er, all_valid, weights, *, group, W):
        """Per-group RLC aggregation: (B, 3, L) pairing sides -> (W, 3, L)
        aggregates (one per group, identity-padded up to the pair width W).
        Rows with invalid encodings are already rejected; zeroing their weight
        keeps them from failing their group-mates' aggregate. Zero-weight /
        padding slots aggregate to the identity point, whose pairing check is
        trivially true."""
        B = el.shape[0]
        G = B // group
        w = jnp.where(all_valid[:, None], weights, 0)
        el_g = el.reshape(G, group, 3, FP_SPEC.L)
        er_g = er.reshape(G, group, 3, FP_SPEC.L)
        w_g = w.reshape(G, group, FR_SPEC.L)
        if W > G:
            pad_p = jnp.broadcast_to(
                jnp.asarray(jc.host_point_to_mont(None)),
                (W - G, group, 3, FP_SPEC.L),
            )
            el_g = jnp.concatenate([el_g, pad_p], axis=0)
            er_g = jnp.concatenate([er_g, pad_p], axis=0)
            w_g = jnp.concatenate(
                [w_g, jnp.zeros((W - G, group, FR_SPEC.L), jnp.uint32)], axis=0
            )
        # ONE MSM call aggregates both pairing sides: el/er groups stack on
        # the batch axis (2W is still a lane multiple), halving dispatches
        both = jnp.concatenate([el_g, er_g], axis=0)
        w2 = jnp.concatenate([w_g, w_g], axis=0)
        agg = (
            self._pallas_msm(group) if self._pallas_ok(2 * W) else jc.msm
        )(both, w2)
        return agg[:W], agg[W:]

    def _post_impl(self, group_ok_p, all_valid, el, er, *, group, R):
        """Gather up to R rows belonging to failing groups for the exact
        re-check pairing (padding slots carry the identity pair)."""
        B = el.shape[0]
        G = B // group
        group_ok = group_ok_p[:G]
        suspect = jnp.repeat(~group_ok, group) & all_valid
        n_sus = jnp.sum(suspect)
        idx = jnp.nonzero(suspect, size=R, fill_value=0)[0]
        live = jnp.arange(R) < n_sus
        ident = jnp.broadcast_to(
            jnp.asarray(jc.host_point_to_mont(None)), (R, 3, FP_SPEC.L)
        )
        el_s = jnp.where(live[:, None, None], el[idx], ident)
        er_s = jnp.where(live[:, None, None], er[idx], ident)
        verdicts0 = jnp.repeat(group_ok, group) & all_valid
        # padding slots must scatter out-of-bounds and be dropped — several
        # of them alias index 0, and a stale verdicts[0] from a later padding
        # slot would clobber row 0's fresh re-check result
        idx_w = jnp.where(live, idx, B)
        return verdicts0, n_sus, group_ok, idx_w, el_s, er_s

    @staticmethod
    def _final_impl(verdicts0, idx_w, row_ok):
        return verdicts0.at[idx_w].set(row_ok, mode="drop")

    def _recheck_rows(self, el, er, suspects) -> np.ndarray:
        """Exact per-row pairing checks for the suspect row indices; chunks
        of the shared pair width padded with the identity (whose check is
        trivially true)."""
        el, er = np.asarray(el), np.asarray(er)
        ident = np.asarray(jc.host_point_to_mont(None))
        chunk = self._pair_width(max(len(suspects), 1))
        prog = self._prog("pair", self._pair_cond_impl)
        on = jnp.asarray(True)
        out = np.zeros(len(suspects), dtype=bool)
        for s in range(0, len(suspects), chunk):
            idx = suspects[s : s + chunk]
            el_c = np.broadcast_to(ident, (chunk, 3, FP_SPEC.L)).copy()
            er_c = el_c.copy()
            el_c[: len(idx)] = el[idx]
            er_c[: len(idx)] = er[idx]
            out[s : s + len(idx)] = np.asarray(prog(el_c, er_c, on))[: len(idx)]
        return out

    def compute_y_hints(self, proof_bytes) -> np.ndarray:
        """Host: (B, PLEN) uint8 proofs -> (B, n_points, L) canonical Fp limb
        arrays holding a candidate sqrt(x^3 + 4) per compressed proof point.
        Pure acceleration data — the device re-checks every hint (see
        verify) — so any host core, the submitting client, or an ingest tier
        can produce them; duplicate proof rows are computed once."""
        from ..refimpl.field import P

        proof_bytes = np.ascontiguousarray(proof_bytes, dtype=np.uint8)
        offs = list(self.layout.point_offsets.values())
        uniq, inv = np.unique(proof_bytes, axis=0, return_inverse=True)
        e = (P + 1) >> 2
        cache = np.zeros((uniq.shape[0], len(offs), FP_SPEC.L), np.uint32)
        for u in range(uniq.shape[0]):
            row = uniq[u].tobytes()
            for i, off in enumerate(offs):
                x = int.from_bytes(
                    bytes([row[off] & 0x1F]) + row[off + 1 : off + 48], "big"
                ) % P
                rhs = (x * x % P * x + 4) % P
                cache[u, i] = FP_SPEC.encode(pow(rhs, e, P))
        return cache[inv.reshape(-1)]

    # ------------------------------------------------------------------
    def _fr_from_le_bytes(self, raw):
        """(..., 32) uint8 -> canonical-domain value mod q in Montgomery form."""
        pairs = raw.astype(jnp.uint32).reshape(*raw.shape[:-1], 16, 2)
        limbs16 = pairs[..., 0] | (pairs[..., 1] << 8)
        limbs = jnp.concatenate(
            [limbs16, jnp.zeros_like(limbs16[..., :1])], axis=-1
        )
        return fr.to_mont(limbs)  # tolerates values up to 2^256 (< R*N/R2)

    def _challenge_from_hashes(self, h1, h2):
        m1 = self._fr_from_le_bytes(h1)
        m2 = self._fr_from_le_bytes(h2)
        return fr.add(m1, fr.mul(m2, jnp.asarray(self.r256_mont)))

    def _fr_from_words(self, w):
        """(..., 8) uint32 LE64 digest words -> Fr Montgomery (same value as
        _fr_from_le_bytes on the 32-byte digest)."""
        l16 = jnp.stack([w & 0xFFFF, w >> 16], axis=-1).reshape(*w.shape[:-1], 16)
        limbs = jnp.concatenate([l16, jnp.zeros_like(l16[..., :1])], axis=-1)
        return fr.to_mont(limbs)

    def _challenge_from_words(self, w1, w2):
        return fr.add(
            self._fr_from_words(w1),
            fr.mul(self._fr_from_words(w2), jnp.asarray(self.r256_mont)),
        )

    def _pi_bytes(self, pi_limbs):
        """(..., L) canonical Fr limbs -> (..., 32) LE bytes."""
        l16 = pi_limbs[..., :16]
        lo = (l16 & 0xFF).astype(jnp.uint8)
        hi = ((l16 >> 8) & 0xFF).astype(jnp.uint8)
        return jnp.stack([lo, hi], axis=-1).reshape(*pi_limbs.shape[:-1], 32)

    def _verify_impl(self, proof, pis, y_hints=None, sub_weights=None):
        """Single-program form of verify() — used where ONE traceable function
        is needed (shard_map / pjit multichip paths, the driver entry). The
        staged verify() is the single-chip serving path (shared compiled
        programs; see _pair_staged)."""
        el, er, all_valid = self._core_impl(proof, pis, y_hints, sub_weights)
        return self._pairing_check(el, er) & all_valid

    def _pairing_check(self, el, er):
        """(B, 3, L) projective el/er -> (B,) bool: e(el, sG2) e(er, G2) == 1."""
        B = el.shape[0]
        if self._pallas_ok(B):
            return self._pallas_pairing()(el, er)

        def affine(p):
            inf = jc.is_identity(p)
            zi = fp.inv(p[..., 2, :])
            xa = fp.mul(p[..., 0, :], zi)
            ya = fp.mul(p[..., 1, :], zi)
            return xa, ya, inf

        el_x, el_y, el_inf = affine(el)
        er_x, er_y, er_inf = affine(er)
        return jpair.pairing_check(
            [
                ((el_x, el_y, el_inf), self.prep_sg2),
                ((er_x, er_y, er_inf), self.prep_g2),
            ]
        )

    def _core_impl(self, proof, pis, y_hints=None, sub_weights=None):
        plan, lay, vk = self.plan, self.layout, self.plan.vk
        B = proof.shape[0]
        assert proof.shape[1] == lay.proof_len, (
            f"proof length {proof.shape[1]} != expected {lay.proof_len}"
        )

        # ---- transcript buffer + all challenges --------------------------
        # gather form: every buffer byte comes from the static template or a
        # static proof offset — one vectorized gather + select instead of a
        # scatter (TPU scatters lower poorly; measured 5.5 -> 4.4 ms)
        if not hasattr(self, "_buf_src"):
            src = np.zeros(lay.total_len, np.int32)
            from_proof = np.zeros(lay.total_len, bool)
            for k, pos in enumerate(lay.proof_scatter):
                src[pos] = k
                from_proof[pos] = True
            self._buf_src, self._buf_from_proof = src, from_proof
        buf = jnp.where(
            jnp.asarray(self._buf_from_proof),
            proof[:, jnp.asarray(self._buf_src)],
            jnp.asarray(lay.template),
        )
        for i, pos in enumerate(lay.pi_positions):
            buf = jax.lax.dynamic_update_slice(
                buf, self._pi_bytes(pis[:, i, :]), (0, pos)
            )

        # all squeezes hash nested prefixes of the one transcript buffer:
        # chain the shared full blocks once, one final compression per squeeze
        if self._pallas_ok(B):
            # fused Pallas transcript kernel (prefix chain + per-squeeze
            # final blocks + h2) — the XLA graph form costs ~40 ms/batch
            h1w, h2w = self._pallas_transcript()(buf)  # (B, S, 8) words
            ch = {
                name: self._challenge_from_words(h1w[:, s], h2w[:, s])
                for s, (name, _mlen) in enumerate(lay.squeezes)
            }
        else:
            sq_lengths = [mlen for _name, mlen in lay.squeezes]
            h1s = blake2b_256_prefixes(buf, sq_lengths)  # (B, S, 32)
            h2s = blake2b_256(h1s.reshape(B * len(sq_lengths), 32)).reshape(
                B, len(sq_lengths), 32
            )
            ch = {
                name: self._challenge_from_hashes(h1s[:, s, :], h2s[:, s, :])
                for s, (name, _mlen) in enumerate(lay.squeezes)
            }

        # ---- parse proof fields ------------------------------------------
        scalar_names = list(lay.scalar_offsets.keys())
        if scalar_names:
            sc_idx = np.stack(
                [np.arange(32) + lay.scalar_offsets[n] for n in scalar_names]
            )
            sc_raw = proof[:, jnp.asarray(sc_idx)]  # (B, n_s, 32)
            sc_vals = self._fr_from_le_bytes(sc_raw)
            scalars = {n: sc_vals[:, i, :] for i, n in enumerate(scalar_names)}
        else:
            scalars = {}

        point_names = list(lay.point_offsets.keys())
        pt_idx = np.stack(
            [np.arange(48) + lay.point_offsets[n] for n in point_names]
        )
        pt_raw = proof[:, jnp.asarray(pt_idx)]  # (B, n_p, 48)
        if self.subgroup_check == "aggregate" and sub_weights is None:
            # refuse the silent semantic downgrade: the default strict
            # mode NEEDS per-batch weights (verify()/verify_rlc() supply
            # them; direct _verify_impl/_core_impl callers must pass
            # subgroup_weights(), or opt out with subgroup_check="off")
            raise ValueError(
                "subgroup_check='aggregate' requires sub_weights — pass "
                "verifier.subgroup_weights() (fresh per batch), or "
                "construct JaxVerifier(subgroup_check='off'/'exact')"
            )
        sub_ok_fused = None
        if y_hints is not None:
            # hint path: 2 Fp muls per point instead of the sqrt ladder;
            # on TPU the whole hinted parse/decompress stage is one Pallas
            # kernel (bit-identical — see make_decompress_kernel), and in
            # the default aggregate mode the subgroup test rides the same
            # kernel while the points are still in-register
            if self._pallas_ok(B) and self.subgroup_check == "aggregate":
                pts, pt_valid, sub_ok_fused = self._pallas_decompress(
                    len(point_names), self.subgroup_rounds
                )(pt_raw, y_hints, sub_weights)
            elif self._pallas_ok(B):
                pts, pt_valid = self._pallas_decompress(len(point_names))(
                    pt_raw, y_hints
                )
            else:
                pts, pt_valid = jc.decompress(pt_raw, y_hint=y_hints)
        else:
            sqrt_fn = (
                self._pallas_pow("fp", (FP_SPEC.N + 1) >> 2, len(point_names))
                if self._pallas_ok(B)
                else None
            )
            pts, pt_valid = jc.decompress(pt_raw, sqrt_fn=sqrt_fn)
        points = {n: pts[:, i] for i, n in enumerate(point_names)}
        all_valid = jnp.all(pt_valid, axis=-1)
        if self.subgroup_check == "exact":
            all_valid = all_valid & jnp.all(jc.subgroup_check(pts), axis=-1)
        elif self.subgroup_check == "aggregate":
            if sub_ok_fused is not None:
                ok = sub_ok_fused
            elif self._pallas_ok(B):
                ok = self._pallas_subgroup(len(point_names))(pts, sub_weights)
            else:
                ok = jc.aggregate_subgroup_check(pts, sub_weights)
            all_valid = all_valid & ok

        # ---- scalar-side computation -------------------------------------
        x = ch["x"]
        xn = fr.pow(x, vk.n)
        one = jnp.broadcast_to(jnp.asarray(self.one_fr), x.shape).astype(jnp.uint32)

        def rot_point(rot):
            off = rot_offset(rot, vk.blinding_factors)
            if off == 0:
                return x
            return fr.mul(x, jnp.asarray(self.rot_mult[off]))

        fr_root_inv = (
            (lambda t: self._pallas_pow("fr", Q - 2, 1)(t[:, None, :])[:, 0, :])
            if self._pallas_ok(B)
            else None
        )

        # ---- one pooled Fr inversion --------------------------------------
        # Every Fr inverse the verifier needs (Lagrange-basis denominators,
        # 1/(x^n - 1), multiopen interpolation denominators) depends only on
        # challenges and plan constants, so they all merge into a single
        # Montgomery-trick batch inversion with ONE Fermat ladder at the root
        # (was: one latency-bound ladder launch per basis / per point set).
        inv_blocks = []  # (B, k, L) blocks, concatenated on the k axis

        def _pool(block):
            start = sum(b.shape[-2] for b in inv_blocks)
            inv_blocks.append(block)
            return (start, start + block.shape[-2])

        if self.n_pi:
            inst_rots = jnp.asarray(self.inst_rotations[: self.n_pi])
            sl_inst = _pool(fr.sub(x[:, None, :], inst_rots[None, :, :]))
        van_rots = jnp.asarray(self.van_rotations)
        sl_van = _pool(fr.sub(x[:, None, :], van_rots[None, :, :]))
        sl_xn1 = _pool(fr.sub(xn, one)[:, None, :])

        mo_slices = []
        set_points = None
        if plan.flavor == FLAVOR_HALO2:
            x3_ch = ch["x3"]
            set_points = [[rot_point(r) for r in rots] for rots in plan.point_sets]
            for pts_s in set_points:
                dens = []
                for j in range(len(pts_s)):
                    den = None
                    for m in range(len(pts_s)):
                        if m == j:
                            continue
                        dm = fr.sub(pts_s[j], pts_s[m])
                        den = dm if den is None else fr.mul(den, dm)
                    dens.append(den if den is not None else fr.one((B,)))
                z_den = None
                for p in pts_s:
                    t = fr.sub(x3_ch, p)
                    z_den = t if z_den is None else fr.mul(z_den, t)
                mo_slices.append(_pool(jnp.stack(dens + [z_den], axis=-2)))

        pooled_invs = fr.batch_inv(
            jnp.concatenate(inv_blocks, axis=-2), axis=-2, inv_fn=fr_root_inv
        )
        mo_invs = [pooled_invs[:, a:b, :] for (a, b) in mo_slices]

        def lagrange_basis(rots, sl):
            # l_i(x) = rot_i * (x^n - 1) * bary / (x - rot_i)
            invs = pooled_invs[:, sl[0] : sl[1], :]
            common = fr.mul(fr.sub(xn, one), jnp.asarray(self.bary_mont))
            return fr.mul(fr.mul(invs, common[:, None, :]), rots[None, :, :])

        # instance evaluation
        if self.n_pi:
            basis_inst = lagrange_basis(inst_rots, sl_inst)
            pis_mont = fr.to_mont(pis)
            instance_eval = fr.dot_lazy(basis_inst, pis_mont, axis=-2)
        else:
            instance_eval = fr.zeros(x.shape[:-1])

        basis_van = lagrange_basis(van_rots, sl_van)
        bf = vk.blinding_factors
        last_evaluation = basis_van[:, 0, :]
        sum_blind = fr.sum_lazy(basis_van[:, 1 : 1 + bf, :], axis=-2)
        evaluation_at_0 = basis_van[:, 1 + bf, :]
        active_rows = fr.sub(one, fr.add(last_evaluation, sum_blind))

        perm_z_evals = [
            {
                w: scalars[f"perm_z_{s}_{w}"]
                for w in (["cur", "next", "last"] if s != plan.num_permutation_sets - 1 else ["cur", "next"])
            }
            for s in range(plan.num_permutation_sets)
        ]
        lookup_evals = [
            {w: scalars[f"lookup_{i}_{w}"] for w in ["z_cur", "z_next", "a_cur", "a_prev", "s_cur"]}
            for i in range(len(plan.lookups))
        ]
        env = _FrEnv(
            vars_={
                "theta": ch.get("theta"),
                "beta": ch.get("beta"),
                "gamma": ch.get("gamma"),
                "x": x,
                "instance_eval": instance_eval,
                "evaluation_at_0": evaluation_at_0,
                "last_evaluation": last_evaluation,
                "active_rows": active_rows,
            },
            advice_evals=[scalars[f"advice_eval_{i}"] for i in range(len(plan.advice_queries))],
            fixed_evals=[scalars[f"fixed_eval_{i}"] for i in range(len(plan.fixed_queries))],
            perm_common_evals=[scalars[f"perm_common_{i}"] for i in range(len(plan.permutation_columns))],
            perm_z_evals=perm_z_evals,
            lookup_evals=lookup_evals,
        )

        h_eval = fr.zeros(x.shape[:-1])
        y = ch["y"]
        for expr in self.exprs:
            h_eval = fr.add(fr.mul(h_eval, y), eval_expr(expr, env))
        inv_xn1 = pooled_invs[:, sl_xn1[0], :]
        vanishing_s = fr.mul(h_eval, inv_xn1)

        # ---- evaluation-reference resolution -----------------------------
        def eval_value(ref):
            tag = ref[0]
            if tag == "advice_eval":
                return scalars[f"advice_eval_{ref[1]}"]
            if tag == "fixed_eval":
                return scalars[f"fixed_eval_{ref[1]}"]
            if tag == "perm_z":
                return scalars[f"perm_z_{ref[1]}_{ref[2]}"]
            if tag == "perm_common":
                return scalars[f"perm_common_{ref[1]}"]
            if tag == "vanishing_s":
                return vanishing_s
            if tag == "random_eval":
                return scalars["random_eval"]
            if tag == "lookup":
                return scalars[f"lookup_{ref[1]}_{ref[2]}"]
            raise ValueError(ref)

        # commitment reference -> static point key (+ expansion into splits)
        n_splits = plan.num_vanishing_splits

        def com_terms(ref, coeff):
            """Yield (point_key, coeff) MSM terms; vanishing_g expands into
            the xn^i-scaled quotient splits (extraction/mod.rs:637-686). The
            static key lets duplicate points merge before the MSM kernel."""
            tag = ref[0]
            if tag == "vanishing_g":
                c = coeff
                for i in range(n_splits):
                    yield (f"split_{i}", c)
                    if i != n_splits - 1:
                        c = fr.mul(c, xn)
                return
            if tag == "advice_com":
                key = f"advice_{ref[1]}"
            elif tag == "fixed_com":
                key = f"#fixed_{ref[1]}"
            elif tag == "perm_z_com":
                key = f"perm_z_{ref[1]}"
            elif tag == "perm_common_com":
                key = f"#perm_{ref[1]}"
            elif tag == "vanishing_rand":
                key = "vanishing_rand"
            elif tag == "lookup_z_com":
                key = f"lookup_z_{ref[1]}"
            elif tag == "lookup_perm_input_com":
                key = f"lookup_perm_input_{ref[1]}"
            elif tag == "lookup_perm_table_com":
                key = f"lookup_perm_table_{ref[1]}"
            else:
                raise ValueError(ref)
            yield (key, coeff)

        def resolve_point(key):
            """Static key -> (B, 3, L) point array ('#'-prefixed = VK const)."""
            B_ = proof.shape[0]
            if key == "#neg_g1":
                return jnp.broadcast_to(jnp.asarray(neg_g1), (B_, 3, FP_SPEC.L))
            if key.startswith("#fixed_"):
                return jnp.broadcast_to(
                    jnp.asarray(self.fixed_coms[int(key[7:])]), (B_, 3, FP_SPEC.L)
                )
            if key.startswith("#perm_"):
                return jnp.broadcast_to(
                    jnp.asarray(self.perm_coms[int(key[6:])]), (B_, 3, FP_SPEC.L)
                )
            return points[key]

        def dedup_terms(terms):
            """Merge duplicate points by summing their scalars, insertion-
            ordered — the plan-time analog of the reference's flatten_msm /
            optimize_msm (code_emitters_aiken.rs:913-1016)."""
            order, acc = [], {}
            for key, c in terms:
                if key in acc:
                    acc[key] = fr.add(acc[key], c)
                else:
                    acc[key] = c
                    order.append(key)
            return [(k, acc[k]) for k in order]

        def _msm_arrays(terms):
            terms = dedup_terms(terms)
            self.msm_term_counts.append(len(terms))
            pts_arr = jnp.stack([resolve_point(k) for k, _c in terms], axis=-3)
            coeff_arr = jnp.stack([fr.from_mont(c) for _k, c in terms], axis=-2)
            return pts_arr, coeff_arr

        def run_msm(terms):
            pts_arr, coeff_arr = _msm_arrays(terms)
            return self._msm(proof.shape[0], pts_arr, coeff_arr)

        def run_msm_pair(terms_l, terms_r):
            """The GWC flavor's two pairing-side MSMs, dispatched
            separately (both async — they pipeline). Stacking them into one
            kernel call by zero-padding the 3-term left side to the right
            side's 17 terms on a doubled batch axis was MEASURED SLOWER
            (227.8 vs 207.5 ms at B=1024, v5e): the pad adds two whole dead
            chunks of window math across 2048 rows, far more than the one
            saved dispatch. The flavor's residual gap to halo2 is real work
            (an extra left MSM, 3-vs-2 right chunks, a longer transcript),
            not dispatch overhead — see STAGES.md round-5 ledger."""
            B_ = proof.shape[0]
            pl_, cl = _msm_arrays(terms_l)
            pr_, cr = _msm_arrays(terms_r)
            return self._msm(B_, pl_, cl), self._msm(B_, pr_, cr)

        from ..refimpl.curve import G1_GEN, g1_neg

        neg_g1 = jc.host_point_to_mont(g1_neg(G1_GEN))

        self.msm_term_counts = []
        if plan.flavor == FLAVOR_HALO2:
            el, er_msm = self._multiopen_halo2(plan, ch, scalars, eval_value, com_terms, run_msm, points, set_points, mo_invs)
        else:
            el, er_msm = self._multiopen_gwc(plan, ch, scalars, rot_point, eval_value, com_terms, run_msm_pair, points)

        # ---- pairing sides -------------------------------------------------
        er = jc.neg(er_msm)
        return el, er, all_valid

    # ------------------------------------------------------------------
    def _multiopen_halo2(self, plan, ch, scalars, eval_value, com_terms, run_msm, points, set_points, mo_invs):
        """Halo2-book accumulation (Halo2MultiOpenMSM.hs:59-97) assembled as
        one MSM; q-set evals/f_eval computed scalar-side. `set_points` are the
        per-set rotated evaluation points and `mo_invs[s]` the precomputed
        inverses of [interp denominators..., prod(x3 - pt)] for set s (from
        the caller's pooled batch inversion)."""
        x1, x2, x3, x4 = ch["x1"], ch["x2"], ch["x3"], ch["x4"]
        B = x1.shape[0]
        n_sets = len(plan.point_sets)

        # powers of x1 / x4
        x1_powers = [fr.one((B,))]
        for _ in range(plan.x1_powers_count - 1):
            x1_powers.append(fr.mul(x1_powers[-1], x1))
        x4_powers = [fr.one((B,))]
        for _ in range(plan.x4_powers_count - 1):
            x4_powers.append(fr.mul(x4_powers[-1], x4))

        # q-set eval vectors (x1-weighted sums of claimed evals per point)
        q_eval_sets = []
        members_by_set = [
            [cd for cd in plan.commitment_data if cd[1] == s] for s in range(n_sets)
        ]
        for s, members in enumerate(members_by_set):
            n_pts = len(plan.point_sets[s])
            evs = []
            for p_idx in range(n_pts):
                terms = jnp.stack(
                    [
                        fr.mul(x1_powers[j], eval_value(cd[3][p_idx]))
                        for j, cd in enumerate(members)
                    ],
                    axis=-2,
                )
                evs.append(fr.sum_lazy(terms, axis=-2))
            q_eval_sets.append(evs)

        # f_eval: Horner in x2 over reversed sets of
        # (q_eval - r(x3)) / prod(x3 - pt); denominators arrive pre-inverted
        f_eval = fr.zeros((B,))
        per_set = []
        for s in range(n_sets):
            pts_s = set_points[s]
            evs = q_eval_sets[s]
            inv_stack = mo_invs[s]
            # r(x3): lagrange interpolation through (pts_s, evs) at x3
            r_eval = fr.zeros((B,))
            for j in range(len(pts_s)):
                num = None
                for m in range(len(pts_s)):
                    if m == j:
                        continue
                    nm = fr.sub(x3, pts_s[m])
                    num = nm if num is None else fr.mul(num, nm)
                if num is None:
                    num = fr.one((B,))
                r_eval = fr.add(
                    r_eval, fr.mul(evs[j], fr.mul(num, inv_stack[:, j, :]))
                )
            q_ev = scalars[f"q_eval_{s}"]
            term = fr.mul(fr.sub(q_ev, r_eval), inv_stack[:, len(pts_s), :])
            per_set.append(term)
        for term in reversed(per_set):
            f_eval = fr.add(fr.mul(f_eval, x2), term)

        # v = sum x4^i (q_evals ++ [f_eval])
        v = fr.zeros((B,))
        for i in range(n_sets):
            v = fr.add(v, fr.mul(x4_powers[i], scalars[f"q_eval_{i}"]))
        v = fr.add(v, fr.mul(x4_powers[n_sets], f_eval))

        # final MSM: sum_s x4^s sum_j x1^j com_{s,j} + x4^n f_comm
        #            + v * (-G1) + x3 * pi
        msm_terms = []
        for s, members in enumerate(members_by_set):
            for j, cd in enumerate(members):
                coeff = fr.mul(x4_powers[s], x1_powers[j])
                msm_terms.extend(com_terms(cd[0], coeff))
        msm_terms.append(("f_commitment", x4_powers[n_sets]))
        msm_terms.append(("#neg_g1", v))
        msm_terms.append(("pi", x3))
        er = run_msm(msm_terms)
        return points["pi"], er

    def _multiopen_gwc(self, plan, ch, scalars, rot_point, eval_value, com_terms, run_msm_pair, points):
        """GWC19 accumulation (GwcMultiOpenMSM.hs:96-135); duplicate points
        (a commitment queried at several rotations) merge at plan time, and
        the two pairing-side MSMs run as ONE stacked kernel dispatch."""
        from ..refimpl.multiopen import group_queries_by_rotation

        v_ch, u_ch = ch["v"], ch["u"]
        B = v_ch.shape[0]
        triples = [(q.rot, q.commitment, q.evaluation) for q in plan.all_queries_ordered()]
        grouped = group_queries_by_rotation(triples)

        left_terms, right_terms = [], []
        u_pow = fr.one((B,))
        final_eval = fr.zeros((B,))
        for g_idx, (rot, members) in enumerate(grouped):
            z = rot_point(rot)
            left_terms.append((f"w_{g_idx}", u_pow))
            right_terms.append((f"w_{g_idx}", fr.mul(u_pow, z)))
            v_pow = fr.one((B,))
            inner = fr.zeros((B,))
            for com, ev in members:
                right_terms.extend(com_terms(com, fr.mul(v_pow, u_pow)))
                inner = fr.add(inner, fr.mul(v_pow, eval_value(ev)))
                v_pow = fr.mul(v_pow, v_ch)
            final_eval = fr.add(final_eval, fr.mul(u_pow, inner))
            u_pow = fr.mul(u_pow, u_ch)
        right_terms.append(("#neg_g1", final_eval))

        return run_msm_pair(left_terms, right_terms)
