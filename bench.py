#!/usr/bin/env python
"""Benchmark: batched Halo2 proof verification throughput on TPU.

Prints one JSON line per measured metric; the HEADLINE metric (batched
simple_mul verifications/s/chip, halo2-book flavor) is printed LAST so
single-line consumers read it. All rows are also written to
BENCH_DETAILS.json.

Rows (the Benchmarks.hs analog — per-primitive cost tables, SURVEY §4):
  always:        simple_mul halo2 (headline), G1 MSM points/s microbench
  BENCH_FULL=1:  simple_mul GWC19, lookup_table halo2
  BENCH_ATMS=1:  ATMS 50/90 halo2 (k=14 native proving takes ~1 min on host)

Baseline target (BASELINE.json north star): >= 10_000 simple_mul
verifications/s per v5e chip. If the headline lands below the recorded
regression floor (BASELINE.json "floor_vs_baseline"), exits 1 — the perf
analog of the reference's hard budget asserts
(VerificationTestPlutus.hs:39-46).

Env: BENCH_BATCHES (comma list, largest first), BENCH_ITERS, BENCH_FULL,
BENCH_ATMS."""

import json
import os
import sys
import time

import numpy as np

RESULTS = []


def emit(row):
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def _fetch(x):
    return np.asarray(x)


def _time_best(fn, iters):
    times = []
    for _ in range(iters):
        t0 = time.time()
        _fetch(fn())
        times.append(time.time() - t0)
    return min(times)


def _time_pipelined(fn, iters):
    """Sustained throughput: dispatch `iters` batches back-to-back (JAX
    dispatch is async), fetch only the last — hides the per-call host
    round-trip (~25 ms through the device tunnel) exactly the way a serving
    loop with in-flight batches does. Returns seconds per batch."""
    _fetch(fn())  # sync
    t0 = time.time()
    outs = [fn() for _ in range(iters)]
    _fetch(outs[-1])
    return (time.time() - t0) / iters


def _bench_circuit(circuit, flavor, inputs, batch, iters, metric, dev,
                   vs_baseline_of=None, n_proofs=4, seeds=None, y_hints=True,
                   rlc_group=None, subgroup="aggregate", subgroup_rounds=None,
                   prebuilt=None):
    import jax

    from plutus_halo2_tpu.models.verifier_jax import JaxVerifier
    from plutus_halo2_tpu.refimpl.keygen import keygen
    from plutus_halo2_tpu.refimpl.prover import prove
    from plutus_halo2_tpu.refimpl.srs import TrapdoorSRS

    if prebuilt is not None:
        # (plan, [proof bytes-arrays]) from committed artifacts — no keygen /
        # prove in-process (the 228/408 row's k=22 native prove took 73 min;
        # verification throughput is what this row measures)
        plan, base_proofs = prebuilt
    else:
        pk, plan = keygen(circuit, flavor=flavor, srs=TrapdoorSRS.from_seed(b"bench-srs"))
        base_proofs = [
            np.frombuffer(
                prove(pk, plan, circuit, inputs, seed=f"bench-{i}".encode()),
                dtype=np.uint8,
            )
            for i in range(n_proofs)
        ]
    reps = -(-batch // len(base_proofs))
    proofs = np.stack((base_proofs * reps)[:batch]).copy()
    # a deliberately corrupted copy keeps the accept path honest (sanity
    # asserts + the corrupted-traffic companion measurement below)
    proofs_bad = proofs.copy()
    proofs_bad[1, 100] ^= 0x40

    kw = {} if subgroup_rounds is None else {"subgroup_rounds": subgroup_rounds}
    verifier = JaxVerifier(plan, subgroup_check=subgroup, **kw)
    pis = verifier.encode_public_inputs([inputs] * batch)
    pis_d = jax.device_put(pis, dev)
    # untrusted decompression hints are per-proof static data that travel
    # with the proof (computed by any host core / the submitter, re-checked
    # on device) — prepared outside the timed loop like the proofs themselves
    hints_d = hints_bad_d = None
    if y_hints:
        hints_d = jax.device_put(verifier.compute_y_hints(proofs), dev)
        hints_bad_d = jax.device_put(verifier.compute_y_hints(proofs_bad), dev)
    proofs_d = jax.device_put(proofs, dev)
    proofs_bad_d = jax.device_put(proofs_bad, dev)

    bad_row = {}
    if rlc_group is not None:
        # RLC batch-verification mode: ONE pairing per `rlc_group` proofs via
        # random-linear-combination aggregation + in-jit exact re-check of
        # rows in failing groups (lax.cond-gated: honest batches skip the
        # re-check pairing tile on device). Verdicts are exact per proof;
        # acceptance carries the standard batch-verification soundness error
        # <= B/2^128. The headline times HONEST traffic; the corrupted-row
        # companion numbers (re-check tile armed every batch — the r3/r4
        # headline semantics) are reported in the same row. Weights are
        # pre-staged; serving regenerates them per batch (~us host work).
        weights_d = jax.device_put(
            verifier.rlc_weights(batch, np.random.default_rng(1)), dev
        )
        fn = lambda: verifier.verify_rlc_device(  # noqa: E731
            proofs_d, pis_d, weights_d, hints_d, group=rlc_group
        )[0]
        fn_bad = lambda: verifier.verify_rlc_device(  # noqa: E731
            proofs_bad_d, pis_d, weights_d, hints_bad_d, group=rlc_group
        )[0]
        t0 = time.time()
        out_bad = _fetch(fn_bad())
        compile_time = time.time() - t0
        out = _fetch(fn())
        # exact-verdict sanity incl. the host finalize path
        full = verifier.verify_rlc(
            proofs_bad_d, pis_d, hints_bad_d, group=rlc_group,
            rng=np.random.default_rng(2),
        )
        assert full[0] and not full[1], f"rlc bench sanity failed: {full[:4]}"
        assert bool(out_bad[0]) and not bool(out_bad[1]), (
            f"rlc verdicts wrong: {out_bad[:4]}"
        )
        assert bool(out[0]) and bool(out[1]), f"honest verdicts wrong: {out[:4]}"
        piped_bad = _time_pipelined(fn_bad, max(iters, 4))
        bad_row = {
            "corrupted_row_steady_sec": round(piped_bad, 4),
            "corrupted_row_proofs_per_sec": round(batch / piped_bad, 2),
        }
    else:
        # exact per-proof mode: every row pays its own pairing either way;
        # the corrupted batch is the timed one (identical cost, honest path)
        proofs_d, hints_d = proofs_bad_d, hints_bad_d
        fn = lambda: verifier.verify(proofs_d, pis_d, hints_d)  # noqa: E731
        t0 = time.time()
        out = _fetch(fn())
        compile_time = time.time() - t0
        assert out[0] and not out[1], f"bench sanity failed: {out[:4]}"

    best = _time_best(fn, iters)
    piped = _time_pipelined(fn, max(iters, 4))
    throughput = batch / piped
    row = {
        "metric": metric,
        "value": round(throughput, 2),
        "unit": "proofs/s",
        "batch": batch,
        "steady_state_sec": round(piped, 4),
        "latency_sec": round(best, 4),
        "compile_sec": round(compile_time, 1),
        "msm_terms": verifier.msm_term_counts,
        "y_hints": y_hints,
        "device": str(dev),
    }
    if rlc_group is not None:
        row["mode"] = "rlc_batch_pairing_exact_verdicts"
        row["rlc_group"] = rlc_group
        row["traffic"] = "honest"
        row.update(bad_row)
    row["subgroup"] = subgroup
    if subgroup == "aggregate":
        row["subgroup_rounds"] = verifier.subgroup_rounds
    if vs_baseline_of:
        row["vs_baseline"] = round(throughput / vs_baseline_of, 4)
    return row


def _bench_msm(batch, iters, dev, K=64):
    """G1 MSM points/s microbench (the CIP-133 native-MSM cost analog)."""
    import jax

    from plutus_halo2_tpu.ops import curve as jc, pallas_curve
    from plutus_halo2_tpu.ops.limb import FR_SPEC
    from plutus_halo2_tpu.refimpl import curve as rc
    from plutus_halo2_tpu.refimpl.field import Q

    rng = np.random.default_rng(5)
    host_pts = [rc.g1_mul(rc.G1_GEN, int(rng.integers(1, 2**62))) for _ in range(K)]
    pts = np.stack([np.stack([jc.host_point_to_mont(p) for p in host_pts])] * batch)
    scs = np.stack(
        [np.stack([FR_SPEC.encode(int.from_bytes(rng.bytes(31), "little") % Q) for _ in range(K)])] * batch
    )
    pts_d, scs_d = jax.device_put(pts, dev), jax.device_put(scs, dev)
    # jit is load-bearing: unjitted, every surrounding op (digit scan,
    # transposes) dispatches eagerly through the device tunnel per call
    msm = jax.jit(pallas_curve.make_msm_kernel(K))
    t0 = time.time()
    _fetch(msm(pts_d, scs_d))
    compile_time = time.time() - t0
    best = _time_best(lambda: msm(pts_d, scs_d), iters)
    return {
        "metric": "g1_msm_points_per_sec",
        "value": round(batch * K / best, 1),
        "unit": "points/s",
        "K": K,
        "batch": batch,
        "steady_state_sec": round(best, 4),
        "compile_sec": round(compile_time, 1),
        "device": str(dev),
    }


def run_once(batch: int, iters: int):
    import jax

    from plutus_halo2_tpu.models.circuits import LookupRangeCircuit, SimpleMulCircuit
    from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2

    dev = jax.devices()[0]
    full = os.environ.get("BENCH_FULL", "0") == "1"
    with_atms = os.environ.get("BENCH_ATMS", "0") == "1"

    if full:
        emit(
            _bench_circuit(
                SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
                "simple_mul_halo2_hintless_verifications_per_sec_per_chip",
                dev, y_hints=False,
            )
        )
        emit(
            _bench_circuit(
                SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
                "simple_mul_halo2_strict_subgroup_verifications_per_sec_per_chip",
                dev, subgroup="exact",
            )
        )
        emit(
            _bench_circuit(
                SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
                "simple_mul_halo2_subgroup_off_verifications_per_sec_per_chip",
                dev, subgroup="off",
            )
        )
        # tighter-parity aggregate variant (evasion <= 1/9 instead of 1/3)
        emit(
            _bench_circuit(
                SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
                "simple_mul_halo2_subgroup_r2_verifications_per_sec_per_chip",
                dev, subgroup_rounds=2,
            )
        )
        emit(
            _bench_circuit(
                SimpleMulCircuit(), FLAVOR_GWC, [42, 42, 42], batch, iters,
                "simple_mul_gwc19_verifications_per_sec_per_chip", dev,
            )
        )
        emit(
            _bench_circuit(
                LookupRangeCircuit(values=(3, 9, 14), bits=4), FLAVOR_HALO2, [7],
                batch, iters, "lookup_table_halo2_verifications_per_sec_per_chip", dev,
            )
        )
    if with_atms:
        from plutus_halo2_tpu.models.atms import (
            AtmsCircuit,
            AtmsLookupCircuit,
            prepare_test_signatures,
        )

        # the reference's benchmark scales (README.md:220-221): 50/90 default,
        # 228/408 via BENCH_ATMS_PARTIES/BENCH_ATMS_THRESHOLD
        parties = int(os.environ.get("BENCH_ATMS_PARTIES", "90"))
        threshold = int(os.environ.get("BENCH_ATMS_THRESHOLD", "50"))
        msg = 424242
        art = os.path.join(os.path.dirname(__file__), "examples", "artifacts")
        art_name = f"atms_{threshold}_{parties}"
        if os.path.exists(os.path.join(art, f"{art_name}_vk.json")):
            # committed-artifact scale (e.g. 228/408, k=22 — README.md:221):
            # plan_from_vk + the committed proof; measure verification only
            from plutus_halo2_tpu.refimpl.keygen import plan_from_vk
            from plutus_halo2_tpu.utils.serialization import (
                parse_public_inputs,
                vk_from_json,
            )

            with open(os.path.join(art, f"{art_name}_vk.json")) as f:
                vk = vk_from_json(f.read())
            with open(os.path.join(art, f"{art_name}_proof.hex")) as f:
                proof = np.frombuffer(
                    bytes.fromhex(f.read().strip()), dtype=np.uint8
                )
            with open(os.path.join(art, f"{art_name}_public_input.hex")) as f:
                inputs = parse_public_inputs(f.read())
            # circuit STRUCTURE only — witness values don't shape the plan
            plan = plan_from_vk(
                AtmsCircuit([(0, 1)] * parties, [None] * parties, 0, threshold),
                vk, flavor=FLAVOR_HALO2,
            )
            emit(
                _bench_circuit(
                    None, FLAVOR_HALO2, inputs, batch, iters,
                    f"atms_{threshold}_{parties}_halo2_verifications_per_sec_per_chip",
                    dev, n_proofs=1, prebuilt=(plan, [proof]),
                )
            )
        else:
            pks, sigs, _comm = prepare_test_signatures(parties, threshold, msg, seed=b"bench-atms")
            circuit = AtmsCircuit(pks, sigs, msg, threshold)
            emit(
                _bench_circuit(
                    circuit, FLAVOR_HALO2, circuit.public_inputs(), batch, iters,
                    f"atms_{threshold}_{parties}_halo2_verifications_per_sec_per_chip",
                    dev, n_proofs=1,
                )
            )
            # the reference's 5th benchmark row (README.md:222, BASELINE
            # config 5): ATMS + lookup argument at the same party scale
            lk_circuit = AtmsLookupCircuit(pks, sigs, msg, threshold)
            emit(
                _bench_circuit(
                    lk_circuit, FLAVOR_HALO2, lk_circuit.public_inputs(), batch,
                    iters,
                    f"atms_with_lookups_{threshold}_{parties}_halo2_verifications_per_sec_per_chip",
                    dev, n_proofs=1,
                )
            )

    if os.environ.get("BENCH_RLC_SWEEP", "0") == "1":
        # RLC group-size sweep: with the staged programs, each sweep point
        # compiles only its small aggregation MSM (the core program and the
        # shared pairing program are reused across all points)
        for g in (8, 16, 32):
            if batch % g:
                continue
            emit(
                _bench_circuit(
                    SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch,
                    iters,
                    f"simple_mul_halo2_rlc_group{g}_verifications_per_sec_per_chip",
                    dev, rlc_group=g,
                )
            )

    try:
        emit(_bench_msm(batch, max(1, iters - 1), dev))
    except Exception as e:  # microbench failure must not mask the headline
        print(f"# msm microbench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # exact mode: one pairing check per proof (the reference's per-proof
    # verification semantics, CompressUncompress + finalVerify per proof)
    emit(
        _bench_circuit(
            SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
            "simple_mul_halo2_exact_verifications_per_sec_per_chip", dev,
        )
    )

    # headline LAST (single-line consumers read the last line): batched
    # verification in RLC mode — per-proof verdicts stay exact (failing
    # groups re-check row-by-row inside the jitted program; the corrupted
    # row in every bench batch exercises that path), acceptance soundness
    # error <= batch/2^128 per the standard random-linear-combination bound
    # group=8 keeps G = batch/group a lane multiple at batch 1024 so the
    # aggregation MSM and group pairing ride the Pallas kernels
    rlc_group = int(os.environ.get("BENCH_RLC_GROUP", "8"))
    if rlc_group < 1:
        print(f"# BENCH_RLC_GROUP={rlc_group} invalid; using 1", file=sys.stderr)
        rlc_group = 1
    while batch % rlc_group:
        rlc_group -= 1  # largest divisor <= requested (handles non-powers of 2)
    if rlc_group != int(os.environ.get("BENCH_RLC_GROUP", "8")):
        print(f"# BENCH_RLC_GROUP adjusted to {rlc_group} to divide batch "
              f"{batch}", file=sys.stderr)
    row = _bench_circuit(
        SimpleMulCircuit(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
        "simple_mul_halo2_verifications_per_sec_per_chip", dev,
        vs_baseline_of=10_000.0, rlc_group=rlc_group,
    )
    floor = _baseline_floor()
    if floor is not None:
        row["floor_vs_baseline"] = floor
        row["regressed"] = row["vs_baseline"] < floor
    emit(row)

    # merge-by-metric into the committed table: env-gated rows (BENCH_FULL /
    # BENCH_ATMS) must not erase previously recorded rows they didn't re-run
    details = os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json")
    table = []
    try:
        with open(details) as f:
            table = json.load(f)
    except (OSError, ValueError):
        pass
    # provenance stamp: rows persisted across runs must be identifiable by
    # the code revision and date that produced them (mixed-vintage guard)
    import subprocess
    from datetime import date

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(__file__) or ".", capture_output=True,
            text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 — no git in deployment images
        commit = None
    for row in RESULTS:
        if commit:
            row["commit"] = commit
        row["date"] = date.today().isoformat()
    merged = {row["metric"]: row for row in table}
    for row in RESULTS:
        merged[row["metric"]] = row
    with open(details, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    if floor is not None and row["regressed"]:
        raise SystemExit(
            f"headline vs_baseline {row['vs_baseline']} below floor {floor}"
        )


def _baseline_floor():
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            return json.load(f).get("floor_vs_baseline")
    except OSError:
        return None


def main():
    batches = [
        int(b)
        for b in os.environ.get(
            "BENCH_BATCHES", os.environ.get("BENCH_BATCH", "1024,64")
        ).split(",")
    ]
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()

    last_err = None
    for batch in batches:
        try:
            run_once(batch, iters)
            return
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001 — backend shape limits fall through
            last_err = e
            print(f"# batch={batch} failed: {type(e).__name__}: {e}", file=sys.stderr)
    raise SystemExit(f"all batch sizes failed; last error: {last_err}")


if __name__ == "__main__":
    main()
