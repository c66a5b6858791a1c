#!/usr/bin/env python
"""Targeted re-measurement of individual BENCH_DETAILS.json rows.

Same measurement harness, stamps and merge-by-metric semantics as bench.py
(it imports them), but runs only the requested rows — for refreshing a
subset without the full BENCH_FULL sweep's compile bill.

Usage: python tools/bench_rows.py gwc lookup [hintless|off|r2|strict]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    which = set(sys.argv[1:]) or {"gwc", "lookup"}
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    import plutus_halo2_tpu

    plutus_halo2_tpu.enable_compilation_cache()
    import jax

    from plutus_halo2_tpu.models.circuits import (
        LookupRangeCircuit,
        SimpleMulCircuit,
    )
    from plutus_halo2_tpu.models.plan import FLAVOR_GWC, FLAVOR_HALO2

    dev = jax.devices()[0]
    sm = lambda: SimpleMulCircuit()  # noqa: E731
    jobs = {
        "gwc": lambda: bench._bench_circuit(
            sm(), FLAVOR_GWC, [42, 42, 42], batch, iters,
            "simple_mul_gwc19_verifications_per_sec_per_chip", dev),
        "lookup": lambda: bench._bench_circuit(
            LookupRangeCircuit(values=(3, 9, 14), bits=4), FLAVOR_HALO2, [7],
            batch, iters, "lookup_table_halo2_verifications_per_sec_per_chip",
            dev),
        "hintless": lambda: bench._bench_circuit(
            sm(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
            "simple_mul_halo2_hintless_verifications_per_sec_per_chip", dev,
            y_hints=False),
        "off": lambda: bench._bench_circuit(
            sm(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
            "simple_mul_halo2_subgroup_off_verifications_per_sec_per_chip",
            dev, subgroup="off"),
        "r2": lambda: bench._bench_circuit(
            sm(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
            "simple_mul_halo2_subgroup_r2_verifications_per_sec_per_chip",
            dev, subgroup_rounds=2),
        "strict": lambda: bench._bench_circuit(
            sm(), FLAVOR_HALO2, [42, 42, 42], batch, iters,
            "simple_mul_halo2_strict_subgroup_verifications_per_sec_per_chip",
            dev, subgroup="exact"),
    }
    for name in which:
        bench.emit(jobs[name]())

    # stamp + merge exactly like bench.run_once's tail
    import json
    import subprocess
    from datetime import date

    details = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    table = []
    try:
        with open(details) as f:
            table = json.load(f)
    except (OSError, ValueError):
        pass
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(details), capture_output=True, text=True,
            timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        commit = None
    for row in bench.RESULTS:
        if commit:
            row["commit"] = commit
        row["date"] = date.today().isoformat()
    merged = {row["metric"]: row for row in table}
    for row in bench.RESULTS:
        merged[row["metric"]] = row
    with open(details, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
