"""Profiling harness — analog of the reference's `profiling_setup/`
(uplc flamegraphs + CEK budget tallies, profiling.sh:1-16). Here: XLA traces
viewable in Perfetto/TensorBoard plus coarse stage timings."""

from __future__ import annotations

import contextlib
import json
import time


@contextlib.contextmanager
def xla_trace(out_dir: str = "/tmp/ph2tpu_trace"):
    """Capture an XLA profiler trace around a block (open in Perfetto)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield out_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Coarse wall-clock stage breakdown, emitted as one JSON line (the
    benchmark.json analog, VerificationTestPlutus.hs:90-96)."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.stages.items()})
