"""Batched proof-verification service.

Replaces the reference's submit-and-poll flow against Cardano
(aiken-verifier/submitter/src/{main.rs,api.rs}) with a submit-and-poll flow
against a TPU batch queue:

  submitter: mint tx, redeemer = [proof, i1..i3],   here: submit(ProofBundle)
             NFT name = blake2b256(proof ∥ inputs)        tag = same hash
  Blockfrost submit_transaction (api.rs:52-73)      here: batch dispatch to the
                                                          jitted JaxVerifier
  wait_for_tx 5s polling (api.rs:75-80)             here: Future.result()

Batches are fixed-size (the verifier is compiled for one static batch shape);
partial batches are padded by repeating the last bundle. A background thread
lingers briefly to coalesce concurrent submissions."""

from __future__ import annotations

import hashlib
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ProofBundle:
    """One verification request: proof bytes + public-input scalars."""

    proof: bytes
    public_inputs: tuple

    @property
    def tag(self) -> bytes:
        """blake2b_256(proof ∥ inputs) — the reference's NFT-name derivation
        (submitter/src/main.rs:96-99), reused as the submission id."""
        h = hashlib.blake2b(digest_size=32)
        h.update(self.proof)
        for v in self.public_inputs:
            h.update(int(v).to_bytes(32, "big"))
        return h.digest()


class VerificationService:
    """Accumulate ProofBundles into fixed-size batches and verify on device.

    Args:
      plan: the CircuitPlan all submissions must target.
      batch_size: static device batch (one XLA program is compiled for it).
      linger_s: how long to wait for more submissions before dispatching a
        partial (padded) batch.
      device: jax device; defaults to jax.devices()[0].
    """

    def __init__(self, plan, batch_size: int = 32, linger_s: float = 0.02, device=None):
        from ..models.verifier_jax import JaxVerifier

        self.plan = plan
        self.batch_size = int(batch_size)
        self.linger_s = linger_s
        self._verifier = JaxVerifier(plan)
        self._device = device
        self._q: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.dispatches = 0
        self.verified = 0

    def submit(self, bundle: ProofBundle) -> Future:
        """Enqueue a bundle; the Future resolves to (tag, accepted: bool)."""
        if self._closed.is_set():
            raise RuntimeError("service closed")
        fut: Future = Future()
        self._q.put((bundle, fut))
        return fut

    def close(self):
        """Drain the queue and stop the worker."""
        self._closed.set()
        self._worker.join()

    # -- worker ---------------------------------------------------------

    def _take_batch(self):
        items = []
        try:
            items.append(self._q.get(timeout=0.05))
        except queue.Empty:
            return items
        deadline = threading.Event()
        # linger: give concurrent submitters a chance to fill the batch
        t = threading.Timer(self.linger_s, deadline.set)
        t.start()
        while len(items) < self.batch_size and not deadline.is_set():
            try:
                items.append(self._q.get(timeout=self.linger_s / 4 or 0.005))
            except queue.Empty:
                pass
        t.cancel()
        return items

    def _run(self):
        import jax

        dev = self._device or jax.devices()[0]
        while not (self._closed.is_set() and self._q.empty()):
            items = self._take_batch()
            if not items:
                continue
            bundles = [b for b, _ in items]
            pad = self.batch_size - len(bundles)
            padded = bundles + [bundles[-1]] * pad
            try:
                proofs = np.stack(
                    [np.frombuffer(b.proof, dtype=np.uint8) for b in padded]
                )
                pis = self._verifier.encode_public_inputs(
                    [list(b.public_inputs) for b in padded]
                )
                out = np.asarray(
                    self._verifier.verify(
                        jax.device_put(proofs, dev), jax.device_put(pis, dev)
                    )
                )
            except Exception as exc:  # resolve futures rather than hang clients
                for _, fut in items:
                    fut.set_exception(exc)
                continue
            self.dispatches += 1
            self.verified += len(bundles)
            for (bundle, fut), verdict in zip(items, out[: len(bundles)]):
                fut.set_result((bundle.tag, bool(verdict)))
