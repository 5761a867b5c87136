"""Online serving subsystem: dynamic micro-batching over the jitted
KV-cache greedy decode, plus a dependency-free HTTP front-end.

The reference has no serving layer at all — its inference path is a
one-file-at-a-time CLI that re-runs the full decoder prefix per token
(`/root/reference/inference.py:98-120`, `model.py:260-324`). This package is
the production counterpart: a `ServingEngine` that coalesces concurrent
transcription requests into bucketed fixed-shape batches (so XLA compiles
each bucket exactly once and the MXU runs at batch efficiency even under
single-request traffic), and `serving.http` exposing it over HTTP.
"""

from adt_str_tpu.serving.engine import EngineStats, ServingEngine

__all__ = ["ServingEngine", "EngineStats"]
