"""Dynamic micro-batching engine over the jitted greedy decode.

Design (TPU-first):

- **Bucketed static shapes.** Requests are fixed-size audio chunks
  (`config.shared.chunk_samples`); the engine pads each micro-batch up to the
  smallest configured bucket, so XLA compiles one executable per bucket and
  never recompiles at serve time. `precompile()` warms every bucket up front
  so the first real request never pays a compile.
- **One dispatcher thread owns the device.** All JAX dispatch happens from a
  single thread; client threads only enqueue numpy arrays and wait on
  futures. This keeps the dispatch pipeline deep (enqueue next batch while
  the previous one runs) without any cross-thread device contention.
- **Latency/throughput knob.** After the first request of a batch arrives,
  the dispatcher drains whatever is already queued and then waits at most
  `max_wait_ms` for stragglers (capped at the largest bucket). `max_wait_ms=0`
  is the pure low-latency policy: never hold a request to grow the batch.

The reference has no equivalent (its inference is a sequential per-chunk CLI
loop, `/root/reference/inference.py:98-120`); the engine's decode paths are
the same `models.decode.greedy_decode` / `beam_search_decode` proven
token-identical to the reference decode (tests/test_reference_equivalence.py),
so serving inherits parity. All knobs load from the config's `serving:`
section (`config.ServingConfig`) via `ServingEngine.from_config`.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.domain.segmenter import chunk_wave
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import decode_tokens_to_notes, merge_chunk_notes
from adt_str_tpu.models import decode as decode_lib

_SHUTDOWN = object()


@dataclass
class EngineStats:
    """Serve-time counters (monotonic; read with `ServingEngine.stats`)."""

    n_requests: int = 0
    n_batches: int = 0
    n_padded_rows: int = 0
    decode_seconds: float = 0.0
    occupancy: dict[int, int] = field(default_factory=dict)  # bucket -> batches

    def as_dict(self) -> dict:
        return {
            "n_requests": self.n_requests,
            "n_batches": self.n_batches,
            "n_padded_rows": self.n_padded_rows,
            "decode_seconds": round(self.decode_seconds, 6),
            "mean_batch": round(self.n_requests / self.n_batches, 3)
            if self.n_batches
            else 0.0,
            "occupancy": dict(sorted(self.occupancy.items())),
        }


class ServingEngine:
    """Micro-batching transcription engine.

    `submit_chunk(wave)` returns a `concurrent.futures.Future` resolving to
    the `(max_length,)` int32 token row for one audio chunk; `transcribe`
    is the song-level convenience that chunks, submits, and merges notes —
    concurrent songs share micro-batches.
    """

    def __init__(
        self,
        params,
        config: FrameworkConfig,
        *,
        max_length: int | None = None,
        buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64),
        max_wait_ms: float = 2.0,
        max_queue: int = 0,
        mesh=None,
        use_beam: bool = False,
        beam_size: int = 5,
        length_penalty: float = 1.0,
    ) -> None:
        if not buckets or list(buckets) != sorted(set(buckets)):
            raise ValueError(f"buckets must be sorted unique sizes, got {buckets!r}")
        self.config = config
        self.tokenizer = MidiTokenizer(config.tokenizer)
        inf = config.inference
        self.max_length = int(
            max_length if max_length is not None
            else (inf.max_length if inf is not None else 512)
        )
        self.chunk_samples = int(config.shared.chunk_samples)
        self.buckets = tuple(int(b) for b in buckets)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        # beam decode reuses the eval harness's `beam_search_decode` (token-
        # identical per bucket, tests/test_serving.py) — same bucketing, one
        # executable per bucket, just a wider per-row token budget
        self.use_beam = bool(use_beam)
        self.beam_size = int(beam_size)
        self.length_penalty = float(length_penalty)
        self._mesh = mesh
        if mesh is not None:
            from adt_str_tpu.parallel import mesh as mesh_lib

            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            bad = [b for b in self.buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the mesh data axis ({n_data})"
                )
            params = mesh_lib.shard_params(mesh, params)
            self._batch_sharding = mesh_lib.batch_sharding(mesh)
        else:
            # pin once so repeated calls never re-upload host params
            params = jax.device_put(params)
            self._batch_sharding = None
        self._params = params
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stats = EngineStats()
        self._stats_lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="adt-serving-dispatch", daemon=True
        )
        self._thread.start()

    # ---------------------------------------------------------------- public

    @classmethod
    def from_config(cls, params, config: FrameworkConfig, *, mesh=None,
                    **overrides) -> "ServingEngine":
        """Build from the config's `serving:` section; kwargs override YAML
        (serve.py maps its CLI flags here)."""
        s = config.serving
        kw = dict(
            max_length=s.max_length,
            buckets=s.buckets,
            max_wait_ms=s.max_wait_ms,
            use_beam=s.use_beam_search,
            beam_size=s.beam_size,
            length_penalty=s.length_penalty,
        )
        kw.update({k: v for k, v in overrides.items() if v is not None})
        return cls(params, config, mesh=mesh, **kw)

    def precompile(self) -> float:
        """Compile every bucket's decode executable (blocking); returns the
        wall seconds spent. Call at startup so no live request pays a compile."""
        t0 = time.monotonic()
        for b in self.buckets:
            silent = np.zeros((b, self.chunk_samples), np.float32)
            f: list[Future] = [Future() for _ in range(b)]
            self._run_batch([(silent[i], f[i]) for i in range(b)])
        return time.monotonic() - t0

    def submit_chunk(self, wave: np.ndarray) -> Future:
        """Enqueue one audio chunk (1-D float, <= chunk_samples; shorter is
        zero-padded). Future resolves to the (max_length,) int32 token row."""
        if self._closed:
            raise RuntimeError("engine is closed")
        wave = np.asarray(wave, dtype=np.float32).reshape(-1)
        if wave.shape[0] > self.chunk_samples:
            raise ValueError(
                f"chunk has {wave.shape[0]} samples > chunk_samples="
                f"{self.chunk_samples}; use transcribe() for whole songs"
            )
        if wave.shape[0] < self.chunk_samples:
            wave = np.pad(wave, (0, self.chunk_samples - wave.shape[0]))
        fut: Future = Future()
        self._queue.put((wave, fut))
        return fut

    def transcribe(
        self, wave: np.ndarray, hop_sec: float | None = None
    ) -> np.ndarray:
        """Whole-song transcription through the micro-batcher: returns the
        merged (N, 4) float64 note array (same contract as
        `inference.transcribe`). Concurrent callers share device batches."""
        hop = (
            int(hop_sec * self.config.shared.sample_rate) if hop_sec else None
        )
        triples = chunk_wave(
            np.asarray(wave, np.float32).reshape(-1), self.chunk_samples, hop
        )
        futures = [(start, self.submit_chunk(chunk)) for start, chunk, _ in triples]
        all_notes = []
        for start, fut in futures:
            notes = decode_tokens_to_notes(self.tokenizer, fut.result())
            if len(notes):
                notes[:, 0:2] += start / self.config.shared.sample_rate
                all_notes.append(notes)
        return merge_chunk_notes(all_notes, snap_to_grid=hop_sec is not None)

    def stats(self) -> dict:
        with self._stats_lock:
            return self._stats.as_dict()

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue, stop the dispatcher, fail any later submits."""
        if self._closed:
            return
        self._closed = True
        self._queue.put((_SHUTDOWN, None))
        self._thread.join(timeout=timeout)

    def __enter__(self) -> "ServingEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------- internals

    def _decode_device(self, waves: np.ndarray):
        """One device decode of a padded (bucket, chunk_samples) batch.
        Mesh runs go through the shard_map'd decoders: each device decodes
        its own rows (GSPMD cannot partition the mel custom call — plain
        jit-with-sharded-args would all-gather the batch first; see
        models/decode.py "mesh decode")."""
        dev = jnp.asarray(waves)
        bos, eos = self.tokenizer.BOS_token, self.tokenizer.EOS_token
        if self._batch_sharding is not None:
            dev = jax.device_put(dev, self._batch_sharding)
            if self.use_beam:
                return decode_lib.beam_search_decode_sharded(
                    self._params, dev, self.config.model, self._mesh,
                    beam_size=self.beam_size, max_length=self.max_length,
                    start_token=bos, end_token=eos,
                    length_penalty=self.length_penalty,
                )
            return decode_lib.greedy_decode_sharded(
                self._params, dev, self.config.model, self._mesh,
                max_length=self.max_length, start_token=bos, end_token=eos,
            )
        if self.use_beam:
            return decode_lib.beam_search_decode(
                self._params, dev, self.config.model,
                beam_size=self.beam_size, max_length=self.max_length,
                start_token=bos, end_token=eos,
                length_penalty=self.length_penalty,
            )
        return decode_lib.greedy_decode(
            self._params, dev, self.config.model,
            max_length=self.max_length, start_token=bos, end_token=eos,
        )

    def _collect_batch(self, first) -> tuple[list, bool]:
        """Greedily drain the queue, then wait up to max_wait_s for
        stragglers; stop at the largest bucket. Returns (batch, saw_shutdown)."""
        batch = [first]
        cap = self.buckets[-1]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < cap:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
            if item[0] is _SHUTDOWN:
                return batch, True
            batch.append(item)
        return batch, False

    def _run_batch(self, batch: list) -> None:
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n)
        waves = np.zeros((bucket, self.chunk_samples), np.float32)
        for i, (wave, _) in enumerate(batch):
            waves[i] = wave
        t0 = time.monotonic()
        try:
            tokens = np.asarray(self._decode_device(waves))
        except Exception as exc:  # propagate one failure to every waiter
            for _, fut in batch:
                if fut is not None and not fut.cancelled():
                    fut.set_exception(exc)
            return
        dt = time.monotonic() - t0
        for i, (_, fut) in enumerate(batch):
            if fut is not None and not fut.cancelled():
                fut.set_result(tokens[i])
        with self._stats_lock:
            s = self._stats
            s.n_requests += n
            s.n_batches += 1
            s.n_padded_rows += bucket - n
            s.decode_seconds += dt
            s.occupancy[bucket] = s.occupancy.get(bucket, 0) + 1

    def _drain_on_shutdown(self) -> None:
        """Resolve items that raced past the closed check so no waiter hangs."""
        leftovers = []
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item[0] is not _SHUTDOWN:
                leftovers.append(item)
        cap = self.buckets[-1]
        while leftovers:
            self._run_batch(leftovers[:cap])
            leftovers = leftovers[cap:]

    def _dispatch_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item[0] is _SHUTDOWN:
                self._drain_on_shutdown()
                return
            batch, saw_shutdown = self._collect_batch(item)
            self._run_batch(batch)
            if saw_shutdown:
                self._drain_on_shutdown()
                return
