"""Inference server: HTTP mel-in / wav-out with dynamic micro-batching.

Production-serving layer the reference lacks (its only inference surface is
the offline synthesize.py CLI).  Design:

* stdlib ThreadingHTTPServer front end — zero extra dependencies;
* a single device worker thread owns the TPU: requests queue up, the worker
  drains up to ``max_batch`` of them (waiting ``batch_window_ms`` for
  stragglers), groups them by bucketed padded length, and runs one jitted
  reverse pass per group — shape bucketing keeps the set of compiled
  programs small and throughput at the batched-synthesis rate;
* deterministic per-request seeds and temperatures: each request's noise is
  drawn from its own X-Seed at its bucketed length, so the returned audio
  depends only on (mel, seed, temp, compiled shape) — bit-identical across
  micro-batch compositions that land in the same pow2 batch bucket, and
  numerically equal (different compiled shapes may reassociate reductions)
  across buckets (tests/test_serving.py).

API:
  POST /synthesize     body = raw float32 .npy of one [T_mel, num_mels] mel
                       headers: X-Speaker-Id (optional int),
                                X-Seed (optional int),
                                X-Temp (optional float)
                       response = 16-bit PCM WAV bytes.  Mels longer than
                       the service's max_frames are transparently routed
                       through the streaming path server-side: same
                       complete-WAV response contract (exact
                       Content-Length), the bytes just leave
                       progressively — clients need only ONE endpoint.
  POST /synthesize_stream
                       same body/headers (plus optional X-Chunk-Frames);
                       any mel length — the response is a progressively
                       written WAV (exact Content-Length known upfront)
                       whose first bytes arrive after ONE window's
                       synthesis (synthesis/streaming.py), so long-form
                       audio starts playing while the tail is still being
                       synthesized.  Audio is exact vs the one-shot
                       reverse at the same (seed, temp) on the
                       quality-exact route; under the int8 kernels
                       (FWN_INT8, TPU default) window-local activation
                       scales differ from the full-length run's, a
                       deviation measured AT the bf16 reduction-reorder
                       noise floor (docs/benchmarks.md int8 gate).
  GET  /healthz        liveness + model/config info (JSON)
  GET  /stats          serving counters (JSON)
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
import wave
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..config import Config
from ..synthesis.streaming import plan_chunks, stream_reverse
from ..synthesis.synthesize import dispatch_mels, materialize_wavs


@dataclass
class _Request:
    mel: np.ndarray
    seed: int
    speaker_id: Optional[int]
    temp: Optional[float]
    done: threading.Event = field(default_factory=threading.Event)
    wav: Optional[np.ndarray] = None
    error: Optional[str] = None


class SynthesisService:
    """Device worker with dynamic micro-batching.

    Two-stage pipeline: the worker thread drains the queue, groups by
    bucketed length, and DISPATCHES each group's jitted reverse without
    blocking on the device (dispatch_mels); a completion thread
    materializes results and wakes the waiters.  Host prep + result
    readback for batch k therefore overlap device compute of batch k+1 —
    on a tunnel- or PCIe-attached chip the transfers are the serving tax,
    and serializing them with compute was measured to cap the serving
    bench at ~60% of what the same device sustains pipelined
    (tools/bench_serving.py, docs/benchmarks.md).

    ``noise='device'`` (default) draws each request's z on device from its
    seed — same per-(mel, seed, temp) determinism, half the upload bytes;
    pass 'host' to reproduce offline-CLI audio bit-for-bit.

    ``pcm16`` (auto-on for the device-noise path) quantizes audio to 16-bit
    PCM ON DEVICE: ``submit`` returns int16 samples (exactly the values the
    WAV layer would have produced from float32) and the result readback —
    the dominant per-batch transfer — halves."""

    def __init__(self, params, cfg: Config, *, max_batch: int = 16,
                 batch_window_ms: float = 10.0, bucket_frames: int = 60,
                 noise: str = "device", pcm16: Optional[bool] = None,
                 max_frames: int = 4000, mesh=None,
                 max_dispatch_rows: int = 32):
        self.params = params
        self.cfg = cfg
        self._data_sharding = None
        self._batch_multiple = 1
        if mesh is not None:
            # Batch-parallel serving over a jax.sharding.Mesh: params are
            # placed once (replicated, big cond convs TP-sharded) and every
            # micro-batch lands sharded over the data axis — the SAME
            # jitted reverse then runs SPMD (parallel/mesh.py, and
            # tests/test_parallel.py::test_sharded_reverse_matches_single_
            # device for the numerics).  Batch rows are rounded up to the
            # data extent so every device gets whole rows.
            import jax
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import param_sharding
            mesh_cfg = cfg.mesh
            self.params = jax.device_put(
                params, param_sharding(params, mesh, mesh_cfg))
            self._data_sharding = NamedSharding(
                mesh, PartitionSpec(mesh_cfg.data_axis))
            self._replicated = NamedSharding(mesh, PartitionSpec())
            self._batch_multiple = mesh.shape[mesh_cfg.data_axis]
        self.mesh = mesh
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        self.bucket_frames = bucket_frames
        self.noise = noise
        if pcm16 is None:                  # auto: on for the device path
            pcm16 = noise == "device"
        elif pcm16 and noise != "device":  # explicit request we can't honor
            raise ValueError("pcm16=True requires noise='device'")
        self.pcm16 = pcm16
        self.max_frames = max_frames
        # Groups larger than this dispatch as consecutive sub-batches:
        # host prep of sub-batch k+1 then overlaps the device compute of
        # sub-batch k (dispatch is non-blocking), instead of one long
        # serial prep stalling the whole group.  Measured motivation:
        # max_batch >= 64 doubled P50 for zero aggregate gain because the
        # single-threaded per-group prep crossed the batch interval
        # (docs/benchmarks.md serving table).  Sub-batches still pad to
        # powers of two, so this REDUCES the set of compiled shapes.
        self.max_dispatch_rows = max(1, max_dispatch_rows)
        self._submit_lock = threading.Lock()
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # small bound = backpressure: a bounded number of
        # dispatched-but-unread groups in flight so HBM holds a bounded
        # number of result buffers.  One full drain can emit
        # ceil(max_batch / max_dispatch_rows) sub-groups at once — hold
        # one whole drain PLUS one so the dispatch thread never blocks
        # while the device is idle between drains (measured: at the fixed
        # bound of 2, split-b64 spent 96% of wall blocked handing off and
        # aggregate fell below b32's).
        per_drain = -(-max_batch // self.max_dispatch_rows)
        self._done_q: "queue.Queue" = queue.Queue(maxsize=per_drain + 1)
        self._stop = threading.Event()
        self._inflight: list = []
        self.stats = {"requests": 0, "batches": 0, "streams": 0,
                      "dispatches": 0, "max_dispatch_rows_seen": 0,
                      "audio_seconds": 0.0, "busy_seconds": 0.0,
                      "backpressure_seconds": 0.0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._completer = threading.Thread(target=self._complete,
                                           daemon=True)
        self._completer.start()

    def submit(self, mel: np.ndarray, seed: int = 0,
               speaker_id: Optional[int] = None,
               temp: Optional[float] = None,
               timeout: float = 300.0) -> np.ndarray:
        if mel.ndim != 2 or mel.shape[1] != self.cfg.audio.num_mels:
            raise ValueError(
                f"mel must be [T, {self.cfg.audio.num_mels}], got {mel.shape}")
        if mel.shape[0] > self.max_frames:
            # an unbounded length would compile a fresh flagship shape
            # (minutes) and hold every companion hostage; long-form audio
            # belongs on the streaming path (synthesis/streaming.py)
            raise ValueError(
                f"mel too long: {mel.shape[0]} > max_frames="
                f"{self.max_frames}; use streaming synthesis "
                "(POST /synthesize_stream) for long-form audio")
        req = _Request(np.asarray(mel, np.float32), seed, speaker_id, temp)
        with self._submit_lock:  # pairs with close(): no put after stop
            if self._stop.is_set():
                raise RuntimeError("service closed")
            self._q.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.wav

    def stream(self, mel: np.ndarray, seed: int = 0,
               speaker_id: Optional[int] = None,
               temp: Optional[float] = None,
               chunk_frames: Optional[int] = None):
        """Streaming synthesis of ONE mel of any length: returns
        ``(n_samples, chunks)`` where ``n_samples`` is the exact total
        sample count (known upfront from the chunk plan, so an HTTP
        response can carry a correct Content-Length) and ``chunks``
        yields 16-bit little-endian PCM byte blocks left to right.

        Runs on the caller's thread: each window is its own jitted
        dispatch (synthesis/streaming.py), so windows interleave at the
        device queue with the worker's micro-batches instead of blocking
        them for the whole utterance.  Speaker default matches
        ``submit``: gin models fall back to speaker 0."""
        if mel.ndim != 2 or mel.shape[1] != self.cfg.audio.num_mels:
            raise ValueError(
                f"mel must be [T, {self.cfg.audio.num_mels}], got {mel.shape}")
        if self._stop.is_set():
            raise RuntimeError("service closed")
        if self.cfg.model.gin_channels > 0 and speaker_id is None:
            speaker_id = 0
        plan = plan_chunks(self.cfg, mel.shape[0], chunk_frames)
        n_samples = plan.total_frames * self.cfg.audio.hop_size

        put = None
        if self.mesh is not None:
            # params live on the mesh: replicate the batch-1 windows there
            import jax
            put = lambda a: jax.device_put(a, self._replicated)  # noqa: E731

        def chunks():
            self.stats["streams"] += 1
            t0 = time.time()
            for _, audio in stream_reverse(
                    self.params, self.cfg, mel, seed=seed, temp=temp,
                    chunk_frames=chunk_frames, speaker_id=speaker_id,
                    put=put):
                if self._stop.is_set():
                    raise RuntimeError("service closed")
                yield _pcm16(audio).tobytes()
            self.stats["audio_seconds"] += (
                n_samples / self.cfg.audio.sample_rate)
            self.stats["busy_seconds"] += time.time() - t0

        return n_samples, chunks()

    def _bucket_key(self, mel: np.ndarray) -> int:
        """Padded frame count this mel will synthesize at (the group key).
        Delegates to synthesize.padded_frames so the grouping key and the
        shape synthesize_mels actually pads to cannot drift apart."""
        from ..synthesis.synthesize import _usable_frames, padded_frames
        return padded_frames(_usable_frames(mel.shape[0], self.cfg),
                             self.cfg, self.bucket_frames)

    def _drain(self) -> list[_Request]:
        """Next micro-batch; [] when woken by close() with nothing queued
        (so _run can re-check _stop instead of blocking forever)."""
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                continue
        else:
            return []
        batch = [first]
        deadline = time.time() + self.batch_window
        while len(batch) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                batch = self._drain()
            except Exception:
                continue
            if not batch:
                continue
            self._inflight = batch  # close() fails these if we outlive it
            t0 = time.time()
            bp0 = self.stats["backpressure_seconds"]
            # Group by bucketed length: within a group the padded length is
            # the group key itself, and dispatch_mels draws each item's
            # noise from its OWN seed at that length — so a request's audio
            # is bit-identical no matter which companions it batches with.
            groups: dict[int, list[_Request]] = {}
            for r in batch:
                groups.setdefault(self._bucket_key(r.mel), []).append(r)
            use_sid = (self.cfg.model.gin_channels > 0)
            split = self.max_dispatch_rows
            for whole in groups.values():
                subgroups = [whole[i: i + split]
                             for i in range(0, len(whole), split)]
                for group in subgroups:
                    self._dispatch_group(group, use_sid)
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            blocked = self.stats["backpressure_seconds"] - bp0
            self.stats["busy_seconds"] += time.time() - t0 - blocked
            self._inflight = []

    def _dispatch_group(self, group: list, use_sid: bool) -> None:
        self.stats["dispatches"] += 1
        self.stats["max_dispatch_rows_seen"] = max(
            self.stats["max_dispatch_rows_seen"], len(group))
        try:
            sids = [r.speaker_id if r.speaker_id is not None else 0
                    for r in group]
            wav, frames = dispatch_mels(
                self.params, self.cfg, [r.mel for r in group],
                seed=[r.seed for r in group],
                speaker_ids=sids if use_sid else None,
                temp=[r.temp for r in group],
                bucket_frames=self.bucket_frames,
                # batch sizes fluctuate with load: bucket them to
                # powers of two so a new group size never
                # recompiles the reverse (see synthesize_mels)
                pad_batch=True,
                noise=self.noise, pcm16=self.pcm16,
                data_sharding=self._data_sharding,
                batch_multiple=self._batch_multiple)
            # hand the un-materialized result to the completion
            # thread; blocks only when a full drain's worth of groups
            # plus one are already in flight (backpressure).  The block
            # is readback-bound
            # waiting, not host work — account it separately so
            # busy_seconds measures actual prep+dispatch cost.
            tq = time.time()
            self._done_q.put((group, wav, frames))
            self.stats["backpressure_seconds"] += time.time() - tq
        except Exception as e:  # surface errors to every waiter
            for r in group:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()

    def _complete(self) -> None:
        while True:
            item = self._done_q.get()
            if item is None:
                return
            group, wav, frames = item
            try:
                wavs = materialize_wavs(wav, frames, self.cfg)
                for r, w in zip(group, wavs):
                    r.wav = w
                self.stats["audio_seconds"] += sum(
                    len(w) / self.cfg.audio.sample_rate for w in wavs)
            except Exception as e:
                for r in group:
                    r.error = f"{type(e).__name__}: {e}"
            for r in group:
                r.done.set()

    def _fail_pending(self) -> None:
        """Error out every request still in the submit queue."""
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                return
            r.error = "service closed"
            r.done.set()

    def close(self) -> None:
        """Orderly shutdown: no new submits, the in-flight batch finishes
        and its waiters are woken, queued-but-undispatched requests fail
        immediately (they would otherwise sit out their submit timeout).

        Sequence matters: the submit lock closes the submit/stop race;
        the worker is JOINED before the completer's sentinel so any group
        it dispatched is still materialized; pending requests are failed
        last, when nothing can requeue.  Idempotent.

        The worker join is generous (a first-request flagship dispatch
        can sit in a minutes-long compile) but bounded: if the worker
        outlives it (wedged device), its in-flight requests are failed
        NOW instead of sitting out their full submit timeout, and the
        completer is left running (daemon) so a late-arriving result is
        still consumed rather than deadlocking the worker on the bounded
        done queue."""
        with self._submit_lock:
            self._stop.set()
        self._worker.join(timeout=600)
        if self._worker.is_alive():
            for r in self._inflight:
                if not r.done.is_set():
                    r.error = "service closed during dispatch"
                    r.done.set()
        else:
            self._done_q.put(None)
            self._completer.join(timeout=60)
        self._fail_pending()


def _pcm16(audio: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> little-endian int16, the same quantization the
    device pcm16 path applies (synthesize.py)."""
    if audio.dtype == np.int16:  # already PCM-quantized on device
        return audio.astype("<i2", copy=False)
    return np.clip(np.rint(audio * 32768.0), -32768, 32767).astype("<i2")


def _wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(_pcm16(audio).tobytes())
    return buf.getvalue()


def _wav_header(n_samples: int, sample_rate: int) -> bytes:
    """The canonical 44-byte mono 16-bit RIFF header for a known-length
    stream — byte-identical to what the wave module emits, but writable
    BEFORE the audio exists (progressive responses)."""
    import struct
    data = n_samples * 2
    return (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data))


def make_handler(service: SynthesisService):
    cfg = service.cfg

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "model": f"{cfg.model.n_block}x{cfg.model.n_flow}",
                    "sample_rate": cfg.audio.sample_rate,
                    "num_mels": cfg.audio.num_mels,
                    "data_parallel": service._batch_multiple,
                })
            elif self.path == "/stats":
                self._json(200, service.stats)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/synthesize", "/synthesize_stream"):
                self._json(404, {"error": "unknown path"})
                return
            if self.path == "/synthesize_stream":
                self._stream()
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                mel = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
                seed = int(self.headers.get("X-Seed", "0"))
                sid = self.headers.get("X-Speaker-Id")
                temp = self.headers.get("X-Temp")
                if (mel.ndim == 2 and mel.shape[0] > service.max_frames):
                    # Long-form request on the one-shot endpoint: route it
                    # through the server's OWN streaming path instead of
                    # bouncing the client (an unbounded one-shot length
                    # would compile a fresh flagship shape and hold every
                    # batch companion hostage).  Same response contract —
                    # a complete audio/wav body with exact Content-Length
                    # — the bytes just go out progressively.
                    self._stream_response(
                        mel, seed=seed,
                        speaker_id=int(sid) if sid is not None else None,
                        temp=float(temp) if temp is not None else None,
                        chunk_frames=None)
                    return
                wav = service.submit(
                    mel, seed=seed,
                    speaker_id=int(sid) if sid is not None else None,
                    temp=float(temp) if temp is not None else None)
            except (ValueError, KeyError) as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            body = _wav_bytes(wav, cfg.audio.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream(self):
            """Progressive WAV: validation and chunk planning happen
            BEFORE headers go out (errors still get proper statuses);
            after that every synthesized window is flushed to the socket
            immediately, so the client hears audio after one window.  A
            mid-stream failure can only truncate the body (the client
            sees fewer bytes than Content-Length), never corrupt it."""
            try:
                length = int(self.headers.get("Content-Length", "0"))
                mel = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
                seed = int(self.headers.get("X-Seed", "0"))
                sid = self.headers.get("X-Speaker-Id")
                temp = self.headers.get("X-Temp")
                chunk = self.headers.get("X-Chunk-Frames")
                self._stream_response(
                    mel, seed=seed,
                    speaker_id=int(sid) if sid is not None else None,
                    temp=float(temp) if temp is not None else None,
                    chunk_frames=int(chunk) if chunk is not None else None)
            except (ValueError, KeyError) as e:
                self._json(400, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _stream_response(self, mel, *, seed, speaker_id, temp,
                             chunk_frames):
            """Plan + validate (raising into the caller's error handling,
            so failures still get proper statuses), then write a
            progressive WAV with exact Content-Length."""
            n_samples, chunks = service.stream(
                mel, seed=seed, speaker_id=speaker_id, temp=temp,
                chunk_frames=chunk_frames)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + 2 * n_samples))
            self.end_headers()
            self.wfile.write(_wav_header(n_samples, cfg.audio.sample_rate))
            try:
                for block in chunks:
                    self.wfile.write(block)
                    self.wfile.flush()
            except Exception:
                # headers are already on the wire: closing short is the
                # only honest signal left
                self.close_connection = True

    return Handler


def serve(params, cfg: Config, host: str = "127.0.0.1", port: int = 8800,
          **service_kw) -> ThreadingHTTPServer:
    """Start the server (returns it; call .serve_forever() or shutdown())."""
    service = SynthesisService(params, cfg, **service_kw)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service  # type: ignore[attr-defined]
    return httpd


def main(argv=None):
    import argparse

    from ..config import get_config
    from ..synthesis.synthesize import load_params

    p = argparse.ArgumentParser(description="FloWaveNet-TPU serving")
    p.add_argument("--saved_dir", default="logs/pretrained/")
    p.add_argument("--config", default="lj22k")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_window_ms", type=float, default=10.0)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard each micro-batch over this many devices "
                        "(0 = single device; -1 = all local devices)")
    args = p.parse_args(argv)

    cfg = get_config(args.config)
    params, step = load_params(args.saved_dir, cfg)
    mesh = None
    if args.data_parallel:
        import dataclasses

        import jax

        from ..parallel.mesh import make_mesh
        devs = jax.devices()
        n = len(devs) if args.data_parallel < 0 else args.data_parallel
        mesh = make_mesh(dataclasses.replace(cfg.mesh, data_parallel=n),
                         devices=devs[:n])
    httpd = serve(params, cfg, args.host, args.port,
                  max_batch=args.max_batch,
                  batch_window_ms=args.batch_window_ms, mesh=mesh)
    print(f"serving step-{step} model on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
