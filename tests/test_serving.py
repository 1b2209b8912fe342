"""Serving layer tests: HTTP round trip, micro-batching, error paths."""

import http.client
import io
import threading

import jax
import numpy as np
import pytest

from flowavenet_tpu.config import tiny
from flowavenet_tpu.models.flowavenet import init_flowavenet
from flowavenet_tpu.serving.server import SynthesisService, serve

CFG = tiny()


@pytest.fixture(scope="module")
def server():
    params = init_flowavenet(jax.random.PRNGKey(0), CFG.model)
    httpd = serve(params, CFG, host="127.0.0.1", port=0,
                  max_batch=4, batch_window_ms=30.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.shutdown()


def _conn(httpd):
    return http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                      timeout=120)


def _mel_bytes(frames=8, seed=0):
    rng = np.random.RandomState(seed)
    mel = rng.rand(frames, CFG.model.num_mels).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, mel)
    return buf.getvalue()


def test_healthz(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200
    import json
    info = json.loads(r.read())
    assert info["status"] == "ok" and info["sample_rate"] == 22050


def test_synthesize_roundtrip(server):
    c = _conn(server)
    body = _mel_bytes(frames=8)
    c.request("POST", "/synthesize", body=body,
              headers={"Content-Length": str(len(body)), "X-Seed": "7"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    data = r.read()
    import wave
    w = wave.open(io.BytesIO(data))
    assert w.getframerate() == 22050
    assert w.getnframes() == 8 * CFG.audio.hop_size


def test_concurrent_requests_micro_batch(server):
    """Concurrent requests are served correctly (and batched)."""
    results = {}

    def call(i):
        c = _conn(server)
        body = _mel_bytes(frames=8, seed=i)
        c.request("POST", "/synthesize", body=body,
                  headers={"Content-Length": str(len(body))})
        r = c.getresponse()
        results[i] = (r.status, len(r.read()))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 for s, _ in results.values())
    stats = server.service.stats
    assert stats["requests"] >= 4
    # micro-batching fired: fewer batches than requests
    assert stats["batches"] <= stats["requests"]


def test_bad_mel_rejected(server):
    c = _conn(server)
    rng = np.random.RandomState(0)
    bad = rng.rand(8, 3).astype(np.float32)  # wrong mel bins
    buf = io.BytesIO(); np.save(buf, bad)
    body = buf.getvalue()
    c.request("POST", "/synthesize", body=body,
              headers={"Content-Length": str(len(body))})
    r = c.getresponse()
    assert r.status == 400
    assert b"mel must be" in r.read()


def test_unknown_path(server):
    c = _conn(server)
    c.request("GET", "/nope")
    assert c.getresponse().status == 404


def test_per_request_seed_and_temp(server):
    """X-Seed / X-Temp are honored per request even when micro-batched:
    different seeds give different audio; the same (mel, seed, temp) is
    bit-identical no matter which companions share the batch."""
    body = _mel_bytes(frames=8, seed=42)

    def call(seed, temp, out, key):
        c = _conn(server)
        headers = {"Content-Length": str(len(body)), "X-Seed": str(seed)}
        if temp is not None:
            headers["X-Temp"] = str(temp)
        c.request("POST", "/synthesize", body=body, headers=headers)
        r = c.getresponse()
        assert r.status == 200
        out[key] = r.read()

    # round 1: seeds 1, 2, 2(temp=0.1) fired concurrently (one micro-batch)
    out1 = {}
    threads = [
        threading.Thread(target=call, args=(1, None, out1, "s1")),
        threading.Thread(target=call, args=(2, None, out1, "s2")),
        threading.Thread(target=call, args=(2, 0.1, out1, "s2cold")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert out1["s1"] != out1["s2"], "different seeds must differ"
    assert out1["s2"] != out1["s2cold"], "different temps must differ"

    # round 2: same three requests behind a different companion set
    out2 = {}
    threads = [
        threading.Thread(target=call, args=(9, None, out2, "other")),
        threading.Thread(target=call, args=(1, None, out2, "s1")),
        threading.Thread(target=call, args=(2, None, out2, "s2")),
        threading.Thread(target=call, args=(2, 0.1, out2, "s2cold")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for k in ("s1", "s2", "s2cold"):
        assert out1[k] == out2[k], \
            f"{k}: same (mel, seed, temp) must be batch-composition-invariant"


def test_pad_batch_buckets_compiles_and_is_value_neutral():
    """pad_batch=True buckets the BATCH dim to powers of two: group sizes
    3 and 4 share one compiled program (sizes fluctuate under load and the
    flagship reverse costs minutes per compile), and the zero pad rows do
    not change any real item's audio vs the unpadded call."""
    from flowavenet_tpu.synthesis.synthesize import (_jitted_reverse,
                                                     resolve_compute_dtype,
                                                     synthesize_mels)

    params = init_flowavenet(jax.random.PRNGKey(3), CFG.model)
    rng = np.random.RandomState(7)
    mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
            for _ in range(4)]
    fn = _jitted_reverse(CFG.model, resolve_compute_dtype(CFG, None))
    base = fn._cache_size()

    w3 = synthesize_mels(params, CFG, mels[:3], seed=[0, 1, 2],
                         pad_batch=True)
    after3 = fn._cache_size()
    assert after3 <= base + 1  # batch-4 shape may already be cached
    w4 = synthesize_mels(params, CFG, mels, seed=[0, 1, 2, 3],
                         pad_batch=True)
    assert fn._cache_size() == after3, \
        "group sizes 3 and 4 must share the padded-to-4 compiled shape"

    # same padded shape -> bit-identical regardless of real group size
    for a, b in zip(w3, w4[:3]):
        np.testing.assert_array_equal(a, b)
    # vs the unpadded batch-3 shape: numerically the same audio (a
    # different compiled shape may reassociate reductions, so not bitwise)
    ref = synthesize_mels(params, CFG, mels[:3], seed=[0, 1, 2])
    for a, b in zip(w3, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_device_noise_deterministic_and_distinct():
    """noise='device' (the serving default): same (mel, seed, temp) is
    bit-identical across different batch compositions; different seeds
    differ; and the stream is NOT the host RandomState one (callers who
    need CLI-identical audio pass noise='host')."""
    from flowavenet_tpu.synthesis.synthesize import synthesize_mels

    params = init_flowavenet(jax.random.PRNGKey(4), CFG.model)
    rng = np.random.RandomState(11)
    mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
            for _ in range(3)]
    a = synthesize_mels(params, CFG, mels[:2], seed=[5, 6], pad_batch=True,
                        noise="device")
    b = synthesize_mels(params, CFG, [mels[2], mels[0], mels[1]],
                        seed=[9, 5, 6], pad_batch=True, noise="device")
    np.testing.assert_array_equal(a[0], b[1])
    np.testing.assert_array_equal(a[1], b[2])
    assert not np.array_equal(a[0], a[1])
    host = synthesize_mels(params, CFG, mels[:1], seed=[5], pad_batch=True,
                           noise="host")
    assert not np.array_equal(a[0], host[0])
    with pytest.raises(ValueError, match="noise"):
        synthesize_mels(params, CFG, mels[:1], noise="nope")


def test_pcm16_on_device_matches_host_quantization():
    """pcm16=True returns the SAME int16 samples the WAV layer would have
    produced from the float32 result (round-half-even then clip), so
    halving the readback bytes changes nothing the client receives."""
    from flowavenet_tpu.serving.server import _wav_bytes
    from flowavenet_tpu.synthesis.synthesize import synthesize_mels

    params = init_flowavenet(jax.random.PRNGKey(5), CFG.model)
    rng = np.random.RandomState(13)
    mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
            for _ in range(2)]
    f32 = synthesize_mels(params, CFG, mels, seed=[1, 2], pad_batch=True,
                          noise="device")
    i16 = synthesize_mels(params, CFG, mels, seed=[1, 2], pad_batch=True,
                          noise="device", pcm16=True)
    sr = CFG.audio.sample_rate
    for a, b in zip(f32, i16):
        assert b.dtype == np.int16
        assert _wav_bytes(a, sr) == _wav_bytes(b, sr)
    with pytest.raises(ValueError, match="pcm16"):
        synthesize_mels(params, CFG, mels, pcm16=True)  # host noise


def test_service_direct_api():
    params = init_flowavenet(jax.random.PRNGKey(1), CFG.model)
    svc = SynthesisService(params, CFG, max_batch=2, batch_window_ms=5.0)
    rng = np.random.RandomState(0)
    wav = svc.submit(rng.rand(8, CFG.model.num_mels).astype(np.float32))
    assert wav.shape == (8 * CFG.audio.hop_size,)
    assert np.all(np.isfinite(wav))
    with pytest.raises(ValueError, match="mel must be"):
        svc.submit(rng.rand(8, 3).astype(np.float32))
    svc.close()


def test_close_rejects_and_fails_fast():
    """After close(): new submits raise immediately and queued-but-never-
    dispatched requests error out instead of sitting out their timeout."""
    params = init_flowavenet(jax.random.PRNGKey(6), CFG.model)
    svc = SynthesisService(params, CFG, max_batch=2, batch_window_ms=5.0)
    mel = np.random.RandomState(2).rand(8, CFG.model.num_mels).astype(
        np.float32)
    svc.submit(mel)  # healthy request first
    with pytest.raises(ValueError, match="mel too long"):
        svc.submit(np.zeros((svc.max_frames + 1, CFG.model.num_mels),
                            np.float32))
    svc.close()
    with pytest.raises(RuntimeError, match="service closed"):
        svc.submit(mel)
    # queued-but-undispatched requests are failed, not timed out: with the
    # worker joined, plant a request directly and re-close (idempotent)
    from flowavenet_tpu.serving.server import _Request
    ghost = _Request(mel, 0, None, None)
    svc._q.put(ghost)
    svc.close()
    assert ghost.done.is_set() and ghost.error == "service closed"


def test_service_steady_state_no_retrace():
    """Single-stream serving: after the first request compiles the bucket,
    repeat requests of the SAME shape must hit the jit cache.  Asserted on
    the jitted reverse's compile-cache size — deterministic on loaded CI
    machines, and catches a per-request retrace even when the persistent
    compile cache would make the recompile cheap (a wall-clock bound would
    miss that)."""
    from flowavenet_tpu.synthesis.synthesize import (_jitted_reverse,
                                                     resolve_compute_dtype)

    params = init_flowavenet(jax.random.PRNGKey(2), CFG.model)
    svc = SynthesisService(params, CFG, max_batch=1, batch_window_ms=1.0)
    rng = np.random.RandomState(1)
    mel = rng.rand(8, CFG.model.num_mels).astype(np.float32)

    svc.submit(mel, seed=0)  # cold: compiles this bucket once
    fn = _jitted_reverse(CFG.model, resolve_compute_dtype(CFG, None))
    warm_cache = fn._cache_size()
    assert warm_cache >= 1

    for i in range(7):
        svc.submit(mel, seed=i + 1)
    assert fn._cache_size() == warm_cache, \
        "same-shape requests must not retrace/recompile the reverse"
    svc.close()


def test_synthesize_stream_roundtrip(server):
    """POST /synthesize_stream: any-length mels stream back as a
    progressive WAV that is byte-identical to _wav_bytes(
    synthesize_streaming(...)) at the same (seed, temp) — the correct
    Content-Length is on the wire before any audio is synthesized."""
    from flowavenet_tpu.serving.server import _wav_bytes
    from flowavenet_tpu.synthesis.streaming import synthesize_streaming

    rng = np.random.RandomState(21)
    frames = 64  # multiple windows under the tiny config's chunk plan
    mel = rng.rand(frames, CFG.model.num_mels).astype(np.float32)
    buf = io.BytesIO(); np.save(buf, mel)
    body = buf.getvalue()

    c = _conn(server)
    c.request("POST", "/synthesize_stream", body=body,
              headers={"Content-Length": str(len(body)), "X-Seed": "5",
                       "X-Temp": "0.7"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    data = r.read()
    assert len(data) == int(r.getheader("Content-Length"))
    assert len(data) == 44 + 2 * frames * CFG.audio.hop_size

    ref = synthesize_streaming(server.service.params, CFG, mel,
                               seed=5, temp=0.7)
    assert data == _wav_bytes(ref, CFG.audio.sample_rate)
    assert server.service.stats["streams"] >= 1


def test_synthesize_stream_rejects_before_headers(server):
    """Validation failures on the streaming path must still produce a
    proper 400 (errors are only unreportable AFTER headers go out)."""
    rng = np.random.RandomState(0)
    bad = rng.rand(8, 3).astype(np.float32)  # wrong mel bins
    buf = io.BytesIO(); np.save(buf, bad)
    body = buf.getvalue()
    c = _conn(server)
    c.request("POST", "/synthesize_stream", body=body,
              headers={"Content-Length": str(len(body))})
    r = c.getresponse()
    assert r.status == 400
    assert b"mel must be" in r.read()

    c = _conn(server)
    buf = io.BytesIO(); np.save(buf, _np_mel_8())
    body = buf.getvalue()
    c.request("POST", "/synthesize_stream", body=body,
              headers={"Content-Length": str(len(body)),
                       "X-Chunk-Frames": "-3"})
    r = c.getresponse()
    assert r.status == 400
    assert b"chunk_frames" in r.read()


def _np_mel_8():
    return np.random.RandomState(3).rand(
        8, CFG.model.num_mels).astype(np.float32)


def test_service_stream_direct_api():
    """SynthesisService.stream(): exact sample count upfront, PCM chunks
    concatenate to the quantized synthesize_streaming audio, and the
    closed service refuses new streams."""
    from flowavenet_tpu.serving.server import _pcm16
    from flowavenet_tpu.synthesis.streaming import synthesize_streaming

    params = init_flowavenet(jax.random.PRNGKey(8), CFG.model)
    svc = SynthesisService(params, CFG, max_batch=2, batch_window_ms=5.0)
    rng = np.random.RandomState(23)
    mel = rng.rand(64, CFG.model.num_mels).astype(np.float32)
    n, chunks = svc.stream(mel, seed=3)
    pcm = b"".join(chunks)
    assert n == 64 * CFG.audio.hop_size and len(pcm) == 2 * n
    ref = synthesize_streaming(params, CFG, mel, seed=3)
    assert pcm == _pcm16(ref).tobytes()
    with pytest.raises(ValueError, match="mel must be"):
        svc.stream(rng.rand(8, 3).astype(np.float32))
    svc.close()
    with pytest.raises(RuntimeError, match="service closed"):
        svc.stream(mel)


def test_mesh_service_matches_single_device():
    """Batch-parallel serving: a SynthesisService given an 8-device data
    mesh shards every micro-batch over the devices (params placed once,
    same jitted reverse partitioned by GSPMD) and returns the same audio
    as the single-device service — within compiled-partitioning numerics
    (test_parallel pins float audio to rtol 2e-4, which is <= ~7 LSB
    after 16-bit PCM quantization)."""
    import dataclasses

    from flowavenet_tpu.parallel.mesh import make_mesh

    params = init_flowavenet(jax.random.PRNGKey(9), CFG.model)
    mesh = make_mesh(dataclasses.replace(CFG.mesh, data_parallel=8))
    svc1 = SynthesisService(params, CFG, max_batch=4, batch_window_ms=5.0)
    svc8 = SynthesisService(params, CFG, max_batch=4, batch_window_ms=5.0,
                            mesh=mesh)
    try:
        rng = np.random.RandomState(31)
        mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
                for _ in range(3)]
        for i, mel in enumerate(mels):
            a = svc1.submit(mel, seed=i).astype(np.int32)
            b = svc8.submit(mel, seed=i).astype(np.int32)
            assert a.shape == b.shape
            assert np.abs(a - b).max() <= 16

        # streaming under the mesh: windows replicate onto the mesh and
        # the chunked PCM still matches the single-device stream
        long_mel = rng.rand(64, CFG.model.num_mels).astype(np.float32)
        n1, c1 = svc1.stream(long_mel, seed=5)
        n8, c8 = svc8.stream(long_mel, seed=5)
        assert n1 == n8
        p1 = np.frombuffer(b"".join(c1), "<i2").astype(np.int32)
        p8 = np.frombuffer(b"".join(c8), "<i2").astype(np.int32)
        assert np.abs(p1 - p8).max() <= 16
    finally:
        svc1.close()
        svc8.close()


def test_concurrent_streams_and_submits():
    """Thread-safety of the service under mixed load: streaming windows
    dispatch from caller threads while the worker micro-batches one-shot
    submits — all must complete with correct sizes and finite audio."""
    from flowavenet_tpu.synthesis.streaming import plan_chunks

    params = init_flowavenet(jax.random.PRNGKey(12), CFG.model)
    svc = SynthesisService(params, CFG, max_batch=4, batch_window_ms=5.0)
    rng = np.random.RandomState(41)
    hop = CFG.audio.hop_size
    results: dict = {}
    errors: list = []

    # pre-generate inputs: RandomState is not thread-safe
    short_mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
                  for _ in range(4)]
    long_mels = [rng.rand(64, CFG.model.num_mels).astype(np.float32)
                 for _ in range(2)]

    def one_shot(i):
        try:
            results[f"s{i}"] = svc.submit(short_mels[i], seed=i)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(f"submit {i}: {e}")

    def stream(i):
        try:
            n, chunks = svc.stream(long_mels[i], seed=100 + i)
            pcm = b"".join(chunks)
            assert len(pcm) == 2 * n
            results[f"t{i}"] = pcm
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(f"stream {i}: {e}")

    threads = ([threading.Thread(target=one_shot, args=(i,))
                for i in range(4)]
               + [threading.Thread(target=stream, args=(i,))
                  for i in range(2)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(results) == 6
    for i in range(4):
        wav = results[f"s{i}"]
        assert wav.shape == (8 * hop,) and np.all(np.isfinite(wav))
    n_expected = 2 * plan_chunks(CFG, 64).total_frames * hop
    assert all(len(results[f"t{i}"]) == n_expected for i in range(2))
    svc.close()


def test_long_mel_routed_to_stream_server_side():
    """VERDICT r3 item 6: POST /synthesize with a mel longer than
    max_frames must return the complete WAV via the server's OWN
    streaming path (one endpoint for clients), not a 400."""
    params = init_flowavenet(jax.random.PRNGKey(3), CFG.model)
    httpd = serve(params, CFG, host="127.0.0.1", port=0,
                  max_batch=4, batch_window_ms=5.0, max_frames=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        frames = 48  # > max_frames=16 -> server-side stream routing
        body = _mel_bytes(frames=frames, seed=11)
        c = _conn(httpd)
        c.request("POST", "/synthesize", body=body,
                  headers={"Content-Length": str(len(body)),
                           "X-Seed": "5"})
        r = c.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "audio/wav"
        data = r.read()
        import wave
        w = wave.open(io.BytesIO(data))
        # plan_chunks trims to usable (squeeze-aligned) frames
        from flowavenet_tpu.synthesis.streaming import plan_chunks
        plan = plan_chunks(CFG, frames)
        assert w.getnframes() == plan.total_frames * CFG.audio.hop_size
        assert int(r.getheader("Content-Length")) == len(data)
        assert httpd.service.stats["streams"] == 1
        # audio equals the direct streaming path at the same (seed, temp)
        from flowavenet_tpu.synthesis.streaming import synthesize_streaming
        rng = np.random.RandomState(11)
        mel = rng.rand(frames, CFG.model.num_mels).astype(np.float32)
        ref = synthesize_streaming(params, CFG, mel, seed=5)
        got = np.frombuffer(data[44:], "<i2")
        ref16 = np.clip(np.rint(ref * 32768.0), -32768, 32767).astype("<i2")
        np.testing.assert_array_equal(got, ref16)
    finally:
        httpd.shutdown()
        httpd.service.close()


def test_max_dispatch_rows_splits_groups():
    """Large micro-batch groups dispatch as pipelined sub-batches; every
    request's audio must equal the unsplit service's (per-request seeds
    make audio independent of batch composition by construction)."""
    params = init_flowavenet(jax.random.PRNGKey(4), CFG.model)
    svc_split = SynthesisService(params, CFG, max_batch=8,
                                 batch_window_ms=50.0,
                                 max_dispatch_rows=2)
    svc_whole = SynthesisService(params, CFG, max_batch=8,
                                 batch_window_ms=50.0,
                                 max_dispatch_rows=64)
    try:
        rng = np.random.RandomState(0)
        mels = [rng.rand(8, CFG.model.num_mels).astype(np.float32)
                for _ in range(5)]

        def run(svc):
            outs = [None] * len(mels)

            def call(i):
                outs[i] = svc.submit(mels[i], seed=100 + i)
            ts = [threading.Thread(target=call, args=(i,))
                  for i in range(len(mels))]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            return outs

        a, b = run(svc_split), run(svc_whole)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert all(o is not None for o in a)
        # the split service really did split: no dispatched sub-batch may
        # exceed max_dispatch_rows, which for 5 requests forces >= 3
        # dispatches no matter how the drain rounds fell; the unsplit
        # service must have seen at least one group the split one would
        # have had to cut (else this run exercised nothing)
        assert svc_split.stats["max_dispatch_rows_seen"] <= 2
        assert svc_split.stats["dispatches"] >= 3
        assert svc_whole.stats["max_dispatch_rows_seen"] >= 1
    finally:
        svc_split.close()
        svc_whole.close()
