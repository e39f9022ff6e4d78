"""HTTP serving layer: end-to-end requests, micro-batching, error paths."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.server import serve
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.text.tokenizer import VitsTokenizer

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def running_server(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))
    server, worker = serve(model, port=0, batch_window_ms=20.0, max_batch=8)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}", worker
    worker.stop()
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(running_server):
    url, _ = running_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"


def test_synthesize_returns_wav(running_server):
    url, _ = running_server
    with _post(url, {"text": "hello dame"}) as resp:
        assert resp.headers["Content-Type"] == "audio/wav"
        body = resp.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert len(body) > 44


def test_concurrent_requests_batched(running_server):
    url, worker = running_server
    batches_before = worker.stats["batches"]
    results = {}

    def hit(i):
        with _post(url, {"text": f"hello dame {i % 3}"}) as resp:
            results[i] = resp.read()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 6
    assert all(r[:4] == b"RIFF" for r in results.values())
    batches = worker.stats["batches"] - batches_before
    # 6 concurrent requests must share dispatches (fewer batches than requests)
    assert 1 <= batches < 6


def test_missing_text_400(running_server):
    url, _ = running_server
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(url, {"nope": 1})
    assert err.value.code == 400


def test_unknown_route_404(running_server):
    url, _ = running_server
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(url + "/bogus", timeout=30)
    assert err.value.code == 404


def test_mixed_seed_requests_share_batch(running_server):
    """Per-request seeds fold into per-row keys — different seeds must NOT
    split the micro-batch (round-1 behavior: one dispatch per distinct seed)."""
    url, worker = running_server
    before = worker.stats["batches"]
    results = {}

    def hit(i):
        with _post(url, {"text": "hello dame", "seed": i * 13 + 1}) as resp:
            results[i] = resp.read()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 5
    # different seeds -> different audio bytes
    assert len({r for r in results.values()}) > 1
    assert worker.stats["batches"] - before <= 2  # not 5 seed-solo batches


def test_speaking_rate_field_shortens_audio(running_server):
    url, _ = running_server
    with _post(url, {"text": "hello dame sad welsh", "seed": 0}) as resp:
        normal = resp.read()
    with _post(url, {"text": "hello dame sad welsh", "seed": 0,
                     "speaking_rate": 2.0}) as resp:
        fast = resp.read()
    assert len(fast) < len(normal)


def test_bad_control_type_400(running_server):
    url, _ = running_server
    try:
        _post(url, {"text": "hello", "speaking_rate": "not-a-number"})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as err:
        assert err.code == 400


def test_queue_full_returns_429_and_worker_rejects():
    """Bounded queue: submissions beyond max_queue are rejected (429 path)."""
    import time
    import types

    from vits_tpu.engine.server import BatchingWorker, _Request

    class SlowModel:
        def __init__(self):
            self.release = threading.Event()
            self.config = types.SimpleNamespace(sampling_rate=16000)

        def synthesize(self, texts, **kw):
            self.release.wait(20)
            return [np.zeros(16, np.float32) for _ in texts]

    model = SlowModel()
    worker = BatchingWorker(model, batch_window_ms=1.0, max_batch=1, max_queue=2)
    reqs = [_Request(text="a", speaker_id=None, seed=0) for _ in range(4)]
    assert worker.submit(reqs[0])
    time.sleep(0.5)  # worker thread picks req0 and blocks inside synthesize
    assert worker.submit(reqs[1])
    assert worker.submit(reqs[2])
    assert not worker.submit(reqs[3])  # queue (capacity 2) is full
    assert worker.stats["rejected"] == 1
    model.release.set()
    for r in reqs[:3]:
        assert r.done.wait(30)
    worker.stop()


def test_requeue_never_blocks_when_queue_full():
    """Control-mismatched requeue must not block: the worker is the queue's
    only consumer, so a blocking put() under overload wedges the server
    permanently (round-2 review finding)."""
    import time
    import types

    from vits_tpu.engine.server import BatchingWorker, _Request

    model = types.SimpleNamespace(config=types.SimpleNamespace(sampling_rate=16000))
    worker = BatchingWorker(model, batch_window_ms=300.0, max_batch=4, max_queue=2)
    worker.stop()
    worker._thread.join(timeout=5)
    assert not worker._thread.is_alive()

    a = _Request(text="a", speaker_id=None, seed=0)
    b = _Request(text="b", speaker_id=None, seed=0, noise_scale=0.3)
    c = _Request(text="c", speaker_id=None, seed=0, noise_scale=0.5)
    d = _Request(text="d", speaker_id=None, seed=0, noise_scale=0.7)
    worker.queue.put_nowait(a)
    worker.queue.put_nowait(b)

    result = {}

    def run():
        result["batch"] = worker._collect()

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.1)  # _collect has consumed a and b by now, window still open
    for req in (c, d):
        for _ in range(100):
            try:
                worker.queue.put_nowait(req)
                break
            except Exception:
                time.sleep(0.01)
    t.join(timeout=10)
    assert not t.is_alive(), "collect deadlocked on requeue"
    assert [r.text for r in result["batch"]] == ["a"]
    # b, c fit back in the capacity-2 queue; d was dropped with an error
    assert d.done.is_set() and d.error is not None
    assert worker.stats["rejected"] == 1


def _engine(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    return Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))


def test_seed_list_length_validated(tiny_bundle):
    """Engine-level: a seed list not matching the batch raises clearly."""
    model = _engine(tiny_bundle)
    with pytest.raises(ValueError, match="seed list length"):
        model.synthesize_raw(["one", "two"], seed=[1], max_redispatch=0)


def test_seeds_differing_above_bit31_differ(tiny_bundle):
    """64-bit per-row seeds must not alias (old single fold_in truncated
    to int32, so 5 and 2**33+5 produced identical audio)."""
    model = _engine(tiny_bundle)
    lo = model.synthesize_raw("hello", seed=[5], max_redispatch=0)
    hi = model.synthesize_raw("hello", seed=[2**33 + 5], max_redispatch=0)
    n = min(len(lo.waveform[0]), len(hi.waveform[0]))
    assert not np.allclose(lo.waveform[0][:n], hi.waveform[0][:n])


# --------------------------------------------------------------------------- #
# Round-3: HTTP streaming endpoint (chunked-transfer WAV)
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def streaming_server(tiny_bundle):
    from vits_tpu.engine.streaming import StreamingDecoder

    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    model = Synthesizer(
        config, tok, params,
        EngineConfig(token_buckets=(64,), frames_per_token=4.0,
                     transfer_int16=False),
    )
    streamer = StreamingDecoder(model, chunk_frames=16, margin_frames=16)
    server, worker = serve(model, port=0, streamer=streamer)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    yield f"127.0.0.1:{port}", model, worker
    worker.stop()
    server.shutdown()


def _read_stream(hostport, payload, chunk_size=4096):
    """POST /stream and read the chunked body progressively.

    Returns (body bytes, [arrival timestamps per read])."""
    import http.client
    import time

    conn = http.client.HTTPConnection(hostport, timeout=300)
    conn.request(
        "POST", "/stream", body=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "audio/wav"
    body = b""
    stamps = []
    while True:
        piece = resp.read(chunk_size)
        if not piece:
            break
        stamps.append(time.perf_counter())
        body += piece
    conn.close()
    return body, stamps


def test_stream_endpoint_wav_matches_oneshot(streaming_server):
    hostport, model, worker = streaming_server
    text = "hello sad dame well cheese"
    body, stamps = _read_stream(hostport, {"text": text, "seed": 5})

    # streaming WAV header: RIFF/WAVE with 0xFFFFFFFF live-stream sizes
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert body[4:8] == b"\xff\xff\xff\xff"
    import struct

    _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[20:36])
    assert (channels, rate, bits) == (1, model.config.sampling_rate, 16)
    pcm = np.frombuffer(body[44:], dtype="<i2").astype(np.float32) / 32767.0

    oneshot = model.synthesize(text, seed=5)
    assert pcm.shape == oneshot.shape
    np.testing.assert_allclose(pcm, oneshot, atol=1.5 / 32767)
    assert worker.stats["streams"] >= 1


def test_stream_endpoint_delivers_before_completion(streaming_server):
    """The point of /stream: audio bytes arrive while synthesis continues —
    the first chunk lands strictly before the stream finishes."""
    hostport, model, _ = streaming_server
    body, stamps = _read_stream(
        hostport, {"text": "hello sad dame well cheese as my cheese", "seed": 1},
        chunk_size=1024,
    )
    assert len(stamps) >= 3  # header + multiple PCM chunks
    assert stamps[0] < stamps[-1]  # first audio strictly precedes completion
    assert len(body) > 44


def test_stream_endpoint_validates(streaming_server):
    hostport, _, _ = streaming_server
    import http.client

    conn = http.client.HTTPConnection(hostport, timeout=60)
    conn.request("POST", "/stream", body=b"{}",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.close()


def test_keepalive_survives_404_with_body(running_server):
    """HTTP/1.1 keep-alive: an early-return response (404) must drain the
    POST body, or the leftover bytes get parsed as the NEXT request line."""
    import http.client

    url, _ = running_server
    conn = http.client.HTTPConnection(url.split("//")[1], timeout=120)
    body = json.dumps({"text": "hello dame"})
    hdrs = {"Content-Type": "application/json"}
    try:
        conn.request("POST", "/nope", body=body, headers=hdrs)
        r1 = conn.getresponse()
        r1.read()
        assert r1.status == 404
        # Same socket: this request must parse cleanly after the 404.
        conn.request("POST", "/synthesize", body=body, headers=hdrs)
        r2 = conn.getresponse()
        data = r2.read()
        assert r2.status == 200
        assert data[:4] == b"RIFF"
    finally:
        conn.close()


def test_convert_endpoint_roundtrip(running_server, tiny_bundle):
    """POST /convert: WAV in -> converted WAV out, deterministic by default."""
    import io

    from vits_tpu.utils.wav import read_wav, write_wav

    url, worker = running_server
    config, _ = tiny_bundle
    hop = config.total_upsample
    audio = np.sin(np.linspace(0, 40 * np.pi, 11 * hop)).astype(np.float32) * 0.3
    buf = io.BytesIO()
    write_wav(buf, audio, config.sampling_rate)
    body = buf.getvalue()

    def post(path):
        req = urllib.request.Request(
            url + path, data=body, headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"
            return resp.read()

    out1 = post("/convert?seed=0")
    out2 = post("/convert")
    assert out1[:4] == b"RIFF" and out1 == out2  # noise_scale=0 default
    got, rate = read_wav(out1)
    assert rate == config.sampling_rate and len(got) == 11 * hop
    assert worker.stats["conversions"] >= 2


def test_convert_endpoint_rejects_bad_input(running_server, tiny_bundle):
    import io

    from vits_tpu.utils.wav import write_wav

    url, _ = running_server
    config, _ = tiny_bundle

    # garbage body
    req = urllib.request.Request(
        url + "/convert", data=b"not a wav", headers={"Content-Type": "audio/wav"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400

    # wrong sample rate
    buf = io.BytesIO()
    write_wav(buf, np.zeros(1024, np.float32), config.sampling_rate * 2)
    req = urllib.request.Request(
        url + "/convert", data=buf.getvalue(), headers={"Content-Type": "audio/wav"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_metrics_endpoint(running_server):
    """/metrics: Prometheus text format, counters consistent with traffic,
    synthesize-latency histogram cumulative and totaled."""
    url, worker = running_server
    # ensure at least one completed request has been observed
    with _post(url, {"text": "hello dame"}) as resp:
        resp.read()
    with urllib.request.urlopen(url + "/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()

    lines = dict(
        line.split(" ", 1) for line in text.splitlines()
        if line and not line.startswith("#") and "{" not in line
    )
    assert float(lines["vits_requests_total"]) == worker.stats["requests"]
    assert float(lines["vits_batches_total"]) == worker.stats["batches"]
    assert float(lines["vits_audio_seconds_total"]) > 0
    assert "vits_queue_depth" in lines
    # engine stats surface as gauges
    assert "vits_engine_dispatches" in lines
    assert float(lines["vits_engine_dispatches"]) >= 1

    # histogram: buckets cumulative, +Inf bucket == _count >= 1
    buckets = []
    for line in text.splitlines():
        if line.startswith('vits_synthesize_latency_seconds_bucket'):
            buckets.append(float(line.rsplit(" ", 1)[1]))
    assert buckets == sorted(buckets), buckets
    count = float(lines["vits_synthesize_latency_seconds_count"])
    assert buckets[-1] == count and count >= 1
    assert float(lines["vits_synthesize_latency_seconds_sum"]) > 0
