"""HTTP serving demo (ast_tpu/cli/serve.py) over exported artifacts.

Pins: a decode request against the running server returns exactly the
in-process decoder's text; beam mode reranks; malformed bodies get 400.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import threading
import urllib.request

import numpy as np

from conftest import make_tiny_experiment

from ast_tpu.cli import export_model, serve


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_decodes_over_http(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--beam", "2,2", "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/manifest") as r:
            manifest = json.loads(r.read())
        assert manifest["dec_key"] == "en_w"

        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60]

        status, got = _post(base + "/decode",
                            {"features": x.tolist(), "mode": "greedy"})
        assert status == 200
        assert got["text"] == state.decode(
            {"features": x.tolist(), "mode": "greedy"})["text"]
        # server text == detok of the raw ids it returned
        assert got["text"] == serve._detok(
            got["ids"], state.vocab, "en_w")

        status, beam = _post(base + "/decode",
                             {"features": x.tolist(), "mode": "beam",
                              "w": 0.6, "nbest": 2})
        assert status == 200 and beam["mode"] == "beam"
        assert beam["artifact"].startswith("beam_")
        # beam responses carry the winning length-normalized score and
        # the requested reranked n-best list (descending scores, entry
        # 0 == the winner)
        assert isinstance(beam["score"], float)
        nbest = beam["nbest"]
        assert len(nbest) == 2
        assert nbest[0]["ids"] == beam["ids"]
        assert nbest[0]["text"] == beam["text"]
        assert nbest[0]["score"] == beam["score"] >= nbest[1]["score"]
        assert serve._detok(nbest[1]["ids"], state.vocab, "en_w") \
            == nbest[1]["text"]
        # 'ids' means the same thing in every mode: transcript words
        # only — no GO prefix, no EOS terminator (beam hyps carry both
        # internally; greedy cuts at its first EOS)
        syms = manifest["symbols"]
        assert syms["EOS"] not in got["ids"]
        assert not beam["ids"] or beam["ids"][0] != syms["GO"]
        assert not beam["ids"] or beam["ids"][-1] != syms["EOS"]
        assert beam["text"] == serve._detok(
            beam["ids"], state.vocab, "en_w")

        # audio body goes through MFCC+CMVN on the server
        status, got = _post(base + "/decode",
                            {"audio": (np.random.RandomState(0)
                                       .randn(4000) * 0.1).tolist()})
        assert status == 200 and isinstance(got["text"], str)

        status, err = _post(base + "/decode", {"nonsense": 1})
        assert status == 400 and "features" in err["error"]

        # malformed array -> 400, not a dropped connection
        status, err = _post(base + "/decode", {"features": {"a": 1}})
        assert status == 400

        # input longer than every exported shape -> decoded prefix,
        # flagged
        long_x = np.zeros((200, 13), np.float32)
        status, got = _post(base + "/decode",
                            {"features": long_x.tolist()})
        assert status == 200 and got["truncated_to_frames"] == 60
        assert got["frames"] == 200

        # manifest carries the server's decode defaults
        with urllib.request.urlopen(base + "/manifest") as r:
            assert json.loads(r.read())["server"]["default_w"] == 0.6

        # liveness + counters endpoints
        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and len(health["replicas"]) == 1
        assert health["artifacts"] == len(state.artifacts)
        with urllib.request.urlopen(base + "/stats") as r:
            stats = json.loads(r.read())
        # 4 good decodes + 2 rejected bodies over HTTP so far in this
        # test; device_calls also counts the one in-process
        # state.decode() comparison above
        assert stats["requests"] == 6 and stats["errors"] == 2
        assert stats["device_calls"] == 5
        assert stats["latency_s"]["n"] == 4
        assert stats["latency_s"]["p50"] <= stats["latency_s"]["p99"]
    finally:
        httpd.shutdown()


def test_serve_micro_batches_concurrent_requests(tmp_path):
    """Two concurrent requests to a batch-2 artifact must share ONE
    device call (rows of the same static batch) and each get exactly
    the text the unbatched server returns for its own utterance."""
    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, batch_window_ms=2000)
    assert state.batcher is not None
    import types
    calls = []
    for name, art in list(state.artifacts.items()):
        state.artifacts[name] = types.SimpleNamespace(
            call=lambda X, _o=art.call, _n=name:
            (calls.append(_n) or _o(X)))

    speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
    files = sorted(os.listdir(speech))[:2]
    xs = [np.load(os.path.join(speech, f))[:60] for f in files]

    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None, None]

        def hit(i):
            results[i] = _post(base + "/decode",
                               {"features": xs[i].tolist(),
                                "mode": "greedy"})

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert len(calls) == 1, f"expected 1 batched call, saw {calls}"

        # row outputs match the single-request (unbatched) decode
        solo = serve.ArtifactServer(out)
        for i in range(2):
            status, got = results[i]
            assert status == 200
            want = solo.decode({"features": xs[i].tolist(),
                                "mode": "greedy"})
            assert got["text"] == want["text"]
            assert got["ids"] == want["ids"]
    finally:
        httpd.shutdown()
        state.batcher.close()


def test_serve_replica_pool_runs_devices_concurrently(tmp_path):
    """With --replicas 2, two concurrent decodes must be in flight on
    two DISTINCT devices at the same moment (a barrier inside the
    artifact call proves the overlap — a 1-device pool would deadlock
    it), and each must return exactly the unbatched single-replica
    text."""
    import types

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, replicas=2)
    assert len(state.devices) == 2

    rendezvous = threading.Barrier(2, timeout=30)
    call_devices = []
    for name, art in list(state.artifacts.items()):
        def wrapped(X, _o=art.call):
            call_devices.append(next(iter(X.devices())))
            rendezvous.wait()          # both calls must overlap
            return _o(X)
        state.artifacts[name] = types.SimpleNamespace(call=wrapped)

    speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
    files = sorted(os.listdir(speech))[:2]
    xs = [np.load(os.path.join(speech, f))[:60] for f in files]

    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None, None]

        def hit(i):
            results[i] = _post(base + "/decode",
                               {"features": xs[i].tolist(),
                                "mode": "greedy"})

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert len(set(call_devices)) == 2, call_devices

        solo = serve.ArtifactServer(out)
        for i in range(2):
            status, got = results[i]
            assert status == 200
            want = solo.decode({"features": xs[i].tolist(),
                                "mode": "greedy"})
            assert got["text"] == want["text"]
            assert got["ids"] == want["ids"]

        with urllib.request.urlopen(base + "/healthz") as r:
            assert len(json.loads(r.read())["replicas"]) == 2
        with urllib.request.urlopen(base + "/stats") as r:
            stats = json.loads(r.read())
        assert stats["device_calls"] == 2 and stats["rows_decoded"] == 2
        # two 1-row calls on a batch-2 artifact -> half the slots real
        assert stats["batch_occupancy"] == 0.5
    finally:
        httpd.shutdown()


def test_serve_micro_batching_with_replica_workers(tmp_path):
    """Micro-batching + a 2-replica pool: 4 concurrent requests to a
    batch-2 artifact group into exactly 2 device calls (2 rows each),
    every answer matching the unbatched single-replica server — the
    two dispatcher workers must not double-take or drop waiters."""
    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, batch_window_ms=2000,
                                     replicas=2)
    # one dispatcher per device-inflight token (2 devices x default
    # inflight 2): that many groups can be on-device at once
    assert len(state.batcher._threads) == 2 * state.inflight

    speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
    files = sorted(os.listdir(speech))[:4]
    xs = [np.load(os.path.join(speech, f))[:60] for f in files]

    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None] * 4

        def hit(i):
            results[i] = _post(base + "/decode",
                               {"features": xs[i].tolist(),
                                "mode": "greedy"})

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)

        solo = serve.ArtifactServer(out)
        for i in range(4):
            status, got = results[i]
            assert status == 200
            want = solo.decode({"features": xs[i].tolist(),
                                "mode": "greedy"})
            assert got["text"] == want["text"]
            assert got["ids"] == want["ids"]

        with urllib.request.urlopen(base + "/stats") as r:
            stats = json.loads(r.read())
        assert stats["device_calls"] == 2
        assert stats["rows_decoded"] == 4
        assert stats["batch_occupancy"] == 1.0   # perfectly packed
    finally:
        httpd.shutdown()
        state.batcher.close()


def test_serve_warmup_readiness(tmp_path):
    """--warmup: /healthz reports ready=false until every artifact has
    been compiled on every replica device, warm calls do not pollute
    the serving stats, and a post-warm decode matches the unwarmed
    server exactly."""
    import time as _time

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--beam", "2,2", "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, replicas=2,
                                     warmup=True)
    assert state.warm_total == len(state.artifacts) * len(state.devices)

    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = _time.monotonic() + 120
        health = None
        while _time.monotonic() < deadline:
            with urllib.request.urlopen(base + "/healthz") as r:
                health = json.loads(r.read())
            assert health["ok"]            # live even while warming
            if health["ready"]:
                break
            _time.sleep(0.2)
        assert health["ready"], health
        assert health["warmup"]["done"] == health["warmup"]["total"] \
            == state.warm_total
        assert "error" not in health["warmup"], health
        # warm compiles bypass the serving counters
        assert state.stats.device_calls == 0

        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60]
        status, got = _post(base + "/decode",
                            {"features": x.tolist(), "mode": "greedy"})
        assert status == 200
        want = serve.ArtifactServer(out).decode(
            {"features": x.tolist(), "mode": "greedy"})
        assert got["text"] == want["text"] and got["ids"] == want["ids"]
        assert state.stats.device_calls == 1
    finally:
        httpd.shutdown()


def test_serve_graceful_drain(tmp_path):
    """Shutdown drain (the SIGTERM path's core): closing the
    micro-batcher dispatches requests still queued in the window (they
    complete with correct answers), and submissions after the drain get
    503 instead of a dropped connection."""
    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    # a 60 s window: queued requests only fly when the batch fills or
    # the batcher is drained — which is what this test forces
    httpd, state = serve.make_server(out, port=0, batch_window_ms=60000)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60]

        result = [None]

        def hit():
            result[0] = _post(base + "/decode",
                              {"features": x.tolist(), "mode": "greedy"})

        t = threading.Thread(target=hit)
        t.start()
        # wait until the request is actually queued in the batcher
        time_mod = __import__("time")
        deadline = time_mod.monotonic() + 30
        while not state.batcher._pending:
            assert time_mod.monotonic() < deadline
            time_mod.sleep(0.01)   # don't GIL-starve the handler thread
        state.batcher.close()              # the drain
        t.join(timeout=60)
        status, got = result[0]
        assert status == 200
        want = serve.ArtifactServer(out).decode(
            {"features": x.tolist(), "mode": "greedy"})
        assert got["text"] == want["text"]

        # post-drain request: clean 503, not a hang or reset
        status, err = _post(base + "/decode",
                            {"features": x.tolist(), "mode": "greedy"})
        assert status == 503 and "shutting down" in err["error"]
    finally:
        httpd.shutdown()


def test_serve_binary_npy_body(tmp_path):
    """The binary fast path: an application/octet-stream .npy body
    (2-D = features, 1-D = audio) with query-string options returns
    exactly the JSON path's answer; a 3-D blob gets a clean 400."""
    import io

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--beam", "2,2", "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def _post_npy(url, arr):
        buf = io.BytesIO()
        np.save(buf, arr)
        req = urllib.request.Request(
            url, data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        base = f"http://127.0.0.1:{port}"
        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60].astype(np.float32)

        status, got = _post_npy(base + "/decode?mode=greedy", x)
        assert status == 200
        want = state.decode({"features": x.tolist(), "mode": "greedy"})
        assert got["text"] == want["text"] and got["ids"] == want["ids"]

        # query-string beam options: w + nbest
        status, beam = _post_npy(
            base + "/decode?mode=beam&w=0.6&nbest=2", x)
        assert status == 200 and beam["mode"] == "beam"
        want = state.decode({"features": x.tolist(), "mode": "beam",
                             "w": 0.6, "nbest": 2})
        assert beam["text"] == want["text"]
        assert beam["score"] == want["score"]
        assert beam["nbest"] == want["nbest"]

        # 1-D blob = raw audio through the server-side MFCC front-end
        audio = (np.random.RandomState(0).randn(4000) * 0.1) \
            .astype(np.float32)
        status, got = _post_npy(base + "/decode", audio)
        assert status == 200
        want = state.decode({"audio": audio.tolist()})
        assert got["text"] == want["text"]

        status, err = _post_npy(base + "/decode", np.zeros((2, 3, 4)))
        assert status == 400 and "1-D audio" in err["error"]
    finally:
        httpd.shutdown()


def test_serve_bad_width_fails_only_itself(tmp_path):
    """A malformed request (wrong feature width) co-batched with a
    well-formed one must 400 alone: width is validated BEFORE the
    micro-batcher, and the batch buffer takes its width from the
    artifact, not from whichever request queued first."""
    import time as _time

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, batch_window_ms=500)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        good = np.load(os.path.join(speech, f))[:60]
        bad = np.zeros((60, 7), np.float32)      # wrong n_ceps

        results = {}

        def hit(name, x):
            results[name] = _post(base + "/decode",
                                  {"features": x.tolist(),
                                   "mode": "greedy"})

        # the BAD request goes first so the old buffer-width-from-
        # first-request bug would have poisoned the good one
        ts = [threading.Thread(target=hit, args=("bad", bad)),
              threading.Thread(target=hit, args=("good", good))]
        ts[0].start()
        _time.sleep(0.05)
        ts[1].start()
        for t in ts:
            t.join(timeout=60)

        status, err = results["bad"]
        assert status == 400 and "features must be" in err["error"]
        status, got = results["good"]
        assert status == 200
        want = serve.ArtifactServer(out).decode(
            {"features": good.tolist(), "mode": "greedy"})
        assert got["text"] == want["text"] and got["ids"] == want["ids"]
    finally:
        httpd.shutdown()
        state.batcher.close()


def test_serve_warm_failure_stays_not_ready(tmp_path, monkeypatch):
    """A warmup compile failure must keep /healthz at ready=false (an
    LB gating on `ready` must not route to a broken artifact), flip
    `ok` to false, and the request path must surface the device fault
    as 500 — not the retryable 503 reserved for drains."""
    import time as _time

    from ast_tpu import serving as _serving

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    real = _serving.load_artifact

    class _Boom:
        def __init__(self, art):
            self.exported = art.exported

        def call(self, X):
            raise RuntimeError("device compile failed")

    monkeypatch.setattr(serve.serving, "load_artifact",
                        lambda p: _Boom(real(p)))
    httpd, state = serve.make_server(out, port=0, warmup=True)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = _time.monotonic() + 60
        while state.warm_done < state.warm_total:
            assert _time.monotonic() < deadline
            _time.sleep(0.05)
        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        assert health["ready"] is False
        assert health["ok"] is False
        assert "device compile failed" in health["warmup"]["error"]

        # device faults are server errors, not retryable drains
        x = np.zeros((60, 13), np.float32)
        status, err = _post(base + "/decode",
                            {"features": x.tolist(), "mode": "greedy"})
        assert status == 500 and "device compile failed" in err["error"]
    finally:
        httpd.shutdown()


def test_serve_cli_sigterm_drains_inflight_request(tmp_path):
    """The full drain guarantee through the REAL process path: SIGTERM
    to the serve CLI while a request sits queued in the micro-batch
    window must still answer that request with 200 (the batcher drain +
    the non-daemon handler join in main()'s finally), then exit 0.
    Only the in-process pieces were pinned before; a daemon handler
    thread would pass those and still drop the response at exit."""
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    # a long window guarantees the request is still queued (not yet
    # dispatched) when SIGTERM lands
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from ast_tpu.cli import serve;"
         f"serve.main(['-d', {out!r}, '--port', '0',"
         " '--batch-window-ms', '60000'])"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # the CLI prints its bound address once the server is up
        line = proc.stdout.readline()
        assert "http://127.0.0.1:" in line, line
        base = line.split("on ")[1].split()[0].rstrip(",")

        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60]

        result = [None]

        def hit():
            result[0] = _post(base + "/decode",
                              {"features": x.tolist(), "mode": "greedy"})

        t = threading.Thread(target=hit)
        t.start()
        _time.sleep(1.0)          # request reaches the window queue
        assert result[0] is None  # ...and is genuinely still pending
        proc.send_signal(_signal.SIGTERM)
        t.join(timeout=120)
        assert result[0] is not None, "in-flight request was dropped"
        status, got = result[0]
        assert status == 200
        want = serve.ArtifactServer(out).decode(
            {"features": x.tolist(), "mode": "greedy"})
        assert got["text"] == want["text"] and got["ids"] == want["ids"]
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_decode_batch(tmp_path):
    """POST /decode_batch: every row's result equals the single-request
    /decode result for that utterance (same entry selection + padding
    semantics), rows are grouped into static-batch device calls, a
    malformed row errors alone, and the binary (B, T, F) stack variant
    matches the JSON variant."""
    import io
    import urllib.error

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--beam", "2,2", "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        files = sorted(os.listdir(speech))[:3]
        xs = [np.load(os.path.join(speech, f))[:60].astype(np.float32)
              for f in files]

        # 3 rows + 1 malformed on a batch-2 artifact -> 2 device calls
        calls_before = state.stats.device_calls
        body = {"batch": ([{"features": x.tolist()} for x in xs]
                          + [{"features": np.zeros((4, 7)).tolist()}]),
                "mode": "greedy"}
        status, got = _post(base + "/decode_batch", body)
        assert status == 200
        results = got["results"]
        assert len(results) == 4
        assert state.stats.device_calls - calls_before == 2
        for x, r in zip(xs, results[:3]):
            want = state.decode({"features": x.tolist(),
                                 "mode": "greedy"})
            assert r["text"] == want["text"] and r["ids"] == want["ids"]
        assert "features must be" in results[3]["error"]

        # beam mode with shared w/nbest options
        body = {"batch": [{"features": x.tolist()} for x in xs[:2]],
                "mode": "beam", "w": 0.6, "nbest": 2}
        status, got = _post(base + "/decode_batch", body)
        assert status == 200
        for x, r in zip(xs, got["results"]):
            want = state.decode({"features": x.tolist(), "mode": "beam",
                                 "w": 0.6, "nbest": 2})
            assert r["text"] == want["text"]
            assert r["score"] == want["score"]
            assert r["nbest"] == want["nbest"]

        # binary (B, T, F) stack == the JSON list variant
        stack = np.stack([x[:60] for x in xs[:2]])
        buf = io.BytesIO()
        np.save(buf, stack)
        req = urllib.request.Request(
            base + "/decode_batch?mode=greedy", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req) as r:
            got_bin = json.loads(r.read())
        want = state.decode_batch(
            {"batch": [{"features": x} for x in stack],
             "mode": "greedy"})
        assert got_bin["results"] == want["results"]

        # an empty batch is the requester's fault
        status, err = _post(base + "/decode_batch", {"batch": []})
        assert status == 400 and "non-empty" in err["error"]
    finally:
        httpd.shutdown()


def test_serve_inflight_bounds_device_queue(tmp_path):
    """The replica pool is a counting semaphore: at most
    inflight-per-replica artifact calls may be in flight on one device
    at a time (bounded HBM under a request flood), enforced by holding
    the token through completion — not released at async dispatch."""
    import time as _time
    import types

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    httpd, state = serve.make_server(out, port=0, replicas=1, inflight=2)
    concurrent = [0]
    peak = [0]
    lock = threading.Lock()
    for name, art in list(state.artifacts.items()):
        def wrapped(X, _o=art.call):
            with lock:
                concurrent[0] += 1
                peak[0] = max(peak[0], concurrent[0])
            _time.sleep(0.05)        # hold the call open
            try:
                return _o(X)
            finally:
                with lock:
                    concurrent[0] -= 1
        state.artifacts[name] = types.SimpleNamespace(call=wrapped)

    speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
    f = sorted(os.listdir(speech))[0]
    x = np.load(os.path.join(speech, f))[:60]

    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None] * 6

        def hit(i):
            results[i] = _post(base + "/decode",
                               {"features": x.tolist(),
                                "mode": "greedy"})

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r is not None and r[0] == 200 for r in results)
        assert peak[0] <= 2, f"inflight bound violated: peak {peak[0]}"
        assert peak[0] == 2, "no overlap at all — semaphore too strict"
    finally:
        httpd.shutdown()


def test_serve_prefork_workers(tmp_path):
    """--workers N: N processes bind the same port via SO_REUSEPORT,
    the kernel spreads connections across them, every request gets a
    correct answer, and SIGTERM drains the whole pool (parent fans out,
    waits for children, exits 0)."""
    import signal
    import socket
    import subprocess
    import sys
    import time as time_mod

    exp = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp, "--batch", "2", "--frames", "60",
         "--platforms", "cpu", "--dtype", "float32"])

    # pick a free port (SO_REUSEPORT needs an explicit one)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "ast_tpu.cli.serve", "-d", out,
         "--port", str(port), "--workers", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time_mod.monotonic() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    if json.loads(r.read())["ok"]:
                        break
            except Exception:
                pass
            assert time_mod.monotonic() < deadline, "server never up"
            time_mod.sleep(0.5)

        speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
        f = sorted(os.listdir(speech))[0]
        x = np.load(os.path.join(speech, f))[:60]
        oracle = serve.ArtifactServer(out).decode(
            {"features": x.tolist(), "mode": "greedy"})["text"]
        # enough sequential requests that (with kernel load balancing)
        # both workers are very likely exercised; every answer must be
        # identical regardless of which process served it
        for _ in range(12):
            status, got = _post(base + "/decode",
                                {"features": x.tolist(),
                                 "mode": "greedy"})
            assert status == 200 and got["text"] == oracle
    finally:
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    assert rc == 0, proc.stdout.read().decode()[-500:]
