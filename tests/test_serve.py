"""HTTP serving tests: endpoint plumbing + exact parity between the
full-utterance /recognize labels and chunked /stream decoding of the
same audio (the streaming-equals-offline contract, served)."""

import http.client
import json
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from kaldi_ctc_tpu.cli import init_model, serve

    tmp = tmp_path_factory.mktemp("serve")
    exp = str(tmp / "exp")
    init_model.main(["--input-dim", "40", "--num-targets", "6",
                     "--hidden-dim", "16", "--num-layers", "2",
                     "--bidirectional", "0", "--dir", exp])
    args = serve.parse_args(["--dir", exp, "--port", "0",
                             "--use-priors", "0",
                             "--max-streams", "4", "--chunk-frames", "7"])
    engine = serve.Engine(args)
    httpd = ThreadingHTTPServer((args.host, 0),
                                serve.make_handler(engine))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield "127.0.0.1", port
    httpd.shutdown()


def _post(host, port, path, body=b""):
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    data = json.loads(resp.read().decode())
    conn.close()
    return resp.status, data


def _get(host, port, path):
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = json.loads(resp.read().decode())
    conn.close()
    return resp.status, data


def _pcm(seconds=1.2, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    # band-limited-ish noise keeps MFCCs varied so greedy labels change
    x = np.cumsum(rng.standard_normal(n)).astype(np.float32)
    x = (x - x.mean()) / (np.abs(x).max() + 1e-6)
    return (x * 20000).astype("<i2").tobytes()


def test_healthz(server):
    host, port = server
    status, data = _get(host, port, "/healthz")
    assert status == 200
    assert data["ok"] and data["streaming"]


def test_recognize_endpoint(server):
    host, port = server
    status, data = _post(host, port, "/recognize", _pcm())
    assert status == 200
    assert "labels" in data and isinstance(data["labels"], list)
    assert data["num_frames"] > 100
    assert data["rtf"] > 0


def test_stream_matches_offline(server):
    host, port = server
    body = _pcm(seconds=1.0, seed=3)
    _, offline = _post(host, port, "/recognize", body)

    _, start = _post(host, port, "/stream/start")
    slot = start["slot"]
    labels = []
    # ragged chunk sizes exercise the incremental framing
    sizes = [1600, 2400, 3210, 4000, 2790, 2000]
    off = 0
    for sz in sizes:
        chunk = body[off * 2:(off + sz) * 2]
        off += sz
        _, resp = _post(host, port, f"/stream/{slot}/chunk", chunk)
        labels.extend(resp["labels"])
    _, end = _post(host, port, f"/stream/{slot}/end")
    assert end["labels"] == offline["labels"], (
        end["labels"], offline["labels"])


def test_concurrent_slots_independent(server):
    host, port = server
    b1, b2 = _pcm(seconds=0.6, seed=5), _pcm(seconds=0.6, seed=6)
    _, off1 = _post(host, port, "/recognize", b1)
    _, off2 = _post(host, port, "/recognize", b2)
    _, s1 = _post(host, port, "/stream/start")
    _, s2 = _post(host, port, "/stream/start")
    # interleave chunks between the two streams
    half1, half2 = len(b1) // 4 * 2, len(b2) // 4 * 2
    _post(host, port, f"/stream/{s1['slot']}/chunk", b1[:half1])
    _post(host, port, f"/stream/{s2['slot']}/chunk", b2[:half2])
    _post(host, port, f"/stream/{s1['slot']}/chunk", b1[half1:])
    _post(host, port, f"/stream/{s2['slot']}/chunk", b2[half2:])
    _, e1 = _post(host, port, f"/stream/{s1['slot']}/end")
    _, e2 = _post(host, port, f"/stream/{s2['slot']}/end")
    assert e1["labels"] == off1["labels"]
    assert e2["labels"] == off2["labels"]


def test_slot_exhaustion_and_reuse(server):
    host, port = server
    slots = []
    for _ in range(4):
        status, data = _post(host, port, "/stream/start")
        if status == 200:
            slots.append(data["slot"])
    status, data = _post(host, port, "/stream/start")
    assert status == 503  # exhausted
    for s in slots:
        _post(host, port, f"/stream/{s}/end")
    status, data = _post(host, port, "/stream/start")
    assert status == 200  # freed slots reusable
    _post(host, port, f"/stream/{data['slot']}/end")


def test_unknown_slot_404(server):
    host, port = server
    status, _ = _post(host, port, "/stream/99/chunk", b"")
    assert status == 404


def test_sample_rate_reaches_frame_options(tmp_path):
    """--sample-rate must set FrameOptions.samp_freq: otherwise window
    sizes and the mel bank use 16 kHz parameters while the stream
    buffers slice at the served rate."""
    from kaldi_ctc_tpu.cli import init_model, serve
    exp = str(tmp_path / "exp")
    init_model.main(["--input-dim", "40", "--num-targets", "6",
                     "--hidden-dim", "8", "--num-layers", "1",
                     "--bidirectional", "0", "--dir", exp])
    args = serve.parse_args(["--dir", exp, "--sample-rate", "8000",
                             "--use-priors", "0"])
    eng = serve.Engine(args)
    assert eng.fopts.frame_opts.samp_freq == 8000.0
    assert eng.win == 200 and eng.shift == 80      # 25 ms / 10 ms @ 8 kHz
    # extractor agrees with the stream's frame accounting
    f = eng.feats_for(np.zeros(8000, np.float32))
    assert f.shape[0] == 1 + (8000 - eng.win) // eng.shift


def test_stream_end_word_decode(tmp_path):
    """/stream end returns words/text when a graph is loaded (the
    documented contract): label-loop CTC graph, words == labels."""
    from kaldi_ctc_tpu.cli import init_model, serve
    from kaldi_ctc_tpu.decoding.wfst import NativeFst

    exp = str(tmp_path / "exp")
    init_model.main(["--input-dim", "40", "--num-targets", "6",
                     "--hidden-dim", "16", "--num-layers", "1",
                     "--bidirectional", "0", "--dir", exp])
    # word-loop base graph (words = labels 1..5), CTC-transformed
    arcs, weights = [], []
    for lab in range(1, 6):
        arcs.append([0, lab, lab, lab]); weights.append(1.0)
        arcs.append([lab, lab, 0, lab]); weights.append(0.0)
        arcs.append([lab, 0, 0, 0]); weights.append(0.0)
    finals = np.full(6, np.inf, np.float32); finals[0] = 0.0
    base = NativeFst.from_arrays(0, 6, np.asarray(arcs, np.int32),
                                 np.asarray(weights, np.float32), finals)
    gpath = str(tmp_path / "ctc.fst")
    base.make_ctc_graph().write(gpath)
    words = "\n".join(f"w{i} {i}" for i in range(6))
    (tmp_path / "words.txt").write_text(words + "\n")

    args = serve.parse_args(["--dir", exp, "--use-priors", "0",
                             "--graph", gpath,
                             "--words", str(tmp_path / "words.txt"),
                             "--max-streams", "2", "--chunk-frames", "5"])
    eng = serve.Engine(args)
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.standard_normal(16000)).astype(np.float32)
    x = (x - x.mean()) / (np.abs(x).max() + 1e-6) * 20000
    slot = eng.stream_start()
    assert slot is not None and slot >= 0
    eng.stream_chunk(slot, x[:8000])
    eng.stream_chunk(slot, x[8000:])
    out = eng.stream_end(slot)
    assert "words" in out and "text" in out, out
    # same audio through /recognize gives the same words
    full = eng.recognize(x)
    assert out["words"] == full["words"], (out["words"], full["words"])
