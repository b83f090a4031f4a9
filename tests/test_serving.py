"""HTTP serving layer: round trips through a live server."""

import http.client
import io
import json
import threading

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.serving import CodecService, make_server
from vqvdb_tpu.train.synthetic import smoke_volume


@pytest.fixture(scope="module")
def server():
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), cfg), cfg,
                    CodecConfig(batch_size=32, compute_dtype="float32"))
    service = CodecService(codec)
    srv = make_server(service, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_healthz_and_stats(server):
    status, data = _request(server, "GET", "/healthz")
    assert status == 200
    info = json.loads(data)
    assert info["status"] == "ok" and info["model"]["num_embeddings"] == 64

    status, data = _request(server, "GET", "/stats")
    assert status == 200
    assert "counters" in json.loads(data)


def test_encode_decode_roundtrip_over_http(server):
    dense = smoke_volume(24, seed=3)
    buf = io.BytesIO()
    np.save(buf, dense)

    status, vq_bytes = _request(server, "POST", "/encode?name=density",
                                buf.getvalue())
    assert status == 200
    assert vq_bytes[:5] == b"VQVDB"

    status, npz_bytes = _request(server, "POST", "/decode", vq_bytes)
    assert status == 200
    out = np.load(io.BytesIO(npz_bytes))
    assert "density_leaves" in out and "density_origins" in out
    assert out["density_leaves"].shape[1:] == (8, 8, 8, 1)

    status, data = _request(server, "GET", "/stats")
    counters = json.loads(data)["counters"]
    assert counters["encode"] >= 1 and counters["decode"] >= 1


def test_concurrent_requests(server):
    """Race check: parallel clients hammer the service; the device lock
    serializes dispatch while responses stay consistent per-client."""
    import concurrent.futures

    dense = smoke_volume(16, seed=5)
    buf = io.BytesIO()
    np.save(buf, dense)
    payload = buf.getvalue()

    def round_trip(_):
        status, vq = _request(server, "POST", "/encode?name=g", payload)
        assert status == 200
        status, npz = _request(server, "POST", "/decode", vq)
        assert status == 200
        return np.load(io.BytesIO(npz))["g_leaves"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(round_trip, range(8)))
    for r in results[1:]:
        np.testing.assert_array_equal(r, results[0])


def test_bad_requests(server):
    status, data = _request(server, "POST", "/decode", b"not a vqvdb file")
    assert status == 400
    assert "error" in json.loads(data)

    status, _ = _request(server, "GET", "/nope")
    assert status == 404


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_microbatched_leaf_endpoints(server):
    """Concurrent small /encode_leaves requests coalesce into shared device
    steps and every client gets exactly its own slice back; decode_indices
    round-trips the result."""
    rng = np.random.default_rng(0)
    chunks = [rng.random((3, 8, 8, 8), np.float32) for _ in range(8)]
    results = [None] * len(chunks)

    def worker(i):
        status, data = _request(server, "POST", "/encode_leaves",
                                _npy_bytes(chunks[i]))
        assert status == 200, data
        results[i] = np.load(io.BytesIO(data))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(chunks))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # Each response matches a sequential single-request encode.
    for i, chunk in enumerate(chunks):
        assert results[i].shape == (3, 4, 4, 4)
        status, data = _request(server, "POST", "/encode_leaves",
                                _npy_bytes(chunk))
        assert status == 200
        np.testing.assert_array_equal(results[i], np.load(io.BytesIO(data)))

    # Round trip through the decode endpoint.
    status, data = _request(server, "POST", "/decode_indices",
                            _npy_bytes(results[0]))
    assert status == 200
    leaves = np.load(io.BytesIO(data))
    assert leaves.shape == (3, 8, 8, 8, 1)

    status, data = _request(server, "GET", "/stats")
    mb = json.loads(data)["microbatch"]
    assert mb["encode"]["steps"] >= 1
    # 8 concurrent 3-leaf requests against a 32-leaf batch: at least some
    # coalescing must have happened (the server is local, the window 5 ms).
    assert mb["encode"]["coalesced"] >= 1


def test_leaf_endpoint_rejects_bad_shape(server):
    status, data = _request(server, "POST", "/encode_leaves",
                            _npy_bytes(np.zeros((2, 4, 4, 4), np.float32)))
    assert status == 400
    assert "expected leaves" in json.loads(data)["error"]

def test_rvq_leaf_endpoints():
    """A residual-VQ service round-trips (N,4,4,4,S) index tensors over
    /encode_leaves + /decode_indices and rejects single-stage shapes."""
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64, num_quantizers=2)
    codec = VQCodec(init_vqvae_params(jax.random.key(1), cfg), cfg,
                    CodecConfig(batch_size=16, compute_dtype="float32"))
    service = CodecService(codec)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        addr = srv.server_address
        leaves = np.random.default_rng(2).random((5, 8, 8, 8), np.float32)
        status, data = _request(addr, "POST", "/encode_leaves",
                                _npy_bytes(leaves))
        assert status == 200, data
        idx = np.load(io.BytesIO(data))
        assert idx.shape == (5, 4, 4, 4, 2) and idx.dtype == np.uint8

        status, data = _request(addr, "POST", "/decode_indices",
                                _npy_bytes(idx))
        assert status == 200, data
        rec = np.load(io.BytesIO(data))
        assert rec.shape == (5, 8, 8, 8, 1)

        # Single-stage-shaped indices must be rejected by an RVQ service.
        status, data = _request(addr, "POST", "/decode_indices",
                                _npy_bytes(idx[..., 0]))
        assert status == 400
        assert "expected indices" in json.loads(data)["error"]
    finally:
        srv.shutdown()
