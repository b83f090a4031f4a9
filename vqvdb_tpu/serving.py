"""HTTP serving layer: the codec as a long-lived network service.

The reference's deployment story is a Houdini plugin on a workstation; a
TPU-native codec instead serves farms and pipelines over the network. This
module exposes one warm `VQCodec` (graphs compiled once at startup) behind a
small threaded HTTP API:

    GET  /healthz            -> {"status": "ok", model/config info}
    GET  /stats              -> request counters + stage-profiler report
    POST /encode?name=NAME   -> body: .npy bytes (dense volume [X,Y,Z(,C)]
                                or leaf array [N,8,8,8(,C)]);
                                response: .vqvdb bytes
    POST /decode             -> body: .vqvdb bytes;
                                response: .npz with {name}_leaves /
                                {name}_origins arrays per grid
    POST /encode_leaves      -> body: .npy leaves [N,8,8,8(,C)];
                                response: .npy indices [N,4,4,4]
    POST /decode_indices     -> body: .npy indices [N,4,4,4];
                                response: .npy leaves [N,8,8,8(,C)]

Device dispatch is serialized with a lock (one TPU stream); request parsing
and response serialization run threaded. The leaf-level endpoints are
MICRO-BATCHED: concurrent small requests (a render farm's typical traffic —
many clients, a few hundred leaves each) are coalesced into shared device
steps up to the codec batch size instead of each paying a padded step
(see MicroBatcher). Start via
`python -m vqvdb_tpu.cli serve --model m.vqmodel --port 8990`.
"""

from __future__ import annotations

import io
import json
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid


class MicroBatcher:
    """Coalesces concurrent requests into shared device steps.

    Callers submit arrays with a shared trailing shape and block for their
    slice of the result; a single worker drains the queue, concatenates up
    to `batch_size` rows (waiting at most `max_wait_ms` after the first
    pending item for stragglers), runs one step, and distributes results.
    Large submissions simply pass through in their own step(s) — the codec
    layer below already splits/pads. The win is the farm pattern: many
    concurrent small requests stop paying a full padded device step each.
    """

    def __init__(self, step_fn, batch_size: int,
                 max_wait_ms: float = 5.0) -> None:
        self._step = step_fn
        self.batch_size = int(batch_size)
        self.max_wait_s = max_wait_ms / 1e3
        self._cv = threading.Condition()
        self._pending: list = []  # [(arr, event_dict)]
        self.steps = 0
        self.coalesced = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, arr: np.ndarray) -> np.ndarray:
        slot = {"event": threading.Event(), "out": None, "err": None}
        with self._cv:
            self._pending.append((arr, slot))
            self._cv.notify()
        slot["event"].wait()
        if slot["err"] is not None:
            raise slot["err"]
        return slot["out"]

    def _take_batch(self) -> list:
        with self._cv:
            while not self._pending:
                self._cv.wait()
            deadline = time.time() + self.max_wait_s
            total = sum(a.shape[0] for a, _ in self._pending)
            while total < self.batch_size:
                remaining = deadline - time.time()
                if remaining <= 0 or not self._cv.wait(timeout=remaining):
                    break
                total = sum(a.shape[0] for a, _ in self._pending)
            batch, taken = [], 0
            while self._pending and taken < self.batch_size:
                arr, slot = self._pending.pop(0)
                batch.append((arr, slot))
                taken += arr.shape[0]
            return batch

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            arrs = [a for a, _ in batch]
            try:
                out = self._step(np.concatenate(arrs, axis=0)
                                 if len(arrs) > 1 else arrs[0])
                self.steps += 1
                self.coalesced += len(batch) - 1
                off = 0
                for arr, slot in batch:
                    n = arr.shape[0]
                    slot["out"] = out[off:off + n]
                    off += n
                    slot["event"].set()
            except Exception as e:  # propagate to every waiter
                for _, slot in batch:
                    slot["err"] = e
                    slot["event"].set()


class CodecService:
    """Wraps a warm codec with counters and a device lock."""

    def __init__(self, codec: VQCodec, *,
                 max_body_bytes: int = 1 << 30) -> None:
        self.codec = codec
        self.lock = threading.Lock()          # serializes device dispatch
        self.counters_lock = threading.Lock() # guards counter read-modify-write
        self.counters = {"encode": 0, "decode": 0, "encode_leaves": 0,
                         "decode_indices": 0, "errors": 0}
        self.max_body_bytes = max_body_bytes
        self.started = time.time()
        codec.check_latent_shape()  # compile + self-check up front

        def _enc_step(leaves: np.ndarray) -> np.ndarray:
            with self.lock:
                return codec.encode_leaves(leaves)

        def _dec_step(indices: np.ndarray) -> np.ndarray:
            with self.lock:
                return codec.decode_indices(indices)

        self.encode_batcher = MicroBatcher(_enc_step, codec.ccfg.batch_size)
        self.decode_batcher = MicroBatcher(_dec_step, codec.ccfg.batch_size)

    def bump(self, key: str) -> None:
        with self.counters_lock:
            self.counters[key] += 1

    # -- operations -------------------------------------------------------
    def encode_npy(self, raw: bytes, name: str) -> bytes:
        arr = np.load(io.BytesIO(raw), allow_pickle=False)
        if arr.ndim >= 4 and arr.shape[1:4] == (8, 8, 8):
            n = arr.shape[0]
            side = int(np.ceil(n ** (1 / 3)))
            origins = np.stack(
                np.unravel_index(np.arange(n), (side, side, side)), axis=1
            ).astype(np.int32) * 8
            grid = LeafGrid(name, origins, arr)
        else:
            grid = LeafGrid.from_dense(name, arr)
        with tempfile.NamedTemporaryFile(suffix=".vqvdb") as f:
            with self.lock:
                self.codec.compress(grid, f.name)
            self.bump("encode")
            return Path(f.name).read_bytes()

    def decode_vqvdb(self, raw: bytes) -> bytes:
        with tempfile.NamedTemporaryFile(suffix=".vqvdb") as f:
            Path(f.name).write_bytes(raw)
            with self.lock:
                grids, _ = self.codec.decompress(f.name)
        out = io.BytesIO()
        arrays = {}
        for g in grids:
            arrays[f"{g.name}_leaves"] = g.leaves
            arrays[f"{g.name}_origins"] = g.origins
        np.savez(out, **arrays)
        self.bump("decode")
        return out.getvalue()

    def encode_leaves_npy(self, raw: bytes) -> bytes:
        leaves = np.load(io.BytesIO(raw), allow_pickle=False)
        if leaves.ndim == 4:
            leaves = leaves[..., None]
        # Validate fully BEFORE enqueueing: a malformed item would fail
        # inside the shared MicroBatcher step and poison every co-batched
        # request.
        want_c = self.codec.mcfg.in_channels
        if (leaves.ndim != 5 or leaves.shape[1:4] != (8, 8, 8)
                or leaves.shape[4] != want_c):
            raise ValueError(f"expected leaves [N,8,8,8,{want_c}], got "
                             f"{leaves.shape}")
        idx = self.encode_batcher.submit(
            np.ascontiguousarray(leaves, np.float32))
        self.bump("encode_leaves")
        out = io.BytesIO()
        np.save(out, idx)
        return out.getvalue()

    def decode_indices_npy(self, raw: bytes) -> bytes:
        idx = np.load(io.BytesIO(raw), allow_pickle=False)
        ishape = self.codec.mcfg.index_shape
        if idx.shape[1:] != ishape:
            raise ValueError(f"expected indices [N,{ishape}], got {idx.shape}")
        leaves = self.decode_batcher.submit(np.ascontiguousarray(idx))
        self.bump("decode_indices")
        out = io.BytesIO()
        np.save(out, leaves)
        return out.getvalue()

    def info(self) -> dict:
        return {
            "status": "ok",
            "model": {
                "variant": self.codec.mcfg.variant,
                "num_embeddings": self.codec.mcfg.num_embeddings,
                "embedding_dim": self.codec.mcfg.embedding_dim,
            },
            "batch_size": self.codec.ccfg.batch_size,
            "compute_dtype": self.codec.ccfg.compute_dtype,
        }

    def stats(self) -> dict:
        with self.counters_lock:
            counters = dict(self.counters)
        return {
            "uptime_s": time.time() - self.started,
            "counters": counters,
            "microbatch": {
                "encode": {"steps": self.encode_batcher.steps,
                           "coalesced": self.encode_batcher.coalesced},
                "decode": {"steps": self.decode_batcher.steps,
                           "coalesced": self.decode_batcher.coalesced},
            },
            "profile": self.codec.profiler.report(),
        }


def make_server(service: CodecService, host: str = "127.0.0.1",
                port: int = 8990) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json") -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, service.info())
            elif path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            parsed = urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            if length > service.max_body_bytes:
                service.bump("errors")
                self._json(413, {"error": f"body of {length} B exceeds limit "
                                          f"of {service.max_body_bytes} B"})
                return
            raw = self.rfile.read(length)
            try:
                if parsed.path == "/encode":
                    name = parse_qs(parsed.query).get("name", ["density"])[0]
                    self._send(200, service.encode_npy(raw, name),
                               "application/octet-stream")
                elif parsed.path == "/decode":
                    self._send(200, service.decode_vqvdb(raw),
                               "application/octet-stream")
                elif parsed.path == "/encode_leaves":
                    self._send(200, service.encode_leaves_npy(raw),
                               "application/octet-stream")
                elif parsed.path == "/decode_indices":
                    self._send(200, service.decode_indices_npy(raw),
                               "application/octet-stream")
                else:
                    self._json(404, {"error": f"unknown path {parsed.path}"})
            except Exception as e:  # surface as 400 with message
                service.bump("errors")
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve(codec: VQCodec, host: str = "127.0.0.1", port: int = 8990) -> None:
    service = CodecService(codec)
    server = make_server(service, host, port)
    print(f"[serve] listening on http://{host}:{port} "
          f"(model: {service.info()['model']})")
    server.serve_forever()
