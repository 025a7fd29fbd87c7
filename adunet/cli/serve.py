"""Model server over an exported serving artifact.

Production tail of the export surface (`adunet.export`): serve a
StableHLO artifact (f32 or int8 weight-only; SR / seg / joint alike —
anything `load_artifact` loads) over HTTP with cross-request
micro-batching. The reference repo stops at offline evaluation scripts;
this closes the deploy-and-serve loop the TPU rebuild is meant for.

Design notes (TPU serving, not a translation of anything upstream):

- the artifact's batch size is STATIC (one compiled XLA program, no dynamic
  shapes), so throughput comes from filling that batch. Concurrent requests
  are pooled by a single batcher thread: it waits ``--batch-window-ms`` for
  the batch to fill, pads the remainder with zeros, runs ONE device call,
  and scatters the rows back to their requests. Padding rows are free
  relative to a second dispatch — the device cost of a half-full batch and
  a full one is identical.
- requests are raw ``.npy`` bytes in and out (zero-copy-ish, no base64 or
  image codec dependency; uint8 inputs are normalised on the server exactly
  like the training feed normalises device-side). One request may carry a
  single HxWx3 image or an NxHxWx3 stack; stacks larger than the artifact
  batch are chunked across device calls transparently.
- endpoints: ``GET /v1/health``, ``GET /v1/metadata`` (artifact manifest +
  live serving stats), ``POST /v1/predict``.

Run: ``python -m adunet.cli.serve --artifact <dir> --port 8500``
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Serve an exported adunet artifact over HTTP.")
    parser.add_argument("--artifact", type=str, required=True,
                        help="Artifact directory (manifest.json + model.stablehlo [+ weights.npz]).")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--batch-window-ms", type=float, default=5.0,
                        help="How long the batcher waits for more requests to fill "
                             "the artifact's static batch before dispatching.")
    parser.add_argument("--max-body-mb", type=float, default=64.0,
                        help="Reject request bodies larger than this (HTTP 413). "
                             "Bounds per-request memory and batcher occupancy.")
    parser.add_argument("--max-concurrent-requests", type=int, default=16,
                        help="Predict requests admitted at once; beyond this the "
                             "server replies 503 immediately. Bounds total server "
                             "memory (ThreadingHTTPServer spawns one thread per "
                             "connection, so without a cap a client burst holds "
                             "an unbounded number of decoded bodies in RAM).")
    return parser.parse_args(argv)


class _Batcher:
    """Pools single-image requests into the artifact's static batch."""

    def __init__(self, call, batch_size: int, window_ms: float):
        self._call = call
        self.batch_size = int(batch_size)
        self.window_s = float(window_ms) / 1000.0
        self._q: "queue.Queue[Tuple[np.ndarray, Future]]" = queue.Queue()
        self.stats = {"requests": 0, "images": 0, "device_calls": 0, "batched_rows": 0}
        self._stats_lock = threading.Lock()
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._stop = threading.Event()
        self._thread.start()

    def bump(self, **deltas: int) -> None:
        # += on a dict entry is a read-modify-write, not atomic under the
        # GIL; handler threads and the batcher thread both count
        with self._stats_lock:
            for k, d in deltas.items():
                self.stats[k] += d

    def snapshot_stats(self) -> Dict[str, int]:
        with self._stats_lock:
            return dict(self.stats)

    def submit(self, image: np.ndarray) -> Future:
        # the lock makes (stop-check, enqueue) atomic against close()'s
        # stop-set: anything enqueued is enqueued BEFORE stop, so close()'s
        # drain is guaranteed to see it — no future can be stranded in a
        # queue that no worker and no drain will ever visit
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("server shutting down")
            fut: Future = Future()
            self._q.put((image, fut))
            return fut

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=5)
        # fail any requests still queued — a handler thread blocked on
        # fut.result() with no worker left would hang forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("server shutting down"))

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = time.monotonic() + self.window_s
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            batch = np.stack([img for img, _ in items])
            n = batch.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, *batch.shape[1:]), batch.dtype)
                batch = np.concatenate([batch, pad])
            try:
                out = np.asarray(self._call(batch))
                self.bump(device_calls=1, batched_rows=n)
                for i, (_, fut) in enumerate(items):
                    fut.set_result(out[i])
            except Exception as exc:  # device failure: surface to every caller
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(exc)


def _decode_request(body: bytes, patch: int) -> np.ndarray:
    try:
        arr = np.load(io.BytesIO(body), allow_pickle=False)
    except Exception as exc:
        raise ValueError(f"body is not a .npy array: {exc}") from exc
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[1:] != (patch, patch, 3) or arr.shape[0] == 0:
        raise ValueError(
            f"expected ({patch}, {patch}, 3) image(s); got array of shape {tuple(arr.shape)}."
        )
    return arr


def make_server(artifact_dir: str, host: str = "127.0.0.1", port: int = 0,
                batch_window_ms: float = 5.0,
                max_body_bytes: int = 64 * 1024 * 1024,
                max_concurrent_requests: int = 16) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; tests drive serve_forever
    from a thread, the CLI calls it directly."""
    from adunet.export import load_artifact

    call, manifest = load_artifact(artifact_dir)
    if "input_shape" not in manifest:
        # load_artifact tolerates a bare model.stablehlo with no manifest
        # (aot.py), but serving needs the static batch/patch dims
        raise ValueError(
            f"artifact at {artifact_dir!r} has no manifest.json with an "
            "'input_shape' entry — the server needs the compiled batch and "
            "patch dimensions. Re-export with adunet.export or restore the "
            "manifest next to model.stablehlo."
        )
    batch, patch = int(manifest["input_shape"][0]), int(manifest["input_shape"][1])
    batcher = _Batcher(call, batch, batch_window_ms)
    # admission control: each admitted predict request can hold up to
    # max_body_bytes of body plus its decoded f32 copy in RAM while it waits
    # on the batcher, and ThreadingHTTPServer imposes no connection cap of
    # its own — so total predict memory is bounded only by this gate.
    admission = threading.Semaphore(max(1, int(max_concurrent_requests)))

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _reply_json(self, code: int, obj: Dict[str, Any]) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/v1/health":
                self._reply_json(200, {"status": "ok"})
            elif self.path == "/v1/metadata":
                self._reply_json(200, {"manifest": manifest, "serving": batcher.snapshot_stats()})
            else:
                self._reply_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/predict":
                self._reply_json(404, {"error": f"unknown path {self.path}"})
                return
            if not admission.acquire(blocking=False):
                self.send_response(503)
                self.send_header("Retry-After", "1")
                payload = json.dumps({
                    "error": f"server saturated ({max_concurrent_requests} "
                             "concurrent predict requests in flight); retry."
                }).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            try:
                self._do_predict()
            finally:
                admission.release()

        def _do_predict(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._reply_json(400, {"error": "invalid Content-Length header"})
                return
            if length <= 0:
                self._reply_json(400, {"error": "empty request body"})
                return
            if length > max_body_bytes:
                self._reply_json(413, {
                    "error": f"request body {length} bytes exceeds the "
                             f"{max_body_bytes}-byte limit (--max-body-mb)."
                })
                return
            body = self.rfile.read(length)
            try:
                images = _decode_request(body, patch)
            except ValueError as exc:
                self._reply_json(400, {"error": str(exc)})
                return
            batcher.bump(requests=1, images=images.shape[0])
            try:
                futures = [batcher.submit(img) for img in images]
            except RuntimeError as exc:  # submit raced a shutdown
                self._reply_json(503, {"error": str(exc)})
                return
            try:
                out = np.stack([f.result(timeout=120) for f in futures])
            except Exception as exc:  # device failure / shutdown: a real
                # HTTP 500 beats a dropped connection
                self._reply_json(500, {"error": f"inference failed: {exc}"})
                return
            buf = io.BytesIO()
            np.save(buf, out)
            self._reply(200, buf.getvalue(), "application/octet-stream")

        def log_message(self, fmt, *args):  # quiet; stats live in /v1/metadata
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # for tests / clean shutdown
    server.manifest = manifest
    return server


def main(argv: Optional[List[str]] = None) -> None:
    args = parse_args(argv)
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    server = make_server(args.artifact, args.host, args.port, args.batch_window_ms,
                         max_body_bytes=int(args.max_body_mb * 1024 * 1024),
                         max_concurrent_requests=args.max_concurrent_requests)
    b, p = server.manifest["input_shape"][0], server.manifest["input_shape"][1]
    print(f"[serve] artifact batch {b} x {p}px — http://{args.host}:{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
