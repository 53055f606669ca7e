"""HTTP detection server with dynamic batching (production serving surface).

The reference family serves detections by importing the repo and calling
``detect.py`` per image (SURVEY.md §3.2); a production deployment needs a
network surface. This is a dependency-free (stdlib ``http.server``) daemon
on top of :class:`serving.Predictor`:

- **Dynamic batching**: concurrent requests are coalesced into the
  Predictor's fixed compiled batch — the first request opens a short window
  (``batch_window_ms``); whatever arrives before it closes (up to
  ``batch_size``) rides the same device dispatch. Single requests pay at
  most the window; a loaded server fills whole batches and gets the
  batch-16 throughput numbers (BASELINE.md) instead of batch-1 latency.
- One device thread owns all dispatches (the single-chip contract);
  request threads block on an event until their slot's detections land.

Endpoints:
  GET  /healthz                 -> 200 "ok" (readiness probe)
  POST /detect?min_score=0.3    -> body: encoded image bytes (JPEG via the
       fused C decode when available) -> JSON {"detections": [{"box":
       [x0,y0,x1,y1] px, "score": s, "label": l}, ...], "width", "height"}

Start it with ``sbd-serve`` (cli/serve_cli.py) or embed
:class:`DetectionServer` in-process (tests do).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse


# Reject absurd uploads before buffering them (an encoded image is a few
# MB at most; this is a decode service, not an upload endpoint).
MAX_BODY_BYTES = 32 * 1024 * 1024


class _Request:
    __slots__ = ("payload", "event", "result", "error")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class _Batcher:
    """Coalesces concurrent requests into fixed-size Predictor batches.

    One background thread drains the queue: the first request of a batch
    opens a ``window_s`` collection window; the batch dispatches when full
    or when the window closes. All device work happens on this one thread.
    """

    def __init__(self, predictor, window_s: float = 0.005):
        self._pred = predictor
        self._window_s = window_s
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        # single-writer counters (the loop thread); readers see a consistent
        # enough snapshot for observability
        self.stats = {"requests": 0, "batches": 0, "batch_errors": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, payload) -> _Request:
        req = _Request(payload)
        self._q.put(req)
        return req

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def _gather(self, block_s: float):
        """One batch's worth of requests: the first request (waited for up
        to ``block_s``) opens the collection window."""
        import time

        try:
            first = self._q.get(timeout=block_s)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self._window_s
        while len(items) < self._pred.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    @staticmethod
    def _resolve(pending_items, dets) -> None:
        for r, det in zip(pending_items, dets):
            r.result = det
            r.event.set()

    def _fail(self, items, e: Exception) -> None:
        for r in items:
            r.error = f"{type(e).__name__}: {e}"
            r.event.set()

    def _loop(self) -> None:
        # Double-buffered: while batch i runs on the device, batch i+1 is
        # gathered and DISPATCHED (submit is async) before batch i's
        # blocking readback — host prepare/H2D overlaps device execution,
        # exactly Predictor's submit/poll contract.
        pending = None  # (items,) currently on the device
        while not self._stop.is_set():
            # with work in flight, only peek briefly for co-riders;
            # otherwise idle-wait for the next request
            items = self._gather(0.002 if pending else 0.05)
            if items:
                self.stats["requests"] += len(items)
                self.stats["batches"] += 1
                try:
                    self._pred.submit([r.payload for r in items])
                except Exception as e:
                    self.stats["batch_errors"] += 1
                    self._fail(items, e)
                    items = []
            if pending is not None:
                try:
                    self._resolve(pending, self._pred.poll())
                except Exception as e:
                    self._fail(pending, e)
            pending = items or None
        if pending is not None:  # drain the in-flight batch on shutdown
            try:
                self._resolve(pending, self._pred.poll())
            except Exception as e:
                self._fail(pending, e)
        # fail anything still queued so its handler thread doesn't hang
        # for the full request timeout
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.event.set()


class DetectionServer:
    """ThreadingHTTPServer wrapper: one Predictor, dynamic batching."""

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 8000,
                 batch_window_ms: float = 5.0, request_timeout_s: float = 60.0,
                 class_names=None):
        self.predictor = predictor
        self.batcher = _Batcher(predictor, window_s=batch_window_ms / 1e3)
        timeout_s = request_timeout_s
        batcher = self.batcher
        names = list(class_names) if class_names else None

        class Handler(BaseHTTPRequestHandler):
            # quiet by default; DetectionServer.verbose enables access logs
            def log_message(self, fmt, *args):
                if getattr(server_ref[0], "verbose", False):
                    BaseHTTPRequestHandler.log_message(self, fmt, *args)

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json") -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    self._send(200, b"ok", "text/plain")
                elif path == "/stats":
                    s = dict(batcher.stats)
                    s["mean_batch_occupancy"] = round(
                        s["requests"] / max(s["batches"], 1), 2)
                    s["batch_size"] = batcher._pred.batch_size
                    s["bucket_sizes"] = (
                        getattr(batcher._pred, "bucket_sizes", None)
                        or [batcher._pred.batch_size])
                    self._send(200, json.dumps(s).encode())
                else:
                    self._send(404, b'{"error": "unknown path"}')

            def do_POST(self):
                parsed = urlparse(self.path)
                if parsed.path != "/detect":
                    self._send(404, b'{"error": "unknown path"}')
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    n = 0
                if n <= 0:
                    self._send(400, b'{"error": "empty body"}')
                    return
                if n > MAX_BODY_BYTES:  # an image is a few MB at most
                    self._send(413, json.dumps({
                        "error": f"body too large ({n} bytes; max "
                                 f"{MAX_BODY_BYTES})"}).encode())
                    return
                body = self.rfile.read(n)
                qs = parse_qs(parsed.query)
                try:
                    min_score = float(qs.get("min_score", ["0.0"])[0])
                except ValueError:
                    self._send(400, b'{"error": "bad min_score"}')
                    return
                # Decode+resize HERE, on the request thread (fused C JPEG
                # decode when available): a corrupt upload 400s on its own
                # instead of failing the co-batched requests, and the
                # per-image host work parallelizes across request threads
                # instead of serializing on the device thread.
                try:
                    from shape_based_object_detection_tpu.utils.image import (
                        load_resized_image_host,
                    )

                    pred = server_ref[0].predictor
                    resized, h, w = load_resized_image_host(
                        body, pred.size, pred.letterbox,
                        backend=pred.decode_backend)
                except Exception as e:
                    self._send(400, json.dumps(
                        {"error": f"undecodable image: {e}"}).encode())
                    return
                req = batcher.submit((resized, (h, w)))
                if not req.event.wait(timeout=timeout_s):
                    self._send(504, b'{"error": "detection timed out"}')
                    return
                if req.error is not None:
                    self._send(400, json.dumps(
                        {"error": req.error}).encode())
                    return
                det = req.result
                keep = det.scores >= min_score
                dets = [{
                    "box": [round(float(v), 2) for v in box],
                    "score": round(float(s), 5),
                    "label": (names[int(l)] if names and int(l) < len(names)
                              else int(l)),
                } for box, s, l in zip(det.boxes[keep], det.scores[keep],
                                       det.labels[keep])]
                self._send(200, json.dumps({
                    "detections": dets, "width": int(w), "height": int(h),
                }).encode())

        server_ref = [self]
        self.verbose = False

        class _Server(ThreadingHTTPServer):
            # default listen backlog (5) drops connections under concurrent
            # load (observed: resets at 32 simultaneous clients)
            request_queue_size = 128
            daemon_threads = True

        self._httpd = _Server((host, port), Handler)
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        """Serve in a background thread (embedding / tests)."""
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._serve_thread.start()

    def serve_forever(self) -> None:
        """Serve on the calling thread (the CLI path)."""
        self._httpd.serve_forever()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5)
        self.batcher.close()
