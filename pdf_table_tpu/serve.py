"""Production serving: HTTP extraction service with dynamic batching.

The reference ships only a CLI (cli/main.py) plus a result URL helper
(utils/common_utils.py:160-169); serving PDFs at scale on TPU needs a
resident process that keeps the compiled programs warm and BATCHES
concurrent requests into full chunks — a cold CLI run pays minutes of
remote compile per invocation and single-page runs waste the chip.

Design (stdlib-only, no framework deps):
* ThreadingHTTPServer front end; handlers park on a per-request event.
* One batcher thread drains the request queue, groups up to
  ``batch_pages`` pages (multi-page PDFs expand to their pages) or
  ``max_wait_ms``, then runs ONE BatchPipeline.run() — the same 4-lane
  pipelined path bench.py measures, so serving throughput tracks the
  bench number.
* Endpoints:
    POST /v1/extract     application/pdf or image bytes -> JSON
                         {pages: [{page, html, tables, metric}]}
    GET  /healthz        liveness + device platform
    GET  /metrics        counters + last per-stage ms/page
"""

from __future__ import annotations

import io
import json
import threading
import time
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Any, Dict, List, Optional


@dataclass
class _Request:
    kind: str                       # "pdf" | "image"
    payload: bytes
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None


class ExtractionService:
    """Owns the warm pipeline + the batching loop. Separable from HTTP so
    tests (and other front ends, e.g. a gRPC shim) drive it directly."""

    def __init__(self, config=None, batch_pages: int = 8,
                 max_wait_ms: float = 25.0, warm: bool = False,
                 mesh=None):
        from .pipeline.batch_runner import BatchPipeline
        from .pipeline.system import OcrSystemConfig

        self.pipeline = BatchPipeline(config or OcrSystemConfig(),
                                      batch_pages=batch_pages, mesh=mesh)
        self.batch_pages = batch_pages
        self.max_wait_ms = max_wait_ms
        self.queue: "Queue[_Request]" = Queue()
        self.counters = {"requests": 0, "pages": 0, "errors": 0,
                         "batches": 0}
        self._counter_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._batch_loop,
                                        daemon=True)
        if warm:
            self.pipeline.warm()
        self._thread.start()

    # -- request side --------------------------------------------------------

    def submit(self, kind: str, payload: bytes,
               timeout_s: float = 300.0) -> Dict[str, Any]:
        req = _Request(kind, payload)
        self._bump("requests")
        self.queue.put(req)
        if not req.done.wait(timeout_s):
            raise TimeoutError("extraction timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result  # type: ignore[return-value]

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # fail whatever is still queued so parked handlers return now
        # instead of riding out their submit timeout
        while True:
            try:
                req = self.queue.get_nowait()
            except Empty:
                break
            req.error = "service shutting down"
            self._bump("errors")
            req.done.set()

    # -- batch side -----------------------------------------------------------

    def _expand(self, req: _Request) -> List[Dict[str, Any]]:
        """One request -> page dicts for BatchPipeline.run()."""
        import numpy as np

        if req.kind == "pdf":
            import os
            import tempfile

            from .pdfio.reader import PdfDocument

            # the native reader maps a file; keep the temp alive via doc
            tmp = tempfile.NamedTemporaryFile(suffix=".pdf", delete=False)
            tmp.write(req.payload)
            tmp.close()
            try:
                doc = PdfDocument.open(tmp.name)
                pages = [{"pdf_page": doc.load_page(i), "pdf_doc": doc,
                          "page": i} for i in range(doc.page_count)]
            except Exception:
                os.unlink(tmp.name)
                raise
            for p in pages:
                p["_tmp_path"] = tmp.name
            return pages
        import cv2

        arr = np.frombuffer(req.payload, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image payload")
        return [{"image": cv2.cvtColor(img, cv2.COLOR_BGR2RGB), "page": 0}]

    def _batch_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait_ms / 1000.0
            while len(batch) < self.batch_pages:
                left = deadline - time.time()
                if left <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=left))
                except Empty:
                    break
            self._process(batch)

    def _process(self, batch: List[_Request]) -> None:
        import os

        pages, owners = [], []
        for req in batch:
            try:
                expanded = self._expand(req)
            except Exception as e:
                req.error = f"{type(e).__name__}: {e}"
                self._bump("errors")
                req.done.set()
                continue
            owners.append((req, len(pages), len(expanded)))
            pages.extend(expanded)
        try:
            if pages:
                self._bump("batches")
                self._bump("pages", len(pages))
                try:
                    results = self.pipeline.run(pages)
                except Exception as e:  # total failure: report everyone
                    for req, _lo, _n in owners:
                        req.error = f"{type(e).__name__}: {e}"
                        self._bump("errors")
                        req.done.set()
                    return
                for req, lo, n in owners:
                    outs = results[lo:lo + n]
                    req.result = {"pages": [self._render(o) for o in outs]}
                    req.done.set()
        finally:
            # per-request temp PDFs must go even when pipeline.run raises
            # (ADVICE r3: the early return leaked them on every failure)
            for p in pages:
                tmp = p.get("_tmp_path")
                if tmp and os.path.exists(tmp):
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass

    def _bump(self, key: str, n: int = 1) -> None:
        """Counters are written from every handler thread — serialize."""
        with self._counter_lock:
            self.counters[key] = self.counters.get(key, 0) + n

    @staticmethod
    def _render(out) -> Dict[str, Any]:
        return {
            "page": out.page,
            "html": out.page_html or "",
            "tables": list(out.table_html or []),
            "metric": {k: v for k, v in (out.metric or {}).items()
                       if isinstance(v, (int, float, str))},
        }


def make_server(service: ExtractionService, host: str = "127.0.0.1",
                port: int = 8400):
    from http.server import (BaseHTTPRequestHandler, ThreadingHTTPServer)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            from .utils.logging_utils import get_logger

            get_logger().debug("serve: " + fmt % args)

        def _send(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"ok": True,
                                 "platform": jax.default_backend()})
            elif self.path == "/v1/models":
                from .models import registry

                self._send(200, {t: registry.list_models(t) for t in
                                 ("detection", "recognition", "layout",
                                  "table_structure", "cls")})
            elif self.path == "/metrics":
                stats = service.pipeline.last_stats or {}
                n = max(stats.get("n_pages", 1.0), 1.0)
                self._send(200, {
                    "counters": service.counters,
                    "last_stage_ms_per_page": {
                        k: round(v / n * 1000, 1)
                        for k, v in stats.items() if k != "n_pages"}})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/debug/profile":
                # capture a jax.profiler trace of the next N seconds of
                # serving into a directory (tensorboard-readable) — the
                # production analog of bench.py's PDFTABLE_BENCH_PROFILE
                import tempfile

                q = parse_qs(url.query)
                secs = min(float(q.get("seconds", ["3"])[0]), 60.0)
                out_dir = q.get("dir", [tempfile.mkdtemp(
                    prefix="serve_profile_")])[0]
                try:
                    import jax

                    jax.profiler.start_trace(out_dir)
                    time.sleep(secs)
                    jax.profiler.stop_trace()
                    self._send(200, {"trace_dir": out_dir,
                                     "seconds": secs})
                except Exception as e:
                    self._send(500, {"error":
                                     f"{type(e).__name__}: {e}"})
                return
            if url.path != "/v1/extract":
                self._send(404, {"error": "not found"})
                return
            fmt = parse_qs(url.query).get("format", ["json"])[0]
            length = int(self.headers.get("Content-Length", 0))
            if length > 256 * 1024 * 1024:  # one request != one corpus
                self._send(413, {"error": "payload too large (256MB cap)"})
                return
            payload = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            kind = "pdf" if ("pdf" in ctype
                             or payload[:5] == b"%PDF-") else "image"
            try:
                result = service.submit(kind, payload)
                if fmt == "xlsx":
                    # every extracted table as a base64 xlsx workbook
                    # (reference OcrTableTask.to_excel analog over HTTP)
                    import base64
                    import os
                    import tempfile

                    from .utils.xlsx_writer import html_table_to_xlsx

                    books = []
                    for p in result["pages"]:
                        for t in p["tables"]:
                            fd, path = tempfile.mkstemp(suffix=".xlsx")
                            os.close(fd)
                            try:
                                html_table_to_xlsx(t, path)
                                books.append({
                                    "page": p["page"],
                                    "xlsx_b64": base64.b64encode(
                                        open(path, "rb").read()).decode()})
                            finally:
                                os.unlink(path)
                    result = {"tables": books}
                self._send(200, result)
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="pdf_table_tpu serving")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--batch_pages", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--no_warm", action="store_true",
                    help="skip compile warmup at startup")
    ap.add_argument("--mesh", default=None,
                    help="dp=N: shard page batches over N chips "
                         "(parallel/mesh.py)")
    args = ap.parse_args(argv)
    mesh = None
    if args.mesh:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(int(args.mesh.split("=")[1]))
    service = ExtractionService(batch_pages=args.batch_pages,
                                max_wait_ms=args.max_wait_ms,
                                warm=not args.no_warm, mesh=mesh)
    server = make_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port}", flush=True)

    import signal

    def _term(_sig, _frm):  # drain in-flight work, then exit cleanly
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
