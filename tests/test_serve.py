"""HTTP serving (pdf_table_tpu/serve.py): dynamic batching over the
batched pipeline, health/metrics endpoints, error containment."""

import http.client
import json
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from pdf_table_tpu.pipeline.system import OcrSystemConfig
    from pdf_table_tpu.serve import ExtractionService, make_server

    cfg = OcrSystemConfig(use_layout=False, use_table=True,
                          use_orientation_cls=False)
    service = ExtractionService(cfg, batch_pages=4, max_wait_ms=50.0,
                                warm=False)
    srv = make_server(service, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield port, service
    srv.shutdown()
    service.close()


def _post(port, body, ctype):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/v1/extract", body,
                 {"Content-Type": ctype})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def _digital_pdf_bytes(n_pages=1):
    import io
    import os
    import tempfile

    from pdf_table_tpu.pdfio import writer

    doc = writer.PdfWriter()
    for i in range(n_pages):
        pg = doc.add_page(300, 240)
        pg.text(20, 200, f"served page {i}")
        pg.table(20, 160, [80, 80], 24, [["A", "B"], ["1", "2"]])
    fd, path = tempfile.mkstemp(suffix=".pdf")
    os.close(fd)
    doc.save(path)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


class TestServe:
    def test_healthz_and_metrics(self, server):
        port, _svc = server
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["ok"]
        conn.request("GET", "/metrics")
        r = conn.getresponse()
        assert r.status == 200
        assert "counters" in json.loads(r.read())

    def test_extract_digital_pdf(self, server):
        port, _svc = server
        status, out = _post(port, _digital_pdf_bytes(2), "application/pdf")
        assert status == 200
        assert len(out["pages"]) == 2
        assert any("served page" in p["html"] for p in out["pages"])
        assert any("<table" in t for p in out["pages"]
                   for t in p["tables"]) or \
            any("<table" in p["html"] for p in out["pages"])

    def test_bad_payload_contained(self, server):
        port, svc = server
        status, out = _post(port, b"not an image", "image/png")
        assert status == 500 and "error" in out
        # the service survives and keeps serving
        status, _ = _post(port, _digital_pdf_bytes(1), "application/pdf")
        assert status == 200

    def test_concurrent_requests_batch_together(self, server):
        port, svc = server
        before = svc.counters["batches"]
        body = _digital_pdf_bytes(1)
        results = []

        def post():
            results.append(_post(port, body, "application/pdf"))

        ts = [threading.Thread(target=post) for _ in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        assert all(s == 200 for s, _ in results) and len(results) == 3
        # 3 one-page requests arriving together should use fewer than 3
        # pipeline batches (dynamic batching); allow 2 for scheduling luck
        assert svc.counters["batches"] - before <= 2

    def test_xlsx_format(self, server):
        port, _svc = server
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/v1/extract?format=xlsx",
                     _digital_pdf_bytes(1),
                     {"Content-Type": "application/pdf"})
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert out["tables"], "expected at least one xlsx table"
        import base64
        blob = base64.b64decode(out["tables"][0]["xlsx_b64"])
        assert blob[:2] == b"PK"  # zip container

    def test_profile_endpoint(self, server, tmp_path):
        port, _svc = server
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST",
                     f"/debug/profile?seconds=0.2&dir={tmp_path}/prof")
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        import os
        assert os.path.isdir(out["trace_dir"])

    def test_extract_image_payload(self, server):
        import cv2
        import numpy as np

        port, _svc = server
        img = np.full((120, 100, 3), 255, np.uint8)
        img[30:42, 10:90] = 30
        ok, buf = cv2.imencode(".png", img)
        assert ok
        status, out = _post(port, buf.tobytes(), "image/png")
        assert status == 200
        assert len(out["pages"]) == 1
        assert "html" in out["pages"][0]

    def test_models_endpoint(self, server):
        port, _svc = server
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/v1/models")
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert "Lore" in out["table_structure"]
        assert "PP-OCRv4_det" in out["detection"]

    def test_payload_cap(self, server):
        port, _svc = server
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/v1/extract")
        conn.putheader("Content-Type", "application/pdf")
        conn.putheader("Content-Length", str(300 * 1024 * 1024))
        conn.endheaders()
        r = conn.getresponse()
        assert r.status == 413


class TestServeShutdown:
    def test_close_fails_pending_requests(self):
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.serve import ExtractionService, _Request

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False)
        svc = ExtractionService(cfg, batch_pages=2, max_wait_ms=5.0,
                                warm=False)
        svc._stop.set()          # wedge the batcher first
        svc._thread.join(timeout=5)
        req = _Request("pdf", b"%PDF-bogus")
        svc.queue.put(req)
        svc.close()
        assert req.done.is_set() and req.error == "service shutting down"


class TestTempCleanupOnFailure:
    def test_pipeline_crash_still_unlinks_temp_pdfs(self, tmp_path):
        """ADVICE r3: a pipeline.run exception used to early-return past
        the temp-PDF cleanup loop, leaking a file per failed batch."""
        import os

        from pdf_table_tpu.pdfio import writer
        from pdf_table_tpu.pipeline.system import OcrSystemConfig
        from pdf_table_tpu.serve import ExtractionService, _Request

        cfg = OcrSystemConfig(use_layout=False, use_table=False,
                              use_orientation_cls=False)
        svc = ExtractionService(cfg, batch_pages=2, max_wait_ms=5.0,
                                warm=False)
        svc._stop.set()
        svc._thread.join(timeout=5)
        try:
            doc = writer.PdfWriter()
            doc.add_page(200, 200).text(20, 100, "x")
            src = tmp_path / "t.pdf"
            doc.save(str(src))

            pages = svc._expand(_Request("pdf", src.read_bytes()))
            tmp_file = pages[0]["_tmp_path"]
            assert os.path.exists(tmp_file)

            svc._expand = lambda req: pages
            def boom(_pages):
                raise RuntimeError("injected pipeline failure")
            svc.pipeline.run = boom

            req = _Request("pdf", b"ignored")
            svc._process([req])
            assert req.done.is_set()
            assert "injected pipeline failure" in (req.error or "")
            assert not os.path.exists(tmp_file), "temp PDF leaked"
            assert svc.counters["errors"] >= 1
        finally:
            svc.close()
