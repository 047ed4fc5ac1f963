"""The REAL fetch path (mapInPandas + thread pool + urllib) driven
end-to-end through Spark against a loopback HTTP server — statuses,
bodies, content-type routing, redirects, 404s, timeouts, and per-host
pacing all exercised for real (SURVEY.md A6/H3/H7)."""

import http.server
import threading
import time

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.imagecodec import encode_png
from web_scraper_spark.sources.fetch import fetch_live
from web_scraper_spark.sources.synthetic_web import image_pixels

PNG_BYTES = encode_png(image_pixels("live", 8, 6))
HTML = b"<html><body><a href='tel:+1 (212) 555-0101'>call</a></body></html>"


class Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/page":
            self._send(200, "text/html", HTML)
        elif self.path == "/image.png":
            self._send(200, "image/png", PNG_BYTES)
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/page")
            self.end_headers()
        elif self.path == "/missing":
            self.send_error(404)
        elif self.path == "/slow":
            time.sleep(3.0)  # beyond the test timeout -> sentinel 0
            self._send(200, "text/html", HTML)
        else:
            self.send_error(404)

    def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_fetch_statuses_and_routing(spark, server):
    frontier = spark.createDataFrame(
        [
            (f"{server}/page", "127.0.0.1"),
            (f"{server}/image.png", "127.0.0.1"),
            (f"{server}/redirect", "127.0.0.1"),
            (f"{server}/missing", "127.0.0.1"),
            (f"{server}/slow", "127.0.0.1"),
        ],
        "url string, host string",
    )
    rows = {r.url.rsplit("/", 1)[1]: r for r in
            fetch_live(frontier, timeout_s=1.0).collect()}

    assert rows["page"].status == 200
    assert "text/html" in rows["page"].content_type
    assert bytes(rows["page"].body) == HTML

    assert rows["image.png"].status == 200
    assert rows["image.png"].content_type.startswith("image/")
    assert bytes(rows["image.png"].body) == PNG_BYTES  # graft route intact

    # redirects followed (web_fetcher.py follows by default)
    assert rows["redirect"].status == 200
    assert bytes(rows["redirect"].body) == HTML

    # HTTP error -> status recorded, no body, NO retry (H7)
    assert rows["missing"].status == 404 and rows["missing"].body is None
    # timeout -> sentinel 0
    assert rows["slow"].status == 0 and rows["slow"].body is None


def test_live_fetch_honors_crawl_delay(spark, server):
    # 4 URLs to one host with 0.4s delay, single partition -> >= 1.2s
    frontier = spark.createDataFrame(
        [(f"{server}/page?i={i}" if False else f"{server}/page", "127.0.0.1")
         for i in range(4)],
        "url string, host string",
    ).coalesce(1)
    t0 = time.monotonic()
    out = fetch_live(frontier, {"127.0.0.1": 0.4}, timeout_s=5.0).collect()
    elapsed = time.monotonic() - t0
    assert len(out) == 4 and all(r.status == 200 for r in out)
    assert elapsed >= 1.2, elapsed
