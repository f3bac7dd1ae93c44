"""HTTP tile daemon (S7) — the reference's ``serve.ts`` surface on stdlib.

URL contract (``/root/reference/serve.ts:31-96``):

* ``GET /<name>.json`` (and ``/subtiles/<name>.json``) → tileset JSON from
  the export directory, 404 when absent;
* ``GET /<z>_<x>_<y>.b3dm`` → the pre-generated file when present (the
  cache-hit path, serve.ts:68-73), else generated on demand through
  :func:`..pipelines.serve.get_or_build_tile` (worker-pool analog) and
  wrapped as a spec-layout b3dm;
* anything else → 400 ``Invalid path``; empty tiles → 404; repeated
  slashes collapse; ``subtiles/`` prefix strips; CORS ``*`` on every
  response.

The daemon is a ``ThreadingHTTPServer``; misses run Ray Dataset jobs from
handler threads against the seed partition index (one z12 fragment read,
not a corpus scan)."""

from __future__ import annotations

import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from ..stages.b3dm import build_b3dm, build_glb
from ..stages.encode import decode_tile
from .serve import get_or_build_tile


def _ot3d_to_b3dm(payload: bytes) -> bytes:
    """Engine cache payload (quantized OT3D) → spec b3dm for the wire."""
    dec = decode_tile(payload)
    glb = build_glb(
        np.asarray(dec["position"], dtype=np.float32),
        np.asarray(dec["normal"], dtype=np.float32),
        np.asarray(dec["uv"], dtype=np.float32),
        np.asarray(dec["batch_id"], dtype=np.uint16),
    )
    header = dec["header"]
    return build_b3dm(glb, header["featureTable"], header.get("batchTable"))


def make_tile_server(
    documents,
    cache_dir: str,
    export_dir: str | None = None,
    seed_dir: str | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (not start) the daemon; ``port=0`` picks an ephemeral port."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            path = re.sub(r"/{2,}", "/", self.path).lstrip("/")
            if path.startswith("subtiles/"):
                path = path[len("subtiles/") :]
            if path.endswith(".json"):
                base = Path(export_dir) if export_dir else Path(cache_dir)
                f = (base / path).resolve()
                # containment check: the request path is client-controlled,
                # so `../` segments must never escape the export/cache dir
                if not f.is_relative_to(base.resolve()):
                    self._reply(400, b"Invalid path", "text/plain")
                    return
                if not f.exists():
                    self._reply(404, b'{"error": "File not found"}', "application/json")
                    return
                self._reply(200, f.read_bytes(), "application/json")
                return
            if not path.endswith(".b3dm"):
                self._reply(400, b"Invalid path", "text/plain")
                return
            parts = path[: -len(".b3dm")].split("_")
            if len(parts) != 3:
                self._reply(400, b"Invalid path", "text/plain")
                return
            try:
                z, x, y = (int(v) for v in parts)
            except ValueError:
                self._reply(400, b"Invalid path", "text/plain")
                return
            if export_dir:
                pre = Path(export_dir) / path
                if pre.exists():  # pre-generated b3dm (serve.ts:68-73)
                    self._reply(200, pre.read_bytes(), "application/octet-stream")
                    return
            if z != 16:
                self._reply(400, b"Invalid path", "text/plain")
                return
            payload = get_or_build_tile(
                documents, x, y, cache_dir, seed_dir=seed_dir
            )
            if payload is None:
                self._reply(404, b"tile has no buildings", "text/plain")
                return
            self._reply(200, _ot3d_to_b3dm(payload), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(documents, cache_dir: str, **kw) -> None:
    srv = make_tile_server(documents, cache_dir, **kw)
    print(json.dumps({"serving": f"http://{srv.server_address[0]}:{srv.server_address[1]}"}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
