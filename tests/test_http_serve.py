"""S7 HTTP daemon: the reference serve.ts URL contract over stdlib
(ThreadingHTTPServer), driven by a real client (urllib) on localhost."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
import ray.data

from osm_data_3d_tiles_ray.geom.transforms import mercator_to_tile
from osm_data_3d_tiles_ray.pipelines.buildings import export_b3dm, seed_tiles
from osm_data_3d_tiles_ray.pipelines.http_serve import make_tile_server
from osm_data_3d_tiles_ray.stages.b3dm import parse_b3dm, parse_glb
from osm_data_3d_tiles_ray.synth.generator import generate_shard


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http")
    docs, bldgs = generate_shard(0, 200)
    export_dir = str(tmp / "export")
    export_b3dm(ray.data.from_arrow(docs), export_dir)
    seed_dir = str(tmp / "seed")
    seed_tiles(ray.data.from_arrow(docs), seed_dir)
    srv = make_tile_server(
        ray.data.from_arrow(docs),
        cache_dir=str(tmp / "cache"),
        export_dir=export_dir,
        seed_dir=seed_dir,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    yield base, bldgs, export_dir
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read(), dict(r.headers)


def test_tileset_json_and_cors(served):
    base, _, _ = served
    status, body, headers = _get(f"{base}/tileset.json")
    assert status == 200
    assert headers["Access-Control-Allow-Origin"] == "*"
    tree = json.loads(body)
    assert tree["root"]["children"]


def test_pregenerated_b3dm_and_subtiles_alias(served):
    base, bldgs, export_dir = served
    minx = bldgs.column("minx")[0].as_py()
    maxy = bldgs.column("maxy")[0].as_py()
    tx, ty = mercator_to_tile(np.array([minx]), np.array([maxy]))
    uri = f"16_{int(tx[0])}_{int(ty[0])}.b3dm"
    status, body, _ = _get(f"{base}/{uri}")
    assert status == 200
    parsed = parse_b3dm(body)
    assert parsed["feature_table"]["BATCH_LENGTH"] >= 1
    # subtiles/ alias + repeated slashes normalize (serve.ts:22,58)
    status2, body2, _ = _get(f"{base}//subtiles//{uri}")
    assert status2 == 200 and body2 == body
    assert (json.loads(open(f"{export_dir}/tileset.json").read()) is not None)


def test_miss_generates_valid_b3dm(served, tmp_path):
    base, bldgs, export_dir = served
    # remove one exported file → forces the on-demand path
    import os

    minx = bldgs.column("minx")[5].as_py()
    maxy = bldgs.column("maxy")[5].as_py()
    tx, ty = mercator_to_tile(np.array([minx]), np.array([maxy]))
    uri = f"16_{int(tx[0])}_{int(ty[0])}.b3dm"
    os.remove(f"{export_dir}/{uri}")
    status, body, _ = _get(f"{base}/{uri}")
    assert status == 200
    mesh = parse_glb(parse_b3dm(body)["glb"])
    assert len(mesh["position"]) % 3 == 0 and len(mesh["position"]) > 0


def test_404_and_400(served):
    base, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/16_1_1.b3dm")  # empty tile
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/whatever.txt")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/1_2.b3dm")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/nope.json")
    assert e.value.code == 404


def test_json_path_traversal_rejected(served):
    """`GET /../<x>.json` must not escape the export dir (raw socket: urllib
    would normalize the dot segments client-side)."""
    import http.client
    import pathlib

    base, _, export_dir = served
    # a .json file one level OUTSIDE the served directory
    secret = pathlib.Path(export_dir).parent / "secret.json"
    secret.write_text('{"leak": true}')
    host, port = base[len("http://") :].split(":")
    for attack in ("/../secret.json", "/../../../../etc/passwd.json"):
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        conn.putrequest("GET", attack, skip_host=True)
        conn.putheader("Host", f"{host}:{port}")
        conn.endheaders()
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status == 400, (attack, resp.status)
        assert b"leak" not in body
