"""CLI smoke tests (subprocess — the CLI owns its own Ray session)."""

import json
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "osm_data_3d_tiles_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=280,
    )


def test_pack_textures(tmp_path):
    out = tmp_path / "frames.parquet"
    r = _run("pack-textures", "--out", str(out))
    assert r.returncode == 0, r.stderr[-500:]
    assert out.exists()
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 25
    assert set(t.column_names) == {"texture_id", "x", "y", "w", "h"}


def test_seed_and_generate_tileset(tmp_path):
    out = tmp_path / "seed"
    r = _run("seed-b3dm", "--sf", "0.001", "--out", str(out))
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["tiles"] == 1385 and res["partitions"] == 63
    r2 = _run("generate-tileset", "--out", str(out), "--projection", "ecef")
    assert r2.returncode == 0, r2.stderr[-500:]
    assert (out / "tileset.json").exists()


def test_serve_tile_cache(tmp_path):
    # doc 0's winner tile (deterministic corpus); second call is a cache hit
    r = _run(
        "serve-tile", "--tile_coord", "16/33585/23430",
        "--out", str(tmp_path / "cache"), "--sf", "0.001",
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["bytes"] > 1000
    # miss → 404-equivalent exit code
    r2 = _run(
        "serve-tile", "--tile_coord", "16/1/1",
        "--out", str(tmp_path / "cache"), "--sf", "0.001",
    )
    assert r2.returncode == 4


def test_run_query_cli(tmp_path):
    r = _run("run-query", "--list")
    assert r.returncode == 0, r.stderr[-500:]
    names = json.loads(r.stdout.strip().splitlines()[-1])
    assert "tf_idf" in names and "geo_parse" in names

    r = _run(
        "run-query", "text_stats", "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(tmp_path / "q"),
    )
    assert r.returncode == 0, r.stderr[-500:]
    import pyarrow.parquet as pq

    assert pq.read_table(str(tmp_path / "q")).num_rows > 0

    r = _run("run-query", "no_such_query")
    assert r.returncode == 2


def test_write_subtrees_cli(tmp_path):
    out = tmp_path / "implicit"
    r = _run("write-subtrees", "--sf", "0.001", "--out", str(out))
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["subtrees"] == 63 and res["tiles"] == 1385
    assert (out / "tileset.json").exists()
    from osm_data_3d_tiles_ray.stages.subtree import decode_subtree

    frags = sorted(out.glob("subtrees/*/0/0/0.subtree"))
    assert len(frags) == 63
    total = sum(decode_subtree(f.read_bytes())["n_tiles"] for f in frags)
    assert total == 1385
