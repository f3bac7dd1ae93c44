"""JSONL/CSV document sources normalize into the canonical schema and
feed the text operators unchanged."""

import json

import pyarrow as pa
import pytest

from osm_data_3d_tiles_ray.sources.text_formats import (
    read_csv_documents,
    read_jsonl_documents,
)

EXPECT_SCHEMA = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("jsonl") / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "bonjour le monde", "lang": "fr"},
        {"doc_id": 3, "text": "hello world", "lang": "en"},
    ]
    out.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(out)


def test_jsonl_normalizes_schema(jsonl_file):
    t = pa.concat_tables(
        [b for b in read_jsonl_documents(jsonl_file).iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    assert t.column_names == EXPECT_SCHEMA
    assert t.column("n_chars").to_pylist() == [11, 16, 11]  # recomputed
    assert t.column("source").to_pylist() == ["jsonl"] * 3


def test_jsonl_without_ids_gets_stable_hash_ids(tmp_path, ray_session):
    f = tmp_path / "noids.jsonl"
    f.write_text('{"text": "aaa"}\n{"text": "bbb"}\n')
    t1 = pa.concat_tables(
        [b for b in read_jsonl_documents(str(f)).iter_batches(batch_format="pyarrow")]
    )
    t2 = pa.concat_tables(
        [b for b in read_jsonl_documents(str(f)).iter_batches(batch_format="pyarrow")]
    )
    # block order is nondeterministic — compare as sorted id sets
    ids1 = sorted(t1.column("doc_id").to_pylist())
    ids2 = sorted(t2.column("doc_id").to_pylist())
    assert ids1 == ids2
    assert len(set(ids1)) == 2


def test_csv_source_feeds_text_ops(tmp_path, ray_session):
    f = tmp_path / "docs.csv"
    f.write_text("doc_id,text\n10,alpha beta\n11,gamma\n")
    ds = read_csv_documents(str(f))
    t = pa.concat_tables([b for b in ds.iter_batches(batch_format="pyarrow")])
    assert t.column_names == EXPECT_SCHEMA
    # downstream op runs unchanged: token counting via pyarrow kernel
    import pyarrow.compute as pc

    toks = pc.count_substring_regex(t.column("text").combine_chunks(), r"\S+")
    assert toks.to_pylist() == [2, 1]


def test_missing_text_column_raises(tmp_path, ray_session):
    f = tmp_path / "bad.csv"
    f.write_text("a,b\n1,2\n")
    with pytest.raises(Exception, match="text"):
        pa.concat_tables(
            [b for b in read_csv_documents(str(f)).iter_batches(batch_format="pyarrow")]
        )
