"""Parser fuzzing: arbitrary span sequences must never crash the decoder,
and the span-sequence invariant must hold on whatever comes back."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_data_3d_tiles_ray.stages.parse import parse_documents, span_signature

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

span = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "tag", "geom", "media", "junk", ""]),
        "text": st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
        ),
        "media_ref": st.text(max_size=20),
        "offset": st.integers(-(2**31), 2**31 - 1),
    }
)

docs_strategy = st.lists(st.lists(span, max_size=8), min_size=1, max_size=12)


@settings(max_examples=120, deadline=None)
@given(docs_strategy)
def test_parser_never_crashes_and_preserves_spans(rows):
    table = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "spans": pa.array(rows, type=SPANS_TYPE),
        }
    )
    out = parse_documents(table, keep_spans=True)
    assert out.num_rows == len(rows)
    assert span_signature(out).to_pylist() == span_signature(table).to_pylist()
    # geom_valid is a clean bool column regardless of garbage input
    gv = out.column("geom_valid").to_pylist()
    assert all(isinstance(v, bool) for v in gv)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False), st.floats(-1e6, 1e6, allow_nan=False)
        ),
        min_size=0,
        max_size=10,
    )
)
def test_parser_geom_span_fuzz(points):
    """Arbitrary coordinate text in a geom span: parse or dead-letter, never crash."""
    text = ";".join(f"{x} {y}" for x, y in points)
    rows = [
        [
            {"kind": "tag", "text": "osm_id=1", "media_ref": "", "offset": 0},
            {"kind": "geom", "text": text, "media_ref": "", "offset": 1},
        ]
    ]
    table = pa.table(
        {"doc_id": pa.array(["d0"]), "spans": pa.array(rows, type=SPANS_TYPE)}
    )
    out = parse_documents(table)
    assert out.num_rows == 1


def test_non_numeric_tag_values_dead_lettered():
    rows = [
        [
            {"kind": "tag", "text": "osm_id=abc", "media_ref": "", "offset": 0},
            {"kind": "tag", "text": "height=tall", "media_ref": "", "offset": 1},
            {"kind": "tag", "text": "levels=2", "media_ref": "", "offset": 2},
            {"kind": "tag", "text": "roof_height=nan", "media_ref": "", "offset": 3},
            {"kind": "tag", "text": "min_height=1e99999", "media_ref": "", "offset": 4},
        ]
    ]
    table = pa.table(
        {"doc_id": pa.array(["d0"]), "spans": pa.array(rows, type=SPANS_TYPE)}
    )
    out = parse_documents(table)
    assert out.column("osm_id").to_pylist() == [None]
    assert out.column("height").to_pylist() == [None]
    assert out.column("levels").to_pylist() == [2.0]
