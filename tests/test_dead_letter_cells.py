"""Dead-lettered rows (geom_valid=False, NaN bbox) must not leak phantom
tile cells into assignment / Build3D output (mercator_to_tile(NaN) casts
NaN→int32 garbage — tile -2147483648, cell 13835058055282163712)."""

import numpy as np
import pyarrow as pa

from osm_data_3d_tiles_ray.stages.assign import candidate_tiles
from osm_data_3d_tiles_ray.stages.build3d import Build3DStats
from osm_data_3d_tiles_ray.stages.parse import parse_documents
from osm_data_3d_tiles_ray.synth.generator import generate_shard

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


def _with_garbage_doc() -> pa.Table:
    """20 valid synth docs + 1 garbage-geometry doc that dead-letters."""
    docs, _ = generate_shard(7, 20)
    bad = pa.table(
        {
            "doc_id": pa.array(["garbage0"]),
            "spans": pa.array(
                [
                    [
                        {
                            "kind": "geom",
                            "text": "not numbers at all ;;;",
                            "media_ref": "",
                            "offset": 0,
                        }
                    ]
                ],
                type=SPANS_TYPE,
            ),
        }
    )
    docs = docs.select(["doc_id", "spans"])
    return pa.concat_tables([docs, bad.cast(docs.schema)])


def test_build3d_drops_dead_letter_rows():
    parsed = parse_documents(_with_garbage_doc(), keep_spans=False)
    gv = parsed.column("geom_valid").to_numpy(zero_copy_only=False)
    assert (~gv).sum() >= 1  # the garbage doc dead-lettered
    out = Build3DStats()(parsed)
    assert out.num_rows == int(gv.sum())
    for col in ("tile_x", "tile_y"):
        v = out.column(col).to_numpy(zero_copy_only=False)
        assert (np.abs(v) < 2**20).all(), f"phantom tile in {col}"
    cells = out.column("cell_id").to_numpy(zero_copy_only=False)
    # zoom bits (58..63) must be the leaf zoom, morton must fit 2*16 bits —
    # the NaN-cast phantom cell had garbage in both fields
    assert ((cells >> np.uint64(58)) == 16).all()
    morton = cells & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    assert (morton < np.uint64(1) << np.uint64(32)).all()


def test_candidate_tiles_drops_nan_bbox_rows():
    parsed = parse_documents(_with_garbage_doc(), keep_spans=False)
    cands = candidate_tiles(parsed)
    n_valid = int(parsed.column("geom_valid").to_numpy(zero_copy_only=False).sum())
    ids = set(cands.column("osm_id").to_pylist())
    assert len(ids) == n_valid
    tx = cands.column("tile_x").to_numpy(zero_copy_only=False)
    assert (np.abs(tx) < 2**20).all()
