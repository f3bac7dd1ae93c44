"""Golden snapshot regression (SURVEY.md §5.3): the full per-building
geometry output at a fixed corpus slice is pinned by hash — any semantic
change to parse/normalize/roof/walls shows up here.

Regenerate deliberately (after an INTENDED semantics change) with the
snippet in the git history of tests/golden/build3d_1000.json.
"""

import hashlib
import json
from pathlib import Path

import numpy as np

from osm_data_3d_tiles_ray.stages.build3d import Build3DStats
from osm_data_3d_tiles_ray.stages.parse import parse_documents
from osm_data_3d_tiles_ray.synth.generator import generate_shard

GOLDEN = json.loads((Path(__file__).parent / "golden" / "build3d_1000.json").read_text())


def test_build3d_matches_golden_snapshot():
    docs, _ = generate_shard(0, 1000)
    out = Build3DStats()(parse_documents(docs, keep_spans=False))
    assert out.num_rows == GOLDEN["n_rows"]
    assert int(sum(out.column("vertex_count").to_pylist())) == GOLDEN["total_vertices"]
    kinds, counts = np.unique(
        np.array(out.column("roof_type_used").to_pylist()), return_counts=True
    )
    assert {k: int(v) for k, v in zip(kinds, counts)} == GOLDEN["roof_counts"]

    rows = []
    for i in range(out.num_rows):
        rows.append(
            [
                out.column("osm_id")[i].as_py(),
                out.column("tile_x")[i].as_py(),
                out.column("tile_y")[i].as_py(),
                out.column("roof_type_used")[i].as_py(),
                out.column("wall_vertices")[i].as_py(),
                out.column("roof_vertices")[i].as_py(),
                out.column("cap_vertices")[i].as_py(),
                [
                    None if v is None or not np.isfinite(v) else round(v, 6)
                    for v in (
                        out.column(c)[i].as_py()
                        for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
                    )
                ],
            ]
        )
    blob = json.dumps(rows, separators=(",", ":")).encode()
    assert hashlib.sha256(blob).hexdigest() == GOLDEN["sha256"]
