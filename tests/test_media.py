"""Multimodal plumbing tests: schema, actor stage, determinism.
(The decode is a clearly-marked deterministic fake — codecs absent in this
container; the Ray-side plumbing is what is under test.)"""

import numpy as np
import pyarrow as pa
import ray.data

from osm_data_3d_tiles_ray.stages.media import (
    FEATURE_DIM,
    MediaFeatureExtractor,
    media_features,
    synth_media_table,
)


def test_media_table_schema_and_determinism():
    refs = ["atlas://facades/brick_wall_diffuse", "atlas://roofs/tiles_diffuse"]
    t1 = synth_media_table(refs)
    t2 = synth_media_table(refs)
    assert t1.equals(t2)
    assert t1.schema.field("payload").type == pa.binary()
    assert len(t1.column("payload")[0].as_py()) == (
        t1.column("width")[0].as_py() * t1.column("height")[0].as_py()
    )


def test_feature_extractor_stage():
    refs = [f"atlas://facades/tex_{i}" for i in range(10)]
    media = synth_media_table(refs)
    out = MediaFeatureExtractor()(media)
    assert out.num_rows == 10
    feat = out.column("feature")
    assert feat.type == pa.list_(pa.float32(), FEATURE_DIM)
    f = np.asarray(feat.to_pylist())
    assert f.shape == (10, FEATURE_DIM)
    assert np.isfinite(f).all()
    # deterministic across actors (fresh instance)
    out2 = MediaFeatureExtractor()(media)
    assert out.equals(out2)


def test_media_pipeline_end_to_end():
    ds = media_features("/root/testdata/sf0.001")
    df = ds.to_pandas()
    # the synthetic corpus uses 7 atlas refs
    assert len(df) == 7
    assert set(df.columns) == {"media_ref", "media_type", "feature", "thumb"}
