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


def test_frame_sampler_brute_force(ray_session):
    import numpy as np

    from osm_data_3d_tiles_ray.stages.media import (
        _FRAME_H,
        _FRAME_W,
        media_frame_sample,
        synth_video_table,
    )

    got = media_frame_sample("/root/testdata/sf0.001", stride=4).to_pandas()
    assert len(got) > 0
    # brute-force one ref end-to-end
    refs = sorted(got.media_ref.unique())
    vt = synth_video_table(refs)
    for i, ref in enumerate(refs[:3]):
        p = vt.column("payload")[i].as_py()
        nf = vt.column("n_frames")[i].as_py()
        fps = vt.column("fps")[i].as_py()
        frames = np.frombuffer(p, dtype=np.uint8).reshape(nf, _FRAME_H, _FRAME_W)
        idx = np.arange(0, nf, 4)
        sub = got[got.media_ref == ref].sort_values("frame_idx")
        assert sub.frame_idx.tolist() == idx.tolist()
        assert sub.ts_ms.tolist() == (idx * 1000 // fps).tolist()
        means = frames[idx].reshape(len(idx), -1).mean(axis=1)
        want = np.floor(means * 1e4 + 0.5).astype(np.int64)
        assert sub.mean_intensity_e4.tolist() == want.tolist()
    # every ref contributes ceil(n_frames / stride) rows
    counts = got.groupby("media_ref").size()
    nf_of = dict(zip(vt.column("media_ref").to_pylist(), vt.column("n_frames").to_pylist()))
    for ref, c in counts.items():
        assert c == -(-nf_of[ref] // 4)


def test_audio_windows_brute_force(ray_session):
    import numpy as np

    from osm_data_3d_tiles_ray.stages.media import (
        AudioWindowAnalyzer,
        media_audio_windows,
        synth_audio_table,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        media_audio_windows(sf)
        .to_pandas()
        .sort_values(["media_ref", "win_idx"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    # per-ref brute force over the same deterministic store
    refs = sorted(got.media_ref.unique())
    store = synth_audio_table(refs).to_pandas().set_index("media_ref")
    for ref in refs[:5]:
        s = np.frombuffer(store.loc[ref].payload, dtype=np.uint8).astype(
            np.int64
        ) - 128
        sub = got[got.media_ref == ref]
        n_win = 1 + (len(s) - 256) // 128
        assert len(sub) == n_win
        for i in (0, n_win - 1):
            w = s[i * 128 : i * 128 + 256]
            row = sub[sub.win_idx == i].iloc[0]
            assert row.energy == int((w * w).sum())
            sign = w >= 0
            assert row.zero_crossings == int((sign[1:] != sign[:-1]).sum())
            assert row.start_ms == (i * 128 * 1000) // 8000
    # batch-size invariance of the explode stage
    import ray.data

    audio = synth_audio_table(refs)
    a = (
        ray.data.from_arrow(audio)
        .map_batches(AudioWindowAnalyzer, batch_format="pyarrow",
                     concurrency=2, batch_size=4)
        .to_pandas()
        .sort_values(["media_ref", "win_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, got)
