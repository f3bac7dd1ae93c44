"""Oracles for sampling-over-join and RLE run statistics."""

import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_data_3d_tiles_ray.geom.rng import jenkins_mix
from osm_data_3d_tiles_ray.pipelines import sampling, storage
from osm_data_3d_tiles_ray.synth.generator import ensure_synth, sf_from_dir

SF = "/root/testdata/sf0.001"


def _buildings() -> pd.DataFrame:
    root = ensure_synth(sf_from_dir(SF))
    return pd.concat(
        [
            pq.read_table(f).to_pandas()
            for f in sorted(glob.glob(f"{root}/buildings/*.parquet"))
        ]
    )


def test_range_join_sample_matches_bruteforce():
    got = (
        sampling.range_join_sample(SF)
        .to_pandas()
        .sort_values(["osm_id_a", "osm_id_b"])
        .reset_index(drop=True)
    )
    b = _buildings()
    cx = np.floor(b["centroid_x"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    cy = np.floor(b["centroid_y"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    oid = b["osm_id"].to_numpy().astype(np.int64)
    r = np.int64(2_000_000_000)  # density-scaled default at sf0.001
    ii, jj = np.nonzero(
        (np.abs(cx[:, None] - cx[None, :]) <= r)
        & (np.abs(cy[:, None] - cy[None, :]) <= r)
        & (oid[:, None] < oid[None, :])
    )
    a, bb = oid[ii], oid[jj]
    key = a * np.int64(1000003) + bb
    tagmix = np.uint32((91 * 2654435761) & 0xFFFFFFFF)
    h = jenkins_mix(key.astype(np.uint64).astype(np.uint32) ^ tagmix)
    h = jenkins_mix(h ^ (key.astype(np.uint64) >> np.uint64(32)).astype(np.uint32))
    keep = h.astype(np.int64) * 20 < 4294967296
    exp = (
        pd.DataFrame(
            {
                "osm_id_a": a[keep],
                "osm_id_b": bb[keep],
                "h": h.astype(np.int64)[keep],
            }
        )
        .sort_values(["osm_id_a", "osm_id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # ~1/20 of the candidate pairs survive
    n_pairs = len(a)
    assert 0.03 < len(got) / n_pairs < 0.08


def test_rle_run_stats_matches_bruteforce():
    got = storage.rle_run_stats(SF).to_pandas().iloc[0]
    b = _buildings().sort_values("osm_id")
    v = b["roof_type"].fillna("\x01").to_numpy().astype(str)
    runs = 1 + int((v[1:] != v[:-1]).sum())
    assert got["n_rows"] == len(b)
    assert got["runs_storage_order"] == runs
    assert got["runs_value_order"] == len(np.unique(v))
    assert got["permute_gain_e6"] == runs * 1_000_000 // len(np.unique(v))


def test_source_vocab_overlap_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import overlap

    got = overlap.source_vocab_overlap(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    vocab = {}
    for src, sub in docs.groupby("source"):
        vocab[src] = set(w for t in sub["text"] for w in t.split(" ") if w)
    srcs = sorted(vocab)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            c = len(vocab[a] & vocab[b])
            if c == 0:
                continue
            na, nb = len(vocab[a]), len(vocab[b])
            rows.append(
                (a, b, c, na, nb, c * 1_000_000 // na,
                 c * 1_000_000 // (na + nb - c))
            )
    exp = pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_common", "n_a", "n_b",
                 "containment_a_e6", "jaccard_e6"],
    )
    num = [c for c in exp.columns if not c.startswith("source")]
    pd.testing.assert_frame_equal(
        got.sort_values(["source_a", "source_b"]).reset_index(drop=True)
        .astype({c: "int64" for c in num}),
        exp.sort_values(["source_a", "source_b"]).reset_index(drop=True)
        .astype({c: "int64" for c in num}),
    )
    assert (got["jaccard_e6"] <= 1_000_000).all()
