"""Brute-force oracles for the round-4 session-E operators: session path
analysis, the deterministic hash-priority reservoir sample, rule-based
domain classification, and haversine distance bands.  Each runs the full
Ray pipeline at sf0.001 and compares against an independent single-process
Python reference (the DuckDB oracles additionally check all four at
sf0.01 through the driver)."""

import math

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _to_pandas(ds):
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


def test_session_paths_matches_pandas(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import session_paths

    got = (
        _to_pandas(session_paths(SF_DIR))
        .sort_values("path")
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    gap = pd.Timedelta(minutes=30)
    new_user = ev["user_id"].ne(ev["user_id"].shift())
    silent = ev["ts"].diff() > gap
    sess = (new_user | silent).cumsum()
    ev = ev.assign(sess=sess)
    ev["pos"] = ev.groupby("sess").cumcount()
    paths = (
        ev[ev["pos"] < 8]
        .groupby("sess")["event_type"]
        .agg(">".join)
        .value_counts()
        .rename_axis("path")
        .rename("n_sessions")
        .reset_index()
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert len(got) == len(paths)
    assert got["path"].tolist() == paths["path"].tolist()
    assert got["n_sessions"].tolist() == paths["n_sessions"].tolist()


def test_reservoir_sample_matches_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.geom.rng import jenkins_mix
    from osm_data_3d_tiles_ray.pipelines.sampling import reservoir_sample

    got = (
        _to_pandas(reservoir_sample(SF_DIR, k=25, tag=57))
        .sort_values(["h", "doc_id"])
        .reset_index(drop=True)
    )
    ids = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    key = ids.astype(np.uint64)
    tagmix = np.uint32((57 * 2654435761) & 0xFFFFFFFF)
    h = jenkins_mix(key.astype(np.uint32) ^ tagmix)
    h = jenkins_mix(h ^ (key >> np.uint64(32)).astype(np.uint32)).astype(
        np.int64
    )
    order = np.lexsort((ids, h))[:25]
    assert got["doc_id"].tolist() == ids[order].tolist()
    assert got["h"].tolist() == h[order].tolist()
    # sample is uniform-ish and deterministic: rerun gives identical rows
    again = (
        _to_pandas(reservoir_sample(SF_DIR, k=25, tag=57))
        .sort_values(["h", "doc_id"])
        .reset_index(drop=True)
    )
    assert again.equals(got)


def test_domain_mix_matches_re_reference(ray_session):
    import re

    from osm_data_3d_tiles_ray.pipelines.corpus_stats import (
        _DOMAIN_TAXONOMY,
        domain_mix,
    )

    got = (
        _to_pandas(domain_mix(SF_DIR))
        .sort_values(["source", "topic"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["text", "source"]
    )
    pats = [
        (t, [re.compile(rf"\b{kw}\b") for kw in kws])
        for t, kws in _DOMAIN_TAXONOMY
    ]
    tok = re.compile(r"\S+")
    rows = []
    for text, source in zip(docs["text"], docs["source"]):
        hits = [sum(len(p.findall(text)) for p in ps) for _, ps in pats]
        topic = "other" if max(hits) == 0 else pats[int(np.argmax(hits))][0]
        rows.append((source, topic, len(tok.findall(text))))
    ref = (
        pd.DataFrame(rows, columns=["source", "topic", "tokens"])
        .groupby(["source", "topic"])
        .agg(n_docs=("tokens", "size"), n_tokens=("tokens", "sum"))
        .reset_index()
        .sort_values(["source", "topic"])
        .reset_index(drop=True)
    )
    assert got["source"].tolist() == ref["source"].tolist()
    assert got["topic"].tolist() == ref["topic"].tolist()
    assert got["n_docs"].tolist() == ref["n_docs"].tolist()
    assert got["n_tokens"].tolist() == ref["n_tokens"].tolist()


def test_distance_bands_matches_scalar_haversine(ray_session):
    from osm_data_3d_tiles_ray.constants import WORLD_HALF
    from osm_data_3d_tiles_ray.pipelines.geo import (
        _BAND_CM,
        _landmark_lonlat,
        q_distance_bands,
    )
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    got = (
        _to_pandas(q_distance_bands(SF_DIR))
        .sort_values("band")
        .reset_index(drop=True)
    )
    root = ensure_synth(0.001)
    b = pd.read_parquet(
        f"{root}/buildings", columns=["centroid_x", "centroid_y"]
    )
    lon0, lat0, coslat0 = _landmark_lonlat()
    acc = {}
    for cx, cy in zip(b["centroid_x"], b["centroid_y"]):
        if not (math.isfinite(cx) and math.isfinite(cy)):
            continue
        lon = cx / WORLD_HALF * math.pi
        lat = 2.0 * math.atan(math.exp(cy / WORLD_HALF * math.pi)) - math.pi / 2.0
        sp = math.sin((lat - lat0) / 2.0)
        sl = math.sin((lon - lon0) / 2.0)
        a = sp * sp + coslat0 * math.cos(lat) * sl * sl
        d_cm = int(math.floor(2.0 * 6371000.0 * math.asin(math.sqrt(a)) * 100.0 + 0.5))
        band = d_cm // _BAND_CM
        n, s = acc.get(band, (0, 0))
        acc[band] = (n + 1, s + d_cm)
    ref = sorted(acc.items())
    assert got["band"].tolist() == [k for k, _ in ref]
    assert got["n_buildings"].tolist() == [v[0] for _, v in ref]
    assert got["sum_dist_cm"].tolist() == [v[1] for _, v in ref]
