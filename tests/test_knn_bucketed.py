"""Cell-bucketed kNN (scale path) recall vs the exact broadcast kNN."""

import pandas as pd

from osm_data_3d_tiles_ray.pipelines.geo import q_knn, q_knn_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_knn_high_recall_vs_exact():
    exact = q_knn(SF).to_pandas()
    approx = q_knn_bucketed(SF).to_pandas()
    e = exact.groupby("qid")["osm_id"].apply(set)
    a = approx.groupby("qid")["osm_id"].apply(set)
    joined = pd.concat([e, a], axis=1, keys=["e", "a"]).dropna()
    recalls = joined.apply(lambda r: len(r["e"] & r["a"]) / len(r["e"]), axis=1)
    # 3×3 z13 buckets cover the true neighborhood for nearly all queries
    assert recalls.mean() > 0.97, recalls.mean()
    assert (recalls > 0.5).mean() > 0.97
