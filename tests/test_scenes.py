"""Scene-segmentation tests — multimodal/video.py scene_segments and
the scene-structured fixture."""

from __future__ import annotations

import numpy as np

from dedup_spark.fixtures.av import (
    encode_rawv,
    generate_scene_video_corpus,
)
from dedup_spark.multimodal.video import scene_segments


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, n_frames int"
    )


def test_runs_by_hand(spark):
    # frames: A A B A C C C -> scenes [2,1,1,3], longest 3
    uniq = np.stack(
        [np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    )
    frames = uniq[[0, 0, 1, 0, 2, 2, 2]]
    row = scene_segments(
        _df(spark, [("v1", encode_rawv(frames), 2, 2, 7)])
    ).collect()[0]
    assert row["n_frames"] == 7
    assert row["n_scenes"] == 4
    assert row["longest_run"] == 3
    assert not row["is_static"]


def test_static_and_single_frame(spark):
    same = np.full((5, 2, 2, 3), 7, dtype=np.uint8)
    one = np.full((1, 2, 2, 3), 9, dtype=np.uint8)
    got = {
        r["video_id"]: r
        for r in scene_segments(
            _df(
                spark,
                [
                    ("static", encode_rawv(same), 2, 2, 5),
                    ("single", encode_rawv(one), 2, 2, 1),
                ],
            )
        ).collect()
    }
    assert got["static"]["n_scenes"] == 1 and got["static"]["is_static"]
    assert got["static"]["longest_run"] == 5
    assert got["single"]["n_scenes"] == 1 and got["single"]["is_static"]


def test_fixture_ground_truth_recovered(spark):
    corpus = generate_scene_video_corpus(n_base=12, seed=7)
    df = spark.createDataFrame(
        corpus.videos,
        "video_id string, bytes binary, w int, h int, n_frames int,"
        " fmt string",
    )
    got = {r["video_id"]: r for r in scene_segments(df).collect()}
    assert set(got) == set(corpus.scene_runs)
    for vid, lens in corpus.scene_runs.items():
        assert got[vid]["n_scenes"] == len(lens), vid
        assert got[vid]["n_frames"] == sum(lens), vid
        assert got[vid]["longest_run"] == max(lens), vid
        assert got[vid]["is_static"] == (len(lens) == 1), vid
    # the edge shapes exist in the corpus
    kinds = {len(v) == 1 for v in corpus.scene_runs.values()}
    assert kinds == {True, False}
