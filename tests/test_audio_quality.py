"""Audio silence/clipping tests — multimodal/audio.py
audio_quality_report and the defect-structured fixture."""

from __future__ import annotations

import numpy as np

from dedup_spark.fixtures.av import (
    AUDIO_WINDOW,
    SILENCE_ENERGY,
    generate_audio_quality_corpus,
)
from dedup_spark.multimodal.audio import audio_quality_report

SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int,"
    " fmt string"
)


def _row(aid, samples):
    s = np.asarray(samples, dtype="<i2")
    return (aid, s.tobytes(), 16000, len(s), "pcm16")


def test_hand_built_defects(spark):
    w = AUDIO_WINDOW
    loud = np.full(w, 10_000, dtype=np.int64)
    silent = np.zeros(w, dtype=np.int64)
    clipped = loud.copy()
    clipped[5:8] = 32767
    clipped[100] = -32767
    # 4 windows: loud, silent, clipped, loud + a ragged quiet tail of
    # 10 samples (excluded from window stats, included in clip stats)
    samples = np.concatenate([loud, silent, clipped, loud, np.zeros(10)])
    df = spark.createDataFrame([_row("a", samples)], SCHEMA)
    r = audio_quality_report(df).collect()[0]
    assert r["n_windows"] == 4
    assert r["n_silent"] == 1 and r["silence_ratio"] == 0.25
    assert r["n_clipped"] == 4
    assert r["clip_ratio"] == round(4 / (4 * w + 10), 6)
    assert r["peak"] == 32767


def test_tie_rounding_is_half_away(spark):
    # 8 clipped of 1024 samples = 0.0078125 exactly: must round AWAY
    # (0.007813), matching Spark/DuckDB, not Python banker's 0.007812
    w = AUDIO_WINDOW
    x = np.full(4 * w, 9_000, dtype=np.int64)
    x[:8] = 32767
    df = spark.createDataFrame([_row("t", x)], SCHEMA)
    r = audio_quality_report(df).collect()[0]
    assert r["clip_ratio"] == 0.007813


def test_short_and_null_clips_dropped(spark):
    df = spark.createDataFrame(
        [_row("short", np.zeros(AUDIO_WINDOW - 1)), ("nul", None, 16000, 0, "pcm16")],
        SCHEMA,
    )
    assert audio_quality_report(df).count() == 0


def test_fixture_ground_truth_recovered(spark):
    corpus = generate_audio_quality_corpus(n_base=10, seed=5)
    df = spark.createDataFrame(corpus.audio, SCHEMA)
    got = {r["audio_id"]: r for r in audio_quality_report(df).collect()}
    assert set(got) == set(corpus.truth)
    for aid, (n_win, n_silent, n_clipped, peak) in corpus.truth.items():
        r = got[aid]
        assert (r["n_windows"], r["n_silent"], r["n_clipped"], r["peak"]) == (
            n_win, n_silent, n_clipped, peak,
        ), aid
    # both defect kinds are present in the corpus
    assert any(t[1] > 0 for t in corpus.truth.values())
    assert any(t[2] > 0 for t in corpus.truth.values())
    # sanity on the margin constant the fixture asserts against
    assert SILENCE_ENERGY == AUDIO_WINDOW * 327 * 327
