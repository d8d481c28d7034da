"""Deterministic video and audio corpora for the multimodal tiers.

The task model treats every modality as an opaque ``binary`` column
with typed metadata (the input_hint pattern for images, extended):

  videos: (video_id string, bytes binary, w int, h int,
           n_frames int, fmt string)          fmt = 'rawv'
  audio:  (audio_id string, bytes binary, sample_rate int,
           n_samples int, fmt string)         fmt = 'pcm16'

Container formats are deliberately *SQL-sliceable* so the DuckDB
oracle can recompute the engine's frame/sample work from the stored
bytes with zero codec code (hex() + substring arithmetic):

  rawv  = 12-byte header (magic 'RV01', u32BE n_frames, u16BE w,
          u16BE h) followed by n_frames raw RGB24 frames of exactly
          w*h*3 bytes each. Frame k lives at offset 12 + k*w*h*3.
  pcm16 = headerless int16 little-endian PCM, n_samples samples.

No video/audio codec libraries exist in this container (and none are
needed): the *decode* step for real-world codecs stays stubbed
(multimodal/decode.py), while everything Spark-side — schema,
partitioning, Arrow batch shape, frame slicing, windowed features —
is real and oracle-checked on these raw containers.

Duplicate structure (seeded, reproducible):
  video: exact byte copies; END-TRIMMED copies (trim a multiple of
         the sampling stride so the sampled-frame set is a strict
         prefix subset — sampling-based dedup catches end trims and
         re-containerizations, not arbitrary mid-cuts, and the
         fixture is honest about that); APPENDED copies (new frames
         after the shared content).
  audio: exact byte copies and HALF-VOLUME copies (x >> 1) — the
         delta-sign energy fingerprint is amplitude-invariant, so
         volume-normalized duplicates collapse; generation asserts
         the window-energy margins survive the shift so the fixture
         can never silently break that story.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

VIDEOS_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
)
AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string"
)

RAWV_MAGIC = b"RV01"
RAWV_HEADER = 12

# pinned fixture geometry — the oracle's uncorrelated generate_series
# upper bounds must cover every row, so they are module constants
VIDEO_W, VIDEO_H = 8, 8
FRAME_SIZE = VIDEO_W * VIDEO_H * 3
MAX_FRAMES = 64

AUDIO_RATE = 16_000
AUDIO_WINDOW = 256
MAX_SAMPLES = 8_192


def _stream(seed: bytes, n: int) -> bytes:
    """Counter-mode sha256 byte stream (same scheme as images.py)."""
    blocks = []
    for ctr in range(n // 32 + 1):
        blocks.append(hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest())
    return b"".join(blocks)[:n]


# ---------------------------------------------------------------------------
# rawv container
# ---------------------------------------------------------------------------


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 -> rawv container bytes."""
    n, h, w, _ = frames.shape
    header = (
        RAWV_MAGIC
        + int(n).to_bytes(4, "big")
        + int(w).to_bytes(2, "big")
        + int(h).to_bytes(2, "big")
    )
    return header + frames.astype(np.uint8).tobytes()


def decode_rawv(data: bytes) -> np.ndarray:
    """rawv bytes -> (n, h, w, 3) uint8; raises on a bad container."""
    if data[:4] != RAWV_MAGIC:
        raise ValueError("not a rawv container")
    n = int.from_bytes(data[4:8], "big")
    w = int.from_bytes(data[8:10], "big")
    h = int.from_bytes(data[10:12], "big")
    body = data[RAWV_HEADER : RAWV_HEADER + n * w * h * 3]
    if len(body) != n * w * h * 3:
        raise ValueError("truncated rawv body")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w, 3).copy()


@dataclass
class VideoCorpus:
    videos: pd.DataFrame  # VIDEOS_SCHEMA columns
    # ids that share >= 50% of sampled frames with their base (incl. base)
    near_groups: list[list[str]]


@dataclass
class SceneVideoCorpus:
    videos: pd.DataFrame  # VIDEOS_SCHEMA columns
    # ground truth for pytest (NOT written to parquet — the oracle must
    # recompute everything from bytes): video_id -> list of scene run
    # lengths in order
    scene_runs: dict[str, list[int]]


def generate_scene_video_corpus(
    n_base: int = 40, seed: int = 43
) -> SceneVideoCorpus:
    """Scene-structured rawv videos for the segmentation tier: each
    video is a sequence of SCENES — one unique frame repeated for a
    seeded run length — plus deliberate edge shapes: all-static videos
    (one scene), all-unique videos (every frame its own scene), and a
    single-frame video. Frames are globally unique across videos, so a
    detected cut can only come from within-video structure."""
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    runs: dict[str, list[int]] = {}

    def add(vid_id: str, frames: np.ndarray, lens: list[int]) -> None:
        rows.append(
            (
                vid_id,
                encode_rawv(frames),
                VIDEO_W,
                VIDEO_H,
                frames.shape[0],
                "rawv",
            )
        )
        runs[vid_id] = lens

    for i in range(n_base):
        vid_id = f"scn_{i:04d}.rawv"
        if i % 10 == 8:  # all-static: one scene filling the video
            lens = [int(rng.integers(4, 17))]
        elif i % 10 == 9:  # all-unique: every frame a scene
            lens = [1] * int(rng.integers(4, 13))
        else:
            lens = [
                int(rng.integers(1, 9))
                for _ in range(int(rng.integers(2, 7)))
            ]
        total = sum(lens)
        assert total <= MAX_FRAMES
        uniq = _video_frames(10_000 + i, len(lens))
        frames = np.repeat(uniq, lens, axis=0)
        assert frames.shape[0] == total
        add(vid_id, frames, lens)
    add("scn_single.rawv", _video_frames(99_999, 1), [1])

    videos = pd.DataFrame(
        rows, columns=["video_id", "bytes", "w", "h", "n_frames", "fmt"]
    )
    return SceneVideoCorpus(videos=videos, scene_runs=runs | {})


def _video_frames(vid: int, n_frames: int) -> np.ndarray:
    """n globally-unique deterministic frames for base video `vid`."""
    raw = _stream(b"video:%d" % vid, n_frames * FRAME_SIZE)
    return (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(n_frames, VIDEO_H, VIDEO_W, 3)
        .copy()
    )


def generate_video_corpus(
    n_base: int = 60, every_n: int = 4, seed: int = 42
) -> VideoCorpus:
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    groups: list[list[str]] = []

    def add(vid_id: str, frames: np.ndarray) -> None:
        rows.append(
            (
                vid_id,
                encode_rawv(frames),
                VIDEO_W,
                VIDEO_H,
                frames.shape[0],
                "rawv",
            )
        )

    for i in range(n_base):
        # 12..48 frames, always a few sampling strides long
        n_frames = int(rng.integers(3, 13)) * every_n
        assert n_frames <= MAX_FRAMES
        frames = _video_frames(i, n_frames)
        base_id = f"vid_{i:04d}.rawv"
        add(base_id, frames)
        group = [base_id]
        r = rng.random()
        if r < 0.20:  # exact byte copy
            dup_id = f"vid_{i:04d}_copy.rawv"
            add(dup_id, frames)
            group.append(dup_id)
        elif r < 0.40:  # end-trim by one or two strides (keeps >=50%)
            trim = every_n * int(rng.integers(1, 3))
            if n_frames - trim >= every_n * 2:
                dup_id = f"vid_{i:04d}_trim.rawv"
                add(dup_id, frames[: n_frames - trim])
                group.append(dup_id)
        elif r < 0.55:  # append new frames after the shared content
            extra = every_n * int(rng.integers(1, 3))
            if n_frames + extra <= MAX_FRAMES:
                tail = (
                    np.frombuffer(
                        _stream(b"video-extra:%d" % i, extra * FRAME_SIZE),
                        dtype=np.uint8,
                    )
                    .reshape(extra, VIDEO_H, VIDEO_W, 3)
                    .copy()
                )
                dup_id = f"vid_{i:04d}_ext.rawv"
                add(dup_id, np.concatenate([frames, tail]))
                group.append(dup_id)
        if len(group) > 1:
            groups.append(group)

    videos = pd.DataFrame(
        rows, columns=["video_id", "bytes", "w", "h", "n_frames", "fmt"]
    )
    return VideoCorpus(videos=videos, near_groups=groups)


# ---------------------------------------------------------------------------
# pcm16 audio
# ---------------------------------------------------------------------------


@dataclass
class AudioCorpus:
    audio: pd.DataFrame  # AUDIO_SCHEMA columns
    dup_groups: list[list[str]]  # same-fingerprint groups (incl. base)


def window_energies(samples: np.ndarray, window: int = AUDIO_WINDOW) -> np.ndarray:
    """Exact int64 sum-of-squares per complete window (remainder
    truncated) — integer math so Spark/DuckDB/numpy agree bit-for-bit."""
    n_win = samples.shape[0] // window
    x = samples[: n_win * window].astype(np.int64)
    return (x * x).reshape(n_win, window).sum(axis=1)


def energy_fingerprint(samples: np.ndarray, window: int = AUDIO_WINDOW) -> int:
    """Delta-sign fingerprint: bit w-1 set iff energy[w] > energy[w-1].
    Amplitude-invariant (any monotone volume scaling preserves the
    energy ordering, margins permitting) — the audio analog of SimHash.
    Requires < 65 windows so the fingerprint fits in one int64."""
    e = window_energies(samples, window)
    assert e.shape[0] <= 64, "fingerprint must fit in 63 bits"
    bits = (np.diff(e) > 0).astype(np.int64)
    return int((bits << np.arange(bits.shape[0], dtype=np.int64)).sum())


def _audio_samples(aid: int, n_samples: int) -> np.ndarray:
    raw = _stream(b"audio:%d" % aid, n_samples * 2)
    return np.frombuffer(raw, dtype="<i2").copy()


def generate_audio_corpus(n_base: int = 50, seed: int = 42) -> AudioCorpus:
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    groups: list[list[str]] = []

    def add(aid: str, samples: np.ndarray) -> None:
        rows.append(
            (
                aid,
                samples.astype("<i2").tobytes(),
                AUDIO_RATE,
                samples.shape[0],
                "pcm16",
            )
        )

    for i in range(n_base):
        n_samples = AUDIO_WINDOW * int(rng.integers(8, 17))  # 8..16 windows
        assert n_samples <= MAX_SAMPLES
        samples = _audio_samples(i, n_samples)
        base_id = f"aud_{i:04d}.pcm"
        add(base_id, samples)
        group = [base_id]
        r = rng.random()
        if r < 0.2:  # exact byte copy
            dup_id = f"aud_{i:04d}_copy.pcm"
            add(dup_id, samples)
            group.append(dup_id)
        elif r < 0.4:  # half-volume copy: same delta-sign fingerprint
            scaled = samples >> 1
            # the story must hold by construction, not by luck: the
            # energy ordering has to survive the shift
            assert energy_fingerprint(scaled) == energy_fingerprint(samples)
            dup_id = f"aud_{i:04d}_half.pcm"
            add(dup_id, scaled)
            group.append(dup_id)
        if len(group) > 1:
            groups.append(group)

    audio = pd.DataFrame(
        rows, columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"]
    )
    return AudioCorpus(audio=audio, dup_groups=groups)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI (real container; multimodal/avi.py)
# ---------------------------------------------------------------------------

AVI_W, AVI_H = 16, 16


@dataclass
class AviCorpus:
    videos: pd.DataFrame  # VIDEOS_SCHEMA columns (fmt = 'mjpeg-avi')
    near_groups: list[list[str]]


def _avi_jpeg_frames(vid: int, n_frames: int, quality: int = 85) -> list[bytes]:
    """n deterministic baseline-JPEG frame payloads for base video
    `vid` — encoded (and decode-asserted) with the from-scratch codec
    so every fixture frame is decodable by construction."""
    from dedup_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    out = []
    for k in range(n_frames):
        raw = _stream(b"avi:%d:%d" % (vid, k), AVI_W * AVI_H * 3)
        px = np.frombuffer(raw, dtype=np.uint8).reshape(AVI_H, AVI_W, 3)
        j = encode_jpeg(px, quality=quality)
        decode_jpeg(j)  # the engine skips undecodable frames; the
        # oracle can't — so the fixture must not contain any
        out.append(j)
    return out


def generate_avi_corpus(
    n_base: int = 30, every_n: int = 2, seed: int = 42
) -> AviCorpus:
    """Real-container corpus: exact copies, end-trims (shared sampled
    frames drop below 100% but stay >= 50%), and REMUXES (same JPEG
    chunks, different container header — the dedup must see through
    the re-containerization), plus one corrupt row the parser (and the
    oracle's magic check) must skip."""
    from dedup_spark.multimodal.avi import MAX_AVI_FRAMES, encode_mjpeg_avi

    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    groups: list[list[str]] = []

    def add(vid_id: str, frames: list[bytes], fps: int = 25) -> None:
        rows.append(
            (
                vid_id,
                encode_mjpeg_avi(frames, AVI_W, AVI_H, fps=fps),
                AVI_W,
                AVI_H,
                len(frames),
                "mjpeg-avi",
            )
        )

    for i in range(n_base):
        n_frames = int(rng.integers(3, MAX_AVI_FRAMES // 2 + 1)) * every_n
        assert n_frames <= MAX_AVI_FRAMES
        frames = _avi_jpeg_frames(i, n_frames)
        base_id = f"avi_{i:04d}.avi"
        add(base_id, frames)
        group = [base_id]
        r = rng.random()
        if r < 0.2:  # exact byte copy
            dup_id = f"avi_{i:04d}_copy.avi"
            add(dup_id, frames)
            group.append(dup_id)
        elif r < 0.4:  # remux: same chunks, different fps header
            dup_id = f"avi_{i:04d}_remux.avi"
            add(dup_id, frames, fps=30)
            group.append(dup_id)
        elif r < 0.6:  # end-trim by one stride (sampled overlap >= 50%)
            if n_frames - every_n >= every_n * 2:
                dup_id = f"avi_{i:04d}_trim.avi"
                add(dup_id, frames[: n_frames - every_n])
                group.append(dup_id)
        if len(group) > 1:
            groups.append(group)

    # one malformed container: bad RIFF magic — the walker raises, the
    # operator skips the row, the oracle's magic WHERE drops it
    junk = bytearray(rows[0][1])
    junk[:4] = b"JUNK"
    rows.append(("avi_corrupt.avi", bytes(junk), AVI_W, AVI_H, 0, "mjpeg-avi"))

    videos = pd.DataFrame(
        rows, columns=["video_id", "bytes", "w", "h", "n_frames", "fmt"]
    )
    return AviCorpus(videos=videos, near_groups=groups)


# ---------------------------------------------------------------------------
# audio quality corpus (silence / clipping tier)
# ---------------------------------------------------------------------------

# a window is SILENT when its exact int64 sum-of-squares energy is
# below this bound (~1% full-scale RMS: 256 * 327^2). Module constant
# because the oracle inlines it.
SILENCE_ENERGY = AUDIO_WINDOW * 327 * 327


@dataclass
class AudioQualityCorpus:
    audio: pd.DataFrame  # AUDIO_SCHEMA columns
    # ground truth per audio_id (for pytest; NOT written to parquet):
    # (n_windows, n_silent, n_clipped, peak)
    truth: dict[str, tuple[int, int, int, int]]


def generate_audio_quality_corpus(
    n_base: int = 30, seed: int = 44
) -> AudioQualityCorpus:
    """pcm16 clips with deliberate quality defects: per complete
    window, the generator picks silent (zeros or sub-threshold noise),
    clipped (loud content with a run of full-scale +/-32767 samples)
    or normal-loud content, plus a ragged sub-window tail on some
    clips. Construction guarantees the margins the tier thresholds on:
    normal/clipped windows have energy >> SILENCE_ENERGY (amplitude
    floor 5000), silent windows stay below it (amplitude cap 100), and
    +/- full-scale samples occur ONLY in clipped windows (normal
    amplitude cap 30000; -32768 is never generated, so peak stays
    32767 and the clip test is exact)."""
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    truth: dict[str, tuple[int, int, int, int]] = {}
    w = AUDIO_WINDOW
    for i in range(n_base):
        n_win = int(rng.integers(4, 17))
        segs: list[np.ndarray] = []
        n_silent = n_clipped = 0
        for _ in range(n_win):
            kind = rng.random()
            if kind < 0.3:  # silent
                if rng.random() < 0.5:
                    seg = np.zeros(w, dtype=np.int64)
                else:
                    seg = rng.integers(-100, 101, w)
                n_silent += 1
            else:
                mag = rng.integers(5_000, 30_001, w)
                sign = rng.choice([-1, 1], w)
                seg = mag * sign
                if kind < 0.55:  # clipped burst inside loud content
                    run = int(rng.integers(1, 9))
                    at = int(rng.integers(0, w - run))
                    seg[at : at + run] = 32767 * int(rng.choice([-1, 1]))
                    n_clipped += run
            segs.append(seg.astype(np.int64))
        if rng.random() < 0.4:  # ragged tail (quiet — outside windows)
            segs.append(rng.integers(-100, 101, int(rng.integers(1, w))))
        samples = np.concatenate(segs).astype("<i2")
        # construction invariants the tier's story depends on
        e = window_energies(samples.astype(np.int64), w)
        assert ((e < SILENCE_ENERGY).sum()) == n_silent
        assert int(np.sum(np.abs(samples.astype(np.int64)) == 32767)) == n_clipped
        aid = f"q_{i:04d}.pcm16"
        rows.append((aid, samples.tobytes(), AUDIO_RATE, len(samples), "pcm16"))
        truth[aid] = (
            n_win,
            n_silent,
            n_clipped,
            int(np.abs(samples.astype(np.int64)).max()),
        )
    audio = pd.DataFrame(
        rows,
        columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"],
    )
    return AudioQualityCorpus(audio=audio, truth=truth)
