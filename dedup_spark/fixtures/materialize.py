"""Materialize the deterministic fixture image corpus to parquet.

The driver's correctness gate runs our Spark queries AND our DuckDB
oracle SQL side-by-side; for the image-payload queries both sides must
see the SAME table, so the synthesized corpus (fixtures/images.py) is
written ONCE to a fixed parquet path and both engines read that file —
Spark via ``spark.read.parquet``, DuckDB via ``read_parquet('<path>')``.
This mirrors the reference's golden-contract testing (the benchmark
generator writes ground truth to disk and every tool is checked against
the same files, benchmark/generator.py:106-120).

The path is versioned by the generation parameters: changing the corpus
params yields a new directory, so a stale cache can never be silently
reused. Writes are atomic (temp file + rename) so concurrent callers
(pytest workers, the driver, check_oracle) cannot observe a partial
file.
"""

from __future__ import annotations

import os
import tempfile

FIXTURE_ROOT = "/tmp/dedup_spark_fixture"

# the pinned corpus every image-payload driver query runs on
FIXTURE_PARAMS = dict(
    n_rows=400, dup_ratio=0.3, near_dup_ratio=0.1, norm_dup_ratio=0.08, seed=42
)


def _params_tag(params: dict) -> str:
    return "_".join(f"{k}{params[k]}" for k in sorted(params))


def fixture_images_parquet(params: dict | None = None) -> str:
    """Return the parquet path of the fixture corpus, generating it on
    first use. Pure pandas/pyarrow — no SparkSession needed, so the
    oracle side can trigger materialization too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_spark.fixtures.images import generate_corpus

    params = dict(FIXTURE_PARAMS if params is None else params)
    out_dir = os.path.join(FIXTURE_ROOT, _params_tag(params))
    path = os.path.join(out_dir, "images.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    corpus = generate_corpus(**params)
    pdf = corpus.images
    table = pa.Table.from_arrays(
        [
            pa.array(pdf["image_id"], type=pa.string()),
            pa.array(pdf["bytes"], type=pa.binary()),
            pa.array(pdf["w"], type=pa.int32()),
            pa.array(pdf["h"], type=pa.int32()),
            pa.array(pdf["fmt"], type=pa.string()),
            pa.array(pdf["caption"], type=pa.string()),
            pa.array(pdf["phash"], type=pa.int64()),
        ],
        names=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
    )
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.rename(tmp, path)  # atomic on the same filesystem
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path
