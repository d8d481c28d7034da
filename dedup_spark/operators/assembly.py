"""Dataset assembly — the last mile between a deduplicated corpus and
a training run: deterministic stratified sampling, concat-and-chunk
sequence packing, and temperature-scaled source mixing.

These are the operations a 100 TB pipeline runs AFTER dedup/filtering
(the operators the rest of this engine provides) to emit the actual
training mixture:

  * ``stratified_sample`` — keep documents with a per-stratum rate
    (e.g. 100% of high-quality, 10% of low-quality — the C4/FineWeb
    quality-mixing recipe). The coin flip is ``md5(seed || id)``, not
    ``rand()``: reruns, task retries, and resumed jobs all keep the
    SAME rows, and the decision is auditable per document. Comparing
    a fixed-width lowercase-hex prefix against a hex threshold literal
    is a pure string comparison, so any engine reproduces it — that is
    what the DuckDB oracle does.
  * ``pack_sequences`` — GPT-style concat-and-chunk: lay all documents
    end-to-end in the seeded shuffle order and cut every ``budget``
    tokens. Each document's placement is a pure function of the
    EXCLUSIVE prefix sum of token counts over that order, which
    ``ordering.global_running_total`` computes distributed (two-pass
    bucketed scan — no single-partition window). Emits each doc's
    start/end block and span; a doc longer than the budget simply
    spans several blocks, exactly like the real packer.
  * ``source_mixing_weights`` — per-source token shares and
    temperature-scaled sampling weights w_s ∝ share_s^alpha (the
    multilingual/multi-domain rebalancing rule from GPT-3/XLM-R-style
    training; alpha<1 upweights small sources). One combinable
    aggregation plus a broadcast of the 1-row total — never a wide
    shuffle.

All built-in expressions; the only Spark actions are the tiny bucket
collects inside the prefix-sum pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dedup_spark.operators.ordering import global_running_total, shuffle_key


def sample_u32_hex(id_col: Column, seed: str) -> Column:
    """First 8 hex chars of md5(seed || ':' || id) — a uniform u32 in
    hex. Fixed-width lowercase hex compares lexicographically exactly
    like the number it encodes, so 'keep iff hex < threshold_hex' is
    portable to any engine without integer parsing."""
    return F.substring(shuffle_key(id_col, seed), 1, 8)


def rate_threshold_hex(rate: float) -> str:
    """8-hex-char threshold: keep iff u32_hex < this. rate=1.0 maps to
    the max sentinel 'ffffffff' + 1 semantics via 'g' (any hex char
    < 'g', so everything keeps) — avoids a 9-char literal."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * (1 << 32)), "08x")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "sample-0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Add ``sample_hex`` (the u32 coin in hex) and ``sampled`` (bool)
    — deterministic per-stratum Bernoulli keep. The expected kept
    fraction per stratum is its rate ±2^-32; the EXACT kept set is
    reproducible from (seed, ids) alone."""
    coin = sample_u32_hex(F.col(id_col), seed)
    thr = F.lit(rate_threshold_hex(default_rate))
    for name, rate in rates.items():
        thr = F.when(
            F.col(stratum_col) == name, F.lit(rate_threshold_hex(rate))
        ).otherwise(thr)
    return df.withColumn("sample_hex", coin).withColumn(
        "sampled", F.col("sample_hex") < thr
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    seed: str = "seed-0",
) -> DataFrame:
    """Concat-and-chunk packing plan: in the seeded shuffle order, doc
    i occupies token interval [offset_i, offset_i + tokens_i) of the
    concatenated stream; training block b is tokens [b*budget,
    (b+1)*budget). Emits::

        token_offset  exclusive prefix sum (BIGINT)
        block_start   floor(offset / budget)
        block_end     floor((offset + tokens - 1) / budget)
        n_blocks      blocks the doc touches (1 unless it crosses a cut)

    Zero-token docs (empty text) get n_blocks=0 and block_end =
    block_start - 1: they occupy no interval."""
    run = global_running_total(
        df, value_col=token_col, id_col=id_col, seed=seed, out_col="token_offset"
    )
    tok = F.col(token_col).cast("long")
    start = F.floor(F.col("token_offset") / budget).cast("long")
    end = F.floor((F.col("token_offset") + tok - 1) / budget).cast("long")
    return (
        run.withColumn("block_start", start)
        .withColumn("block_end", F.when(tok > 0, end).otherwise(start - 1))
        .withColumn(
            "n_blocks",
            F.when(tok > 0, F.col("block_end") - F.col("block_start") + 1)
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def source_mixing_weights(
    df: DataFrame,
    source_col: str,
    token_count: Column,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-source token totals, natural share, and temperature-scaled
    mixing weight w_s = share_s^alpha / sum(share_s^alpha). Shares and
    weights rounded to 6 dp (accumulated-float parity rule)."""
    per = df.groupBy(source_col).agg(
        F.sum(token_count.cast("long")).alias("tokens")
    )
    tot = per.agg(
        F.sum("tokens").alias("_tot"),
    )
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("tokens") / F.col("_tot")
    )
    zsum = shared.agg(F.sum(F.pow("share", alpha)).alias("_z"))
    return (
        shared.crossJoin(F.broadcast(zsum))
        .select(
            source_col,
            F.col("tokens").cast("long").alias("tokens"),
            F.round("share", 6).alias("share"),
            F.round(F.pow("share", alpha) / F.col("_z"), 6).alias("mix_weight"),
        )
    )


def weighted_sample_keys(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    seed: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES): give every record the key u^(1/w) for a
    uniform u in (0,1] and keep the k largest keys — provably a
    weight-proportional sample without replacement, and because u
    comes from md5(seed || id) (not rand()) the selection is
    deterministic, resumable, and auditable per record.

    u = (h + 1) / 2^60 from the 60-bit md5 prefix (never 0, so ln(u)
    is finite); the key is computed as exp(ln(u)/w) — the SAME
    ln/exp composition the oracle uses, keeping the doubles identical
    cross-engine. Selection is an orderBy(key desc).limit(k), which
    Spark executes as TakeOrderedAndProject: per-partition top-k
    heaps merged on the driver — k rows cross the wire per partition,
    never a global sort (plan-audited).

    Returns (id, weight, score) for the k selected records, score
    rounded to 6 dp. Rows with NULL or non-positive weight are
    excluded (u^(1/w) is undefined there — the A-ES contract).
    """
    h = F.conv(
        F.substring(shuffle_key(F.col(id_col), seed), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    score = F.exp(F.log(u) / w)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            id_col,
            F.col(weight_col).alias("weight"),
            score.alias("_score"),
        )
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "weight", F.round(F.col("_score"), 6).alias("score"))
    )


def group_weighted_sample_keys(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    weight_col: str,
    seed: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group weighted sampling without replacement — the budgeted
    variant of ``weighted_sample_keys``: every group (source, language,
    quality bucket) independently keeps its ``k`` largest A-ES keys
    u^(1/w), so each stratum gets a weight-proportional sample of
    exactly min(k, |group|) records (the per-source budget recipe
    behind multilingual corpus assembly: "20k docs from every source,
    length-weighted").

    Scale shape: a naive window over ``group_col`` ships an entire
    group through one task — a billion-row source would sort in one
    place. Instead the top-k is TWO-phase: phase 1 ranks within
    (group, salt) for a deterministic md5-derived salt in
    [0, salt_buckets) and keeps k per salted cell (correct because the
    global per-group top-k is a subset of the union of its salt-cell
    top-ks); phase 2 ranks the surviving ≤ k·salt_buckets rows per
    group. No task ever sorts more than a salt-cell, and the phase-2
    input is budget-sized, not corpus-sized. With salt_buckets=1 the
    two phases collapse to the naive window (used as the parity oracle
    in tests).

    The A-ES key composition is byte-identical to
    ``weighted_sample_keys`` (and to the DuckDB oracle): u from the
    60-bit md5(seed||id) prefix, key = exp(ln(u)/w). Rows with NULL or
    non-positive weight are excluded. Returns
    (group, id, weight, score·1e-6-rounded, rank) with rank 1..k per
    group, ordered deterministically by (score desc, id asc) ties.
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(shuffle_key(F.col(id_col), seed), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    scored = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            group_col,
            id_col,
            F.col(weight_col).alias("weight"),
            F.exp(F.log(u) / w).alias("_score"),
        )
    )
    if salt_buckets > 1:
        # deterministic salt from a DIFFERENT md5 span than the score
        # bits (chars 17-20) so salt and score are independent.
        salt = F.conv(
            F.substring(shuffle_key(F.col(id_col), seed), 17, 4), 16, 10
        ).cast("long") % F.lit(salt_buckets)
        scored = (
            scored.withColumn("_salt", salt)
            .withColumn(
                "_cr",
                F.row_number().over(
                    Window.partitionBy(group_col, "_salt").orderBy(
                        F.col("_score").desc(), F.col(id_col).asc()
                    )
                ),
            )
            .filter(F.col("_cr") <= k)
            .drop("_salt", "_cr")
        )
    final = Window.partitionBy(group_col).orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            id_col,
            "weight",
            F.round(F.col("_score"), 6).alias("score"),
            "rank",
        )
    )
