"""Corpus assembly operators: deterministic splits, weighted mixing,
sequence packing.

The last mile of a training-data pipeline (SURVEY.md §2.10 north-star
surface, beyond the reference): after cleaning/dedup/quality filtering,
a corpus is split train/val/test, mixed across sources with target
weights, and packed into fixed token budgets. All selection here is
*hash-deterministic* (md5 over ids — no RNG, no partition-layout
dependence): re-running the pipeline, on any cluster layout or engine,
reproduces the same corpus bit-for-bit. That property is what makes
training runs auditable, and it is the same md5-portable family the
dedup/ANN operators use, so the DuckDB oracle replays splits exactly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .localrel import local_df

# integer per-ten-thousand buckets: exact on every engine, no float
# threshold boundaries
_BUCKETS = 10_000


def _hash_bucket(seed: int | str, key: Column) -> Column:
    """Deterministic bucket in [0, 10000) from md5(seed ':' key) — the
    engine-portable analog of a seeded uniform draw.
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT % 10000."""
    s = F.concat(F.lit(str(seed)), F.lit(":"), key.cast("string"))
    h60 = F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")
    return h60 % _BUCKETS


def hash_split(
    df: DataFrame,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive, deterministic split assignment
    (train/val/test). Each row lands in exactly one split by its
    md5-hash bucket against the cumulative fraction thresholds —
    independent of partitioning, row order, engine, or cluster size
    (the properties a seeded `randomSplit` does NOT have).

    Plan: one stateless projection — splits at 100 TB at scan speed.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = _hash_bucket(seed, F.col(id_col))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def weighted_mix(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mix: keep a deterministic ``weights[s]`` fraction
    of each source (md5-hash thresholding per row, seeded per source)
    and union with a source tag — the sampling half of a data-mixture
    recipe (e.g. upweight curated text, downweight crawl).

    Weights are keep-fractions in [0, 1]; upsampling (>1) is the
    trainer's repeat-epochs knob, not a row-duplication concern here.
    One projection + filter per source, then unionByName — no shuffle.
    """
    parts = []
    for name, df in sources.items():
        w = weights[name]
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"weight for {name!r} must be in [0,1], got {w}")
        bucket = _hash_bucket(f"{seed}:{name}", F.col(id_col))
        parts.append(
            df.filter(bucket < int(round(w * _BUCKETS))).withColumn(
                source_col, F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Multinomial temperature resampling across sources (the
    multilingual/multi-source LLM recipe: sample prob q_s ∝ p_s^α,
    α < 1 flattens source shares so big crawls stop drowning small
    curated sets). Downsample-only normalization: keep fraction
    f_s = (c_min / c_s)^(1-α), so the smallest source keeps 100% and
    larger sources shrink toward the flattened distribution — no row
    duplication (upsampling is the trainer's repeat-epochs knob).

    Fully in-plan: per-source counts (one small agg), broadcast back,
    deterministic md5-hash thresholding per row — no driver collect,
    no RNG, layout-independent, engine-replayable. For α = 0.5 the
    fraction is computed with ``sqrt`` (IEEE correctly rounded →
    bit-identical across engines, which is what lets the DuckDB oracle
    replay the exact row selection); other α use ``pow`` (last-ulp
    engine drift possible — fine for production, not for hash checks).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    # Rows with a NULL source are excluded up front — otherwise the
    # NULL group's (typically tiny) count would become c_min and poison
    # every real source's keep fraction, while the rows themselves
    # silently vanish in the source equi-join below. Cleanse source
    # metadata before mixing; the exclusion here is explicit, not a
    # join artifact.
    df = df.filter(F.col(source_col).isNotNull())
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    ratio = F.col("__cmin").cast("double") / F.col("__c").cast("double")
    frac = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    thresholds = counts.crossJoin(F.broadcast(cmin)).select(
        source_col, F.round(frac * _BUCKETS, 0).cast("long").alias("__thr")
    )
    # same md5 layout as weighted_mix: md5("<seed>:<source>:<id>")
    bucket = _hash_bucket(
        seed,
        F.concat(F.col(source_col), F.lit(":"), F.col(id_col).cast("string")),
    )
    return (
        df.join(F.broadcast(thresholds), on=source_col)
        .filter(bucket < F.col("__thr"))
        .drop("__thr")
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-domain document cap: keep at most ``cap`` rows per domain,
    chosen by deterministic md5-hash order (seeded, partition-layout
    independent) with the id as tiebreak.

    The crawl-pipeline staple (C4 and every CommonCrawl derivative cap
    per-host page counts so no single site dominates the corpus),
    expressed as one window: hash-rank within domain, keep rank ≤ cap.
    The hash order makes the *selection* an unbiased reproducible
    sample rather than "whatever sorted first". One shuffle on the
    domain key; skewed domains are exactly the rows the cap discards,
    so the post-filter output is balanced by construction. For a
    degenerate single mega-domain at 100 TB, pre-aggregate with a
    count and short-circuit domains under the cap before ranking.
    """
    from pyspark.sql import Window as W

    order = F.md5(
        F.concat(
            F.lit(f"{seed}:"), F.col(id_col).cast("string")
        ).cast("binary")
    )
    w = W.partitionBy(domain_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def epoch_upsample(
    df: DataFrame,
    repeats: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Repeat-factor upsampling: materialize ``repeats[s]`` epochs of
    each source — floor(w) full copies plus a deterministic md5-selected
    fraction for the final partial epoch. The trainer's "see curated
    data 2.3 times per crawl epoch" knob (``weighted_mix`` /
    ``temperature_mix`` are downsample-only by design; this is the
    other half), made explicit and auditable: the output carries an
    ``epoch`` column, and membership of the partial epoch is the same
    seeded hash-threshold selection the rest of the corpus stack uses —
    reproducible on any layout or engine, no RNG.

    One broadcast join (per-source full/partial thresholds — a handful
    of rows) + one explode; rows needing zero epochs (w < bucket draw)
    disappear through the non-outer explode of an empty sequence. No
    shuffle: output partitioning follows the input, and the explode
    multiplies rows map-side — at 100 TB the write amplification IS the
    requested upsampling, nothing more.
    """
    for name, w in repeats.items():
        if w < 0:
            raise ValueError(f"repeat for {name!r} must be >= 0, got {w}")
    spark = df.sparkSession
    plan = [
        (name, int(w), int(round((w - int(w)) * _BUCKETS)))
        for name, w in repeats.items()
    ]
    plan_df = local_df(
        spark, plan, f"{source_col} string, __full int, __thr int"
    )
    bucket = _hash_bucket(
        seed,
        F.concat(F.col(source_col), F.lit(":"), F.col(id_col).cast("string")),
    )
    n_epochs = F.col("__full") + (bucket < F.col("__thr")).cast("int")
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard with an
    # empty array so zero-epoch rows vanish through the explode
    seq = F.when(n_epochs >= 1, F.sequence(F.lit(1), n_epochs)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.join(F.broadcast(plan_df), on=source_col)
        .withColumn(epoch_col, F.explode(seq))
        .drop("__full", "__thr")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
    curriculum: Sequence[Column | str] = (),
) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment: every
    row gets a ``shard`` in [0, n_shards) and a 0-based ``pos`` within
    its shard, both derived solely from md5(seed ':' id) — the step
    that turns a filtered corpus into the fixed set of shuffled shards
    a training job streams (data order is part of the training recipe,
    so it must be reproducible bit-for-bit, on any cluster layout).

    Scale shape: a *global* sort + ntile would funnel 100 TB through
    one range-partitioned total order; instead the shard is the hash
    value mod n_shards (statistically equal shard sizes, zero
    coordination) and the within-shard order is the hash key itself —
    so the only shuffle is one hash partition on ``shard`` and the
    per-shard row_number windows run in parallel. Shard-internal order
    is uniform-random with respect to any corpus attribute, which is
    exactly the i.i.d.-like stream training wants.

    ``curriculum``: optional leading sort columns for the within-shard
    order (e.g. a quality bucket, ascending difficulty) — each shard
    then streams easy→hard while shard MEMBERSHIP stays hash-uniform,
    the standard curriculum-training layout. The hash key stays the
    tiebreak, so equal-curriculum rows remain shuffled.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window as W

    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast("binary")
    )
    h60 = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    out = df.withColumn("__key", key).withColumn(
        shard_col, (h60 % n_shards).cast("int")
    )
    cur = [F.col(c) if isinstance(c, str) else c for c in curriculum]
    w = W.partitionBy(shard_col).orderBy(*cur, "__key", id_col)
    return (
        out.withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))
        .drop("__key")
    )


def shard_write(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize ``shard_assign`` output as one parquet directory per
    shard (``shard=K/``), each shard's rows stored in shuffled order.
    ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` lines
    the physical layout up with the logical shards so a trainer reads
    shard K as one sequential scan in the exact deterministic order —
    no per-epoch shuffle at read time."""
    out = shard_assign(df, n_shards, id_col=id_col, seed=seed)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    cum_col: str = "cum_tokens",
    prefix_chars: int = 2,
) -> DataFrame:
    """Token-budget subset: walk the corpus in seeded md5-shuffled
    order and keep documents until the running token total reaches
    ``budget`` — "give me an unbiased 1B-token slice of this corpus",
    the sizing step of every scaling-law / ablation run. Deterministic:
    same seed -> same subset, on any engine or layout.

    Scale shape — distributed exact prefix sum. The naive form is one
    ``SUM() OVER (ORDER BY key)`` window, which range-partitions a
    total order and then computes the running sum in a single sequential
    pass — a non-starter at 100 TB. Instead:

    1. bucket each row by the first ``prefix_chars`` hex chars of its
       hash key (16^prefix_chars buckets that form a *prefix
       decomposition* of the global order);
    2. aggregate per-bucket token totals — one small agg, 16^p rows to
       the driver (bounded, in line with the repo's collect policy);
    3. compute exclusive bucket offsets on the driver and broadcast
       them back; buckets whose offset already exceeds the budget are
       pruned before any window work;
    4. within each surviving bucket, a per-bucket running-sum window
       (parallel across buckets) + its offset = the exact global
       cumulative sum.

    Each surviving bucket's window runs as ONE task, so size the bucket
    count to the data: the default 2 (256 buckets) suits up to ~10^8
    rows; at 100 TB use 4 (65 536 buckets, ~1.5 GB of corpus each — a
    65k-row driver pass is still trivially bounded). The budget prune
    usually collapses the window stage to the few buckets that straddle
    the budget frontier anyway.

    Keeps rows whose inclusive cumulative total is <= budget. Output:
    input columns + ``cum_col`` (the row's global running total).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not (1 <= prefix_chars <= 8):
        raise ValueError(f"prefix_chars must be in [1, 8], got {prefix_chars}")
    from pyspark.sql import Window as W

    spark = df.sparkSession
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast("binary")
    )
    base = df.withColumn("__key", key).withColumn(
        "__b", F.conv(F.substring("__key", 1, prefix_chars), 16, 10).cast("int")
    )
    totals = {
        r["__b"]: r["t"]
        for r in base.groupBy("__b")
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
        .collect()  # <= 16^prefix_chars rows: bounded by construction
    }
    offsets, running = [], 0
    for b in sorted(totals):
        offsets.append((b, running))
        running += totals[b]
    off_df = local_df(spark, offsets, "__b int, __off long")
    w = (
        W.partitionBy("__b")
        .orderBy("__key", id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        base.join(F.broadcast(off_df), on="__b")
        # prune whole buckets past the budget before any window work
        .filter(F.col("__off") < F.lit(int(budget)))
        .withColumn(
            cum_col,
            F.col("__off") + F.sum(F.col(tokens_col).cast("long")).over(w),
        )
        .filter(F.col(cum_col) <= F.lit(int(budget)))
        .drop("__b", "__key", "__off")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int | None = None,
    lookback: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assign documents to bins of at most
    ``budget`` tokens (first-fit decreasing), the packing step that
    turns a filtered corpus into fixed-length pretraining rows with
    minimal padding waste.

    Exact global FFD is inherently sequential, so the distributed shape
    is pack-within-hash-groups: rows are hash-partitioned into
    ``n_groups`` groups (md5 on the id — deterministic), each group is
    FFD-packed independently in one Arrow batch (applyInPandas), and
    bin ids are made globally unique as group*2^32 + local bin. Waste
    vs global FFD is bounded by one partial bin per group — negligible
    when groups hold thousands of documents. Oversized docs (tokens >
    budget) get a dedicated bin each (the trainer's truncation
    concern, not the packer's).

    Naive FFD scans every open bin per document — O(docs × bins)
    inside one group, quadratic when a group holds millions of rows.
    ``lookback`` bounds it: only the ``lookback`` most recently opened
    bins stay open (older bins are closed, evicting the fullest
    first), so per-group work is O(docs × lookback) — linear — at the
    cost of a slightly looser fill. Size ``n_groups`` so groups hold
    ~10⁴-10⁵ docs; both knobs compose for 100 TB corpora.

    Output: (id, bin_id, bin_tokens) — one row per input document.
    """
    import pandas as pd

    if n_groups is None:
        n_groups = df.sparkSession.sparkContext.defaultParallelism
    grp = _hash_bucket("pack", F.col(id_col)) % n_groups
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).cast("long").alias("__tok"),
        grp.cast("int").alias("__grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["__grp"].iloc[0])
        # deterministic FFD: sort by tokens desc, id asc
        rows = sorted(
            zip(pdf["__id"].tolist(), pdf["__tok"].tolist()),
            key=lambda r: (-r[1], r[0]),
        )
        open_bins: list[tuple[int, int]] = []  # (bin_index, remaining)
        n_bins = 0
        out_id, out_bin = [], []
        for rid, tok in rows:
            placed = None
            for i, (bi, rem) in enumerate(open_bins):
                if tok <= rem:
                    placed = bi
                    open_bins[i] = (bi, rem - tok)
                    break
            if placed is None:
                placed = n_bins
                open_bins.append((n_bins, max(budget, tok) - tok))
                n_bins += 1
                if len(open_bins) > lookback:
                    # close the fullest bin: least likely to fit
                    # future (smaller) docs — keeps the scan bounded
                    fullest = min(range(len(open_bins)), key=lambda j: open_bins[j][1])
                    open_bins.pop(fullest)
            out_id.append(rid)
            out_bin.append((g << 32) | placed)
        totals: dict[int, int] = {}
        for (rid, tok), b in zip(rows, out_bin):
            totals[b] = totals.get(b, 0) + tok
        return pd.DataFrame(
            {
                "__id": out_id,
                "bin_id": out_bin,
                "bin_tokens": [totals[b] for b in out_bin],
            }
        )

    return (
        base.groupBy("__grp")
        .applyInPandas(pack, "__id long, bin_id long, bin_tokens long")
        .withColumnRenamed("__id", id_col)
    )
