"""Deduplication operators: exact, fingerprint, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine — plus canonical-group assignment.

The reference dedups three ways (SURVEY.md §2.10): key-based
``dropDuplicates`` (A5), Qdrant cosine-threshold semantic dedup with
``canonical_id`` groups (M3, deduplicate_from_qdrant.py:160-210), and
nothing for text — a large-scale training-data pipeline needs the
text family too, so it's first-class here.

Scale shapes:
- exact/fingerprint: one shuffle on the hash key.
- n-gram Jaccard: inverted-index candidate join (shared shingle) →
  verify; never an O(n²) cross join.
- MinHash-LSH: signature → band keys → shuffle on band key →
  within-bucket pairs → verify with exact Jaccard.
- SimHash: 64-bit signature via bitwise aggregation, chunk-keyed
  candidate join, Hamming verify.
- canonical groups: iterative min-label propagation to the connected-
  component fixpoint (deterministic replacement for the reference's
  order-dependent first-seen rule; SURVEY.md §7 hard-list #2).

All token/hash work is built-in expressions (xxhash64, transform,
aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- shingles


def shingles_expr(token_col: str, n: int = 3) -> Column:
    """Distinct n-gram shingles of a named token-array column."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size({token_col}) - {n - 1}, 0)),"
            f" i -> concat_ws(' ', slice({token_col}, i, {n})))"
        )
    )


# --------------------------------------------------------- exact / hash


def exact_dedup_groups(
    df: DataFrame, fingerprint: Column, id_col: str
) -> DataFrame:
    """Group rows by a content fingerprint; canonical = min id
    (deterministic stand-in for the reference's first-seen rule)."""
    return (
        df.select(fingerprint.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(id_col).alias("canonical_id"),
        )
    )


# ------------------------------------------------------ n-gram Jaccard


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float,
    round_digits: int | None = 6,
) -> DataFrame:
    """Near-dup pairs by n-gram-set Jaccard ≥ threshold — exact, via an
    inverted-index candidate join (pairs must share ≥1 shingle), so the
    plan is explode → shuffle on shingle → pair-distinct → verify.
    No cross join; candidate count ≈ near-dup count on real corpora.
    """
    base = df.select(F.col(id_col), F.col(shingle_col))
    ex = base.select(F.col(id_col), F.explode(shingle_col).alias("__sh"))
    a = ex.select(F.col(id_col).alias("a_id"), "__sh")
    b = ex.select(F.col(id_col).alias("b_id"), "__sh")
    cand = (
        a.join(b, on="__sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = base.select(F.col(id_col).alias("a_id"), F.col(shingle_col).alias("a_sh"))
    sb = base.select(F.col(id_col).alias("b_id"), F.col(shingle_col).alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    jac = inter / union
    if round_digits is not None:
        jac = F.round(jac, round_digits)
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------- MinHash


def minhash_signature(shingle_col: str, n_hashes: int) -> Column:
    """k independent min-hashes: h_i = min over shingles of
    xxhash64(i, shingle). Pure expression, one pass."""
    return F.expr(
        f"""
        transform(sequence(0, {n_hashes - 1}),
                  i -> array_min(transform({shingle_col},
                                           s -> xxhash64(i, s))))
        """
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, verified with exact
    Jaccard ≥ threshold.

    b=16, r=4 → S-curve midpoint (1/16)^(1/4) ≈ 0.5: pairs above 0.6
    are caught w.h.p., pairs below 0.4 mostly skipped. Shuffle volume
    is bands × n_rows band keys — sub-quadratic; the exact verify runs
    only on candidates.
    """
    rows = n_hashes // bands
    sig = df.select(
        F.col(id_col),
        F.col(shingle_col),
        minhash_signature(shingle_col, n_hashes).alias("__sig"),
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(F.slice("__sig", b * rows + 1, rows).cast("array<string>")).alias(
                "bkey"
            ),
        )
        for b in range(bands)
    ]
    keyed = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bs")
    ).select(id_col, "bs.band", "bs.bkey")
    a = keyed.select(F.col(id_col).alias("a_id"), "band", "bkey")
    b_ = keyed.select(F.col(id_col).alias("b_id"), "band", "bkey")
    cand = (
        a.join(b_, on=["band", "bkey"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = df.select(F.col(id_col).alias("a_id"), F.col(shingle_col).alias("a_sh"))
    sb = df.select(F.col(id_col).alias("b_id"), F.col(shingle_col).alias("b_sh"))
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh"))
        / F.size(F.array_union("a_sh", "b_sh")),
        6,
    )
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------- SimHash


def simhash64(token_col: str) -> Column:
    """64-bit SimHash of a token array: per bit position, sign of the
    ±1 vote sum across token hashes. Pure expressions (one xxhash64
    per token, reused across bits via shiftright)."""
    return F.expr(
        f"""
        aggregate(
          sequence(0, 63),
          0L,
          (acc, i) -> acc + CASE WHEN
            aggregate({token_col},
                      0L,
                      (s, t) -> s + CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1
                                    THEN 1L ELSE -1L END) >= 0
            THEN shiftleft(1L, i) ELSE 0L END)
        """
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount via
    bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming — exact.

    Candidate generation: the 64-bit signature is split into
    ``max_hamming + 1`` chunks; by pigeonhole any pair within Hamming ≤
    max_hamming differs in at most max_hamming chunks, so at least one
    chunk matches exactly → equi-join on (chunk_index, chunk_value)
    generates a complete candidate set, then the true Hamming distance
    verifies. Shuffle on chunk keys only; no cross join. (This is the
    classic 64-bit/k=3 SimHash dedup operating point.)
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sig = df.select(F.col(id_col), simhash64(token_col).alias("__sim"))
    chunks = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright("__sim", c * width).bitwiseAND(F.lit(mask)).alias("ckey"),
        )
        for c in range(n_chunks)
    ]
    keyed = sig.select(
        F.col(id_col), F.col("__sim"), F.explode(F.array(*chunks)).alias("cs")
    ).select(id_col, "__sim", "cs.chunk", "cs.ckey")
    a = keyed.select(F.col(id_col).alias("a_id"), F.col("__sim").alias("a_sim"), "chunk", "ckey")
    b = keyed.select(F.col(id_col).alias("b_id"), F.col("__sim").alias("b_sim"), "chunk", "ckey")
    return (
        a.join(b, on=["chunk", "ckey"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming64(F.col("a_sim"), F.col("b_sim")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------- canonical connected components


def canonical_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Deterministic batch replacement for the reference's order-dependent
    first-seen canonical assignment (deduplicate_from_qdrant.py:183-186;
    SURVEY.md §7 hard-list #2): every node's ``canonical_id`` is the
    min node id reachable in its similarity component.

    ``edges`` must have columns (a_id, b_id). Each iteration is one
    join + groupBy (label ← min(label, neighbors' labels)); iteration
    count is bounded by the component diameter, and each round's
    result is checkpoint-light (localCheckpoint) so the plan doesn't
    grow unboundedly.
    """
    sym = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(
        edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("canonical_id"))
