"""Skew-mitigation utilities (SURVEY.md §2e; 100 TB posture).

AQE's skew-join splitting (on in session.py) handles most sort-merge skew
at runtime. These helpers cover the cases AQE can't:

- `key_skew_profile`: measure it first — the top-N heaviest join/group keys
  and their share of all rows. Cheap (one partial-agg pass).
- `salted_join`: explicit key salting for a shuffle join whose hot keys
  overwhelm single tasks even after AQE splitting (e.g. null-heavy or
  power-law foreign keys joined to a mid-size table that can't broadcast).
  The large side scatters each key across `n_salts` sub-keys; the small
  side replicates ×n_salts. Equi-join semantics are preserved exactly.
- `salted_count_distinct`: two-stage distinct aggregation for a hot group
  key (partial distinct per (key, salt), then merge) — the classic fix for
  one-reducer count-distinct.

Salt derivation is deterministic (hash of the large side's whole row, not
rand()), so retried/recomputed tasks produce identical assignments —
nondeterministic salts break exactly-once file commits under task retry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def key_skew_profile(df: DataFrame, key: str | Column, top: int = 20) -> DataFrame:
    """Top-N heaviest keys with absolute counts and share of total rows.

    The total is a composed 1-row aggregate broadcast into the plan — one
    job, no separate count() action scanning the input twice."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("_total"))
        .drop("_total")
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top)
    )


def _row_salt(df: DataFrame, n_salts: int, key: str) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of every non-key
    column. Rows identical in all columns get the same salt — harmless
    (they'd land in the same task anyway)."""
    non_key = [c for c in df.columns if c != key] or [key]
    return F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over `n_salts` sub-keys.

    large: salt each row deterministically → (key, salt) has ≤ 1/n_salts of
    the key's rows. small: explode ×n_salts (use only when small ≪ large —
    the replication cost is n_salts × |small|). Join on (key, salt), then
    drop the salt. Result is column-identical to `large.join(small, on, how)`.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    l = large.withColumn("_salt", _row_salt(large, n_salts, on))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return l.join(s, on=[on, "_salt"], how=how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_col, resistant to a hot
    group key: stage 1 computes partial distinct sets per (group, salt)
    where salt = hash(distinct value) — so duplicates of one value always
    share a salt and global distinctness is preserved; stage 2 sums the
    per-salt distinct counts."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).cast("int")
    partial = (
        df.select(F.col(group_col), F.col(distinct_col), salt.alias("_salt"))
        .groupBy(group_col, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_pc"))
    )
    return partial.groupBy(group_col).agg(F.sum("_pc").alias("n_distinct"))


def join_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
) -> DataFrame:
    """Pre-join audit: before committing cluster time to a large join,
    measure what the join will actually do — key overlap (how much of
    each side even matches), orphan rates (anti-join volume), maximum
    key multiplicity per side (the skew signal `salted_join` acts on),
    and the EXACT output cardinality Σ_shared cnt_l·cnt_r (the
    explosion check: a many-to-many hot key shows up here as a huge
    est_join_rows long before it OOMs a shuffle partition).

    All statistics are exact integer aggregates of the two per-key count
    tables — corpus rows reduce map-side onto their keys (two keyed
    shuffles), the count tables full-outer join co-keyed, and ONE row
    comes out. Nothing about the payload columns is touched or moved.

    Output (1 row): n_keys_left, n_keys_right, n_shared, orphans_left,
    orphans_right, max_mult_left, max_mult_right, est_join_rows.
    """
    lc = left.groupBy(F.col(key).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_cl")
    )
    rc = right.groupBy(F.col(key).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_cr")
    )
    both = lc.join(rc, "_k", "full_outer")
    return both.agg(
        F.count(F.col("_cl")).cast("long").alias("n_keys_left"),
        F.count(F.col("_cr")).cast("long").alias("n_keys_right"),
        F.count(F.when(F.col("_cl").isNotNull() & F.col("_cr").isNotNull(), 1))
        .cast("long")
        .alias("n_shared"),
        F.count(F.when(F.col("_cr").isNull(), 1)).cast("long").alias("orphans_left"),
        F.count(F.when(F.col("_cl").isNull(), 1)).cast("long").alias("orphans_right"),
        F.max("_cl").cast("long").alias("max_mult_left"),
        F.max("_cr").cast("long").alias("max_mult_right"),
        F.sum(
            F.when(
                F.col("_cl").isNotNull() & F.col("_cr").isNotNull(),
                F.col("_cl") * F.col("_cr"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("est_join_rows"),
    )


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_rows: int,
    how: str = "inner",
    salt_threshold: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """The operator a 100 TB user actually calls before a risky join:
    run the `join_profile` audit, REFUSE to execute if the exact output
    cardinality exceeds `max_rows` (raising with the full audit row —
    overlap, orphans, max multiplicities — so the caller sees WHY), and
    otherwise run the join, automatically routing through `salted_join`
    when a side's max key multiplicity exceeds `salt_threshold` (the
    hot-key signal AQE's post-hoc splitting reacts to late; default
    None = never salt, plain join).

    Cost model: the audit is two keyed count shuffles + one co-keyed
    merge producing ONE row — measured here as `join_profile` (registry
    query, sub-second at bench scale) and linear at any scale, i.e. it
    costs a rounding error next to the join it can veto. A vetoed
    explosion (a many-to-many hot key multiplying out billions of rows)
    costs the audit alone instead of a cluster-hours shuffle that dies
    in spill.

    The guard is exact, not an estimate: est_join_rows = Σ_shared
    cnt_l·cnt_r is the inner-join cardinality by definition (left joins
    add the orphan rows on top; the guard compares the inner part plus
    left orphans for how='left'). `how` is validated UP FRONT and
    restricted to inner/left — a right or full join would make the
    cardinality formula undercount (right/full orphans missing from
    `expected`), and a late failure inside `salted_join` after the
    audit already ran would waste the audit (r6 ADVICE).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"guarded_join supports how='inner'/'left' (the cardinality "
            f"guard does not model right/full orphan rows), got {how!r}"
        )
    how = "left" if how == "left_outer" else how
    prof = join_profile(left, right, on).collect()[0]
    expected = int(prof["est_join_rows"])
    if how == "left":
        expected += int(prof["orphans_left"])
    if expected > max_rows:
        raise ValueError(
            f"guarded_join refused: join on {on!r} would produce "
            f"{expected} rows (> max_rows={max_rows}). Audit: {prof.asDict()}"
        )
    salted = (
        salt_threshold is not None
        and max(int(prof["max_mult_left"] or 0), int(prof["max_mult_right"] or 0))
        > salt_threshold
    )
    if salted:
        return salted_join(left, right, on, n_salts=n_salts, how=how)
    return left.join(right, on=on, how=how)
