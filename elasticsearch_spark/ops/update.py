"""Document update / upsert (SURVEY.md §2.1 "update").

Reference: action/update/UpdateHelper.java — the update API is a
get-then-reindex: a partial doc is merged over the existing `_source`
(fields present in the partial doc win), a script may instead rewrite
`ctx._source` fields, and `doc_as_upsert`/`upsert` insert the incoming
doc when no existing one matches.

Spark shape: the whole update batch is ONE MERGE-shaped plan — a single
equi-join of the existing corpus with the (usually much smaller,
broadcast) update batch, no per-document round trips:

- WHEN MATCHED        -> partial-doc merge (coalesce new over old) or
                         script columns over both sides,
- WHEN NOT MATCHED    -> insert the incoming doc (upsert) or drop it,
- untouched rows      -> pass through unchanged.

At 100 TB the join is broadcast when the batch is small (the common
case) and a shuffled hash join otherwise; either way it is one pass
over the corpus with no driver-side iteration. The output feeds
`build_index`/`tiered_merge` exactly like any other corpus snapshot —
Lucene's "reindex the doc" becomes "rewrite the row".
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _Side:
    """Column accessor for one side of the MERGE join: side["col"]."""

    def __init__(self, prefix: str) -> None:
        self._prefix = prefix

    def __getitem__(self, col: str) -> Column:
        return F.col(f"{self._prefix}.{col}")


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    script: Mapping[str, Callable[[DataFrame, DataFrame], Column]] | None = None,
    upsert: bool = True,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE the `updates` batch into `existing` on `key_cols`.

    Without `script`, matched rows take a partial-doc merge: every
    non-key column present in `updates` overwrites the existing value
    when the incoming value is non-null (UpdateHelper's XContent merge).
    With `script`, matched rows compute each scripted column from the
    two sides — each entry maps a column name to a function
    `(old, new) -> Column` evaluated over the joined aliases, e.g.
    ``{"n_chars": lambda o, n: o["n_chars"] + n["n_chars"]}`` is the
    classic ctx._source counter-increment script.

    `upsert=False` drops unmatched incoming docs (plain update);
    `upsert=True` inserts them (doc_as_upsert).
    """
    value_cols = [c for c in existing.columns if c not in key_cols]
    upd_value_cols = [c for c in updates.columns if c not in key_cols]
    missing = [c for c in updates.columns if c not in existing.columns]
    if missing:
        raise ValueError(f"update columns not in existing schema: {missing}")

    old = existing.withColumn("_matched", F.lit(True)).alias("old")
    upd_marked = updates.withColumn("_incoming", F.lit(True))
    maybe_bc = F.broadcast if broadcast_updates else (lambda df: df)
    new = maybe_bc(upd_marked).alias("new")

    # Spark cannot broadcast a FULL OUTER join, and a full outer over the
    # corpus shuffles every row. With a broadcastable batch the plan is
    # decomposed instead: (1) corpus LEFT OUTER broadcast(batch) — matched
    # updates + untouched rows, broadcast hash join, corpus never
    # shuffles; (2) the not-matched inserts via a broadcast anti-join of
    # the batch against the (batch-sized) set of matched keys found in
    # scan (1)'s semi form. Two broadcast scans beat one full shuffle at
    # any corpus size that dwarfs the batch.
    if upsert and broadcast_updates:
        joined = old.join(new, on=key_cols, how="left_outer")
    else:
        joined = old.join(
            new, on=key_cols, how="full_outer" if upsert else "left_outer"
        )
    has_old = F.col("old._matched").isNotNull()
    has_new = F.col("new._incoming").isNotNull()

    out_cols: list[Column] = [F.col(c) for c in key_cols]
    for c in value_cols:
        oldc = F.col(f"old.{c}")
        if script and c in script:
            # script fires only for rows actually touched by the batch;
            # untouched existing rows pass through unchanged
            upd = F.when(has_new, script[c](_Side("old"), _Side("new"))).otherwise(
                oldc
            )
        elif c in upd_value_cols:
            upd = F.coalesce(F.col(f"new.{c}"), oldc)
        else:
            upd = oldc
        # matched -> scripted/merged value; insert-only -> incoming value;
        # update-only rows of existing -> old value untouched
        newc = F.col(f"new.{c}") if c in upd_value_cols else F.lit(None)
        out_cols.append(F.when(has_old, upd).otherwise(newc).alias(c))
    merged = joined.select(*out_cols)

    if upsert and broadcast_updates:
        # inserts = batch rows whose key matched nothing. The matched-key
        # set is found by one semi scan of the corpus against the
        # broadcast batch — its output is at most batch-sized, so the
        # anti-join against the batch broadcasts too.
        matched_keys = existing.join(
            F.broadcast(updates.select(*key_cols)), on=key_cols, how="left_semi"
        ).select(*key_cols)
        inserts = updates.join(
            F.broadcast(matched_keys), on=key_cols, how="left_anti"
        )
        ins_cols: list[Column] = [F.col(c) for c in key_cols]
        for c in value_cols:
            absent = F.lit(None).cast(existing.schema[c].dataType)
            ins_cols.append(
                (F.col(c) if c in upd_value_cols else absent).alias(c)
            )
        ins_sel = inserts.select(*ins_cols)
        ins_sel = ins_sel.select(
            *[
                F.col(c).cast(merged.schema[c].dataType).alias(c)
                for c in merged.columns
            ]
        )
        merged = merged.unionByName(ins_sel, allowMissingColumns=False)
    return merged
