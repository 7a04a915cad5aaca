"""Streaming exact deduplication — a custom stateful operator.

The batch pipeline's exact dedup (pipeline/dedup.py) needs the whole corpus
in one pass; a continuous ingest (the reference's river / bulk-stream
analog, with the versionMap keep-semantics of
index/engine/internal/LiveVersionMap.java) must drop re-arrivals of
already-seen content ACROSS micro-batches. That is per-key mutable state —
Structured Streaming's ``applyInPandasWithState``:

- key: xxhash64(text) — constant-width state keys, never the documents
  (the same shuffle-key discipline as the batch op: at 100 TB the state
  store holds 8-byte hashes + one first-seen key each, not text);
- state: the first-seen doc key (emitted once; later arrivals of the same
  hash emit nothing);
- within one micro-batch, the smallest doc key wins (deterministic under
  batch-internal shuffle order), matching the batch op's keep-smallest.

State is hash-partitioned by Spark's state store — adding executors splits
the key space, no single-node seen-set. GroupStateTimeout is configurable:
NoTimeout keeps state forever (true global dedup); processing-time timeout
turns it into a bounded-memory sliding dedup window.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    timeout: str = "NoTimeout",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """First-seen-wins exact dedup over a stream: (key, text_hash) rows of
    documents whose content hash was never seen in any earlier micro-batch.

    ``timeout="NoTimeout"`` keeps state forever (true global dedup);
    ``timeout="ProcessingTimeTimeout"`` evicts a hash's state ``timeout_ms``
    after its last sighting — a bounded-memory sliding dedup window where a
    re-arrival after eviction is emitted again (by design: the window
    forgot it). Join the result back to the payload stream downstream;
    keeping the stateful operator narrow keeps the state store and shuffle
    at fixed width regardless of document size.
    """
    hashed = stream_df.select(
        F.col(key_col).alias("key"),
        F.xxhash64(F.col(text_col)).alias("text_hash"),
    )
    use_timeout = timeout == "ProcessingTimeTimeout"
    # key/state width follows the caller's key column (long doc ids,
    # string conv_ids, ...) — round-4 advice: the schema was hard-coded
    # 'long' and int(best) broke string keys at runtime
    key_sql = stream_df.schema[key_col].dataType.simpleString()
    key_is_int = key_sql in ("tinyint", "smallint", "int", "bigint", "long")
    norm = (lambda v: int(v)) if key_is_int else (lambda v: v)

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # sliding window: forget this hash
            return
        if state.exists:
            # already emitted; a fresh sighting extends the window
            if use_timeout:
                state.setTimeoutDuration(timeout_ms)
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["key"].min()
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((norm(best),))
        if use_timeout:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [best], "text_hash": [key[0]]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType=f"key {key_sql}, text_hash long",
        stateStructType=f"first_key {key_sql}",
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
