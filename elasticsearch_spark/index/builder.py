"""Partition-parallel inverted-index builder.

The Spark analog of the reference's indexing path (SURVEY.md §3.2):

  bulk routing  shardId = murmur3(routing) mod numShards
    (cluster/routing/operation/plain/PlainOperationRouting.java:265-286)
  → per-shard Lucene segment construction
    (index/engine/internal/InternalEngine.java:571-622, refresh :814-848)
  → translog/commit-point durability
    (index/translog/Translog.java, LocalIndexShardGateway.java:113-161)

Here:
  pid = pmod(murmur3(*routing_cols), n_partitions)  -- one shuffle, total
    (default: ALL key cols = the reference's _id routing, balanced under
    Zipf group sizes; routing_col opts into co-location like ?routing=)
  → repartition(n, *routing_cols).sortWithinPartitions(pid, *key_cols)
    (shuffling on the routing cols themselves puts exactly ONE pid in
    each task — pid is the partition index by construction)
  → mapInPandas streams Arrow batches, accumulates one pid at a time and
    flushes immutable parquet *segments* (postings blocks, doc table, packed
    norms, per-segment term stats) directly from the task — like a Lucene
    flush. Deterministic file names + contents ⇒ task retries and
    checkpoint-resume are idempotent and byte-identical.
  → the returned manifest rows (per-partition lineage + metrics: docs,
    terms, postings bytes, checksum) are committed by the driver — the
    translog/commit-point analog. Resume skips committed pids.

Scale notes (100 TB design): the only full-data shuffle is the routing
repartition. Segment construction is memory-bounded via
``max_docs_per_segment`` flushes. Global term statistics (DFS semantics,
search/dfs/DfsPhase.java:63-104) are one groupBy over the small per-segment
term-stats tables, written sorted by term so query-time term lookups prune
row groups.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import analyze_codes
from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.functions.smallfloat import effective_doc_length
from elasticsearch_spark.index import fsio
from elasticsearch_spark.index.codec import delta_encode, pack_u32

PID_COL = "__pid"


def _join(base: str, *parts: str) -> str:
    """URI-safe path join (os.path.join would mangle scheme://)."""
    return "/".join([base.rstrip("/"), *parts])

MANIFEST_SCHEMA = (
    "partition_id int, segment_id string, status string, docs_indexed long, "
    "n_terms long, postings_bytes long, sum_doc_len long, merge_fan_in int, "
    "checksum string"
)


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    total_tokens: int
    n_segments: int
    n_partitions: int


def _write_deterministic(table: pa.Table, path: str, **kw) -> None:
    fsio.write_table_deterministic(
        table, path, compression="zstd", write_statistics=True,
        data_page_size=1 << 20, **kw,
    )


def _flush_segment(
    pid: int,
    seq: int,
    frames: list[pd.DataFrame],
    cfg: IndexConfig,
    index_dir: str,
    segment_prefix: str = "",
) -> dict:
    """Build one immutable segment from the pandas rows of one pid chunk."""
    pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    seg = f"{segment_prefix}{pid:05d}-{seq:03d}"
    n_docs = len(pdf)

    codes, uniques, doc_len = analyze_codes(pdf[cfg.text_col], cfg.analyzer)
    dl_eff = effective_doc_length(doc_len, quantize=cfg.bm25.quantize_norms)

    # exploded (local_doc_id, term, position) triples — vectorized
    lens = doc_len
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.uint32), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if n_docs else np.array([], dtype=np.int64)
    pos_rep = (np.arange(int(lens.sum())) - np.repeat(starts, lens)).astype(np.uint32)
    # sort by (term, doc, pos) entirely in integer space: token codes ranked
    # by lexicographic term order, then one lexsort — several times faster
    # (and far more memory-bandwidth-friendly) than an object sort;
    # tf = run length per (term, doc), positions stay ascending inside runs
    # (Lucene .pos file order)
    order = np.argsort(uniques)
    rank_of_code = np.empty(len(uniques), dtype=np.int64)
    rank_of_code[order] = np.arange(len(uniques))
    term_rank = rank_of_code[codes] if len(codes) else np.array([], np.int64)
    sort_idx = np.lexsort((pos_rep, doc_rep, term_rank))
    s_rank = term_rank[sort_idx]
    s_docs = doc_rep[sort_idx]
    s_pos = pos_rep[sort_idx]
    n_flat = len(sort_idx)
    if n_flat:
        new_grp = np.empty(n_flat, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (s_rank[1:] != s_rank[:-1]) | (s_docs[1:] != s_docs[:-1])
        gstarts = np.flatnonzero(new_grp)
    else:
        gstarts = np.array([], dtype=np.int64)
    gends = np.append(gstarts[1:], n_flat)
    ranks_arr = s_rank[gstarts]
    docs_arr = s_docs[gstarts]
    tfs_arr = (gends - gstarts).astype(np.uint32)
    # per-doc-group delta-encoded positions (flat, group-aligned)
    pos_delta = s_pos.copy()
    if n_flat:
        pos_delta[1:] -= s_pos[:-1]
        pos_delta[gstarts] = s_pos[gstarts]
    # entry -> flat-position offset of the entry's first position
    entry_off = gstarts

    # term boundaries (ranks_arr sorted); uniq_terms in lexicographic order
    uniq_ranks, term_starts = np.unique(ranks_arr, return_index=True)
    term_ends = np.append(term_starts[1:], len(ranks_arr))
    sorted_uniques = uniques[order] if len(uniques) else uniques
    uniq_terms = (
        np.asarray(sorted_uniques, dtype=object)[uniq_ranks]
        if len(uniq_ranks)
        else np.array([], dtype=object)
    )

    bs = cfg.block_size
    with_pos = cfg.index_positions
    p_term, p_block, p_ndocs, p_firstdoc, p_lastdoc = [], [], [], [], []
    p_maxtf, p_mindl, p_docs, p_tfs, p_pos = [], [], [], [], []
    st_df, st_ttf, st_maxtf = [], [], []
    postings_bytes = 0
    h = hashlib.sha256()
    for ti in range(len(uniq_terms)):
        s, e = term_starts[ti], term_ends[ti]
        tdocs = docs_arr[s:e]
        ttfs = tfs_arr[s:e]
        st_df.append(e - s)
        st_ttf.append(int(ttfs.sum()))
        st_maxtf.append(int(ttfs.max()))
        for b0 in range(0, len(tdocs), bs):
            b1 = min(b0 + bs, len(tdocs))
            bdocs = tdocs[b0:b1]
            btfs = ttfs[b0:b1]
            packed_d = pack_u32(delta_encode(bdocs))
            packed_t = pack_u32(btfs)
            p_term.append(uniq_terms[ti])
            p_block.append(b0 // bs)
            p_ndocs.append(len(bdocs))
            p_firstdoc.append(int(bdocs[0]))
            p_lastdoc.append(int(bdocs[-1]))
            p_maxtf.append(int(btfs.max()))
            p_mindl.append(float(dl_eff[bdocs].min()))
            p_docs.append(packed_d)
            p_tfs.append(packed_t)
            if with_pos:
                # flat per-doc delta positions for the block's entries
                flo = entry_off[s + b0]
                fhi = gends[s + b1 - 1]
                packed_p = pack_u32(pos_delta[flo:fhi])
                p_pos.append(packed_p)
                postings_bytes += len(packed_p)
                h.update(packed_p)
            else:
                p_pos.append(None)
            postings_bytes += len(packed_d) + len(packed_t)
            h.update(packed_d)
            h.update(packed_t)

    seg_dir = lambda sub: "/".join([index_dir.rstrip("/"), sub, f"segment_id={seg}", "data.parquet"])  # noqa: E731
    postings_tbl = pa.table(
        {
            "term": pa.array(p_term, pa.string()),
            # int64: merged segments use composite (rank<<32 | ordinal) ids
            "block_id": pa.array(p_block, pa.int64()),
            "n_docs": pa.array(p_ndocs, pa.int32()),
            "first_doc": pa.array(p_firstdoc, pa.int64()),
            "last_doc": pa.array(p_lastdoc, pa.int64()),
            "max_tf": pa.array(p_maxtf, pa.int32()),
            "min_dl_eff": pa.array(p_mindl, pa.float64()),
            "docs_packed": pa.array(p_docs, pa.binary()),
            "tfs_packed": pa.array(p_tfs, pa.binary()),
            # per-doc delta-encoded positions, entry lengths = tfs
            # (the .pos file analog; NULL when index_positions=False)
            "pos_packed": pa.array(p_pos, pa.binary()),
        }
    )
    # small row groups on the term-sorted postings: parquet min/max stats
    # then prune a term lookup to ~1-2 groups per segment instead of the
    # whole file (measured: the driver-local query path read ALL 32
    # segment files fully per query with one whole-file group — the
    # dominant share of its ~0.5 s latency at sf0.1)
    _write_deterministic(postings_tbl, seg_dir("postings"), row_group_size=512)

    doc_cols = {
        "local_doc_id": pa.array(np.arange(n_docs, dtype=np.int32)),
        "doc_len": pa.array(doc_len, pa.int64()),
        "dl_eff": pa.array(dl_eff, pa.float64()),
    }
    for c in (*cfg.key_cols, *cfg.stored_cols):
        arr = pa.Array.from_pandas(pdf[c])
        if pa.types.is_timestamp(arr.type) and arr.type.unit == "ns":
            # Spark cannot read TIMESTAMP(NANOS) parquet
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
        doc_cols[c] = arr
    _write_deterministic(pa.table(doc_cols), seg_dir("docs"))

    # norms: packed true doc lengths (uint32), one row per segment — the
    # scorer re-derives byte315 effective lengths exactly (float64) from
    # these, so quantized scores are bit-identical to the oracle.
    norms_tbl = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "sum_doc_len": pa.array([int(doc_len.sum())], pa.int64()),
            "doc_len_packed": pa.array(
                [doc_len.astype(np.uint32).tobytes()], pa.binary()
            ),
        }
    )
    _write_deterministic(norms_tbl, seg_dir("norms"))

    segterms_tbl = pa.table(
        {
            "term": pa.array(uniq_terms, pa.string()),
            "df": pa.array(st_df, pa.int64()),
            "ttf": pa.array(st_ttf, pa.int64()),
            "max_tf": pa.array(st_maxtf, pa.int32()),
        }
    )
    _write_deterministic(segterms_tbl, seg_dir("segterms"))

    return {
        "partition_id": pid,
        "segment_id": seg,
        "status": "committed",
        "docs_indexed": n_docs,
        "n_terms": len(uniq_terms),
        "postings_bytes": postings_bytes,
        "sum_doc_len": int(doc_len.sum()),
        "merge_fan_in": 1,
        "checksum": h.hexdigest(),
    }


def _make_build_fn(cfg: IndexConfig, index_dir: str, max_docs_per_segment: int,
                   segment_prefix: str = ""):
    def build_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        cur_pid: int | None = None
        buf: list[pd.DataFrame] = []
        buf_docs = 0
        seq = 0

        def flush():
            nonlocal buf, buf_docs, seq
            if buf_docs:
                rows.append(
                    _flush_segment(cur_pid, seq, buf, cfg, index_dir, segment_prefix)
                )
                seq += 1
            buf, buf_docs = [], 0

        for batch in batches:
            if batch.empty:
                continue
            # batch is sorted by (pid, keys); split on pid changes
            pids = batch[PID_COL].to_numpy()
            change = np.flatnonzero(np.diff(pids)) + 1
            for chunk in np.split(np.arange(len(batch)), change):
                part = batch.iloc[chunk]
                pid = int(part[PID_COL].iloc[0])
                if pid != cur_pid:
                    flush()
                    cur_pid, seq = pid, 0
                buf.append(part)
                buf_docs += len(part)
                if buf_docs >= max_docs_per_segment:
                    flush()
        flush()
        yield pd.DataFrame(
            rows,
            columns=[
                "partition_id", "segment_id", "status", "docs_indexed",
                "n_terms", "postings_bytes", "sum_doc_len", "merge_fan_in",
                "checksum",
            ],
        )

    return build_fn


def dedup_latest(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Keep-latest-version semantics for duplicated keys (the versionMap /
    external-versioning analog, index/engine/internal/LiveVersionMap.java)."""
    if not cfg.dedup_latest_by:
        return df
    w = (
        Window.partitionBy(*cfg.key_cols)
        .orderBy(F.col(cfg.dedup_latest_by).desc())
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def committed_pids(spark: SparkSession, index_dir: str) -> set[int]:
    mpath = _join(index_dir, "manifest")
    if not fsio.exists(mpath):
        return set()
    man = spark.read.parquet(mpath)
    return {
        r["partition_id"]
        for r in man.where(F.col("status") == "committed")
        .select("partition_id").distinct().collect()
    }


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    max_docs_per_segment: int = 1 << 20,
    only_pids: set[int] | None = None,
    segment_prefix: str = "",
) -> BuildResult:
    """Build (or resume) the inverted index for ``df`` under ``index_dir``.

    ``only_pids`` restricts the build to a pid subset (used by tests to
    simulate a crash between partition commits). ``segment_prefix`` makes
    segment names unique per increment (streaming micro-batches append
    segments b{batch}-{pid}-{seq} — idempotent under batch replay because
    names and contents are deterministic).
    """
    cfg = cfg or IndexConfig()
    fsio.makedirs(index_dir)

    df = dedup_latest(df, cfg)
    # F.hash is Murmur3(seed 42) — the SAME function HashPartitioning uses,
    # so pid == the physical partition index under repartition(n, *cols).
    # Routing through a precomputed pid column instead (repartition(n, pid))
    # re-hashes the pid VALUE and collides distinct pids balls-in-bins:
    # measured 3 pids (39k rows) in one task vs the 13k average at n=64.
    df = df.withColumn(
        PID_COL,
        F.pmod(
            F.hash(*[F.col(c) for c in cfg.routing_cols()]),
            F.lit(cfg.n_partitions),
        ).cast("int"),
    )

    skip = committed_pids(spark, index_dir) if resume else set()
    if skip:
        df = df.where(~F.col(PID_COL).isin(sorted(skip)))
    if only_pids is not None:
        df = df.where(F.col(PID_COL).isin(sorted(only_pids)))

    shaped = (
        df.repartition(
            cfg.n_partitions, *[F.col(c) for c in cfg.routing_cols()]
        ).sortWithinPartitions(PID_COL, *cfg.key_cols)
    )
    build_fn = _make_build_fn(cfg, index_dir, max_docs_per_segment, segment_prefix)
    manifest = shaped.mapInPandas(build_fn, schema=MANIFEST_SCHEMA)
    import time as _time

    # Pin the segment stage at exactly n_partitions tasks. When an upstream
    # op (e.g. the dedup_latest window) already hash-partitions on the
    # routing columns, Catalyst elides the explicit repartition as redundant
    # — one shuffle total, pid still == partition index — but the surviving
    # exchange is AQE-coalescible: measured 64 partitions merged into 5
    # tasks of 13 pids each (300 MB / 64 MB advisory), which packs terribly
    # across cores (5 tasks on 4 cores = a half-idle second wave). Segment
    # parallelism is an explicit layout choice; never let AQE resize it.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    t0 = _time.perf_counter()
    try:
        manifest_rows = manifest.collect()  # small: one row per segment
    finally:
        spark.conf.set(coalesce_key, prev_coalesce)
    t_segments = _time.perf_counter() - t0

    # commit manifest (translog/commit-point analog) — append mode for resume.
    # Replay-idempotent: a re-run batch (e.g. foreachBatch failure recovery)
    # rewrites byte-identical segment files, so rows whose segment_id is
    # already committed are dropped instead of appended — appending them
    # would double-count n_docs/total_tokens in the stats path below and
    # shift every BM25 score.
    mpath = _join(index_dir, "manifest")
    new_rows = manifest_rows
    if new_rows and fsio.exists(mpath):
        already = {
            r["segment_id"]
            for r in spark.read.parquet(mpath)
            .where(F.col("status") == "committed")
            .select("segment_id").distinct().collect()
        }
        new_rows = [r for r in new_rows if r["segment_id"] not in already]
    if new_rows:
        spark.createDataFrame(new_rows, schema=MANIFEST_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(mpath)

    # global DFS statistics: one small groupBy over per-segment term stats.
    # Corpus totals come from the manifest rows already on the driver — no
    # extra Spark jobs (serial-fraction discipline: besides the segment
    # build itself, the only remaining job is the termstats groupBy).
    if resume or segment_prefix:
        man = spark.read.parquet(mpath).toPandas()
        superseded = set(man.loc[man["status"] == "superseded", "segment_id"])
        man = man[
            (man["status"] == "committed") & ~man["segment_id"].isin(superseded)
        ].drop_duplicates(subset=["segment_id"])  # replay-safe: count each once
        n_docs = int(man["docs_indexed"].sum())
        total_tokens = int(man["sum_doc_len"].sum())
        n_segments = int(len(man))
    else:
        n_docs = sum(r["docs_indexed"] for r in manifest_rows)
        total_tokens = sum(r["sum_doc_len"] for r in manifest_rows)
        n_segments = len(manifest_rows)
    t0 = _time.perf_counter()
    _write_global_stats(spark, index_dir, cfg, n_docs, total_tokens)
    t_stats = _time.perf_counter() - t0
    if os.environ.get("ES_SPARK_BUILD_TIMINGS"):
        print(f"[build] segments={t_segments:.2f}s stats={t_stats:.2f}s")

    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        total_tokens=total_tokens,
        n_segments=n_segments,
        n_partitions=cfg.n_partitions,
    )


def _write_global_stats(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig,
    n_docs: int,
    total_tokens: int,
) -> None:
    segterms = spark.read.parquet(_join(index_dir, "segterms"))
    stats = (
        segterms.groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("ttf").alias("ttf"),
            F.max("max_tf").alias("max_tf"),
        )
        .sortWithinPartitions("term")  # row-group pruning on term lookups
    )
    out = _join(index_dir, "termstats")
    if fsio.is_local(index_dir):
        # local: stage + atomic dir swap so concurrent readers never see a
        # half-written stats table (os-level ops need scheme-free paths)
        _, local_root = fsio.resolve(index_dir)
        tmp = _join(index_dir, "termstats.tmp")
        stats.write.mode("overwrite").parquet(tmp)
        import shutil

        local_out = os.path.join(local_root, "termstats")
        if os.path.isdir(local_out):
            shutil.rmtree(local_out)
        os.replace(os.path.join(local_root, "termstats.tmp"), local_out)
    else:
        # object stores have no rename; Spark's overwrite of an immutable
        # stats prefix is the standard pattern there
        stats.write.mode("overwrite").parquet(out)

    meta = {
        "n_docs": int(n_docs),
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / n_docs) if n_docs else 1.0,
        "config": asdict(cfg),
    }
    fsio.write_bytes(
        _join(index_dir, "meta.json"),
        json.dumps(meta, indent=1, default=str).encode(),
    )
