"""Tiered segment merge with salt-aware hot-term handling.

Reference semantics: TieredMergePolicy — max_merge_at_once 10,
segments_per_tier 10, floor 2MB (/root/reference/src/main/java/org/
elasticsearch/index/merge/policy/TieredMergePolicyProvider.java:37-66).
Small segments are repeatedly combined fan-in≤10 into larger ones; merge
metrics (fan-in) are recorded per merged segment
(index/merge/MergeStats.java:36 analog → manifest rows).

Spark-first design — two key departures from a naive "shuffle by term":

1. **Rebase, don't rebuild.** Merged doc ids = per-segment offset + old
   local id, segments ordered by segment_id. (Key order may interleave
   across former segment boundaries — that's fine: the query gather
   tie-breaks on the real key columns, and the per-segment top-k cut keeps
   entire tie groups, see executor.py.) A postings block under merge
   changes ONLY its absolute first doc id (delta encoding keeps the rest)
   and its block ordinal. So the merge is
   embarrassingly parallel over posting blocks — NO shuffle keyed by term,
   which is exactly how a 10-GB hot-term posting list (df ≈ 1% of 10^12
   turns) avoids landing on a single reducer.

2. **Salted repack.** Rebase alone leaves short tail blocks (<128) from each
   input segment. Optional repack re-blocks to exactly 128 in parallel by
   (term, salt) where salt = block-run bucket — a hot term's compaction is
   split across `salt_buckets` independent tasks, each re-blocking its doc-
   ordered slice, then stitched by block ordinal. Hierarchical and
   order-preserving; never a per-term single reducer.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_spark.index import fsio
from elasticsearch_spark.index.builder import MANIFEST_SCHEMA
from elasticsearch_spark.index.codec import delta_decode, delta_encode, pack_u32, unpack_u32

MAX_MERGE_AT_ONCE = 10  # TieredMergePolicyProvider.java:39 default

POSTINGS_SCHEMA = (
    "term string, block_id long, n_docs int, first_doc long,"
    " last_doc long, max_tf int,"
    " min_dl_eff double, docs_packed binary, tfs_packed binary,"
    " pos_packed binary"
)


def plan_merges(manifest: pd.DataFrame, fan_in: int = MAX_MERGE_AT_ONCE) -> list[list[str]]:
    """Group active segments into merge groups of ≤ fan_in, smallest first."""
    segs = manifest.sort_values("docs_indexed")["segment_id"].tolist()
    return [segs[i : i + fan_in] for i in range(0, len(segs), fan_in) if len(segs[i : i + fan_in]) > 1]


def _offsets(manifest: pd.DataFrame, group: Sequence[str]) -> dict[str, int]:
    sizes = (
        manifest.set_index("segment_id")["docs_indexed"].loc[list(group)].astype(int)
    )
    ordered = sorted(group)
    off, out = 0, {}
    for s in ordered:
        out[s] = off
        off += int(sizes[s])
    return out


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    group: Sequence[str],
    merged_name: str,
    repack: bool = True,
    salt_buckets: int = 32,
    block_size: int = 128,
) -> dict:
    """Merge ``group`` segments into one named ``merged_name``.

    Returns the new manifest row (dict). Old segment dirs are deleted after
    all new files are written (Lucene deletes merged segments the same way).
    """
    man = spark.read.parquet(os.path.join(index_dir, "manifest")).toPandas()
    offsets = _offsets(man, group)
    seg_rank = {s: i for i, s in enumerate(sorted(group))}
    b_off = spark.sparkContext.broadcast(offsets)
    b_rank = spark.sparkContext.broadcast(seg_rank)

    posts = spark.read.parquet(os.path.join(index_dir, "postings")).where(
        F.col("segment_id").isin(list(group))
    )

    if not repack:
        # pure rebase: block-parallel, zero shuffle
        def rebase(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                off = pdf["segment_id"].map(b_off.value).to_numpy(np.int64)
                rank = pdf["segment_id"].map(b_rank.value).to_numpy(np.int64)
                new_docs = []
                for buf, nd, o in zip(pdf["docs_packed"], pdf["n_docs"], off):
                    gaps = unpack_u32(buf, nd)
                    gaps = gaps.copy()
                    gaps[0] += o
                    new_docs.append(pack_u32(gaps))
                out = pdf.drop(columns=["segment_id"]).copy()
                out["docs_packed"] = new_docs
                out["block_id"] = rank * (1 << 32) + pdf["block_id"].to_numpy(np.int64)
                out["first_doc"] = pdf["first_doc"].to_numpy(np.int64) + off
                out["last_doc"] = pdf["last_doc"].to_numpy(np.int64) + off
                # pos_packed: within-doc positions are merge-invariant — pass through
                yield out
        new_posts = posts.mapInPandas(rebase, POSTINGS_SCHEMA)
    else:
        # salted repack: re-block to exactly block_size, parallel by
        # (term, salt); salt = run of source block ordinals → order-preserving
        def repack_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.copy()
            pdf["rank"] = pdf["segment_id"].map(b_rank.value)
            pdf = pdf.sort_values(["rank", "first_doc"])
            offs = pdf["segment_id"].map(b_off.value).to_numpy(np.int64)
            has_pos = pdf["pos_packed"].notna().all()
            docs_all, tfs_all, pos_all = [], [], []
            for buf, tbuf, pbuf, nd, o in zip(
                pdf["docs_packed"], pdf["tfs_packed"], pdf["pos_packed"],
                pdf["n_docs"], offs,
            ):
                docs_all.append(delta_decode(unpack_u32(buf, nd)).astype(np.int64) + o)
                btfs = unpack_u32(tbuf, nd)
                tfs_all.append(btfs)
                if has_pos:
                    pos_all.append(unpack_u32(pbuf, int(btfs.sum())))
            docs = np.concatenate(docs_all)
            tfs = np.concatenate(tfs_all)
            # entry -> flat position offsets (per-doc deltas stay valid:
            # within-doc positions never change under merge)
            if has_pos:
                pos_flat = np.concatenate(pos_all) if pos_all else np.array([], np.uint32)
                entry_end = np.cumsum(tfs.astype(np.int64))
                entry_start = entry_end - tfs
            min_dl = float(pdf["min_dl_eff"].min())
            rows = []
            base = int(key[1]) * (1 << 32)  # salt-major block ordinal space
            for i, b0 in enumerate(range(0, len(docs), block_size)):
                b1 = min(b0 + block_size, len(docs))
                bd = docs[b0:b1].astype(np.uint32)
                bt = tfs[b0:b1]
                rows.append(
                    {
                        "term": key[0],
                        "block_id": base + i,
                        "n_docs": len(bd),
                        "first_doc": int(bd[0]),
                        "last_doc": int(bd[-1]),
                        "max_tf": int(bt.max()),
                        "min_dl_eff": min_dl,
                        "docs_packed": pack_u32(delta_encode(bd)),
                        "tfs_packed": pack_u32(bt),
                        "pos_packed": pack_u32(
                            pos_flat[entry_start[b0] : entry_end[b1 - 1]]
                        )
                        if has_pos
                        else None,
                    }
                )
            return pd.DataFrame(rows)

        # doc-ordered global block ordinal → contiguous salt runs per term
        rank_df = spark.createDataFrame(
            [(s, r) for s, r in seg_rank.items()], "segment_id string, __rank long"
        )
        from pyspark.sql import Window

        ordered = posts.join(F.broadcast(rank_df), "segment_id").withColumn(
            "__ord", F.col("__rank") * F.lit(1 << 40) + F.col("first_doc").cast("long")
        )
        w = Window.partitionBy("term").orderBy("__ord")
        salted = ordered.withColumn("salt", F.ntile(salt_buckets).over(w))
        new_posts = salted.groupBy("term", "salt").applyInPandas(
            repack_fn, POSTINGS_SCHEMA
        )

    posts_out = os.path.join(index_dir, "postings", f"segment_id={merged_name}")
    # bounded parquet row groups so term-range stats stay useful for the
    # pruned driver-local reads after a merge (default 128 MB groups would
    # make the merged file one unprunable block)
    new_posts.write.mode("overwrite").option(
        "parquet.block.size", 1 << 20
    ).parquet(posts_out)

    # docs: offset local ids, concatenate
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).where(
        F.col("segment_id").isin(list(group))
    )
    off_df = spark.createDataFrame(
        [(s, o) for s, o in offsets.items()], "segment_id string, __off long"
    )
    new_docs = (
        docs.join(F.broadcast(off_df), "segment_id")
        .withColumn("local_doc_id", (F.col("local_doc_id") + F.col("__off")).cast("int"))
        .drop("segment_id", "__off")
    )
    docs_out = os.path.join(index_dir, "docs", f"segment_id={merged_name}")
    new_docs.write.mode("overwrite").parquet(docs_out)

    # norms: concatenate packed doc_len arrays in segment order (tiny)
    norms = (
        spark.read.parquet(os.path.join(index_dir, "norms"))
        .where(F.col("segment_id").isin(list(group)))
        .toPandas()
        .sort_values("segment_id")
    )
    merged_norm = pd.DataFrame(
        {
            "n_docs": [int(norms["n_docs"].sum())],
            "sum_doc_len": [int(norms["sum_doc_len"].sum())],
            "doc_len_packed": [b"".join(norms["doc_len_packed"])],
        }
    )
    import pyarrow as pa

    from elasticsearch_spark.index.builder import _write_deterministic

    _write_deterministic(
        pa.Table.from_pandas(merged_norm, preserve_index=False),
        os.path.join(index_dir, "norms", f"segment_id={merged_name}", "data.parquet"),
    )

    # segterms: additive merge
    segterms = spark.read.parquet(os.path.join(index_dir, "segterms")).where(
        F.col("segment_id").isin(list(group))
    )
    new_st = segterms.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("ttf").alias("ttf"),
        F.max("max_tf").alias("max_tf"),
    )
    st_out = os.path.join(index_dir, "segterms", f"segment_id={merged_name}")
    new_st.write.mode("overwrite").parquet(st_out)

    # stats for manifest row
    g = man.set_index("segment_id").loc[list(group)]
    row = {
        "partition_id": -1,
        "segment_id": merged_name,
        "status": "committed",
        "docs_indexed": int(g["docs_indexed"].sum()),
        "n_terms": int(new_st.count()),
        "postings_bytes": int(g["postings_bytes"].sum()),
        "sum_doc_len": int(g["sum_doc_len"].sum()),
        "merge_fan_in": len(group),
        "checksum": "",
    }

    # tombstones: rebase each input segment's delete list into the merged
    # id space (new_id = offset + old_id — the same rebase the postings get)
    from elasticsearch_spark.index import deletes as _del

    merged_dels = []
    for s in group:
        ids = _del.read_deletes(index_dir, s)
        if ids.size:
            merged_dels.append(ids + offsets[s])
    if merged_dels:
        _del.write_deletes(index_dir, merged_name, np.concatenate(merged_dels))

    # retire inputs (physical delete, post-commit — the Lucene way).
    # Routed through fsio so retirement works on file:// / object-store
    # URIs too: IndexReader reads whole directories, so a silently
    # no-op'd local rmtree on a URI store would leave the old segment
    # files visible and double-count every doc.
    for sub in ("postings", "docs", "norms", "segterms", "deletes"):
        for s in group:
            fsio.delete_dir("/".join([index_dir.rstrip("/"), sub, f"segment_id={s}"]))

    # manifest: append merged row + supersede markers
    sup = [
        {**row, "segment_id": s, "status": "superseded", "merge_fan_in": 0,
         "docs_indexed": 0, "n_terms": 0, "postings_bytes": 0, "sum_doc_len": 0}
        for s in group
    ]
    spark.createDataFrame(pd.DataFrame([row] + sup), schema=MANIFEST_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(os.path.join(index_dir, "manifest"))
    return row


def tiered_merge(
    spark: SparkSession,
    index_dir: str,
    fan_in: int = MAX_MERGE_AT_ONCE,
    repack: bool = True,
) -> list[dict]:
    """One tier pass: merge all active segments in groups of ≤ fan_in."""
    man = spark.read.parquet(os.path.join(index_dir, "manifest")).toPandas()
    superseded = set(man.loc[man["status"] == "superseded", "segment_id"])
    active = man[(man["status"] == "committed") & ~man["segment_id"].isin(superseded)]
    # drop rows for already-merged-away segment ids (keep latest state)
    rows = []
    for group in plan_merges(active, fan_in):
        name = f"m-{min(group)}-{len(group):02d}"
        rows.append(merge_segments(spark, index_dir, group, name, repack=repack))
    return rows
