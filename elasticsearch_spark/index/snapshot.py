"""Snapshot / restore of an index (SURVEY.md §2.1).

Reference: the gateway/snapshot services (index/gateway/,
LocalIndexShardGateway.java:113-161 recovers an index from its commit
point + translog). Segments here are already immutable parquet files and
the manifest is the commit point, so a snapshot IS a consistent copy of
the active file set — no quiescing needed; concurrent appends land in new
segment dirs the snapshot simply doesn't include.

Works across any pyarrow filesystem pair via index/fsio (local→s3,
s3→local, ...), so it doubles as the cross-store migration path.
"""

from __future__ import annotations

import json

from elasticsearch_spark.index import fsio

_SUBDIRS = ("postings", "docs", "norms", "segterms")


def _join(base: str, *parts: str) -> str:
    return "/".join([base.rstrip("/"), *parts])


def _copy_file(src: str, dst: str) -> None:
    fsio.write_bytes(dst, fsio.read_bytes(src))


def _copy_dir(src: str, dst: str) -> None:
    from pyarrow import fs as pafs

    sfs, sp = fsio.resolve(src)
    infos = sfs.get_file_info(pafs.FileSelector(sp, recursive=True))
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        rel = info.path[len(sp) :].lstrip("/")
        _copy_file(_join(src, rel), _join(dst, rel))


def active_segments(spark, index_dir: str) -> list[str]:
    """Committed, non-superseded segment ids from the manifest."""
    from pyspark.sql import functions as F

    man = spark.read.parquet(_join(index_dir, "manifest"))
    superseded = {
        r["segment_id"]
        for r in man.where(F.col("status") == "superseded")
        .select("segment_id").distinct().collect()
    }
    return sorted(
        {
            r["segment_id"]
            for r in man.where(F.col("status") == "committed")
            .select("segment_id").distinct().collect()
        }
        - superseded
    )


def snapshot(spark, index_dir: str, snap_dir: str) -> dict:
    """Copy the active file set (segments + tombstones + termstats +
    manifest + meta) to ``snap_dir``; returns the written snapshot
    manifest (segment list). Per-segment delete lists (deletes/) are part
    of the commit point — omitting them would resurrect tombstoned docs
    on restore (Lucene snapshots likewise include the .del generation)."""
    segs = active_segments(spark, index_dir)
    for sub in _SUBDIRS:
        for seg in segs:
            _copy_dir(
                _join(index_dir, sub, f"segment_id={seg}"),
                _join(snap_dir, sub, f"segment_id={seg}"),
            )
    for seg in segs:  # tombstones exist only for segments with deletes
        src = _join(index_dir, "deletes", f"segment_id={seg}")
        if fsio.exists(src):
            _copy_dir(src, _join(snap_dir, "deletes", f"segment_id={seg}"))
    _copy_dir(_join(index_dir, "termstats"), _join(snap_dir, "termstats"))
    _copy_dir(_join(index_dir, "manifest"), _join(snap_dir, "manifest"))
    _copy_file(_join(index_dir, "meta.json"), _join(snap_dir, "meta.json"))
    snap_meta = {"segments": segs, "source": index_dir}
    fsio.write_bytes(
        _join(snap_dir, "snapshot.json"), json.dumps(snap_meta, indent=1).encode()
    )
    return snap_meta


def restore(snap_dir: str, index_dir: str) -> dict:
    """Materialize a snapshot as a live index directory (byte copy — the
    snapshot layout IS the index layout plus snapshot.json)."""
    snap_meta = json.loads(fsio.read_bytes(_join(snap_dir, "snapshot.json")))
    for sub in _SUBDIRS:
        for seg in snap_meta["segments"]:
            _copy_dir(
                _join(snap_dir, sub, f"segment_id={seg}"),
                _join(index_dir, sub, f"segment_id={seg}"),
            )
    for seg in snap_meta["segments"]:
        src = _join(snap_dir, "deletes", f"segment_id={seg}")
        if fsio.exists(src):
            _copy_dir(src, _join(index_dir, "deletes", f"segment_id={seg}"))
    _copy_dir(_join(snap_dir, "termstats"), _join(index_dir, "termstats"))
    _copy_dir(_join(snap_dir, "manifest"), _join(index_dir, "manifest"))
    _copy_file(_join(snap_dir, "meta.json"), _join(index_dir, "meta.json"))
    return snap_meta
