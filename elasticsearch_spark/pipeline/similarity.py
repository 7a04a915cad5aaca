"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, fully JVM-side
  (F.aggregate/zip_with dot product — no Python in the plan).
- IVF (inverted-file) top-k: coarse quantizer of nlist seeded pseudo-random
  centroid assignments via hyperplane codes; probe nprobe cells — the scale
  path (candidate set shrinks ~nlist/nprobe-fold before exact scoring).

Scale note: brute force is one narrow scan + TakeOrderedAndProject (no
shuffle of vectors); IVF turns it into a partition-pruned scan when the
table is written partitioned/bucketed by cell id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec_col: str, q: Sequence[float]) -> F.Column:
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return F.expr(
        f"aggregate(zip_with({vec_col}, __q, (x, y) -> x * y),"
        " cast(0.0 as double), (a, x) -> a + x)"
    ), qarr


def cosine_topk(
    emb: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    decimals: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k — JVM expressions only."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    dot, qarr = _dot_expr(vec_col, query_vec)
    vnorm = F.sqrt(
        F.expr(
            f"aggregate({vec_col}, cast(0.0 as double), (a, x) -> a + cast(x as double) * x)"
        )
    )
    out = (
        emb.withColumn("__q", qarr)
        .withColumn("cosine", dot / (vnorm * qnorm))
        .drop("__q")
        .select(key_col, "cosine")
    )
    if decimals is not None:
        out = out.withColumn("cosine", F.round("cosine", decimals))
    return out.orderBy(F.col("cosine").desc(), F.col(key_col).asc()).limit(k)


def hyperplane_cell(vec_col: str, bits: int = 6) -> F.Column:
    """Deterministic coarse-quantizer cell id: sign pattern of `bits` seeded
    pseudo-random hyperplanes (components ±1 from xxhash64 parity)."""
    total = F.lit(0)
    for p in range(bits):
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
            f" (x, i) -> cast(x as double) * ((cast(xxhash64(i, {p}) & 1 as double)) * 2 - 1)),"
            " cast(0.0 as double), (a, x) -> a + x)"
        )
        total = total + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return total


def probe_cells(
    emb_or_spark, vec_col: str, query_vec: Sequence[float], bits: int,
    probe_hamming: int,
) -> list[int]:
    """Cells within ``probe_hamming`` bit flips of the query's cell.

    The query cell is evaluated inside Spark with the same hash family as
    the stored vectors (exact xxhash64 parity — a python reimplementation
    could drift)."""
    spark = getattr(emb_or_spark, "sparkSession", emb_or_spark)
    qdf = spark.createDataFrame(
        [([float(x) for x in query_vec],)], f"{vec_col} array<double>"
    )
    qcell = qdf.select(hyperplane_cell(vec_col, bits).alias("c")).collect()[0]["c"]
    cells = [qcell]
    if probe_hamming >= 1:
        cells += [qcell ^ (1 << b) for b in range(bits)]
    if probe_hamming >= 2:
        cells += [
            qcell ^ (1 << b1) ^ (1 << b2)
            for b1 in range(bits)
            for b2 in range(b1 + 1, bits)
        ]
    return cells


def ivf_topk(
    emb: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    bits: int = 6,
    probe_hamming: int = 1,
    decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane cell is within
    `probe_hamming` bit flips of the query's cell (multi-probe LSH).

    Ad-hoc variant: recomputes cells over the scan (one full pass, no
    writer needed). For repeated queries at scale use ``write_ivf`` +
    ``ivf_topk_indexed`` — partition pruning replaces the full pass."""
    from elasticsearch_spark.pipeline.dedup import _ensure_parallelism

    cells = probe_cells(emb, vec_col, query_vec, bits, probe_hamming)
    pruned = (
        _ensure_parallelism(emb)
        .withColumn("__cell", hyperplane_cell(vec_col, bits))
        .where(F.col("__cell").isin(cells))
    )
    return cosine_topk(
        pruned.drop("__cell"), vec_col, key_col, query_vec, k, decimals
    )


def write_ivf(
    emb: DataFrame,
    vec_col: str,
    out_dir: str,
    bits: int = 6,
) -> None:
    """Materialize the IVF layout: parquet partitioned by hyperplane cell.

    One pass over the vectors; every later query reads only its probe
    cells' partitions (directory-level partition pruning — the scan is
    ~nprobe/2^bits of the data, the IVF inverted-list walk)."""
    from elasticsearch_spark.pipeline.dedup import _ensure_parallelism

    # the cell computation (bits x dim fold per row) is the expensive part:
    # spread under-partitioned inputs across the cluster before it runs
    _ensure_parallelism(emb).withColumn(
        "cell", hyperplane_cell(vec_col, bits)
    ).write.mode("overwrite").partitionBy("cell").parquet(out_dir)


def ivf_topk_indexed(
    spark,
    ivf_dir: str,
    vec_col: str,
    key_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    bits: int = 6,
    probe_hamming: int = 1,
    decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k over a ``write_ivf`` layout with partition pruning
    (``cell IN (probes)`` hits only those hive partitions — verify with
    .explain: PartitionFilters carries the IN list)."""
    cells = probe_cells(spark, vec_col, query_vec, bits, probe_hamming)
    pruned = spark.read.parquet(ivf_dir).where(F.col("cell").isin(cells))
    return cosine_topk(
        pruned.drop("cell"), vec_col, key_col, query_vec, k, decimals
    )
