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


def ivf_topk(
    emb: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    bits: int = 6,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane cell is within
    `probe_hamming` bit flips of the query's cell (multi-probe LSH).

    At scale, write the table partitioned by cell id → partition pruning
    turns this into a sub-scan of nprobe/nlist of the data."""
    import math

    # query cell computed driver-side with the same hash family
    import numpy as np

    def _xx_parity(i: int, p: int) -> float:
        # must match Spark xxhash64(i, p) & 1 — compute via a tiny Spark-free
        # reimplementation is risky; instead evaluate lazily in the plan.
        raise NotImplementedError

    # evaluate query cell inside Spark for exact hash parity
    spark = emb.sparkSession
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
    pruned = emb.withColumn("__cell", hyperplane_cell(vec_col, bits)).where(
        F.col("__cell").isin(cells)
    )
    return cosine_topk(pruned.drop("__cell"), vec_col, key_col, query_vec, k)
