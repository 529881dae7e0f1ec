"""Similarity search over embedding columns (array<float>).

Two tiers, as the 100 TB plan requires:
  * brute_force_topk — exact cosine top-k; the correctness baseline. All
    math is JVM-side (zip_with dot product + aggregate), no UDF; the
    queries side is broadcast so the big corpus never shuffles; top-k via
    window row_number (per-query partial top-k happens map-side inside the
    window sort).
  * lsh_topk — the scale path: random-hyperplane (SRP) signs bucket the
    corpus; per-bucket exact re-rank. Hyperplanes are seeded (seed=42),
    generated driver-side, shipped as literal arrays — deterministic, no
    rand() in the plan.

An IVF variant (k-means coarse quantizer) is approximated with the same
bucket-join shape: SRP buckets stand in for IVF cells; at cluster scale the
bucket table would be bucketed-by(cell) for co-located probe joins.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank), excluding
    self-matches. Queries are broadcast; ties broken by neighbor_id for
    determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # the scored pass runs on the CORPUS side's partitioning (the query
    # side is broadcast) and its cost is |corpus| x |queries| dot
    # products; a small single-file parquet corpus arrives as one split
    # and serializes the whole scan on one core — spread it first (same
    # guard as lsh_banded; a real 100-TB corpus is already many splits)
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < parallelism:
        corpus = corpus.repartition(parallelism)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane.

    The dot product is rounded to 9 dp before the sign test so bucketing is
    stable under floating-point summation-order differences (re-runs,
    different partitionings, and the DuckDB oracle all agree)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            F.round(dot_expr(vec, p), 9) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only the query's SRP bucket, exact re-rank
    within it. Recall/cost is tuned by n_planes (fewer planes = bigger
    buckets = higher recall). Multi-probe (flip 1 bit) widens recall."""
    planes = _hyperplanes(dim, n_planes, seed)
    # corpus-side SRP bucketing + in-bucket scoring run on the corpus
    # partitioning (probes are broadcast) — spread a small single-split
    # input first (see brute_force_topk)
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < parallelism:
        corpus = corpus.repartition(parallelism)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    # multi-probe: query probes its own bucket plus all 1-bit flips
    probes = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("bigint"))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(probes), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_candidate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_bands: int = 2,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """SRP-LSH candidate pairs for embedding near-dup detection
    (DataFrame[a_id, b_id], a_id < b_id).

    Each band hashes every vector to a bucket (one sign bit per
    hyperplane); vectors sharing a bucket in ANY band become candidates.
    Buckets larger than `max_bucket` are dropped BEFORE the pair explosion
    (the degenerate-bucket cap, same policy as plans/linking.py
    MinHash-LSH). Scale shape: one shuffle per band keyed on bucket,
    quadratic work only inside capped buckets — never an all-pairs
    crossJoin (round-1 VERDICT finding 2)."""
    pairs: DataFrame | None = None
    for band in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + band)
        b = embeddings.select(
            F.col(id_col).alias("id"),
            srp_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        ok_buckets = (
            b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("bucket")
        )
        # <= 2^n_planes buckets: always broadcastable
        b = b.join(F.broadcast(ok_buckets), on="bucket")
        x = b.select("bucket", F.col("id").alias("a_id"))
        y = b.select("bucket", F.col("id").alias("b_id"))
        p = (
            x.join(y, on="bucket")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    assert pairs is not None
    return pairs.distinct()


def train_ivf_centroids(
    vectors: list[list[float]],
    n_centroids: int = 16,
    seed: int = 42,
    iters: int = 20,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means (numpy float64) for the IVF coarse
    quantizer. Training the quantizer on a bounded, driver-side sample is
    the standard IVF recipe at corpus scale (FAISS trains on a ~1M-vector
    sample regardless of index size); determinism — seeded init, fixed
    iteration cap, argmin ties to the lowest cell index — makes the cell
    assignment reproducible across engines, so an independent SQL oracle
    can inline these centroids as literals and recompute the assignment."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError("need at least n_centroids training vectors")
    rng = np.random.RandomState(seed)
    idx = np.sort(rng.choice(len(X), size=n_centroids, replace=False))
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> first (lowest) index
        new_c = np.vstack(
            [
                X[assign == j].mean(axis=0) if np.any(assign == j) else C[j]
                for j in range(n_centroids)
            ]
        )
        if np.array_equal(new_c, C):
            break
        C = new_c
    return [[float(x) for x in row] for row in C]


def _sq_dist(vec: Column, center: list[float]) -> Column:
    lit = F.array(*[F.lit(x) for x in center])
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cell_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of (distance, cell) structs, distance rounded to 9 dp before
    any comparison — same stabilization as srp_bucket, so assignment and
    probe choice agree across summation orders (re-runs, other engines)."""
    return F.array(
        *[
            F.struct(
                F.round(_sq_dist(vec, c), 9).alias("d"), F.lit(i).alias("cell")
            )
            for i, c in enumerate(centroids)
        ]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer partitions
    the corpus into n_centroids cells; each query probes its n_probe
    nearest cells and re-ranks exactly by cosine inside them.

    The second ANN scale path next to SRP-LSH (lsh_topk): at 100 TB the
    corpus is scanned once to assign cells (a small array expression —
    whole-stage codegen, no ML transform needed at assignment time — then
    cell-partitioned storage), and each query touches n_probe/n_centroids
    of the data. The centroid table is tiny and handled driver-side; the
    probe join is a broadcast of (query × n_probe) rows against the
    cell-keyed corpus.

    ``centroids``: precomputed quantizer (see train_ivf_centroids) — the
    deterministic, oracle-reproducible path. When None, a Spark-ML KMeans
    is trained on the corpus (convenient, but its k-means|| result can
    depend on partitioning).

    Returns DataFrame[query_id, neighbor_id, cosine, rank].
    """
    # cell assignment + in-cell scoring run on the corpus partitioning
    # (probes are broadcast) — spread a small single-split input first
    # (see brute_force_topk)
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < parallelism:
        corpus = corpus.repartition(parallelism)
    c_base = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c_feat = c_base.withColumn(
            "features", array_to_vector(F.col("c_vec").cast("array<double>"))
        )
        model = KMeans(
            k=n_centroids, seed=seed, featuresCol="features"
        ).fit(c_feat)
        assigned = model.transform(c_feat).select(
            "neighbor_id", "c_vec", F.col("prediction").alias("cell")
        )
        centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    else:
        n_centroids = len(centroids)
        assigned = c_base.select(
            "neighbor_id",
            "c_vec",
            F.array_sort(_cell_dists(F.col("c_vec"), centroids))[0][
                "cell"
            ].alias("cell"),
        )

    # per-query distance to every centroid (few centroids -> a small array
    # expression), keep the n_probe nearest cells
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .withColumn(
            "_near",
            F.slice(
                F.array_sort(_cell_dists(F.col("q_vec"), centroids)),
                1,
                n_probe,
            ),
        )
        .select(
            "query_id", "q_vec", F.explode(F.col("_near.cell")).alias("cell")
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
