"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k for a set of query vectors:
  broadcast the (small) query set against the full corpus, dot product via
  an Arrow-vectorized float64 kernel (order-stable accumulation, see
  ``_dot_kernel``), deterministic ranking (similarity rounded to 6 dp,
  ties broken by vec_id). This is the correctness baseline; at 10^9
  vectors it is one broadcast-join scan whose only shuffle carries the
  bounded per-partition top-k candidates (``_partial_topk``).
* ``embedding_near_dup_pairs`` — cosine near-duplicate pairs, blocked by
  ``label`` (the pre-clustered coarse bucket) so the self-join is
  block-diagonal rather than O(N²).
* ``lsh_ann_topk`` — random-hyperplane LSH: seeded deterministic planes
  (numpy, broadcast), sign-bit bucket via a vectorized pandas UDF; top-k is
  searched only within the query's bucket — the scale path (bucket count
  grows with corpus size; per-bucket candidate lists stay bounded).
"""


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# a DataType instance (not a DDL string) keeps the module importable with
# no active SparkContext — string return types are parsed eagerly
@pandas_udf(DoubleType())
def _dot_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Float64 dot product of two array<float> columns.

    Arrow-batched and vectorized ACROSS rows in numpy, but accumulated
    sequentially left-to-right OVER dimensions — the exact IEEE order of
    DuckDB's list_aggregate 'sum' (and of Spark's F.aggregate fold), so
    similarity values replay bit-identically in the SQL oracles. A BLAS
    matmul would reassociate the sum and drift in the last ulp.

    This replaces the Catalyst higher-order-function formulation: HOF
    lambdas are interpreted per element (~µs/element + allocation — the
    measured scale-killer, see BENCH/BASELINE.md), while this kernel runs
    one numpy multiply-add per dimension per Arrow batch."""
    A = np.vstack([np.asarray(v, dtype=np.float64) for v in a])
    B = np.vstack([np.asarray(v, dtype=np.float64) for v in b])
    acc = np.zeros(len(A), dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return pd.Series(acc)


def _dot(a, b):
    return _dot_kernel(a if isinstance(a, F.Column) else F.col(a),
                       b if isinstance(b, F.Column) else F.col(b))


def _partial_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k with a truly bounded per-partition partial fold.

    A bare ``row_number`` over ``Window.partitionBy(query_id)`` funnels the
    entire scored corpus into n_queries tasks; a ``collect_list``-then-
    ``slice`` partial still buffers every scored row of a partition
    before slicing. Instead, an Arrow ``mapInPandas`` fold keeps at most
    k candidates per query ACROSS batches (state = n_queries × k rows,
    independent of partition size), so the shuffle carries
    n_partitions × n_queries × k rows and the final rank window runs
    over that tiny set. Same total order (sim desc, vec_id asc) at every
    step, so results — and the SQL oracles — are unchanged."""
    import pandas as pd

    def fold(batches):
        state: dict = {}  # query_id -> (sims desc, vec_ids) best-k arrays
        for pdf in batches:
            for qid, grp in pdf.groupby("query_id", sort=False):
                s = grp["sim"].to_numpy(dtype=np.float64)
                v = grp["vec_id"].to_numpy(dtype=np.int64)
                prev = state.get(qid)
                if prev is not None:
                    s = np.concatenate([prev[0], s])
                    v = np.concatenate([prev[1], v])
                order = np.lexsort((v, -s))[:k]  # sim desc, ties id asc
                state[qid] = (s[order], v[order])
        yield pd.DataFrame({
            "query_id": np.repeat(
                np.fromiter(state.keys(), dtype=np.int64, count=len(state)),
                [len(s) for s, _ in state.values()]) if state else
            np.array([], dtype=np.int64),
            "sim": (np.concatenate([s for s, _ in state.values()])
                    if state else np.array([], dtype=np.float64)),
            "vec_id": (np.concatenate([v for _, v in state.values()])
                       if state else np.array([], dtype=np.int64)),
        })

    cand = (scored.select("query_id", "sim", "vec_id")
            .mapInPandas(fold, "query_id long, sim double, vec_id long"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "sim", "rank"))


def cosine_topk(df: DataFrame, n_queries: int = 5, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Input vectors are unit-norm (the corpus convention), so cosine == dot.
    """
    queries = (df.where(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")))
    corpus = df.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("cvec"))
    scored = (
        corpus.join(F.broadcast(queries),
                    F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", F.round(_dot(F.col("qvec"), F.col("cvec")), 6))
    )
    return _partial_topk(scored, k)


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                             block_col: str = "label",
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             max_block: int | None = 100_000) -> DataFrame:
    """Cosine near-dup pairs within coarse blocks (block-diagonal join).

    This is the labeled EXACT baseline: cost is O(B²) per block by
    construction — the registered scale path is ``lsh_near_dup_pairs``.
    The contract is made explicit by ``max_block``: any block larger than
    it fails fast (before the quadratic join runs) instead of silently
    launching an O(B²) stage; pass ``max_block=None`` to waive the guard
    deliberately."""
    if max_block is not None:
        over = (df.groupBy(block_col).count()
                .where(F.col("count") > max_block)
                .select(block_col, "count").limit(1).collect())
        if over:
            raise ValueError(
                f"embedding_near_dup_pairs: block {over[0][0]!r} has "
                f"{over[0][1]} vectors (> max_block={max_block}); the "
                "exact all-pairs baseline is O(B^2) per block — use "
                "lsh_near_dup_pairs for blocks this large, or pass "
                "max_block=None to force it")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  F.col(block_col).alias("blk"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  F.col(block_col).alias("blk"))
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(_dot(F.col("va"), F.col("vb")), 6))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def hyperplane_buckets(spark: SparkSession, df: DataFrame, n_planes: int = 8,
                       dim: int = 64, seed: int = 42,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket per vector (deterministic, seeded).

    The sign pattern against ``n_planes`` fixed Gaussian planes is the
    bucket id; vectorized numpy matmul inside an Arrow-batched pandas UDF.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    bc = spark.sparkContext.broadcast(planes)

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        p = bc.value
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        # sequential accumulation over dims (vectorized across rows): the
        # exact left-to-right IEEE order of Spark's F.aggregate and DuckDB's
        # list_aggregate 'sum', so bucket signs replay bit-identically in
        # the SQL oracle (a blas matmul reassociates the sum)
        dots = np.zeros((mat.shape[0], p.shape[1]))
        for d in range(p.shape[0]):
            dots += mat[:, d:d + 1] * p[d]
        signs = dots > 0
        weights = (1 << np.arange(p.shape[1], dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"),
                     _bucket(F.col(vec_col)).alias("bucket"))


def lsh_ann_topk(spark: SparkSession, df: DataFrame, n_queries: int = 5,
                 k: int = 10, n_planes: int = 8, dim: int = 64,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: exact ranking restricted to the query's bucket."""
    bucketed = hyperplane_buckets(spark, df, n_planes, dim, seed)
    queries = (bucketed.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec"),
                       F.col("bucket")))
    scored = (
        bucketed.join(F.broadcast(queries), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", F.round(_dot(F.col("qvec"), F.col("embedding")), 6))
    )
    return _partial_topk(scored, k)


# ---- matching ANSI-SQL (DuckDB) oracles ------------------------------------

_DOT = ("list_aggregate(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')")


def cosine_topk_sql(table: str = "embeddings", n_queries: int = 5,
                    k: int = 10) -> str:
    dot = _DOT.format(a="q.embedding", b="c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round({dot}, 6) AS sim
  FROM {table} q JOIN {table} c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def hard_negatives_topk(df: DataFrame, n_queries: int = 5, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label") -> DataFrame:
    """Contrastive hard-negative mining: for each query, the top-k most
    similar vectors whose LABEL DIFFERS — the negatives that sit closest
    to the decision boundary, the standard pick for contrastive /
    triplet training batches (and the step after `sim_cosine_topk` in an
    embedding-curation pipeline).

    Same scale shape as ``cosine_topk``: broadcast query set, Arrow dot
    kernel, bounded per-partition partial top-k; the label filter is a
    map-side predicate, so mining cost is identical to plain top-k."""
    queries = (df.where(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       F.col(label_col).alias("qlabel")))
    corpus = df.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("cvec"),
                       F.col(label_col).alias("clabel"))
    scored = (
        corpus.join(F.broadcast(queries),
                    (F.col("vec_id") != F.col("query_id"))
                    & (F.col("clabel") != F.col("qlabel")))
        .withColumn("sim", F.round(_dot(F.col("qvec"), F.col("cvec")), 6))
    )
    return _partial_topk(scored, k)


def hard_negatives_topk_sql(table: str = "embeddings", n_queries: int = 5,
                            k: int = 10) -> str:
    dot = _DOT.format(a="q.embedding", b="c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round({dot}, 6) AS sim
  FROM {table} q JOIN {table} c
    ON c.vec_id != q.vec_id AND c.label != q.label
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def embedding_near_dup_pairs_sql(table: str = "embeddings",
                                 threshold: float = 0.9) -> str:
    dot = _DOT.format(a="a.embedding", b="b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({dot}, 6) AS sim
FROM {table} a JOIN {table} b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({dot}, 6) >= {threshold}
"""


def lsh_ann_topk_sql(table: str = "embeddings", n_queries: int = 5,
                     k: int = 10, n_planes: int = 8, dim: int = 64,
                     seed: int = 42) -> str:
    """DuckDB replay of ``lsh_ann_topk``: the seeded hyperplane matrix is
    inlined as SQL literals (shortest-round-trip repr, exact float64), and
    both engines accumulate the plane dot products in the same left-to-right
    IEEE order, so bucket assignment is bit-identical."""
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    plane_rows = ", ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[:, j])}])"
        for j in range(n_planes))
    pdot = _DOT.format(a="v.embedding", b="p.pvec")
    qcdot = _DOT.format(a="q.embedding", b="c.embedding")
    return f"""
WITH planes(j, pvec) AS (VALUES {plane_rows}),
buckets AS (
  SELECT v.vec_id, v.embedding,
         SUM(CASE WHEN {pdot} > 0 THEN (1::BIGINT << p.j) ELSE 0 END) AS bucket
  FROM {table} v CROSS JOIN planes p
  GROUP BY v.vec_id, v.embedding
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round({qcdot}, 6) AS sim
  FROM buckets q JOIN buckets c
    ON q.bucket = c.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def lsh_near_dup_pairs(spark: SparkSession, df: DataFrame,
                       threshold: float = 0.35, n_tables: int = 8,
                       k: int = 4, dim: int = 64, seed: int = 7,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs via multi-table LSH blocking — the scale path
    for ``embedding_near_dup_pairs`` (whose per-label block is exact but
    O(B²)): candidates are pairs colliding in ANY of ``n_tables`` sign
    hash tables of ``k`` planes each (the standard OR-construction —
    recall rises with L, candidate fan-out falls with k), deduped, then
    scored exactly. Deterministic (seeded planes, order-stable dots), so
    the SQL oracle replays the candidate set bit-identically."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    planes = np.random.default_rng(seed).standard_normal((dim, n_tables * k))
    bc = spark.sparkContext.broadcast(planes)

    @pandas_udf(ArrayType(LongType()))
    def _codes(vecs: pd.Series) -> pd.Series:
        p = bc.value
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        dots = np.zeros((mat.shape[0], p.shape[1]))
        for d in range(p.shape[0]):  # sequential: oracle bit-parity
            dots += mat[:, d:d + 1] * p[d]
        signs = (dots > 0).astype(np.int64)
        w = 1 << np.arange(k, dtype=np.int64)
        codes = [signs[:, t * k:(t + 1) * k] @ w for t in range(n_tables)]
        return pd.Series(np.stack(codes, axis=1).tolist())

    coded = df.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"),
                      F.posexplode(_codes(F.col(vec_col)))
                      .alias("t", "code"))
    a = coded.select(F.col("vec_id").alias("id_a"), "t", "code")
    b = coded.select(F.col("vec_id").alias("id_b"), "t", "code")
    cand = (a.join(b, ["t", "code"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim", F.round(_dot(F.col("va"), F.col("vb")), 6))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def lsh_near_dup_pairs_sql(table: str = "embeddings",
                           threshold: float = 0.35, n_tables: int = 8,
                           k: int = 4, dim: int = 64, seed: int = 7) -> str:
    """DuckDB replay of ``lsh_near_dup_pairs``: inlined seeded planes,
    identical left-to-right dot accumulation, same OR-construction."""
    planes = np.random.default_rng(seed).standard_normal((dim, n_tables * k))
    rows = ", ".join(
        f"({c // k}, {c % k}, "
        f"[{', '.join(repr(float(x)) for x in planes[:, c])}])"
        for c in range(n_tables * k))
    pdot = _DOT.format(a="v.embedding", b="p.pvec")
    sdot = _DOT.format(a="x.embedding", b="y.embedding")
    return f"""
WITH planes(t, j, pvec) AS (VALUES {rows}),
buckets AS (
  SELECT v.vec_id, p.t,
         SUM(CASE WHEN {pdot} > 0 THEN (1::BIGINT << p.j) ELSE 0 END) AS code
  FROM {table} v CROSS JOIN planes p
  GROUP BY v.vec_id, p.t
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.code = b.code AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b, round({sdot}, 6) AS sim
FROM cand c
JOIN {table} x ON x.vec_id = c.id_a
JOIN {table} y ON y.vec_id = c.id_b
WHERE round({sdot}, 6) >= {threshold}
"""


def ivf_assign(df: DataFrame, n_centroids: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max dot product). Centroids are the first ``n_centroids``
    corpus vectors — deterministic, no iterative training, so the
    assignment is exactly reproducible in the SQL oracle. At scale the
    centroid set stays broadcast-small while cells partition the corpus."""
    cents = (df.where(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cvec")))
    scored = (df.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("embedding"))
              .join(F.broadcast(cents))
              .withColumn("dot", _dot(F.col("embedding"), F.col("cvec"))))
    # deterministic argmax: highest dot, ties to the smallest centroid id
    best = (scored.groupBy("vec_id")
            .agg(F.max_by(
                F.col("cent_id"),
                F.struct(F.col("dot"), -F.col("cent_id"))).alias("cell")))
    return (df.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"))
            .join(best, "vec_id"))


def ivf_ann_topk(df: DataFrame, n_queries: int = 5, k: int = 10,
                 n_centroids: int = 8) -> DataFrame:
    """Approximate top-k: exact ranking restricted to the query's IVF cell
    (nprobe=1). The scale path: one broadcast of centroids + one shuffle
    on the cell id; per-cell candidate lists are corpus/n_centroids."""
    cells = ivf_assign(df, n_centroids)
    queries = (cells.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec"), F.col("cell")))
    scored = (cells.join(F.broadcast(queries), "cell")
              .where(F.col("vec_id") != F.col("query_id"))
              .withColumn("sim", F.round(_dot(F.col("qvec"),
                                              F.col("embedding")), 6)))
    return _partial_topk(scored, k)


def ivf_ann_topk_sql(table: str = "embeddings", n_queries: int = 5,
                     k: int = 10, n_centroids: int = 8) -> str:
    """DuckDB replay of ``ivf_ann_topk``: same deterministic centroids
    (vec_id < n_centroids), same order-stable dot products, same
    ties-to-smallest-centroid argmax."""
    vdot = _DOT.format(a="v.embedding", b="c.embedding")
    qcdot = _DOT.format(a="q.embedding", b="t.embedding")
    return f"""
WITH scored AS (
  SELECT v.vec_id, v.embedding, c.vec_id AS cent_id,
         {vdot} AS dot
  FROM {table} v JOIN {table} c ON c.vec_id < {n_centroids}
), best AS (
  SELECT vec_id, embedding, cent_id AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dot DESC, cent_id ASC) AS rn FROM scored)
  WHERE rn = 1
), pairs AS (
  SELECT q.vec_id AS query_id, t.vec_id AS vec_id,
         round({qcdot}, 6) AS sim
  FROM best q JOIN best t ON q.cell = t.cell AND t.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, vec_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id ASC) AS rank FROM pairs)
WHERE rank <= {k}
"""


# ----------------------------------------------------------------- PQ / ADC
def pq_ann_topk(df: DataFrame, n_queries: int = 5, k: int = 10,
                n_codebook: int = 16, m_subspaces: int = 8,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Product-quantization ANN with an ADC (asymmetric distance
    computation) scan — the compressed-domain scale path of the
    similarity family (Jégou et al., "Product Quantization for Nearest
    Neighbor Search"): each vector is encoded as ``m_subspaces`` small
    codes (nearest codebook entry per dimension slice), and a query is
    scored against a code word by summing per-subspace lookup-table
    entries instead of touching the raw vector.

    Codebooks are deterministic — subvectors of the first ``n_codebook``
    corpus vectors, the module's IVF convention — so there is no
    iterative training and the SQL oracle replays encode + scan exactly.

    Scale shape: the codebook (K×dim) and the per-query ADC tables
    (n_queries × m × K doubles) come from two O(small) collects and are
    broadcast into ONE shuffle-free Arrow kernel that encodes each
    corpus vector and scores it against every query by table lookup; the
    corpus is read once and never shuffled, and only the bounded
    per-partition top-k survivors (n_partitions × n_queries × k rows)
    reach the final rank window. At 10^9+ vectors the scan stays a
    map-only pass over 8-byte codes per vector, the regime PQ exists
    for; memory per task is the candidate state plus the tiny tables.

    Exactness contract (shared with the DuckDB oracle): per-subspace
    terms fold over their dimensions left-to-right, and the final score
    sums the m terms left-to-right — subspace-major association, NOT the
    flat dim-order fold, whose different association drifts in the last
    ulp. Distance argmins tie to the smallest code id in both engines."""
    import pandas as pd

    rows = (df.where(F.col(id_col) < n_codebook)
            .select(id_col, vec_col).collect())
    cb = np.vstack([np.asarray(r[1], dtype=np.float64)
                    for r in sorted(rows, key=lambda r: r[0])])
    qrows = (df.where(F.col(id_col) < n_queries)
             .select(id_col, vec_col).collect())
    qids = np.array([r[0] for r in sorted(qrows, key=lambda r: r[0])],
                    dtype=np.int64)
    Q = np.vstack([np.asarray(r[1], dtype=np.float64)
                   for r in sorted(qrows, key=lambda r: r[0])])
    dim = cb.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub = dim // m_subspaces
    nq, K = len(qids), n_codebook

    # ADC tables[qi, m, c] = dot(q slice m, codebook c slice m), the
    # left-to-right fold per slice (== list_aggregate 'sum')
    tables = np.zeros((nq, m_subspaces, K), dtype=np.float64)
    for m in range(m_subspaces):
        off = m * sub
        acc = np.zeros((nq, K), dtype=np.float64)
        for d in range(sub):
            acc += Q[:, off + d, None] * cb[None, :, off + d]
        tables[:, m, :] = acc

    def score(batches):
        for pdf in batches:
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            vid = pdf[id_col].to_numpy(dtype=np.int64)
            n = len(x)
            codes = np.zeros((n, m_subspaces), dtype=np.int64)
            for m in range(m_subspaces):
                off = m * sub
                best_d = np.full(n, np.inf)
                best_c = np.zeros(n, dtype=np.int64)
                for c in range(K):
                    acc = np.zeros(n, dtype=np.float64)
                    for d in range(sub):
                        t = x[:, off + d] - cb[c, off + d]
                        acc += t * t
                    better = acc < best_d  # strict: ties keep smaller c
                    best_d[better] = acc[better]
                    best_c[better] = c
                codes[:, m] = best_c
            out_q, out_v, out_s = [], [], []
            for qi in range(nq):
                s = tables[qi, 0][codes[:, 0]]
                for m in range(1, m_subspaces):  # subspace-major order
                    s = s + tables[qi, m][codes[:, m]]
                keep = vid != qids[qi]
                out_q.append(np.full(int(keep.sum()), qids[qi], np.int64))
                out_v.append(vid[keep])
                out_s.append(s[keep])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q else
                np.array([], dtype=np.int64),
                "vec_id": np.concatenate(out_v) if out_v else
                np.array([], dtype=np.int64),
                "sim": np.concatenate(out_s) if out_s else
                np.array([], dtype=np.float64)})

    scored = (df.select(id_col, vec_col)
              .mapInPandas(score, "query_id long, vec_id long, sim double"))
    return _partial_topk(scored, k)


def pq_ann_topk_sql(table: str = "embeddings", n_queries: int = 5,
                    k: int = 10, n_codebook: int = 16,
                    m_subspaces: int = 8, dim: int = 64) -> str:
    """DuckDB replay of ``pq_ann_topk``: same deterministic codebooks,
    same per-slice left-to-right folds, same subspace-major score sum
    (``list_aggregate(list(t ORDER BY m), 'sum')``), same tie rules."""
    sub = dim // m_subspaces
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
), cb AS (
  SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < {n_codebook}
), dists AS (
  SELECT v.vec_id, m.m, c.cent_id,
         list_aggregate(list_transform(range(1, {sub} + 1),
             i -> (v.e[m.m * {sub} + i] - c.ce[m.m * {sub} + i])
                * (v.e[m.m * {sub} + i] - c.ce[m.m * {sub} + i])),
             'sum') AS d
  FROM v, (SELECT unnest(range({m_subspaces})) AS m) m, cb c
), codes AS (
  SELECT vec_id, m, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              ORDER BY d ASC, cent_id ASC) AS rn FROM dists)
  WHERE rn = 1
), terms AS (
  SELECT q.vec_id AS query_id, x.vec_id, x.m,
         list_aggregate(list_transform(range(1, {sub} + 1),
             i -> q.e[x.m * {sub} + i] * c.ce[x.m * {sub} + i]),
             'sum') AS t
  FROM codes x
  JOIN cb c ON c.cent_id = x.code
  JOIN v q ON q.vec_id < {n_queries} AND q.vec_id != x.vec_id
), sims AS (
  SELECT query_id, vec_id,
         list_aggregate(list(t ORDER BY m), 'sum') AS sim
  FROM terms GROUP BY query_id, vec_id
)
SELECT query_id, vec_id, sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id ASC) AS rank FROM sims)
WHERE rank <= {k}
"""


# ------------------------------------------------------------------ k-means
KMEANS_SCALE = 65536  # quantization: floor(x * 2^16) — exact in float64


def _exact_sqdist(x, cent, rows, j):
    """Fixed-dimension-order squared distance of ``x[rows]`` to centroid
    ``j`` — EXACTLY the loop kernel's arithmetic (acc += t*t in dim
    order; never np.sum, whose pairwise reassociation drifts from the
    oracle's left-to-right list_aggregate fold)."""
    import numpy as np

    xb = x[rows]
    cj = cent[j]
    acc = np.zeros(len(xb), dtype=np.float64)
    for d in range(x.shape[1]):
        t = xb[:, d] - cj[d]
        acc += t * t
    return acc


def kmeans_assign(df: DataFrame, k: int = 8,
                  col: str = "embedding",
                  method: str = "auto") -> DataFrame:
    """One Lloyd iteration of distributed k-means over the embedding
    corpus (the clustering step of embedding-based data curation, e.g.
    cluster-balanced sampling / SemDeDup-style pruning).

    Structure is the canonical two-job step:

    1. **centroid init** — seed partition ``vec_id % k``; per Spark
       partition a ``mapInPandas`` fold emits k×dim partial component
       sums (bounded state, shuffle carries only
       ``partitions × k × dim`` tiny rows), a small groupBy finishes the
       elementwise means, and the k×dim matrix is collected (O(k·dim))
       and broadcast into the assignment kernel's closure;
    2. **assignment** — one shuffle-free Arrow kernel pass computes all
       k distances per vector and the argmin.

    ``method`` picks the assignment kernel:

    * ``"loop"`` — per-centroid fixed-order fold, O(k·dim) numpy ops per
      batch; the oracle-exact reference arithmetic.
    * ``"blocked"`` — chunked BLAS ``|x|² − 2X·Cᵀ + |c|²`` over centroid
      blocks (the SemDeDup regime holds k ∝ N — ~50k clusters for
      LAION — where the loop's per-centroid Python dispatch is the
      bottleneck), then an EXACT refine: every centroid whose BLAS
      distance sits within a rounding-error band of the minimum is
      re-scored with the loop's fixed-order fold, so the returned
      (cluster, dist) — including tie-breaks — is IDENTICAL to
      ``"loop"`` (property-tested at k=256).
    * ``"auto"`` — blocked above 64 centroids, loop otherwise.

    Cross-engine exactness: embeddings are quantized to integers
    (``floor(x · 2^16)`` — exact in float64 for float32 inputs), so the
    centroid component sums are ORDER-FREE integer arithmetic (a float
    sum over rows would drift with row order and diverge from the
    oracle); distances then accumulate in fixed dimension order, the
    ``_dot_kernel`` technique, so doubles — and argmin tie-breaks — are
    bit-identical with the SQL oracle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if method not in ("auto", "loop", "blocked"):
        raise ValueError(f"unknown kmeans_assign method {method!r}")
    use_blocked = method == "blocked" or (method == "auto" and k > 64)

    spark = df.sparkSession
    dim = len(df.select(col).first()[0])

    def _partials(batches):
        sums = {}
        for b in batches:
            q = np.floor(np.vstack(
                [np.asarray(v, dtype=np.float64) for v in b[col]])
                * KMEANS_SCALE).astype(np.int64)
            js = (b["vec_id"].to_numpy() % k).astype(np.int64)
            for j in np.unique(js):
                s, c = sums.setdefault(j, [np.zeros(dim, np.int64), 0])
                sel = q[js == j]
                s += sel.sum(axis=0)
                sums[j][1] = c + len(sel)
        rows = [(int(j), d, int(s[d]), int(c))
                for j, (s, c) in sums.items() for d in range(dim)]
        yield pd.DataFrame(rows, columns=["j", "dim", "s", "c"])

    part = df.select("vec_id", col).mapInPandas(
        _partials, "j long, dim long, s long, c long")
    comp = (part.groupBy("j", "dim")
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
            .collect())
    cent = np.zeros((k, dim), dtype=np.float64)
    for r in comp:
        cent[r["j"], r["dim"]] = np.float64(r["s"]) / np.float64(r["c"])

    def _assign_loop(x):
        n = len(x)
        best_d = np.full(n, np.inf)
        best_j = np.zeros(n, dtype=np.int64)
        for j in range(k):
            acc = np.zeros(n, dtype=np.float64)
            cj = cent[j]
            # fixed dimension order == the oracle's left-to-right
            # list_aggregate fold; never np.sum (pairwise reassociation)
            for d in range(dim):
                t = x[:, d] - cj[d]
                acc += t * t
            better = acc < best_d  # strict: ties keep the smaller j
            best_d[better] = acc[better]
            best_j[better] = j
        return best_j, best_d

    def _assign_blocked(x):
        n = len(x)
        c2 = np.einsum("ij,ij->i", cent, cent)
        # one conservative rounding band for the whole batch: BLAS
        # |x|²−2xc+|c|² cancels catastrophically only near zero distance,
        # with absolute error bounded by ~dim·eps·(|x|²+|c|²); ×1e3
        # safety costs only extra refine candidates, never correctness
        best_j = np.zeros(n, dtype=np.int64)
        best_d = np.full(n, np.inf)
        rows_per = max(1, (1 << 21) // max(k, 1))  # ≤16 MiB distance block
        for rs in range(0, n, rows_per):
            xb = x[rs:rs + rows_per]
            x2 = np.einsum("ij,ij->i", xb, xb)
            D = x2[:, None] - 2.0 * (xb @ cent.T) + c2[None, :]
            dmin = D.min(axis=1)
            tol = 1e-12 + 1e-13 * dim * (x2 + c2.max() + 1.0)
            ri, js = np.nonzero(D <= (dmin + tol)[:, None])
            # exact re-score of the candidate set, grouped by centroid
            bd = np.full(len(xb), np.inf)
            bj = np.zeros(len(xb), dtype=np.int64)
            for j in np.unique(js):
                sel = ri[js == j]
                d_exact = _exact_sqdist(xb, cent, sel, int(j))
                better = (d_exact < bd[sel]) | (
                    (d_exact == bd[sel]) & (j < bj[sel]))
                upd = sel[better]
                bd[upd] = d_exact[better]
                bj[upd] = j
            best_d[rs:rs + rows_per] = bd
            best_j[rs:rs + rows_per] = bj
        return best_j, best_d

    @pandas_udf("array<double>")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.floor(np.vstack(
            [np.asarray(v, dtype=np.float64) for v in vecs])
            * KMEANS_SCALE) / KMEANS_SCALE
        best_j, best_d = (_assign_blocked(x) if use_blocked
                          else _assign_loop(x))
        return pd.Series(list(np.column_stack(
            [best_j.astype(np.float64), best_d])))

    a = df.select("vec_id", _assign(F.col(col)).alias("a"))
    # dist is NOT rounded: the fixed-order fold is bit-identical across
    # engines, and round(x, 6) itself DIVERGES between them at ~1e8
    # magnitudes (DuckDB scales by 1e6 in float64; Spark/Python round
    # decimal-correct on the shortest repr) — rounding would introduce
    # the very drift it was meant to absorb
    return a.select(
        "vec_id",
        F.element_at("a", 1).cast("long").alias("cluster"),
        F.element_at("a", 2).alias("dist"))


def kmeans_assign_sql(table: str = "embeddings", k: int = 8) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, vec_id % {k} AS j,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})
                  AS BIGINT)) AS qe
  FROM {table}
), exq AS (
  SELECT j, unnest(range(1, len(qe) + 1)) AS i, unnest(qe) AS v FROM q
), comp AS (
  SELECT j, i, CAST(sum(v) AS DOUBLE) / count(*) AS c
  FROM exq GROUP BY 1, 2
), cent AS (
  SELECT j, list(c ORDER BY i) AS ce FROM comp GROUP BY j
), dist AS (
  SELECT q.vec_id, c.j,
         list_aggregate(list_transform(range(1, len(q.qe) + 1),
             i -> (q.qe[i] / {KMEANS_SCALE}.0 - c.ce[i])
                * (q.qe[i] / {KMEANS_SCALE}.0 - c.ce[i])), 'sum') AS d
  FROM q, cent c
)
SELECT vec_id, j AS cluster, d AS dist
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d ASC, j ASC) AS rn FROM dist)
WHERE rn = 1
"""


def semdedup_prune(df: DataFrame, k: int = 8, threshold: float = 0.99,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_block: int | None = 100_000) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication scoped by k-means clusters.

    The method that makes embedding dedup tractable at web scale: instead
    of an O(N²) all-pairs cosine pass, cluster the corpus with k-means and
    compare pairs ONLY within a cluster (semantic duplicates are, by
    definition, near each other, so cross-cluster pairs cannot exceed a
    high threshold). Drop rule: a vector is dropped iff ANY smaller-id
    vector in its cluster is similar above ``threshold`` (including one
    that is itself dropped — NOT greedy keep-first, whose kept set can
    differ on similarity chains). Deterministic and engine-independent;
    the SQL oracle implements the identical rule.

    Physical shape (the 100 TB story):

    1. ``kmeans_assign`` — shuffle-free Arrow assignment against broadcast
       centroids (bounded k×dim partial-sum state, see its docstring);
    2. ONE shuffle on ``cluster`` into a per-cluster chunked-Gram kernel
       (``applyInPandas``) emitting exactly one row per vector — compute
       is O(B²·dim) BLAS per cluster but the data volume never fans out
       to pair rows; the paper's recipe holds k ∝ N so B stays bounded
       (they use ~50k clusters for LAION), and the ``max_block`` guard
       fails fast inside the kernel's own task instead of silently
       allocating quadratic blocks (a driver-side pre-count would run
       the whole assignment twice).

    Returns one row per input vector: ``(id_col, cluster, dropped)`` with
    ``dropped`` ∈ {0,1}. Exactness: cluster ids replay bit-identically in
    the SQL oracle (integer-quantized centroid sums, fixed-order distance
    folds — ``kmeans_assign``), pair similarity uses the order-stable
    ``_dot_kernel`` rounded to 6 dp, so the prune set is cross-engine
    exact.
    """
    base = df.select(id_col, vec_col)
    assign = kmeans_assign(base, k=k, col=vec_col).select(id_col, "cluster")
    blocked = base.join(assign, id_col)

    # In-cluster scoring as ONE chunked Gram matmul per cluster instead of
    # a B² pair-row fan-out through the per-pair kernel: the kernel emits
    # exactly one row per input vector, so the cluster shuffle carries B
    # rows, not B². BLAS reassociates the per-dimension sum vs the
    # oracle's fixed-order fold, but only the rounded >=threshold BOOLEAN
    # leaves the kernel and natural cosines sit far from any sane
    # threshold, so the last-ulp drift cannot flip a decision (the exact
    # per-pair path with bit-stable sims is ``embedding_near_dup_pairs``).
    chunk = 256  # bounds kernel memory at chunk x B doubles per block

    def _cluster_prune(pdf):
        # guard INSIDE the kernel: a driver-side pre-count would execute
        # the whole kmeans assignment + join a second time (the guard job
        # is not cached) — here the oversized cluster fails fast in its
        # own task before allocating the Gram blocks, at zero extra jobs
        if max_block is not None and len(pdf) > max_block:
            raise ValueError(
                f"semdedup_prune: cluster {int(pdf['cluster'].iloc[0])} "
                f"has {len(pdf)} vectors (> max_block={max_block}); raise "
                "k so clusters stay bounded (the paper holds k ∝ N), or "
                "pass max_block=None to force the quadratic pass")
        pdf = pdf.sort_values(id_col, kind="mergesort")
        X = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf[vec_col]])
        n = len(pdf)
        drop = np.zeros(n, dtype=bool)
        for s in range(0, n, chunk):
            sims = np.round(X[s:s + chunk] @ X.T, 6)
            for li in range(sims.shape[0]):
                i = s + li
                if i and sims[li, :i].max() >= threshold:
                    drop[i] = True
        return pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                             "cluster": pdf["cluster"].to_numpy(),
                             "dropped": drop.astype(np.int32)})

    return blocked.groupBy("cluster").applyInPandas(
        _cluster_prune,
        f"{id_col} long, cluster long, dropped int")


def semdedup_sql(table: str = "embeddings", k: int = 8,
                 threshold: float = 0.99, n_planted: int = 50,
                 plant_offset: int = 100_000) -> str:
    """DuckDB replay of the registered ``sim_semdedup`` query: the corpus
    is the table plus ``n_planted`` exact copies (id + ``plant_offset``),
    clusters come from the same quantized k-means, and the within-cluster
    pair pass uses the same fixed-order dot, so the prune set matches
    bit-for-bit."""
    ksql = kmeans_assign_sql(table="corpus", k=k)
    dot = _DOT.format(a="x.embedding", b="y.embedding")
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM {table}
  UNION ALL
  SELECT vec_id + {plant_offset} AS vec_id, embedding
  FROM {table} WHERE vec_id < {n_planted}
), assign AS (
  SELECT vec_id, cluster FROM ({ksql}) ka
), j AS (
  SELECT a.vec_id, a.cluster, c.embedding
  FROM assign a JOIN corpus c USING (vec_id)
), dropped AS (
  SELECT DISTINCT y.vec_id
  FROM j x JOIN j y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE round({dot}, 6) >= {threshold}
)
SELECT a.vec_id, a.cluster,
       CAST(a.vec_id IN (SELECT vec_id FROM dropped) AS INT) AS dropped
FROM assign a
"""


# ---------------------------------------------------------------------------
# Sparse random projection (Johnson–Lindenstrauss; Achlioptas 2003's
# database-friendly {+1, 0, -1} matrix at density 1/3): the standard
# cheap dimensionality reduction ahead of ANN indexing / clustering at
# 10^9-vector scale — 8 signed sums replace a 64-float vector, no
# training pass, distances preserved within (1±ε). Deterministic: the
# matrix entries derive from md5("i,j"), and inputs are quantized to
# int64 (units of 1e-6, truncated toward zero) so the projection is
# pure integer addition — bit-identical across engines.

RP_SCALE = 1_000_000


def rp_matrix(d_in: int, d_out: int):
    """{+1,-1,0} at P = 1/6, 1/6, 2/3 from md5 — reproducible anywhere."""
    from hashlib import md5 as _md5
    cols = []
    for j in range(d_out):
        col = []
        for i in range(d_in):
            v = int(_md5(f"{i},{j}".encode()).hexdigest()[:1], 16) % 6
            col.append(1 if v == 0 else (-1 if v == 1 else 0))
        cols.append(col)
    return cols


def random_projection(df: DataFrame, d_in: int = 64, d_out: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(id, p0..p{d_out-1}) int64 projections. Map-only JVM expressions
    (each output is a signed sum of ≤ d_in/3 quantized elements): zero
    shuffles, zero Python stages — the projection fuses into whatever
    scan precedes the ANN build that consumes it."""
    R = rp_matrix(d_in, d_out)

    def q(i):  # quantized element, truncation matches DuckDB trunc()
        return (F.element_at(F.col(vec_col), i + 1).cast("double")
                * RP_SCALE).cast("long")

    outs = []
    for j, col in enumerate(R):
        terms = [q(i) if s == 1 else -q(i)
                 for i, s in enumerate(col) if s != 0]
        e = terms[0]
        for t in terms[1:]:
            e = e + t
        outs.append(e.alias(f"p{j}"))
    return df.select(F.col(id_col), *outs)


def random_projection_sql(table: str = "embeddings", d_in: int = 64,
                          d_out: int = 8) -> str:
    R = rp_matrix(d_in, d_out)
    exprs = []
    for j, col in enumerate(R):
        terms = [("-" if s < 0 else "+")
                 + f" CAST(trunc(CAST(embedding[{i + 1}] AS DOUBLE)"
                   f" * {RP_SCALE}) AS BIGINT)"
                 for i, s in enumerate(col) if s != 0]
        body = " ".join(terms).lstrip("+ ")
        if terms[0].startswith("-"):
            body = terms[0] + " " + " ".join(terms[1:])
        exprs.append(f"({body}) AS p{j}")
    cols = ",\n       ".join(exprs)
    return f"SELECT vec_id,\n       {cols}\nFROM {table}"


MATRYOSHKA_DIMS = (64, 32, 16)


def matryoshka_recall(df: DataFrame, n_queries: int = 8, k: int = 10,
                      dims: tuple = MATRYOSHKA_DIMS,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Matryoshka (MRL) truncation-quality audit: for each query and
    each prefix dimensionality, the exact top-k under the TRUNCATED dot
    product, scored as recall against the full-dimension top-k. This is
    the evaluation a pipeline runs before deciding how far MRL
    embeddings can be cut for cheap first-stage retrieval (Kusupati et
    al. '22 publish exactly these recall-vs-dim curves).

    Scale shape: same as ``cosine_topk`` — broadcast query set, one
    sequential-IEEE dot kernel per prefix over the SAME joined frame,
    and the shared bounded ``_partial_topk`` fold with (query, dim)
    packed into the fold key, so state stays n_queries × |dims| × k.
    The recall join runs on the k-row-per-(query, dim) result only."""
    queries = (df.where(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec")))
    corpus = df.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("cvec"))
    pairs = corpus.join(F.broadcast(queries),
                        F.col("vec_id") != F.col("qid"))
    scored = None
    for d in dims:
        # pack (query, prefix-dim) into the fold key: dims are < 1000
        s = pairs.select(
            (F.col("qid") * 1000 + d).alias("query_id"), "vec_id",
            F.round(_dot(F.slice("qvec", 1, d), F.slice("cvec", 1, d)), 6)
            .alias("sim"))
        scored = s if scored is None else scored.unionByName(s)
    topk = (_partial_topk(scored, k)
            .select((F.col("query_id") / 1000).cast("long").alias("qid"),
                    (F.col("query_id") % 1000).alias("trunc_dim"),
                    "vec_id")
            .localCheckpoint(eager=False))  # reused by both join sides
    full = (topk.where(F.col("trunc_dim") == dims[0])
            .select(F.col("qid").alias("fq"), F.col("vec_id").alias("fv"))
            # break the self-join lineage so Catalyst doesn't collapse
            # qid == fq into a trivially-true predicate
            .localCheckpoint(eager=False))
    return (topk.join(full, (F.col("qid") == F.col("fq"))
                      & (F.col("vec_id") == F.col("fv")), "left")
            .groupBy(F.col("qid").alias("query_id"), "trunc_dim")
            .agg(F.count("fv").alias("n_overlap"))
            .select("query_id", F.col("trunc_dim").cast("long"),
                    "n_overlap",
                    F.expr(f"n_overlap * 1000000 div {k}")
                    .alias("recall_q"))
            .orderBy("query_id", "trunc_dim"))


def matryoshka_recall_sql(table: str = "embeddings", n_queries: int = 8,
                          k: int = 10,
                          dims: tuple = MATRYOSHKA_DIMS) -> str:
    dim_list = ", ".join(str(d) for d in dims)
    dot = ("list_aggregate(list_transform(range(1, dd.d + 1), "
           "i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), 'sum')")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS qid, dd.d AS trunc_dim, c.vec_id AS vec_id,
         round({dot}, 6) AS sim
  FROM {table} q
  JOIN {table} c ON c.vec_id != q.vec_id
  CROSS JOIN (SELECT unnest([{dim_list}]) AS d) dd
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT qid, trunc_dim, vec_id,
         row_number() OVER (PARTITION BY qid, trunc_dim
                            ORDER BY sim DESC, vec_id) AS rnk
  FROM scored
), topk AS (SELECT * FROM ranked WHERE rnk <= {k}),
fullk AS (SELECT qid, vec_id FROM topk WHERE trunc_dim = {dims[0]})
SELECT t.qid AS query_id, CAST(t.trunc_dim AS BIGINT) AS trunc_dim,
       CAST(count(f.vec_id) AS BIGINT) AS n_overlap,
       CAST(count(f.vec_id) * 1000000 // {k} AS BIGINT) AS recall_q
FROM topk t LEFT JOIN fullk f ON f.qid = t.qid AND f.vec_id = t.vec_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def lsh_multiprobe_topk(spark: SparkSession, df: DataFrame,
                        n_queries: int = 5, k: int = 10,
                        n_planes: int = 8, dim: int = 64,
                        seed: int = 42) -> DataFrame:
    """Multiprobe LSH ANN (Lv et al., VLDB'07): each query probes its
    own sign bucket PLUS every bucket at Hamming distance 1 (one plane
    sign flipped) — the standard trick that buys recall without more
    hash tables: near neighbors that landed just across one hyperplane
    become reachable at (n_planes + 1)× probe cost instead of L× index
    cost. Exact ranking inside the probed union, same bounded partial
    top-k as `lsh_ann_topk` (whose single-bucket recall
    `sim_ann_recall_audit` measures).

    Each corpus vector lives in exactly one bucket and probe buckets
    are distinct, so no candidate dedup is needed. The probe set is
    queries × (n_planes + 1) rows — broadcast."""
    bucketed = hyperplane_buckets(spark, df, n_planes, dim, seed)
    q = (bucketed.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"), "bucket"))
    probe_list = F.array(
        F.col("bucket"),
        *[F.expr(f"bucket ^ shiftleft(cast(1 as bigint), {j})")
          for j in range(n_planes)])
    probes = q.select("query_id", "qvec",
                      F.explode(probe_list).alias("bucket"))
    scored = (bucketed.join(F.broadcast(probes), "bucket")
              .where(F.col("vec_id") != F.col("query_id"))
              .withColumn("sim", F.round(
                  _dot(F.col("qvec"), F.col("embedding")), 6)))
    return _partial_topk(scored, k)


def lsh_multiprobe_topk_sql(table: str = "embeddings", n_queries: int = 5,
                            k: int = 10, n_planes: int = 8, dim: int = 64,
                            seed: int = 42) -> str:
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    plane_rows = ", ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[:, j])}])"
        for j in range(n_planes))
    pdot = _DOT.format(a="v.embedding", b="p.pvec")
    qcdot = _DOT.format(a="q.embedding", b="c.embedding")
    return f"""
WITH planes(j, pvec) AS (VALUES {plane_rows}),
buckets AS MATERIALIZED (
  SELECT v.vec_id, v.embedding,
         SUM(CASE WHEN {pdot} > 0 THEN (1::BIGINT << p.j) ELSE 0 END)
           AS bucket
  FROM {table} v CROSS JOIN planes p
  GROUP BY v.vec_id, v.embedding
), probes AS (
  SELECT q.vec_id AS query_id, q.embedding,
         CASE WHEN f.j = -1 THEN q.bucket
              ELSE xor(q.bucket, 1::BIGINT << f.j) END AS bucket
  FROM buckets q
  CROSS JOIN (SELECT unnest(range(-1, {n_planes})) AS j) f
  WHERE q.vec_id < {n_queries}
), scored AS (
  SELECT p.query_id, c.vec_id,
         round({qcdot.replace('q.embedding', 'p.embedding')}, 6) AS sim
  FROM probes p JOIN buckets c
    ON c.bucket = p.bucket AND c.vec_id != p.query_id
), ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def ivf_probe_sweep(df: DataFrame, n_queries: int = 5, k: int = 10,
                    n_centroids: int = 8,
                    probes: tuple = (1, 2, 4)) -> DataFrame:
    """IVF nprobe tuning table — recall@k of the cell-restricted search
    vs the exact ranking at several probe counts, the dial every IVF
    deployment sets empirically (FAISS's `nprobe`): probing p cells
    costs ~p/n_centroids of the corpus per query and buys the reported
    recall. Companion of ``dedup_lsh_band_sweep`` (same pattern: sweep
    the recall/cost dial, emit the table the operator's config cites).

    Same deterministic centroids as ``ivf_ann_topk`` (first
    n_centroids vectors); per query the centroid list is ranked by
    (dot desc, cent_id asc) and the top-p cells are searched.

    Returns ``(nprobe, n_hits, n_possible, recall_ppm)``.

    Scale shape: centroids broadcast; ranked probe lists are
    (n_queries × n_centroids) tiny; each sweep point is one cell-keyed
    join + a bounded partial top-k; the exact baseline scores the
    corpus once against the broadcast query set."""
    cells = ivf_assign(df, n_centroids).localCheckpoint(eager=False)
    queries = (cells.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    cents = (df.where(F.col("vec_id") < n_centroids)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cvec")))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cdot").desc(), F.col("cent_id").asc())
    probe_rank = (queries.join(F.broadcast(cents))
                  .withColumn("cdot", _dot(F.col("qvec"), F.col("cvec")))
                  .withColumn("pr", F.row_number().over(wq))
                  .select("query_id", F.col("cent_id").alias("cell"),
                          "pr")
                  .localCheckpoint(eager=False))
    exact = (cells.join(F.broadcast(queries))
             .where(F.col("vec_id") != F.col("query_id"))
             .withColumn("sim", F.round(_dot(F.col("qvec"),
                                             F.col("embedding")), 6)))
    exact_topk = (_partial_topk(exact, k)
                  .select("query_id", "vec_id")
                  .localCheckpoint(eager=False))
    outs = []
    for p in probes:
        allowed = probe_rank.where(F.col("pr") <= p)
        cand = (cells.join(allowed, "cell")
                .join(F.broadcast(queries), "query_id")
                .where(F.col("vec_id") != F.col("query_id"))
                .withColumn("sim", F.round(_dot(F.col("qvec"),
                                                F.col("embedding")), 6)))
        approx = _partial_topk(cand, k).select("query_id", "vec_id")
        hits = approx.join(exact_topk, ["query_id", "vec_id"],
                           "left_semi")
        outs.append(hits.agg(
            F.lit(p).cast("long").alias("nprobe"),
            F.count("*").cast("long").alias("n_hits")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    possible = n_queries * k
    return (res.withColumn("n_possible",
                           F.lit(possible).cast("long"))
            .withColumn("recall_ppm",
                        F.expr(f"n_hits * 1000000 div {possible}"))
            .orderBy("nprobe"))


def ivf_probe_sweep_sql(table: str = "embeddings", n_queries: int = 5,
                        k: int = 10, n_centroids: int = 8,
                        probes: tuple = (1, 2, 4)) -> str:
    vdot = _DOT.format(a="v.embedding", b="c.embedding")
    qcdot = _DOT.format(a="q.qvec", b="c.embedding")
    qtdot = _DOT.format(a="q.qvec", b="t.embedding")
    plist = ", ".join(f"({p})" for p in probes)
    return f"""
WITH scored AS (
  SELECT v.vec_id, v.embedding, c.vec_id AS cent_id, {vdot} AS dot
  FROM {table} v JOIN {table} c ON c.vec_id < {n_centroids}
),
cells AS (
  SELECT vec_id, embedding, cent_id AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dot DESC, cent_id ASC) AS rn FROM scored)
  WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM {table}
  WHERE vec_id < {n_queries}
),
probe_rank AS (
  SELECT query_id, c.vec_id AS cell,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {qcdot} DESC, c.vec_id ASC) AS pr
  FROM queries q JOIN {table} c ON c.vec_id < {n_centroids}
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, t.vec_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY round({qtdot}, 6) DESC, t.vec_id ASC) AS rank
    FROM queries q JOIN cells t ON t.vec_id != q.query_id)
  WHERE rank <= {k}
),
probes(nprobe) AS (VALUES {plist}),
approx AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT p.nprobe, q.query_id, t.vec_id,
           row_number() OVER (PARTITION BY p.nprobe, q.query_id
               ORDER BY round({qtdot}, 6) DESC, t.vec_id ASC) AS rank
    FROM probes p
    CROSS JOIN queries q
    JOIN probe_rank r ON r.query_id = q.query_id AND r.pr <= p.nprobe
    JOIN cells t ON t.cell = r.cell AND t.vec_id != q.query_id)
  WHERE rank <= {k}
)
SELECT p.nprobe::BIGINT AS nprobe,
       CAST(count(e.vec_id) AS BIGINT) AS n_hits,
       CAST({n_queries * k} AS BIGINT) AS n_possible,
       CAST(count(e.vec_id) AS BIGINT) * 1000000
         // {n_queries * k} AS recall_ppm
FROM probes p
LEFT JOIN approx a ON a.nprobe = p.nprobe
LEFT JOIN exact_topk e
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1
"""
