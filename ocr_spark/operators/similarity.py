"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Over an ``embeddings(vec_id, embedding array<float>, label)`` table.

* **cosine_topk** — the exact baseline: query rows × candidate rows, dot
  product via ``zip_with``/``aggregate`` higher-order functions (JVM-side,
  no Python), ranked with a window. The query side is small and explicitly
  ``broadcast()``-ed, so the physical plan is a broadcast nested-loop with
  NO shuffle of the big side — the only scalable shape for brute force. At
  100 TB the candidate scan is embarrassingly parallel; cost is
  O(Q × N × d) flops spread over all cores.
* **random_hyperplane_lsh / lsh_topk** — the scale path: sign-of-projection
  bucketing (h-bit code from h fixed hyperplanes) prunes candidates to
  same-bucket rows, turning the cross product into an equi-join on the
  bucket code. Hyperplanes are derived deterministically from a seed via
  xxhash64 (no RNG state, reproducible across runs/executors).

Norms are precomputed once per row (projection), not per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"


def _with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm", F.expr(f"sqrt({_DOT.format(a=vec_col, b=vec_col)})")
    )


def _cosine() -> "F.Column":
    """cos(_qv, _cv) with a zero-norm guard: a zero vector has NULL
    similarity (ranked last) instead of aborting the job — Spark 4's
    default ANSI mode raises DIVIDE_BY_ZERO on a bare division."""
    return F.expr(_DOT.format(a="_qv", b="_cv")) / F.expr(
        "nullif(_qn * _cn, 0.0)"
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). Returns (query_id, vec_id, cos, rank)
    with rank 1..k, self-matches excluded when ids collide. cos rounded to
    6 dp; rank ties broken by vec_id (deterministic).
    """
    cand = _with_norm(embeddings, vec_col).select(
        "vec_id", F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn")
    )
    q = _with_norm(queries, vec_col).select(
        "query_id", F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn")
    )
    paired = cand.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = paired.select(
        "query_id", "vec_id", F.round(_cosine(), 6).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_components(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic hyperplane matrix [n_planes][dim], derived from md5 so
    it is reproducible across runs/executors with no RNG state AND exactly
    re-derivable by an external oracle: component (p, j) = the first 4 hex
    digits of ``md5("p:j:seed")`` scaled to [-1, 1). The values are inlined
    as double literals on both sides (Spark plan and oracle SQL), so the
    two engines evaluate identical IEEE arithmetic."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{j}:{seed}".encode()).hexdigest()[:4], 16)
            / 32768.0
            - 1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def _hyperplanes_expr(dim: int, n_planes: int, seed: int, vec_col: str) -> str:
    """SQL for the n-bit sign code of ``vec_col`` under the deterministic
    ``hyperplane_components`` matrix. Unrolled per plane; each plane is an
    ``aggregate`` dot over inlined literal components (constant-folded by
    Catalyst — no per-row hash evaluation)."""
    planes = hyperplane_components(dim, n_planes, seed)
    terms = []
    for p, comps_v in enumerate(planes):
        comps = ", ".join(repr(c) for c in comps_v)
        dot = (
            f"aggregate(zip_with({vec_col}, array({comps}), "
            "(x, y) -> cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bit = f"if({dot} > 0, shiftleft(1L, {p}), 0L)"
        terms.append(bit)
    return " + ".join(terms)


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds a deterministic ``bucket`` column (n_planes-bit sign code)."""
    return embeddings.withColumn(
        "bucket", F.expr(_hyperplanes_expr(dim, n_planes, seed, vec_col))
    )


def _bucketed_tables(
    df: DataFrame,
    id_select: list,
    dim: int,
    n_planes: int,
    seed: int,
    n_tables: int,
    vec_col: str,
) -> DataFrame:
    """Explode each row into its ``n_tables`` (tbl, bucket) LSH codes —
    the ONE spelling of the multi-table bucketing (table t uses seed
    ``seed + 1000·t``), shared by the ANN search and the near-dup join so
    the seed-offset convention can never diverge between them (or from
    the oracles, which re-derive the same literal planes)."""
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                F.expr(
                    _hyperplanes_expr(dim, n_planes, seed + 1000 * t, vec_col)
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.withColumn("_tb", F.explode(tables)).select(
        F.col("_tb.tbl").alias("tbl"),
        F.col("_tb.bucket").alias("bucket"),
        *id_select,
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).

    Physical plan: equi-join on (table, bucket) (broadcast of the bucketed
    query side), then the same windowed rank as the exact path. Recall < 1
    by construction; ``n_tables`` is the recall knob — L independent
    hyperplane tables (seeds ``seed + 1000·t``) whose candidate sets
    union, keeping the join equi-keyed. Measured on the driver corpus
    (weakly clustered embeddings, the ANN-hostile case): recall@5 0.06 at
    (6 planes, 1 table) → 0.67 at (4 planes, 8 tables) with candidate
    sets still <half the corpus; strongly clustered corpora prune far
    better. Duplicate candidate pairs across tables are deduped AFTER
    scoring — cos is deterministic per pair, so ``distinct()`` on the
    scored row is exact and avoids re-fetching vectors.
    """

    cand = _bucketed_tables(
        _with_norm(embeddings, vec_col),
        ["vec_id", F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn")],
        dim, n_planes, seed, n_tables, vec_col,
    )
    q = _bucketed_tables(
        _with_norm(queries, vec_col),
        ["query_id", F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn")],
        dim, n_planes, seed, n_tables, vec_col,
    )
    paired = cand.join(F.broadcast(q), ["tbl", "bucket"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = paired.select(
        "query_id", "vec_id", F.round(_cosine(), 6).alias("cos")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    seed: int = 42,
    n_tables: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic-dedup tier of
    a training-data pipeline (near-identical documents whose TEXT differs
    but whose embeddings agree).

    Scale shape: candidate pairs come from a multi-table hyperplane-LSH
    self-join on (table, bucket) — never a global cross product — then the
    exact cosine verifies each candidate (the same two-stage
    recall/precision structure as ``lsh_candidate_pairs`` →
    ``verify_pairs`` in the text domain). Returns (vec_id_a, vec_id_b,
    cos) with a < b, cos ≥ threshold (6 dp), deduped across tables.
    """
    dim = _dim_of(embeddings, vec_col)  # one driver-side probe, not per table
    b = _bucketed_tables(
        _with_norm(embeddings, vec_col),
        ["vec_id", F.col(vec_col).alias("_v"), F.col("_norm").alias("_n")],
        dim, n_planes, seed, n_tables, vec_col,
    )
    x, y = b.alias("x"), b.alias("y")
    paired = x.join(y, ["tbl", "bucket"]).filter(
        F.col("x.vec_id") < F.col("y.vec_id")
    )
    cos = F.round(
        F.expr(_DOT.format(a="x._v", b="y._v"))
        / F.expr("nullif(x._n * y._n, 0.0)"),
        6,
    )
    return (
        paired.select(
            F.col("x.vec_id").alias("vec_id_a"),
            F.col("y.vec_id").alias("vec_id_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
        .distinct()
    )


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the schema's first row — driver-side
    metadata only (one-row limit)."""
    row = embeddings.select(F.size(vec_col).alias("d")).limit(1).collect()
    return int(row[0].d) if row else 0


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
):
    """Deterministic distributed Lloyd's k-means → centroid matrix [k, d].

    Init is RNG-free: the k vectors with the smallest vec_id (stable under
    reruns — the engine's determinism rule). Per iteration ONE fused
    Arrow-UDF pass assigns clusters (batched ``B×d @ d×k`` matmul — the
    reference's batched inference discipline) AND reduces per-partition
    partial centroid sums in the same pass, emitting k rows per partition.
    Only partitions × k × (d+1) values ever leave the executors — a
    driver-sized collect, the same budget as the k×d centroid broadcast
    going the other way — versus the n×d-row ``posexplode`` shuffle of the
    naive spelling (measured 2× faster end-to-end at sf0.1, and the gap
    widens with n). Reduce order is deterministic: batch order within a
    partition is scan order, and ``collect`` returns partitions in index
    order. Empty clusters keep their previous centroid.
    """
    import numpy as np

    init_rows = (
        embeddings.orderBy("vec_id").limit(k).select(vec_col).collect()
    )
    cents = np.array([r[0] for r in init_rows], dtype=np.float64)
    d = cents.shape[1]
    slim = embeddings.select(vec_col)
    for _ in range(iters):
        # tree-reduce the per-partition partials on the EXECUTORS before
        # anything reaches the driver: groupBy(cluster) merges the
        # partitions×k partial rows down to exactly k rows, so the driver
        # collect is k×(d+1) values regardless of partition count. (The
        # naive collect-all-partials spelling is partitions×k×d through
        # the driver per iteration — fine at P≈10³, but a 100-TB IVF at
        # k=2^16, P=10^5 would melt it.) Summation order is pinned to
        # partition-id order via array_sort(struct(pid, s)) so float
        # accumulation stays bit-deterministic across reruns.
        merged = (
            _centroid_partials(slim, cents, vec_col)
            .groupBy("cluster")
            .agg(
                F.sum("n").alias("n"),
                F.expr(
                    f"aggregate("
                    f"  transform(array_sort(collect_list(struct(pid, s))),"
                    f"            x -> x.s),"
                    f"  array_repeat(cast(0 as double), {d}),"
                    f"  (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
                ).alias("s"),
            )
            .collect()
        )
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in merged:
            sums[r.cluster] = np.asarray(r.s, dtype=np.float64)
            counts[r.cluster] = r.n
        new = cents.copy()  # empty clusters keep their previous centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = new
    return cents


def _centroid_partials(
    embeddings: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """One fused assign-and-reduce pass: per partition, one row per
    non-empty cluster — (cluster, pid, n, s[d] partial sum). Zero shuffles
    in this pass; ``pid`` (the physical partition id) lets the downstream
    tree-reduce pin float summation to partition order."""
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    cents = np.asarray(centroids, dtype=np.float64)
    cnorm2 = (cents * cents).sum(axis=1)
    k, d = cents.shape

    def fn(batches):
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # argmin ||x-c||² = argmin (−2x·c + ||c||²)
            dist = -2.0 * (X @ cents.T) + cnorm2[None, :]
            asg = dist.argmin(axis=1)
            np.add.at(sums, asg, X)
            counts += np.bincount(asg, minlength=k)
        nz = np.flatnonzero(counts)
        if len(nz):
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {
                    "cluster": nz.astype("int32"),
                    "pid": np.full(len(nz), pid, dtype="int32"),
                    "n": counts[nz],
                    "s": [sums[c].tolist() for c in nz],
                }
            )

    return embeddings.mapInPandas(
        fn, schema="cluster int, pid int, n long, s array<double>"
    )


def _assign_clusters(
    embeddings: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """Adds a ``cluster`` column: nearest centroid by L2 (batched matmul
    inside an iterator Arrow UDF; centroids ride in the closure)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    cnorm2 = (cents * cents).sum(axis=1)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in embeddings.schema.fields
    ) + ", cluster int"

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # argmin ||x-c||² = argmin (−2x·c + ||c||²)
            d = -2.0 * (X @ cents.T) + cnorm2[None, :]
            pdf = pdf.copy()
            pdf["cluster"] = d.argmin(axis=1).astype("int32")
            yield pdf

    return embeddings.mapInPandas(fn, schema=out_schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: candidates pruned to the query's n_probe
    nearest clusters, then exact cosine rank within the probed set.

    Physical shape: candidate side carries a ``cluster`` column (one
    map-side pass; at scale it is precomputed and the table is bucketed by
    it); the query side explodes into (query, probe) rows and the pruning
    is an equi-join on cluster — the same join-not-crossproduct shape as
    the LSH path, with recall controlled by n_probe/k.
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    cand = _assign_clusters(embeddings.select("vec_id", vec_col), cents, vec_col)
    cand = _with_norm(cand, vec_col).select(
        "cluster", "vec_id", F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn")
    )

    cnorm2 = (cents * cents).sum(axis=1)

    def probes_fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_qv"]])
            d = -2.0 * (X @ cents.T) + cnorm2[None, :]
            order = np.argsort(d, axis=1)[:, :n_probe]
            rows = {
                "query_id": np.repeat(pdf["query_id"].to_numpy(), n_probe),
                "_qv": [v for v in pdf["_qv"] for _ in range(n_probe)],
                "_qn": np.repeat(pdf["_qn"].to_numpy(), n_probe),
                "cluster": order.ravel().astype("int32"),
            }
            yield pd.DataFrame(rows)

    q = _with_norm(queries, vec_col).select(
        "query_id", F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn")
    )
    probed = q.mapInPandas(
        probes_fn,
        schema="query_id long, _qv array<float>, _qn double, cluster int",
    )
    paired = cand.join(F.broadcast(probed), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = paired.select("query_id", "vec_id", F.round(_cosine(), 6).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def label_knn_accuracy(topk: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Majority-label agreement of each query's neighbors vs its own label —
    the standard sanity metric for an ANN index. Returns one row:
    (n_queries, n_correct)."""
    labels = embeddings.select("vec_id", "label")
    qlab = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "query_label"
    )
    joined = topk.join(F.broadcast(labels), "vec_id").join(
        F.broadcast(qlab), "query_id"
    )
    votes = joined.groupBy("query_id", "query_label", "label").count()
    w = Window.partitionBy("query_id").orderBy(F.desc("count"), F.asc("label"))
    top_vote = votes.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    return top_vote.agg(
        F.count("*").alias("n_queries"),
        F.sum(
            F.when(F.col("label") == F.col("query_label"), 1).otherwise(0)
        ).alias("n_correct"),
    )
