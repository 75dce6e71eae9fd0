"""Similarity search over embedding columns (array<float>).

* cosine_scores / cosine_topk — brute-force exact baseline: the dot
  product and norms run as JVM-side higher-order functions
  (zip_with + aggregate), fully inside whole-stage codegen; the only
  shuffle is the final TakeOrdered of k rows.
* hyperplane LSH — the scale path: random-hyperplane sign buckets
  computed over INTEGER-quantized embeddings (round(v * 1e6)) with
  +-1 plane components derived from md5, so bucket assignment is pure
  int64 arithmetic — deterministic, SQL-oracle-exact, and immune to
  cross-engine float summation-order differences.

At 10^12 rows the bucket table is the partition key: repartition by
bucket, keep per-bucket posting lists co-located, probe only the
query's bucket (optionally +hamming-1 neighbor buckets for recall).
"""

from __future__ import annotations

import hashlib
import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

QUANT = 1_000_000  # embedding quantization for integer LSH


def plane_sign(p: int, i: int) -> int:
    """Deterministic +-1 hyperplane component: low bit of
    md5('{p}:{i}') — reproducible in any engine."""
    return 1 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16) & 1 else -1


def cosine_scores(df: DataFrame, qvec: Sequence[float], emb_col: str = "embedding") -> Column:
    """Exact cosine similarity vs a constant query vector as a pure
    Catalyst expression (no UDF)."""
    q = [float(v) for v in qvec]
    qn = math.sqrt(sum(v * v for v in q))
    qarr = F.array(*[F.lit(v) for v in q])
    dot = F.aggregate(
        F.zip_with(F.col(emb_col), qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col(emb_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (nrm * F.lit(qn))


def cosine_topk(
    df: DataFrame, qvec: Sequence[float], k: int, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Brute-force exact top-k: (id, rank). orderBy().limit(k) IS
    Catalyst's TakeOrderedAndProject — each partition keeps a local
    k-heap and only <=k rows per partition reach the driver-side merge;
    no single-partition global sort. (Round-1 used row_number over an
    unpartitioned Window, which shuffles EVERY scored row to one
    partition — the fix is the plan-shape difference that matters at
    10^12 rows.) Ranking then runs over the <=k surviving rows only."""
    scored = df.select(F.col(id_col), cosine_scores(df, qvec, emb_col).alias("cs"))
    top = scored.orderBy(F.desc("cs"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cs"), F.asc(id_col))  # <=k rows: trivial
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, F.col("rank").cast("bigint").alias("rank")
    )


def lsh_bucket(emb_col: str, dims: int, planes: int = 4) -> Column:
    """Integer hyperplane bucket id (0..2^planes-1): bit p set iff
    sum_i sign(p,i) * round(emb[i]*1e6) >= 0."""
    e = F.transform(F.col(emb_col), lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        signs = [plane_sign(p, i) for i in range(dims)]
        dot = F.aggregate(
            F.zip_with(e, F.array(*[F.lit(s) for s in signs]), lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_sql(emb_expr: str, dims: int, planes: int = 4) -> str:
    """DuckDB twin of lsh_bucket (same quantization + signs)."""
    e = f"list_transform({emb_expr}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    terms = []
    for p in range(planes):
        signs = "[" + ",".join(str(plane_sign(p, i)) for i in range(dims)) + "]"
        dot = f"list_sum(list_transform(generate_series(1, {dims}), i -> ({e})[i] * ({signs})[i]))"
        terms.append(f"(CASE WHEN {dot} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _quant_cosine(ea: Column, eb: Column) -> Column:
    """Cross-engine-exact cosine: both vectors are integer-quantized
    (round(v*1e6)) so the dot product and squared norms are EXACT
    int64 values; the only float ops are two correctly-rounded sqrts
    and one division — bit-identical in any IEEE engine regardless of
    summation order."""
    qa = F.transform(ea, lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    qb = F.transform(eb, lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, x: a + x
    )
    na = F.aggregate(F.transform(qa, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x)
    nb = F.aggregate(F.transform(qb, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x)
    return dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


def quant_cosine_sql(ea: str, eb: str, dims: int) -> str:
    """DuckDB twin of _quant_cosine (same exact integer arithmetic)."""
    qa = f"list_transform({ea}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    qb = f"list_transform({eb}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    dot = f"list_sum(list_transform(generate_series(1, {dims}), i -> ({qa})[i] * ({qb})[i]))"
    na = f"list_sum(list_transform({qa}, x -> x * x))"
    nb = f"list_sum(list_transform({qb}, x -> x * x))"
    return f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))))"


def embedding_near_dup_pairs(
    df: DataFrame,
    dims: int,
    threshold: float = 0.9,
    planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate generation is a
    SELF-EQUI-JOIN on the LSH bucket (bucketed, never all-pairs — the
    same scale shape as the MinHash band join), exact quantized-cosine
    verify on candidates only. Returns (a, b, cos1000) with a < b.

    Recall: same-bucket candidates only (vectors within ~2 degrees of
    a hyperplane may land in adjacent buckets; raise `planes` for
    precision or union several plane families for recall — each family
    is one more bucketed join, still never quadratic)."""
    b = df.withColumn("_bucket", lsh_bucket(emb_col, dims, planes))
    left = b.select(F.col(id_col).alias("a"), F.col(emb_col).alias("_ea"), "_bucket")
    right = b.select(F.col(id_col).alias("b"), F.col(emb_col).alias("_eb"), "_bucket")
    cand = left.join(right, "_bucket").filter(F.col("a") < F.col("b"))
    cos = _quant_cosine(F.col("_ea"), F.col("_eb"))
    return (
        cand.withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("a", "b", F.floor(F.col("_cos") * 1000).cast("bigint").alias("cos1000"))
    )


def query_bits(qvec: Sequence[float], dims: int, planes: int) -> int:
    """The query vector's LSH bucket (same integer arithmetic as
    lsh_bucket)."""
    qbits = 0
    qq = [round(float(v) * QUANT) for v in qvec]
    for p in range(planes):
        dot = sum(plane_sign(p, i) * qq[i] for i in range(dims))
        if dot >= 0:
            qbits |= 1 << p
    return qbits


def with_bucket(df: DataFrame, dims: int, planes: int = 16, emb_col: str = "embedding") -> DataFrame:
    """Persist-ready bucket layout: adds the LSH bucket column and
    repartitions by it. Written out partitionBy('lsh_bucket'), a probe
    becomes PARTITION PRUNING — at 10^12 rows only probes/2^planes of
    the corpus is even scanned (16-24 planes -> 2^-16..2^-24)."""
    return df.withColumn("lsh_bucket", lsh_bucket(emb_col, dims, planes)).repartition(
        F.col("lsh_bucket")
    )


def probe_buckets(qbits: int, planes: int, hamming: int = 1) -> list[int]:
    """Multi-probe bucket list: the query bucket plus every bucket
    within the given hamming radius (radius 1 = flip each plane bit —
    the classic multi-probe LSH recall recovery)."""
    out = {qbits}
    frontier = {qbits}
    for _ in range(hamming):
        nxt = set()
        for b in frontier:
            for p in range(planes):
                nxt.add(b ^ (1 << p))
        out |= nxt
        frontier = nxt
    return sorted(out)


def ann_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int,
    dims: int,
    planes: int = 4,
    probe_hamming: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: probe the query's bucket (plus
    hamming<=probe_hamming neighbor buckets for recall), exact cosine
    re-rank on the candidates only.

    Scale shape: the probe is an IN-list on the bucket column — with a
    with_bucket()-persisted layout that is pure partition pruning
    ((1+planes*probe_hamming)/2^planes of the corpus); the re-rank is
    TakeOrderedAndProject over the pruned candidates. bucket_col names
    a precomputed column; otherwise the bucket is computed on the fly
    (full scan, still JVM-only arithmetic)."""
    qbits = query_bits(qvec, dims, planes)
    probes = probe_buckets(qbits, planes, probe_hamming)
    if bucket_col is None:
        df = df.withColumn("_bucket", lsh_bucket(emb_col, dims, planes))
        bucket_col = "_bucket"
    cand = df.filter(F.col(bucket_col).isin(probes))
    return cosine_topk(cand, qvec, k, id_col=id_col, emb_col=emb_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-coarse-quantizer scale path
# ---------------------------------------------------------------------------
#
# Classic IVF (Sivic/Zisserman bag-of-words; FAISS IndexIVFFlat shape):
# train k coarse centroids, assign every vector to its nearest centroid
# cell, store per-cell posting lists; a query probes only the nprobe
# nearest cells and exact-ranks those candidates. At 10^12 rows the
# cell id is the partition key (write partitionBy('ivf_cell')) and a
# probe is partition pruning: nprobe/n_cells of the corpus scanned.
#
# Everything here is deterministic and cross-engine bit-exact so the
# whole pipeline (training included) can be replayed in ANSI SQL:
#   * vectors are integer-quantized (round(v*1e6) -> int64),
#   * centroids are kept as (sum int64[], count) pairs — exact,
#   * seeds = the k rows with lowest (md5(id), id) — no RNG,
#   * every float reduction is the same left-fold of IEEE doubles in
#     Spark (F.aggregate), DuckDB (list_reduce) and Python (loop).


def _ivf_dist(qcol: Column, s: Sequence[int], n: int) -> Column:
    """Squared L2 distance from a quantized int64 vector column to the
    centroid (s/n): left-fold sum of (x_i - s_i/n)^2 as doubles."""
    c = [si / n for si in s]  # exact int64 -> correctly-rounded double
    carr = F.array(*[F.lit(float(v)) for v in c])
    return F.aggregate(
        F.zip_with(qcol, carr, lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _quantized(emb_col: str) -> Column:
    return F.transform(F.col(emb_col), lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def ivf_assign(cents: list[tuple[list[int], int]], qcol: Column) -> Column:
    """Cell id = argmin over centroids of squared L2 distance, ties to
    the lowest cell id (array_position returns the FIRST minimum)."""
    darr = F.array(*[_ivf_dist(qcol, s, n) for s, n in cents])
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("long")


def ivf_train(
    df: DataFrame,
    dims: int,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[tuple[list[int], int]]:
    """Deterministic distributed Lloyd's k-means over quantized
    embeddings. Returns centroids as (component_sums, count) so they
    stay exact integers.

    Scale shape: seeding is a TakeOrdered of k rows (no full sort);
    each iteration is ONE map-side-combinable groupBy producing
    k x (dims+1) numbers — the only driver-side state is the k
    centroids themselves. For 10^12 rows train on a sampled subset
    (df.sample) — the protocol is unchanged."""
    qdf = df.select(F.col(id_col).alias("_id"), _quantized(emb_col).alias("_q"))
    seeds = (
        qdf.withColumn("_h", F.md5(F.col("_id").cast("string").cast("binary")))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .collect()
    )
    cents = [(list(r["_q"]), 1) for r in seeds]
    for _ in range(iters):
        cell = ivf_assign(cents, F.col("_q"))
        rows = (
            qdf.select(cell.alias("_cell"), "_q")
            .groupBy("_cell")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(F.col("_q")[i]).alias(f"_s{i}") for i in range(dims)],
            )
            .collect()
        )
        new = list(cents)  # empty cells keep their previous centroid
        for r in rows:
            new[int(r["_cell"])] = ([int(r[f"_s{i}"]) for i in range(dims)], int(r["_n"]))
        cents = new
    return cents


def _qround(v: float) -> int:
    """round-half-away-from-zero of v*QUANT — replicates Spark
    F.round/DuckDB round() exactly (Python round() is banker's)."""
    x = float(v) * QUANT
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def ivf_probe_cells(cents: list[tuple[list[int], int]], qvec: Sequence[float], nprobe: int) -> list[int]:
    """The nprobe cells nearest the query vector (same fold, same
    tie-break order (d, cid) as the SQL twin)."""
    qq = [_qround(v) for v in qvec]
    ds = []
    for cid, (s, n) in enumerate(cents):
        acc = 0.0
        for xi, si in zip(qq, s):
            diff = float(xi) - (si / n)
            acc = acc + diff * diff
        ds.append((acc, cid))
    ds.sort()
    return [cid for _, cid in ds[:nprobe]]


def with_ivf_cell(
    df: DataFrame, cents: list[tuple[list[int], int]], emb_col: str = "embedding"
) -> DataFrame:
    """Posting-list layout: adds ivf_cell and repartitions by it.
    Written partitionBy('ivf_cell'), a probe is partition pruning —
    only nprobe/n_cells of a 10^12-row corpus is scanned."""
    return df.withColumn("ivf_cell", ivf_assign(cents, _quantized(emb_col))).repartition(
        F.col("ivf_cell")
    )


def ivf_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int,
    dims: int,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cents: list[tuple[list[int], int]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: train (or reuse) the coarse quantizer,
    probe the nprobe cells nearest the query, exact quantized-cosine
    re-rank on candidates only. Returns (id, cell, rank)."""
    if cents is None:
        cents = ivf_train(df, dims, n_cells, iters, id_col, emb_col)
    probes = ivf_probe_cells(cents, qvec, nprobe)
    cell = ivf_assign(cents, _quantized(emb_col))
    cand = df.withColumn("_cell", cell).filter(F.col("_cell").isin([int(p) for p in probes]))
    qarr = F.array(*[F.lit(float(v)) for v in qvec])
    scored = cand.select(
        F.col(id_col),
        F.col("_cell").alias("cell"),
        _quant_cosine(F.col(emb_col), qarr).alias("_cs"),
    )
    top = scored.orderBy(F.desc("_cs"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.desc("_cs"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "cell", F.col("rank").cast("bigint").alias("rank")
    )


def _dist_sql(dims: int, qe: str, se: str, ne: str) -> str:
    diff = f"(CAST(({qe})[i] AS DOUBLE) - CAST(({se})[i] AS DOUBLE) / CAST({ne} AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, {dims}), "
        f"i -> {diff} * {diff}), (a, b) -> a + b)"
    )


def _ivf_train_ctes(dims: int, n_cells: int, iters: int) -> list[str]:
    """Shared CTE prefix replaying ivf_train bit-identically:
    quantization, md5-ordered seeding, every Lloyd iteration.  Ends
    with `c{iters}` = the final (cid, s, n) centroid table and `qemb`
    = (vec_id, embedding, q)."""
    rn_seed = "row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)"
    ctes = [
        "qemb AS (SELECT vec_id, embedding, "
        f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS q "
        "FROM embeddings)",
        f"c0 AS (SELECT {rn_seed} - 1 AS cid, q AS s, CAST(1 AS BIGINT) AS n "
        f"FROM qemb QUALIFY {rn_seed} <= {n_cells})",
    ]
    for t in range(iters):
        d = _dist_sql(dims, "e.q", "c.s", "c.n")
        ctes.append(
            f"a{t} AS (SELECT vec_id, q, cid FROM ("
            f"SELECT e.vec_id, e.q, c.cid, row_number() OVER "
            f"(PARTITION BY e.vec_id ORDER BY {d}, c.cid) AS rn "
            f"FROM qemb e CROSS JOIN c{t} c) WHERE rn = 1)"
        )
        ctes.append(
            f"s{t} AS (SELECT cid, i, CAST(SUM(q[i]) AS BIGINT) AS sv "
            f"FROM a{t} CROSS JOIN generate_series(1, {dims}) g(i) GROUP BY cid, i)"
        )
        ctes.append(f"l{t} AS (SELECT cid, list(sv ORDER BY i) AS s FROM s{t} GROUP BY cid)")
        ctes.append(f"n{t} AS (SELECT cid, COUNT(*) AS n FROM a{t} GROUP BY cid)")
        ctes.append(
            f"c{t + 1} AS (SELECT c.cid, COALESCE(l.s, c.s) AS s, COALESCE(n2.n, c.n) AS n "
            f"FROM c{t} c LEFT JOIN l{t} l ON l.cid = c.cid LEFT JOIN n{t} n2 ON n2.cid = c.cid)"
        )
    return ctes


def ivf_topk_sql(
    dims: int,
    k: int = 10,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    query_vec_id: int = 0,
) -> str:
    """DuckDB twin of ivf_topk(query = embedding of `query_vec_id`):
    replays the ENTIRE pipeline — quantization, md5-ordered seeding,
    every Lloyd iteration, cell assignment, probe selection and the
    exact-cosine re-rank — with the same integer arithmetic and the
    same left-fold double reductions, so the result is bit-identical
    to the Spark plan."""
    ctes = _ivf_train_ctes(dims, n_cells, iters)
    T = iters
    dq = _dist_sql(dims, "qv.qq", "c.s", "c.n")
    df_ = _dist_sql(dims, "e.q", "c.s", "c.n")
    ctes.append(f"qv AS (SELECT q AS qq FROM qemb WHERE vec_id = {query_vec_id})")
    ctes.append(
        f"pr AS (SELECT c.cid FROM c{T} c CROSS JOIN qv ORDER BY {dq}, c.cid LIMIT {nprobe})"
    )
    ctes.append(
        f"af AS (SELECT vec_id, cid AS cell FROM ("
        f"SELECT e.vec_id, c.cid, row_number() OVER "
        f"(PARTITION BY e.vec_id ORDER BY {df_}, c.cid) AS rn "
        f"FROM qemb e CROSS JOIN c{T} c) WHERE rn = 1)"
    )
    ctes.append(
        f"qrow AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})"
    )
    cs = quant_cosine_sql("e.embedding", "qrow.qe", dims)
    ctes.append(
        "scored AS (SELECT e.vec_id, a.cell, "
        f"{cs} AS cs "
        "FROM af a JOIN qemb e ON e.vec_id = a.vec_id CROSS JOIN qrow "
        "WHERE a.cell IN (SELECT cid FROM pr))"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT vec_id, CAST(cell AS BIGINT) AS cell, "
        f"CAST(row_number() OVER (ORDER BY cs DESC, vec_id) AS BIGINT) AS rank "
        f"FROM scored ORDER BY cs DESC, vec_id LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023, arXiv:2303.09540)


def semantic_dedup(
    df: DataFrame,
    dims: int,
    n_cells: int = 8,
    iters: int = 2,
    tau: float = 0.3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means-cluster the embedding space, then drop every
    document whose cosine similarity to a LOWER-id document in the
    SAME cluster exceeds tau — the paper's upper-triangular max-sim
    rule (keep a doc iff max cos to lower-indexed cluster members
    <= tau), with vec_id as the index order so the result is
    deterministic.  Returns (id, cell, dropped).

    Scale shape: clustering is the existing exact integer-quantized
    Lloyd loop (k x (dims+1) numbers of driver state per iteration;
    train on a sample at 10^12 rows); the pair stage is a
    WITHIN-CLUSTER self-join — never all-pairs — whose cost is
    sum(cluster_size^2), controlled by n_cells exactly as the paper
    controls it (50k clusters for LAION).  Cosines reuse the
    cross-engine-exact quantized arithmetic, so `> tau` decides
    identically in any IEEE engine."""
    cents = ivf_train(df, dims, n_cells, iters, id_col, emb_col)
    a = df.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_e"),
        ivf_assign(cents, _quantized(emb_col)).alias("cell"),
    )
    left = a.select("cell", F.col("_id").alias("_ida"), F.col("_e").alias("_ea"))
    right = a.select("cell", F.col("_id").alias("_idb"), F.col("_e").alias("_eb"))
    pairs = left.join(right, "cell").filter(F.col("_ida") < F.col("_idb"))
    dropped = (
        pairs.filter(_quant_cosine(F.col("_ea"), F.col("_eb")) > tau)
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return a.join(dropped, "_id", "left").select(
        F.col("_id").alias(id_col),
        "cell",
        F.coalesce(F.col("_d"), F.lit(False)).alias("dropped"),
    )


def semantic_dedup_sql(dims: int, n_cells: int = 8, iters: int = 2,
                       tau: float = 0.3) -> str:
    """DuckDB twin of semantic_dedup over the `embeddings` view —
    training replayed via the shared _ivf_train_ctes prefix, the
    within-cluster pair rule in plain SQL."""
    ctes = _ivf_train_ctes(dims, n_cells, iters)
    T = iters
    df_ = _dist_sql(dims, "e.q", "c.s", "c.n")
    ctes.append(
        f"af AS (SELECT vec_id, embedding, cid AS cell FROM ("
        f"SELECT e.vec_id, e.embedding, c.cid, row_number() OVER "
        f"(PARTITION BY e.vec_id ORDER BY {df_}, c.cid) AS rn "
        f"FROM qemb e CROSS JOIN c{T} c) WHERE rn = 1)"
    )
    cs = quant_cosine_sql("a.embedding", "b.embedding", dims)
    ctes.append(
        "dropped AS (SELECT DISTINCT b.vec_id FROM af a JOIN af b "
        f"ON a.cell = b.cell AND a.vec_id < b.vec_id WHERE {cs} > {tau!r})"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT f.vec_id, CAST(f.cell AS BIGINT) AS cell, "
        "(d.vec_id IS NOT NULL) AS dropped "
        "FROM af f LEFT JOIN dropped d ON d.vec_id = f.vec_id"
    )
