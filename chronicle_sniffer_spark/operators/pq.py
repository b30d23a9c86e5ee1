"""Product-quantization (PQ) approximate nearest-neighbor search
(SURVEY.md §2B L3 — third scale path next to the LSH buckets and the
IVF cells).

PQ (Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011) splits each D-dim vector into ``M``
subvectors of ``D/M`` dims and quantizes each subspace independently with
its own ``K``-codeword k-means codebook.  A vector is then stored as
``M`` small integers — here 8 codes of 4 bits vs 64 float64s, a 128×
compression — and query-time scoring is **ADC** (asymmetric distance
computation): one ``M × K`` table of query-to-codeword distances is
built once per query, and every corpus vector's approximate distance
is just ``M`` table lookups + a sum.  The raw vectors are never read
at serving time.

Scale shape (100 TB): the codebook is KB-sized (M·K·D/M doubles) and
trains on a bounded deterministic sample, exactly like
:mod:`operators.ivf`; encoding is a single pass of per-row
expressions (no shuffle); the ADC scan reads only the codes column
(~1/64th of the vector bytes) and stays in a single
TakeOrderedAndProject — the canonical billion-vector serving layout
(often composed with IVF as IVF-PQ; both halves exist here).

Determinism (mirrors :func:`ivf.train_centroids`):

- train sample = ``vec_id % m == 0`` modulo-sample, collected in
  vec_id order; init codewords = the first ``K`` subvectors;
- argmin ties break on lowest code id (numpy argmin ≡ the SQL
  ``ORDER BY d2, k`` row_number ≡ Spark ``array_min`` on
  ``struct(d2, k)``);
- the ADC lookup table is rounded to 6 dp half-away-from-zero on both
  engines and summed EXACTLY as ``DECIMAL(18,6)``, so the
  cross-engine association order of the final sum can never matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronicle_sniffer_spark.operators.ivf import MAX_TRAIN
from chronicle_sniffer_spark.operators.similarity import as_double

SUB_M = 8  # subspaces
K_CODE = 16  # codewords per subspace (4-bit codes)
PQ_ITER = 3

Codebooks = list[list[list[float]]]  # [m][k] -> codeword (D/M doubles)


def train_codebooks(
    embeddings: DataFrame,
    m_sub: int = SUB_M,
    k_code: int = K_CODE,
    n_iter: int = PQ_ITER,
    max_train: int = MAX_TRAIN,
) -> Codebooks:
    """Deterministic per-subspace Lloyd iterations on a bounded
    modulo-sample; returns the KB-sized codebook table to the driver
    (the same driver-sized-model role as IVF's centroid table)."""
    import numpy as np

    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    n = vecs.count()
    if n > max_train:
        step = -(-n // max_train)  # ceil
        vecs = vecs.filter(F.col("vec_id") % step == 0)
    rows = vecs.orderBy("vec_id").collect()
    x = np.array([r.v for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible into {m_sub} subspaces")
    d_sub = dim // m_sub
    books: Codebooks = []
    for m in range(m_sub):
        xm = x[:, m * d_sub : (m + 1) * d_sub]
        cent = xm[:k_code].copy()
        for _ in range(n_iter):
            d2 = ((xm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)  # ties -> lowest k
            for k in range(k_code):
                mask = code == k
                if mask.any():  # empty cell keeps its previous codeword
                    cent[k] = xm[mask].mean(axis=0)
        books.append([cent[k].tolist() for k in range(k_code)])
    return books


def pq_encode(embeddings: DataFrame, books: Codebooks) -> DataFrame:
    """vec_id → ``codes array<int>`` (M entries in [0, K)).

    Encoding is a vectorized Arrow-batched ``mapInPandas`` (numpy
    broadcast argmin per subspace, codebooks shipped via a Spark
    broadcast) — the same Python-at-the-DAG-edge shape as the media
    codecs: per-row work is bounded, nothing shuffles, and the first
    expression-tree formulation (M·K interpreted zip_with folds per
    row) was ~10× slower at sf0.1.  At scale this runs once at
    index-build time and the codes column is what gets stored/served.

    Ties break to the lowest code id (numpy argmin), matching the
    oracle's ``ORDER BY d2, k``; numpy's pairwise summation can differ
    from the SQL `+` chain in the last ulp, which could flip an argmin
    only on a ~1e-15 near-tie between two codewords — the same
    accepted improbability channel as the IVF assignment."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    m_sub, d_sub = len(books), len(books[0][0])
    bc = spark.sparkContext.broadcast(
        np.array(books, dtype=np.float64)  # (M, K, d_sub)
    )

    def encode(batches):
        cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m_sub), dtype=np.int32)
            for m in range(m_sub):
                xm = x[:, m * d_sub : (m + 1) * d_sub]
                d2 = ((xm[:, None, :] - cb[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "codes": list(codes)}
            )

    base = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    return base.mapInPandas(encode, "vec_id long, codes array<int>")


def _round6_half_away(x: float) -> float:
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def adc_lut(query_vec: list[float], books: Codebooks) -> list[list[float]]:
    """The per-query ADC table: lut[m][k] = round6(d2(query subvector
    m, codeword k)) — M·K doubles, built driver-side in the exact
    left-to-right order the oracle's unrolled SQL uses."""
    d_sub = len(books[0][0])
    lut: list[list[float]] = []
    for m, book in enumerate(books):
        q = query_vec[m * d_sub : (m + 1) * d_sub]
        row = []
        for cw in book:
            d = 0.0
            for a, b in zip(q, cw):
                d = d + (a - b) * (a - b)
            row.append(_round6_half_away(d))
        lut.append(row)
    return lut


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m_sub: int = SUB_M,
    k_code: int = K_CODE,
    n_iter: int = PQ_ITER,
    books: Codebooks | None = None,
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes.

    Plan: encode (per-row expressions) → score = Σ_m lut[m][code_m]
    as an exact decimal sum of literal-array lookups (no join, no
    shuffle — the lut rides in the plan as M broadcast-literal arrays)
    → TakeOrderedAndProject top-k on (approx_d2, vec_id)."""
    if books is None:
        books = train_codebooks(embeddings, m_sub, k_code, n_iter)
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    qrow = vecs.filter(F.col("vec_id") == query_vec_id).collect()
    if not qrow:
        raise KeyError(f"query_vec_id {query_vec_id} not in corpus")
    lut = adc_lut(list(qrow[0].v), books)

    coded = pq_encode(embeddings, books).filter(F.col("vec_id") != query_vec_id)
    terms = [
        F.element_at(
            F.array(*[F.lit(x) for x in lut[m]]),
            F.element_at(F.col("codes"), m + 1) + 1,
        ).cast("decimal(18,6)")
        for m in range(len(books))
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    scored = coded.select("vec_id", total.cast("double").alias("approx_d2"))
    topk = scored.orderBy(F.col("approx_d2").asc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def _d2_sql(a: str, b: str, d_sub: int) -> str:
    """Unrolled `(a[i]-b[i])*(a[i]-b[i]) + ...` chain (left-assoc,
    products not pow — bit-identical to the Spark fold)."""
    return " + ".join(
        f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])" for i in range(1, d_sub + 1)
    )


_BASE_CTE_TMPL = """
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nn AS (SELECT count(*) AS n FROM vecs),
    train AS (
      SELECT vec_id, v FROM vecs, nn
      WHERE vec_id % (CASE WHEN nn.n > {max_train}
                           THEN (nn.n + {max_train_m1}) // {max_train}
                           ELSE 1 END) = 0
    )"""


def _pq_cte(
    query_vec_id: int,
    m_sub: int,
    k_code: int,
    n_iter: int,
    d_sub: int,
) -> list[str]:
    """The PQ-side CTE chain (train → encode → LUT), all names prefixed
    ``p`` so it can share one WITH clause with the IVF cell chain
    (which owns the unprefixed c0/a{i}/m{i} names).  Assumes
    ``vecs``/``train`` CTEs already exist."""
    d2 = _d2_sql("s.sv", "c.cw", d_sub)
    cte = [
        f"""
    pms AS (SELECT unnest(generate_series(0, {m_sub - 1})) AS m),
    psubs AS (
      SELECT vec_id, m, v[m*{d_sub}+1 : m*{d_sub}+{d_sub}] AS sv FROM train, pms
    ),
    pc0 AS (
      SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS k,
             sv AS cw
      FROM psubs
      QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= {k_code}
    )"""
    ]
    for i in range(n_iter):
        cte.append(
            f"""
    pa{i} AS (
      SELECT vec_id, m, sv, k FROM (
        SELECT s.vec_id, s.m, s.sv, c.k,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {d2}, c.k) AS rn
        FROM psubs s JOIN pc{i} c ON c.m = s.m) WHERE rn = 1
    ),
    pu{i} AS (
      SELECT m, k, list(mu ORDER BY idx) AS cw FROM (
        SELECT m, k, idx, avg(val) AS mu FROM (
          SELECT m, k, unnest(sv) AS val,
                 unnest(generate_series(1, len(sv))) AS idx FROM pa{i})
        GROUP BY m, k, idx) GROUP BY m, k
    ),
    pc{i + 1} AS (
      SELECT c.m, c.k, coalesce(u.cw, c.cw) AS cw
      FROM pc{i} c LEFT JOIN pu{i} u ON u.m = c.m AND u.k = c.k
    )"""
        )
    cf = f"pc{n_iter}"
    cte.append(
        f"""
    pallsubs AS (
      SELECT vec_id, m, v[m*{d_sub}+1 : m*{d_sub}+{d_sub}] AS sv FROM vecs, pms
    ),
    pcodes AS (
      SELECT vec_id, m, k FROM (
        SELECT s.vec_id, s.m, c.k,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {d2}, c.k) AS rn
        FROM pallsubs s JOIN {cf} c ON c.m = s.m) WHERE rn = 1
    ),
    plut AS (
      SELECT c.m, c.k, round({_d2_sql("s.sv", "c.cw", d_sub)}, 6) AS d2
      FROM {cf} c JOIN (SELECT m, sv FROM pallsubs
                        WHERE vec_id = {query_vec_id}) s ON s.m = c.m
    )"""
    )
    return cte


def oracle_pq_sql(
    query_vec_id: int,
    k: int,
    m_sub: int = SUB_M,
    k_code: int = K_CODE,
    n_iter: int = PQ_ITER,
    max_train: int = MAX_TRAIN,
    dim: int = 64,
) -> str:
    """DuckDB re-derivation of the ENTIRE PQ pipeline — per-subspace
    train, encode, LUT, ADC score — as one SQL string (the
    :func:`ivf.oracle_ivf_sql` unrolled-Lloyd pattern, with the
    subspace id as an extra group key so one loop trains all M
    codebooks at once)."""
    cte = [_BASE_CTE_TMPL.format(max_train=max_train, max_train_m1=max_train - 1)]
    cte += _pq_cte(query_vec_id, m_sub, k_code, n_iter, dim // m_sub)
    cte.append(
        f"""
    scored AS (
      SELECT pcodes.vec_id,
             CAST(sum(CAST(l.d2 AS DECIMAL(18,6))) AS DOUBLE) AS approx_d2
      FROM pcodes JOIN plut l ON l.m = pcodes.m AND l.k = pcodes.k
      WHERE pcodes.vec_id <> {query_vec_id}
      GROUP BY pcodes.vec_id
    )"""
    )
    return (
        "WITH "
        + ",".join(cte)
        + f"""
    SELECT vec_id, approx_d2, CAST(rnk AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY approx_d2, vec_id) AS rnk
      FROM scored) WHERE rnk <= {k}
    """
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_probe: int | None = None,
) -> DataFrame:
    """IVF-PQ: probe the query's nearest cells (IVF) and ADC-score
    ONLY the candidates inside them (PQ) — the canonical billion-scale
    serving composition (FAISS's IVFPQ index): the cell filter prunes
    the scan to ``n_probe/n_centroids`` of the corpus, and scoring
    touches 4-bit codes instead of raw vectors, so query cost is
    (pruned scan) × (M lookups/row) with no distance math against
    full vectors anywhere.

    Candidates are encoded after the cell filter here (the entry runs
    index-build + query in one plan); in the materialized layout the
    codes are a column of the cid-partitioned index
    (:func:`ivf.ivf_index_write`) and the probe reads codes only."""
    from chronicle_sniffer_spark.operators.ivf import (
        N_PROBE,
        _assign,
        _centroid_df,
        train_centroids,
    )

    if n_probe is None:
        n_probe = N_PROBE
    spark = embeddings.sparkSession
    centroids = train_centroids(embeddings)
    books = train_codebooks(embeddings)
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    assigned = _assign(vecs, _centroid_df(spark, centroids))

    qrow = vecs.filter(F.col("vec_id") == query_vec_id).collect()
    if not qrow:
        raise KeyError(f"query_vec_id {query_vec_id} not in corpus")
    qv = list(qrow[0].v)

    def d2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = [cid for cid, c in sorted(centroids, key=lambda c: (d2(c[1], qv), c[0]))[:n_probe]]
    cand = assigned.filter(
        F.col("cid").isin(probe) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id", F.col("v").alias("embedding"))

    lut = adc_lut(qv, books)
    coded = pq_encode(cand, books)
    terms = [
        F.element_at(
            F.array(*[F.lit(x) for x in lut[m]]),
            F.element_at(F.col("codes"), m + 1) + 1,
        ).cast("decimal(18,6)")
        for m in range(len(books))
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    scored = coded.select("vec_id", total.cast("double").alias("approx_d2"))
    topk = scored.orderBy(F.col("approx_d2").asc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def ivfpq_index_write(embeddings: DataFrame, index_dir: str) -> None:
    """Materialize the IVF-PQ index: ``cells/`` is cid-PARTITIONED
    parquet holding (vec_id, codes) ONLY — the raw vectors are NOT in
    the index (that's the PQ point: the per-vector payload is M 4-bit
    codes, logically 4 bytes vs 512 bytes of float64s — 128×; stored
    here as a parquet int-array column, which dictionary+RLE encoding
    keeps within the same order), plus KB-sized ``centroids`` and
    ``codebooks`` tables.  At 100 TB the index is written once; every
    query then reads just the probed cells' files and just the codes
    column."""
    from chronicle_sniffer_spark.operators.ivf import (
        _assign,
        _centroid_df,
        train_centroids,
    )

    spark = embeddings.sparkSession
    centroids = train_centroids(embeddings)
    books = train_codebooks(embeddings)
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    assigned = _assign(vecs, _centroid_df(spark, centroids)).select("vec_id", "cid")
    coded = pq_encode(embeddings, books)
    cells = assigned.join(coded, "vec_id").select("vec_id", "cid", "codes")
    cells.write.partitionBy("cid").mode("overwrite").parquet(f"{index_dir}/cells")
    _centroid_df(spark, centroids).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    rows = [(m, k, cw) for m, book in enumerate(books) for k, cw in enumerate(book)]
    spark.createDataFrame(rows, "m int, k int, cw array<double>").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/codebooks")


def ivfpq_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int | None = None,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Serve a query from the materialized IVF-PQ index: probe choice
    and the ADC lookup table come from the KB-sized centroid/codebook
    tables driver-side; the data scan is an IN filter on ``cid`` that
    the partitioned layout turns into partition pruning, and the only
    data column read is ``codes`` — no vector bytes move at query
    time (asserted by tests/test_coverage5.py)."""
    from chronicle_sniffer_spark.operators.ivf import N_PROBE

    if n_probe is None:
        n_probe = N_PROBE
    centroids = [
        (r.cid, list(r.cvec)) for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    ]
    brows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    m_sub = 1 + max(r.m for r in brows)
    k_code = 1 + max(r.k for r in brows)
    books: Codebooks = [[None] * k_code for _ in range(m_sub)]
    for r in brows:
        books[r.m][r.k] = list(r.cw)

    def d2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = [cid for cid, c in sorted(centroids, key=lambda c: (d2(c[1], query_vec), c[0]))[:n_probe]]
    lut = adc_lut(query_vec, books)
    cells = (
        spark.read.parquet(f"{index_dir}/cells")
        .filter(F.col("cid").isin(probe))
        .select("vec_id", "codes")
    )
    if exclude_vec_id is not None:
        cells = cells.filter(F.col("vec_id") != exclude_vec_id)
    terms = [
        F.element_at(
            F.array(*[F.lit(x) for x in lut[m]]),
            F.element_at(F.col("codes"), m + 1) + 1,
        ).cast("decimal(18,6)")
        for m in range(m_sub)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    scored = cells.select("vec_id", total.cast("double").alias("approx_d2"))
    topk = scored.orderBy(F.col("approx_d2").asc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def oracle_ivfpq_sql(
    query_vec_id: int,
    k: int,
    n_probe: int | None = None,
    m_sub: int = SUB_M,
    k_code: int = K_CODE,
    pq_iter: int = PQ_ITER,
    max_train: int = MAX_TRAIN,
    dim: int = 64,
) -> str:
    """DuckDB re-derivation of :func:`ivfpq_topk`: the IVF cell chain
    (unprefixed names, from `ivf._train_cte`) and the PQ chain
    (``p``-prefixed) share one WITH clause over the same
    ``vecs``/``train`` base; scoring joins codes to the LUT only for
    vectors whose cell is probed."""
    from chronicle_sniffer_spark.operators.ivf import (
        N_CENTROIDS,
        N_ITER,
        N_PROBE,
        _train_cte,
    )

    if n_probe is None:
        n_probe = N_PROBE
    cte = _train_cte(N_CENTROIDS, N_ITER, max_train)
    cte += _pq_cte(query_vec_id, m_sub, k_code, pq_iter, dim // m_sub)
    cte.append(
        f"""
    qv AS (SELECT v FROM vecs WHERE vec_id = {query_vec_id}),
    probe AS (
      SELECT cid FROM c{N_ITER}, qv
      ORDER BY list_distance(cvec, qv.v), cid LIMIT {n_probe}
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT x.vec_id, c.cid,
               row_number() OVER (PARTITION BY x.vec_id
                                  ORDER BY list_distance(x.v, c.cvec), c.cid) AS rn
        FROM vecs x, c{N_ITER} c) WHERE rn = 1
    ),
    scored AS (
      SELECT pcodes.vec_id,
             CAST(sum(CAST(l.d2 AS DECIMAL(18,6))) AS DOUBLE) AS approx_d2
      FROM pcodes
      JOIN assigned a ON a.vec_id = pcodes.vec_id
      JOIN probe p ON p.cid = a.cid
      JOIN plut l ON l.m = pcodes.m AND l.k = pcodes.k
      WHERE pcodes.vec_id <> {query_vec_id}
      GROUP BY pcodes.vec_id
    )"""
    )
    return (
        "WITH "
        + ",".join(cte)
        + f"""
    SELECT vec_id, approx_d2, CAST(rnk AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY approx_d2, vec_id) AS rnk
      FROM scored) WHERE rnk <= {k}
    """
    )


__all__ = [
    "ivfpq_topk",
    "ivfpq_index_write",
    "ivfpq_topk_from_index",
    "oracle_ivfpq_sql",
    "train_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "adc_lut",
    "oracle_pq_sql",
    "SUB_M",
    "K_CODE",
    "PQ_ITER",
]
