"""Round-14 catalog additions (SURVEY.md §2B growth).

Families this round:

- Media served FROM crawl containers (s20_warc_image_decode,
  s20_warc_audio_decode) — the round-13 verdict's #4: every l5 codec
  decoded from ``synthesize_media_encoded``, never from WARC payload
  bytes, so the join of the container family and the multimodal
  family was unproven.  The WARC fixture now carries real BMP/WAV
  response members (sources/warc.py BMP_MOD/WAV_MOD grids, payload
  formulas identical to the synthesized media corpus), and these
  entries compose s20 container bytes → l5 codec decode → stats with
  the same closed-form oracles the l5 entries pin.
- Streaming crawl ingest (s24_crawl_stream_ingest) — the round-13
  verdict's #3: a real Structured Streaming replay of the container
  directory through the batch funnel's shared stages into an
  S7-idempotent manifest-committed store (streaming/crawl.py).
- Time-series rollups the metrics backends ship (ts26 LOCF
  time-weighted average, ts29 Prometheus-style reset-aware counter
  rate) — exact integer cents/µs moments, day-partitioned windows.
- Ranking/agreement statistics for eval pipelines (ml28 tie-corrected
  Spearman ρ, ml29 NDCG@10 with literal-baked discount gains, ml30
  Cohen's kappa) — every oracle-compared value exact-int or an
  identically-shaped double expression.
- Storage: s25 position-delete merge-on-read (the Iceberg v2
  delete-vector shape via ``_metadata.row_index``).
- Multimodal: l5_video_scene_cut (shot segmentation over really
  decoded MJPEG frames).
- Serving-index CRUD completion: l3_ann_ivf_index_delete (erasure
  without retrain, operators/ivf.py::ivf_index_delete).
- Graphs: g14_adamic_adar (rarity-weighted link prediction on the
  degree-capped wedge graph, weights literal-baked — no cross-engine
  ln).

Reference analogue: R9 container decode
(processor/processor_app.py:150-155) — pcap-side, same
bytes-in-container → typed-records shape; R27/R28 metric extraction
and dashboard rollups are the ts26/ts29 consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.tables import load_table

_t = load_table


# ---------------------------------------------------------------------------
# S20 × L5: typed media decode straight from container payload bytes
# ---------------------------------------------------------------------------


def _s20img_oracle() -> str:
    from chronicle_sniffer_spark.sources.warc import BMP_MOD

    return f"""
    SELECT doc_id AS media_id,
           CAST(16 + (doc_id % 8) * 4 AS INTEGER) AS width,
           CAST(16 + (doc_id % 5) * 4 AS INTEGER) AS height,
           CAST((16 + (doc_id % 8) * 4) * (16 + (doc_id % 5) * 4) AS BIGINT)
             AS n_pixels,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
    FROM documents WHERE doc_id % {BMP_MOD} = 0
"""


@query("s20_warc_image_decode", section="S2/L5", oracle=_s20img_oracle())
def s20_warc_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode FROM THE CRAWL CONTAINER — container bytes →
    WARC member split → ``image/bmp`` responses → real BMP pixel
    decode → per-image channel means, one composed plan.  The fixture
    members' payload bytes are the synthesize_media_encoded image
    formula verbatim (sources/warc.py: _bmp_payload), so the oracle
    pins dimensions, pixel counts, and channel means in closed form
    from doc_id: any byte damage in the gzip walk, HTTP payload
    slicing, Arrow binary transport, or BMP decode (row padding, BGR
    order, bottom-up rows) hash-fails.

    Spark shapes: binaryFile scan → per-file member decode → a
    content_type filter (media payloads skip the charset decoder
    entirely — the scan gates text decode on ``text/*``) → the l5
    Arrow-batched BMP decoder; only small stats leave the stage,
    payload bytes never shuffle; ZERO shuffles end-to-end."""
    from chronicle_sniffer_spark.operators.multimodal import image_stats
    from chronicle_sniffer_spark.plans.round12 import _warc_dir
    from chronicle_sniffer_spark.sources.warc import read_warc

    recs = read_warc(spark, _warc_dir(spark, sf_dir))
    imgs = recs.filter(F.col("content_type") == "image/bmp").select(
        F.regexp_extract("target_uri", r"/img/(\d+)$", 1)
        .cast("bigint")
        .alias("media_id"),
        F.lit("image").alias("kind"),
        "payload",
    )
    return image_stats(imgs)


# ---------------------------------------------------------------------------
# S24: streaming crawl ingest (file-arrival-driven funnel front half)
# ---------------------------------------------------------------------------

S24_SHARDS = 8
S24_FILES_PER_TRIGGER = 8  # several micro-batches per run, not one big gulp

# (applicationId, sf_dir) -> committed crawl-table dir: the stream runs
# ONCE per session+sf (AvailableNow over the fixture containers); every
# consumer after that reads the manifest-committed table.
_STREAM_CACHE: dict[tuple[str, str], str] = {}


def _stream_table(spark: SparkSession, sf_dir: str) -> str:
    from chronicle_sniffer_spark.plans.round12 import _warc_dir
    from chronicle_sniffer_spark.streaming.crawl import stream_crawl_ingest
    from chronicle_sniffer_spark.tables import session_tmpdir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STREAM_CACHE:
        table = session_tmpdir("css_crawltab_")
        ckpt = session_tmpdir("css_crawlckpt_")
        stream_crawl_ingest(
            spark,
            _warc_dir(spark, sf_dir),
            table,
            ckpt,
            max_files_per_trigger=S24_FILES_PER_TRIGGER,
        )
        _STREAM_CACHE[key] = table
    return _STREAM_CACHE[key]


def _s24_oracle() -> str:
    from chronicle_sniffer_spark.plans.quality import (
        MAX_SYMBOL_RATIO,
        MEAN_WL_HI,
        MEAN_WL_LO,
        MIN_WORDS,
    )
    from chronicle_sniffer_spark.plans.round11 import _block_cte

    return f"""
    {_block_cte()},
    agg AS (
      SELECT doc_id,
             string_agg(CASE WHEN kept THEN text END, ' ' ORDER BY pos) AS text
      FROM nonempty GROUP BY doc_id
    ),
    ext AS (
      SELECT c.doc_id, coalesce(a.text, '') AS text
      FROM clean c LEFT JOIN agg a ON a.doc_id = c.doc_id
    ),
    sig AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             len(string_split(text, ' ')) AS n_words,
             round(length(regexp_replace(text, ' ', '', 'g')) * 1.0
                   / len(string_split(text, ' ')), 6) AS mean_word_len,
             round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0
                   / length(text), 6) AS symbol_ratio
      FROM ext
    ),
    s2 AS (SELECT * FROM sig
           WHERE n_words >= {MIN_WORDS}
             AND mean_word_len BETWEEN {MEAN_WL_LO} AND {MEAN_WL_HI}
             AND symbol_ratio < {MAX_SYMBOL_RATIO})
    SELECT CAST(doc_id % {S24_SHARDS} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT))
             AS BIGINT) AS text_check
    FROM s2 GROUP BY 1
"""


@query("s24_crawl_stream_ingest", section="S2/T", oracle=_s24_oracle())
def s24_crawl_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING crawl ingest — the file-arrival-driven twin the
    round-13 verdict named as the last composition gap between the
    repo's two halves (reference: the whole architecture is
    file-arrival-driven, ``sniffer_entrypoint.sh:156-207``): a REAL
    Structured Streaming query (``readStream`` binaryFile source,
    ``Trigger.AvailableNow``, {FPT} files per micro-batch) replays the
    WARC directory through the SAME decode → extract → C4-gate stages
    the batch funnel runs (streaming/crawl.py shares the code, not a
    reimplementation), MERGE-ing each batch into a manifest-committed
    bucket store keyed by container file — idempotent under
    re-delivery by construction (a bucket's content is a deterministic
    function of its containers; the S7 contract, pytest-driven).

    This entry then aggregates the COMMITTED table per doc_id shard:
    doc counts, token sums, and an order-free md5-prefix checksum of
    every surviving text — so the oracle (which recomputes extraction
    and gate from the documents table in SQL) hash-pins the streamed
    corpus content itself, not just its row count.  Stream ≡ batch is
    additionally pytest-asserted row-for-row against the batch path.

    Spark shapes: per-micro-batch work is the batch funnel's front
    half (member decode at the DAG edge, codegen extraction/gate) +
    a bucket-pruned anti-join MERGE; the post-stream read is a
    manifest-resolved parquet scan + one shard-keyed agg."""
    from chronicle_sniffer_spark.streaming.crawl import read_crawl_table

    t = read_crawl_table(spark, _stream_table(spark, sf_dir))
    return t.groupBy(
        (F.col("doc_id") % S24_SHARDS).cast("bigint").alias("shard")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(
            F.conv(
                F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("text_check"),
    )


s24_crawl_stream_ingest.__doc__ = s24_crawl_stream_ingest.__doc__.format(
    FPT=S24_FILES_PER_TRIGGER
)


def _s20aud_oracle() -> str:
    from chronicle_sniffer_spark.sources.warc import WAV_MOD

    return f"""
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(800 + (doc_id % 5) * 400 AS BIGINT) AS n_samples,
           CAST((800 + (doc_id % 5) * 400) / 8 AS INTEGER) AS duration_ms,
           CAST(1000 + (doc_id % 20) * 100 AS DOUBLE) AS rms,
           CAST(0.0 AS DOUBLE) AS mean
    FROM documents WHERE doc_id % {WAV_MOD} = 0
"""


@query("s20_warc_audio_decode", section="S2/L5", oracle=_s20aud_oracle())
def s20_warc_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode FROM THE CRAWL CONTAINER — the audio twin of
    s20_warc_image_decode: ``audio/wav`` responses → real PCM16 WAV
    decode → sample counts / duration / RMS / mean.  The square-wave
    payloads (alternating ±A) make RMS exactly A and mean exactly 0,
    both closed-form from doc_id (sources/warc.py: _wav_payload ≡ the
    synthesize_media_encoded audio formula), so the oracle checks the
    whole byte path end-to-end.

    Same zero-shuffle shape as the image twin; WAV bytes pass the
    charset decoder untouched (content-type gate)."""
    from chronicle_sniffer_spark.operators.multimodal import audio_stats
    from chronicle_sniffer_spark.plans.round12 import _warc_dir
    from chronicle_sniffer_spark.sources.warc import read_warc

    recs = read_warc(spark, _warc_dir(spark, sf_dir))
    auds = recs.filter(F.col("content_type") == "audio/wav").select(
        F.regexp_extract("target_uri", r"/aud/(\d+)$", 1)
        .cast("bigint")
        .alias("media_id"),
        F.lit("audio").alias("kind"),
        "payload",
    )
    return audio_stats(auds)


# ---------------------------------------------------------------------------
# TS26: time-weighted average (LOCF) — the hypertable rollup for irregular
# samples
# ---------------------------------------------------------------------------

_TS26_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
seg AS (
  SELECT event_type, day, cents, ts_us,
         lead(ts_us) OVER (PARTITION BY event_type, day
                           ORDER BY ts_us, event_id) AS next_us
  FROM e
)
SELECT event_type, day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN next_us IS NOT NULL
                     THEN cents * (next_us - ts_us) END) AS BIGINT)
         AS num_cent_us,
       CAST(sum(CASE WHEN next_us IS NOT NULL
                     THEN next_us - ts_us END) AS BIGINT) AS den_us,
       CASE WHEN sum(CASE WHEN next_us IS NOT NULL
                          THEN next_us - ts_us END) > 0
            THEN CAST(sum(CASE WHEN next_us IS NOT NULL
                               THEN cents * (next_us - ts_us) END) AS DOUBLE)
                 / CAST(sum(CASE WHEN next_us IS NOT NULL
                                 THEN next_us - ts_us END) AS DOUBLE) / 100.0
       END AS twa
FROM seg GROUP BY 1, 2
"""


@query("ts26_time_weighted_avg", section="TS", oracle=_TS26_ORACLE)
def ts26_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    ``time_weight('LOCF')`` hypertable rollup): within each
    (series, day), each observation's value holds until the next one,
    and the average weights every value by its holding duration —
    the correct mean for irregularly-sampled gauges, where the plain
    ``avg`` over-counts busy periods.

    Exactness: values quantized to integer cents, durations in integer
    microseconds; the weighted numerator Σ cents·Δt_us stays within
    int64 (cents ≤ ~10⁵, Σ Δt_us ≤ 86.4e9 per day-partition), so both
    engines sum exactly and the final division is one identical
    int64→double op per group ([[cross-engine-float-gotchas]]).

    Scale shape: one ``lead`` window per (event_type, day) partition —
    high-cardinality key, partitions are day-sized regardless of total
    volume — then one map-side-combinable hash aggregate.  No global
    window, no driver state; survives 100× by adding partitions, not
    partition depth."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("timestamp").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "day").orderBy("ts_us", "event_id")
    seg = e.select(
        "event_type",
        "day",
        "cents",
        "ts_us",
        F.lead("ts_us").over(w).alias("next_us"),
    )
    dt = F.when(
        F.col("next_us").isNotNull(), F.col("next_us") - F.col("ts_us")
    )
    num = F.sum(F.col("cents") * dt).cast("bigint")
    den = F.sum(dt).cast("bigint")
    return seg.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        num.alias("num_cent_us"),
        den.alias("den_us"),
        F.when(
            den > 0,
            num.cast("double") / den.cast("double") / 100.0,
        ).alias("twa"),
    )


# ---------------------------------------------------------------------------
# ML28: Spearman rank correlation (tie-corrected, per series-day)
# ---------------------------------------------------------------------------

_ML28_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, day,
         -- 2x the tie-averaged rank of the value: 2*min_rank + ties - 1
         CAST(2 * rank() OVER (PARTITION BY event_type, day ORDER BY cents)
              + count(*) OVER (PARTITION BY event_type, day, cents) - 1
              AS BIGINT) AS x2,
         -- time order is unique under (ts_us, event_id): 2*row_number
         CAST(2 * row_number() OVER (PARTITION BY event_type, day
                                     ORDER BY ts_us, event_id)
              AS BIGINT) AS y2
  FROM e
),
s AS (
  SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x2) AS BIGINT) AS sx,
         CAST(sum(y2) AS BIGINT) AS sy,
         CAST(sum(x2 * y2) AS BIGINT) AS sxy,
         CAST(sum(x2 * x2) AS BIGINT) AS sxx,
         CAST(sum(y2 * y2) AS BIGINT) AS syy
  FROM r GROUP BY 1, 2
)
SELECT event_type, day, n,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
       END AS rho
FROM s
"""


@query("ml28_spearman_rho", section="ML3", oracle=_ML28_ORACLE)
def ml28_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between value and time
    order within each (series, day) — "is this gauge trending within
    the day?" as a distribution-free statistic (Pearson on average
    ranks, the exact textbook estimator under ties).

    Exactness: ranks are doubled to keep tie-averages integral
    (2·avg_rank = 2·min_rank + ties − 1), every moment sum (Σx², Σxy…)
    is an exact int64 (x ≤ 2n with day-partition n), and the final ρ
    is computed from those int64s through an IDENTICALLY-shaped double
    expression in both engines — int64→double casts are correctly
    rounded and the op sequence matches term for term, so the doubles
    are bit-identical ([[cross-engine-float-gotchas]]).

    Scale shape: two windows over the same high-cardinality
    (event_type, day) partitioning (one rank, one row_number — a
    single sort each, day-bounded partitions) and one hash aggregate.
    The repo's ml27 lesson applied up front: no global or
    near-global-cardinality window anywhere."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("timestamp").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wv = Window.partitionBy("event_type", "day").orderBy("cents")
    wt = Window.partitionBy("event_type", "day", "cents")
    wy = Window.partitionBy("event_type", "day").orderBy("ts_us", "event_id")
    r = e.select(
        "event_type",
        "day",
        (2 * F.rank().over(wv) + F.count("*").over(wt) - 1)
        .cast("bigint")
        .alias("x2"),
        (2 * F.row_number().over(wy)).cast("bigint").alias("y2"),
    )
    s = r.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x2").cast("bigint").alias("sx"),
        F.sum("y2").cast("bigint").alias("sy"),
        F.sum(F.col("x2") * F.col("y2")).cast("bigint").alias("sxy"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).cast("bigint").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    cov = d("n") * d("sxy") - d("sx") * d("sy")
    return s.select(
        "event_type",
        "day",
        "n",
        F.when(
            (varx > 0) & (vary > 0),
            cov / F.sqrt(varx) / F.sqrt(vary),
        ).alias("rho"),
    )


# ---------------------------------------------------------------------------
# ML29: NDCG@10 ranking evaluation (graded relevance, per query group)
# ---------------------------------------------------------------------------

# Gain table in integer picos, precomputed once in Python and inlined as
# LITERALS into BOTH engines: (2^rel − 1)/log2(pos+1) is a libm
# expression, and log2's last ulp is NOT guaranteed identical across
# the JVM and DuckDB's C runtime — baking the 40 possible (rel∈0..3,
# pos∈1..10) values as int64 picos makes the discounted sums exact
# integer arithmetic everywhere ([[cross-engine-float-gotchas]]).
import math as _math

_NDCG_K = 10
_NDCG_GAIN_PICOS = [
    _math.floor(((1 << r) - 1) / _math.log2(p + 1) * 1e12)
    for r in range(4)
    for p in range(1, _NDCG_K + 1)
]


def _ml29_oracle() -> str:
    gains = ", ".join(str(g) for g in _NDCG_GAIN_PICOS)
    return f"""
    WITH e AS (
      SELECT user_id, event_id, value,
             CAST(event_id % 4 AS BIGINT) AS rel
      FROM events
    ),
    r AS (
      SELECT user_id, rel,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn_d,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY rel DESC, event_id) AS rn_i
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN rn_d <= {_NDCG_K}
                 THEN [{gains}][CAST(rel * {_NDCG_K} + rn_d AS INTEGER)]
                 ELSE 0 END) AS BIGINT) AS dcg_picos,
           CAST(sum(CASE WHEN rn_i <= {_NDCG_K}
                 THEN [{gains}][CAST(rel * {_NDCG_K} + rn_i AS INTEGER)]
                 ELSE 0 END) AS BIGINT) AS idcg_picos,
           CASE WHEN sum(CASE WHEN rn_i <= {_NDCG_K}
                     THEN [{gains}][CAST(rel * {_NDCG_K} + rn_i AS INTEGER)]
                     ELSE 0 END) > 0
                THEN CAST(sum(CASE WHEN rn_d <= {_NDCG_K}
                          THEN [{gains}][CAST(rel * {_NDCG_K} + rn_d AS INTEGER)]
                          ELSE 0 END) AS DOUBLE)
                     / CAST(sum(CASE WHEN rn_i <= {_NDCG_K}
                            THEN [{gains}][CAST(rel * {_NDCG_K} + rn_i AS INTEGER)]
                            ELSE 0 END) AS DOUBLE)
           END AS ndcg
    FROM r GROUP BY user_id
"""


@query("ml29_ndcg_eval", section="ML3", oracle=_ml29_oracle())
def ml29_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 with graded relevance per query group (user): the
    standard ranking-quality metric for retrieval / recommender eval —
    discounted cumulative gain of the SCORE-ordered list against the
    ideal RELEVANCE-ordered list.  Relevance grades are the
    deterministic ``event_id % 4`` (0..3); scores are ``value``.

    Exactness: the 40 possible discount terms are precomputed in
    Python as int64 picos and inlined as literals into both engines
    (see the module note — log2's last ulp is not a cross-engine
    contract), so DCG/IDCG are exact integer sums and NDCG is one
    identical int64→double division.

    Scale shape: both rankings come from two window functions over the
    SAME high-cardinality user_id partitioning — one shuffle, two
    group-bounded sorts — then a single hash aggregate; gain
    lookup is ``element_at`` on a 40-element literal array (pure
    codegen, no lambda, no join).  Output is O(users)."""
    from pyspark.sql import Window

    gains = F.array(*[F.lit(g) for g in _NDCG_GAIN_PICOS])
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        (F.col("event_id") % 4).cast("bigint").alias("rel"),
    )
    wd = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    wi = Window.partitionBy("user_id").orderBy(
        F.col("rel").desc(), "event_id"
    )
    r = e.select(
        "user_id",
        "rel",
        F.row_number().over(wd).alias("rn_d"),
        F.row_number().over(wi).alias("rn_i"),
    )
    gain = lambda rn: F.when(  # noqa: E731
        F.col(rn) <= _NDCG_K,
        F.element_at(
            gains, (F.col("rel") * _NDCG_K + F.col(rn)).cast("int")
        ),
    ).otherwise(F.lit(0))
    dcg = F.sum(gain("rn_d")).cast("bigint")
    idcg = F.sum(gain("rn_i")).cast("bigint")
    return r.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        dcg.alias("dcg_picos"),
        idcg.alias("idcg_picos"),
        F.when(
            idcg > 0, dcg.cast("double") / idcg.cast("double")
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# ML30: Cohen's kappa — inter-annotator agreement (labeling QA)
# ---------------------------------------------------------------------------

_ML30_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST((event_id * 7) % 3 AS BIGINT) AS a,
         CAST(((event_id * 7) + CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END)
              % 3 AS BIGINT) AS b
  FROM events
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na0,
         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na1,
         CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS na2,
         CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb0,
         CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb1,
         CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nb2
  FROM e GROUP BY 1
)
SELECT event_type, n, agree,
       CAST(na0 * nb0 + na1 * nb1 + na2 * nb2 AS BIGINT) AS pe_num,
       CASE WHEN n * n - (na0 * nb0 + na1 * nb1 + na2 * nb2) > 0
            THEN CAST(n * agree - (na0 * nb0 + na1 * nb1 + na2 * nb2)
                   AS DOUBLE)
                 / CAST(n * n - (na0 * nb0 + na1 * nb1 + na2 * nb2)
                   AS DOUBLE)
       END AS kappa
FROM s
"""


@query("ml30_cohens_kappa", section="ML3", oracle=_ML30_ORACLE)
def ml30_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement, the
    labeling-QA statistic every human-annotation pipeline reports
    before labels feed training.  Two deterministic synthetic raters
    over 3 classes (the second disagrees on every 5th item).

    Exactness: κ = (n·agree − Σ_k na_k·nb_k) / (n² − Σ_k na_k·nb_k) is
    computed entirely from int64 counts — numerator and denominator
    are EXACT integers (n² fits int64 through sf100 per-type volumes),
    and the only float op is the final division, identical in both
    engines.

    Scale shape: ONE map-side-combinable hash aggregate produces all
    eight counts (agreement + both marginals via conditional sums — no
    pivot, no self-join); κ is a projection over the group row.
    O(series) output, a single shuffle of 8 longs per series."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        ((F.col("event_id") * 7) % 3).cast("bigint").alias("a"),
        (
            (
                F.col("event_id") * 7
                + F.when(F.col("event_id") % 5 == 0, 1).otherwise(0)
            )
            % 3
        )
        .cast("bigint")
        .alias("b"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    s = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        cnt(F.col("a") == F.col("b")).alias("agree"),
        *[cnt(F.col("a") == k).alias(f"na{k}") for k in range(3)],
        *[cnt(F.col("b") == k).alias(f"nb{k}") for k in range(3)],
    )
    pe = (
        F.col("na0") * F.col("nb0")
        + F.col("na1") * F.col("nb1")
        + F.col("na2") * F.col("nb2")
    )
    den = F.col("n") * F.col("n") - pe
    num = F.col("n") * F.col("agree") - pe
    return s.select(
        "event_type",
        "n",
        "agree",
        pe.cast("bigint").alias("pe_num"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "kappa"
        ),
    )


# ---------------------------------------------------------------------------
# S25: position-delete merge-on-read (the Iceberg v2 delete-vector shape)
# ---------------------------------------------------------------------------

# (applicationId, sf_dir) -> staged multi-file base table directory
_S25_CACHE: dict[tuple[str, str], str] = {}
_S25_FILES = 8
_S25_DEL_MOD = 17  # rows with o_orderkey % 17 == 3 get position-deleted


def _s25_base_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per session+sf) orders as a MULTI-file parquet base
    table — position deletes address (file, row_index), so the base
    must actually have several files for the addressing to be
    exercised."""
    from chronicle_sniffer_spark.tables import session_tmpdir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _S25_CACHE:
        out = session_tmpdir("css_s25_base_")
        (
            _t(spark, sf_dir, "orders")
            .repartition(_S25_FILES, "o_orderkey")
            .write.mode("overwrite")
            .parquet(out)
        )
        _S25_CACHE[key] = out
    return _S25_CACHE[key]


_S25_ORACLE = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_live,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
WHERE NOT (o_orderkey % {_S25_DEL_MOD} = 3)
GROUP BY 1
"""


@query("s25_position_deletes", section="S8", oracle=_S25_ORACLE)
def s25_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-delete merge-on-read — the Iceberg v2 / Delta
    deletion-vector shape, complementing the repo's key-based MOR
    (`j16_merge_on_read`): deletes are addressed by PHYSICAL POSITION
    ``(data_file, row_index)``, not by key, so a writer can delete
    rows it never read the keys of (the engine-side output of a
    MERGE/DELETE planning pass).

    The entry stages orders as a real multi-file base table, derives a
    delete vector for ``o_orderkey % 17 == 3`` rows AS (file_name,
    row_index) pairs via the parquet scanner's ``_metadata.row_index``
    column, then serves the table merge-on-read: base scan ⟶ anti-join
    on the position pair ⟶ aggregate.  The oracle recomputes from the
    LOGICAL predicate — if the scanner's row indexing, the file
    attribution, or the anti-join drop the wrong physical rows, the
    per-status counts and cent-exact sums hash-fail.

    Scale shape: the delete vector is O(deleted rows) and groups by
    the same file the scan task reads — at production scale it is a
    per-file roaring bitmap applied INSIDE the scan (Iceberg's
    ``_deleted`` metadata column); here the anti-join is left to AQE,
    which broadcasts while the vector is small and shuffle-joins when
    it is not (no unconditional broadcast hint — the g13 lesson).
    Aggregation is one map-side-combinable hash agg."""
    base_dir = _s25_base_dir(spark, sf_dir)
    base = spark.read.parquet(base_dir).select(
        F.col("_metadata.file_name").alias("dv_file"),
        F.col("_metadata.row_index").alias("dv_pos"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
    )
    dv = (
        spark.read.parquet(base_dir)
        .filter(F.col("o_orderkey") % _S25_DEL_MOD == 3)
        .select(
            F.col("_metadata.file_name").alias("dv_file"),
            F.col("_metadata.row_index").alias("dv_pos"),
        )
    )
    live = base.join(dv, ["dv_file", "dv_pos"], "left_anti")
    return live.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_live"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# L5: scene-cut detection over real decoded video frames
# ---------------------------------------------------------------------------

_SCENE_CUT_T = 100  # mean-luma jump that counts as a shot boundary

_L5SC_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT))) AS f
  FROM documents WHERE doc_id % 3 = 2
),
d AS (
  SELECT doc_id,
         abs(2 * ((doc_id * 7 + (f + 1) * 11) % 128)
             - 2 * ((doc_id * 7 + f * 11) % 128)) AS diff
  FROM f
)
SELECT doc_id AS media_id,
       CAST(2 + doc_id % 4 AS INTEGER) AS n_frames,
       CAST(sum(CASE WHEN diff >= {_SCENE_CUT_T} THEN 1 ELSE 0 END)
         AS INTEGER) AS n_cuts,
       CAST(max(diff) AS BIGINT) AS max_diff,
       CAST(sum(diff) AS BIGINT) AS sum_diff
FROM d GROUP BY doc_id
"""


@query("l5_video_scene_cut", section="L5", oracle=_L5SC_ORACLE)
def l5_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut (shot boundary) detection, oracle-checked through
    bytes: every frame of every Motion-JPEG video is REALLY decoded
    (MP4 sample walk + baseline JPEG), consecutive-frame mean-luma
    jumps ≥ {T} are cuts — the frame-differencing segmenter a video
    curation pipeline runs so training frames are sampled per SHOT,
    not per duplicate-heavy timestamp.  The synthesized frames step by
    22 gray levels mod 256 except at the mod-128 wrap (|Δ| = 234), so
    cut positions, max and sum of |Δ| are all closed-form from doc_id
    — a decode that drops, reorders, or mis-decodes ANY frame
    hash-fails.

    Scale shape: same as every l5 codec — Arrow-batched decode at the
    DAG edge after an id-spread, payloads never shuffle, O(videos)
    output rows."""
    from chronicle_sniffer_spark.operators.multimodal import (
        synthesize_mjpeg_video_corpus,
        video_scene_cuts,
    )

    return video_scene_cuts(
        synthesize_mjpeg_video_corpus(_t(spark, sf_dir, "documents")),
        threshold=_SCENE_CUT_T,
    )


l5_video_scene_cut.__doc__ = l5_video_scene_cut.__doc__.format(T=_SCENE_CUT_T)


# ---------------------------------------------------------------------------
# L3: IVF index DELETE — the third leg of serving-index CRUD
# ---------------------------------------------------------------------------

# Vectors erased after the index was built and served.  The centroid
# model stays trained on the FULL corpus (delete-without-retrain), so
# the oracle trains on everything and restricts only the SCORED set.
_IVF_DELETE_WHERE = "vec_id % 7 = 3"

_IVF_DELETE_CACHE: dict[tuple[str, str], str] = {}


def _ivf_deleted_index_dir(spark: SparkSession, sf_dir: str) -> str:
    from chronicle_sniffer_spark.operators.ivf import (
        ivf_index_delete,
        ivf_index_write,
    )
    from chronicle_sniffer_spark.tables import session_tmpdir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_DELETE_CACHE:
        out = session_tmpdir("css_ivf_del_")
        emb = _t(spark, sf_dir, "embeddings")
        ivf_index_write(emb, out)
        ivf_index_delete(
            spark, out, emb.filter(F.expr(_IVF_DELETE_WHERE))
        )
        _IVF_DELETE_CACHE[key] = out
    return _IVF_DELETE_CACHE[key]


def _ivf_delete_oracle() -> str:
    from chronicle_sniffer_spark.operators.ivf import oracle_ivf_sql
    from chronicle_sniffer_spark.plans.dedup_sim import ANN_K, ANN_QUERY_VEC

    return oracle_ivf_sql(
        ANN_QUERY_VEC, ANN_K, score_where=f"NOT ({_IVF_DELETE_WHERE})"
    )


@query("l3_ann_ivf_index_delete", section="L3", oracle=_ivf_delete_oracle())
def l3_ann_ivf_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving after TARGETED DELETES — the erasure path (GDPR
    takedown, expired documents) that completes the index CRUD next to
    rebuild and delta-upsert: the index is built on the full corpus,
    then every ``vec_id % 7 == 3`` vector is deleted via
    `operators/ivf.py::ivf_index_delete` — only the cells holding a
    deleted id are rewritten (write-once epoch dir), drained cells
    leave the bucket map in the SAME atomic manifest flip, and the
    centroid model is untouched (delete-without-retrain).  The probe
    then must return exactly the top-k over the SURVIVORS: a stale
    path, a cell that kept a deleted row, or an over-deleted neighbor
    all hash-fail against the unrolled-Lloyd oracle (trained on the
    full corpus, scored with the delete predicate inverted).

    Scale shape: delete cost is O(touched cells' rows) + one manifest
    flip; untouched cells' files are never listed or read
    (pytest-asserted byte-identity), and the probe stays
    partition-pruned manifest path resolution."""
    from chronicle_sniffer_spark.operators.ivf import ivf_topk_from_index
    from chronicle_sniffer_spark.plans.dedup_sim import ANN_K, ANN_QUERY_VEC

    emb = _t(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == ANN_QUERY_VEC)
        .select("embedding")
        .collect()
    )
    qv = [float(x) for x in qrow[0][0]]
    return ivf_topk_from_index(
        spark,
        _ivf_deleted_index_dir(spark, sf_dir),
        qv,
        ANN_K,
        exclude_vec_id=ANN_QUERY_VEC,
    )


# ---------------------------------------------------------------------------
# TS29: reset-aware counter rate (the Prometheus rate()/increase() shape)
# ---------------------------------------------------------------------------

_TS29_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT event_type, day, ts_us, cents,
         cents - lag(cents) OVER (PARTITION BY event_type, day
                                  ORDER BY ts_us, event_id) AS delta
  FROM e
)
SELECT event_type, day,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN delta IS NULL THEN 0
                     WHEN delta >= 0 THEN delta
                     ELSE cents END) AS BIGINT) AS increase_cents,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
       CASE WHEN max(ts_us) > min(ts_us)
            THEN CAST(sum(CASE WHEN delta IS NULL THEN 0
                               WHEN delta >= 0 THEN delta
                               ELSE cents END) AS DOUBLE)
                 / CAST(max(ts_us) - min(ts_us) AS DOUBLE)
                 * 1000000.0 / 100.0
       END AS rate_per_sec
FROM d GROUP BY 1, 2
"""


@query("ts29_counter_rate", section="TS", oracle=_TS29_ORACLE)
def ts29_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter rate — the Prometheus ``increase()`` /
    ``rate()`` semantics every metrics backend implements: consecutive
    deltas within a (series, day) window accumulate when non-negative;
    a NEGATIVE delta means the counter restarted from zero, so the
    post-reset VALUE (not the delta) is the increase contribution.
    Naive last−first silently under-counts every restart; summing raw
    deltas goes negative — this is the correct estimator and a real
    monitoring-pipeline operator (reference analogue: R27's
    log-metric extraction feeds exactly this rollup).

    Exactness: integer cents and microseconds end-to-end; the only
    float ops are the final division chain, identically shaped in
    both engines ([[cross-engine-float-gotchas]]).

    Scale shape: one lag window per high-cardinality (event_type,
    day) partition + one hash aggregate — the ts26 shape; survives
    100× by adding partitions, not depth."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("timestamp").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts_us", "event_id")
    d = e.select(
        "event_type",
        "day",
        "ts_us",
        "cents",
        (F.col("cents") - F.lag("cents").over(w)).alias("delta"),
    )
    contrib = (
        F.when(F.col("delta").isNull(), F.lit(0))
        .when(F.col("delta") >= 0, F.col("delta"))
        .otherwise(F.col("cents"))
    )
    inc = F.sum(contrib).cast("bigint")
    span = (F.max("ts_us") - F.min("ts_us")).cast("bigint")
    return d.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        inc.alias("increase_cents"),
        span.alias("span_us"),
        F.when(
            F.max("ts_us") > F.min("ts_us"),
            inc.cast("double") / span.cast("double") * 1000000.0 / 100.0,
        ).alias("rate_per_sec"),
    )


# ---------------------------------------------------------------------------
# G14: Adamic–Adar link prediction (rare-neighbor-weighted common neighbors)
# ---------------------------------------------------------------------------

G14_TOPK = 25
G14_DEG_CAP = 16  # the g13 wedge cap, reused: ≤ C(16,2) wedges per customer

# 1/ln(capped customer degree) in integer picos, degree ∈ 2..CAP —
# only 15 possible values after the cap, so the weights are baked in
# Python and inlined as LITERALS into both engines (the ml29 move: ln's
# last ulp is not a cross-engine contract, a 15-entry integer table is).
import math as _g14math

_G14_W_PICOS = [
    _g14math.floor(1e12 / _g14math.log(d)) for d in range(2, G14_DEG_CAP + 1)
]


def _g14_oracle() -> str:
    w = ", ".join(str(x) for x in _G14_W_PICOS)
    return f"""
    WITH e AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    capped AS (
      SELECT s, c FROM (
        SELECT s, c, row_number() OVER (PARTITION BY c ORDER BY s) AS rn
        FROM e) WHERE rn <= {G14_DEG_CAP}
    ),
    cw AS (
      SELECT s, c,
             [{w}][CAST(count(*) OVER (PARTITION BY c) AS INTEGER) - 1]
               AS w_picos,
             count(*) OVER (PARTITION BY c) AS cdeg
      FROM capped
    ),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(a.w_picos) AS BIGINT) AS aa_picos
      FROM cw a JOIN cw b ON a.c = b.c AND a.s < b.s
      WHERE a.cdeg >= 2
      GROUP BY 1, 2
    )
    SELECT s1, s2, n_common, aa_picos,
           CAST(aa_picos AS DOUBLE) / 1e12 AS aa_score
    FROM pairs
    ORDER BY aa_picos DESC, s1, s2 LIMIT {G14_TOPK}
"""


@query("g14_adamic_adar", section="G2", oracle=_g14_oracle())
def g14_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction on the supplier–customer bipartite
    graph: common neighbors weighted by rarity, score(a,b) =
    Σ_{{c ∈ N(a)∩N(b)}} 1/ln(deg(c)) — sharing a two-supplier niche
    customer says far more than sharing a hub, the refinement over
    g13's unweighted count (Adamic & Adar 2003, the strongest simple
    baseline in the Liben-Nowell/Kleinberg link-prediction study).

    Semantics are declared ON THE DEGREE-CAPPED GRAPH in BOTH engines
    (each customer contributes wedges among its {CAP} smallest
    suppliers — the identical rank truncation in the oracle), so the
    score is exact for what it claims, and the wedge join is bounded
    at C({CAP},2) rows per customer instead of Σ deg² — the g13
    filter's cap, here as the declared estimand (its recall exposure
    is already quantified corpus-wide by g13_degree_cap_audit).

    Exactness: weights are a 15-entry integer-pico table (capped
    degree ∈ 2..{CAP}) baked in Python and inlined into both engines —
    the per-pair score is an exact int64 sum, ordering and the top-k
    cut are integer-deterministic, and the emitted double is one
    int64→1e12 division.

    Scale shapes: the weight attaches per (customer) via the SAME
    window partitioning the cap uses (no extra exchange); the wedge
    join ships capped edges only; one hash aggregate per pair; top-k
    is a TakeOrdered, never a global sort materialization."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    wpart = W.partitionBy("c")
    capped = (
        e.withColumn("rn", F.row_number().over(wpart.orderBy("s")))
        .filter(F.col("rn") <= G14_DEG_CAP)
        .select("s", "c")
    )
    weights = F.array(*[F.lit(x) for x in _G14_W_PICOS])
    cw = capped.select(
        "s",
        "c",
        F.element_at(
            weights, F.count("*").over(wpart).cast("int") - 1
        ).alias("w_picos"),
        F.count("*").over(wpart).alias("cdeg"),
    ).filter(F.col("cdeg") >= 2)
    pairs = (
        cw.select(F.col("s").alias("s1"), "c", "w_picos")
        .join(cw.select(F.col("s").alias("s2"), "c"), "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.sum("w_picos").cast("bigint").alias("aa_picos"),
        )
    )
    return (
        pairs.select(
            "s1",
            "s2",
            "n_common",
            "aa_picos",
            (F.col("aa_picos").cast("double") / 1e12).alias("aa_score"),
        )
        .orderBy(F.col("aa_picos").desc(), "s1", "s2")
        .limit(G14_TOPK)
    )


g14_adamic_adar.__doc__ = g14_adamic_adar.__doc__.format(CAP=G14_DEG_CAP)
