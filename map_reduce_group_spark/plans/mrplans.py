"""Reference-parity and multimodal queries for the registry.

``mr_wordcount_pipe`` runs the reference's literal execution model (arbitrary
mapper/reducer executables + md5-partitioned sorted shuffle, mr/job.py) over
the documents fixture; ``wordcount_native`` is the same query Spark-first.
Both share one oracle — word count IS the reference's canonical example
(its CLI defaults, reference submit.py:41-51).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.mr.job import Job, run_lines
from map_reduce_group_spark.operators import multimodal
from map_reduce_group_spark.operators.text import tokens
from map_reduce_group_spark.plans.registry import register

_EXEC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "mr", "exec")

_WC_ORACLE = """
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
    GROUP BY word
"""


@register("wordcount_native", oracle=_WC_ORACLE)
def wordcount_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count, Spark-first: explode tokens → groupBy → count. One
    shuffle with map-side partial aggregation (the combiner the reference
    never had — SURVEY §2B aggregations)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("mr_wordcount_pipe", oracle=_WC_ORACLE)
def mr_wordcount_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the reference-parity engine: text lines piped
    through the wc_map executable, md5-mod-R sorted shuffle, wc_reduce
    executable (mr/job.py — the reference's whole job API, submit.py:80-88).
    RDD-based by necessity: the executables are opaque, exactly as in the
    reference; the surrounding engine is still Spark's shuffle machinery."""
    d = load_table(spark, sf_dir, "documents")
    lines = d.select("text").rdd.map(lambda r: r[0])
    job = Job(
        input_directory="<inline>",
        output_directory="<inline>",
        mapper_executable=os.path.join(_EXEC_DIR, "wc_map.py"),
        reducer_executable=os.path.join(_EXEC_DIR, "wc_reduce.py"),
        num_mappers=8,
        num_reducers=8,
    )
    out = run_lines(spark, lines, job).map(lambda line: line.split("\t", 1))
    return spark.createDataFrame(out, "word string, n_str string").select(
        "word", col("n_str").cast("bigint").alias("n")
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS id,
           'text/plain'       AS media_type,
           strlen(text)       AS n_bytes,
           md5(text)          AS content_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: wrap payload bytes + typed metadata
    struct (operators/multimodal.py). Oracle checks the metadata the engine
    computes (byte length, content md5) — the payload itself stays opaque."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.to_media_column(d, "doc_id", "text", "text/plain")
    return media.select(
        "id",
        col("media.meta.media_type").alias("media_type"),
        col("media.meta.n_bytes").cast("long").alias("n_bytes"),
        col("media.meta.content_md5").alias("content_md5"),
    )


@register(
    "multimodal_fake_features",
    oracle="""
    WITH b AS (
        SELECT doc_id AS id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    )
    SELECT id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(coalesce(list_sum(list_transform(range(0, n),
                i -> ('0x' || substr(hx, CAST(2*i + 1 AS BIGINT), 2))::BIGINT)),
                0) % 1000003 AS BIGINT) AS byte_sum,
           CAST(('0x' || rpad(substr(hx, 1, 16), 16, '0'))::UBIGINT
                % 2147483648 AS BIGINT) AS head_hash
    FROM b
    """,
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas featurization over binary payloads with a
    deterministic decode-free featurizer (real codecs stubbed — see
    operators/multimodal.py). Oracle-checked (upgraded from rows-only): the
    featurizer is pure integer math on the payload bytes — length, byte sum
    mod 1000003, first-8-bytes big-endian mod 2^31 — which DuckDB rebuilds
    byte-for-byte from hex(encode(text)), so the whole Arrow round trip
    (string→binary encode, batch slicing, schema) is under the hash gate."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.to_media_column(d, "doc_id", "text", "text/plain")
    return multimodal.fake_features(media)


_BMP_CH_SUM = """
    CAST(list_sum(list_transform(range(0, (8 + doc_id %% 9) * (8 + doc_id %% 7)),
        i -> (doc_id + 31 * (i // (8 + doc_id %% 9))
                     + 7 * (i %% (8 + doc_id %% 9)) + {ch}) %% 256)) AS BIGINT)
""".replace("%%", "%")


@register(
    "multimodal_bmp_decode",
    oracle=f"""
    SELECT doc_id AS id,
           8 + doc_id % 9 AS width,
           8 + doc_id % 7 AS height,
           {_BMP_CH_SUM.format(ch=0)}  AS r_sum,
           {_BMP_CH_SUM.format(ch=13)} AS g_sum,
           {_BMP_CH_SUM.format(ch=26)} AS b_sum,
           CAST({_BMP_CH_SUM.format(ch=0)} AS DOUBLE)
             / ((8 + doc_id % 9) * (8 + doc_id % 7)) AS r_mean,
           CAST({_BMP_CH_SUM.format(ch=13)} AS DOUBLE)
             / ((8 + doc_id % 9) * (8 + doc_id % 7)) AS g_mean,
           CAST({_BMP_CH_SUM.format(ch=26)} AS DOUBLE)
             / ((8 + doc_id % 9) * (8 + doc_id % 7)) AS b_mean
    FROM documents
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode in the engine: each document is rendered as a
    genuine 24-bit uncompressed BMP file (deterministic pixel pattern
    v(r,c,ch) = (doc_id + 31r + 7c + 13ch) mod 256, dimensions varying per
    doc), and the decode stage parses the actual BMP bytes — file-header
    pixel offset, signed height, 4-byte row stride, BGR order — via
    Arrow-batched mapInPandas (operators/multimodal.py:decode_bmp24). The
    oracle recomputes dimensions and per-channel sums/means from the pixel
    formula in closed form, so a decoder that mis-handles stride padding,
    row order, or channel order hash-mismatches immediately. Compressed
    codecs (JPEG/PNG) stay import-gated; this proves the decode PLUMBING
    end-to-end with a real format."""
    import numpy as np
    import pandas as pd

    from collections.abc import Iterator

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :] * 13
                px = ((doc_id + 31 * r + 7 * c + ch) % 256).astype(np.uint8)
                payloads.append(multimodal.encode_bmp24(px))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    images = d.mapInPandas(render, "id bigint, payload binary")
    return multimodal.bmp_features(images)


_WAV_FRAMES = "(400 + (doc_id % 5) * 80)"
_WAV_CH = "(1 + doc_id % 2)"
_WAV_RATE = "(8000 + (doc_id % 3) * 4000)"
_WAV_SAMPLE = "((doc_id * 7 + 13 * (k // {ch}) + 101 * (k % {ch})) % 4096) - 2048".format(
    ch=_WAV_CH
)
_WAV_AMP_SUM = (
    "CAST(list_sum(list_transform(range(0, {n} * {ch}), k -> {v})) AS BIGINT)"
).format(n=_WAV_FRAMES, ch=_WAV_CH, v=_WAV_SAMPLE)


@register(
    "multimodal_wav_decode",
    oracle=f"""
    SELECT doc_id AS id,
           {_WAV_FRAMES} AS n_frames,
           {_WAV_CH} AS channels,
           {_WAV_RATE} AS sample_rate,
           CAST({_WAV_FRAMES} AS DOUBLE) / {_WAV_RATE} AS duration_s,
           {_WAV_AMP_SUM} AS amp_sum,
           CAST({_WAV_AMP_SUM} AS DOUBLE) / ({_WAV_FRAMES} * {_WAV_CH}) AS amp_mean,
           CAST(list_max(list_transform(range(0, {_WAV_FRAMES} * {_WAV_CH}),
                k -> abs({_WAV_SAMPLE}))) AS BIGINT) AS peak
    FROM documents
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the engine: each document is rendered as a
    genuine RIFF/WAVE file (16-bit PCM, deterministic interleaved samples
    v(i,c) = ((doc_id·7 + 13i + 101c) mod 4096) − 2048, frame count /
    channel count / sample rate varying per doc, plus a LIST chunk between
    fmt and data) and the decode stage chunk-walks the actual container
    (operators/multimodal.py:decode_wav_pcm16) via Arrow-batched
    mapInPandas. The oracle recomputes every feature from the sample
    formula in closed form, so a decoder that mis-walks chunks, drops the
    word-alignment, or de-interleaves wrongly hash-mismatches. Compressed
    audio (MP3/AAC) stays import-gated as documented in
    operators/multimodal.py."""
    clips = _render_wav_clips(spark, sf_dir)
    return multimodal.wav_features(clips)


def _render_wav_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine RIFF/WAVE file per document (16-bit PCM, deterministic
    interleaved samples v(i,c) = ((doc_id·7 + 13i + 101c) mod 4096) − 2048,
    frame/channel/rate varying per doc, LIST chunk between fmt and data) —
    the shared fixture for the WAV decode/feature queries."""
    import numpy as np
    import pandas as pd

    from collections.abc import Iterator

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                frames = 400 + (doc_id % 5) * 80
                ch = 1 + doc_id % 2
                rate = 8000 + (doc_id % 3) * 4000
                i = np.arange(frames, dtype=np.int64)[:, None]
                c = np.arange(ch, dtype=np.int64)[None, :]
                v = (((doc_id * 7 + 13 * i + 101 * c) % 4096) - 2048).astype(np.int16)
                payloads.append(multimodal.encode_wav_pcm16(v, int(rate)))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(render, "id bigint, payload binary")


@register(
    "multimodal_wav_frame_energy",
    oracle=f"""
    SELECT doc_id AS id, w AS window_idx,
           CAST(list_sum(list_transform(
               range(w * 160 * {_WAV_CH},
                     least((w + 1) * 160, {_WAV_FRAMES}) * {_WAV_CH}),
               k -> ({_WAV_SAMPLE}) * ({_WAV_SAMPLE})
           )) AS BIGINT) AS energy
    FROM documents,
         unnest(range(0, ({_WAV_FRAMES} + 159) // 160)) AS t(w)
    """,
)
def multimodal_wav_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over REAL WAV decode
    (operators/multimodal.py:wav_frame_energy): 160-frame windows (20 ms at
    8 kHz — the speech-pipeline VAD hop), exact int64 sum of squared
    samples per window across channels. The oracle recomputes each window's
    energy from the closed-form sample formula, so a window-boundary or
    interleave bug hash-mismatches. Integer math end-to-end."""
    clips = _render_wav_clips(spark, sf_dir)
    return multimodal.wav_frame_energy(clips)


_WAV_S_NEXT = (
    "((doc_id * 7 + 13 * ((k // {ch}) + 1) + 101 * (k % {ch})) % 4096) - 2048"
).format(ch=_WAV_CH)


@register(
    "multimodal_wav_zcr",
    oracle=f"""
    SELECT doc_id AS id, w AS window_idx,
           -- coalesce: a zero-pair window (frames ≡ 1 mod 160) has an
           -- empty range and list_sum returns NULL where the operator
           -- emits 0 (line-107 wav oracle convention; ADVICE r7 #3)
           CAST(coalesce(list_sum(list_transform(
               range(w * 160 * {_WAV_CH},
                     least((w + 1) * 160, {_WAV_FRAMES} - 1) * {_WAV_CH}),
               k -> CASE WHEN ({_WAV_SAMPLE}) * ({_WAV_S_NEXT}) < 0
                    THEN 1 ELSE 0 END
           )), 0) AS BIGINT) AS crossings,
           (least((w + 1) * 160, {_WAV_FRAMES} - 1) - w * 160) * {_WAV_CH}
               AS n_pairs
    FROM documents,
         unnest(range(0, ({_WAV_FRAMES} + 159) // 160)) AS t(w)
    """,
)
def multimodal_wav_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed zero-crossing counts over REAL WAV decode
    (operators/multimodal.py:wav_zero_crossings): per 160-frame VAD-hop
    window, strict same-channel sign flips v(i,c)·v(i+1,c) < 0 plus the
    pair-count denominator — the classic energy+ZCR voiced/unvoiced
    feature pair (energy alone can't split fricatives from silence). A
    pair belongs to the window containing its left frame, so windows tile
    pair space exactly once; the oracle replays every pair from the
    closed-form sample formula, so an off-by-one at window seams or a
    de-interleave bug (crossings BETWEEN channels) hash-mismatches.
    Integer comparisons end-to-end."""
    clips = _render_wav_clips(spark, sf_dir)
    return multimodal.wav_zero_crossings(clips)


_VID_W = "(8 + doc_id % 5)"
_VID_H = "(6 + doc_id % 4)"
_VID_NF = "(6 + doc_id % 7)"
_VID_NS = f"(({_VID_NF} + 1) // 2)"
_VID_USEC = "(40000 + (doc_id % 3) * 20000)"
_VID_CH_SUM = (
    "CAST(list_sum(list_transform(range(0, {ns} * {h} * {w}), k -> "
    "(doc_id + 17 * (2 * (k // ({h} * {w}))) + 31 * ((k % ({h} * {w})) // {w}) "
    "+ 7 * ((k % ({h} * {w})) % {w}) + {{ch}}) % 256)) AS BIGINT)"
).format(ns=_VID_NS, h=_VID_H, w=_VID_W)


@register(
    "multimodal_video_frame_sample",
    oracle=f"""
    SELECT doc_id AS id,
           {_VID_W} AS width,
           {_VID_H} AS height,
           {_VID_NF} AS n_frames,
           {_VID_USEC} AS usec_per_frame,
           CAST({_VID_NF} * {_VID_USEC} AS DOUBLE) / 1000000.0 AS duration_s,
           {_VID_NS} AS n_sampled,
           {_VID_CH_SUM.format(ch=0)}  AS r_sum,
           {_VID_CH_SUM.format(ch=13)} AS g_sum,
           {_VID_CH_SUM.format(ch=26)} AS b_sum,
           CAST({_VID_CH_SUM.format(ch=0)} AS DOUBLE)
             / ({_VID_NS} * {_VID_H} * {_VID_W}) AS r_mean,
           CAST({_VID_CH_SUM.format(ch=13)} AS DOUBLE)
             / ({_VID_NS} * {_VID_H} * {_VID_W}) AS g_mean,
           CAST({_VID_CH_SUM.format(ch=26)} AS DOUBLE)
             / ({_VID_NS} * {_VID_H} * {_VID_W}) AS b_mean
    FROM documents
    """,
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling in the engine: each document is
    rendered as a genuine AVI RIFF container (uncompressed 'DIB ' video
    stream, MainAVIHeader + strh/strf, word-aligned '00db' frame chunks,
    deterministic pixels v(f,r,c,ch) = (doc_id + 17f + 31r + 7c + 13ch)
    mod 256, dimensions/frame-count/frame-rate varying per doc), and the
    featurizer walks the actual container and samples every 2nd frame
    (operators/multimodal.py:decode_avi_rgb24, video_frame_sample_features)
    via Arrow-batched mapInPandas. The oracle recomputes every feature in
    closed form over exactly the sampled frame indices, so a decoder that
    mis-walks lists, ignores stride padding, or samples the wrong frames
    hash-mismatches. Compressed codecs (H.264…) stay import-gated as
    documented in operators/multimodal.py."""
    import numpy as np
    import pandas as pd

    from collections.abc import Iterator

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h, nf = 8 + doc_id % 5, 6 + doc_id % 4, 6 + doc_id % 7
                usec = 40000 + (doc_id % 3) * 20000
                f = np.arange(nf, dtype=np.int64)[:, None, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None, None]
                c = np.arange(w, dtype=np.int64)[None, None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, None, :] * 13
                px = ((doc_id + 17 * f + 31 * r + 7 * c + ch) % 256).astype(np.uint8)
                payloads.append(multimodal.encode_avi_rgb24(px, int(usec)))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    clips = d.mapInPandas(render, "id bigint, payload binary")
    return multimodal.video_frame_sample_features(clips, sample_stride=2)


_AHASH_G3 = """((doc_id + 31 * (k // (8 + doc_id % 9)) + 7 * (k % (8 + doc_id % 9))) % 256
          + (doc_id + 31 * (k // (8 + doc_id % 9)) + 7 * (k % (8 + doc_id % 9)) + 13) % 256
          + (doc_id + 31 * (k // (8 + doc_id % 9)) + 7 * (k % (8 + doc_id % 9)) + 26) % 256)"""


@register(
    "multimodal_bmp_ahash_groups",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
    ), px AS (
        SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM d
    ), g AS (
        SELECT doc_id, w, h, (k // w) AS r, (k % w) AS c,
               {_AHASH_G3} AS g3
        FROM px
    ), blk AS (
        SELECT doc_id, w, h, (r * 8) // h AS bi, (c * 8) // w AS bj,
               sum(g3) AS sb, count(*) AS nb
        FROM g GROUP BY 1, 2, 3, 4, 5
    ), tot AS (
        SELECT doc_id, sum(sb) AS st, sum(nb) AS nt FROM blk GROUP BY 1
    ), bits AS (
        SELECT b.doc_id, b.w, b.h,
               CASE WHEN b.sb * t.nt > t.st * b.nb THEN 1 ELSE 0 END AS bit,
               b.bi * 8 + b.bj AS k
        FROM blk b JOIN tot t USING (doc_id)
    ), hashes AS (
        SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
               CAST(sum(CASE WHEN k >= 32 THEN bit * (1 << (k - 32)) ELSE 0 END)
                    AS BIGINT) AS ahash_hi,
               CAST(sum(CASE WHEN k < 32 THEN bit * (1 << k) ELSE 0 END)
                    AS BIGINT) AS ahash_lo
        FROM bits GROUP BY doc_id
    )
    SELECT doc_id AS id, width, height, ahash_hi, ahash_lo,
           CAST(count(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT) AS n_same,
           CAST(min(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT) AS rep_id
    FROM hashes
    """,
)
def multimodal_bmp_ahash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup via average hash: render each document as
    a REAL 24-bit BMP (the multimodal_bmp_decode pixel formula), decode the
    actual bytes, compute the 64-bit aHash (8×8 area-mapped block means vs
    the image mean, integer cross-multiplication only —
    operators/multimodal.py:bmp_ahash), and group images by hash: per
    image, the size of its perceptual-duplicate family and the family
    representative (min id). The image-dedup primitive of web-scale
    multimodal pipelines (aHash/pHash family; real codecs stay
    import-gated — the BMP path proves decode + hash plumbing end-to-end).
    Scale: hashing is map-only Arrow batches; the family window shuffles
    by the 64-bit hash (near-uniform key space, no hot partition). The
    DuckDB oracle replays pixel enumeration, block mapping, bit
    thresholds, and both hash halves in closed form."""
    import numpy as np
    import pandas as pd

    from collections.abc import Iterator

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :] * 13
                px = ((doc_id + 31 * r + 7 * c + ch) % 256).astype(np.uint8)
                payloads.append(multimodal.encode_bmp24(px))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    images = d.mapInPandas(render, "id bigint, payload binary")
    hashed = multimodal.bmp_ahash(images)
    # family stats as groupBy + join, NOT a window over the hash partition:
    # count/min partial-aggregate map-side, so a pathological hot hash
    # (e.g. a corpus of near-uniform thumbnails) never single-partition
    # sorts; the join back is hash-keyed and AQE-skew-splittable
    fams = hashed.groupBy("ahash_hi", "ahash_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_same"),
        F.min("id").cast("long").alias("rep_id"),
    )
    return hashed.join(fams, ["ahash_hi", "ahash_lo"]).select(
        "id", "width", "height", "ahash_hi", "ahash_lo", "n_same", "rep_id"
    )
