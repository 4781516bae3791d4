"""Multimodal column plumbing: opaque binary payloads with typed metadata,
processed through Arrow-batched `mapInPandas`.

No reference analog — Phase-5 pipeline operators. The design rule for
image/audio/video at 100 TB: the engine treats media as `binary` columns
plus typed metadata, keeps them out of shuffles wherever possible
(project metadata early, join payloads late), and runs per-item Python
(decode, resize, frame-sample, feature-extract) only through
`mapInPandas` so every crossing of the JVM<->Python boundary moves an
Arrow batch, not a row.

The actual codec work (JPEG decode, audio resampling, ...) needs
libraries this container doesn't ship, so the CODEC is a clearly-marked
deterministic fake (`fake_image_codec` / `fake_audio_codec` — swap in
PIL / libsndfile via the `codec=` parameter to activate). Everything
around the codec is real and oracle-checked: the Arrow batch plumbing,
schemas, partition inheritance, the numpy nearest-neighbor resize, and
the strided frame sampling all run exactly as they would with a real
decoder, and because the fake is deterministic the full decode ->
transform -> fingerprint pipelines (q40/q41/q42) hash-match a DuckDB
oracle that re-derives the same bytes SQL-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from smartbulkcopy_spark.queries import eager, register, table

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, blob_md5 string"


def binary_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Byte-level features of an opaque blob column via mapInPandas.

    This is the canonical multimodal batch shape: each Arrow batch arrives
    as a pandas DataFrame, per-item work is vectorized or tight-loop
    Python, output is a typed frame. Row-local -> zero shuffle; partition
    count is inherited from the scan.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL blobs arrive as None; treat them as empty payloads
            # rather than crashing the Python worker.
            blobs = pdf[blob_col].map(
                lambda b: b"" if b is None else bytes(b)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": blobs.map(len),
                    "blob_md5": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fake codecs — the ONLY stubbed pieces. A real deployment
# passes codec=PIL-based-callable; everything downstream is unchanged.
# ---------------------------------------------------------------------------

CHANNELS = 3
MAX_DIM = 32  # fake images are 1..32 px per side


def fake_image_codec(blob: bytes) -> tuple[int, int, int, bytes]:
    """FAKE image decoder (deterministic): dimensions come from the blob's
    md5, pixel bytes are the hexdigest cycled to h*w*c. Replace with e.g.
    ``lambda b: PIL.Image.open(io.BytesIO(b))`` glue for real JPEGs —
    the (h, w, c, raw_bytes) contract is what a real decoder returns."""
    hx = hashlib.md5(blob).hexdigest()
    h = 1 + int(hx[:4], 16) % MAX_DIM
    w = 1 + int(hx[4:8], 16) % MAX_DIM
    n = h * w * CHANNELS
    pixels = (hx * (n // len(hx) + 1))[:n].encode("ascii")
    return h, w, CHANNELS, pixels


MAX_AUDIO_FRAMES = 500
BYTES_PER_FRAME = 2  # mono int16 PCM


def fake_audio_codec(blob: bytes) -> tuple[int, bytes]:
    """FAKE audio decoder (deterministic): frame count from the blob's
    md5, PCM bytes are the hexdigest cycled. Same (n_frames, raw_bytes)
    contract as a real libsndfile decode."""
    hx = hashlib.md5(blob).hexdigest()
    n_frames = 1 + int(hx[8:12], 16) % MAX_AUDIO_FRAMES
    n = n_frames * BYTES_PER_FRAME
    pcm = (hx * (n // len(hx) + 1))[:n].encode("ascii")
    return n_frames, pcm


DECODE_SCHEMA = (
    "doc_id bigint, height int, width int, channels int, pixels binary"
)


def decode_image(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    codec: Callable[[bytes], tuple[int, int, int, bytes]] = fake_image_codec,
) -> DataFrame:
    """Decode an image blob column to (height, width, channels, pixels)
    through Arrow-batched mapInPandas. The codec is per-item Python (the
    honest shape — real decoders are), everything else stays columnar.
    Row-local: zero shuffle, partitioning inherited from the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                codec(b"" if b is None else bytes(b)) for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "height": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "pixels": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, DECODE_SCHEMA)


def resize_image(decoded: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize of decoded frames (REAL math, vectorized
    numpy per item): out[i, j] = in[(i*h)//out_h, (j*w)//out_w]. Works
    identically on fake and real pixel buffers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ri = np.arange(out_h)
        rj = np.arange(out_w)
        for pdf in batches:
            out = []
            for h, w, c, buf in zip(
                pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                a = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    int(h), int(w), int(c)
                )
                out.append(a[(ri * h) // out_h][:, (rj * w) // out_w, :].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": out_h,
                    "width": out_w,
                    "channels": pdf["channels"],
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(run, DECODE_SCHEMA)


def sample_audio_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    every_k: int,
    codec: Callable[[bytes], tuple[int, bytes]] = fake_audio_codec,
) -> DataFrame:
    """Decode an audio blob and keep every k-th PCM frame (REAL strided
    numpy sampling over the decoded buffer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, sampled = [], []
            for b in pdf[blob_col]:
                nf, pcm = codec(b"" if b is None else bytes(b))
                frames = np.frombuffer(pcm, dtype=np.uint8).reshape(
                    nf, BYTES_PER_FRAME
                )
                n_frames.append(nf)
                sampled.append(frames[::every_k].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_frames": n_frames,
                    "sampled": sampled,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id bigint, n_frames int, sampled binary"
    )


@register(
    "q32_binary_features",
    "SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS n_bytes,"
    " md5(coalesce(text, '')) AS blob_md5 FROM documents ORDER BY doc_id",
    doc="Multimodal plumbing proof: text bytes treated as an opaque blob,"
    " features (size + md5) computed in Arrow-batched mapInPandas. The"
    " oracle recomputes both from the same UTF-8 bytes SQL-side.",
)
def q32(spark, sf_dir):
    # No spread(): each partition spawns a Python worker, and for a tiny
    # input the worker spin-up dwarfs the vectorized md5 work. At scale
    # the scan has many splits and parallelism comes for free.
    docs = table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("blob"))
    return binary_features(blobs, "doc_id", "blob")


def _blobs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("blob"))


# Oracle fragments re-deriving the fake codec's bytes SQL-side. md5(text)
# in DuckDB hashes the UTF-8 bytes — the same bytes the Spark side feeds
# the codec — and the cycled-hexdigest buffers are pure ASCII, so
# character arithmetic equals byte arithmetic.
_DECODE_CTE = (
    "dec AS (SELECT doc_id, md5(coalesce(text, '')) AS hx,"
    f" 1 + CAST(('0x'||substr(md5(coalesce(text, '')),1,4)) AS INT) % {MAX_DIM} AS h,"
    f" 1 + CAST(('0x'||substr(md5(coalesce(text, '')),5,4)) AS INT) % {MAX_DIM} AS w"
    " FROM documents),"
    f" buf AS (SELECT *, substr(repeat(hx, (h*w*{CHANNELS})//32 + 1),"
    f" 1, h*w*{CHANNELS}) AS b FROM dec)"
)


@register(
    "q40_image_decode",
    "WITH " + _DECODE_CTE
    + " SELECT doc_id, h AS height, w AS width,"
    f" CAST({CHANNELS} AS INT) AS channels, md5(b) AS pixel_md5"
    " FROM buf ORDER BY doc_id",
    doc="Image decode through the real mapInPandas plumbing (Arrow"
    " batches, per-item codec, typed frame out) with the deterministic"
    " fake codec; the oracle re-derives dimensions and the pixel-buffer"
    " md5 SQL-side, so the whole decode path is hash-checked.",
)
def q40(spark, sf_dir):
    decoded = decode_image(_blobs(spark, sf_dir), "doc_id", "blob")
    return decoded.select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.md5("pixels").alias("pixel_md5"),
    )


RESIZE_TO = 8


@register(
    "q41_image_resize",
    "WITH " + _DECODE_CTE
    + f" SELECT doc_id, CAST({RESIZE_TO} AS INT) AS height,"
    f" CAST({RESIZE_TO} AS INT) AS width,"
    " md5(array_to_string(list_transform("
    f"range(0, {RESIZE_TO * RESIZE_TO * CHANNELS}), p ->"
    f" substr(b, 1 + ((((p // {RESIZE_TO * CHANNELS}) * h) // {RESIZE_TO})"
    f" * w * {CHANNELS})"
    f" + ((((p % {RESIZE_TO * CHANNELS}) // {CHANNELS}) * w)"
    f" // {RESIZE_TO}) * {CHANNELS}"
    f" + (p % {CHANNELS}), 1)), '')) AS pixel_md5"
    " FROM buf ORDER BY doc_id",
    doc="Decode -> nearest-neighbor resize to 8x8 (real vectorized numpy"
    " index mapping in mapInPandas). The oracle replays the same"
    " out[i,j] = in[(i*h)//8, (j*w)//8] arithmetic character-wise and"
    " md5s the resized buffer — the transform math is hash-checked, not"
    " just the plumbing.",
)
def q41(spark, sf_dir):
    decoded = decode_image(_blobs(spark, sf_dir), "doc_id", "blob")
    resized = resize_image(decoded, RESIZE_TO, RESIZE_TO)
    return resized.select(
        "doc_id", "height", "width", F.md5("pixels").alias("pixel_md5")
    )


SAMPLE_EVERY = 4


@register(
    "q42_audio_frame_sample",
    "WITH dec AS (SELECT doc_id, md5(coalesce(text, '')) AS hx,"
    " 1 + CAST(('0x'||substr(md5(coalesce(text, '')),9,4)) AS INT)"
    f" % {MAX_AUDIO_FRAMES} AS nf FROM documents),"
    f" buf AS (SELECT *, substr(repeat(hx, ({BYTES_PER_FRAME}*nf)//32 + 1),"
    f" 1, {BYTES_PER_FRAME}*nf) AS b FROM dec)"
    " SELECT doc_id, nf AS n_frames,"
    f" md5(array_to_string(list_transform(range(0, (nf + {SAMPLE_EVERY - 1})"
    f" // {SAMPLE_EVERY}), f ->"
    f" substr(b, 1 + {BYTES_PER_FRAME * SAMPLE_EVERY} * f,"
    f" {BYTES_PER_FRAME})), '')) AS sampled_md5"
    " FROM buf ORDER BY doc_id",
    doc="Audio decode (fake codec) -> keep every 4th PCM frame (real"
    " strided numpy sampling in mapInPandas); the oracle re-derives the"
    " sampled byte sequence and its md5 SQL-side.",
)
def q42(spark, sf_dir):
    sampled = sample_audio_frames(
        _blobs(spark, sf_dir), "doc_id", "blob", SAMPLE_EVERY
    )
    return sampled.select(
        "doc_id", "n_frames", F.md5("sampled").alias("sampled_md5")
    )


# ---------------------------------------------------------------------------
# Video: the third modality. A video blob decodes to (n_frames, h, w,
# raw) — a 4D uint8 buffer — and the training-data operation is temporal
# frame sampling: keep every k-th frame as the model's clip input. Same
# Arrow-batched mapInPandas shape as audio, but the stride works on
# whole 2D frames (h*w*channels bytes each), exactly what a real
# ffmpeg/PyAV decode feeds at scale; only the codec is fake here.
# ---------------------------------------------------------------------------

MAX_VIDEO_FRAMES = 48
VIDEO_DIM = 8  # fake clips are 1..8 px per side


def fake_video_codec(blob: bytes) -> tuple[int, int, int, bytes]:
    """FAKE video decoder (deterministic): frame count and square frame
    size from the blob's md5, frame bytes the hexdigest cycled. Replace
    with PyAV/ffmpeg glue returning the same (n_frames, h, w, raw)
    contract for real containers."""
    hx = hashlib.md5(blob).hexdigest()
    nf = 1 + int(hx[12:16], 16) % MAX_VIDEO_FRAMES
    side = 1 + int(hx[16:20], 16) % VIDEO_DIM
    n = nf * side * side * CHANNELS
    raw = (hx * (n // len(hx) + 1))[:n].encode("ascii")
    return nf, side, side, raw


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    every_k: int,
    codec: Callable[[bytes], tuple[int, int, int, bytes]] = fake_video_codec,
) -> DataFrame:
    """Decode a video blob and keep every k-th frame (REAL strided numpy
    slicing over the decoded 4D buffer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, hs, ws, sampled = [], [], [], []
            for b in pdf[blob_col]:
                nf, h, w, raw = codec(b"" if b is None else bytes(b))
                frames = np.frombuffer(raw, dtype=np.uint8).reshape(
                    nf, h, w, CHANNELS
                )
                nfs.append(nf)
                hs.append(h)
                ws.append(w)
                sampled.append(frames[::every_k].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_frames": nfs,
                    "height": hs,
                    "width": ws,
                    "sampled": sampled,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        run,
        "doc_id bigint, n_frames int, height int, width int,"
        " sampled binary",
    )


VIDEO_SAMPLE_EVERY = 3


@register(
    "q79_video_frame_sample",
    "WITH dec AS (SELECT doc_id, md5(coalesce(text, '')) AS hx,"
    " 1 + CAST(('0x'||substr(md5(coalesce(text, '')),13,4)) AS INT)"
    f" % {MAX_VIDEO_FRAMES} AS nf,"
    " 1 + CAST(('0x'||substr(md5(coalesce(text, '')),17,4)) AS INT)"
    f" % {VIDEO_DIM} AS side FROM documents),"
    f" buf AS (SELECT *, side * side * {CHANNELS} AS fsz,"
    f" substr(repeat(hx, (nf * side * side * {CHANNELS}) // 32 + 1),"
    f" 1, nf * side * side * {CHANNELS}) AS b FROM dec)"
    " SELECT doc_id, nf AS n_frames, side AS height, side AS width,"
    f" md5(array_to_string(list_transform(range(0,"
    f" (nf + {VIDEO_SAMPLE_EVERY - 1}) // {VIDEO_SAMPLE_EVERY}), f ->"
    f" substr(b, 1 + {VIDEO_SAMPLE_EVERY} * fsz * f, fsz)), ''))"
    " AS sampled_md5"
    " FROM buf ORDER BY doc_id",
    doc="Video decode (fake codec, real 4D-buffer plumbing) -> keep"
    " every 3rd frame via strided numpy slicing in mapInPandas; the"
    " oracle re-derives the sampled frame bytes and md5 SQL-side, so"
    " the temporal-sampling arithmetic is hash-checked end to end.",
)
def q79(spark, sf_dir):
    sampled = sample_video_frames(
        _blobs(spark, sf_dir), "doc_id", "blob", VIDEO_SAMPLE_EVERY
    )
    return sampled.select(
        "doc_id",
        "n_frames",
        "height",
        "width",
        F.md5("sampled").alias("sampled_md5"),
    )


# ---------------------------------------------------------------------------
# Perceptual image fingerprint: the average-hash (aHash) every image
# dedup pipeline starts with — resize to 8x8, per-cell luminance, bit =
# luminance above the image mean, 64-bit fingerprint. Near-identical
# images (recompressions, small crops/recolors under a real codec)
# collide or sit at small Hamming distance, so the fingerprint feeds the
# SAME exact/banded dedup machinery the text side uses. Everything is
# integer arithmetic (luminance = channel-byte sum, mean = floor), so
# the DuckDB oracle re-derives the full 64-bit hash from the decode +
# resize character arithmetic.
# ---------------------------------------------------------------------------

AHASH_CELLS = RESIZE_TO * RESIZE_TO  # 64


def _resized_char_duck(p: str) -> str:
    """The q41 nearest-neighbor index arithmetic: the 1-char slice of
    the decoded buffer that lands at position `p` (0-based, row-major
    pixel x channel) of the 8x8 resized buffer."""
    rc = RESIZE_TO * CHANNELS
    return (
        f"substr(b, 1 + (((({p}) // {rc}) * h) // {RESIZE_TO})"
        f" * w * {CHANNELS}"
        f" + (((({p}) % {rc}) // {CHANNELS}) * w) // {RESIZE_TO}"
        f" * {CHANNELS}"
        f" + (({p}) % {CHANNELS}), 1)"
    )


def image_ahash(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    codec: Callable[[bytes], tuple[int, int, int, bytes]] = fake_image_codec,
) -> DataFrame:
    """decode -> 8x8 NN resize -> 64-bit average hash, all through the
    Arrow-batched pipeline. Returns (doc_id, ahash_hi, ahash_lo, n_set):
    the hash is split into two 32-bit halves so neither engine touches
    the BIGINT sign bit (bit 63 would)."""
    resized = resize_image(
        decode_image(df, id_col, blob_col, codec), RESIZE_TO, RESIZE_TO
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hi, lo, ns = [], [], []
            for buf in pdf["pixels"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    AHASH_CELLS, CHANNELS
                )
                lums = arr.sum(axis=1, dtype=np.int64)
                mean = int(lums.sum()) // AHASH_CELLS
                bits = lums > mean
                h = sum(1 << j for j in range(32) if bits[j])
                l = sum(1 << (j - 32) for j in range(32, 64) if bits[j])
                hi.append(h)
                lo.append(l)
                ns.append(int(bits.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash_hi": pd.Series(hi, dtype="int64"),
                    "ahash_lo": pd.Series(lo, dtype="int64"),
                    "n_set": pd.Series(ns, dtype="int64"),
                }
            )

    return resized.select("doc_id", "pixels").mapInPandas(
        run, "doc_id bigint, ahash_hi bigint, ahash_lo bigint, n_set bigint"
    )


def _lum_duck(c: str) -> str:
    """Cell luminance: the channel-byte sum of resized cell `c`."""
    return " + ".join(
        f"ord({_resized_char_duck(f'({c}) * {CHANNELS} + {k}')})"
        for k in range(CHANNELS)
    )


def _ahash_cte_duck() -> str:
    """decode -> resize-char luminance -> 64-bit average hash as an
    `ah(doc_id, ahash_hi, ahash_lo, n_set)` CTE chain — the single
    source for the q110 fingerprint and the q111 banded consumer."""
    return (
        _DECODE_CTE + ","
        " lums AS (SELECT doc_id,"
        f" list_transform(range(0, {AHASH_CELLS}), c -> {_lum_duck('c')})"
        " AS l FROM buf),"
        " m AS (SELECT doc_id, l,"
        f" CAST(list_sum(l) AS BIGINT) // {AHASH_CELLS} AS mean FROM lums),"
        " ah AS (SELECT doc_id,"
        " CAST(list_sum(list_transform(range(0, 32), j ->"
        " CASE WHEN l[j + 1] > mean THEN (CAST(1 AS BIGINT) << j)"
        " ELSE 0 END)) AS BIGINT) AS ahash_hi,"
        " CAST(list_sum(list_transform(range(32, 64), j ->"
        " CASE WHEN l[j + 1] > mean THEN (CAST(1 AS BIGINT) << (j - 32))"
        " ELSE 0 END)) AS BIGINT) AS ahash_lo,"
        " CAST(len(list_filter(l, x -> x > mean)) AS BIGINT) AS n_set"
        " FROM m)"
    )


@register(
    "q110_image_ahash",
    "WITH " + _ahash_cte_duck()
    + " SELECT doc_id, ahash_hi, ahash_lo, n_set FROM ah ORDER BY doc_id",
    doc="Perceptual image fingerprint (average-hash): decode -> 8x8"
    " nearest-neighbor resize -> per-cell luminance -> 64-bit"
    " above-mean bitmap, split into two 32-bit halves to stay clear of"
    " the BIGINT sign bit. The fingerprint is the image-side analog of"
    " the text content hash: exact-duplicate images collide, near-"
    " duplicates sit at small Hamming distance, and the value feeds"
    " the same groupBy/banded dedup machinery. Real vectorized numpy"
    " in Arrow-batched mapInPandas (codec pluggable, fake by default);"
    " the oracle re-derives every bit from the decode + resize"
    " character arithmetic — integer luminance and floor mean, so the"
    " hash is bit-exact across engines.",
)
def q110(spark, sf_dir):
    return (
        image_ahash(_blobs(spark, sf_dir), "doc_id", "blob")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Image near-duplicate detection over the q110 fingerprint — the banded
# candidate generation + Hamming verify that closes the image dedup
# loop. Identical scale shape to the text side's MinHash-LSH (q27/q29):
# the 64-bit ahash splits into 4 x 16-bit bands; two images sharing ANY
# band become a candidate pair (generated per-bucket, never all-pairs);
# candidates verify on exact Hamming distance, which touches only the
# tiny (id, hash) pair set. A recompressed / lightly-edited image under
# a real codec perturbs a few luminance cells -> a few hash bits -> at
# least one band usually survives intact, the textbook aHash banding
# trade-off. Hot buckets use the q112 round-12 TWO-LEVEL rule
# (hamming-0 stars within identical-hash groups; the cap counts
# DISTINCT hashes, whose reps clique); q114's incremental cross-side
# join applies the same rule's rep-join form (provably
# output-identical to the member join, and verbatim-hot-proof).
# ---------------------------------------------------------------------------

AHASH_BAND_BITS = 16
AHASH_BANDS = 4  # 64-bit hash = 2 bands per 32-bit half
IMAGE_HAMMING_MAX = 12  # fixture: verified pairs at every SF, exact dups at 0

# Same hot-bucket cap (and rationale) as the text LSH side: between
# DISTINCT hashes a 16-bit band match is weak evidence and an over-cap
# bucket is ambient collision mass.
from smartbulkcopy_spark.pipeline.dedup import MAX_BAND_BUCKET  # noqa: E402


def _ahash_band_duck(b: int) -> str:
    half = "ahash_hi" if b < 2 else "ahash_lo"
    return f"(({half} >> {AHASH_BAND_BITS * (b % 2)}) & 65535)"


def image_near_dup_pairs(spark, sf_dir):
    """(a_id, b_id, hamming) image near-dup pairs: ahash -> 4x16-bit
    bands -> TWO-LEVEL capped candidates -> Hamming verify (the q112
    round-12 rule; see `dedup.simhash_pairs_cte_duck` for the full
    rationale): bucket members group by the full 64-bit ahash —
    byte-identical and recompressed-to-identical-ahash copies connect
    through a hamming-0 star around the group's min doc_id, and
    MAX_BAND_BUCKET caps DISTINCT hashes per bucket, whose reps clique.
    Family connectivity provably matches the old member-clique rule
    wherever it applied, while a verbatim image family of ANY size
    stays connected (the old skip-cap silently dropped families past
    1024 copies — and meme-grade duplication is exactly where image
    dedup matters most).

    The fingerprint table is eager()-persisted: it feeds the banding AND
    both verify join sides, and it is the only stage that touches image
    bytes — everything after is (id, two longs). At 100 TB the hash
    table is ~16 bytes/image and the only wide operations key on
    (band_idx, band_val) and ids."""
    ah = eager(
        image_ahash(_blobs(spark, sf_dir), "doc_id", "blob").select(
            "doc_id", "ahash_hi", "ahash_lo"
        )
    )
    bands = ah.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftright({'ahash_hi' if b < 2 else 'ahash_lo'},"
                        f" {AHASH_BAND_BITS * (b % 2)}) & 65535"
                    )
                    for b in range(AHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_idx", "band_val")
    wg = Window.partitionBy(
        "band_idx", "band_val", "ahash_hi", "ahash_lo"
    )
    # q112's O(1)-state rule: one explicit coarse shuffle, gmin first,
    # then bc as a conditional count of rep rows (= DISTINCT signatures
    # per bucket) — never a per-row collect_set, whose state grows with
    # ambient bucket width (round-13 ADVICE fix).
    marked = (
        bands.repartition("band_idx", "band_val")
        .withColumn("gmin", F.min("doc_id").over(wg))
        .withColumn(
            "bc",
            F.count(
                F.when(F.col("doc_id") == F.col("gmin"), F.lit(1))
            ).over(wb),
        )
    )
    # q112's noop trick: both branches reference every window column so
    # the Window subtrees stay structurally identical.
    noop = (F.col("bc") >= 1) & F.col("gmin").isNotNull()
    star = marked.where((F.col("doc_id") > F.col("gmin")) & noop).select(
        F.col("gmin").alias("a_id"), F.col("doc_id").alias("b_id")
    )
    buckets = (
        marked.where(
            (F.col("doc_id") == F.col("gmin"))
            & (F.col("bc") > 1)
            & (F.col("bc") <= MAX_BAND_BUCKET)
            & noop
        )
        .groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list("gmin")).alias("ds"))
    )
    pairs = F.expr(
        "flatten(transform(ds, (a, i) ->"
        " transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))"
    )
    repp = buckets.select(F.explode(pairs).alias("p")).select(
        F.col("p.a").alias("a_id"), F.col("p.b").alias("b_id")
    )
    cand = star.union(repp).distinct()
    a = ah.select(
        F.col("doc_id").alias("a_id"),
        F.col("ahash_hi").alias("hi_a"),
        F.col("ahash_lo").alias("lo_a"),
    )
    b = ah.select(
        F.col("doc_id").alias("b_id"),
        F.col("ahash_hi").alias("hi_b"),
        F.col("ahash_lo").alias("lo_b"),
    )
    ham = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select("a_id", "b_id", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= IMAGE_HAMMING_MAX)
    )


def _image_pairs_cte_duck() -> str:
    """The q111 chain (ahash -> bands -> capped buckets -> candidate
    pairs -> Hamming) as a `ham(a_id, b_id, hamming)` CTE — the single
    source for the q111 pair oracle and the q117 transitive consumer."""
    return (
        _ahash_cte_duck() + ","
        " bands AS (SELECT doc_id, ahash_hi, ahash_lo, t.b AS band_idx,"
        + " CASE "
        + " ".join(
            f"WHEN t.b = {b} THEN {_ahash_band_duck(b)}"
            for b in range(AHASH_BANDS)
        )
        + " END AS band_val"
        " FROM ah CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(b)),"
        " grp AS (SELECT band_idx, band_val, ahash_hi, ahash_lo,"
        " min(doc_id) AS gmin FROM bands"
        " GROUP BY band_idx, band_val, ahash_hi, ahash_lo),"
        " star AS (SELECT g.gmin AS a_id, b.doc_id AS b_id"
        " FROM bands b JOIN grp g ON b.band_idx = g.band_idx"
        " AND b.band_val = g.band_val AND b.ahash_hi = g.ahash_hi"
        " AND b.ahash_lo = g.ahash_lo AND b.doc_id > g.gmin),"
        " bsz AS (SELECT band_idx, band_val FROM grp"
        " GROUP BY band_idx, band_val"
        f" HAVING count(*) > 1 AND count(*) <= {MAX_BAND_BUCKET}),"
        " repp AS (SELECT x.gmin AS a_id, y.gmin AS b_id"
        " FROM grp x JOIN bsz s"
        " ON x.band_idx = s.band_idx AND x.band_val = s.band_val"
        " JOIN grp y ON x.band_idx = y.band_idx"
        " AND x.band_val = y.band_val AND x.gmin < y.gmin),"
        " cand AS (SELECT DISTINCT a_id, b_id FROM"
        " (SELECT a_id, b_id FROM star UNION ALL"
        " SELECT a_id, b_id FROM repp) u),"
        " ham AS (SELECT c.a_id, c.b_id,"
        " CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))"
        " + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT) AS hamming"
        " FROM cand c JOIN ah a ON a.doc_id = c.a_id"
        " JOIN ah b ON b.doc_id = c.b_id)"
    )


@register(
    "q111_image_near_dup",
    "WITH " + _image_pairs_cte_duck()
    + " SELECT a_id, b_id, hamming FROM ham"
    f" WHERE hamming <= {IMAGE_HAMMING_MAX} ORDER BY a_id, b_id",
    doc="Image near-duplicate pairs over the q110 perceptual fingerprint:"
    " the 64-bit average-hash splits into 4 x 16-bit bands (the q27"
    " LSH banding pattern) with the q112 TWO-LEVEL candidate rule"
    " (identical-hash members star around the group min at hamming 0;"
    " the cap counts DISTINCT hashes per bucket, whose reps clique —"
    " never all-pairs, and a verbatim image family of any size stays"
    " connected), and candidates verify on exact Hamming distance <="
    f" {IMAGE_HAMMING_MAX} of 64 bits — exact duplicates land at 0,"
    " recompressions/light edits at small distances. Closes the image"
    " dedup loop: the verified pairs feed the same keep-list /"
    " connected-component machinery as the text side. Oracle re-derives"
    " bands, grouping, cap, and Hamming bit-for-bit from the decode"
    " arithmetic.",
)
def q111(spark, sf_dir):
    return image_near_dup_pairs(spark, sf_dir).orderBy("a_id", "b_id")


# Incremental image ingestion — the q63 shape for the image modality:
# a new image batch bands against the EXISTING corpus's ahash index, so
# the join is new-batch x index on (band_idx, band_val); the corpus is
# never re-self-joined. Batch boundary mirrors q63's id split.
from smartbulkcopy_spark.pipeline.dedup import (  # noqa: E402
    INCREMENTAL_SPLIT_ID,
)


@register(
    "q114_incremental_image_dedup",
    "WITH " + _ahash_cte_duck() + ","
    " bands AS (SELECT doc_id, ahash_hi, ahash_lo, t.b AS band_idx,"
    + " CASE "
    + " ".join(
        f"WHEN t.b = {b} THEN {_ahash_band_duck(b)}"
        for b in range(AHASH_BANDS)
    )
    + " END AS band_val"
    " FROM ah CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(b)),"
    f" old AS (SELECT * FROM bands WHERE doc_id < {INCREMENTAL_SPLIT_ID}),"
    f" nw AS (SELECT * FROM bands WHERE doc_id >= {INCREMENTAL_SPLIT_ID}),"
    " og AS (SELECT band_idx, band_val, ahash_hi, ahash_lo,"
    " min(doc_id) AS old_id FROM old"
    " GROUP BY band_idx, band_val, ahash_hi, ahash_lo),"
    " osz AS (SELECT band_idx, band_val FROM og"
    " GROUP BY band_idx, band_val"
    f" HAVING count(*) <= {MAX_BAND_BUCKET}),"
    " cand2 AS (SELECT DISTINCT o.old_id, n.doc_id AS new_id"
    " FROM nw n JOIN osz s"
    " ON n.band_idx = s.band_idx AND n.band_val = s.band_val"
    " JOIN og o ON o.band_idx = n.band_idx"
    " AND o.band_val = n.band_val),"
    " ham2 AS (SELECT c.new_id, c.old_id,"
    " CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))"
    " + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT) AS hamming"
    " FROM cand2 c JOIN ah a ON a.doc_id = c.old_id"
    " JOIN ah b ON b.doc_id = c.new_id)"
    " SELECT new_id, min(old_id) AS dup_of,"
    " min(hamming) AS best_hamming FROM ham2"
    f" WHERE hamming <= {IMAGE_HAMMING_MAX}"
    " GROUP BY new_id ORDER BY new_id",
    doc="Incremental image-ingestion dedup (q63 for the image modality):"
    " which images of a NEW batch are perceptual near-duplicates of"
    " the EXISTING corpus. The batch bands against the corpus's ahash"
    " index on (band_idx, band_val), joining GROUP REPRESENTATIVES —"
    " one per distinct 64-bit hash per bucket (the q111/q112 two-level"
    " rule's cross-side form, and here provably OUTPUT-IDENTICAL to"
    " joining all members: dup_of = min old id is each group's rep,"
    " and Hamming to a rep equals Hamming to every member). The"
    " MAX_BAND_BUCKET cap counts distinct hashes, so a verbatim corpus"
    " family of any size stays matchable where the old member-count"
    " skip-cap silently missed it. Only cross-side candidates verify"
    f" on Hamming <= {IMAGE_HAMMING_MAX}; cost scales with batch x"
    " distinct-hash collision rate, never corpus squared: a daily"
    " image crawl dedups against 100 TB already ingested.",
)
def q114(spark, sf_dir):
    ah = eager(
        image_ahash(_blobs(spark, sf_dir), "doc_id", "blob").select(
            "doc_id", "ahash_hi", "ahash_lo"
        )
    )
    bands = ah.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftright({'ahash_hi' if b < 2 else 'ahash_lo'},"
                        f" {AHASH_BAND_BITS * (b % 2)}) & 65535"
                    )
                    for b in range(AHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    old = bands.where(F.col("doc_id") < INCREMENTAL_SPLIT_ID)
    new = bands.where(F.col("doc_id") >= INCREMENTAL_SPLIT_ID)
    # cross-side two-level rule: the index joins GROUP REPRESENTATIVES
    # (one per distinct hash per bucket — output-identical to joining
    # all members, see the register doc), and the cap counts groups.
    og = old.groupBy(
        "band_idx", "band_val", "ahash_hi", "ahash_lo"
    ).agg(F.min("doc_id").alias("old_id"))
    osz = (
        og.groupBy("band_idx", "band_val")
        .agg(F.count("*").alias("bc"))
        .where(F.col("bc") <= MAX_BAND_BUCKET)
        .select("band_idx", "band_val")
    )
    cand = (
        new.join(osz, ["band_idx", "band_val"], "left_semi")
        .join(
            og.select("old_id", "band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        .select(F.col("doc_id").alias("new_id"), "old_id")
        .distinct()
    )
    a = ah.select(
        F.col("doc_id").alias("old_id"),
        F.col("ahash_hi").alias("hi_a"),
        F.col("ahash_lo").alias("lo_a"),
    )
    b = ah.select(
        F.col("doc_id").alias("new_id"),
        F.col("ahash_hi").alias("hi_b"),
        F.col("ahash_lo").alias("lo_b"),
    )
    ham = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    return (
        cand.join(a, "old_id")
        .join(b, "new_id")
        .select("new_id", "old_id", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= IMAGE_HAMMING_MAX)
        .groupBy("new_id")
        .agg(
            F.min("old_id").alias("dup_of"),
            F.min("hamming").alias("best_hamming"),
        )
        .orderBy("new_id")
    )


# ---------------------------------------------------------------------------
# Transitive image dedup — the q69/q70 analog for the image modality.
# q111 emits verified pairwise matches; a burst of N recompressions of
# one image forms an N-clique (or a chain, when successive edits drift
# past the Hamming bound pairwise but neighbor within it), and the
# cluster-correct decision keeps exactly ONE survivor per connected
# component. Reuses dedup.connected_components: the iteration runs on
# the (id, label) pair graph only — orders of magnitude smaller than
# the corpus — and the corpus pays one id-keyed left join at the end.
# ---------------------------------------------------------------------------


@register(
    "q117_image_dedup_keep",
    "WITH RECURSIVE " + _image_pairs_cte_duck() + ","
    " ivp AS (SELECT a_id, b_id FROM ham"
    f" WHERE hamming <= {IMAGE_HAMMING_MAX}),"
    " isym AS (SELECT a_id AS u, b_id AS v FROM ivp"
    " UNION ALL SELECT b_id, a_id FROM ivp),"
    " ireach(u, v) AS (SELECT u, v FROM isym"
    " UNION SELECT r.u, s.v FROM ireach r JOIN isym s ON r.v = s.u),"
    " ilabels AS (SELECT u AS doc_id,"
    " CAST(least(u, min(v)) AS BIGINT) AS rep FROM ireach GROUP BY u)"
    " SELECT d.doc_id,"
    " CAST(coalesce(l.rep, d.doc_id) AS BIGINT) AS img_rep,"
    " (l.doc_id IS NULL OR l.rep = d.doc_id) AS keep"
    " FROM documents d LEFT JOIN ilabels l ON d.doc_id = l.doc_id"
    " ORDER BY d.doc_id",
    doc="Transitive image dedup keep-list (q69/q70 for the image"
    " modality): connected components over the q111 verified perceptual"
    " pair graph label every image with its family's min doc_id"
    " (img_rep = itself outside the graph), and keep = 'is the family"
    " representative' — a burst of N recompressions of one image"
    " collapses to exactly one survivor, which pairwise keep-lists"
    " cannot guarantee. Label propagation (hash-min + pointer-doubling"
    " fallback) iterates on the tiny (id, label) pair graph only; the"
    " corpus contributes one id-keyed left join. Oracle: recursive-CTE"
    " reachability over the same bit-exact pair chain.",
)
def q117(spark, sf_dir):
    from smartbulkcopy_spark.pipeline.dedup import connected_components

    pairs = image_near_dup_pairs(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(spark, pairs).select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("rep")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep", "doc_id").cast("long").alias("img_rep"),
            (F.col("rep").isNull() | (F.col("rep") == F.col("doc_id"))).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-14 stage: image contamination screen — the q170/q177 shape for
# the image modality, on the q110/q114 machinery. Which TRAINING images
# are perceptual near-duplicates of the held-out eval source's images
# (an eval benchmark's screenshots/figures leaking into a training
# crawl are exactly as poisonous as its text). The eval fingerprint
# index keeps one GROUP REPRESENTATIVE per distinct 64-bit hash per
# band (verbatim eval mass collapses to one rep — Hamming to the rep
# equals Hamming to every member, the q114 output-identity argument),
# and per the q202 lesson this path applies NO bucket cap: a hot eval
# fingerprint is the contamination signal, not boilerplate noise. The
# fanout is bounded by DISTINCT eval hashes per band value and every
# verify is two-longs Hamming arithmetic.
# ---------------------------------------------------------------------------

from smartbulkcopy_spark.pipeline.dedup import (  # noqa: E402
    WINNOW_EVAL_SOURCE,
)


def image_contamination_screen(spark, sf_dir):
    """(doc_id, dup_of, best_hamming, n_eval_dups) per CONTAMINATED
    training image: the lowest-id eval near-duplicate, the closest
    Hamming distance, and how many distinct eval images it matches
    (Hamming <= IMAGE_HAMMING_MAX of 64 ahash bits).

    Scale (two-level, the round-12 q111/q112 rule applied to a SCREEN):
    Hamming is a pure function of the signature pair, so the banded
    train x eval-rep equi-join runs over DISTINCT train signatures, and
    member docs fan back in by signature afterwards — one id-keyed
    join. Verbatim duplication mass therefore never widens the pair
    join on either side (both sides collapse to distinct sigs), the
    failure axis the round-13 tail probe measured on the row-level
    spelling (verbatim exponent 1.35 solo). The screen stays CAP-FREE
    per the q202 lesson — a hot eval fingerprint is the signal — and
    the residual ambient cost is distinct-sig x distinct-sig bucket
    collisions in the 4x16-bit MIH band space (exact recall to Hamming
    3, probabilistic above), killed map-side by the hamming filter
    BEFORE any candidate dedup shuffle. Corpus fingerprints ONCE
    (eager — the sig dedup and the member fan-back read it)."""
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    ah = eager(
        image_ahash(_blobs(spark, sf_dir), "doc_id", "blob")
        .select("doc_id", "ahash_hi", "ahash_lo")
        .join(src, "doc_id")
    )
    is_ev = F.col("source") == WINNOW_EVAL_SOURCE
    # level 1: distinct signatures per side (eval reps keep min doc_id
    # as the reported partner; train sigs are pure join identity)
    esig = (
        ah.where(is_ev)
        .groupBy("ahash_hi", "ahash_lo")
        .agg(F.min("doc_id").alias("eval_id"))
    )
    tsig = (
        ah.where(~is_ev)
        .select("ahash_hi", "ahash_lo")
        .distinct()
        .select(
            F.col("ahash_hi").alias("hi_t"), F.col("ahash_lo").alias("lo_t")
        )
    )

    def _bands(df, hi, lo):
        return df.select(
            "*",
            F.posexplode(
                F.array(
                    *[
                        F.expr(
                            f"shiftright({hi if b < 2 else lo},"
                            f" {AHASH_BAND_BITS * (b % 2)}) & 65535"
                        )
                        for b in range(AHASH_BANDS)
                    ]
                )
            ).alias("band_idx", "band_val"),
        )

    ev = _bands(
        esig.select(
            "eval_id",
            F.col("ahash_hi").alias("hi_e"),
            F.col("ahash_lo").alias("lo_e"),
        ),
        "hi_e",
        "lo_e",
    )
    tb = _bands(tsig, "hi_t", "lo_t")
    ham = F.expr("bit_count(hi_t ^ hi_e) + bit_count(lo_t ^ lo_e)")
    # hamming filter BEFORE the distinct: ambient bucket collisions die
    # map-side in the join stage; only real near-dup sig pairs shuffle.
    # The eval index is BROADCAST pinned: a held-out eval suite is
    # corpus-independent (fixed MBs at any training scale — the fixture
    # src0 stand-in is the only side that inflates with the probe), and
    # AQE left to its own stats flips this borderline join between BHJ
    # and SMJ run-to-run (measured 4-22 s at disjoint 32x). Broadcast
    # makes the band probe a map-side hash lookup, so the train side
    # never shuffles at all.
    sig_hits = (
        tb.join(F.broadcast(ev), ["band_idx", "band_val"])
        .select("hi_t", "lo_t", "eval_id", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= IMAGE_HAMMING_MAX)
        .distinct()
        .groupBy("hi_t", "lo_t")
        .agg(
            F.min("eval_id").cast("long").alias("dup_of"),
            F.min("hamming").cast("long").alias("best_hamming"),
            F.countDistinct("eval_id").cast("long").alias("n_eval_dups"),
        )
    )
    # level 2: members fan back in by signature (id-keyed equi-join)
    members = ah.where(~is_ev).select(
        "doc_id",
        F.col("ahash_hi").alias("hi_t"),
        F.col("ahash_lo").alias("lo_t"),
    )
    return (
        members.join(sig_hits, ["hi_t", "lo_t"])
        .select("doc_id", "dup_of", "best_hamming", "n_eval_dups")
        .orderBy("doc_id")
    )


def _image_contamination_oracle() -> str:
    """DuckDB replay of image_contamination_screen, drafted with the
    builder (round-14 registration wires it up): same decode -> ahash
    chain, same TWO-LEVEL distinct-signature screen (banded eval-rep
    index x distinct train sigs, member fan-back by signature), same
    cap-free semantics."""
    band_case = " CASE " + " ".join(
        f"WHEN t.b = {b} THEN {_ahash_band_duck(b)}"
        for b in range(AHASH_BANDS)
    ) + " END"
    return (
        "WITH " + _ahash_cte_duck() + ","
        " sa AS (SELECT a.doc_id, s.source, a.ahash_hi, a.ahash_lo"
        " FROM ah a JOIN (SELECT doc_id, source FROM documents) s"
        " ON s.doc_id = a.doc_id),"
        " esig AS (SELECT ahash_hi, ahash_lo, min(doc_id) AS eval_id"
        f" FROM sa WHERE source = '{WINNOW_EVAL_SOURCE}'"
        " GROUP BY ahash_hi, ahash_lo),"
        " tsig AS (SELECT DISTINCT ahash_hi AS hi_t, ahash_lo AS lo_t"
        f" FROM sa WHERE source != '{WINNOW_EVAL_SOURCE}'),"
        " ev AS (SELECT e.eval_id, e.ahash_hi AS hi_e,"
        " e.ahash_lo AS lo_e, t.b AS band_idx,"
        + band_case.replace("ahash_hi", "e.ahash_hi").replace(
            "ahash_lo", "e.ahash_lo"
        )
        + " AS band_val FROM esig e"
        " CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(b)),"
        " tb AS (SELECT hi_t, lo_t, t.b AS band_idx,"
        + band_case.replace("ahash_hi", "hi_t").replace(
            "ahash_lo", "lo_t"
        )
        + " AS band_val FROM tsig"
        " CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(b)),"
        " sig_hits AS (SELECT hi_t, lo_t,"
        " CAST(min(eval_id) AS BIGINT) AS dup_of,"
        " min(hamming) AS best_hamming,"
        " CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_dups"
        " FROM (SELECT DISTINCT x.hi_t, x.lo_t, e.eval_id,"
        " CAST(bit_count(xor(x.hi_t, e.hi_e))"
        " + bit_count(xor(x.lo_t, e.lo_e)) AS BIGINT) AS hamming"
        " FROM tb x JOIN ev e ON x.band_idx = e.band_idx"
        " AND x.band_val = e.band_val"
        f" WHERE bit_count(xor(x.hi_t, e.hi_e))"
        f" + bit_count(xor(x.lo_t, e.lo_e)) <= {IMAGE_HAMMING_MAX})"
        " GROUP BY hi_t, lo_t)"
        " SELECT m.doc_id, h.dup_of, h.best_hamming, h.n_eval_dups"
        " FROM sa m JOIN sig_hits h"
        " ON m.ahash_hi = h.hi_t AND m.ahash_lo = h.lo_t"
        f" WHERE m.source != '{WINNOW_EVAL_SOURCE}'"
        " ORDER BY m.doc_id"
    )


# ---------------------------------------------------------------------------
# Round-14 stage: cross-modal coverage reconciliation — the q57 shape
# widened across modalities. Every document should carry (a) a
# NON-DEGENERATE image fingerprint (the decode succeeded and the ahash
# has above-mean structure: 1 <= n_set <= 63 — an all-equal-luminance
# image hashes to 0 or would need all 64 bits above mean, both
# degenerate for near-dup work) and (b) an embedding row (vec_id =
# doc_id, the q57 contract). The per-source rollup localizes WHICH
# modality dropped rows for WHICH slice of the corpus — the keyed
# cross-table twin of the reference's row-count reconciliation
# (client/SmartBulkCopy.cs:1175-1238), one level up.
# ---------------------------------------------------------------------------


def cross_modal_coverage_audit(spark, sf_dir):
    """(source, n_docs, n_imaged, n_embedded, n_complete, complete_ppm)
    per source: document count, docs with a non-degenerate image
    fingerprint, docs with an embedding row, docs with both, and the
    integer ppm share of fully-covered docs.

    Scale: the fingerprint side reuses the eager'd ahash table (one
    mapInPandas pass); the embedding side is an id-only projection;
    both attach to documents by LEFT joins on doc_id (ids and two
    longs — payloads never shuffle); the rollup is a tiny per-source
    aggregation."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    img = (
        image_ahash(_blobs(spark, sf_dir), "doc_id", "blob")
        .where((F.col("n_set") >= 1) & (F.col("n_set") <= 63))
        .select("doc_id")
        .withColumn("has_img", F.lit(1))
    )
    emb = (
        table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("has_emb", F.lit(1))
    )
    per = docs.join(img, "doc_id", "left").join(emb, "doc_id", "left")
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("has_img"), F.lit(0)))
            .cast("long")
            .alias("n_imaged"),
            F.sum(F.coalesce(F.col("has_emb"), F.lit(0)))
            .cast("long")
            .alias("n_embedded"),
            F.sum(
                F.coalesce(F.col("has_img"), F.lit(0))
                * F.coalesce(F.col("has_emb"), F.lit(0))
            )
            .cast("long")
            .alias("n_complete"),
        )
        .select(
            "source",
            "n_docs",
            "n_imaged",
            "n_embedded",
            "n_complete",
            F.expr("n_complete * 1000000 DIV n_docs")
            .cast("long")
            .alias("complete_ppm"),
        )
        .orderBy("source")
    )


def _cross_modal_oracle() -> str:
    """DuckDB replay of cross_modal_coverage_audit, drafted with the
    builder (round-14 registration wires it up): same ahash chain, the
    same n_set degeneracy bounds, the same id-keyed reconciliation."""
    return (
        "WITH " + _ahash_cte_duck() + ","
        " img AS (SELECT doc_id FROM ah"
        " WHERE n_set >= 1 AND n_set <= 63),"
        " emb AS (SELECT vec_id AS doc_id FROM embeddings),"
        " per AS (SELECT d.source,"
        " CASE WHEN i.doc_id IS NOT NULL THEN 1 ELSE 0 END AS has_img,"
        " CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS has_emb"
        " FROM documents d LEFT JOIN img i ON i.doc_id = d.doc_id"
        " LEFT JOIN emb e ON e.doc_id = d.doc_id)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(sum(has_img) AS BIGINT) AS n_imaged,"
        " CAST(sum(has_emb) AS BIGINT) AS n_embedded,"
        " CAST(sum(has_img * has_emb) AS BIGINT) AS n_complete,"
        " CAST(sum(has_img * has_emb) * 1000000 // count(*) AS BIGINT)"
        " AS complete_ppm"
        " FROM per GROUP BY source ORDER BY source"
    )
