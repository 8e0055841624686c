"""Multimodal (binary) column surface for the training-data pipeline.

Images / audio / video are opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-standard layout (one row per asset, bytes inline or
an object-store pointer). Everything metadata-shaped stays in Catalyst
(hashing, lengths, grouped stats, content-hash dedup: all JVM-side, one
shuffle per groupBy); only actual DECODING crosses into Python, as an
Arrow-batched ``mapInPandas`` whose schema/batch plumbing is real and
tested even where the codec itself is stubbed.

Decoder tiers:

* ``fake_decode`` — deterministic byte arithmetic (dims from the first two
  content bytes, a luma proxy from a byte sum). Pure function of the bytes,
  so the whole mapInPandas pipeline is DuckDB-oracle-checkable end to end —
  the plumbing is verified, not just smoke-tested.
* ``pillow_decode`` — the production shape: decodes real images via PIL,
  which is NOT installed in this container → raises NotImplementedError at
  call time with instructions; import of this module never fails.

Scale notes: content bytes never shuffle in the metadata queries (hash and
length are computed at scan, columns pruned before any exchange); the
mapInPandas stage is embarrassingly parallel per input partition and emits
only small feature rows. Dedup groups on the 16-byte md5, not the content.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "media_id bigint, modality string, width int, height int, "
    "n_pixels bigint, luma double, fingerprint string"
)

MODALITIES = ("image", "audio", "video")


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from ``documents``: the text bytes stand in
    for encoded content (the fixtures ship no real binaries). Schema is the
    real thing: (media_id, modality, content binary, meta struct)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.col("n_chars").cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


def content_fingerprint(content: F.Column) -> F.Column:
    """16-byte content hash — the dedup key. md5 over the raw bytes, engine-
    portable (DuckDB md5(blob/text) agrees on identical bytes)."""
    return F.md5(content)


def media_dedup_summary(media: DataFrame) -> DataFrame:
    """Exact content dedup: group on the fingerprint, never the content.
    One shuffle of (16-byte hash, id) pairs regardless of asset size."""
    groups = media.groupBy(content_fingerprint(F.col("content")).alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_id").alias("keeper"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_copies").cast("bigint").alias("n_assets"),
        (F.sum("n_copies") - F.count(F.lit(1))).cast("bigint").alias("n_dupes"),
        F.sum("keeper").cast("bigint").alias("keeper_id_sum"),
    )


def media_stats_by_modality(media: DataFrame) -> DataFrame:
    """Per-modality asset stats: counts, byte volume, distinct contents."""
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("content")).cast("bigint").alias("total_bytes"),
            F.countDistinct(content_fingerprint(F.col("content"))).alias("n_distinct"),
            F.max(F.col("meta.n_bytes")).cast("bigint").alias("max_meta_bytes"),
        )
        .orderBy("modality")
    )


# --- decoders ------------------------------------------------------------
def fake_decode(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image codec: (width, height, luma).
    width/height from the first two bytes, luma = mean byte value / 255."""
    b0 = content[0] if len(content) > 0 else 0
    b1 = content[1] if len(content) > 1 else 0
    width = 64 + (b0 % 192)
    height = 64 + (b1 % 192)
    luma = (sum(content) / len(content) / 255.0) if content else 0.0
    return width, height, luma


def pillow_decode(content: bytes) -> tuple[int, int, float]:
    """Production decoder — requires pillow. The mapInPandas plumbing around
    it is identical to ``fake_decode``'s; ``auto_decode`` (the default)
    probes for it and engages it wherever the package exists."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires pillow (pip install pillow); "
            "use fake_decode for plumbing tests in codec-less environments"
        ) from e
    import io as _io

    from PIL import Image

    img = Image.open(_io.BytesIO(content)).convert("L")
    px = list(img.getdata())
    return img.width, img.height, (sum(px) / len(px) / 255.0) if px else 0.0


_CODEC_PROBE: list[str] = []  # memo: failed imports are NOT cached by Python,
# so probing per row in a codec-less environment would rescan sys.path for
# every decoded asset; one probe per interpreter (driver + each worker)


def probe_codec() -> str:
    """Probe-and-fallback, the ml/models.py xgboost pattern: 'pillow' when
    PIL imports, 'fake' in codec-less environments. Memoized per
    interpreter (tests monkeypatching sys.modules['PIL'] can clear
    ``_CODEC_PROBE`` to re-probe)."""
    if not _CODEC_PROBE:
        try:
            import PIL  # noqa: F401

            _CODEC_PROBE.append("pillow")
        except ImportError:
            _CODEC_PROBE.append("fake")
    return _CODEC_PROBE[0]


def auto_decode(content: bytes) -> tuple[int, int, float]:
    """Default decoder: the real pillow codec when the package is installed
    AND the bytes parse as an image; the deterministic fake codec otherwise.
    The synthetic fixtures are not valid image streams, so they take the
    fake path on EVERY environment — oracle results are codec-independent —
    while real JPEG/PNG bytes decode for real wherever pillow exists."""
    if probe_codec() == "pillow":
        try:
            return pillow_decode(content)
        except Exception:
            # not a decodable image stream -> deterministic fallback
            pass
    return fake_decode(content)


def extract_media_features(
    media: DataFrame,
    decode: Callable[[bytes], tuple[int, int, float]] = auto_decode,
) -> DataFrame:
    """The decode/feature stage: Arrow-batched ``mapInPandas`` over
    (media_id, modality, content) emitting small typed feature rows.

    Column-pruned input (content is read but never shuffled), per-partition
    parallelism, bounded memory per batch (Arrow slices) — the shape that
    holds when 'content' is megabytes per row and the cluster has 1000
    executors. ``decode`` is pluggable: fake for tests, pillow/ffmpeg-backed
    in production."""
    pruned = media.select("media_id", "modality", "content")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                raw = bytes(content) if content is not None else b""
                w, h, luma = decode(raw)
                feats.append(
                    (
                        int(mid),
                        modality,
                        w,
                        h,
                        w * h,
                        round(luma, 6),
                        hashlib.md5(raw).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id",
                    "modality",
                    "width",
                    "height",
                    "n_pixels",
                    "luma",
                    "fingerprint",
                ],
            )

    return pruned.mapInPandas(_batches, MEDIA_FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"

RESIZED_SCHEMA = (
    "media_id bigint, modality string, content binary, width int, height int, luma double"
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, modality: str = "video"
) -> DataFrame:
    """Frame sampling: one asset row fans out to ceil(len/frame_bytes) frame
    rows — the video-pipeline shape (ffmpeg keyframe extraction in
    production; deterministic byte-chunking here so the fan-out plumbing is
    oracle-checkable). mapInPandas emits frames per input partition: no
    shuffle to fan out, and downstream ops see small per-frame rows instead
    of whole-asset blobs."""
    pruned = media.filter(F.col("modality") == modality).select("media_id", "content")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                for i in range(0, (len(raw) + frame_bytes - 1) // frame_bytes):
                    rows.append((int(mid), i, raw[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return pruned.mapInPandas(_batches, FRAME_SCHEMA)


def resize_media(
    media: DataFrame,
    max_bytes: int = 128,
    decode: Callable[[bytes], tuple[int, int, float]] = auto_decode,
) -> DataFrame:
    """Resize/downsample stage: binary in → smaller binary out plus re-decoded
    features of the RESIZED content. The fake transform truncates to
    ``max_bytes`` (a real one re-encodes at lower resolution); either way the
    contract is identical — content column replaced, features recomputed, row
    count preserved — which is what the oracle verifies."""
    pruned = media.select("media_id", "modality", "content")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                raw = bytes(content) if content is not None else b""
                resized = raw[:max_bytes]
                w, h, luma = decode(resized)
                rows.append((int(mid), modality, resized, w, h, round(luma, 6)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "modality", "content", "width", "height", "luma"],
            )

    return pruned.mapInPandas(_batches, RESIZED_SCHEMA)


def audio_window_energy(
    media: DataFrame, window_bytes: int = 25, silence_threshold: int = 2400
) -> DataFrame:
    """Audio windowing: fixed-size sample windows per asset with per-window
    energy and a silence flag — the shape of VAD/silence-trimming in a real
    audio pipeline (there, windows are PCM frames and energy is RMS; here,
    deterministic byte arithmetic so the windowing is oracle-checkable).

    Pure Catalyst, no Python: bytes come from ``array_remove(split(...))``
    (not a higher-order lambda — those are CodegenFallback), the explode is
    shuffle-free, and the per-(asset, window) groupBy partial-aggregates
    map-side, so only window rows — corpus_bytes / window_bytes, each 3 ints
    wide — ever reach an exchange. Ragged tails score as written (fewer
    bytes → lower energy → usually "silent"); production would rescale by
    window fill.
    """
    chars = (
        media.filter(F.col("modality") == "audio")
        .select("media_id", F.col("content").cast("string").alias("__s"))
        .select(
            "media_id",
            F.posexplode(F.array_remove(F.split("__s", ""), "")).alias("pos", "ch"),
        )
    )
    return (
        chars.groupBy(
            "media_id", F.floor(F.col("pos") / window_bytes).alias("win")
        )
        .agg(F.sum(F.ascii("ch")).alias("energy"))
        .withColumn("is_silent", (F.col("energy") < silence_threshold).cast("int"))
    )


PHASH_SCHEMA = "media_id bigint, modality string, phash int"


def media_phash(media: DataFrame) -> DataFrame:
    """Block-mean perceptual hash (aHash family) at the decode boundary:
    the content bytes are split into 16 contiguous blocks; bit i is set iff
    block i's mean exceeds the whole-asset mean. Near-duplicate assets
    (re-encodes, small edits) collide on the hash, so near-dup detection is
    a groupBy on a 16-bit key — dd3's no-pair-join shape for binary content.

    The comparison is integer cross-multiplication (block_sum · n >
    total · block_len), never a float mean — which makes the Python decode
    side and the DuckDB oracle agree exactly, byte for byte.
    """
    pruned = media.select("media_id", "modality", "content")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                raw = bytes(content) if content is not None else b""
                n = len(raw)
                total = sum(raw)
                ph = 0
                for i in range(16):
                    lo, hi = n * i // 16, n * (i + 1) // 16
                    if hi > lo and sum(raw[lo:hi]) * n > total * (hi - lo):
                        ph |= 1 << i
                rows.append((int(mid), modality, ph))
            yield pd.DataFrame(rows, columns=["media_id", "modality", "phash"])
            rows = []

    return pruned.mapInPandas(_batches, PHASH_SCHEMA)
