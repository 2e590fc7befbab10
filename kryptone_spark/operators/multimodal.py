"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with struct metadata;
decode/feature-extraction runs in Arrow-batched ``mapInPandas`` so the
Spark-side plumbing (schema, partitioning, batch shape) is real and
tested even though actual codecs (PIL/ffmpeg) are NOT in this
container — the decode step is a clearly-marked deterministic stub
behind an import-try (per round instructions).

Wire format of the deterministic fake media used by tests/synth:
``b"FAKEIMG!" + width:uint16 + height:uint16 + payload`` (and FAKEAUD!
with sample_rate:uint32 + n_samples:uint32).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def make_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    return b"FAKEIMG!" + struct.pack("<HH", width, height) + payload


def make_fake_audio(sample_rate: int, n_samples: int) -> bytes:
    return b"FAKEAUD!" + struct.pack("<II", sample_rate, n_samples)


def _decode_real(data: bytes):  # pragma: no cover - no codecs in sandbox
    """Real image decode: called by ``decode_media`` for blobs that are
    NOT the deterministic fake format, when PIL is importable; raises
    NotImplementedError otherwise (this container ships no codecs)."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL, not present in this container"
        ) from e
    img = Image.open(BytesIO(data))
    return img.size


def decode_media(media: DataFrame) -> DataFrame:
    """Decode headers (stub codecs) via mapInPandas — Arrow batches in,
    Arrow batches out; the exact shape a real decoder plugs into."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": pd.array([None] * len(pdf), dtype="Int32"),
                "height": pd.array([None] * len(pdf), dtype="Int32"),
                "sample_rate": pd.array([None] * len(pdf), dtype="Int32"),
                "n_samples": pd.array([None] * len(pdf), dtype="Int32"),
                "n_bytes": pdf["data"].map(lambda b: 0 if b is None else len(b)),
                "ok": pd.array([False] * len(pdf), dtype="bool"),
            }
            res = pd.DataFrame(out)
            for i, b in enumerate(pdf["data"]):
                if b is None:
                    continue
                # any malformed blob (truncated header, unknown magic,
                # undecodable image) must mark ok=False, never raise —
                # one bad row cannot be allowed to fail the stage
                try:
                    if bytes(b[:8]) == b"FAKEIMG!" and len(b) >= 12:
                        w, h = struct.unpack("<HH", bytes(b[8:12]))
                        res.loc[i, ["width", "height", "ok"]] = [w, h, True]
                    elif bytes(b[:8]) == b"FAKEAUD!" and len(b) >= 16:
                        sr, ns = struct.unpack("<II", bytes(b[8:16]))
                        res.loc[i, ["sample_rate", "n_samples", "ok"]] = [sr, ns, True]
                    elif bytes(b[:8]) not in (b"FAKEIMG!", b"FAKEAUD!"):
                        w, h = _decode_real(bytes(b))
                        res.loc[i, ["width", "height", "ok"]] = [w, h, True]
                except Exception:
                    pass  # ok stays False
            yield res

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Aspect-preserving resize. Stub: rewrites the fake header with the
    clamped dimensions (a real implementation swaps in PIL.thumbnail
    inside the same mapInPandas body)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = r["data"]
                if b is None or bytes(b[:8]) != b"FAKEIMG!":
                    continue
                w, h = struct.unpack("<HH", bytes(b[8:12]))
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": nw,
                        "height": nh,
                        "data": make_fake_image(nw, nh),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "data"])

    return media.where("kind = 'image'").mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video rows: emits (frame_idx, ts_ms) from
    the metadata duration — the UDTF shape (1 row in → N rows out) that
    a real ffmpeg-backed sampler fills with pixel data."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"] or {}
                dur = int(meta.get("duration_ms", "0"))
                for i, ts in enumerate(range(0, dur, every_ms)):
                    rows.append(
                        {"media_id": r["media_id"], "frame_idx": i, "ts_ms": ts}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms"])

    return media.where("kind = 'video'").mapInPandas(_sample, schema=FRAMES_SCHEMA)


def media_dedup(media: DataFrame, data_col: str = "data") -> DataFrame:
    """Exact media dedup: duplicate-blob groups by content hash — the
    binary-column face of dedup.exact_dedup (a 100 TB interleaved
    corpus carries the same image under many URLs). NULL blobs
    (metadata-only rows) are excluded. One shuffle on a 32-hex key with
    map-side partial agg; blobs themselves never shuffle."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col(data_col).isNotNull())
        .select(F.md5(F.col(data_col)).alias("content_hash"), "media_id")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("group_size"),
            F.min("media_id").alias("keep_media_id"),
        )
        .where(F.col("group_size") > 1)
    )


def image_context_pairs(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Image-text pair mining over interleaved spans (the OBELICS /
    caption-mining primitive): for every image span, the nearest
    preceding and nearest following TEXT span in document order —
    (doc_id, src, alt, offset, text_before, text_after). Boundary
    images (no text on a side) carry NULL on that side.

    Shuffle-free by construction: a doc's spans are already colocated
    in its row (the input_hint shape), so the neighbor search is an
    array fold in one projection — no explode-then-window, no exchange
    of the 100 TB span volume. Requires the spans array ordered by
    offset (the corpus contract — `extract.span_audit` flags
    violations): "nearest" is taken as the last/first element of the
    offset-filtered slices."""
    from pyspark.sql import functions as F

    sp = F.col(spans_col)

    def ctx(img):
        before = F.filter(
            sp,
            lambda t: (t["kind"] == "text") & (t["offset"] < img["offset"]),
        )
        after = F.filter(
            sp,
            lambda t: (t["kind"] == "text") & (t["offset"] > img["offset"]),
        )
        # F.get is null out-of-bounds (ANSI-safe): size 0 → index -1 →
        # NULL text_before; empty `after` → NULL text_after
        return F.struct(
            img["media_ref"].alias("src"),
            img["text"].alias("alt"),
            img["offset"].alias("offset"),
            F.get(before, F.size(before) - 1)["text"].alias("text_before"),
            F.get(after, F.lit(0))["text"].alias("text_after"),
        )

    imgs = F.filter(sp, lambda s: s["kind"] == "image")
    return docs.select(
        "doc_id", F.explode(F.transform(imgs, ctx)).alias("__p")
    ).select(
        "doc_id", "__p.src", "__p.alt", "__p.offset",
        "__p.text_before", "__p.text_after",
    )
