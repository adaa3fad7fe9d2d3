"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (north-star LLM-pipeline family; the reference's
only multimodal surface is the per-page PNG rasterization,
`streamlit_app.py:76-77`).

Design: every modality row is (id, modality, content: binary,
meta: struct) — partition-prunable by modality, column-pruned when a
query touches metadata only. Decode / feature-extract / resize /
frame-sample run as ``mapInPandas`` over Arrow batches (one Python
worker per partition; binary payloads never pass through the JVM
row format twice).

The actual codecs (PIL, ffmpeg, soundfile) are NOT in this container,
so the decode kernels are gated behind import-try with clearly marked
deterministic fakes — the Spark-side plumbing (schemas, batch shapes,
partitioning, UDF signatures) is real and tested, per the build
brief. Swap `_fake_*` for the real libs on a cluster image and
nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401,PLC0415

        return True
    except ImportError:
        return False


def _fake_decode_image(content: bytes) -> tuple[int, int, bytes]:
    """DETERMINISTIC FAKE decoder (no PIL in container): derives a
    (width, height, grey-level) triple from the content hash and
    returns a tiny fake raster = 64 bytes of the md5 stream."""
    h = hashlib.md5(content or b"").digest()
    w, hgt = 16 + h[0] % 64, 16 + h[1] % 64
    raster = (hashlib.md5(content + b":raster").digest() * 4)[:64]
    return w, hgt, raster


def _fake_resize(raster: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    return hashlib.md5(raster + _struct.pack("<4i", w, h, tw, th)).digest()


def decode_images(
    media: DataFrame, out_col: str = "raster", force_fake: bool = False
) -> DataFrame:
    """image binary -> decoded raster + measured dims. Real PIL when
    importable; deterministic fake otherwise (same schema/batching).
    ``force_fake`` pins the md5 kernel regardless of what's installed —
    required by oracle-checked queries whose DuckDB twin reproduces the
    fake arithmetic (and whose fixture payloads aren't real images)."""
    use_real = _have_pil() and not force_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real:
            import io  # noqa: PLC0415

            from PIL import Image  # noqa: PLC0415
        for pdf in batches:
            ws, hs, rasters = [], [], []
            for content in pdf["content"]:
                content = bytes(content) if content is not None else b""
                if use_real:
                    img = Image.open(io.BytesIO(content))
                    ws.append(img.width)
                    hs.append(img.height)
                    rasters.append(img.convert("L").tobytes())
                else:
                    w, h, raster = _fake_decode_image(content)
                    ws.append(w)
                    hs.append(h)
                    rasters.append(raster)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    out_col: rasters,
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, schema=f"media_id long, width int, height int, {out_col} binary"
    )


def resize_images(
    decoded: DataFrame, target_w: int, target_h: int, raster_col: str = "raster"
) -> DataFrame:
    """Resize kernel over decoded rasters (fake: content-addressed)."""
    use_real = _have_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raster, w, h in zip(pdf[raster_col], pdf["width"], pdf["height"]):
                raster = bytes(raster)
                if use_real:
                    from PIL import Image  # noqa: PLC0415

                    img = Image.frombytes("L", (w, h), raster)
                    out.append(img.resize((target_w, target_h)).tobytes())
                else:
                    out.append(_fake_resize(raster, w, h, target_w, target_h))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "resized": out}
            )

    return decoded.mapInPandas(run, schema="media_id long, resized binary")


def sample_video_frames(
    media: DataFrame, every_nth: int = 10, max_frames: int = 8
) -> DataFrame:
    """video binary -> one row per sampled frame (frame_no, frame
    binary). Fake: frames are content-addressed slices; real: ffmpeg/
    decord behind the same interface. The explode happens inside the
    Arrow batch — no JVM row amplification before the sample."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                content = bytes(content) if content is not None else b""
                n = (meta or {}).get("n_frames") or 0
                for k, frame_no in enumerate(range(0, n, every_nth)):
                    if k >= max_frames:
                        break
                    frame = hashlib.md5(
                        content + b":frame:" + str(frame_no).encode()
                    ).digest()
                    rows.append((mid, frame_no, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.filter(F.col("modality") == "video").mapInPandas(
        run, schema="media_id long, frame_no int, frame binary"
    )


def media_features(decoded: DataFrame, raster_col: str = "raster") -> DataFrame:
    """Cheap per-image features computed JVM-side on the binary column
    (no Python): byte length, content hash — the metadata a curation
    pipeline filters on before paying for real feature extraction."""
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.length(F.col(raster_col)).alias("raster_bytes"),
        F.sha2(F.col(raster_col).cast("binary"), 256).alias("raster_sha256"),
        F.lower(F.hex(F.col(raster_col))).alias("raster_hex"),
        (F.col("width") * F.col("height")).alias("pixels"),
    )
