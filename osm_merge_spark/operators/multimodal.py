"""Multimodal payload operators — image bytes as opaque binary columns with
typed metadata (BASELINE.json input_hint schema), processed in Arrow
batches via mapInPandas.

Design rules for 10^12-image scale:
  - payload bytes NEVER enter joins/shuffles of the conflation path —
    operators here run on slim (image_id, bytes, w, h, fmt) projections
    and results re-attach by image_id equi-join (operators re-shuffle ids,
    not pixels);
  - all decode work is batch-vectorized NumPy inside mapInPandas (one
    Python entry per Arrow batch);
  - codecs are the engine's own deterministic PNG/QNT (data/images.py);
    formats needing external libs (JPEG, video frame-sampling) raise
    NotImplementedError at the decode step — the Spark plumbing (schema,
    batching, partitioning) is identical and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

DECODE_STATS_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("decode_ok", BooleanType()),
])

VERIFY_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("psnr_db", DoubleType()),
    StructField("caption_ok", BooleanType()),
    StructField("ok", BooleanType()),
])

from pyspark.sql.types import BinaryType  # noqa: E402

RESIZE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
])


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image decode + channel means. Input: (image_id, bytes, fmt)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        from ..data import images as codec

        for pdf in batches:
            out = {"image_id": [], "mean_r": [], "mean_g": [], "mean_b": [],
                   "decode_ok": []}
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                out["image_id"].append(iid)
                try:
                    px = codec.decode(bytes(buf), fmt)
                    m = px.reshape(-1, 3).mean(axis=0)
                    out["mean_r"].append(float(m[0]))
                    out["mean_g"].append(float(m[1]))
                    out["mean_b"].append(float(m[2]))
                    out["decode_ok"].append(True)
                except NotImplementedError:
                    out["mean_r"].append(float("nan"))
                    out["mean_g"].append(float("nan"))
                    out["mean_b"].append(float("nan"))
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=DECODE_STATS_SCHEMA
    )


def verify_payload(images: DataFrame, psnr_min: float = 40.0) -> DataFrame:
    """X15: the per-row invariant — decoded pixels vs the deterministic
    reference pixels (PSNR ≥ psnr_min; ∞ for lossless) + caption equality
    under re-synthesis. Input: synth table with (image_id, i, w, h, fmt,
    bytes, caption)."""
    import pandas as pd

    def expected_caption(i: int) -> str:
        """Python mirror of synth._caption (md5-pick word chain) — an
        independent recomputation, not a tautology."""
        import hashlib

        from ..data.synth import _SUF, _W1, _W2

        def pick(arr, salt):
            h = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)
            return arr[h % len(arr)]

        return f"{pick(_W1, 'w1')} {pick(_W2, 'w2')} {pick(_SUF, 'w3')}"

    def run(batches):
        from ..data import images as codec

        for pdf in batches:
            out = {"image_id": [], "psnr_db": [], "caption_ok": [], "ok": []}
            # zip over columns, not iterrows: iterrows materializes a
            # Series per row (~5-10× per-row overhead vs tuple unpacking)
            for iid, i, w, h, fmt, buf, cap in zip(
                pdf["image_id"], pdf["i"], pdf["w"], pdf["h"],
                pdf["fmt"], pdf["bytes"], pdf["caption"],
            ):
                ref = codec.pixels_for_seed(int(i), int(w), int(h))
                got = codec.decode(bytes(buf), fmt)
                psnr = codec.psnr_db(ref, got)
                cap_ok = bool(cap == expected_caption(int(i)))
                out["image_id"].append(iid)
                out["psnr_db"].append(psnr)
                out["caption_ok"].append(cap_ok)
                out["ok"].append(cap_ok and psnr >= psnr_min)
            yield pd.DataFrame(out)

    return images.select("image_id", "i", "w", "h", "fmt", "bytes", "caption") \
        .mapInPandas(run, schema=VERIFY_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the same fmt — pure NumPy
    index arithmetic (no image library needed). Video frame-sampling and
    JPEG re-encode raise NotImplementedError from the codec layer."""
    import numpy as np
    import pandas as pd

    def run(batches):
        from ..data import images as codec

        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            # zip, not iterrows — same per-row-overhead fix as decode_stats
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = codec.decode(bytes(buf), fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = px[yi][:, xi]
                out["image_id"].append(iid)
                out["bytes"].append(codec.encode(small, fmt))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB: no video codec ships in this
    environment. The operator contract (schema + partition shape) is real;
    the decode step raises."""

    def run(batches):
        raise NotImplementedError(
            "video decode requires an external codec library not present "
            "in this environment; plumbing is schema-complete"
        )
        yield  # pragma: no cover

    return videos.mapInPandas(run, schema=videos.schema)


def attach_payload(slim_result: DataFrame, images_with_bytes: DataFrame,
                   key: str = "image_id") -> DataFrame:
    """Re-attach the binary payload AFTER the conflation/join pipeline —
    the join shuffles ids + metadata only; bytes move once, here."""
    return slim_result.join(
        images_with_bytes.select(key, "bytes"), key, "left"
    )


def tile_image_stats(images_with_bytes: DataFrame, grid=None) -> DataFrame:
    """Raster rollup over REAL pixels: decode each image (Arrow-batched),
    assign its covering tile (pure arithmetic — tiles.assign_tiles), and
    aggregate per-tile image counts + mean channel intensities — the
    "statistics per map tile" product of the raster↔vector assignment
    (north rule J10 composed with the decode path).

    Scale shape: pixels never shuffle — decode_stats reduces each image to
    3 doubles executor-side, the tile key is a projection, and the groupBy
    ships 4 numbers per image. Input: (image_id, bytes, fmt, lon, lat)."""
    from ..functions.cells import TileGrid
    from .tiles import assign_tiles

    grid = grid or TileGrid(tile_m=20000.0)
    stats = decode_stats(images_with_bytes.select("image_id", "bytes", "fmt"))
    keyed = assign_tiles(
        images_with_bytes.select("image_id", "lon", "lat"), grid
    ).join(stats, "image_id")
    return (
        keyed.filter(F.col("decode_ok"))
        .groupBy("tile_id")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.avg("mean_r"), 4).alias("avg_r"),
            F.round(F.avg("mean_g"), 4).alias("avg_g"),
            F.round(F.avg("mean_b"), 4).alias("avg_b"),
        )
    )


def audio_features(audio: DataFrame, window: int = 1024) -> DataFrame:
    """Audio feature extraction over opaque binary payloads — the third
    modality of the image/audio/video triplet.

    fmt='pcm16' (raw 16-bit little-endian mono) decodes FOR REAL — raw PCM
    needs no codec library, just a dtype view — and reduces to
    integer-exact features executor-side: sample count, per-file energy
    (Σ s² as int64 — no float accumulation), peak |amplitude|, count of
    clipped samples, and the number of full analysis windows. Compressed
    formats (mp3/flac/ogg) follow the engine's honest env-limit policy:
    schema-complete plumbing, decode raises NotImplementedError.

    100 TB shape: bytes → 5 longs inside one mapInPandas projection;
    payloads never shuffle, features join by id downstream like
    decode_stats' image moments."""
    import pandas as pd

    def run(batches):
        import numpy as np

        for pdf in batches:
            out = {"audio_id": [], "n_samples": [], "energy": [],
                   "peak": [], "n_clipped": [], "n_windows": []}
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"],
                                     pdf["fmt"]):
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio codec {fmt!r} requires an external library "
                        "not present in this environment; pcm16 is the "
                        "real decode path"
                    )
                s = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                out["audio_id"].append(aid)
                out["n_samples"].append(int(s.size))
                out["energy"].append(int((s * s).sum()))
                out["peak"].append(int(np.abs(s).max()) if s.size else 0)
                out["n_clipped"].append(int((np.abs(s) >= 32767).sum()))
                out["n_windows"].append(int(s.size // window))
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run,
        schema="audio_id string, n_samples long, energy long, peak long,"
               " n_clipped long, n_windows long",
    )
