"""Deterministic image augmentation — the training-data fan-out step
(flip / rotate / center-crop), over the engine's own codec.

Contrastive and supervised vision training multiplies each source image
into several deterministic views; at 10^12 rows the fan-out must happen
executor-side with no shuffle (each output row derives from exactly one
input row). This operator decodes once per image, applies every requested
view to the in-memory array, and re-encodes with the same codec — one
`mapInPandas` projection, bytes never join anything.

All views are exact pixel-index permutations/selections (no resampling, no
float math), so round-trip identities hold bit-for-bit and are pinned by
tests: hflip∘hflip = id, rot90⁴ = id, crop keeps the exact center block.
Non-PNG/QNT formats yield no rows for that image (same honest env-limit
policy as multimodal.decode_stats).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

AUG_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("aug", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
])

CROP_FRAC = 2  # center-crop keeps the middle 1/CROP_FRAC of each side


def apply_view(px: np.ndarray, aug: str) -> np.ndarray:
    """One named deterministic view of an (h, w, 3) array."""
    if aug == "identity":
        return px
    if aug == "hflip":
        return px[:, ::-1]
    if aug == "vflip":
        return px[::-1, :]
    if aug == "rot90":
        return np.rot90(px)  # CCW, axes (0, 1)
    if aug == "crop":
        h, w, _ = px.shape
        ch, cw = h // CROP_FRAC, w // CROP_FRAC
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return px[y0 : y0 + ch, x0 : x0 + cw]
    raise ValueError(f"unknown aug {aug!r}")


DEFAULT_VIEWS = ("identity", "hflip", "vflip", "rot90", "crop")


def augment_images(images: DataFrame,
                   views: tuple[str, ...] = DEFAULT_VIEWS) -> DataFrame:
    """(image_id, bytes, fmt) → one row per (image, view): decode once,
    emit every view re-encoded. Pure projection — no shuffle at any scale."""
    import pandas as pd

    views = tuple(views)

    def run(batches):
        from ..data import images as codec

        for pdf in batches:
            out = {k: [] for k in
                   ("image_id", "aug", "bytes", "w", "h", "fmt")}
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = codec.decode(bytes(buf), fmt)
                except NotImplementedError:
                    continue
                for aug in views:
                    view = np.ascontiguousarray(apply_view(px, aug))
                    h, w, _ = view.shape
                    out["image_id"].append(iid)
                    out["aug"].append(aug)
                    out["bytes"].append(codec.encode(view, fmt))
                    out["w"].append(w)
                    out["h"].append(h)
                    out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=AUG_SCHEMA
    )
