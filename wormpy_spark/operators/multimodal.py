"""Multimodal (image) columns: decode / verify / near-dup plumbing.

Images are opaque ``binary`` columns with typed metadata (the exact
input_hint shape). The decode step runs our self-contained codecs
(functions/imageops.py — no Pillow in the container; a real deployment
swaps the codec table for turbojpeg/PIL without touching the Spark
plumbing, which is what this module makes real and tested):

- ``decode_verify``: mapInPandas over (images ⋈ truth): decode bytes,
  check decoded-pixel sha256 + caption equality per row (the
  BASELINE.json per-row invariant), emit shape + a freshly computed
  phash. Arrow batches are bounded by maxRecordsPerBatch so fat binary
  rows never blow executor memory.
- ``phash_neardup_pairs``: 8-band LSH over the 64-bit phash (hamming
  ≤ 7 ⇒ at most 7 bands carry a differing bit ⇒ at least one of the 8
  8-bit bands is equal, pigeonhole) → bucket self-join → exact hamming
  via JVM-side bit_count. The frontier uses this to prune
  visually-duplicate fetches (SURVEY.md §4).

Formats without an available codec yield decode_ok=false rather than
failing the job (the 100 TB posture: bad rows are data, not crashes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imageops import decode_image, phash64

DECODE_SCHEMA = (
    "image_id string, fmt string, w int, h int, decode_ok boolean, "
    "sha_ok boolean, caption_ok boolean, phash long"
)


def decode_verify(images: DataFrame, truth: DataFrame) -> DataFrame:
    """Per-row payload verification: decode + sha/caption equality."""
    joined = images.join(
        truth.select(
            "image_id",
            F.col("pixels_sha256").alias("_sha"),
            F.col("caption").alias("_truth_caption"),
        ),
        on="image_id",
        how="left",
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                out = {
                    "image_id": r["image_id"],
                    "fmt": r["fmt"],
                    "w": int(r["w"]),
                    "h": int(r["h"]),
                    "decode_ok": False,
                    "sha_ok": False,
                    "caption_ok": r["caption"] == r["_truth_caption"],
                    "phash": None,
                }
                try:
                    pix = decode_image(bytes(r["bytes"]), r["fmt"])
                    out["decode_ok"] = pix.shape == (int(r["h"]), int(r["w"]), 3)
                    out["sha_ok"] = (
                        hashlib.sha256(pix.tobytes()).hexdigest() == r["_sha"]
                    )
                    out["phash"] = phash64(pix)
                except (KeyError, AssertionError, ValueError):
                    pass  # unknown/corrupt format → decode_ok=false row
                rows.append(out)
            out = pd.DataFrame(rows, columns=[
                "image_id", "fmt", "w", "h", "decode_ok", "sha_ok",
                "caption_ok", "phash",
            ])
            # a single undecodable row (phash=None) would coerce the
            # whole column to float64 and corrupt the other rows'
            # 64-bit phashes — force nullable Int64
            out["phash"] = pd.array([r["phash"] for r in rows], dtype="Int64")
            yield out

    return joined.mapInPandas(fn, DECODE_SCHEMA)


PHASH_BANDS = 8  # 8 bands × 8 bits over the 64-bit phash


def phash_neardup_pairs(
    images: DataFrame,
    max_hamming: int = 6,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Candidate near-dup pairs via 8×8-bit band LSH + exact hamming.

    Pigeonhole: hamming(a,b) ≤ max_hamming < 8 bands ⇒ at least one
    band has zero differing bits ⇒ the bucket join finds every
    qualifying pair (exact recall requires max_hamming ≤ 7; larger
    radii would need more bands); bit_count then filters exactly.
    No quadratic self-join."""
    if max_hamming >= PHASH_BANDS:
        raise ValueError(
            f"exact recall needs max_hamming < {PHASH_BANDS} bands; got {max_hamming}"
        )
    bands = images.select(
        id_col,
        phash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_ix"),
                        F.shiftrightunsigned(F.col(phash_col), 8 * b)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("band_val"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, phash_col, "band.band_ix", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_ix") == F.col("b.band_ix"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{phash_col}").bitwiseXOR(F.col(f"b.{phash_col}"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def caption_pair_consistency(
    images: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Image+caption curation check: phash-near-dup pairs (band LSH,
    no quadratic work) joined with both captions — exact token-SET
    intersection/union counts plus strict caption equality. Two
    visually-identical images whose captions disagree are exactly what
    a multimodal training pipeline must reconcile (keep one caption,
    merge, or drop); the counts give the reconciliation policy its
    signal. Spark's array_intersect/array_union are set-semantic
    (duplicates removed), mirrored in the DuckDB oracle via
    list_distinct."""
    pairs = phash_neardup_pairs(images, max_hamming=max_hamming)
    caps = images.select(
        "image_id",
        F.split(F.col("caption"), " ").alias("toks"),
        "caption",
    )
    a = caps.select(
        F.col("image_id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("caption").alias("cap_a"),
    )
    b = caps.select(
        F.col("image_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("caption").alias("cap_b"),
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.size(F.array_intersect("toks_a", "toks_b")).alias(
                "caption_inter"
            ),
            F.size(F.array_union("toks_a", "toks_b")).alias("caption_union"),
            (F.col("cap_a") == F.col("cap_b")).alias("same_caption"),
        )
    )


RESIZE_SCHEMA = (
    "image_id string, fmt string, out_w int, out_h int, resize_ok boolean, "
    "mean_r double, mean_g double, mean_b double, std_gray double, "
    "entropy double, resized_sha256 string"
)


def resize_features(
    images: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Decode → bilinear resize → feature-extract in ONE Arrow pass
    (the preprocess step of an image training pipeline). Real numpy
    implementations throughout (functions/imageops.py); unknown/corrupt
    formats yield resize_ok=false rows, never task failures — at 100 TB
    bad rows are data. resized_sha256 pins the exact resized pixels so
    the driver oracle can verify byte-exactness end-to-end."""
    from ..functions.imageops import decode_image, image_features, resize_bilinear

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                out = {
                    "image_id": r["image_id"], "fmt": r["fmt"],
                    "out_w": out_w, "out_h": out_h, "resize_ok": False,
                    "mean_r": None, "mean_g": None, "mean_b": None,
                    "std_gray": None, "entropy": None, "resized_sha256": None,
                }
                try:
                    pix = decode_image(bytes(r["bytes"]), r["fmt"])
                    small = resize_bilinear(pix, out_w, out_h)
                    out.update(image_features(small))
                    out["resized_sha256"] = hashlib.sha256(small.tobytes()).hexdigest()
                    out["resize_ok"] = True
                except (KeyError, AssertionError, ValueError):
                    pass
                rows.append(out)
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "out_w", "out_h", "resize_ok",
                "mean_r", "mean_g", "mean_b", "std_gray", "entropy",
                "resized_sha256",
            ])

    return images.mapInPandas(fn, RESIZE_SCHEMA)
