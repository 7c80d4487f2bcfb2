"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this environment, so the
*decode* steps are stubbed (clearly marked), while the Spark-side plumbing —
schema, Arrow batch shape, partitioning, UDF signatures — is real and
tested. Byte-level feature extraction (histograms, signatures) IS real:
it's a deterministic pure function of the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "meta struct<width:int, height:int, duration_ms:int, codec:string>")


def attach_fake_payload(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in media table: payload = utf-8 bytes of text
    (a real pipeline would read image/audio bytes from the lake)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            (F.length(text_col) % 1024).cast("int").alias("width"),
            (F.length(text_col) % 768).cast("int").alias("height"),
            F.lit(0).alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def byte_histogram_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """(doc_id, n_bytes, top_bin, top_frac, n_bins_used) — real feature
    extraction over the binary payload, vectorized per Arrow batch
    (mapInPandas; numpy bincount). This is the exact execution shape a real
    image featurizer (decode → resize → embed) would use.

    Output is scalar-only (contract rule: no array-typed columns in
    queries() outputs — the driver's pandas canonicalization can't sort
    list cells). Bin = high nibble (byte >> 4); top_bin tie-break = lowest
    bin; top_frac rounded Spark-side with F.round so the oracle's round()
    matches bit-for-bit.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, top_bin, top_cnt, used = [], [], [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(arr >> 4, minlength=n_bins)
                n_bytes.append(len(arr))
                top_bin.append(int(h.argmax()))  # argmax ties → lowest bin
                top_cnt.append(int(h.max()) if len(arr) else 0)
                used.append(int((h > 0).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_bytes": n_bytes,
                                "top_bin": top_bin, "top_cnt": top_cnt,
                                "n_bins_used": used})

    feats = media.select("doc_id", "payload").mapInPandas(
        kernel, "doc_id long, n_bytes long, top_bin int, top_cnt long, n_bins_used int")
    return feats.select(
        "doc_id", "n_bytes", "top_bin",
        F.round(F.col("top_cnt") / F.greatest(F.col("n_bytes"), F.lit(1)), 6)
         .alias("top_frac"),
        "n_bins_used")


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decode requires PIL/opencv, absent in this container.

    The Spark plumbing (iterator mapInPandas over binary, model-per-
    partition load) is identical to byte_histogram_features; swap the
    kernel body for a real decoder on a cluster with the libs installed.
    """
    raise NotImplementedError(
        "image decode is stubbed: no imaging libraries in this environment; "
        "see byte_histogram_features for the real execution shape")


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB — video frame sampling requires ffmpeg/av, absent here."""
    raise NotImplementedError(
        "video frame sampling is stubbed: no av libraries in this environment")
