"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata alongside —
the same shape the ``html binary`` column of the input_hint uses. The
Spark-side plumbing (schemas, Arrow batch shapes, partitioning) is real
and tested; the actual codec work is stubbed because no image/audio
library ships in this container:

- with ``use_real_codecs=True`` the decode raises NotImplementedError at
  the point a PIL/ffmpeg call would go;
- the default path substitutes a DETERMINISTIC fake decode (dimensions /
  duration derived from a stable hash of the payload) so the pipeline
  shape — including batch-level behavior and schema contracts — is fully
  exercised end to end.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "url string, n_bytes int, sha256 string, width int, height int, "
    "mode string, decode_ok boolean"
)


def binary_metadata(df: DataFrame, bin_col: str = "html", key_col: str = "url") -> DataFrame:
    """JVM-side metadata over a binary column: byte length + digests.
    (No Python: length/md5/sha2 are codegen'd.)"""
    return df.select(
        F.col(key_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("md5"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decode: pseudo-dimensions from
    a stable digest of the bytes. Same payload ⇒ same 'image'."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    width = 64 + digest[0] * 4
    height = 64 + digest[1] * 4
    mode = ["RGB", "RGBA", "L"][digest[2] % 3]
    return width, height, mode


def decode_images(
    df: DataFrame,
    bin_col: str = "html",
    key_col: str = "url",
    use_real_codecs: bool = False,
) -> DataFrame:
    """binary → decoded-image metadata via mapInPandas (Arrow batches).

    The real decode is the one line marked NotImplementedError; the rest
    — batch iteration, null handling, schema — is the production shape.
    """

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                if payload is None:
                    rows.append((key, 0, None, None, None, None, False))
                    continue
                data = bytes(payload)
                if use_real_codecs:
                    raise NotImplementedError(
                        "image codec not available in this environment; "
                        "plug PIL.Image.open(io.BytesIO(data)) here"
                    )
                width, height, mode = _fake_decode(data)
                rows.append(
                    (
                        key,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        width,
                        height,
                        mode,
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "n_bytes", "sha256", "width", "height", "mode", "decode_ok",
                ],
            )

    return df.select(key_col, bin_col).mapInPandas(gen, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "url string, frame_idx int, frame_ts double, frame_digest string"


def sample_frames(
    df: DataFrame,
    bin_col: str = "html",
    key_col: str = "url",
    n_frames: int = 3,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Video-frame-sampling plumbing: 1 binary row → n_frames rows.

    Output explosion happens inside the Arrow batch (the UDTF shape);
    frame 'content' is a deterministic digest until a real decoder is
    plugged in.
    """

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[bin_col]):
                if payload is None:
                    continue
                data = bytes(payload)
                if use_real_codecs:
                    raise NotImplementedError(
                        "video codec not available; plug ffmpeg/PyAV here"
                    )
                for i in range(n_frames):
                    digest = hashlib.blake2b(
                        data + i.to_bytes(4, "little"), digest_size=8
                    ).hexdigest()
                    rows.append((key, i, round(i * 1.5, 3), digest))
            yield pd.DataFrame(
                rows, columns=["url", "frame_idx", "frame_ts", "frame_digest"]
            )

    return df.select(key_col, bin_col).mapInPandas(gen, schema=FRAME_SCHEMA)
