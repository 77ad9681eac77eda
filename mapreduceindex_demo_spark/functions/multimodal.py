"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
`binary` column next to a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages so bytes
never round-trip through Python row-by-row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
`decode_features` is a deterministic stub behind the real Spark plumbing —
schema, batching, and partition behavior are genuine and tested; swap
`_stub_feature_vec` for a real decoder to productionize (it raises
NotImplementedError for non-'fake' codecs to make the boundary explicit).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: schema of the extracted-feature output of decode_features
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, codec string, feature_0 double, "
    "feature_1 double, feature_2 double, feature_3 double"
)


def binary_payload(text_col: str = "text") -> Column:
    """Testdata has no real media, so the opaque payload is the UTF-8 bytes
    of the document text — byte-identical to DuckDB's encode()."""
    return F.encode(F.col(text_col), "UTF-8")


def media_meta(codec: str = "fake") -> Column:
    """Typed metadata struct riding next to the binary column."""
    return F.struct(
        F.lit(codec).alias("codec"),
        F.length(binary_payload()).alias("n_bytes"),
        F.lit(1).alias("channels"),
    )


def _stub_feature_vec(payload: bytes, codec: str) -> list[float]:
    """Deterministic fake 'decoder': 4 features from byte statistics.
    Real decoders (image resize, audio frame-sample, …) slot in here."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not available in this "
            "environment — plug a real decoder into _stub_feature_vec"
        )
    n = len(payload)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(n),
        float(sum(payload) % 997),
        float(payload[0]),
        float(payload[-1]),
    ]


#: frame sampling parameters: k evenly spaced fixed-width byte windows
FRAME_COUNT = 4
FRAME_WIDTH = 32
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_md5 string"


def frame_sample(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Frame sampling for video-shaped payloads: k=4 evenly spaced 32-byte
    windows per payload, fingerprinted — the 1→N Arrow-batched fan-out a
    real frame extractor would do (mapInPandas; bytes never leave the
    partition, no shuffle, no driver).

    The window arithmetic is pure integer math (stride =
    max(1, (max(n,32)−32)//3)) so the DuckDB oracle reproduces it on the
    payload text — this op's Python path is oracle-CHECKED, not rows-only.
    """

    def sample(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for did, payload in zip(pdf[doc_id], pdf["payload"]):
                n = len(payload)
                stride = max(1, (max(n, FRAME_WIDTH) - FRAME_WIDTH) // (FRAME_COUNT - 1))
                for i in range(FRAME_COUNT):
                    frame = payload[i * stride : i * stride + FRAME_WIDTH]
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(len(frame))
                    rows["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(rows)

    prepared = df.select(F.col(doc_id), binary_payload().alias("payload"))
    return prepared.mapInPandas(sample, FRAME_SCHEMA)


def decode_features(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over (doc_id, payload, meta):
    the real 100 TB plumbing — mapInPandas keeps each partition's bytes in
    a few Arrow batches, no shuffle, no driver involvement."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _stub_feature_vec(p, c)
                for p, c in zip(pdf["payload"], pdf["codec"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[doc_id],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "codec": pdf["codec"],
                }
            )
            for i in range(4):
                out[f"feature_{i}"] = [f[i] for f in feats]
            yield out

    prepared = df.select(
        F.col(doc_id),
        binary_payload().alias("payload"),
        F.lit("fake").alias("codec"),
    )
    return prepared.mapInPandas(extract, FEATURE_SCHEMA)
