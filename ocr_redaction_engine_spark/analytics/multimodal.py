"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched kernels.

The container has no image/audio codecs, so the *decode* steps are stubbed
behind NotImplementedError (per the build rules) while everything Spark-side
— schema, batching, partitioning, UDF signatures, byte-level feature
extraction — is real and tested. ``byte_features`` computes genuine
content statistics (length, entropy-ish histogram) with numpy over Arrow
batches, which is exactly the shape a real decoder plugs into.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, mean_byte double, "
    "hist array<int>"
)


def synthesize_binary(spark, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic opaque payloads: media_id → pseudo-random bytes
    (md5 chain), standing in for image/audio blobs."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                ln = 256 + (int.from_bytes(hashlib.md5(f"{seed}:{i}:len".encode()).digest()[:2], "big") % 1024)
                buf = b""
                block = hashlib.md5(f"{seed}:{i}".encode()).digest()
                while len(buf) < ln:
                    buf += block
                    block = hashlib.md5(block).digest()
                out.append((i, buf[:ln], "image/fake"))
            yield pd.DataFrame(out, columns=["media_id", "content", "mime"])

    return spark.range(n).repartition(partitions).mapInPandas(
        gen, schema="media_id long, content binary, mime string")


def byte_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Real feature extraction over binary columns: length, mean byte value,
    coarse byte histogram. numpy-vectorized per Arrow batch."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=bins).astype(int)
                out.append((int(mid), int(arr.size), float(round(arr.mean(), 6)),
                            [int(x) for x in hist]))
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "mean_byte", "hist"]) \
                if out else pd.DataFrame({c: [] for c in ["media_id", "n_bytes", "mean_byte", "hist"]})

    return media.select("media_id", "content").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = ("media_id long, frame_idx int, frame_md5 string, "
                "mean_byte double")


def sample_frames_bytes(media: DataFrame, frame_size: int = 256,
                        every_n: int = 4) -> DataFrame:
    """Frame sampling over container-less fixed-stride payloads (the shape a
    real demuxer plugs into): slice ``content`` into ``frame_size`` frames,
    keep every ``every_n``-th, emit per-frame stats. One input row fans out
    to its sampled frames — the mapInPandas iterator shape for 1→N
    multimodal expansion."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                n_frames = len(buf) // frame_size
                for fi in range(0, n_frames, every_n):
                    frame = buf[fi * frame_size:(fi + 1) * frame_size]
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    out.append((int(mid), fi, hashlib.md5(frame).hexdigest(),
                                float(round(arr.mean(), 6))))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_md5", "mean_byte"]) \
                if out else pd.DataFrame({c: [] for c in ["media_id", "frame_idx", "frame_md5", "mean_byte"]})

    return media.select("media_id", "content").mapInPandas(run, schema=FRAME_SCHEMA)


ENERGY_SCHEMA = "media_id long, n_windows int, energy array<double>"


def window_energy(media: DataFrame, window: int = 64) -> DataFrame:
    """Audio-analog feature extraction: RMS energy per fixed window of the
    byte stream (numpy-vectorized; swap the byte view for PCM samples and
    nothing else changes)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float64)
                n = (len(arr) + window - 1) // window
                pad = np.zeros(n * window)
                pad[:len(arr)] = arr
                rms = np.sqrt((pad.reshape(n, window) ** 2).mean(axis=1))
                out.append((int(mid), n, [float(round(x, 6)) for x in rms]))
            yield pd.DataFrame(out, columns=["media_id", "n_windows", "energy"]) \
                if out else pd.DataFrame({c: [] for c in ["media_id", "n_windows", "energy"]})

    return media.select("media_id", "content").mapInPandas(run, schema=ENERGY_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode → (width, height, channels). Requires a codec library in
    the executor image; stubbed in this container."""
    raise NotImplementedError(
        "image decode requires cv2/PIL in the executor image; byte_features "
        "exercises the identical mapInPandas plumbing")


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling. Same story as decode_image."""
    raise NotImplementedError(
        "video frame sampling requires a codec; the Arrow batch shape is "
        "identical to byte_features")
