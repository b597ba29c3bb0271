"""Multimodal column plumbing.

Pattern: media payloads travel as opaque `binary` columns next to a
typed metadata struct; decode / feature-extract runs as an
Arrow-batched mapInPandas stage so bytes never round-trip through
Python row-by-row. Partitioning: payloads stay where they were read —
feature extraction is a narrow map, no shuffle.

The container has no image/audio libraries; pillow is the image fast
path where installed, and PNG payloads decode/resize through the
engine's pure-python codec (operators/png_codec) everywhere else — so
the image path executes for real in this container (r9). Audio gets
the same treatment in r10: soundfile is the fast path where installed,
and WAV/PCM payloads decode/resample through the pure-python
operators/wav_codec everywhere else; only non-WAV formats without
soundfile raise (NotImplementedError names the library).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MULTIMODAL_SCHEMA = (
    "doc_id bigint, modality string, payload binary, "
    "meta struct<lang:string, n_chars:bigint, source:string>"
)


def build_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> multimodal frame: binary payload + typed metadata
    struct (reference P10's nested-record assembly, test.py:527-534)."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct("lang", "n_chars", "source").alias("meta"),
    )


def decode_image(payload: bytes):
    """Decode an image payload to an HxWx3 uint8 RGB array.

    Pillow is the cluster fast path (any format it reads); without it,
    PNG payloads decode through the engine's pure-python codec
    (operators/png_codec — stdlib zlib + numpy), so the decode stage is
    genuinely executable in this container, not an importorskip stub.
    Non-PNG payloads in a pillow-less environment raise a clear
    NotImplementedError instead of failing deep inside a worker."""
    try:
        from PIL import Image
    except ImportError:
        from etl_dagster_service_crawler_spark.operators.png_codec import (
            PNG_MAGIC,
            decode_png,
        )

        if bytes(payload).startswith(PNG_MAGIC):
            return decode_png(bytes(payload))
        raise NotImplementedError(
            "non-PNG image decode requires PIL; install pillow on the "
            "cluster image (PNG decodes via the built-in pure-python codec)"
        ) from None
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def dhash_image(arr) -> tuple[int, int]:
    """64-bit difference hash (dHash) over a decoded image — the
    classic integer perceptual signature: resize the gray plane to
    9x8 with the codec's deterministic nearest rule, then bit (r, c)
    is 1 iff px[r][c] > px[r][c+1]. Returned as TWO 32-bit halves
    (hi = rows 0-3, lo = rows 4-7): every value stays far inside a
    signed 64-bit domain, so the signature survives signed-BIGINT
    engines bit-for-bit (the cross-engine exactness rule the SimHash
    export follows) with no sign games at bit 63.

    All-integer by construction: same pixels, same hash, on any
    machine — which is what makes the export oracle-checkable and the
    banded near-dup join exact."""
    import numpy as np

    from etl_dagster_service_crawler_spark.operators.png_codec import (
        resize_nearest,
    )

    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[:, :, 0]
    small = resize_nearest(a, 9, 8)
    hi = lo = 0
    for r in range(8):
        for c in range(8):
            if small[r, c] > small[r, c + 1]:
                idx = (r % 4) * 8 + c
                if r < 4:
                    hi |= 1 << idx
                else:
                    lo |= 1 << idx
    return hi, lo


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a feature extractor: byte-histogram
    moments. Same shape/typing a real CNN/spectrogram stage would emit."""
    if not payload:
        return [0.0] * FEATURE_DIM
    return [
        payload[i % len(payload)] / 255.0 + (i / (10.0 * FEATURE_DIM))
        for i in range(FEATURE_DIM)
    ]


def decode_audio(payload: bytes) -> tuple:
    """Decode an audio payload to ((n, ch) int16 samples, sample_rate).

    soundfile is the cluster fast path (any container format it
    reads); without it, WAV payloads decode through the engine's
    pure-python codec (operators/wav_codec — stdlib wave + numpy, the
    r10 analogue of the image path's png_codec), so the audio decode
    stage is genuinely executable in this container. Non-WAV payloads
    in a soundfile-less environment raise a clear NotImplementedError
    instead of failing deep inside a worker."""
    try:
        import soundfile
    except ImportError:
        from etl_dagster_service_crawler_spark.operators.wav_codec import (
            WAV_MAGIC,
            decode_wav,
        )

        if bytes(payload).startswith(WAV_MAGIC):
            return decode_wav(bytes(payload))
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile; install it on the "
            "cluster image (WAV decodes via the built-in pure-python codec)"
        ) from None
    import io

    import numpy as np

    data, rate = soundfile.read(io.BytesIO(bytes(payload)), dtype="int16")
    a = np.asarray(data, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    return a, int(rate)


def resample_audio(payload: bytes, dst_rate: int) -> bytes:
    """Resample an audio payload, returning WAV bytes (deterministic
    lossless container so the operator is testable byte-for-byte) —
    the audio twin of resize_image. Decode goes through decode_audio
    (fast path or pure-python fallback); the resample policy is the
    codec's nearest-index rule."""
    from etl_dagster_service_crawler_spark.operators.wav_codec import (
        encode_wav,
        resample_nearest,
    )

    samples, src_rate = decode_audio(payload)
    return encode_wav(resample_nearest(samples, src_rate, dst_rate), dst_rate)


def resize_image(payload: bytes, w: int, h: int) -> bytes:
    """Resize an image payload, returning PNG bytes (deterministic
    lossless container so the operator is testable byte-for-byte).

    Pillow path: its default resampling. Fallback path (no pillow, PNG
    input): the pure-python codec with nearest-neighbor — a different
    resampling policy, but stable; within one engine installation the
    choice never varies, which is the property the tests pin."""
    try:
        from PIL import Image
    except ImportError:
        from etl_dagster_service_crawler_spark.operators.png_codec import (
            PNG_MAGIC,
            decode_png,
            encode_png,
            resize_nearest,
        )

        if bytes(payload).startswith(PNG_MAGIC):
            return encode_png(resize_nearest(decode_png(bytes(payload)), w, h))
        raise NotImplementedError(
            "non-PNG image resize requires PIL; install pillow on the "
            "cluster image (PNG resizes via the built-in pure-python codec)"
        ) from None
    import io

    with Image.open(io.BytesIO(payload)) as img:
        out = io.BytesIO()
        img.convert("RGB").resize((w, h)).save(out, format="PNG")
        return out.getvalue()


def frame_sample(mm: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling over binary payloads (the video path): emit one
    row per sampled 'frame' via mapInPandas — one input row explodes to
    variable output rows, the shape a real keyframe sampler has. The
    framing here is deterministic byte-chunking (no codecs in this
    container); payload stays on the executor, only offsets and tiny
    frame digests come out."""
    out_schema = "doc_id bigint, frame_no int, offset int, frame_sum int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fnos, offs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    ids.append(doc_id)
                    fnos.append(i)
                    offs.append(off)
                    sums.append(sum(chunk) % 100_000)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": fnos, "offset": offs, "frame_sum": sums}
            )

    return mm.mapInPandas(batches, out_schema)


def extract_features(mm: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches in, Arrow batches out; executors see pandas frames of
    ~10k rows, not Python rows. At 100 TB this is the canonical shape:
    the stage is a narrow map over whatever partitioning the scan
    produced, and maxPartitionBytes bounds executor memory."""

    out_schema = "doc_id bigint, modality string, feat array<double>, payload_len int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feat": pdf["payload"].map(lambda p: _fake_features(bytes(p))),
                    "payload_len": pdf["payload"].map(len).astype("int32"),
                }
            )

    return mm.mapInPandas(batches, out_schema)
