"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design for 100 TB multimodal pipelines: payloads travel as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas``
so bytes never round-trip through the driver, batch shape and schema are
explicit, and partition sizing controls memory (one Arrow batch of
payloads must fit the executor).

The decode step is REAL for uncompressed 24-bit BMP — a dependency-free
header parser + numpy pixel-array reader (:func:`decode_bmp`), exercised
over a synthetic BMP corpus generated executor-side
(:func:`synthetic_bmp_corpus`). Compressed formats (JPEG/PNG/audio/video)
still require codec libraries absent from this container; they plug into
the same ``mapInPandas`` shape — swap :func:`decode_bmp` for the codec
call, everything around it (schema, batching, partitioning) is unchanged.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

#: metadata carried alongside every payload
MEDIA_META_SCHEMA = "struct<mime:string,source:string,n_bytes:bigint>"
BYTE_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte int, byte_checksum bigint, "
    "mime string"
)
PIXEL_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double, max_luma int"
)

_BMP_PIXEL_OFFSET = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def attach_media(
    df: DataFrame, payload_from: str = "text", id_col: str = "doc_id",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Build a media table: (id, payload binary, meta struct).

    In production the payload column comes from the lakehouse (parquet
    binary / object-store pointers); here it is synthesized by encoding a
    text column so the pipeline is runnable on the test tables.
    """
    from rapids_and_rivers_spark.sources.tables import spread

    payload = F.encode(F.col(payload_from), "UTF-8")
    df = spread(df, id_col)  # parallel Arrow batches on under-partitioned input
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col("source").alias("source") if "source" in df.columns else F.lit(None).cast("string").alias("source"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


# --- BMP codec (dependency-free: struct + numpy) ------------------------------


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up row order, BGR byte order, rows padded to 4 bytes — the
    classic Windows 3.x layout every BMP reader accepts)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip rows, RGB->BGR
    img = rows.tobytes()
    file_header = b"BM" + struct.pack(
        "<IHHI", _BMP_PIXEL_OFFSET + len(img), 0, 0, _BMP_PIXEL_OFFSET
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return file_header + info_header + img


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP payload to an (h, w, 3) uint8 RGB
    numpy array. Handles both bottom-up (positive height) and top-down
    (negative height) layouts and the 4-byte row padding. Raises
    ``ValueError`` on non-BMP payloads or unsupported (compressed /
    non-24-bit) variants — the caller decides whether to route those to a
    DLQ or fail the batch."""
    import numpy as np

    if len(payload) < _BMP_PIXEL_OFFSET or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down, h = h_raw < 0, abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    if len(payload) < offset + row_size * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px if top_down else px[::-1]


def synthetic_pixel(doc_id, y, x):
    """Closed-form deterministic pixel for the synthetic corpus:
    (r, g, b) as linear-congruential mixes of (doc_id, y, x) mod 256.
    Shared by the Spark-side generator and the SQL oracle — the oracle
    recomputes the expected stats from this formula while the query under
    test must recover them by actually parsing the BMP bytes."""
    return (
        (doc_id * 7 + y * 5 + x * 3) % 256,
        (doc_id * 11 + y * 2 + x * 13) % 256,
        (doc_id * 17 + y * 3 + x * 7) % 256,
    )


def encode_bmp_batch(doc_ids, width: int, height: int) -> list:
    """Batch-vectorized synthetic-BMP encoder: one numpy broadcast builds
    the pixel arrays AND the padded/flipped/BGR row buffers for the whole
    Arrow batch at once; the only per-document Python work left is a
    memcpy (``tobytes``) and a bytes concat. Byte-identical to calling
    :func:`encode_bmp` on :func:`synthetic_pixel` per document (pinned by
    a unit test) — this is the hot path, the scalar twins are the spec."""
    import numpy as np

    ids = np.asarray(doc_ids, dtype=np.int64).reshape(-1, 1, 1)
    n = ids.shape[0]
    yy, xx = np.mgrid[0:height, 0:width]
    r, g, b = synthetic_pixel(ids, yy, xx)
    px = np.stack([r, g, b], axis=-1).astype(np.uint8)  # (n, h, w, 3)
    row_size = (width * 3 + 3) & ~3
    rows = np.zeros((n, height, row_size), dtype=np.uint8)
    # flip rows (bottom-up), RGB->BGR — same layout as encode_bmp
    rows[:, :, : width * 3] = px[:, ::-1, :, ::-1].reshape(n, height, width * 3)
    img_len = height * row_size
    header = (
        b"BM"
        + struct.pack("<IHHI", _BMP_PIXEL_OFFSET + img_len, 0, 0, _BMP_PIXEL_OFFSET)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_len, 2835, 2835, 0, 0
        )
    )
    flat = rows.reshape(n, img_len)
    return [header + flat[i].tobytes() for i in range(n)]


def synthetic_bmp_corpus(
    df: DataFrame, id_col: str = "doc_id", width: int = 15, height: int = 9
) -> DataFrame:
    """Generate a real-BMP media table executor-side: one uncompressed
    24-bit BMP per input row, pixels from :func:`synthetic_pixel`.

    The default 15-px width makes the row stride 45 bytes -> 3 padding
    bytes per row, so the padded-row code path is always exercised.
    Bytes are built inside ``mapInPandas`` — nothing crosses the driver.
    """
    from rapids_and_rivers_spark.sources.tables import spread

    ids = spread(df, id_col).select(F.col(id_col).cast("bigint").alias("doc_id"))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encode_bmp_batch(
                        pdf["doc_id"].to_numpy(), width, height
                    ),
                }
            )

    media = ids.mapInPandas(gen, "doc_id bigint, payload binary")
    return media.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.lit("synthetic").alias("source"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, ndigits: int = 4) -> DataFrame:
    """Per-image pixel statistics over mapInPandas (Arrow batches): decode
    each BMP payload executor-side and reduce the pixel array in numpy —
    dimensions, per-channel means, max ITU-R 601 luma. This is the real
    production shape: batched binary in, C-level decode + reduce, small
    typed rows out; only the compact feature rows ever leave the executor.
    """

    def _stats(px, np):
        """(n, h, w, 3) float64 -> per-image channel means + max luma."""
        means = px.mean(axis=(1, 2))  # (n, 3)
        luma = (
            0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        ).max(axis=(1, 2))
        return means, luma

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"].tolist()
            n = len(payloads)
            if n == 0:
                yield pd.DataFrame(
                    {k: [] for k in ("doc_id", "width", "height", "mean_r",
                                     "mean_g", "mean_b", "max_luma")}
                )
                continue
            # fast path: homogeneous batch (same header prefix => same
            # layout) decodes as ONE reshape over the concatenated buffer
            # and reduces all images in a single vectorized pass; mixed
            # batches fall back to the per-payload reference decoder
            head = payloads[0][:_BMP_PIXEL_OFFSET]
            size = len(payloads[0])
            if all(len(p) == size and p[:_BMP_PIXEL_OFFSET] == head for p in payloads):
                offset = int.from_bytes(head[10:14], "little")
                w = int.from_bytes(head[18:22], "little", signed=True)
                h_raw = int.from_bytes(head[22:26], "little", signed=True)
                bpp = int.from_bytes(head[28:30], "little")
                compression = int.from_bytes(head[30:34], "little")
                top_down, h = h_raw < 0, abs(h_raw)
                row_size = (w * 3 + 3) & ~3
                if bpp != 24 or compression != 0 or size < offset + row_size * h:
                    raise ValueError(
                        f"unsupported BMP variant: bpp={bpp} compression={compression}"
                    )
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(n, size)
                rows = buf[:, offset : offset + row_size * h].reshape(n, h, row_size)
                px = rows[:, :, : w * 3].reshape(n, h, w, 3)[:, :, :, ::-1]
                if not top_down:
                    px = px[:, ::-1]
                means, luma = _stats(px.astype(np.float64), np)
                widths = np.full(n, w)
                heights = np.full(n, h)
            else:
                imgs = [decode_bmp(p).astype(np.float64) for p in payloads]
                heights = np.array([im.shape[0] for im in imgs])
                widths = np.array([im.shape[1] for im in imgs])
                means = np.array([im.mean(axis=(0, 1)) for im in imgs])
                luma = np.array(
                    [
                        (0.299 * im[..., 0] + 0.587 * im[..., 1]
                         + 0.114 * im[..., 2]).max()
                        for im in imgs
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths.astype("int32"),
                    "height": heights.astype("int32"),
                    "mean_r": np.round(means[:, 0], ndigits),
                    "mean_g": np.round(means[:, 1], ndigits),
                    "mean_b": np.round(means[:, 2], ndigits),
                    "max_luma": luma.astype("int64"),
                }
            )

    return media.mapInPandas(gen, PIXEL_FEATURE_SCHEMA)


def resize_nn(px, new_h: int, new_w: int):
    """Nearest-neighbor resize of an (h, w, 3) array: output pixel (y, x)
    samples source (floor(y*h/new_h), floor(x*w/new_w)) — the standard
    NN index map, shared with the SQL oracle's closed form."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return px[ys[:, None], xs[None, :], :]


def resize_images(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Resize every BMP payload to (new_h, new_w) by nearest neighbor,
    re-encoding as BMP — media table in, media table out, so resize
    composes with :func:`extract_features` / :func:`sample_frames` in
    the same pipeline shape. Decode + index-map + re-encode run
    executor-side per Arrow batch; bytes never cross the driver.

    Production codecs (JPEG/PNG, bilinear/Lanczos) swap into the same
    mapInPandas body; the plumbing — schema, batching, partitioning —
    is the deliverable, and the NN map keeps an exact closed-form oracle
    over the synthetic corpus (the resized stats are recomputed in SQL
    from the mapped coordinates, so the whole decode→resize→encode→
    decode chain must be byte-correct to pass).
    """

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_bmp(resize_nn(decode_bmp(p), new_h, new_w))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    out = media.select("doc_id", "payload").mapInPandas(
        gen, "doc_id bigint, payload binary"
    )
    return out.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.lit("resized").alias("source"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def byte_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction for OPAQUE payloads (no decodable
    format): length, first byte, checksum, mime passthrough — the same
    Arrow-batched executor-side path as :func:`extract_features`, for
    pipelines that route undecodable media by cheap byte signals."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "byte_checksum": payloads.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                        % 1_000_000_007
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return media.mapInPandas(gen, BYTE_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` fixed-stride
    'frames' (byte slices) per payload — the video-frame-sampling shape
    (explode to one row per frame) with a byte-slice stand-in decode."""
    # bind the decoded payload to an attribute first: expressions inside
    # HOF lambdas are re-evaluated per element (here: per frame)
    decoded = media.select(
        "doc_id", F.col("payload").cast("string").alias("payload_str")
    )
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    frames = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("frame_no"),
                F.substring(
                    F.col("payload_str"), i * every_n_bytes + 1, every_n_bytes
                ).alias("frame"),
            ),
        ),
        lambda s: F.length(s["frame"]) > 0,
    )
    return (
        decoded.select("doc_id", F.explode_outer(frames).alias("f"))
        .filter(F.col("f").isNotNull())
        .select(
            "doc_id",
            F.col("f.frame_no").alias("frame_no"),
            F.col("f.frame").alias("frame"),
        )
    )


def ahash_signatures(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image — the image half of the dedup
    family: decode the BMP bytes, reduce to an integer luma plane
    (scaled ITU-R 601: ``299r + 587g + 114b`` — INTEGER, so every
    downstream comparison is exact cross-engine), nearest-neighbor
    downsample to a ``grid x grid`` thumbnail (the same floor-index map
    as :func:`resize_nn`), and emit one bit per cell: cell luma above
    the thumbnail mean (compared as ``luma * grid^2 > total`` — integer,
    no division). Returns ``(doc_id, width, height, ahash_lo,
    ahash_hi)``: the 64 bits split into two 32-bit halves so neither
    BIGINT ever touches the sign bit.

    Near-identical images (re-encodes, small overlays) agree on almost
    every cell -> tiny hamming distance; candidate pairs then come from
    the same pigeonhole chunk machinery as text SimHash
    (operators/dedup.simhash_pairs) — pinned by unit test on constructed
    near-dups. The catalog row's FULL value oracle recomputes every bit
    from the closed-form pixel formula, so it only matches if the real
    byte-parsing path (pad, flip, BGR) is exact.
    """

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cells = grid * grid
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            ids = pdf["doc_id"].tolist()
            out = {
                "doc_id": [], "width": [], "height": [],
                "ahash_lo": [], "ahash_hi": [],
            }
            for doc_id, payload in zip(ids, payloads):
                px = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                sy = (np.arange(grid) * h) // grid
                sx = (np.arange(grid) * w) // grid
                thumb = luma[np.ix_(sy, sx)]
                total = int(thumb.sum())
                bits = (thumb * cells > total).astype(np.int64).ravel()
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:64] << np.arange(len(bits[32:64]))).sum())
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash_lo"].append(lo)
                out["ahash_hi"].append(hi)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id long, width int, height int, ahash_lo long, ahash_hi long",
    )


def dct_coeff_table(grid: int = 8, scale: int = 16384):
    """The SHARED fixed-point DCT-II basis: ``C[k][n] = round(scale *
    cos(pi * (2n + 1) * k / (2 * grid)))`` as plain Python ints.

    Both the executor-side pHash UDF and the DuckDB oracle's literal
    VALUES table come from THIS function, so the transform is an exact
    integer GEMM on both engines by construction — the frozen-constant
    pattern (like BPE's frozen merges), not a float cosine each engine
    rounds its own way. |C| <= 2^14 and luma < 2^18, so a full 8x8
    coefficient is < 64 * 2^46 = 2^52: int64-exact, no overflow.
    """
    import math

    return [
        [
            int(round(scale * math.cos(math.pi * (2 * n + 1) * k / (2 * grid))))
            for n in range(grid)
        ]
        for k in range(grid)
    ]


def phash_signatures(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual DCT hash per image (pHash; Zauner 2010 / the standard
    image near-dup signature next to average-hash): decode the BMP
    bytes, integer-scaled luma (299r+587g+114b), nearest-neighbor
    ``grid x grid`` thumbnail (the resize_nn floor-index map aHash
    uses), then a 2-D fixed-point integer DCT-II
    (``D = C @ L @ C.T`` with the shared :func:`dct_coeff_table`
    basis), and one bit per coefficient: ``D[i] > T`` where ``T`` is
    the 32nd-smallest of the 64 coefficients (the lower median — a
    pure integer order statistic, so no float median averaging can
    flip a bit cross-engine). Unlike aHash's per-cell brightness, the
    DCT bits key on low-frequency STRUCTURE, so they survive uniform
    brightness/contrast shifts that flip aHash bits.

    Returns ``(doc_id, width, height, phash_lo, phash_hi)`` with the
    64 bits split into two 32-bit halves clear of the sign bit.
    Candidate pairs ride the same pigeonhole chunk machinery as text
    SimHash (operators/dedup.simhash_pairs).
    """

    C = dct_coeff_table(grid)

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        basis = np.array(C, dtype=np.int64)
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            ids = pdf["doc_id"].tolist()
            out = {
                "doc_id": [], "width": [], "height": [],
                "phash_lo": [], "phash_hi": [],
            }
            for doc_id, payload in zip(ids, payloads):
                px = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                sy = (np.arange(grid) * h) // grid
                sx = (np.arange(grid) * w) // grid
                thumb = luma[np.ix_(sy, sx)]
                d = basis @ thumb @ basis.T  # exact int64 GEMM
                flat = d.ravel()
                thr = np.sort(flat)[grid * grid // 2 - 1]
                bits = (flat > thr).astype(np.int64)
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:64] << np.arange(len(bits[32:64]))).sum())
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["phash_lo"].append(lo)
                out["phash_hi"].append(hi)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id long, width int, height int, phash_lo long, phash_hi long",
    )


# --- audio: RIFF/WAV 16-bit PCM ----------------------------------------------
#
# The audio twin of the BMP path: REAL dependency-free container parsing
# (RIFF chunk walk + fmt validation + numpy int16 frombuffer), exercised
# over a synthetic WAV corpus whose samples come from a closed form the
# SQL oracle recomputes — the query only matches if the WAV round-trip
# (header, chunk layout, little-endian int16 packing) is byte-correct.

AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int, peak int, "
    "zero_crossings int, rms double"
)


def synthetic_sample(doc_id, t):
    """Closed-form deterministic int16 PCM sample for the synthetic
    corpus: ``((doc_id * 31 + t * 17) % 4096) - 2048``. Shared by the
    Spark-side generator and the SQL oracle (same contract as
    :func:`synthetic_pixel`)."""
    return (doc_id * 31 + t * 17) % 4096 - 2048


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Minimal REAL RIFF/WAVE container: 16-bit mono PCM, a ``fmt ``
    chunk and a ``data`` chunk — the layout every WAV reader expects.
    Scalar spec twin of :func:`encode_wav_batch` (pinned by test)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int16)
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_batch(doc_ids, n_samples: int, sample_rate: int = 16000) -> list:
    """Batch-vectorized synthetic-WAV encoder: one numpy broadcast
    builds every document's int16 sample buffer; per-document Python is
    a memcpy + header concat. Byte-identical to :func:`encode_wav` over
    :func:`synthetic_sample` (pinned by test)."""
    import numpy as np

    ids = np.asarray(doc_ids, dtype=np.int64).reshape(-1, 1)
    t = np.arange(n_samples, dtype=np.int64).reshape(1, -1)
    x = synthetic_sample(ids, t).astype(np.int16)  # (n, n_samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    data_len = n_samples * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_len)
    )
    return [header + x[i].tobytes() for i in range(len(ids))]


def decode_wav(payload: bytes):
    """Parse a RIFF/WAVE payload: validate magics, WALK the chunk list
    (not a fixed offset — real WAVs carry LIST/fact/cue chunks before
    data), validate 16-bit mono PCM in ``fmt ``, and return
    ``(sample_rate, int16 numpy array)``."""
    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, codec = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            codec, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if codec != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: codec={codec} ch={channels} bits={bits}"
                )
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
    raise ValueError("no data chunk")


def synthetic_wav_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 800,
    sample_rate: int = 16000,
) -> DataFrame:
    """Generate a real-WAV media table executor-side — one 16-bit mono
    PCM clip per input row, samples from :func:`synthetic_sample`.
    Bytes are built inside ``mapInPandas``; nothing crosses the driver."""
    from rapids_and_rivers_spark.sources.tables import spread

    ids = spread(df, id_col).select(F.col(id_col).cast("bigint").alias("doc_id"))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encode_wav_batch(
                        pdf["doc_id"].to_numpy(), n_samples, sample_rate
                    ),
                }
            )

    media = ids.mapInPandas(gen, "doc_id bigint, payload binary")
    return media.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit("synthetic").alias("source"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def audio_features(media: DataFrame, ndigits: int = 4) -> DataFrame:
    """Per-clip PCM features by ACTUALLY PARSING the WAV bytes
    (chunk walk + int16 frombuffer) inside Arrow-batched mapInPandas:
    peak amplitude (exact int), zero-crossing count (sign products,
    exact int), RMS (integer sum of squares — exact below 2^53 — then
    one sqrt, rounded). The oracle recomputes all three from the
    closed-form sample; a byte-level header or endianness mistake
    cannot hash-match."""
    import numpy as np

    from rapids_and_rivers_spark.operators.linalg import _half_up

    def feats(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, x = decode_wav(bytes(payload))
                xi = x.astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(x),
                        "sample_rate": int(rate),
                        "peak": int(np.abs(xi).max()) if len(x) else 0,
                        "zero_crossings": int(
                            np.count_nonzero(xi[:-1] * xi[1:] < 0)
                        ),
                        # HALF-UP like SQL round(), not Python banker's
                        "rms": _half_up(
                            float(np.sqrt((xi * xi).sum() / len(x))), ndigits
                        )
                        if len(x)
                        else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        feats, AUDIO_FEATURE_SCHEMA
    )
