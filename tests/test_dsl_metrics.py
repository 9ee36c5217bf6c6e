"""DSL v2 (should/must/can — MessageValidationTest.kt parity), metrics
observations, and multimodal plumbing."""

import json

from pyspark.sql import functions as F

from rapids_and_rivers_spark.functions.dsl import can, must, should, spec
from rapids_and_rivers_spark.metrics import event_name_counts, observe_verdicts
from rapids_and_rivers_spark.operators import multimodal as M
from rapids_and_rivers_spark.river import River, Verdict


def run(spark, river, messages):
    df = spark.createDataFrame([(m,) for m in messages], "value string")
    return [
        (r.verdict, r.errors)
        for r in river.evaluate(df).select("verdict", "errors").collect()
    ]


# --- DSL v2 truth tables (MessageValidationTest.kt) --------------------------


def test_should_exist(spark):
    river = River().validate(spec(should("k").exist()))
    out = run(spark, river, ['{"k":1}', "{}", '{"k":null}'])
    assert [v for v, _ in out] == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_must_be_aborts(spark):
    river = River().validate(
        spec(should("a").exist(), must("e").be("x"), should("b").exist())
    )
    verdict, errors = run(spark, river, ['{"e":"y"}'])[0]
    assert verdict == Verdict.VALIDATION_FAILED
    # must-failure aborts: b's error never accumulates
    assert errors == ["Missing required key: a", "Required e is not 'x'"]


def test_can_never_fails_on_absence(spark):
    river = River().validate(spec(can("opt").exist()))
    assert [v for v, _ in run(spark, river, ["{}", '{"opt":5}'])] == [
        Verdict.PASS, Verdict.PASS,
    ]


def test_can_be_checks_only_when_present(spark):
    river = River().validate(spec(can("mode").be("fast")))
    out = [v for v, _ in run(spark, river, ["{}", '{"mode":"fast"}', '{"mode":"slow"}'])]
    assert out == [Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED]


def test_dsl_declares_keys(spark):
    river = River().validate(
        spec(should("a").exist(), must("b").be("x"), can("c").exist())
    )
    assert river.declared_keys == ["a", "b", "c"]


# --- metrics ----------------------------------------------------------------


def test_observe_verdicts_batch(spark):
    river = River().validate(should("k").exist())
    df = spark.createDataFrame(
        [('{"k":1}',), ("{}",), ("junk",)], "value string"
    )
    observed, obs = observe_verdicts(river.evaluate(df))
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["messages"] == 3
    assert got["passed"] == 1
    assert got["validation_failed"] == 1
    assert got["unparseable"] == 1


def test_event_name_counts(spark):
    river = River().validate(can("x").exist())
    df = spark.createDataFrame(
        [('{"@event_name":"ping"}',), ('{"@event_name":"ping"}',), ("{}",)],
        "value string",
    )
    rows = {
        (r.event_name, r.verdict): r.n
        for r in event_name_counts(river.evaluate(df)).collect()
    }
    assert rows == {("ping", "pass"): 2, ("ukjent", "pass"): 1}


# --- multimodal plumbing ------------------------------------------------------


def test_multimodal_byte_features(spark):
    df = spark.createDataFrame(
        [(1, "abc", "s1"), (2, "", "s2")], "doc_id long, text string, source string"
    )
    media = M.attach_media(df)
    rows = {r.doc_id: r for r in M.byte_features(media).collect()}
    assert rows[1].n_bytes == 3
    assert rows[1].first_byte == ord("a")
    assert rows[1].byte_checksum == (ord("a") + ord("b") + ord("c")) % 1_000_000_007
    assert rows[2].n_bytes == 0 and rows[2].first_byte == -1
    assert rows[1].mime == "application/octet-stream"


def test_multimodal_frames(spark):
    df = spark.createDataFrame(
        [(1, "x" * 100, "s")], "doc_id long, text string, source string"
    )
    media = M.attach_media(df)
    frames = M.sample_frames(media, every_n_bytes=64, max_frames=8).collect()
    assert [(f.frame_no, len(f.frame)) for f in frames] == [(0, 64), (1, 36)]


def test_bmp_roundtrip_known_pixels():
    """Golden-bytes BMP check, no Spark: encode a hand-chosen 2x3 image
    (odd width -> 3 padding bytes/row), verify the exact header fields
    and that decode recovers every pixel, including the row flip."""
    import numpy as np

    px = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[1, 2, 3], [4, 5, 6], [7, 8, 9]]],
        dtype=np.uint8,
    )  # (h=2, w=3)
    payload = M.encode_bmp(px)
    assert payload[:2] == b"BM"
    assert int.from_bytes(payload[10:14], "little") == 54  # pixel offset
    assert int.from_bytes(payload[18:22], "little") == 3  # width
    assert int.from_bytes(payload[22:26], "little") == 2  # height
    assert int.from_bytes(payload[28:30], "little") == 24  # bpp
    row_size = 12  # 3*3=9 -> padded to 12
    assert len(payload) == 54 + row_size * 2
    # bottom row of the file is the TOP image row, BGR order
    assert payload[54:57] == bytes([3, 2, 1])  # (1,2,3) as BGR
    assert payload[54 + row_size : 54 + row_size + 3] == bytes([0, 0, 255])
    np.testing.assert_array_equal(M.decode_bmp(payload), px)


def test_decode_bmp_top_down_and_errors():
    import numpy as np
    import pytest

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    payload = bytearray(M.encode_bmp(px))
    # flip the height sign -> top-down layout: rows come back reversed
    payload[22:26] = (-2).to_bytes(4, "little", signed=True)
    np.testing.assert_array_equal(M.decode_bmp(bytes(payload)), px[::-1])
    with pytest.raises(ValueError, match="not a BMP"):
        M.decode_bmp(b"\x89PNG....")
    with pytest.raises(ValueError, match="unsupported"):
        bad = bytearray(M.encode_bmp(px))
        bad[28:30] = (8).to_bytes(2, "little")  # claim 8-bit
        M.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_bmp(M.encode_bmp(px)[:-4])


def test_multimodal_pixel_features_end_to_end(spark):
    """Full path: synthetic BMP corpus (executor-generated) -> decode ->
    pixel stats; cross-checked against the closed-form pixel function."""
    import numpy as np

    df = spark.createDataFrame([(7,), (12,)], "doc_id long")
    media = M.synthetic_bmp_corpus(df, width=15, height=9)
    rows = {r.doc_id: r for r in M.extract_features(media).collect()}
    yy, xx = np.mgrid[0:9, 0:15]
    for doc_id in (7, 12):
        r, g, b = M.synthetic_pixel(doc_id, yy, xx)
        got = rows[doc_id]
        assert (got.width, got.height) == (15, 9)
        assert got.mean_r == round(float(np.mean(r)), 4)
        assert got.mean_g == round(float(np.mean(g)), 4)
        assert got.mean_b == round(float(np.mean(b)), 4)
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        assert got.max_luma == int(luma.max())


def test_encode_bmp_batch_matches_scalar_reference():
    """The vectorized batch encoder (hot path) must be byte-identical to
    encode_bmp(synthetic_pixel(...)) per document (the spec path)."""
    import numpy as np

    yy, xx = np.mgrid[0:9, 0:15]
    doc_ids = [0, 1, 7, 255, 100_000]
    got = M.encode_bmp_batch(doc_ids, width=15, height=9)
    for doc_id, payload in zip(doc_ids, got):
        r, g, b = M.synthetic_pixel(doc_id, yy, xx)
        assert payload == M.encode_bmp(np.stack([r, g, b], axis=-1))


def test_extract_features_mixed_batch_fallback(spark):
    """A batch mixing image dimensions skips the homogeneous fast path and
    must produce the same stats through the per-payload decoder."""
    import numpy as np

    small = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    big = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    rows = [(1, bytearray(M.encode_bmp(small))), (2, bytearray(M.encode_bmp(big)))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(1)
    got = {r.doc_id: r for r in M.extract_features(media).collect()}
    assert (got[1].width, got[1].height) == (3, 2)
    assert (got[2].width, got[2].height) == (5, 4)
    for doc_id, px in ((1, small), (2, big)):
        fpx = px.astype(np.float64)
        assert got[doc_id].mean_r == round(float(fpx[..., 0].mean()), 4)
        luma = 0.299 * fpx[..., 0] + 0.587 * fpx[..., 1] + 0.114 * fpx[..., 2]
        assert got[doc_id].max_luma == int(luma.max())


def test_resize_nn_known_values():
    """Nearest-neighbor resize: hand-checked index map on a 4x4 ramp."""
    import numpy as np

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = M.resize_nn(px, 2, 2)
    # ys = xs = [0, 2] -> corners of the even grid
    np.testing.assert_array_equal(out[0, 0], px[0, 0])
    np.testing.assert_array_equal(out[0, 1], px[0, 2])
    np.testing.assert_array_equal(out[1, 0], px[2, 0])
    np.testing.assert_array_equal(out[1, 1], px[2, 2])
    # upscale: every source pixel appears, dims correct
    up = M.resize_nn(px, 8, 6)
    assert up.shape == (8, 6, 3)


def test_resize_images_roundtrip(spark):
    """decode -> resize -> encode -> decode: output dims and exact NN
    pixels survive the BMP re-encode (padding re-done for the new
    width)."""
    import numpy as np

    df = spark.createDataFrame([(3,), (9,)], "doc_id long")
    media = M.synthetic_bmp_corpus(df, width=15, height=9)
    resized = {r.doc_id: bytes(r.payload) for r in M.resize_images(media, 8, 5).collect()}
    yy, xx = np.mgrid[0:9, 0:15]
    for doc_id in (3, 9):
        r, g, b = M.synthetic_pixel(doc_id, yy, xx)
        src = np.stack([r, g, b], axis=-1).astype(np.uint8)
        np.testing.assert_array_equal(
            M.decode_bmp(resized[doc_id]), M.resize_nn(src, 5, 8)
        )


def test_recognized_key_counts(spark):
    """message_keys_counter parity: per-declared-key usage over passing packets."""
    import json
    from rapids_and_rivers_spark import metrics
    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River

    msgs = [
        json.dumps({"@event_name": "x", "a": 1, "b": 2}),
        json.dumps({"@event_name": "x", "a": 1}),
        json.dumps({"@event_name": "y", "a": 1, "b": 3}),  # fails the river
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    river = (
        River("r")
        .validate(P.require_value("@event_name", "x"), P.require_key("a"))
        .validate(*P.interested_in("b"))
    )
    out = {
        r.key: r.n
        for r in metrics.recognized_key_counts(river.evaluate(df), river).collect()
    }
    assert out == {"@event_name": 2, "a": 2, "b": 1}


def test_observe_verdicts_streaming_progress_events(spark, tmp_path):
    """Streaming half of the Micrometer parity: the same verdict counters
    surface per micro-batch through QueryProgressEvent.observedMetrics —
    the loop a metrics exporter scrapes in production."""
    import json
    import os
    import time

    from pyspark.sql.streaming import listener as L

    from rapids_and_rivers_spark.functions import json_ops as J
    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "m.jsonl"), "w") as f:
        f.write(json.dumps({"@event_name": "need"}) + "\n")
        f.write(json.dumps({"@event_name": "other"}) + "\n")
        f.write("garbage\n")

    captured = []

    class Capture(L.StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            om = e.progress.observedMetrics
            if "river_metrics" in om:
                captured.append(om["river_metrics"])

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        raw = spark.readStream.format("text").load(src)
        parsed = raw.select(
            F.col("value"), J.parse(F.col("value")).alias("__variant")
        )
        river = River("needs").validate(P.require_value("@event_name", "need"))
        observed, name = observe_verdicts(river.evaluate(parsed))
        assert name == "river_metrics"
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 15
        while not captured and time.time() < deadline:
            time.sleep(0.2)  # listener bus is asynchronous
    finally:
        spark.streams.removeListener(listener)
    assert captured, "no observedMetrics arrived on the listener bus"
    m = captured[0]
    assert m["messages"] == 3
    assert m["passed"] == 1
    assert m["validation_failed"] == 1
    assert m["unparseable"] == 1


def test_ahash_near_dup_hamming_locality(spark):
    """Perceptual aHash: a small local perturbation of an image moves
    few (or no) hash bits, a different image moves many — the property
    that makes the SimHash pigeonhole machinery work for images."""
    import numpy as np

    rng_free_base = np.zeros((16, 16, 3), dtype=np.uint8)
    # smooth gradient image: left half dark, right half bright
    for x in range(16):
        rng_free_base[:, x, :] = 16 * x
    near = rng_free_base.copy()
    near[0, 0] = [255, 255, 255]  # one-pixel overlay
    different = rng_free_base[:, ::-1, :].copy()  # mirrored gradient

    rows = [
        (1, bytearray(M.encode_bmp(rng_free_base))),
        (2, bytearray(M.encode_bmp(near))),
        (3, bytearray(M.encode_bmp(different))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = {r.doc_id: (r.ahash_lo, r.ahash_hi)
            for r in M.ahash_signatures(media).collect()}

    def hamming(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert hamming(sigs[1], sigs[2]) <= 2        # near-dup: almost no bits move
    assert hamming(sigs[1], sigs[3]) >= 20       # mirrored: half the bits flip
    # deterministic: identical payloads hash identically
    assert sigs[1] == {
        r.doc_id: (r.ahash_lo, r.ahash_hi)
        for r in M.ahash_signatures(media).collect()
    }[1]


def test_encode_wav_batch_matches_scalar_reference():
    """The vectorized WAV encoder must be byte-identical to the scalar
    spec (encode_wav over synthetic_sample) — the hot path vs the spec,
    same contract as the BMP pair."""
    from rapids_and_rivers_spark.operators import multimodal as M

    for doc_id in (0, 1, 7, 123456):
        samples = [M.synthetic_sample(doc_id, t) for t in range(50)]
        scalar = M.encode_wav(samples, sample_rate=16000)
        (batch,) = M.encode_wav_batch([doc_id], 50, 16000)
        assert scalar == batch


def test_decode_wav_round_trip_and_chunk_walk():
    """decode_wav must recover the exact samples, and must WALK chunks:
    a LIST chunk (with odd length, exercising RIFF 2-byte alignment)
    inserted before data may not break parsing."""
    import struct

    import numpy as np

    from rapids_and_rivers_spark.operators import multimodal as M

    samples = [M.synthetic_sample(9, t) for t in range(64)]
    payload = M.encode_wav(samples, sample_rate=8000)
    rate, x = M.decode_wav(payload)
    assert rate == 8000
    assert x.tolist() == samples

    # splice an odd-length LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    rate2, x2 = M.decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(x, x2)

    import pytest

    with pytest.raises(ValueError):
        M.decode_wav(b"RIFX" + payload[4:])
    # stereo fmt must be rejected loudly, not silently mis-parsed
    bad_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + bad_fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_wav(bad)


def test_phash_near_dup_locality_and_brightness_robustness(spark):
    """Perceptual DCT hash on a TEXTURED image (a smooth gradient is
    degenerate: its vertical frequencies are exactly zero, so the
    median threshold sits on a field of zeros and any perturbation
    flips bits): an unsampled-pixel edit hashes identically, a small
    sampled-pixel edit moves few bits, a uniform brightness shift
    leaves the structure bits nearly intact (DC moves, AC terms do
    not — the property aHash's per-cell-vs-mean bits don't have), and
    a mirror flips half the bits. Also pins the exact int64 GEMM:
    identical payloads hash identically across runs."""
    import numpy as np

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    for y in range(16):
        for x in range(16):
            base[y, x] = [(y * 37 + x * 11) % 256,
                          (y * 5 + x * 29) % 256,
                          (y * 13 + x * 3) % 256]
    near_unsampled = base.copy()
    near_unsampled[1, 1] = [255, 255, 255]   # odd coords: not in the 8x8 map
    near_small = base.copy()
    near_small[0, 2] = np.clip(base[0, 2].astype(int) + 3, 0, 255)
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    different = base[:, ::-1, :].copy()       # mirrored texture

    rows = [
        (1, bytearray(M.encode_bmp(base))),
        (2, bytearray(M.encode_bmp(near_unsampled))),
        (3, bytearray(M.encode_bmp(near_small))),
        (4, bytearray(M.encode_bmp(brighter))),
        (5, bytearray(M.encode_bmp(different))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    sigs = {r.doc_id: (r.phash_lo, r.phash_hi)
            for r in M.phash_signatures(media).collect()}

    def hamming(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert hamming(sigs[1], sigs[2]) == 0     # unsampled edit: identical
    assert hamming(sigs[1], sigs[3]) <= 4     # small sampled edit: few bits
    assert hamming(sigs[1], sigs[4]) <= 8     # uniform shift: structure holds
    assert hamming(sigs[1], sigs[5]) >= 16    # mirror: many bits flip
    # deterministic re-run
    again = {r.doc_id: (r.phash_lo, r.phash_hi)
             for r in M.phash_signatures(media).collect()}
    assert sigs == again


def test_dct_coeff_table_is_frozen_integer_basis():
    """The shared fixed-point basis: DC row constant at the scale,
    symmetric magnitudes, and values stable (a changed basis would
    silently desync the oracle literal from the UDF)."""
    C = M.dct_coeff_table(8)
    assert all(c == 16384 for c in C[0])
    assert C[4][0] == -C[4][1] == C[4][3]  # cos(pi*(2n+1)/4) pattern
    flat = [c for row in C for c in row]
    assert max(abs(c) for c in flat) == 16384
