"""Real multimodal decode: pure-numpy container codecs for uncompressed
formats (binary PPM/PGM images, RIFF/WAVE PCM audio) — round-trip
properties, header edge cases, and the generate->encode->decode->stats
pipeline behind the `multimodal_real_features` registered query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    WAV_FRAMES,
    _gen_payload,
    decode_audio,
    decode_image,
    encode_audio,
    encode_image,
)


def test_ppm_pgm_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=17),
        st.integers(min_value=1, max_value=13),
        st.booleans(),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(w, h, rgb, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_image(encode_image(arr))
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)

    check()


def test_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(frames, channels, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(-32768, 32768, size=(frames, channels)).astype(np.int16)
        out, rate = decode_audio(encode_audio(arr, rate=8000))
        assert rate == 8000
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)

    check()


def test_pnm_header_comments_and_whitespace():
    """PNM headers allow # comments between tokens and arbitrary whitespace
    runs — a conforming writer's output must parse."""
    raster = bytes(range(6))
    payload = b"P5 # magic then comment\n# another\n  3\t2 # dims\n255\n" + raster
    img = decode_image(payload)
    assert img.shape == (2, 3)
    assert img.tobytes() == raster


def test_pnm_rejects_malformed():
    with pytest.raises(ValueError):
        decode_image(b"P4\n1 1\n255\nx")  # bitmap magic unsupported
    with pytest.raises(ValueError):
        decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8)  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\n" + b"\x00" * 5)  # raster too short


def test_wav_extra_chunks_and_odd_alignment():
    """Real WAV files carry LIST/fact chunks and pad odd-sized chunks to
    word boundaries; the walker must skip them and still find fmt/data."""
    arr = np.arange(-5, 5, dtype=np.int16).reshape(-1, 1)
    base = encode_audio(arr, rate=44100)
    fmt_and_data = base[12:]
    odd_list = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded
    rebuilt = (
        b"RIFF"
        + (4 + len(odd_list) + len(fmt_and_data)).to_bytes(4, "little")
        + b"WAVE"
        + odd_list
        + fmt_and_data
    )
    out, rate = decode_audio(rebuilt)
    assert rate == 44100
    assert np.array_equal(out, arr)


def test_wav_8bit_pcm_recentred():
    """8-bit WAV PCM is unsigned; the decoder recentres to signed int16
    full scale."""
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    data = bytes([0, 128, 255])
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data + b"\x00"
    payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    out, rate = decode_audio(payload)
    assert rate == 8000
    assert out[:, 0].tolist() == [-128 * 256, 0, 127 * 256]


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        decode_audio(b"RIFX\x00\x00\x00\x00WAVE")  # wrong magic
    with pytest.raises(ValueError):
        decode_audio(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks


def test_gen_payload_formats_and_decoded_formulas():
    """The generator's payloads are REAL container bytes whose decoded
    values equal the closed-form pixel/sample formulas the SQL oracle
    re-derives."""
    kind, fmt, payload = _gen_payload(8)  # ppm
    assert (kind, fmt) == ("image", "ppm")
    img = decode_image(payload)
    assert img.shape == (IMG_H, IMG_W, 3)
    i = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    assert np.array_equal(img.ravel(), ((8 * 7 + i * 13) % 256).astype(np.uint8))

    kind, fmt, payload = _gen_payload(4)  # bmp
    assert (kind, fmt) == ("image", "bmp")
    assert payload[:2] == b"BM"
    img = decode_image(payload)
    assert img.shape == (IMG_H, IMG_W, 3)
    i = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    assert np.array_equal(img.ravel(), ((4 * 3 + i * 7) % 256).astype(np.uint8))

    kind, fmt, payload = _gen_payload(6)  # pgm
    assert (kind, fmt) == ("image", "pgm")
    img = decode_image(payload)
    assert img.shape == (IMG_H, IMG_W)
    i = np.arange(IMG_W * IMG_H, dtype=np.int64)
    assert np.array_equal(img.ravel(), ((6 * 5 + i * 3) % 256).astype(np.uint8))

    kind, fmt, payload = _gen_payload(7)  # wav
    assert (kind, fmt) == ("audio", "wav")
    samples, rate = decode_audio(payload)
    assert samples.shape == (WAV_FRAMES, 1)
    t = np.arange(WAV_FRAMES, dtype=np.int64)
    assert np.array_equal(
        samples[:, 0], ((7 * 11 + t * 17) % 65536 - 32768).astype(np.int16)
    )


def test_real_feature_stats_end_to_end(spark):
    """generate -> encode -> decode -> stats through the Spark plan; spot
    values checked against direct numpy on the decoded arrays."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        media_payloads,
        real_feature_stats,
    )

    ids = spark.range(8).selectExpr("id AS media_id")
    rows = real_feature_stats(media_payloads(ids)).collect()
    # ppm id 0 x 3 channels + bmp id 4 x 3 channels + 2 pgm ids (2,6)
    # + 4 wav ids -> 12 rows
    assert len(rows) == 3 + 3 + 2 + 4
    assert {r.fmt for r in rows} == {"ppm", "bmp", "pgm", "wav"}
    by_key = {(r.media_id, r.channel): r for r in rows}
    _, _, payload = _gen_payload(4)
    img = decode_image(payload)
    ch1 = img[:, :, 1].ravel().astype(np.float64)
    r = by_key[(4, 1)]
    assert r.n_values == ch1.size
    assert r.mean_v == pytest.approx(ch1.sum() / ch1.size)
    assert r.std_v == pytest.approx(
        np.sqrt((ch1 * ch1).sum() / ch1.size - (ch1.sum() / ch1.size) ** 2)
    )


def test_bmp_roundtrip_property():
    """encode_image_bmp -> decode_image is the identity for random RGB
    arrays, including widths that force 1-3 bytes of row padding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crdb_changefeed_publisher_spark.operators.multimodal import encode_image_bmp

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),   # widths 1..9 cover pads 0-3
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_image(encode_image_bmp(arr))
        assert out.dtype == np.uint8 and np.array_equal(out, arr)

    check()


def test_bmp_top_down_and_padding_layout():
    """A hand-built top-down (negative height) BMP with explicit padding
    bytes decodes to the expected RGB values."""
    w, h = 3, 2  # stride 12 = 9 pixel bytes + 3 pad
    # rows in top-down order, BGR per pixel
    row0 = bytes([1, 2, 3,  4, 5, 6,  7, 8, 9]) + b"\xaa\xbb\xcc"
    row1 = bytes([10, 11, 12,  13, 14, 15,  16, 17, 18]) + b"\x00\x00\x00"
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (24).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    payload = (
        b"BM" + (14 + 40 + 24).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little") + info + row0 + row1
    )
    img = decode_image(payload)
    assert img.shape == (2, 3, 3)
    assert img[0, 0].tolist() == [3, 2, 1]   # BGR -> RGB
    assert img[0, 2].tolist() == [9, 8, 7]
    assert img[1, 1].tolist() == [15, 14, 13]


def test_bmp_rejects_malformed():
    from crdb_changefeed_publisher_spark.operators.multimodal import encode_image_bmp

    good = encode_image_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="shorter than its fixed headers"):
        decode_image(b"BM" + b"\0" * 10)
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="only uncompressed 24-bit"):
        decode_image(bytes(bad_bpp))
    bad_comp = bytearray(good)
    bad_comp[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="only uncompressed 24-bit"):
        decode_image(bytes(bad_comp))
    truncated = good[:-4]
    with pytest.raises(ValueError, match="raster shorter"):
        decode_image(truncated)


def test_audio_spectrogram_sine_and_parseval(spark):
    """A pure sine at FFT bin k must dominate every frame's spectrum, the
    centroid must sit at that bin's frequency, and total_power must match
    the time-domain energy (Parseval sanity through the whole
    encode -> decode -> window -> rfft path)."""
    from pyspark.sql import Row
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        audio_spectrogram,
        encode_audio,
    )

    rate, n_fft, k, n_frames = 16000, 256, 10, 4
    t = np.arange(n_fft * n_frames)
    sine = (10000 * np.sin(2 * np.pi * k * t / n_fft)).astype(np.int16)
    payload = encode_audio(sine, rate)
    df = spark.createDataFrame(
        [Row(media_id=1, kind="audio", payload=bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    rows = audio_spectrogram(df, n_fft=n_fft).collect()
    assert len(rows) == n_frames
    mono = sine.astype(np.float64)
    for r in rows:
        assert r.dominant_bin == k
        assert r.dominant_hz == pytest.approx(k * rate / n_fft)
        # a pure tone's centroid is its own frequency (tiny leakage tolerance)
        assert r.centroid_hz == pytest.approx(k * rate / n_fft, rel=0.01)
        w = mono[r.frame_idx * n_fft : (r.frame_idx + 1) * n_fft]
        assert r.total_power == pytest.approx((w * w).sum(), rel=1e-9)


def test_audio_spectrogram_over_media_table(spark):
    """Across the synthetic media table: only audio rows produce frames,
    row count is exactly (WAV_FRAMES // n_fft) per audio payload, and the
    output is deterministic across runs."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        audio_spectrogram,
        media_payloads,
    )

    ids = spark.range(8).selectExpr("id AS media_id")
    media = media_payloads(ids)
    n_fft = 128
    rows = audio_spectrogram(media, n_fft=n_fft).collect()
    audio_ids = {1, 3, 5, 7}
    frames_per = WAV_FRAMES // n_fft
    assert len(rows) == len(audio_ids) * frames_per
    assert {r.media_id for r in rows} == audio_ids
    again = audio_spectrogram(media, n_fft=n_fft).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_image_quality_features_closed_forms(spark):
    """Handcrafted payloads with known metrics: a constant image has zero
    entropy/gradient/contrast; a 2-value checker stream has 1-bit entropy
    and a computable gradient; a full ramp maxes contrast."""
    from pyspark.sql import Row
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        encode_image,
        image_quality_features,
    )

    flat = np.full((4, 8), 7, dtype=np.uint8)                  # constant
    checker = np.arange(32, dtype=np.uint8).reshape(4, 8) % 2 * 10  # 0,10 alternating
    ramp = np.linspace(0, 255, 32).astype(np.uint8).reshape(4, 8)
    rows = [
        Row(media_id=i, kind="image", fmt="pgm", payload=bytearray(encode_image(a)))
        for i, a in enumerate([flat, checker, ramp])
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, fmt string, payload binary")
    got = {r.media_id: r for r in image_quality_features(df).collect()}
    assert got[0].entropy == 0.0 and got[0].grad_mean == 0.0 and got[0].contrast == 0.0
    assert got[1].entropy == 1.0          # two equiprobable values
    assert got[1].grad_mean == 10.0       # every consecutive pair differs by 10
    assert got[2].contrast == 1.0         # 0..255 span
    assert got[2].entropy > 4.0           # many distinct values


# ---------------------------------------------------------------------------
# Perceptual fingerprints (pHash / spectral): closed-form DCT identities,
# invariance properties, and the planted near-dup pipeline end to end.
# ---------------------------------------------------------------------------


def test_dct_matrix_closed_forms():
    """Exact DCT-II identities the hash rests on: orthonormality; a
    constant image excites ONLY the DC coefficient; a rank-1 horizontal
    ramp excites ONLY row u=0 (the constant vector is orthogonal to every
    higher DCT basis row)."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        PHASH_SIZE,
        _dct_matrix,
    )

    D = _dct_matrix(PHASH_SIZE)
    assert np.allclose(D @ D.T, np.eye(PHASH_SIZE), atol=1e-12)

    const = np.full((PHASH_SIZE, PHASH_SIZE), 9.0)
    c = D @ const @ D.T
    assert abs(c[0, 0] - 9.0 * PHASH_SIZE) < 1e-9
    c[0, 0] = 0.0
    assert np.abs(c).max() < 1e-9

    ramp = np.tile(np.arange(PHASH_SIZE, dtype=np.float64), (PHASH_SIZE, 1))
    r = D @ ramp @ D.T
    assert np.abs(r[1:, :]).max() < 1e-9  # everything below row 0 vanishes
    assert np.abs(r[0, 1:]).max() > 1.0   # the ramp itself is not constant


def test_image_phash_invariances():
    """pHash is brightness-offset and contrast-scale invariant (DC is
    excluded; a positive scale moves coeffs and median together), flat
    images hash to 0, sparse small noise flips few bits, and
    decorrelated noise images are far apart."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        _mix64,
        image_phash,
    )

    assert image_phash(np.full((32, 32), 128, dtype=np.uint8)) == 0

    i = np.arange(1024, dtype=np.uint64)
    img = (
        (_mix64(np.uint64(12345) + i) >> np.uint64(57)).astype(np.uint8).reshape(32, 32)
    )  # values 0..127: headroom for offset/scale without clipping
    base = image_phash(img)
    assert image_phash(img + 40) == base                       # brightness
    assert image_phash((img.astype(np.int64) * 2)) == base     # contrast
    noisy = img.astype(np.int64).copy().ravel()
    noisy[::31] += 2                                           # ~3% of pixels
    ham = bin(base ^ image_phash(noisy.reshape(32, 32))).count("1")
    assert ham <= 6, ham
    other = (
        (_mix64(np.uint64(999) + i) >> np.uint64(57)).astype(np.uint8).reshape(32, 32)
    )
    assert bin(base ^ image_phash(other)).count("1") >= 12


def test_audio_fingerprint_semantics():
    """The fingerprint bits are TEMPORAL band-energy differences, so any
    stationary signal (pure sine, silence) hashes to exactly 0; a chirp
    (spectral change mid-stream) does not; amplitude scaling never flips
    a bit (energies scale together)."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        _mix64,
        audio_fingerprint,
    )

    t = np.arange(480)
    sine = (8000 * np.sin(2 * np.pi * t * 2000 / 16000)).astype(np.int16)
    assert audio_fingerprint(sine) == 0
    assert audio_fingerprint(np.zeros(480, dtype=np.int16)) == 0

    chirp = np.where(
        t < 240,
        8000 * np.sin(2 * np.pi * t * 1000 / 16000),
        8000 * np.sin(2 * np.pi * t * 6000 / 16000),
    ).astype(np.int16)
    assert audio_fingerprint(chirp) != 0

    noise = (
        (_mix64(np.uint64(777) + t.astype(np.uint64)) % np.uint64(16384)).astype(np.int64)
        - 8192
    ).astype(np.int16)
    assert audio_fingerprint((noise.astype(np.int64) * 2)) == audio_fingerprint(noise)


def test_media_near_dup_pipeline_recovers_planted_pairs(spark):
    """End to end on a 40-base-id planted corpus: decode -> fingerprint ->
    8x8-bit hamming banding -> exact verify returns EXACTLY the planted
    (m, m + offset) pairs for both kinds, with the pigeonhole guarantee
    making recall exact at the threshold."""
    from crdb_changefeed_publisher_spark.operators.multimodal import (
        NEAR_DUP_PARTNER_OFFSET,
        media_near_dup_pairs,
        near_dup_media_payloads,
    )

    ids = spark.range(40).select(F.col("id").alias("media_id"))
    media = near_dup_media_payloads(ids)
    assert media.count() == 80
    got = {
        (r.kind, r.media_a, r.media_b)
        for r in media_near_dup_pairs(media).collect()
    }
    want = {
        ("image" if m % 2 == 0 else "audio", m, m + NEAR_DUP_PARTNER_OFFSET)
        for m in range(40)
    }
    assert got == want
