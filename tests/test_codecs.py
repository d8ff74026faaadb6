"""Pure-python codec tests (no Spark): PNG exact roundtrips, JPEG
within-quantization-error roundtrips, malformed-payload errors."""

import numpy as np
import pytest

from catabra_pandas_spark.pipeline.codecs import (
    jpeg_decode,
    jpeg_encode_gray,
    jpeg_encode_rgb420,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (13, 17), (32, 32),
                                   (13, 17, 3), (8, 8, 4), (3, 200, 3)])
def test_png_roundtrip_exact(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    dec = png_decode(png_encode(img))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert dec.shape == ref.shape
    assert (dec == ref).all()


def test_png_all_filters_decode():
    """Decode a PNG whose scanlines use every filter type (hand-built)."""
    import struct
    import zlib

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch

    def encode_filtered(px):
        rows = []
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            cur = px[y].reshape(stride).astype(np.int32)
            f = y % 5
            if f == 0:
                enc = cur.copy()
            elif f == 1:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - prev) % 256
            elif f == 3:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                enc = (cur - (left + prev) // 2) % 256
            else:
                enc = np.zeros(stride, dtype=np.int32)
                for i in range(stride):
                    a = int(cur[i - ch]) if i >= ch else 0
                    b = int(prev[i])
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[i] = (int(cur[i]) - pred) % 256
            rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
            prev = cur
        return b"".join(rows)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(encode_filtered(img)))
               + chunk(b"IEND", b""))
    assert (png_decode(payload) == img).all()


def test_png_palette():
    import struct
    import zlib

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", pal.tobytes())
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (png_decode(payload) == pal[idx]).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JFIF not a png")


@pytest.mark.parametrize("quality,tol_mean,tol_max", [(95, 1.0, 12),
                                                      (85, 2.0, 20)])
def test_jpeg_roundtrip_smooth(quality, tol_mean, tol_max):
    x, y = np.meshgrid(np.arange(72), np.arange(40))
    img = (128 + 60 * np.sin(x / 9.0) * np.cos(y / 11.0)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_gray(img, quality=quality))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.mean() < tol_mean
    assert err.max() < tol_max


def test_jpeg_flat_is_near_exact():
    for v in (0, 77, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode_gray(img, quality=85))
        assert np.abs(dec.astype(int) - v).max() <= 1, v


def test_jpeg_non_multiple_of_8_dims():
    rng = np.random.RandomState(5)
    img = np.clip(rng.normal(120, 10, size=(13, 21)), 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_gray(img, quality=90))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 6


def test_jpeg_color_420_roundtrip():
    """Color + 4:2:0 subsampling + chroma tables — the decoder paths a
    grayscale fixture never exercises."""
    x, y = np.meshgrid(np.arange(70), np.arange(44))
    img = np.stack([128 + 60 * np.sin(x / 9.0),
                    128 + 60 * np.cos(y / 11.0),
                    128 + 40 * np.sin((x + y) / 13.0)], axis=-1).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_rgb420(img, quality=90))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.mean() < 4 and err.max() < 35


def test_jpeg_color_flat_is_near_exact():
    flat = np.full((20, 28, 3), [200, 60, 120], dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode_rgb420(flat, quality=85))
    assert np.abs(dec.astype(int) - flat.astype(int)).max() <= 1


def test_jpeg_color_non_multiple_of_16_dims():
    rng = np.random.RandomState(9)
    img = np.clip(rng.normal(120, 8, size=(19, 33, 3)), 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_rgb420(img, quality=92))
    assert dec.shape == (19, 33, 3)


@pytest.mark.parametrize("shape", [(100,), (64, 1), (50, 2)])
def test_wav_roundtrip_exact(shape):
    rng = np.random.RandomState(13)
    x = rng.randint(-32768, 32768, size=shape).astype(np.int16)
    samples, rate, nch = wav_decode(wav_encode(x, sample_rate=8000))
    ref = x if x.ndim == 2 else x[:, None]
    assert rate == 8000 and nch == ref.shape[1]
    assert (samples == ref).all()


def test_wav_extra_chunks_and_rejects():
    import struct

    x = np.arange(10, dtype=np.int16)
    enc = bytearray(wav_encode(x))
    # splice a LIST chunk between fmt and data: decoder must skip it
    fmt_end = enc.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    enc2 = bytes(enc[:fmt_end]) + extra + bytes(enc[fmt_end:])
    enc2 = enc2[:4] + struct.pack("<I", len(enc2) - 8) + enc2[8:]
    samples, _, _ = wav_decode(enc2)
    assert (samples[:, 0] == x).all()
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"OggS not a wav")


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG....")
    # splice a SOF2 marker into a valid stream: must raise, not misdecode
    enc = bytearray(jpeg_encode_gray(np.full((8, 8), 50, np.uint8)))
    i = enc.find(b"\xFF\xC0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_decode(bytes(enc))


def test_png_grey_alpha_roundtrip():
    """2-channel grey+alpha (colortype 4) encodes and decodes losslessly —
    resize_image produces such rasters from colortype-4 inputs."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(9, 4, 2), dtype=np.uint8)
    dec = png_decode(png_encode(img))
    assert dec.shape == (9, 4, 2)
    assert (dec == img).all()


def test_png_encode_rejects_bad_channel_count():
    with pytest.raises(ValueError, match="raster"):
        png_encode(np.zeros((4, 4, 5), dtype=np.uint8))
    with pytest.raises(ValueError, match="raster"):
        png_encode(np.zeros((4,), dtype=np.uint8))


def test_truncated_payloads_raise_valueerror():
    """Corrupt/truncated bytes surface as ValueError (documented contract),
    never IndexError/struct.error/zlib.error."""
    png = png_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))
    jpg = jpeg_encode_gray(np.full((16, 16), 90, np.uint8))
    wav = wav_encode(np.arange(100, dtype=np.int16))
    for payload, decode in ((png, png_decode), (jpg, jpeg_decode),
                            (wav, wav_decode)):
        # NB: not len-3 for PNG — that only clips the IEND CRC, which a
        # decoder may legitimately ignore
        cuts = [9, 14, len(payload) // 2]
        if decode is not png_decode:
            cuts.append(len(payload) - 3)
        for cut in cuts:
            with pytest.raises(ValueError):
                decode(payload[:cut])
    # corrupt IDAT bytes (valid chunk framing, broken zlib stream)
    bad = bytearray(png)
    i = bad.index(b"IDAT") + 8
    bad[i:i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        png_decode(bytes(bad))


def test_mp3_probe_roundtrip():
    """mp3_probe(mp3_encode_headers(...)) recovers every header parameter
    exactly, across versions / bitrate / samplerate indices / channel
    modes, with and without ID3v2/ID3v1 tags."""
    from catabra_pandas_spark.pipeline.codecs import (mp3_encode_headers,
                                                      mp3_probe)

    cases = [
        dict(n_frames=7, bitrate_idx=9, sr_idx=1, version=1.0,
             channel_mode=3, exp=(128, 48000, 1)),
        dict(n_frames=1, bitrate_idx=14, sr_idx=0, version=1.0,
             channel_mode=0, exp=(320, 44100, 2)),
        dict(n_frames=40, bitrate_idx=2, sr_idx=2, version=2.0,
             channel_mode=1, exp=(16, 16000, 2)),
        dict(n_frames=3, bitrate_idx=5, sr_idx=0, version=2.5,
             channel_mode=3, exp=(40, 11025, 1)),
    ]
    for c in cases:
        br, sr, ch = c.pop("exp")
        payload = mp3_encode_headers(**c)
        info = mp3_probe(payload)
        assert info["version"] == c["version"]
        assert info["layer"] == 3
        assert (info["bitrate_kbps"], info["sample_rate"],
                info["channels"]) == (br, sr, ch)
        assert info["n_frames"] == c["n_frames"]
        spf = 1152 if c["version"] == 1.0 else 576
        assert abs(info["duration_ms"]
                   - c["n_frames"] * spf * 1000.0 / sr) < 1e-9
    # tag handling: ID3v2 prefix and ID3v1 trailer are both skipped
    p = mp3_encode_headers(5, bitrate_idx=9, sr_idx=0, id3_tag=b"x" * 200)
    assert mp3_probe(p)["n_frames"] == 5
    assert mp3_probe(p + b"TAG" + b"\x00" * 125)["n_frames"] == 5


def test_mp3_probe_rejects_bad_streams():
    """Bad sync, truncated final frame, trailing garbage, and free
    bitrate all raise ValueError instead of returning bogus metadata."""
    import pytest

    from catabra_pandas_spark.pipeline.codecs import (mp3_encode_headers,
                                                      mp3_probe)

    good = mp3_encode_headers(2, bitrate_idx=9, sr_idx=0)
    with pytest.raises(ValueError, match="sync"):
        mp3_probe(b"\x00\x00" + good)
    with pytest.raises(ValueError, match="truncated final"):
        mp3_probe(good[:-10])
    with pytest.raises(ValueError):
        mp3_probe(good + b"\xff\xfb")  # dangling partial header
    with pytest.raises(ValueError, match="free-bitrate"):
        mp3_encode_headers(1, bitrate_idx=0, sr_idx=0)
    with pytest.raises(ValueError, match="bitrate/samplerate"):
        mp3_encode_headers(1, bitrate_idx=15, sr_idx=0)


def test_mp4_probe_roundtrip():
    """mp4_probe(mp4_encode_boxes(...)) recovers brand, timescale,
    duration, track count and 16.16 display dimensions exactly, for both
    mvhd versions."""
    from catabra_pandas_spark.pipeline.codecs import (mp4_encode_boxes,
                                                      mp4_probe)

    p = mp4_encode_boxes(12345.0, timescale=600, width=1920, height=1080,
                         n_tracks=2, brand=b"mp42")
    info = mp4_probe(p)
    assert info["major_brand"] == "mp42"
    assert info["timescale"] == 600 and info["duration"] == 7407
    assert abs(info["duration_ms"] - 12345.0) < 1.0
    assert info["n_tracks"] == 2
    assert (info["width"], info["height"]) == (1920.0, 1080.0)
    v1 = mp4_probe(mp4_encode_boxes(999.0, version=1))
    assert v1["duration_ms"] == 999.0 and v1["timescale"] == 1000


def test_mp4_probe_rejects_bad_boxes():
    """Truncated headers, inconsistent sizes, missing moov, and zero
    timescale all raise ValueError."""
    import pytest

    from catabra_pandas_spark.pipeline.codecs import (mp4_encode_boxes,
                                                      mp4_probe)

    good = mp4_encode_boxes(1000.0)
    with pytest.raises(ValueError, match="truncated MP4 box header"):
        mp4_probe(good[:-3])
    with pytest.raises(ValueError, match="no moov"):
        mp4_probe(good[:20])  # ftyp only (20-byte box)
    bad = bytearray(good)
    bad[0] = 0xFF  # ftyp size far beyond payload
    with pytest.raises(ValueError, match="invalid MP4 box size"):
        mp4_probe(bytes(bad))
    with pytest.raises(ValueError, match="timescale"):
        mp4_probe(mp4_encode_boxes(1000.0, timescale=0))


def test_mp3_probe_vbr_average_bitrate():
    """A VBR stream (per-frame bitrate indices cycled by the fixture
    encoder) reports the FIRST frame's bitrate_kbps plus the
    frame-count-weighted avg_bitrate_kbps; CBR streams report the same
    number in both fields."""
    from catabra_pandas_spark.pipeline.codecs import (mp3_encode_headers,
                                                      mp3_probe)

    info = mp3_probe(mp3_encode_headers(6, bitrate_idx=[9, 11, 14],
                                        sr_idx=0))
    # MPEG-1 Layer III table: idx 9 -> 128, 11 -> 192, 14 -> 320 kbps
    assert info["bitrate_kbps"] == 128
    assert abs(info["avg_bitrate_kbps"] - (128 + 192 + 320) / 3) < 1e-12
    assert info["n_frames"] == 6
    cbr = mp3_probe(mp3_encode_headers(4, bitrate_idx=9, sr_idx=0))
    assert cbr["avg_bitrate_kbps"] == cbr["bitrate_kbps"] == 128


def test_mp3_probe_short_payload_id3v1_guard():
    """Payloads shorter than 128 bytes must never run the ID3v1 trailer
    check: a negative slice start reads bytes from INSIDE the stream,
    and a spurious 'TAG' match there drove `end` below zero and rejected
    a valid low-bitrate MPEG-2.5 stream."""
    from catabra_pandas_spark.pipeline.codecs import (mp3_encode_headers,
                                                      mp3_probe)

    # two 48-byte MPEG-2.5 8 kbps frames -> 96-byte payload; plant 'TAG'
    # at byte 64 (= end-128 after Python's negative-index wrap), inside
    # the second frame's zero padding
    p = bytearray(mp3_encode_headers(2, bitrate_idx=1, sr_idx=1,
                                     version=2.5))
    assert len(p) == 96
    p[64:67] = b"TAG"
    info = mp3_probe(bytes(p))
    assert info["n_frames"] == 2 and info["bitrate_kbps"] == 8


# --- hypothesis property roundtrips (pure python, no Spark) -----------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(h=st.integers(min_value=1, max_value=24),
       w=st.integers(min_value=1, max_value=24),
       ch=st.sampled_from([0, 1, 2, 3, 4]),  # 0 = 2-D greyscale array
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_png_roundtrip_property(h, w, ch, seed):
    """PNG encode->decode is byte-exact for EVERY raster shape the
    encoder accepts: random dims (incl. 1-pixel edges) x channel counts
    (2-D grey, 1/2/3/4-channel 3-D) x random content — odd strides make
    the Paeth/Sub/Up filter predictions adversarial."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 0 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = png_decode(png_encode(img))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert dec.shape == ref.shape
    assert (dec == ref).all()


@settings(max_examples=40, deadline=None)
@given(n=st.integers(min_value=1, max_value=300),
       nch=st.sampled_from([0, 1, 2]),  # 0 = 1-D mono array
       rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_wav_roundtrip_property(n, nch, rate, seed):
    """WAV PCM16 encode->decode is sample-exact for random lengths,
    channel layouts and rates (odd byte counts exercise RIFF padding)."""
    rng = np.random.default_rng(seed)
    shape = (n,) if nch == 0 else (n, nch)
    x = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    samples, got_rate, got_nch = wav_decode(wav_encode(x, sample_rate=rate))
    ref = x if x.ndim == 2 else x[:, None]
    assert got_rate == rate and got_nch == ref.shape[1]
    assert (samples == ref).all()


@settings(max_examples=15, deadline=None)
@given(h=st.integers(min_value=8, max_value=40),
       w=st.integers(min_value=8, max_value=40),
       fx=st.sampled_from([5.0, 9.0, 16.0]),
       fy=st.sampled_from([7.0, 11.0, 20.0]),
       quality=st.sampled_from([85, 92, 95]),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_roundtrip_property(h, w, fx, fy, quality, seed):
    """JPEG gray encode->decode stays within quantization error for
    random smooth images at random non-multiple-of-8 dims (edge-block
    replication padding) and qualities — mean error bounded, shape
    preserved exactly."""
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    ph_x, ph_y = rng.uniform(0, 6.28, 2)
    img = np.clip(128 + 60 * np.sin(x / fx + ph_x) * np.cos(y / fy + ph_y)
                  + rng.normal(0, 2, size=(h, w)), 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode_gray(img, quality=quality))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.mean() < 6.0, (h, w, quality, err.mean())
