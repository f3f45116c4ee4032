"""Property-based tests for the pure-Python multimodal codecs.

Pure Python/numpy — no Spark session.  Hypothesis drives random pixel
arrays and PCM signals through encode→decode and asserts exact (PNG,
GIF pattern, WAV) or quantization-bounded (JPEG) reconstruction.
"""

from hypothesis import given, settings, strategies as st

from streamingpro_spark.functions.codecs import (
    make_avi_encoder, make_avi_frame_extractor, make_gif_decoder,
    make_gif_encoder, make_jpeg_decoder, make_jpeg_encoder,
    make_mp4_encoder, make_png_decoder, make_rgb_png_encoder,
    make_video_meta_parser, make_wav_pcm_decoder)


@st.composite
def images(draw, max_side=24):
    w = draw(st.integers(1, max_side))
    h = draw(st.integers(1, max_side))
    px = [[tuple(draw(st.integers(0, 255)) for _ in range(3))
           for _ in range(w)] for _ in range(h)]
    return px


@settings(max_examples=20, deadline=None)
@given(images())
def test_png_roundtrip_exact(px):
    """PNG is lossless: arbitrary pixels reconstruct bit-exactly."""
    got = make_png_decoder()(make_rgb_png_encoder()(px))
    assert [[tuple(p) for p in row] for row in got] \
        == [[tuple(p) for p in row] for row in px]


@settings(max_examples=10, deadline=None)
@given(images(max_side=20))
def test_jpeg_roundtrip_bounded(px):
    """Baseline JPEG 4:4:4 on arbitrary noise stays within the
    accumulated quantization error bound of the uniform Q=4 table."""
    got = make_jpeg_decoder()(make_jpeg_encoder()(px))
    h, w = len(px), len(px[0])
    assert len(got) == h and len(got[0]) == w
    worst = max(abs(a - b) for rp, rg in zip(px, got)
                for pa, pb in zip(rp, rg) for a, b in zip(pa, pb))
    # 64 coeffs x 0.5*Q rounding error can align in the worst case;
    # random noise stays well under the analytic bound of 128
    assert worst <= 40, worst


@settings(max_examples=8, deadline=None)
@given(images(max_side=20), st.booleans())
def test_jpeg_progressive_matches_baseline(px, successive):
    """Progressive scans — spectral selection, and with
    successive=True the Al=1 / refinement bit-split — are a lossless
    reordering of the same quantized coefficients: decode must be
    bit-identical to the baseline stream's decode on ANY input."""
    enc, dec = make_jpeg_encoder(), make_jpeg_decoder()
    assert dec(enc(px, progressive=True, successive=successive)) \
        == dec(enc(px))


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64), st.integers(0, 255),
       st.booleans())
def test_gif_roundtrip_exact(w, h, seed, interlace):
    """GIF LZW is lossless over the palette: the encoder's gradient
    reconstructs exactly, interlaced or not."""
    px = make_gif_decoder()(make_gif_encoder()(w, h, seed,
                                               interlace=interlace))
    assert len(px) == h and len(px[0]) == w
    for y in range(h):
        for x in range(w):
            v = (x + y + seed) % 256
            assert px[y][x] == (v, v, v)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 12), st.integers(1, 40),
       st.lists(st.binary(min_size=0, max_size=64), max_size=12))
def test_avi_demux_roundtrip(wh, fps, frames):
    """The AVI movi demux returns exactly the frame payloads written,
    byte-for-byte, for any payload sizes (odd sizes exercise the RIFF
    word-alignment padding)."""
    avi = make_avi_encoder()(wh + 1, wh + 2, fps, len(frames),
                             frames=frames)
    assert make_avi_frame_extractor()(avi) == frames
    meta = make_video_meta_parser()(avi)
    assert meta[0] == wh + 1 and meta[3] == len(frames)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 4096), st.integers(1, 2160), st.integers(1, 120),
       st.integers(0, 100000))
def test_mp4_box_tree_roundtrip(w, h, fps, n):
    """ISO-BMFF metadata round-trips for arbitrary header values."""
    got = make_video_meta_parser()(make_mp4_encoder()(w, h, fps, n))
    assert got[0] == w and got[1] == h and got[3] == n
    if n:
        assert abs(got[2] - fps) < 1e-6


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 12), st.integers(1, 40),
       st.lists(st.binary(min_size=0, max_size=64), max_size=12))
def test_mp4_sample_extraction_roundtrip(wh, fps, frames):
    """stsz/stsc/stco sample tables + mdat round-trip: the extractor
    slices back exactly the sample payloads written, byte-for-byte,
    for any payload sizes."""
    from streamingpro_spark.functions.codecs import (
        make_mp4_sample_extractor)
    mp4 = make_mp4_encoder()(wh + 1, wh + 2, fps, len(frames),
                             frames=frames)
    assert make_mp4_sample_extractor()(mp4) == frames
    meta = make_video_meta_parser()(mp4)
    assert meta[0] == wh + 1 and meta[3] == len(frames)


@settings(max_examples=10, deadline=None)
@given(st.integers(1000, 48000), st.integers(0, 500),
       st.integers(1, 2), st.sampled_from([8, 16]),
       st.floats(0.1, 1.5))
def test_wav_pcm_decode_shape(sr, n, ch, bits, gain):
    """PCM decode recovers the exact (n_samples, channels) layout the
    encoder wrote — 8- and 16-bit, with out-of-range gain clipped
    instead of crashing the packer."""
    from streamingpro_spark.functions.codecs import make_wav_encoder
    dec = make_wav_pcm_decoder()(
        make_wav_encoder()(sr, n, channels=ch, bits=bits, gain=gain))
    assert dec is not None
    got_sr, got_ch, arr = dec
    assert (got_sr, got_ch) == (sr, ch)
    assert arr.shape == (n, ch)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["response", "conversion"]),
                          st.binary(min_size=0, max_size=200)),
                max_size=8),
       st.booleans(),
       st.integers(1, 64))
def test_warc_stream_parse_roundtrip(recs, gz, chunk):
    """The streaming WARC parser recovers every record byte-for-byte
    for ANY payload bytes (including CRLF lookalikes and embedded
    'WARC/' tokens inside payloads), plain and gzipped, under
    arbitrary tiny chunk sizes that force every token to straddle a
    fill boundary."""
    from streamingpro_spark.functions.warc import (make_warc_encoder,
                                                   make_warc_record_iter)
    full = [(t, f"http://x/{i}", "2026-01-01T00:00:00Z", p)
            for i, (t, p) in enumerate(recs)]
    raw = make_warc_encoder()(full, gzip_compress=gz)
    got = list(make_warc_record_iter()(raw, chunk_size=chunk))
    assert [(g["record_type"], bytes(g["content"])) for g in got] == \
        [(t, p) for t, _, _, p in full]
    assert all(g["content_length"] == len(bytes(g["content"]))
               for g in got)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=300),
       st.binary(min_size=0, max_size=100),
       st.integers(1, 32))
def test_warc_stream_parse_survives_junk(junk_a, junk_b, chunk):
    """Arbitrary junk before/after/between records never crashes the
    parser and never corrupts the good records' payloads."""
    from streamingpro_spark.functions.warc import (make_warc_encoder,
                                                   make_warc_record_iter)
    good = make_warc_encoder()(
        [("response", "http://x/0", "2026-01-01T00:00:00Z", b"payload-0"),
         ("conversion", "http://x/1", "2026-01-01T00:00:00Z", b"pay-1")])
    blob = junk_a + good + junk_b
    got = list(make_warc_record_iter()(blob, chunk_size=chunk))
    bodies = [bytes(g["content"]) for g in got]
    assert b"payload-0" in bodies and b"pay-1" in bodies
