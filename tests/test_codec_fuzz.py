"""Property fuzz for the binary decoders: on ARBITRARY bytes every
decoder either succeeds or raises ValueError — never IndexError,
struct.error, zlib.error, KeyError, or MemoryError. This is the
drop-per-row contract stated by each decoder's docstring, checked
mechanically: the multimodal wrappers catch exactly ValueError, so any
other exception type kills a Spark stage on one bad blob."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions.jpeg import decode_baseline_jpeg
from mktd6_flink_spark.functions.multimodal import (_parse_p5,
                                                    _parse_wav)
from mktd6_flink_spark.functions.png import (decode_png_gray,
                                             decode_png_rgb)

# seed corpora: valid payload prefixes make the fuzzer reach deep
# parse states instead of dying at the magic check
_JPEG_HEAD = b"\xff\xd8\xff\xdb\x00C\x00" + bytes([1] * 64)
_PNG_HEAD = b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR"
_P5_HEAD = b"P5\n4 3\n255\n"
_WAV_HEAD = b"RIFF\x24\x00\x00\x00WAVEfmt "


def _only_valueerror(fn, payload):
    try:
        fn(payload)
    except ValueError:
        pass
    # anything else propagates and fails the test


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_jpeg_decoder_total_on_garbage(tail):
    _only_valueerror(decode_baseline_jpeg, tail)
    _only_valueerror(decode_baseline_jpeg, _JPEG_HEAD + tail)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_png_decoder_total_on_garbage(tail):
    _only_valueerror(decode_png_gray, tail)
    _only_valueerror(decode_png_gray, _PNG_HEAD + tail)
    _only_valueerror(decode_png_rgb, tail)
    _only_valueerror(decode_png_rgb, _PNG_HEAD + tail)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_p5_parser_total_on_garbage(tail):
    _only_valueerror(_parse_p5, tail)
    _only_valueerror(_parse_p5, _P5_HEAD + tail)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_wav_parser_total_on_garbage(tail):
    _only_valueerror(_parse_wav, tail)
    _only_valueerror(_parse_wav, _WAV_HEAD + tail)
