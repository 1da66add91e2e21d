"""Stdlib PNG/WAV codecs: real compressed decode for the multimodal stage."""

import struct
import zlib

import numpy as np
import pytest

from aws_medallion_datalake_ray.functions.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from aws_medallion_datalake_ray.stages.multimodal import MediaFeaturizer


@pytest.mark.parametrize("shape", [(5, 7), (9, 4, 3), (6, 6, 4)])
def test_png_roundtrip_all_filters(shape):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    # filter_mix cycles filters 0-4 across scanlines -> every decode branch
    dec = decode_png(encode_png(img, filter_mix=True))
    assert np.array_equal(dec, img)
    dec0 = decode_png(encode_png(img, filter_mix=False))
    assert np.array_equal(dec0, img)


def test_png_gradient_compresses():
    """A smooth gradient must actually COMPRESS (proves zlib is in play)."""
    y = np.arange(64, dtype=np.uint8)[:, None]
    img = np.broadcast_to(y, (64, 64)).copy()
    data = encode_png(img)
    assert len(data) < img.size // 2
    assert np.array_equal(decode_png(data), img)


def test_png_known_vector():
    """Hand-assembled 1x2 RGB PNG (filter 0) decodes to the exact pixels —
    independent of our own encoder."""
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)  # 2x1 RGB8
    raw = bytes([0, 255, 0, 0, 0, 0, 255])  # filter 0, red px, blue px
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = decode_png(data)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 0, 255]


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_wav_roundtrip_mono_and_stereo():
    s = np.array([-32768, -1, 0, 1, 32767, 12345], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, sample_rate=22050))
    assert rate == 22050
    assert np.array_equal(out, s)
    st = s.reshape(-1, 2)
    out2, _ = decode_wav(encode_wav(st.reshape(-1), n_channels=2))
    assert out2.shape == (3, 2)
    assert np.array_equal(out2, st)


def test_wav_tolerates_extra_chunks():
    s = np.array([1, 2, 3], dtype=np.int16)
    data = bytearray(encode_wav(s))
    # splice a LIST chunk between fmt and data (odd length -> padding)
    ins = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    data[ins:ins] = extra
    data[4:8] = struct.pack("<I", len(data) - 8)
    out, _ = decode_wav(bytes(data))
    assert np.array_equal(out, s)


def test_featurizer_decodes_png_and_wav_for_real():
    f = MediaFeaturizer()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    dec = f._decode(encode_png(img), "png", 9, 12)
    assert np.array_equal(dec, img)
    with pytest.raises(ValueError, match="metadata"):
        f._decode(encode_png(img), "png", 12, 9)  # swapped dims

    s = rng.integers(-(2**15), 2**15, 500, dtype=np.int16)
    assert np.array_equal(f._decode(encode_wav(s), "wav", 0, 0), s)
