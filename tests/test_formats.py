"""TFRecord container + Example protobuf codec tests."""

import numpy as np
import pytest

from luminoth_tpu.formats.crc32c import crc32c, masked_crc32c
from luminoth_tpu.formats.example_pb import (
    decode_example,
    decode_sequence_example,
    encode_example,
    encode_sequence_example,
)
from luminoth_tpu.formats.tfrecord import TFRecordWriter, read_tfrecords


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 / kernel test vectors.
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0x0
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_python_fallback_agrees(self):
        from luminoth_tpu.formats import native_loader

        data = bytes(range(256)) * 7 + b"tail"
        native = crc32c(data)
        saved = native_loader._CACHE.get("crc32c.so")
        try:
            native_loader._CACHE["crc32c.so"] = None  # force python path
            assert crc32c(data) == native
        finally:
            native_loader._CACHE["crc32c.so"] = saved

    def test_masked(self):
        # masking formula sanity
        m = masked_crc32c(b"123456789")
        assert m != crc32c(b"123456789")
        assert 0 <= m < 2**32


class TestTFRecordRoundTrip:
    def test_write_read(self, tmp_path):
        path = str(tmp_path / "test.tfrecords")
        records = [b"hello", b"", b"x" * 10000, bytes(range(256))]
        with TFRecordWriter(path) as w:
            for r in records:
                w.write(r)
        got = list(read_tfrecords(path, verify=True))
        assert got == records

    def test_corrupt_length_raises_not_allocates(self, tmp_path):
        # A flipped byte in the uint64 length must hit the (always-on)
        # length CRC and raise, not attempt a multi-GB read.
        path = str(tmp_path / "bad.tfrecords")
        with TFRecordWriter(path) as w:
            w.write(b"payload")
        raw = bytearray(open(path, "rb").read())
        raw[3] ^= 0x40  # corrupt a high length byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(read_tfrecords(path))

    def test_truncated_trailing_crc_raises(self, tmp_path):
        path = str(tmp_path / "trunc.tfrecords")
        with TFRecordWriter(path) as w:
            w.write(b"payload")
        raw = open(path, "rb").read()
        open(path, "wb").write(raw[:-2])  # cut into the data CRC
        with pytest.raises(IOError):
            list(read_tfrecords(path))

    def test_truncated_header_raises(self, tmp_path):
        path = str(tmp_path / "hdr.tfrecords")
        with TFRecordWriter(path) as w:
            w.write(b"payload")
            w.write(b"second")
        raw = open(path, "rb").read()
        # Cut mid-way into the second record's 12-byte header.
        open(path, "wb").write(raw[: 12 + 7 + 4 + 5])
        with pytest.raises(IOError):
            list(read_tfrecords(path))


class TestExampleCodec:
    def test_example_round_trip(self):
        features = {
            "image_raw": b"\x89PNG...",
            "filename": b"img.jpg",
            "width": 640,
            "height": [480],
            "scale": [1.5, 2.0],
        }
        buf = encode_example(features)
        decoded = decode_example(buf)
        assert decoded["image_raw"] == [b"\x89PNG..."]
        assert decoded["filename"] == [b"img.jpg"]
        assert decoded["width"] == [640]
        assert decoded["height"] == [480]
        np.testing.assert_allclose(decoded["scale"], [1.5, 2.0], rtol=1e-6)

    def test_sequence_example_round_trip(self):
        context = {
            "image_raw": b"rawbytes",
            "filename": b"a.jpg",
            "width": 100,
            "height": 80,
            "depth": 3,
        }
        # One Feature per gt box, matching the reference record schema.
        lists = {
            "label": [[1], [5]],
            "xmin": [[10], [40]],
            "ymin": [[20], [50]],
            "xmax": [[30], [60]],
            "ymax": [[35], [70]],
        }
        buf = encode_sequence_example(context, lists)
        ctx, fl = decode_sequence_example(buf)
        assert ctx["width"] == [100]
        assert ctx["image_raw"] == [b"rawbytes"]
        assert fl["label"] == [[1], [5]]
        assert fl["xmax"] == [[30], [60]]

    def test_negative_int64(self):
        buf = encode_example({"v": -5})
        assert decode_example(buf)["v"] == [-5]

    def test_float_lists_one_per_step(self):
        buf = encode_sequence_example({}, {"s": [[0.5], [1.25]]})
        _, fl = decode_sequence_example(buf)
        assert fl["s"] == [[0.5], [1.25]]

    def test_numpy_float32_encodes_as_float_list(self):
        # np.float32 is not a python-float subclass; a naive isinstance
        # check would truncate these to Int64List zeros on the wire.
        values = list(np.asarray([0.7, 0.2], np.float32))
        buf = encode_example({"scores": values})
        np.testing.assert_allclose(
            decode_example(buf)["scores"], [0.7, 0.2], rtol=1e-6
        )

    def test_numpy_int_encodes_as_int64(self):
        buf = encode_example({"v": list(np.asarray([3, -2], np.int64))})
        assert decode_example(buf)["v"] == [3, -2]
