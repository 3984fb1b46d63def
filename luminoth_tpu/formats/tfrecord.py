"""TFRecord container format: reader and writer, TF-free.

Binary framing per record (TensorFlow-compatible, so datasets produced by
the reference toolchain read unchanged and vice versa):

    uint64 length | uint32 masked_crc(length) | bytes data |
    uint32 masked_crc(data)

reference behavior replaced: ``tf.TFRecordReader`` + queue runners
(luminoth/datasets/base_dataset.py:43-76) and ``tf.python_io
.TFRecordWriter`` (tools writers).
"""

import struct

from luminoth_tpu.formats.crc32c import masked_crc32c
from luminoth_tpu.utils import fileio


class TFRecordWriter:
    """Write TFRecord files (with correct masked CRCs)."""

    def __init__(self, path):
        self._file = fileio.open_file(path, "wb")

    def write(self, data):
        data = bytes(data)
        length = struct.pack("<Q", len(data))
        self._file.write(length)
        self._file.write(struct.pack("<I", masked_crc32c(length)))
        self._file.write(data)
        self._file.write(struct.pack("<I", masked_crc32c(data)))

    def flush(self):
        self._file.flush()

    def close(self):
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_tfrecords(path, verify=False):
    """Yield record payloads from one TFRecord file.

    The 12-byte length CRC is ALWAYS checked: it is what stands between a
    corrupt/desynced length field and an attempt to allocate up to 2^64
    bytes, and it costs nothing relative to the read. ``verify=True``
    additionally checks the per-record data CRC (off by default for
    speed; the native CRC makes it cheap when enabled).
    """
    with fileio.open_file(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                if header:
                    raise IOError(f"truncated record header in {path}")
                return
            (length,) = struct.unpack("<Q", header[:8])
            (length_crc,) = struct.unpack("<I", header[8:12])
            if masked_crc32c(header[:8]) != length_crc:
                raise IOError(f"corrupt length CRC in {path}")
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"truncated record in {path}")
            crc_bytes = f.read(4)
            if len(crc_bytes) < 4:
                raise IOError(f"truncated record in {path}")
            (data_crc,) = struct.unpack("<I", crc_bytes)
            if verify and masked_crc32c(data) != data_crc:
                raise IOError(f"corrupt data CRC in {path}")
            yield data


def find_split_files(data_dir, split):
    """Locate record files for a split (``{split}.tfrecords`` or shards).

    ``data_dir`` may be a remote URL (``gs://…``): discovery and reads
    both route through :mod:`luminoth_tpu.utils.fileio`.
    """
    single = fileio.join(data_dir, f"{split}.tfrecords")
    if fileio.exists(single):
        return [single]

    shards = sorted(fileio.glob(fileio.join(data_dir, f"{split}-*.tfrecords")))
    if shards:
        return shards
    raise FileNotFoundError(
        f"no tfrecords for split '{split}' in {data_dir}"
    )
