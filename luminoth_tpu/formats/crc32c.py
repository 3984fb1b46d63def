"""CRC32-C (Castagnoli) with masked variant, as used by TFRecord framing.

Prefers the native C implementation (compiled on first use with the system
compiler, loaded via ctypes); falls back to a pure-python table loop. The
masking scheme matches TensorFlow's record writer:
``masked = ((crc >> 15) | (crc << 17)) + 0xa282ead8``.
"""

import ctypes
import os

from luminoth_tpu.formats.native_loader import load_native_lib

_C_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "crc32c.c",
)


def _configure(lib):
    lib.crc32c.restype = ctypes.c_uint32
    lib.crc32c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_uint32,
    ]


def _load_native():
    # Memoized (failures included) inside load_native_lib.
    return load_native_lib("crc32c.so", _C_SOURCE, _configure)


_PY_TABLE = None


def _py_table():
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table.append(crc)
        _PY_TABLE = table
    return _PY_TABLE


def crc32c(data, init=0):
    """CRC32-C of ``data`` (bytes-like)."""
    data = bytes(data)
    lib = _load_native()
    if lib is not None:
        return lib.crc32c(data, len(data), init)
    table = _py_table()
    crc = init ^ 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data):
    """TFRecord's masked CRC."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
