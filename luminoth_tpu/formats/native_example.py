"""Native (C) parser for object-detection SequenceExample records.

Hot-path replacement for the pure-python protobuf walk in
``example_pb.decode_sequence_example`` + the box assembly in
``datasets.object_detection_dataset.parse_record``: one C pass extracts
the image bytes, filename, and the (N, 5) box array. Compiled on first
use from ``native/example_parse.c`` (same scheme as ``crc32c``); callers
fall back to the python codec when no compiler is available.

Bit-exact with the python decoder by construction (same wire walk, same
first-value semantics); ``tests/test_native_parse.py`` fuzzes both
against each other.
"""

import ctypes
import os

import numpy as np

from luminoth_tpu.formats.native_loader import load_native_lib

_C_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "example_parse.c",
)


def _configure(lib):
    lib.lumi_parse_od_record.restype = ctypes.c_int
    lib.lumi_parse_od_record.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,          # buf, len
        ctypes.POINTER(ctypes.c_size_t),           # image_off
        ctypes.POINTER(ctypes.c_size_t),           # image_len
        ctypes.POINTER(ctypes.c_size_t),           # fname_off
        ctypes.POINTER(ctypes.c_size_t),           # fname_len
        ctypes.POINTER(ctypes.c_int64),            # width
        ctypes.POINTER(ctypes.c_int64),            # height
        ctypes.POINTER(ctypes.c_int64),            # depth
        ctypes.POINTER(ctypes.c_float),            # boxes
        ctypes.c_int,                              # max_boxes
        ctypes.POINTER(ctypes.c_int),              # num_boxes
    ]


def _load_native():
    # Memoized (failures included) inside load_native_lib.
    return load_native_lib("example_parse.so", _C_SOURCE, _configure)


def native_available():
    return _load_native() is not None


def parse_od_record(record, max_boxes=64):
    """Parse one record natively.

    Returns ``(image_bytes, bboxes (N, 5) float32, filename, dims)`` with
    ``dims = (height, width, depth)`` from the context (-1 when absent),
    or ``None`` when the native library is unavailable (caller falls back
    to the python codec). Raises ``ValueError`` on malformed records —
    the same contract as the python path (the loader skips them).
    """
    lib = _load_native()
    if lib is None:
        return None
    record = bytes(record)

    image_off = ctypes.c_size_t()
    image_len = ctypes.c_size_t()
    fname_off = ctypes.c_size_t()
    fname_len = ctypes.c_size_t()
    width = ctypes.c_int64()
    height = ctypes.c_int64()
    depth = ctypes.c_int64()
    num_boxes = ctypes.c_int()

    cap = int(max_boxes)
    while True:
        boxes = np.zeros((max(cap, 1), 5), dtype=np.float32)
        rc = lib.lumi_parse_od_record(
            record, len(record),
            ctypes.byref(image_off), ctypes.byref(image_len),
            ctypes.byref(fname_off), ctypes.byref(fname_len),
            ctypes.byref(width), ctypes.byref(height), ctypes.byref(depth),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap, ctypes.byref(num_boxes),
        )
        if rc != 0:
            raise ValueError(
                f"malformed object-detection record (native rc={rc})"
            )
        if num_boxes.value <= cap:
            break
        cap = num_boxes.value  # retry with room for every box

    n = num_boxes.value
    image = record[image_off.value:image_off.value + image_len.value]
    filename = record[
        fname_off.value:fname_off.value + fname_len.value
    ].decode("utf-8", "replace")
    return (
        image,
        boxes[:n],
        filename,
        (height.value, width.value, depth.value),
    )
