"""Minimal protobuf wire codec for tf.train.Example / SequenceExample.

TF-free encoder/decoder for exactly the message shapes the dataset pipeline
uses (reference schema: luminoth/datasets/object_detection_dataset.py:40-54
and the writer at tools/dataset/writers/object_detection_writer.py). Wire
format reference: protobuf encoding docs (varints, length-delimited fields).

Message layout (field numbers from tensorflow/core/example/{example,feature}.proto):

    Example        { 1: Features }
    SequenceExample{ 1: Features context, 2: FeatureLists feature_lists }
    Features       { 1: map<string, Feature> = repeated Entry{1:key 2:val} }
    FeatureLists   { 1: map<string, FeatureList> }
    FeatureList    { 1: repeated Feature }
    Feature        { 1: BytesList, 2: FloatList, 3: Int64List }
    BytesList      { 1: repeated bytes }
    FloatList      { 1: repeated float (packed) }
    Int64List      { 1: repeated int64 (packed varint) }
"""

import struct

# ---------------------------------------------------------------- encoding


def _write_varint(out, value):
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def _write_tag(out, field_number, wire_type):
    _write_varint(out, (field_number << 3) | wire_type)


def _write_len_delimited(out, field_number, payload):
    _write_tag(out, field_number, 2)
    _write_varint(out, len(payload))
    out.extend(payload)


def _is_float(v):
    # np.float32 is NOT a python-float subclass (np.float64 is); an
    # isinstance(v, float) check would silently route float32 values to
    # the Int64List branch, truncating them to zeros on the wire.
    import numbers

    return isinstance(v, numbers.Real) and not isinstance(
        v, numbers.Integral
    )


def encode_feature(value):
    """Encode one Feature from a python value.

    bytes / list[bytes] → BytesList; float / list[float] → FloatList;
    int / list[int] → Int64List (bools count as ints).
    """
    if not isinstance(value, (list, tuple)):
        value = [value]
    inner = bytearray()
    if len(value) and isinstance(value[0], (bytes, bytearray, str)):
        for v in value:
            if isinstance(v, str):
                v = v.encode("utf-8")
            _write_len_delimited(inner, 1, v)
        kind = 1
    elif len(value) and _is_float(value[0]):
        packed = struct.pack(f"<{len(value)}f", *(float(v) for v in value))
        _write_len_delimited(inner, 1, packed)
        kind = 2
    else:
        packed = bytearray()
        for v in value:
            _write_varint(packed, int(v) & 0xFFFFFFFFFFFFFFFF)
        _write_len_delimited(inner, 1, bytes(packed))
        kind = 3
    feature = bytearray()
    _write_len_delimited(feature, kind, bytes(inner))
    return bytes(feature)


def _encode_features_map(feature_dict, entry_field=1):
    """Features message: map<string, Feature>."""
    out = bytearray()
    for key, value in feature_dict.items():
        entry = bytearray()
        _write_len_delimited(entry, 1, key.encode("utf-8"))
        _write_len_delimited(entry, 2, encode_feature(value))
        _write_len_delimited(out, entry_field, bytes(entry))
    return bytes(out)


def encode_example(feature_dict):
    """tf.train.Example from {name: value}."""
    out = bytearray()
    _write_len_delimited(out, 1, _encode_features_map(feature_dict))
    return bytes(out)


def encode_sequence_example(context_dict, feature_lists_dict):
    """tf.train.SequenceExample.

    Args:
        context_dict: {name: scalar/list value} context features.
        feature_lists_dict: {name: list of per-step values}; each step value
            becomes one Feature in the FeatureList.
    """
    out = bytearray()
    _write_len_delimited(out, 1, _encode_features_map(context_dict))

    lists = bytearray()
    for key, steps in feature_lists_dict.items():
        flist = bytearray()
        for step in steps:
            _write_len_delimited(flist, 1, encode_feature(step))
        entry = bytearray()
        _write_len_delimited(entry, 1, key.encode("utf-8"))
        _write_len_delimited(entry, 2, bytes(flist))
        _write_len_delimited(lists, 1, bytes(entry))
    _write_len_delimited(out, 2, bytes(lists))
    return bytes(out)


# ---------------------------------------------------------------- decoding


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    """Yield (field_number, wire_type, value_or_span) over a message."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
            yield field, wire, value
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def decode_feature(buf):
    """Feature message → python list (bytes / floats / ints)."""
    for field, _, span in _iter_fields(buf):
        if field == 1:  # BytesList
            values = []
            for f2, _, v in _iter_fields(span):
                if f2 == 1:
                    values.append(bytes(v))
            return values
        if field == 2:  # FloatList
            values = []
            for f2, wire, v in _iter_fields(span):
                if f2 == 1:
                    if wire == 2:  # packed
                        values.extend(
                            struct.unpack(f"<{len(v) // 4}f", v)
                        )
                    else:
                        values.append(struct.unpack("<f", v)[0])
            return values
        if field == 3:  # Int64List
            values = []
            for f2, wire, v in _iter_fields(span):
                if f2 == 1:
                    if wire == 2:  # packed
                        pos = 0
                        while pos < len(v):
                            value, pos = _read_varint(v, pos)
                            if value >= 1 << 63:
                                value -= 1 << 64
                            values.append(value)
                    else:
                        if v >= 1 << 63:
                            v -= 1 << 64
                        values.append(v)
            return values
    return []


def _decode_features_map(buf):
    features = {}
    for field, _, entry in _iter_fields(buf):
        if field != 1:
            continue
        key = None
        value = None
        for f2, _, v in _iter_fields(entry):
            if f2 == 1:
                key = bytes(v).decode("utf-8")
            elif f2 == 2:
                value = decode_feature(v)
        if key is not None:
            features[key] = value
    return features


def decode_example(buf):
    """tf.train.Example bytes → {name: list of values}."""
    for field, _, span in _iter_fields(buf):
        if field == 1:
            return _decode_features_map(span)
    return {}


def decode_sequence_example(buf):
    """tf.train.SequenceExample bytes → (context dict, feature_lists dict).

    feature_lists values are lists-of-lists (one inner list per step).
    """
    context = {}
    feature_lists = {}
    for field, _, span in _iter_fields(buf):
        if field == 1:
            context = _decode_features_map(span)
        elif field == 2:
            for f2, _, entry in _iter_fields(span):
                if f2 != 1:
                    continue
                key = None
                steps = []
                for f3, _, v in _iter_fields(entry):
                    if f3 == 1:
                        key = bytes(v).decode("utf-8")
                    elif f3 == 2:
                        for f4, _, feat in _iter_fields(v):
                            if f4 == 1:
                                steps.append(decode_feature(feat))
                if key is not None:
                    feature_lists[key] = steps
    return context, feature_lists
