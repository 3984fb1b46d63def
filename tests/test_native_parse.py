"""Native C record parser vs the python codec (semantics oracle)."""

import numpy as np
import pytest

from luminoth_tpu.formats.example_pb import (
    decode_sequence_example,
    encode_sequence_example,
)
from luminoth_tpu.formats.native_example import (
    native_available,
    parse_od_record,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C compiler for the native parser"
)


def _python_reference(record):
    """The python-path semantics of ``parse_record`` (minus image decode)."""
    context, lists = decode_sequence_example(record)
    image = context["image_raw"][0]
    num = len(lists.get("label", []))
    bboxes = np.zeros((num, 5), dtype=np.float32)
    for i in range(num):
        bboxes[i] = [
            lists["xmin"][i][0],
            lists["ymin"][i][0],
            lists["xmax"][i][0],
            lists["ymax"][i][0],
            lists["label"][i][0],
        ]
    filename = context.get("filename", [b""])[0].decode("utf-8", "replace")
    return image, bboxes, filename


def _record(n_boxes, rng, filename=b"img.jpg", float_coords=False,
            image=b"\xff\xd8jpegdata\x00\x01"):
    coords = rng.randint(0, 1000, size=(4, n_boxes))
    if float_coords:
        steps = lambda row: [[float(v) + 0.5] for v in row]  # noqa: E731
    else:
        steps = lambda row: [[int(v)] for v in row]  # noqa: E731
    context = {
        "image_raw": image,
        "width": 640,
        "height": 480,
        "depth": 3,
    }
    if filename is not None:
        context["filename"] = filename
    return encode_sequence_example(
        context,
        {
            "label": [[int(v)] for v in rng.randint(0, 80, n_boxes)],
            "xmin": steps(coords[0]),
            "ymin": steps(coords[1]),
            "xmax": steps(coords[2]),
            "ymax": steps(coords[3]),
        },
    )


def test_fuzz_against_python_codec():
    rng = np.random.RandomState(0)
    for trial in range(50):
        n = int(rng.randint(0, 12))
        record = _record(
            n, rng, float_coords=bool(trial % 3 == 0),
            filename="ünïcode-ファイル.jpg".encode("utf-8"),
        )
        image_py, boxes_py, fname_py = _python_reference(record)
        image_nat, boxes_nat, fname_nat, dims = parse_od_record(record)
        assert image_nat == image_py
        assert fname_nat == fname_py
        np.testing.assert_array_equal(boxes_nat, boxes_py)
        assert dims == (480, 640, 3)


def test_box_count_beyond_initial_capacity_retries():
    rng = np.random.RandomState(1)
    record = _record(150, rng)
    _, boxes_py, _ = _python_reference(record)
    _, boxes_nat, _, _ = parse_od_record(record, max_boxes=64)
    assert boxes_nat.shape == (150, 5)
    np.testing.assert_array_equal(boxes_nat, boxes_py)


def test_no_boxes_and_no_filename():
    rng = np.random.RandomState(2)
    record = _record(0, rng, filename=None)
    image, boxes, fname, _ = parse_od_record(record)
    assert image.startswith(b"\xff\xd8")
    assert boxes.shape == (0, 5)
    assert fname == ""


def test_missing_image_raises():
    record = encode_sequence_example(
        {"width": 10}, {"label": [[1]], "xmin": [[0]], "ymin": [[0]],
                        "xmax": [[5]], "ymax": [[5]]}
    )
    with pytest.raises(ValueError):
        parse_od_record(record)


def test_short_coordinate_list_raises():
    record = encode_sequence_example(
        {"image_raw": b"x"},
        {"label": [[1], [2]], "xmin": [[0]], "ymin": [[0], [1]],
         "xmax": [[5], [6]], "ymax": [[5], [6]]},
    )
    # python path: lists["xmin"][1][0] -> IndexError (record skipped)
    with pytest.raises(IndexError):
        _python_reference(record)
    with pytest.raises(ValueError):
        parse_od_record(record)


def test_empty_coordinate_feature_raises():
    # A Feature step exists but its value list is empty: python indexes
    # lists["xmin"][1][0] -> IndexError; the native path must reject the
    # record too, not silently write 0.0.
    record = encode_sequence_example(
        {"image_raw": b"x"},
        {"label": [[1], [2]], "xmin": [[0], []], "ymin": [[0], [1]],
         "xmax": [[5], [6]], "ymax": [[5], [6]]},
    )
    with pytest.raises(IndexError):
        _python_reference(record)
    with pytest.raises(ValueError):
        parse_od_record(record)


def test_empty_feature_beyond_label_count_is_ignored():
    # Empty Features at indexes the python path never reads (>= num
    # labels) are not an error on either path.
    record = encode_sequence_example(
        {"image_raw": b"x"},
        {"label": [[1]], "xmin": [[0], []], "ymin": [[0]],
         "xmax": [[5]], "ymax": [[5]]},
    )
    _, boxes_py, _ = _python_reference(record)
    _, boxes_nat, _, _ = parse_od_record(record)
    np.testing.assert_array_equal(boxes_nat, boxes_py)


def test_truncated_record_raises():
    rng = np.random.RandomState(3)
    record = _record(3, rng)
    with pytest.raises(ValueError):
        parse_od_record(record[: len(record) // 2])


def test_loader_parse_record_uses_native_path():
    """End to end through the dataset's parse_record (image decode incl.)."""
    import io

    from PIL import Image

    from luminoth_tpu.datasets.object_detection_dataset import parse_record

    rng = np.random.RandomState(4)
    arr = rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # lossless
    record = _record(2, rng, image=buf.getvalue())
    image, boxes, fname = parse_record(record)
    np.testing.assert_array_equal(image, arr)
    assert boxes.shape == (2, 5)
    assert fname == "img.jpg"
