/* Native SequenceExample parser for the object-detection record schema.
 *
 * Replaces the pure-python protobuf walk (formats/example_pb.py) on the
 * loader hot path: one C pass over the record extracts the image bytes,
 * filename, image dims, and the per-box {xmin,ymin,xmax,ymax,label}
 * feature lists (reference schema:
 * luminoth/datasets/object_detection_dataset.py:40-54).
 *
 * The caller keeps ownership of the record buffer; bytes fields are
 * returned as (offset, length) spans into it, so no copies happen here.
 *
 * Wire format: protobuf varints + length-delimited submessages.
 *   SequenceExample { 1: Features context, 2: FeatureLists }
 *   Features        { 1: repeated Entry { 1: key, 2: Feature } }
 *   FeatureLists    { 1: repeated Entry { 1: key, 2: FeatureList } }
 *   FeatureList     { 1: repeated Feature }
 *   Feature         { 1: BytesList{1: bytes}, 2: FloatList{1: packed f32},
 *                     3: Int64List{1: packed varint} }
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    const uint8_t *p;
    const uint8_t *end;
} cursor;

/* Return codes. */
#define LUMI_OK 0
#define LUMI_EMALFORMED (-1)
#define LUMI_ENOIMAGE (-2)
#define LUMI_EBOXLISTS (-3)

static int read_varint(cursor *c, uint64_t *out) {
    uint64_t result = 0;
    int shift = 0;
    while (c->p < c->end && shift < 64) {
        uint8_t b = *c->p++;
        result |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) {
            *out = result;
            return 0;
        }
        shift += 7;
    }
    return LUMI_EMALFORMED;
}

/* Read one field header + position the cursor at its payload.
 * For wire type 2 the span is returned; for 0 the varint value.
 * Returns 1 if a field was read, 0 at end of message, <0 on error. */
static int next_field(cursor *c, uint32_t *field, uint32_t *wire,
                      uint64_t *varint, cursor *span) {
    uint64_t tag, len;
    if (c->p >= c->end) return 0;
    if (read_varint(c, &tag)) return LUMI_EMALFORMED;
    *field = (uint32_t)(tag >> 3);
    *wire = (uint32_t)(tag & 7);
    switch (*wire) {
    case 0:
        if (read_varint(c, varint)) return LUMI_EMALFORMED;
        return 1;
    case 2:
        if (read_varint(c, &len)) return LUMI_EMALFORMED;
        if ((uint64_t)(c->end - c->p) < len) return LUMI_EMALFORMED;
        span->p = c->p;
        span->end = c->p + len;
        c->p += len;
        return 1;
    case 5:
        if (c->end - c->p < 4) return LUMI_EMALFORMED;
        span->p = c->p;
        span->end = c->p + 4;
        c->p += 4;
        return 1;
    case 1:
        if (c->end - c->p < 8) return LUMI_EMALFORMED;
        span->p = c->p;
        span->end = c->p + 8;
        c->p += 8;
        return 1;
    default:
        return LUMI_EMALFORMED;
    }
}

static float le_float(const uint8_t *p) {
    float f;
    uint32_t u = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                 ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
    memcpy(&f, &u, 4);
    return f;
}

/* First numeric value of a Feature (Int64List or FloatList member). */
static int feature_first_number(cursor feat, double *out, int *found) {
    uint32_t field, wire;
    uint64_t varint;
    cursor span, inner;
    int rc;
    *found = 0;
    while ((rc = next_field(&feat, &field, &wire, &varint, &span)) == 1) {
        if (wire != 2) continue;
        if (field == 3) { /* Int64List */
            inner = span;
            uint32_t f2, w2;
            uint64_t v2;
            cursor s2;
            while ((rc = next_field(&inner, &f2, &w2, &v2, &s2)) == 1) {
                if (f2 != 1) continue;
                if (w2 == 0) { /* unpacked varint */
                    *out = (double)(int64_t)v2;
                    *found = 1;
                    return LUMI_OK;
                }
                if (w2 == 2 && s2.p < s2.end) { /* packed */
                    uint64_t v;
                    if (read_varint(&s2, &v)) return LUMI_EMALFORMED;
                    *out = (double)(int64_t)v;
                    *found = 1;
                    return LUMI_OK;
                }
            }
            if (rc < 0) return rc;
        } else if (field == 2) { /* FloatList */
            inner = span;
            uint32_t f2, w2;
            uint64_t v2;
            cursor s2;
            while ((rc = next_field(&inner, &f2, &w2, &v2, &s2)) == 1) {
                if (f2 != 1) continue;
                if (w2 == 5) {
                    *out = (double)le_float(s2.p);
                    *found = 1;
                    return LUMI_OK;
                }
                if (w2 == 2 && s2.end - s2.p >= 4) { /* packed */
                    *out = (double)le_float(s2.p);
                    *found = 1;
                    return LUMI_OK;
                }
            }
            if (rc < 0) return rc;
        }
    }
    return rc < 0 ? rc : LUMI_OK;
}

/* First bytes value of a Feature (BytesList member), as a span. */
static int feature_first_bytes(cursor feat, cursor *out, int *found) {
    uint32_t field, wire;
    uint64_t varint;
    cursor span;
    int rc;
    *found = 0;
    while ((rc = next_field(&feat, &field, &wire, &varint, &span)) == 1) {
        if (field == 1 && wire == 2) { /* BytesList */
            cursor inner = span;
            uint32_t f2, w2;
            uint64_t v2;
            cursor s2;
            while ((rc = next_field(&inner, &f2, &w2, &v2, &s2)) == 1) {
                if (f2 == 1 && w2 == 2) {
                    *out = s2;
                    *found = 1;
                    return LUMI_OK;
                }
            }
            if (rc < 0) return rc;
        }
    }
    return rc < 0 ? rc : LUMI_OK;
}

static int span_eq(cursor s, const char *lit) {
    size_t n = strlen(lit);
    return (size_t)(s.end - s.p) == n && memcmp(s.p, lit, n) == 0;
}

/* Walk one FeatureList, writing up to `cap` first-values into
 * `vals[0], vals[stride], ...` and counting every step into `*count`.
 * `*first_empty` receives the index of the first step whose Feature has
 * no value (python's `lists[key][i][0]` raises IndexError there), or -1;
 * only steps below `cap` are inspected — the caller retries with a
 * bigger buffer when `*count > cap`, so every indexed step gets checked
 * eventually. */
static int read_feature_list(cursor flist, float *vals, int stride,
                             int cap, int *count, int *first_empty) {
    uint32_t field, wire;
    uint64_t varint;
    cursor span;
    int rc;
    *count = 0;
    *first_empty = -1;
    while ((rc = next_field(&flist, &field, &wire, &varint, &span)) == 1) {
        if (field != 1 || wire != 2) continue;
        if (*count < cap) {
            double v = 0.0;
            int found = 0;
            if ((rc = feature_first_number(span, &v, &found)) < 0) return rc;
            if (!found && *first_empty < 0) *first_empty = *count;
            vals[(size_t)*count * stride] = found ? (float)v : 0.0f;
        }
        (*count)++;
    }
    return rc < 0 ? rc : LUMI_OK;
}

/* Parse one object-detection SequenceExample.
 *
 * boxes: caller buffer with capacity max_boxes*5 floats; rows are
 * {xmin, ymin, xmax, ymax, label}. num_boxes receives the TRUE number of
 * steps in the `label` list (may exceed max_boxes — caller re-calls with
 * a bigger buffer). Missing coordinate lists (shorter than `label`) are
 * an error, matching the python decoder's IndexError -> skipped record.
 */
int lumi_parse_od_record(
    const uint8_t *buf, size_t len,
    size_t *image_off, size_t *image_len,
    size_t *fname_off, size_t *fname_len,
    int64_t *width, int64_t *height, int64_t *depth,
    float *boxes, int max_boxes, int *num_boxes) {
    cursor top = {buf, buf + len};
    cursor context = {NULL, NULL}, lists = {NULL, NULL};
    uint32_t field, wire;
    uint64_t varint;
    cursor span;
    int rc;

    *image_off = *image_len = *fname_off = *fname_len = 0;
    *width = *height = *depth = -1;
    *num_boxes = 0;

    while ((rc = next_field(&top, &field, &wire, &varint, &span)) == 1) {
        if (wire != 2) continue;
        if (field == 1) context = span;
        else if (field == 2) lists = span;
    }
    if (rc < 0) return rc;

    int have_image = 0;
    if (context.p) {
        cursor c = context;
        while ((rc = next_field(&c, &field, &wire, &varint, &span)) == 1) {
            if (field != 1 || wire != 2) continue;
            /* Entry { 1: key, 2: Feature } */
            cursor entry = span, key = {NULL, NULL}, feat = {NULL, NULL};
            uint32_t f2, w2;
            uint64_t v2;
            cursor s2;
            while ((rc = next_field(&entry, &f2, &w2, &v2, &s2)) == 1) {
                if (w2 != 2) continue;
                if (f2 == 1) key = s2;
                else if (f2 == 2) feat = s2;
            }
            if (rc < 0) return rc;
            if (!key.p || !feat.p) continue;
            if (span_eq(key, "image_raw")) {
                cursor b;
                int found;
                if ((rc = feature_first_bytes(feat, &b, &found)) < 0)
                    return rc;
                if (found) {
                    *image_off = (size_t)(b.p - buf);
                    *image_len = (size_t)(b.end - b.p);
                    have_image = 1;
                }
            } else if (span_eq(key, "filename")) {
                cursor b;
                int found;
                if ((rc = feature_first_bytes(feat, &b, &found)) < 0)
                    return rc;
                if (found) {
                    *fname_off = (size_t)(b.p - buf);
                    *fname_len = (size_t)(b.end - b.p);
                }
            } else if (span_eq(key, "width") || span_eq(key, "height") ||
                       span_eq(key, "depth")) {
                double v;
                int found;
                if ((rc = feature_first_number(feat, &v, &found)) < 0)
                    return rc;
                if (found) {
                    if (span_eq(key, "width")) *width = (int64_t)v;
                    else if (span_eq(key, "height")) *height = (int64_t)v;
                    else *depth = (int64_t)v;
                }
            }
        }
        if (rc < 0) return rc;
    }
    if (!have_image) return LUMI_ENOIMAGE;

    /* Column order matches the box row layout {x1, y1, x2, y2, label}. */
    static const char *kNames[5] = {"xmin", "ymin", "xmax", "ymax", "label"};
    int counts[5] = {0, 0, 0, 0, 0};
    int seen[5] = {0, 0, 0, 0, 0};
    int empties[5] = {-1, -1, -1, -1, -1};

    if (lists.p) {
        cursor c = lists;
        while ((rc = next_field(&c, &field, &wire, &varint, &span)) == 1) {
            if (field != 1 || wire != 2) continue;
            cursor entry = span, key = {NULL, NULL}, flist = {NULL, NULL};
            uint32_t f2, w2;
            uint64_t v2;
            cursor s2;
            while ((rc = next_field(&entry, &f2, &w2, &v2, &s2)) == 1) {
                if (w2 != 2) continue;
                if (f2 == 1) key = s2;
                else if (f2 == 2) flist = s2;
            }
            if (rc < 0) return rc;
            if (!key.p || !flist.p) continue;
            for (int col = 0; col < 5; col++) {
                if (!span_eq(key, kNames[col])) continue;
                int count = 0, first_empty = -1;
                if ((rc = read_feature_list(flist, boxes + col, 5,
                                            max_boxes, &count,
                                            &first_empty)) < 0)
                    return rc;
                counts[col] = count;
                seen[col] = 1;
                empties[col] = first_empty;
                break;
            }
        }
        if (rc < 0) return rc;
    }

    int num = seen[4] ? counts[4] : 0; /* len(lists["label"]) */
    *num_boxes = num;
    if (num > 0) {
        for (int col = 0; col < 5; col++) {
            /* python: lists["xmin"][i][0] -> IndexError if shorter, and
             * also when the i-th Feature's value list is empty. Empty
             * Features at i >= num are never indexed there, so they are
             * not an error here either. */
            if (!seen[col] || counts[col] < num) return LUMI_EBOXLISTS;
            if (empties[col] >= 0 && empties[col] < num)
                return LUMI_EBOXLISTS;
        }
    }
    return LUMI_OK;
}
