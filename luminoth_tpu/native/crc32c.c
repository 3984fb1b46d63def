/* CRC32-C (Castagnoli) — slicing-by-8, for TFRecord framing.
 *
 * The reference delegates record framing to TensorFlow's C++ kernels
 * (tf.python_io / TFRecordReader); this is our native equivalent for the
 * pure-JAX stack. Built into a shared object loaded via ctypes (no pybind11
 * in the image). ~1 GB/s, vs ~5 MB/s for a pure-python table loop.
 */

#include <stddef.h>
#include <stdint.h>

static uint32_t table[8][256];
static int initialized = 0;

static void init_tables(void) {
    const uint32_t poly = 0x82f63b78u;
    for (int i = 0; i < 256; i++) {
        uint32_t crc = (uint32_t)i;
        for (int j = 0; j < 8; j++)
            crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
        table[0][i] = crc;
    }
    for (int i = 0; i < 256; i++) {
        uint32_t crc = table[0][i];
        for (int k = 1; k < 8; k++) {
            crc = table[0][crc & 0xff] ^ (crc >> 8);
            table[k][i] = crc;
        }
    }
    initialized = 1;
}

uint32_t crc32c(const uint8_t *data, size_t length, uint32_t init) {
    if (!initialized) init_tables();
    uint32_t crc = init ^ 0xffffffffu;
    while (length >= 8) {
        uint32_t lo = (uint32_t)data[0] | ((uint32_t)data[1] << 8) |
                      ((uint32_t)data[2] << 16) | ((uint32_t)data[3] << 24);
        uint32_t hi = (uint32_t)data[4] | ((uint32_t)data[5] << 8) |
                      ((uint32_t)data[6] << 16) | ((uint32_t)data[7] << 24);
        lo ^= crc;
        crc = table[7][lo & 0xff] ^ table[6][(lo >> 8) & 0xff] ^
              table[5][(lo >> 16) & 0xff] ^ table[4][(lo >> 24) & 0xff] ^
              table[3][hi & 0xff] ^ table[2][(hi >> 8) & 0xff] ^
              table[1][(hi >> 16) & 0xff] ^ table[0][(hi >> 24) & 0xff];
        data += 8;
        length -= 8;
    }
    while (length--) {
        crc = table[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
    }
    return crc ^ 0xffffffffu;
}
