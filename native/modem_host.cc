// Native host runtime for the TPU modem: byte-level framing hot path.
//
// The reference implements its entire host pipeline in C++ (encode.cc /
// decode.cc); in this framework the device math lives in XLA and the
// host-side byte plumbing lives here: WAV sample (de)quantisation, the
// xorshift32 payload scrambler, reflected CRCs and LSB/MSB bit packing.
// Exposed as a plain C ABI consumed via ctypes (modem_tpu/native.py),
// with pure-numpy fallbacks when the library is not built.
//
// Semantics mirror modem_tpu/bits.py exactly (property-tested against
// it in tests/test_native.py):
//   * xorshift32: Marsaglia triplet (13, 17, 5), seed 2463534242,
//     low byte of each state XORed onto the payload (encode.cc:417-419).
//   * CRC: reflected, init 0, no xorout (crc.hh semantics pinned by
//     decode.cc:533-541).
//   * bits: LSB-first per byte for payload, MSB-first for headers
//     (bitman.hh call sites).

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// xorshift32 scrambler (self-inverse XOR keystream)
// ---------------------------------------------------------------------------

void modem_scramble(uint8_t *data, int64_t len, uint32_t seed) {
  uint32_t y = seed;
  for (int64_t i = 0; i < len; ++i) {
    y ^= y << 13;
    y ^= y >> 17;
    y ^= y << 5;
    data[i] ^= static_cast<uint8_t>(y);
  }
}

// ---------------------------------------------------------------------------
// reflected CRC (byte-wise table, built per call-site once host-side)
// ---------------------------------------------------------------------------

void modem_crc_table(uint32_t poly, uint32_t *table256) {
  for (uint32_t byte = 0; byte < 256; ++byte) {
    uint32_t reg = byte;
    for (int k = 0; k < 8; ++k) reg = (reg >> 1) ^ ((reg & 1) ? poly : 0);
    table256[byte] = reg;
  }
}

uint32_t modem_crc_bytes(const uint32_t *table256, const uint8_t *data,
                         int64_t len, uint32_t reg) {
  for (int64_t i = 0; i < len; ++i)
    reg = table256[(reg ^ data[i]) & 0xFF] ^ (reg >> 8);
  return reg;
}

// ---------------------------------------------------------------------------
// bit packing (bitman.hh): LE = LSB-first within each byte, BE = MSB-first
// ---------------------------------------------------------------------------

void modem_bytes_to_bits_le(const uint8_t *bytes, int64_t nbytes,
                            uint8_t *bits) {
  for (int64_t i = 0; i < nbytes; ++i)
    for (int b = 0; b < 8; ++b) bits[8 * i + b] = (bytes[i] >> b) & 1;
}

void modem_bits_to_bytes_le(const uint8_t *bits, int64_t nbits,
                            uint8_t *bytes) {
  std::memset(bytes, 0, (nbits + 7) / 8);
  for (int64_t i = 0; i < nbits; ++i)
    if (bits[i]) bytes[i / 8] |= static_cast<uint8_t>(1u << (i % 8));
}

void modem_bytes_to_bits_be(const uint8_t *bytes, int64_t nbytes,
                            uint8_t *bits) {
  for (int64_t i = 0; i < nbytes; ++i)
    for (int b = 0; b < 8; ++b) bits[8 * i + b] = (bytes[i] >> (7 - b)) & 1;
}

// ---------------------------------------------------------------------------
// WAV sample quantisation (wav.hh value semantics)
// ---------------------------------------------------------------------------

void modem_quantize_i16(const float *samples, int64_t n, int16_t *out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = samples[i] * 32767.0f;
    v = v > 32767.0f ? 32767.0f : (v < -32768.0f ? -32768.0f : v);
    out[i] = static_cast<int16_t>(v >= 0 ? v + 0.5f : v - 0.5f);
  }
}

void modem_dequantize_i16(const int16_t *in, int64_t n, float *samples) {
  const float s = 1.0f / 32767.0f;
  for (int64_t i = 0; i < n; ++i) samples[i] = in[i] * s;
}

void modem_quantize_u8(const float *samples, int64_t n, uint8_t *out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = samples[i] * 127.0f;
    v = v > 127.0f ? 127.0f : (v < -128.0f ? -128.0f : v);
    int q = static_cast<int>(v >= 0 ? v + 0.5f : v - 0.5f);
    out[i] = static_cast<uint8_t>(q + 128);
  }
}

void modem_dequantize_u8(const uint8_t *in, int64_t n, float *samples) {
  const float s = 1.0f / 127.0f;
  for (int64_t i = 0; i < n; ++i) samples[i] = (in[i] - 128.0f) * s;
}

}  // extern "C"
