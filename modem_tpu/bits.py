"""Host-side bit plumbing: packing, scrambler, CRC, MLS, base37.

These primitives define the wire format (reference: bitman.hh, xorshift.hh,
crc.hh, mls.hh call sites listed in SURVEY.md §2.3).  They are pure numpy —
byte-level framing work that belongs on the host; the device-side pipelines
consume their outputs as precomputed constant arrays (MLS sequences, CRC
check matrices) at trace time.

Conventions pinned by the reference call sites:
  * payload bits are little-endian within each byte (encode.cc:294,
    decode.cc:553 via CODE::{get,set}_le_bit);
  * header/metadata bits are big-endian within each byte (encode.cc:159-163);
  * CRCs are reflected (LSB-first), init 0, no final XOR (the decoder's
    "crc(data || crc) == 0" idiom at decode.cc:533-541 requires this);
  * the byte scrambler is Marsaglia xorshift32 seeded 2463534242, low byte
    XORed onto the payload (encode.cc:417-419 == decode.cc:613-615).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Bit packing (bitman.hh semantics)
# ---------------------------------------------------------------------------

def bytes_to_bits_le(data: bytes | np.ndarray) -> np.ndarray:
    """Bit i of the stream = bit (i % 8), LSB-first, of byte (i // 8)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    return np.unpackbits(arr, bitorder="little")


def bits_to_bytes_le(bits: np.ndarray) -> bytes:
    return np.packbits(np.asarray(bits, dtype=np.uint8),
                       bitorder="little").tobytes()


def bytes_to_bits_be(data: bytes | np.ndarray) -> np.ndarray:
    """Bit i of the stream = bit (7 - i % 8), MSB-first, of byte (i // 8)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    return np.unpackbits(arr, bitorder="big")


def bits_to_bytes_be(bits: np.ndarray) -> bytes:
    return np.packbits(np.asarray(bits, dtype=np.uint8),
                       bitorder="big").tobytes()


def nrz(bits: np.ndarray) -> np.ndarray:
    """bit 0 -> +1, bit 1 -> -1 (encode.cc:76-78)."""
    return (1 - 2 * np.asarray(bits, dtype=np.int32)).astype(np.int32)


# ---------------------------------------------------------------------------
# Xorshift32 byte scrambler (xorshift.hh; self-inverse on payload)
# ---------------------------------------------------------------------------

XORSHIFT32_SEED = 2463534242


def xorshift32_bytes(count: int, seed: int = XORSHIFT32_SEED) -> np.ndarray:
    """Low byte of each successive Marsaglia xorshift32 state."""
    out = np.empty(count, dtype=np.uint8)
    y = seed & 0xFFFFFFFF
    for i in range(count):
        y ^= (y << 13) & 0xFFFFFFFF
        y ^= y >> 17
        y ^= (y << 5) & 0xFFFFFFFF
        out[i] = y & 0xFF
    return out


_SCRAMBLER_CACHE: dict[int, np.ndarray] = {}


def scramble(data: bytes | np.ndarray) -> bytes:
    """XOR the payload with the xorshift32 keystream (self-inverse).

    Dispatches to the native C++ runtime when built (native.py is
    property-tested against the numpy path here)."""
    from . import native
    if native.available():
        return native.scramble(bytes(data))
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    key = _SCRAMBLER_CACHE.get(n)
    if key is None or len(key) < n:
        key = xorshift32_bytes(n)
        _SCRAMBLER_CACHE[n] = key
    return (arr ^ key[:n]).tobytes()


# ---------------------------------------------------------------------------
# Reflected CRC (crc.hh semantics: LSB-first, init 0, no xorout)
# ---------------------------------------------------------------------------

class Crc:
    """Bit-serial reflected CRC over an arbitrary-width register.

    ``poly`` is given in the reference's (already reflected) notation: the
    register shifts right, feedback taps = poly when the outgoing LSB XOR
    input bit is 1.  Matches CODE::CRC<uint16_t>(0xA8F4) /
    CODE::CRC<uint32_t>(0xD419CC15) behaviour at the encode/decode call
    sites (encode.cc:161, 296-299; decode.cc:429, 533-541).
    """

    def __init__(self, poly: int, width: int):
        self.poly = poly
        self.width = width
        self.mask = (1 << width) - 1
        # Byte-wise table for the host fast path.
        table = np.empty(256, dtype=np.uint64)
        for byte in range(256):
            reg = byte
            for _ in range(8):
                reg = (reg >> 1) ^ (poly if reg & 1 else 0)
            table[byte] = reg
        self._table = table

    def update_bits(self, reg: int, bits: np.ndarray) -> int:
        for b in np.asarray(bits, dtype=np.uint8):
            reg = (reg >> 1) ^ (self.poly if (reg ^ int(b)) & 1 else 0)
        return reg & self.mask

    def update_bytes(self, reg: int, data: bytes | np.ndarray) -> int:
        from . import native
        if native.available():
            return native.crc_bytes(self.poly, bytes(data),
                                    reg) & self.mask
        for byte in np.frombuffer(bytes(data), dtype=np.uint8):
            reg = int(self._table[(reg ^ int(byte)) & 0xFF]) ^ (reg >> 8)
        return reg & self.mask

    def over_bytes(self, data: bytes | np.ndarray) -> int:
        return self.update_bytes(0, data)

    def over_value(self, value: int, nbits: int = 64) -> int:
        """Clock an integer in LSB-first (crc0(md << 9), encode.cc:161)."""
        bits = np.array([(value >> i) & 1 for i in range(nbits)],
                        dtype=np.uint8)
        return self.update_bits(0, bits)

    def check_matrix(self, nbits: int) -> np.ndarray:
        """[nbits, width] GF(2) matrix M with crc(bits) = bits @ M (mod 2).

        CRC is linear over GF(2) with init 0, so the register after nbits
        input bits is the XOR of per-bit contributions.  Used by the
        device-side batched CRC candidate check (decode.cc:533-541 analog).
        """
        # Contribution of input bit at position i == CRC of a unit impulse
        # followed by (nbits - 1 - i) zero bits.  Compute incrementally from
        # the last bit backwards: impulse response grows by one zero-shift.
        rows = np.empty((nbits, self.width), dtype=np.uint8)
        reg = 0
        # CRC of the single bit '1': one update step with input 1.
        reg = (0 >> 1) ^ self.poly  # input bit 1, reg 0 -> shift in poly
        cur = reg
        for i in range(nbits - 1, -1, -1):
            rows[i] = [(cur >> k) & 1 for k in range(self.width)]
            # append one zero bit: reg' = (reg >> 1) ^ (poly if reg&1)
            cur = (cur >> 1) ^ (self.poly if cur & 1 else 0)
        return rows


from .numerology import CRC16_POLY, CRC32_POLY  # noqa: E402

crc16 = Crc(CRC16_POLY, 16)
crc32 = Crc(CRC32_POLY, 32)


def payload_crc32(payload: bytes) -> int:
    """CRC32 appended to the payload bits (encode.cc:296-299)."""
    return crc32.over_bytes(payload)


# ---------------------------------------------------------------------------
# Maximum-length sequences (mls.hh semantics)
# ---------------------------------------------------------------------------

# Every convention below generates THE m-sequence of its primitive
# polynomial (period 2^deg - 1, verified in tests/test_mls_convention);
# they differ only in the PHASE at which seed 1 enters the cycle —
# which IS a wire-format choice: the MLS0 carrier pattern, the MLS1
# header scrambler and the MLS2 pilot all transmit the phase.
# Loopback parity cannot distinguish them (encoder and decoder share
# the generator: encode.cc:144 <-> decode.cc:238), so the convention
# stays configurable (ModemConfig.mls_convention) and the receiver can
# auto-detect it from the preamble; docs/WIRE_FORMAT.md carries the
# argued default choice and the golden-waveform handshake procedure.
MLS_CONVENTIONS = ("galois", "fibonacci", "msb")


def mls_bits(poly: int, count: int, seed: int = 1,
             convention: str = "galois") -> np.ndarray:
    """LFSR m-sequence over the primitive polynomial ``poly`` (bit i =
    coefficient of x^i), register seeded ``seed``, one bit per step.

    Conventions (see module note above; reference: mls.hh via the call
    sites encode.cc:134/144/165, decode.cc:238/407):

    * ``galois``    — right-shift Galois, output = LSB before the shift,
      feedback XORs ``poly >> 1`` into the register when the output bit
      is 1.  The framework's wire default since round 1.
    * ``fibonacci`` — right-shift Fibonacci, output = LSB, new top bit =
      parity of the tapped state (taps = ``poly`` minus its leading
      term).  SURVEY.md Appendix A's original reading of mls.hh.
    * ``msb``       — left-shift Galois, output = top register bit
      BEFORE the shift (so seed 1 leads with deg-1 zeros).  A direct
      transcription of the upstream mls.hh operator() structure
      (fb = reg & test; reg <<= 1; reg ^= fb * poly; return fb).
    """
    deg = poly.bit_length() - 1
    mask = (1 << deg) - 1
    reg = seed & mask
    out = np.empty(count, dtype=np.uint8)
    if convention == "galois":
        taps = (poly >> 1) & mask
        for i in range(count):
            bit = reg & 1
            out[i] = bit
            reg >>= 1
            if bit:
                reg ^= taps
    elif convention == "fibonacci":
        taps = poly & mask          # x^0 .. x^(deg-1) coefficients
        top = 1 << (deg - 1)
        for i in range(count):
            out[i] = reg & 1
            fb = bin(reg & taps).count("1") & 1
            reg = (reg >> 1) | (top if fb else 0)
    elif convention == "msb":
        test = 1 << (deg - 1)
        for i in range(count):
            fb = 1 if reg & test else 0
            out[i] = fb
            reg = (reg << 1) & mask
            if fb:
                reg ^= poly & mask
    else:
        raise ValueError(f"unknown MLS convention {convention!r}")
    return out


def mls_nrz(poly: int, count: int, seed: int = 1,
            convention: str = "galois") -> np.ndarray:
    return nrz(mls_bits(poly, count, seed, convention))


# ---------------------------------------------------------------------------
# Callsign base37 codec (encode.cc:320-335, decode.cc:155-159)
# ---------------------------------------------------------------------------

_B37 = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def base37_encode(text: str) -> int:
    acc = 0
    for c in text:
        acc *= 37
        if "0" <= c <= "9":
            acc += ord(c) - ord("0") + 1
        elif "a" <= c <= "z":
            acc += ord(c) - ord("a") + 11
        elif "A" <= c <= "Z":
            acc += ord(c) - ord("A") + 11
        elif c != " ":
            return -1
    return acc


def base37_decode(value: int, length: int = 9) -> str:
    chars = []
    for _ in range(length):
        chars.append(_B37[value % 37])
        value //= 37
    return "".join(reversed(chars))
