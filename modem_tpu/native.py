"""ctypes bindings for the native host runtime (native/modem_host.cc).

The byte-level framing hot path runs in C++ like the reference's host
code: bits.scramble and Crc.update_bytes dispatch here when the
library is built, and wav.py uses the native RIFF codec (file IO +
quantisation).  The bit-packing entry points mirror numpy's
pack/unpackbits (which are already C-speed) — they exist so the C ABI
covers the full framing surface for non-Python embedders, and are
property-tested against bits.py.  Every entry point has a numpy
fallback so the package works unbuilt.  Build with `make -C native`
(done automatically on first import when a compiler is available).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent.parent / "native"
_LIB_PATH = _DIR / "libmodem_host.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.modem_scramble.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]
    lib.modem_crc_table.argtypes = [ctypes.c_uint32, u32p]
    lib.modem_crc_bytes.argtypes = [u32p, u8p, ctypes.c_int64,
                                    ctypes.c_uint32]
    lib.modem_crc_bytes.restype = ctypes.c_uint32
    lib.modem_bytes_to_bits_le.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.modem_bits_to_bytes_le.argtypes = [u8p, ctypes.c_int64, u8p]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.modem_wav_info.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
    lib.modem_wav_info.restype = ctypes.c_int64
    lib.modem_wav_read.argtypes = [ctypes.c_char_p, f32p,
                                   ctypes.c_int64]
    lib.modem_wav_read.restype = ctypes.c_int64
    lib.modem_wav_write.argtypes = [ctypes.c_char_p, f32p,
                                    ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32]
    lib.modem_wav_write.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def scramble(data: bytes, seed: int = 2463534242) -> bytes:
    lib = _load()
    if lib is None:
        from . import bits
        return bits.scramble(data)
    buf = np.frombuffer(data, dtype=np.uint8).copy()
    lib.modem_scramble(_u8(buf), len(buf), seed)
    return buf.tobytes()


_crc_tables: dict[int, np.ndarray] = {}


def crc_bytes(poly: int, data: bytes, reg: int = 0) -> int:
    lib = _load()
    if lib is None:
        from . import bits
        return bits.Crc(poly, 32).update_bytes(reg, data)
    table = _crc_tables.get(poly)
    if table is None:
        table = np.zeros(256, dtype=np.uint32)
        lib.modem_crc_table(poly, table.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32)))
        _crc_tables[poly] = table
    buf = np.frombuffer(data, dtype=np.uint8)
    return int(lib.modem_crc_bytes(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _u8(np.ascontiguousarray(buf)), len(buf), reg))


def bytes_to_bits_le(data: bytes) -> np.ndarray:
    lib = _load()
    if lib is None:
        from . import bits
        return bits.bytes_to_bits_le(data)
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(8 * len(src), dtype=np.uint8)
    lib.modem_bytes_to_bits_le(_u8(np.ascontiguousarray(src)), len(src),
                               _u8(out))
    return out


def bits_to_bytes_le(bits: np.ndarray) -> bytes:
    lib = _load()
    if lib is None:
        from . import bits as B
        return B.bits_to_bytes_le(bits)
    src = np.ascontiguousarray(bits, dtype=np.uint8)
    out = np.zeros((len(src) + 7) // 8, dtype=np.uint8)
    lib.modem_bits_to_bytes_le(_u8(src), len(src), _u8(out))
    return out.tobytes()


def wav_read(path: str):
    """Native RIFF read: (rate, channels, bits, values f32) or None."""
    import ctypes as ct
    lib = _load()
    if lib is None:
        return None
    rate = ct.c_int32()
    channels = ct.c_int32()
    bits = ct.c_int32()
    n = lib.modem_wav_info(path.encode(), ct.byref(rate),
                           ct.byref(channels), ct.byref(bits))
    if n < 0:
        return None
    out = np.zeros(n, dtype=np.float32)
    got = lib.modem_wav_read(
        path.encode(), out.ctypes.data_as(ct.POINTER(ct.c_float)), n)
    if got != n:
        return None
    return rate.value, channels.value, bits.value, out


def wav_write(path: str, samples: np.ndarray, rate: int,
              channels: int, bits: int) -> bool:
    """Native RIFF write of flat interleaved f32 values."""
    import ctypes as ct
    lib = _load()
    if lib is None:
        return False
    flat = np.ascontiguousarray(samples, dtype=np.float32).reshape(-1)
    return lib.modem_wav_write(
        path.encode(), flat.ctypes.data_as(ct.POINTER(ct.c_float)),
        len(flat), rate, channels, bits) == 0
