"""Native (C++) host components, loaded via ctypes.

The library auto-builds with g++ on first use and caches under
_build/; every entry point has a pure-Python fallback so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "fastq_tokenizer.cc")
_BUILD = os.path.join(_DIR, "_build")
_LIB = os.path.join(_BUILD, "libtpumap_native.so")

_lib = None
_tried = False


def get_lib():
    """The native library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        c_long_p = ctypes.POINTER(ctypes.c_long)
        lib.fastq_scan.restype = ctypes.c_long
        lib.fastq_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            c_long_p, c_long_p, c_long_p, c_long_p, c_long_p,
            ctypes.c_long]
        lib.fasta_scan.restype = ctypes.c_long
        lib.fasta_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            c_long_p, c_long_p, c_long_p, c_long_p, c_long_p,
            ctypes.c_long, ctypes.c_long]
        lib.md_nm.restype = ctypes.c_long
        lib.md_nm.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_long, ctypes.c_char_p]
        lib.genome_text.restype = None
        lib.genome_text.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_long, ctypes.c_long, ctypes.c_char_p]
        lib.encode_records.restype = None
        lib.encode_records.argtypes = [
            ctypes.c_char_p, c_long_p, c_long_p, ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as exc:
        sys.stderr.write(f"tpumap: native tokenizer unavailable "
                         f"({exc}); using Python fallback\n")
        _lib = None
    return _lib
