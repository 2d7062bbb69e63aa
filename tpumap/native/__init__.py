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
_SRCS = [os.path.join(_DIR, "fastq_tokenizer.cc"),
         os.path.join(_DIR, "sam_emit.cc")]
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
                or os.path.getmtime(_LIB) < max(os.path.getmtime(s)
                                                for s in _SRCS)):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB] + _SRCS,
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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.encode_packed_batch.restype = ctypes.c_long
        lib.encode_packed_batch.argtypes = [
            ctypes.c_char_p, c_long_p, c_long_p, ctypes.c_long,
            ctypes.c_char_p, c_long_p, u8p,
            ctypes.c_long, ctypes.c_long,
            u8p, u8p, i32p, u32p, u32p, u8p]
        lib.anchor_runs.restype = None
        lib.anchor_runs.argtypes = [
            u32p, ctypes.c_long, u64p, u8p, ctypes.c_long, i32p,
            ctypes.c_long, ctypes.c_long, i32p, i32p]
        lib.sam_emit_ungapped.restype = ctypes.c_long
        lib.sam_emit_ungapped.argtypes = [
            u32p, u32p,                          # genome packed/nmask
            u64p, i64p, u8p, ctypes.c_long,      # chrom table
            ctypes.c_char_p, i64p,               # rname blob/off
            ctypes.c_char_p, i64p,               # qname blob/off
            u8p, u8p, ctypes.c_long,             # codes/rnmask/Lstride
            ctypes.c_char_p, i64p,               # qual blob/off
            i32p, u64p, u8p, u8p, i32p,          # len/diag/strand/mapq/nbest
            i32p, i32p,                          # qstart/qend
            i32p, u64p, i64p,                    # flags/mate_u/tlen (paired)
            u8p, ctypes.c_long,                  # emit mask, B
            ctypes.c_char_p, ctypes.c_long, i64p]
        lib.sam_emit_unmapped.restype = ctypes.c_long
        lib.sam_emit_unmapped.argtypes = [
            ctypes.c_char_p, i64p,               # qname blob/off
            u8p, u8p, ctypes.c_long,             # codes/rnmask/Lstride
            ctypes.c_char_p, i64p,               # qual blob/off
            i32p, i32p,                          # lengths, flags
            u8p, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long, i64p]
        lib.sam_emit_mixed.restype = ctypes.c_long
        lib.sam_emit_mixed.argtypes = [
            u32p, u32p,                          # genome packed/nmask
            u64p, i64p, u8p, ctypes.c_long,      # chrom table
            ctypes.c_char_p, i64p,               # rname blob/off
            ctypes.c_char_p, i64p,               # qname blob/off
            u8p, u8p, ctypes.c_long,             # codes/rnmask/Lstride
            ctypes.c_char_p, i64p,               # qual blob/off
            i32p, u8p,                           # lengths, kind
            u64p, u8p, u8p, i32p,                # diag/strand/mapq/nbest
            i32p, i32p,                          # qstart/qend
            i32p, u64p, i64p,                    # flags/mate_u/tlen
            i64p, i32p, u64p,                    # seg_off/seg_q/seg_d
            ctypes.c_long, ctypes.c_long,        # min_intron, B
            ctypes.c_char_p, ctypes.c_long, i64p]
        lib.sam_emit_path.restype = ctypes.c_long
        lib.sam_emit_path.argtypes = [
            u32p, u32p,
            u64p, i64p, u8p, ctypes.c_long,
            ctypes.c_char_p, i64p,
            ctypes.c_char_p, i64p,
            u8p, u8p, ctypes.c_long,
            ctypes.c_char_p, i64p,
            i32p, u8p, u8p,                      # len/strand/mapq
            i32p, i32p,                          # qstart/qend
            i64p, i32p, u64p,                    # seg_off/seg_q/seg_d
            ctypes.c_long,                       # min_intron
            u8p, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long, i64p]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as exc:
        sys.stderr.write(f"tpumap: native tokenizer unavailable "
                         f"({exc}); using Python fallback\n")
        _lib = None
    return _lib
