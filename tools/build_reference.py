#!/usr/bin/env python3
"""Hand-build the reference GMAP/GSNAP binaries (no autotools on this image).

The prebuilt binaries in /root/reference/bin are for a foreign architecture, and
autoconf/automake are unavailable, so we parse src/Makefile.am for the *_SOURCES
lists of the `nosimd` targets and compile them directly with gcc.

The resulting binaries live in /tmp/refbin and are used ONLY as test oracles
(golden output generation) and for baseline performance measurement — no
reference code enters the tpumap framework.

Usage: python tools/build_reference.py [--src /tmp/refbuild/src] [--out /tmp/refbin]
"""
import argparse
import os
import re
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

CONFIG_H = r"""
/* Hand-written config.h for Linux x86_64, nosimd build */
#define PACKAGE "gmap"
#define PACKAGE_BUGREPORT ""
#define PACKAGE_NAME "gmap"
#define PACKAGE_STRING "gmap 2024-02-22"
#define PACKAGE_TARNAME "gmap"
#define PACKAGE_URL ""
#define PACKAGE_VERSION "2024-02-22"
#define VERSION "2024-02-22"
#define STDC_HEADERS 1
#define HAVE_STDLIB_H 1
#define HAVE_STRING_H 1
#define HAVE_STRINGS_H 1
#define HAVE_UNISTD_H 1
#define HAVE_INTTYPES_H 1
#define HAVE_STDINT_H 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_SYS_STAT_H 1
#define HAVE_FCNTL_H 1
#define HAVE_LIMITS_H 1
#define HAVE_STDDEF_H 1
#define HAVE_SYS_MMAN_H 1
#define HAVE_MEMORY_H 1
#define HAVE_MEMCPY 1
#define HAVE_MEMMOVE 1
#define HAVE_MEMSET 1
#define HAVE_STRTOUL 1
#define HAVE_MUNMAP 1
#define HAVE_MMAP 1
#define HAVE_PTHREAD 1
#define PTHREAD_CREATE_JOINABLE PTHREAD_CREATE_JOINABLE
#define HAVE_SEMAPHORE_H 1
#define HAVE_PWD_H 1
#define HAVE_DIRENT_H 1
#define HAVE_MATH_H 1
#define HAVE_FLOOR 1
#define HAVE_CEIL 1
#define HAVE_LOG 1
#define HAVE_EXP 1
#define HAVE_POW 1
#define HAVE_RINT 1
#define HAVE_SQRT 1
#define HAVE_INDEX 1
#define HAVE_RINDEX 1
#define HAVE_STRSTR 1
#define HAVE_STRCHR 1
#define HAVE_STRRCHR 1
#define HAVE_STRDUP 1
#define HAVE_STRTOULL 1
#define HAVE_SYSCONF 1
#define PAGESIZE_VIA_SYSCONF 1
#define HAVE_GETPAGESIZE 1
#define HAVE_FSEEKO 1
#define HAVE_FTELLO 1
#define HAVE_SIGACTION 1
#define HAVE_SHM 1
#define HAVE_SYS_SHM_H 1
#define HAVE_SHMGET 1
#define HAVE_STRUCT_SHMID_DS 1
#define SIZEOF_OFF_T 8
#define SIZEOF_UNSIGNED_LONG 8
#define SIZEOF_UNSIGNED_LONG_LONG 8
#define MAP_FAILED ((void *) -1)
#define _FILE_OFFSET_BITS 64
/* no zlib/bzlib: gz/bz2 input disabled in oracle builds */
/* no builtin popcount macros -> fallback implementations used */
#define HAVE_INLINE 1
#define HAVE_MMAP_MAP_PRIVATE 1
#define HAVE_MMAP_MAP_SHARED 1
#define HAVE_CADDR_T 1
"""

DEFAULT_TARGETS = {
    # binary name -> (sources var, extra cppflags)
    "gmap": ("gmap_nosimd_SOURCES", []),
    "gsnap": ("gsnap_nosimd_SOURCES", ["-DGSNAP=1"]),
    "gmapl": ("gmapl_nosimd_SOURCES", ["-DLARGE_GENOMES=1"]),
    "gsnapl": ("gsnapl_nosimd_SOURCES", ["-DGSNAP=1", "-DLARGE_GENOMES=1"]),
    # SIMD baseline build (NOT an oracle — used only by
    # tools/measure_baseline.py for the honest per-core SIMD baseline;
    # flags mirror gsnap_avx2_CFLAGS in src/Makefile.am:541)
    "gsnap_avx2": ("gsnap_nosimd_SOURCES", [
        "-DGSNAP=1", "-DHAVE_SSE2=1", "-DHAVE_SSSE3=1", "-DHAVE_SSE4_1=1",
        "-DHAVE_SSE4_2=1", "-DHAVE_AVX2=1", "-DHAVE_POPCNT=1",
        "-DHAVE_MM_POPCNT=1", "-DHAVE_LZCNT=1", "-DHAVE_TZCNT=1",
        "-DHAVE_BUILTIN_POPCOUNT=1", "-DHAVE_BUILTIN_CTZ=1",
        "-DHAVE_BUILTIN_CLZ=1",
        "-mssse3", "-msse4.1", "-msse4.2", "-mavx2", "-mpopcnt",
        "-mlzcnt", "-mbmi", "-mbmi2"]),
    "gmapindex": ("gmapindex_SOURCES", ["-DUTILITYP=1"]),
    "iit_store": ("iit_store_SOURCES", ["-DUTILITYP=1"]),
    "iit_get": ("iit_get_SOURCES", ["-DUTILITYP=1"]),
    "iit_dump": ("iit_dump_SOURCES", ["-DUTILITYP=1"]),
    "get-genome": ("get_genome_SOURCES", ["-DUTILITYP=1"]),
    "cmetindex": ("cmetindex_SOURCES", ["-DUTILITYP=1"]),
    "atoiindex": ("atoiindex_SOURCES", ["-DUTILITYP=1"]),
    "snpindex": ("snpindex_SOURCES", ["-DUTILITYP=1"]),
}


def parse_makefile_am(path):
    """Parse variable assignments (=, +=) with line continuations."""
    text = open(path).read()
    text = text.replace("\\\n", " ")
    variables = {}
    for line in text.splitlines():
        m = re.match(r"^\s*([A-Za-z0-9_]+)\s*(\+?=)\s*(.*)$", line)
        if not m:
            continue
        name, op, val = m.groups()
        toks = val.split()
        if op == "+=":
            variables.setdefault(name, []).extend(toks)
        else:
            variables[name] = toks
    return variables



def copy_scripts(outdir):
    """Copy the reference's arch-independent Perl tools (gmap_build,
    fa_coords, converters...) next to the rebuilt binaries so gmap_build
    works out of /tmp/refbin."""
    import pathlib
    refbin = pathlib.Path("/root/reference/bin")
    for f in refbin.iterdir():
        try:
            if f.read_bytes()[:2] == b"#!":
                shutil.copy2(f, pathlib.Path(outdir) / f.name)
        except OSError:
            pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--work", default="/tmp/refbuild_src")
    ap.add_argument("--out", default="/tmp/refbin")
    ap.add_argument("--targets", nargs="*", default=list(DEFAULT_TARGETS))
    args = ap.parse_args()

    src = os.path.join(args.work, "src")
    if not os.path.isdir(src):
        os.makedirs(args.work, exist_ok=True)
        shutil.copytree(os.path.join(args.ref, "src"), src)
    with open(os.path.join(src, "config.h"), "w") as f:
        f.write(CONFIG_H)

    variables = parse_makefile_am(os.path.join(src, "Makefile.am"))

    def expand(toks, depth=0):
        out = []
        for t in toks:
            m = re.fullmatch(r"\$\(([A-Za-z0-9_]+)\)", t)
            if m and depth < 10:
                out.extend(expand(variables.get(m.group(1), []), depth + 1))
            elif not t.startswith("$("):
                out.append(t)
        return out
    os.makedirs(args.out, exist_ok=True)
    copy_scripts(args.out)
    objroot = os.path.join(args.work, "obj")

    base_flags = ["-O2", "-pthread", "-fgnu89-inline", "-DHAVE_CONFIG_H", "-DTARGET=\"linux\"",
                  "-DGMAPDB=\"/tmp/gmapdb\"", "-w", "-fcommon"]

    for binname in args.targets:
        srcvar, extra = DEFAULT_TARGETS[binname]
        toks = variables.get(srcvar) or variables.get("dist_" + srcvar, [])
        sources = [s for s in expand(toks) if s.endswith(".c")]
        if not sources:
            print(f"!! no sources for {binname} ({srcvar})", file=sys.stderr)
            continue
        objdir = os.path.join(objroot, binname)
        os.makedirs(objdir, exist_ok=True)
        objs = []

        def compile_one(s):
            obj = os.path.join(objdir, s.replace("/", "_").replace(".c", ".o"))
            cfile = os.path.join(src, s)
            if os.path.exists(obj) and os.path.getmtime(obj) > os.path.getmtime(cfile):
                return obj
            cmd = ["gcc", "-c", *base_flags, *extra, "-I", src, "-o", obj, cfile]
            r = subprocess.run(cmd, capture_output=True, text=True)
            if r.returncode != 0:
                print(f"FAIL {s}:\n{r.stderr[-3000:]}", file=sys.stderr)
                return None
            return obj

        with ThreadPoolExecutor(max_workers=8) as ex:
            objs = list(ex.map(compile_one, sources))
        if any(o is None for o in objs):
            print(f"!! compile failures for {binname}", file=sys.stderr)
            continue
        out = os.path.join(args.out, binname)
        r = subprocess.run(["gcc", "-o", out, *objs, "-lm", "-lpthread"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"LINK FAIL {binname}:\n{r.stderr[-3000:]}", file=sys.stderr)
        else:
            print(f"built {out}")


if __name__ == "__main__":
    main()
