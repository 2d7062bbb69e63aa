"""tpumap — a TPU-native spliced alignment framework.

A ground-up reimplementation of the capabilities of GMAP/GSNAP (reference:
GMAP version 2024-02-22) designed for TPU hardware: the genome k-mer index
lives in HBM as device arrays, seed finding / diagonal merging / mismatch
verification / banded affine-gap DP run as batched JAX ops and Pallas
kernels over thousands of reads at a time, and scale-out is expressed with
`jax.sharding` meshes rather than worker threads.

Package layout:
  tpumap.index     genome database build + load (host numpy + device arrays)
  tpumap.ops       device kernels: pack/seed/verify/setops/dp/chain/splice
  tpumap.gsnap     short-read engine (method-ladder-as-cascade)
  tpumap.gmap      long cDNA engine (region finding, chaining, structure)
  tpumap.io        FASTA/FASTQ input, SAM/GFF3/alignment/PSL/m8 printers
  tpumap.parallel  device mesh setup, sharded pipelines
  tpumap.cli       command-line drivers mirroring gmap/gsnap/gmap_build
"""

__version__ = "0.1.0"
REFERENCE_VERSION = "2024-02-22"

from tpumap.utils import jaxcache as _jaxcache

_jaxcache.enable()
