#!/usr/bin/env python3
"""Extract the MaxEnt splice-model coefficient tables into an .npz.

The tables are the published Yeo & Burge (2004) maximum-entropy splice-site
model parameters (MaxEntScan "me2x5"-style decomposition), embedded as
numeric arrays in the reference's src/maxent.c. They are model *data*, not
code; we extract them once into tpumap/data/maxent_tables.npz so the
framework has no runtime dependency on the reference tree.

Table layout (from the reference's model structure):
  donor:    9-mer = 3 exon | GT | 4 intron; me2x3donor[4^7] indexed by the
            7 non-GT bases; times a GT-dinucleotide odds factor.
  acceptor: 23-mer = 20 intron (AG at pos 18-19) | 3 exon; product/quotient
            of 9 subtables over overlapping windows skipping the AG.
"""
import re
import sys
import pathlib

import numpy as np

SRC = pathlib.Path("/root/reference/src/maxent.c")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tpumap" / "data" / "maxent_tables.npz"

NAMES = ["me2x3donor", "me2x3acc1", "me2x3acc2", "me2x3acc3", "me2x3acc4",
         "me2x3acc5", "me2x3acc6", "me2x3acc7", "me2x3acc8", "me2x3acc9"]


def main():
    text = SRC.read_text()
    tables = {}
    for name in NAMES:
        m = re.search(rf"static double {name}\[(\d+)\]\s*=\s*\{{(.*?)\}};",
                      text, re.S)
        if not m:
            sys.exit(f"table {name} not found")
        n = int(m.group(1))
        vals = np.array([float(x) for x in m.group(2).replace("\n", " ")
                        .split(",") if x.strip()], dtype=np.float64)
        assert len(vals) == n, (name, len(vals), n)
        tables[name] = vals
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
