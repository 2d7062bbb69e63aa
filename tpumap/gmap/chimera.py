"""GMAP chimera detection (two-part cDNA alignments).

Capability analog of src/chimera.c + the chimera pass in the gmap driver
(src/gmap.c:2435-3000): when the best alignment leaves a substantial
uncovered query margin (>= chimera_margin, gmap -x), the margin is
re-aligned independently (Stage1 re-run on the margin,
src/gmap.c:2776-2956); a good margin alignment yields a second path, and
the query is reported as a chimera with a breakpoint.

The TPU pipeline re-expression is host-side orchestration re-invoking the
batched region pipeline on the margin subsequence, then shifting the
resulting exon chain back into whole-query coordinates.
"""
from __future__ import annotations

import numpy as np

DEFAULT_CHIMERA_MARGIN = 30          # gmap -x default region of interest


def query_span(chain, qlen: int) -> tuple[int, int]:
    """Covered query span [qs, qe) in ORIGINAL query orientation."""
    qs = min(e.qstart for e in chain.exons)
    qe = max(e.qend for e in chain.exons)
    if chain.strand:
        return qlen - qe, qlen - qs
    return qs, qe


def shift_chain(chain, offset_in_query: int, sub_len: int, qlen: int):
    """Rewrite a chain aligned to query[offset : offset+sub_len] into
    whole-query coordinates (orientation-aware)."""
    if chain.strand:
        # chain q coords index revcomp(sub); in revcomp(full query) the
        # same bases start at qlen - (offset + sub_len)
        shift = qlen - (offset_in_query + sub_len)
    else:
        shift = offset_in_query
    for e in chain.exons:
        e.qstart += shift
        e.qend += shift
    return chain


def align_query_chimera(db, index, qcodes: np.ndarray, qnmask: np.ndarray,
                        config, s1config,
                        chimera_margin: int = DEFAULT_CHIMERA_MARGIN,
                        min_piece_coverage: float = 0.5):
    """Full-query alignment with chimera fallback.

    Returns a list of (chain, univ_offset) pieces ordered by query
    position — one entry for a normal alignment, two for a chimera.
    """
    from tpumap.cli.gmap_cli import align_query_to_db, chain_goodness

    best, off = align_query_to_db(db, index, qcodes, qnmask, config,
                                  s1config)
    if best is None:
        return []
    qlen = len(qcodes)
    pieces = [(best, off)]
    qs, qe = query_span(best, qlen)
    margins = []
    if qs >= chimera_margin:
        margins.append((0, qs))
    if qlen - qe >= chimera_margin:
        margins.append((qe, qlen))
    for (ms, me) in margins:
        sub_c = np.ascontiguousarray(qcodes[ms:me])
        sub_n = np.ascontiguousarray(qnmask[ms:me])
        piece, poff = align_query_to_db(db, index, sub_c, sub_n, config,
                                        s1config)
        if piece is None:
            continue
        if piece.coverage < min_piece_coverage * (me - ms):
            continue
        if chain_goodness(piece) <= 0:
            continue
        shift_chain(piece, ms, me - ms, qlen)
        pieces.append((piece, poff))
    # order by query position
    pieces.sort(key=lambda p: query_span(p[0], qlen)[0])
    return pieces


def breakpoint(pieces, qlen: int) -> int | None:
    """Chimeric breakpoint (query coordinate) between two pieces
    (Chimera_find_breakpoint concept, src/chimera.c)."""
    if len(pieces) < 2:
        return None
    (_c1, _o1), (_c2, _o2) = pieces[0], pieces[1]
    _qs1, qe1 = query_span(pieces[0][0], qlen)
    qs2, _qe2 = query_span(pieces[1][0], qlen)
    return (qe1 + qs2) // 2
