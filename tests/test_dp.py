"""Banded affine-gap DP vs a numpy full-matrix oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpumap.ops import dp
from tpumap.utils import dna


def numpy_affine(q, g, match=3, mismatch=-3, open_=8, extend=3,
                 mode="glocal"):
    """Full-matrix affine NW; returns best score (oracle)."""
    NEG = -(10 ** 9)
    Lq, Lg = len(q), len(g)
    H = np.full((Lq + 1, Lg + 1), NEG, dtype=np.int64)
    E = np.full_like(H, NEG)   # gap in query (genome consumed)
    F = np.full_like(H, NEG)   # gap in genome (query consumed)
    H[0, 0] = 0
    for j in range(1, Lg + 1):
        H[0, j] = 0 if mode == "glocal" else -(open_ + (j - 1) * extend)
    for i in range(1, Lq + 1):
        for j in range(0, Lg + 1):
            if j > 0:
                E[i, j] = max(H[i, j - 1] - open_, E[i, j - 1] - extend)
            F[i, j] = max(H[i - 1, j] - open_, F[i - 1, j] - extend)
            diag = H[i - 1, j - 1] + (match if q[i - 1] == g[j - 1]
                                      else mismatch) if j > 0 else NEG
            H[i, j] = max(diag, E[i, j], F[i, j])
    if mode == "glocal":
        return int(H[Lq].max()), int(H[Lq].argmax())
    return int(H[Lq, Lg]), Lg


def score_from_ops(ops_rev, q, g, end_j, match=3, mismatch=-3, open_=8,
                   extend=3):
    """Recompute the alignment score from a traceback transcript."""
    ops = [o for o in ops_rev[::-1] if o != dp.T_END]
    i, j = 0, end_j - sum(1 for o in ops if o != dp.T_INS)
    start_j = j
    score = 0
    run = None
    for o in ops:
        if o == dp.T_MATCH:
            score += match if q[i] == g[j] else mismatch
            i += 1
            j += 1
            run = None
        elif o == dp.T_INS:
            score -= open_ if run != "I" else extend
            i += 1
            run = "I"
        else:
            score -= open_ if run != "D" else extend
            j += 1
            run = "D"
    return score, start_j, i, j


@pytest.mark.parametrize("seed", range(6))
def test_glocal_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B = 8
    band = 8
    Lq, Lg = 40, 52
    qs, gs = [], []
    for b in range(B):
        g = rng.integers(0, 4, Lg).astype(np.uint8)
        # query = slice of g with an indel and substitutions
        q = list(g[4:4 + Lq])
        if b % 3 == 0 and len(q) > 20:
            del q[10:12]          # deletion in query
        if b % 3 == 1:
            q.insert(15, int(rng.integers(0, 4)))   # insertion
        q = np.array(q[:Lq], dtype=np.uint8)
        if len(q) < Lq:
            q = np.concatenate([q, rng.integers(0, 4, Lq - len(q)).astype(np.uint8)])
        q[5] = (q[5] + 1) % 4
        qs.append(q)
        gs.append(g)
    qs = np.stack(qs)
    gs = np.stack(gs)
    qlens = np.full(B, Lq, np.int32)
    glens = np.full(B, Lg, np.int32)

    out = dp.banded_align(jnp.asarray(qs), jnp.asarray(qlens),
                          jnp.asarray(gs), jnp.asarray(glens), band)
    ops, k_final = dp.traceback(out["dirs"], jnp.asarray(qlens),
                                out["end_k"], band)
    scores = np.asarray(out["score"])
    end_k = np.asarray(out["end_k"])
    ops = np.asarray(ops)
    for b in range(B):
        oracle, _ = numpy_affine(qs[b], gs[b])
        # band may truncate the oracle optimum; ours must never exceed it
        assert scores[b] <= oracle
        assert scores[b] >= oracle - 0  # with band 8 >= shift these agree
        end_j = Lq + end_k[b] - band
        s2, start_j, ci, cj = score_from_ops(ops[b], qs[b], gs[b], end_j)
        assert ci == Lq                      # transcript consumes the query
        assert s2 == scores[b], f"b={b}: transcript {s2} != H {scores[b]}"


def test_global_mode_exact_end():
    q, _ = dna.encode("ACGTACGTAC")
    g, _ = dna.encode("ACGTTACGTAC")   # one extra T => deletion of len 1
    B = 1
    out = dp.banded_align(jnp.asarray(q[None, :]), jnp.asarray([10]),
                          jnp.asarray(g[None, :]), jnp.asarray([11]),
                          4, mode="global")
    assert int(out["score"][0]) == 10 * 3 - 8
    ops, kf = dp.traceback(out["dirs"], jnp.asarray([10]), out["end_k"], 4)
    ops = [o for o in np.asarray(ops)[0][::-1] if o != dp.T_END]
    assert ops.count(dp.T_DEL) == 1
    assert ops.count(dp.T_MATCH) == 10
