"""Synthetic large decoding graphs for scale tests and benchmarks.

Builds a word-loop HCLG-shaped graph directly as a CompiledGraph —
structurally faithful to a real unigram HCLG (start/loop hub with one
arc per word, per-word linear HMM chains with self-loops, word labels on
the chain-final arc back to the hub) — without paying the pure-Python
FST composition pipeline for 10^5-10^6 states.  Used to validate that
the top-K decoder's memory and step cost are independent of graph size
(ref: real WSJ/Librispeech HCLGs of 10^6-10^7 states, SURVEY.md §7
"Hard parts #1").
"""

from __future__ import annotations

import numpy as np

from kaldi_cnn_tpu.decode.graph import CompiledGraph


def make_big_graph(num_words: int, num_pdfs: int,
                   min_len: int = 3, max_len: int = 8,
                   seed: int = 0) -> CompiledGraph:
    """Word-loop graph: state 0 is the hub; each word w is a chain of
    L_w emitting states (self-loop + forward arc each, like a 1-state
    HMM per phone with self-loops), entered from the hub by an eps arc
    carrying the unigram cost and exited by an emitting arc labeled w.
    Transition-ids are 1 + pdf-id (identity mapping)."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(min_len, max_len + 1, size=num_words)
    num_states = 1 + int(lens.sum())
    e_src, e_dst, e_il, e_ol, e_w = [], [], [], [], []
    n_src, n_dst, n_ol, n_w = [], [], [], []
    # distinct unigram costs (exact ties between word hypotheses make
    # top-K vs keep-all-ties pruning diverge, which is noise, not signal)
    lm_cost = np.log(num_words) + rng.uniform(-1.0, 1.0, size=num_words)
    s = 1
    for w in range(num_words):
        L = int(lens[w])
        pdfs = rng.integers(0, num_pdfs, size=L)
        n_src.append(0)
        n_dst.append(s)
        n_ol.append(0)
        n_w.append(float(lm_cost[w]))
        for i in range(L):
            tid = int(pdfs[i]) + 1
            # self-loop
            e_src.append(s + i)
            e_dst.append(s + i)
            e_il.append(tid)
            e_ol.append(0)
            e_w.append(0.7)
            # forward
            nxt = s + i + 1 if i + 1 < L else 0
            e_src.append(s + i)
            e_dst.append(nxt)
            e_il.append(tid)
            e_ol.append(w + 1 if i + 1 == L else 0)
            e_w.append(0.7)
        s += L

    g = CompiledGraph.__new__(CompiledGraph)
    g.num_states = num_states
    g.start = 0
    g.e_src = np.asarray(e_src, np.int32)
    g.e_dst = np.asarray(e_dst, np.int32)
    g.e_ilabel = np.asarray(e_il, np.int32)
    g.e_olabel = np.asarray(e_ol, np.int32)
    g.e_weight = np.asarray(e_w, np.float32)
    g.e_pdf = (g.e_ilabel - 1).astype(np.int32)
    g.n_src = np.asarray(n_src, np.int32)
    g.n_dst = np.asarray(n_dst, np.int32)
    g.n_olabel = np.asarray(n_ol, np.int32)
    g.n_weight = np.asarray(n_w, np.float32)
    g.final = np.where(np.arange(num_states) == 0, 0.0,
                       np.inf).astype(np.float32)
    return g


def sample_loglikes(graph: CompiledGraph, num_pdfs: int, T: int,
                    seed: int = 0, peak: float = 4.0) -> np.ndarray:
    """Loglikes [T, P] with a random walk along the graph boosted, so
    decodes follow a plausible path rather than noise."""
    rng = np.random.default_rng(seed)
    ll = rng.normal(-8.0, 1.0, size=(T, num_pdfs)).astype(np.float32)
    # walk: hub -> random word chain, boosting visited pdfs
    off = np.argsort(graph.e_src, kind="stable")
    src_sorted = graph.e_src[off]
    starts = np.searchsorted(src_sorted, np.arange(graph.num_states))
    ends = np.searchsorted(src_sorted, np.arange(graph.num_states) + 1)
    n_off = np.argsort(graph.n_src, kind="stable")
    nsrc_sorted = graph.n_src[n_off]
    nstarts = np.searchsorted(nsrc_sorted, np.arange(graph.num_states))
    nends = np.searchsorted(nsrc_sorted, np.arange(graph.num_states) + 1)
    s = graph.start
    for t in range(T):
        while starts[s] == ends[s]:           # non-emitting: follow eps
            k = rng.integers(nstarts[s], nends[s])
            s = int(graph.n_dst[n_off[k]])
        k = rng.integers(starts[s], ends[s])
        a = off[k]
        ll[t, graph.e_pdf[a]] = rng.normal(-peak * 0.25, 0.3)
        s = int(graph.e_dst[a])
    return ll
