"""Monophone GMM training (ref: steps/train_mono.sh orchestration of
gmm-init-mono, compile-train-graphs, align-equal-compiled,
gmm-align-compiled, gmm-acc-stats-ali, gmm-est).

The reference runs these as N parallel jobs reducing through ark files
per iteration; here the whole EM loop is one process, with scoring
batched per utterance (the map step) and numpy accumulators (the
reduce step).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_cnn_tpu.core.config import configclass
from kaldi_cnn_tpu.core.logging import get_logger
from kaldi_cnn_tpu.decode.decoder import viterbi_align
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.gmm.am_gmm import AmDiagGmm, AmDiagGmmAccs
from kaldi_cnn_tpu.lang.hclg import Lang, compile_training_graph

logger = get_logger(__name__)


@configclass
class MonoTrainOptions:
    num_iters: int = 30
    totgauss: int = 300
    max_iter_inc: int = 20
    beam: float = 20.0
    acoustic_scale: float = 1.0
    self_loop_scale: float = 0.1
    transition_scale: float = 1.0
    seed: int = 0


def align_equal(graph: CompiledGraph, num_frames: int) -> Optional[np.ndarray]:
    """Uniform first-pass alignment (ref: align-equal-compiled): Viterbi
    with flat acoustics, so only graph/transition costs decide."""
    flat = np.zeros((num_frames, int(graph.e_pdf.max()) + 1), np.float32)
    return viterbi_align(graph, flat, acoustic_scale=0.0)


def train_mono(
    feats: Dict[str, np.ndarray],
    transcripts: Dict[str, Sequence[str]],
    lang: Lang,
    opts: MonoTrainOptions = None,
) -> Tuple[AmDiagGmm, Dict[str, np.ndarray]]:
    """Returns (trained AmDiagGmm, final per-utterance tid alignments)."""
    opts = opts or MonoTrainOptions()
    rng = np.random.default_rng(opts.seed)
    tm = lang.trans_model
    tid2pdf = tm.trans_id_to_pdf_array()

    # flat start from global stats (ref: gmm-init-mono)
    all_feats = np.concatenate(list(feats.values()))
    am = AmDiagGmm.flat_start(
        tm.num_pdfs, all_feats.mean(axis=0), all_feats.var(axis=0))

    logger.info("compiling %d training graphs", len(feats))
    graphs = {
        utt: CompiledGraph(
            compile_training_graph(
                lang, transcripts[utt],
                transition_scale=opts.transition_scale,
                self_loop_scale=opts.self_loop_scale),
            tid2pdf)
        for utt in feats
    }

    alignments: Dict[str, np.ndarray] = {}
    # iteration 0: equal alignment
    for utt, f in feats.items():
        ali = align_equal(graphs[utt], f.shape[0])
        if ali is None:
            logger.warning("equal-align failed for %s", utt)
            continue
        alignments[utt] = ali

    gauss_inc = max(1, (opts.totgauss - am.total_gauss())
                    // max(opts.max_iter_inc, 1))
    realign_iters = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 20,
                     23, 26, 29, 32, 35, 38}

    for it in range(opts.num_iters):
        if it > 0 and it in realign_iters:
            for utt, f in feats.items():
                ll = am.loglikes(f)
                ali = viterbi_align(graphs[utt], ll,
                                    acoustic_scale=opts.acoustic_scale,
                                    beam=opts.beam)
                if ali is not None:
                    alignments[utt] = ali
        accs = AmDiagGmmAccs(am)
        tstats = np.zeros(tm.num_transition_ids + 1)
        tot_like, tot_frames = 0.0, 0
        for utt, f in feats.items():
            if utt not in alignments:
                continue
            tids = alignments[utt]
            pdf_ali = tid2pdf[tids]
            accs.accumulate(am, f, pdf_ali)
            np.add.at(tstats, tids, 1.0)
            ll = am.loglikes(f)
            tot_like += float(ll[np.arange(len(pdf_ali)), pdf_ali].sum())
            tot_frames += f.shape[0]
        am = accs.update(am)
        tm.mle_update(tstats)
        if it < opts.max_iter_inc:
            am.split_to_total(
                min(opts.totgauss,
                    am.total_gauss() + gauss_inc),
                accs.pdf_occs(), rng)
        if it % 5 == 0 or it == opts.num_iters - 1:
            logger.info("iter %d: avg loglike/frame %.3f, %d gauss",
                        it, tot_like / max(tot_frames, 1), am.total_gauss())
    return am, alignments
