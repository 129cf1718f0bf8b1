"""The WSJ-style CNN recipe — the fork's headline configuration
(ref: BASELINE.json config "nnet2 CNN (Conv2D + maxpool over fbank)
hybrid AM (WSJ)"; upstream analogue steps/nnet2/train_convnet_accel2.sh
driven from egs/wsj/s5/run.sh).

Pipeline:
  MFCC GMM bootstrap (mono -> tri deltas)        for alignments
  fbank (36 mel bins) + deltas as (t, f, c) volumes
  Conv2D + Maxpool3D + p-norm stack CNN AM        (the fork's kernels,
                                                   Pallas-backed)
  NG-SGD training, prior adjustment
  lattice decode + rescoring sweep; batched TPU decode for RTF

Run: ``python -m kaldi_cnn_tpu.recipes.wsj``
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from kaldi_cnn_tpu.core.logging import MetricsWriter, Timer, get_logger
from kaldi_cnn_tpu.core.rng import stage_key
from kaldi_cnn_tpu.decode.decoder import lattice_decode
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.decode.lattice import shortest_path
from kaldi_cnn_tpu.decode.score import wer_details
from kaldi_cnn_tpu.features import functional as F
from kaldi_cnn_tpu.features.extractor import FeatureExtractor
from kaldi_cnn_tpu.gmm.train import (
    DeltasTrainOptions, MonoTrainOptions, train_deltas, train_mono)
from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
from kaldi_cnn_tpu.lang.hclg import Lang, make_hclg_from_arpa
from kaldi_cnn_tpu.recipes import synthetic
from kaldi_cnn_tpu.recipes.rm import score_sweep
from kaldi_cnn_tpu.recipes.yesno import compute_features

logger = get_logger(__name__)


def compute_fbank_volumes(corpus, num_bins: int = 36, seed: int = 0,
                          use_pallas: bool = False
                          ) -> Dict[str, np.ndarray]:
    """Per-utterance [T, num_bins, 3] volumes: static + delta + delta2
    channels over mel filterbanks (ref: conf/fbank.conf 36 bins + the
    convnet scripts' --delta-order=2)."""
    opts = F.FbankOptions()
    opts.frame_opts.samp_freq = float(corpus.sample_rate)
    opts.frame_opts.dither = 1.0
    opts.mel_opts.num_bins = num_bins
    ex = FeatureExtractor("fbank", opts, bucket_seconds=1.0,
                          device=None if use_pallas else "cpu",
                          use_pallas=use_pallas, deltas_order=2)
    flat = ex.extract_corpus(corpus.waves, stage_key(seed, "fbank_dither"))
    out = {}
    for utt, f in flat.items():
        # deltas concatenate channel blocks: [static | d1 | d2],
        # i.e. dim index = c * num_bins + fbin -> reshape to (c, f)
        T = f.shape[0]
        v = f.reshape(T, 3, num_bins).transpose(0, 2, 1)  # [T, f, c]
        out[utt] = np.ascontiguousarray(v, np.float32)
    return out


def make_cnn_egs(volumes: Dict[str, np.ndarray],
                 alignments: Dict[str, np.ndarray],
                 tid_to_pdf: np.ndarray,
                 left_context: int = 5, right_context: int = 5,
                 seed: int = 0):
    """Spliced (t, f, c) volumes flattened in the Conv2DComponent row
    layout: index = (t * in_f + f) * in_c + c
    (ref: nnet-get-egs + the fork's patch layout)."""
    from kaldi_cnn_tpu.core.rng import np_rng
    from kaldi_cnn_tpu.train.egs import Egs
    xs, ys = [], []
    w = left_context + 1 + right_context
    for utt in sorted(volumes):
        if utt not in alignments:
            continue
        v = volumes[utt]                       # [T, f, c]
        ali = np.asarray(alignments[utt])
        T = v.shape[0]
        if len(ali) != T:
            continue
        idx = np.clip(np.arange(T)[:, None]
                      + np.arange(-left_context, right_context + 1)[None],
                      0, T - 1)
        sp = v[idx]                            # [T, w, f, c]
        xs.append(sp.reshape(T, -1))
        ys.append(tid_to_pdf[ali])
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int32)
    rng = np_rng(seed, "cnn_egs_shuffle")
    perm = rng.permutation(len(y))
    return Egs(x[perm], y[perm], np.ones(len(y), np.float32))


def splice_volume(v: np.ndarray, left: int, right: int) -> np.ndarray:
    T = v.shape[0]
    idx = np.clip(np.arange(T)[:, None]
                  + np.arange(-left, right + 1)[None], 0, T - 1)
    return v[idx].reshape(T, -1)


def run(
    num_utts: int = 160,
    seed: int = 37,
    nnet_epochs: int = 25,
    num_filters: int = 64,
    use_pallas: bool = False,
    metrics: Optional[MetricsWriter] = None,
    corpus=None,
    ext_alignments: Optional[Dict[str, np.ndarray]] = None,
) -> Dict:
    """corpus: any object with the SyntheticCorpus shape (e.g. from
    recipes.datadir.corpus_from_data_dir); defaults to the synthetic
    digits corpus.  ext_alignments: externally produced transition-id
    alignments (e.g. the reference's ali ark via
    datadir.load_alignments_ark) used instead of the GMM bootstrap for
    differential testing."""
    import jax
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
    from kaldi_cnn_tpu.models.nnet import AmNnet
    from kaldi_cnn_tpu.train.egs import Egs
    from kaldi_cnn_tpu.train.trainer import TrainConfig, train_nnet

    if corpus is None:
        lex = synthetic.digits_lexicon()
        wp = {w: 1.0 / len(lex.entries) for w in lex.entries}
        corpus = synthetic.make_corpus(lex, wp, num_utts, 2, 5, seed)
    else:
        lex, wp = corpus.lexicon, corpus.word_probs
    traindev, test = corpus.split(0.2)
    train, dev = traindev.split(0.15)
    logger.info("corpus: %d train / %d dev / %d test",
                len(train.waves), len(dev.waves), len(test.waves))

    timer = Timer()
    mfcc_tr = compute_features(train, seed=seed)
    logger.info("mfcc in %.1fs", timer.elapsed())

    # GMM bootstrap for alignments (ref: wsj tri2 alignments feed the
    # convnet's egs)
    lang = Lang.create(lex)
    timer.reset()
    am0, ali0 = train_mono(mfcc_tr, train.transcripts, lang,
                           MonoTrainOptions(num_iters=18, totgauss=300))
    am1, ali1, tri = train_deltas(
        mfcc_tr, train.transcripts, lang, ali0, lang.trans_model,
        DeltasTrainOptions(num_iters=12, totgauss=700, max_leaves=250))
    logger.info("GMM bootstrap in %.1fs", timer.elapsed())

    num_bins = 36
    left, right = 5, 5
    timer.reset()
    vol_tr = compute_fbank_volumes(train, num_bins, seed, use_pallas)
    vol_dev = compute_fbank_volumes(dev, num_bins, seed + 1, use_pallas)
    vol_te = compute_fbank_volumes(test, num_bins, seed + 2, use_pallas)
    logger.info("fbank volumes in %.1fs", timer.elapsed())

    tid2pdf = tri.trans_model.trans_id_to_pdf_array()
    num_pdfs = tri.trans_model.num_pdfs
    if ext_alignments is not None:
        # differential mode: external (reference-produced) alignments
        # replace the bootstrap's (ref: steps/nnet2/get_egs.sh --alidir)
        ali1 = ext_alignments
        logger.info("using %d external alignments", len(ali1))
    egs_all = make_cnn_egs(vol_tr, ali1, tid2pdf, left, right, seed)
    n_valid = max(len(egs_all) // 20, 256)
    egs_valid = Egs(egs_all.x[:n_valid], egs_all.y[:n_valid],
                    egs_all.weights[:n_valid])
    egs_train = Egs(egs_all.x[n_valid:], egs_all.y[n_valid:],
                    egs_all.weights[n_valid:])
    logger.info("egs: %d train / %d valid, dim %d",
                len(egs_train), len(egs_valid), egs_train.x.shape[1])

    cfg = ConvnetConfig(
        in_t=left + 1 + right, in_f=num_bins, in_c=3,
        filt_t=4, filt_f=7, num_filters=num_filters,
        pool_t=2, pool_f=3, pool_c=1,
        num_hidden_layers=2, pnorm_input_dim=1000, pnorm_output_dim=200,
        num_pdfs=num_pdfs)
    net = make_convnet(cfg, use_pallas=use_pallas)
    assert net.input_dim == egs_train.x.shape[1]
    timer.reset()
    params, _ = train_nnet(
        net, egs_train, egs_valid,
        TrainConfig(num_epochs=nnet_epochs, minibatch_size=256,
                    initial_learning_rate=0.08,
                    final_learning_rate=0.008, seed=seed))
    train_t = timer.elapsed()
    frames = nnet_epochs * len(egs_train)
    logger.info("CNN trained in %.1fs (%.0f audio-s/s)", train_t,
                frames / 100.0 / train_t)
    am_nnet = AmNnet(net, num_pdfs)
    am_nnet.set_priors_from_counts(
        np.bincount(egs_train.y, minlength=num_pdfs))

    hclg = CompiledGraph(make_hclg_from_arpa(tri, make_unigram_arpa(wp)),
                         tid2pdf)

    def nnet_decode(vols):
        lats = {}
        for utt, v in vols.items():
            x = splice_volume(v, left, right)
            ll = am_nnet.loglikes(params, x)
            lats[utt] = lattice_decode(hclg, ll, acoustic_scale=0.1,
                                       beam=60.0, lattice_beam=8.0,
                                       max_active=2000)
        return lats

    timer.reset()
    dev_lats = nnet_decode(vol_dev)
    dev_wer, pt, _ = score_sweep(dev_lats, dev.transcripts,
                                 tri.word_table)
    logger.info("CNN dev WER %.2f%% at %s", dev_wer, pt)
    test_lats = nnet_decode(vol_te)
    hyps = {}
    for utt, lat in test_lats.items():
        _, wids, _ = shortest_path(lat, 1.0, pt[0], pt[1])
        hyps[utt] = [tri.word_table.sym(int(w)) for w in wids]
    result = wer_details(test.transcripts, hyps)
    decode_t = timer.elapsed()
    audio_s = sum(v.shape[0] for v in vol_te.values()) / 100.0
    result.update(dev_wer=dev_wer,
                  train_audio_ss=frames / 100.0 / train_t)
    logger.info("WSJ-CNN test WER %.2f%% (%d err / %d words)",
                result["wer"], result["errors"], result["words"])
    if metrics:
        metrics.write("wsj_cnn_result", **result)
    return result


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--data-dir", default=None,
                    help="Kaldi data dir (wav.scp/text/utt2spk); "
                         "default: synthetic corpus")
    ap.add_argument("--lexicon", default=None)
    ap.add_argument("--ali-ark", default=None,
                    help="external transition-id alignments ark")
    a = ap.parse_args()
    corpus = None
    if a.data_dir:
        from kaldi_cnn_tpu.recipes.datadir import corpus_from_data_dir
        corpus = corpus_from_data_dir(a.data_dir, a.lexicon)
    ext = None
    if a.ali_ark:
        from kaldi_cnn_tpu.recipes.datadir import load_alignments_ark
        ext = load_alignments_ark(a.ali_ark)
    res = run(use_pallas=a.pallas, corpus=corpus, ext_alignments=ext)
    import sys
    sys.exit(0 if res["wer"] < 10.0 else 1)
