"""The Librispeech-960h-style configuration: CNN acoustic model trained
data-parallel over a device mesh with periodic model averaging
(ref: BASELINE.json config "Librispeech 960h CNN, multi-host
data-parallel + model averaging"; upstream egs/librispeech/s5 driven
through queue.pl — here the parallel/multihost driver).

This recipe is the scaling configuration: same pipeline as recipes/wsj
but the train step runs over a jax.sharding.Mesh (all local devices, or
the virtual 8-device CPU mesh in tests), with utterance-list sharding
per host and optional reference-semantics averaging cadence.

Run: ``python -m kaldi_cnn_tpu.recipes.librispeech``
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from kaldi_cnn_tpu.core.logging import MetricsWriter, Timer, get_logger
from kaldi_cnn_tpu.decode.decoder import lattice_decode
from kaldi_cnn_tpu.decode.graph import CompiledGraph
from kaldi_cnn_tpu.decode.lattice import shortest_path
from kaldi_cnn_tpu.decode.score import wer_details
from kaldi_cnn_tpu.gmm.train import (
    DeltasTrainOptions, MonoTrainOptions, train_deltas, train_mono)
from kaldi_cnn_tpu.lang.arpa import make_unigram_arpa
from kaldi_cnn_tpu.lang.hclg import Lang, make_hclg_from_arpa
from kaldi_cnn_tpu.parallel.multihost import (
    MultihostConfig, initialize, shard_utterances, train_multihost)
from kaldi_cnn_tpu.recipes import synthetic
from kaldi_cnn_tpu.recipes.rm import score_sweep
from kaldi_cnn_tpu.recipes.wsj import (
    compute_fbank_volumes, make_cnn_egs, splice_volume)
from kaldi_cnn_tpu.recipes.yesno import compute_features

logger = get_logger(__name__)


def run(
    num_utts: int = 200,
    seed: int = 53,
    nnet_epochs: int = 25,
    num_filters: int = 48,
    average_every: int = 0,
    mh: Optional[MultihostConfig] = None,
    metrics: Optional[MetricsWriter] = None,
    corpus=None,
) -> Dict:
    import jax
    from kaldi_cnn_tpu.models.factory import ConvnetConfig, make_convnet
    from kaldi_cnn_tpu.models.nnet import AmNnet
    from kaldi_cnn_tpu.train.egs import Egs
    from kaldi_cnn_tpu.train.trainer import TrainConfig

    mh = mh or MultihostConfig(average_every=average_every)
    mesh = initialize(mh)
    logger.info("mesh: %d devices, process %d/%d",
                len(mesh.devices.flatten()), mh.process_id,
                mh.num_processes)

    if corpus is None:
        lex = synthetic.digits_lexicon()
        wp = {w: 1.0 / len(lex.entries) for w in lex.entries}
        corpus = synthetic.make_corpus(lex, wp, num_utts, 2, 5, seed)
    else:
        lex, wp = corpus.lexicon, corpus.word_probs
    train, test = corpus.split(0.15)
    train, dev = train.split(0.1)

    # per-host utterance shard (ref: utils/split_data.sh)
    local_utts = set(shard_utterances(list(train.waves), mh))
    train_local = synthetic.SyntheticCorpus(
        lex, wp, {u: train.waves[u] for u in local_utts},
        {u: train.transcripts[u] for u in local_utts},
        train.sample_rate)
    logger.info("corpus: %d local train / %d dev / %d test",
                len(train_local.waves), len(dev.waves), len(test.waves))

    mfcc = compute_features(train_local, seed=seed)
    lang = Lang.create(lex)
    timer = Timer()
    am0, ali0 = train_mono(mfcc, train_local.transcripts, lang,
                           MonoTrainOptions(num_iters=18, totgauss=300))
    am1, ali1, tri = train_deltas(
        mfcc, train_local.transcripts, lang, ali0, lang.trans_model,
        DeltasTrainOptions(num_iters=12, totgauss=800, max_leaves=300))
    logger.info("GMM bootstrap in %.1fs", timer.elapsed())

    num_bins, left, right = 36, 5, 5
    vol_tr = compute_fbank_volumes(train_local, num_bins, seed)
    vol_dev = compute_fbank_volumes(dev, num_bins, seed + 1)
    vol_te = compute_fbank_volumes(test, num_bins, seed + 2)
    tid2pdf = tri.trans_model.trans_id_to_pdf_array()
    num_pdfs = tri.trans_model.num_pdfs
    egs_all = make_cnn_egs(vol_tr, ali1, tid2pdf, left, right, seed)
    n_valid = max(len(egs_all) // 20, 256)
    egs_valid = Egs(egs_all.x[:n_valid], egs_all.y[:n_valid],
                    egs_all.weights[:n_valid])
    egs_train = Egs(egs_all.x[n_valid:], egs_all.y[n_valid:],
                    egs_all.weights[n_valid:])
    logger.info("egs: %d train / %d valid", len(egs_train),
                len(egs_valid))

    cfg = ConvnetConfig(
        in_t=left + 1 + right, in_f=num_bins, in_c=3,
        filt_t=4, filt_f=7, num_filters=num_filters,
        pool_t=2, pool_f=3, pool_c=1,
        num_hidden_layers=2, pnorm_input_dim=800, pnorm_output_dim=160,
        num_pdfs=num_pdfs)
    net = make_convnet(cfg)
    timer.reset()
    params, _ = train_multihost(
        net, egs_train, egs_valid,
        TrainConfig(num_epochs=nnet_epochs, minibatch_size=256,
                    initial_learning_rate=0.08,
                    final_learning_rate=0.008, seed=seed),
        mh, mesh=mesh, metrics=metrics)
    train_t = timer.elapsed()
    frames = nnet_epochs * len(egs_train)
    logger.info("CNN trained in %.1fs over the mesh (%.0f audio-s/s)",
                train_t, frames / 100.0 / train_t)
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

    dev_wer, pt, _ = score_sweep(nnet_decode(vol_dev), dev.transcripts,
                                 tri.word_table)
    logger.info("dev WER %.2f%% at %s", dev_wer, pt)
    hyps = {}
    for utt, lat in nnet_decode(vol_te).items():
        _, wids, _ = shortest_path(lat, 1.0, pt[0], pt[1])
        hyps[utt] = [tri.word_table.sym(int(w)) for w in wids]
    result = wer_details(test.transcripts, hyps)
    result.update(dev_wer=dev_wer,
                  train_audio_ss=frames / 100.0 / train_t,
                  num_devices=len(mesh.devices.flatten()))
    logger.info("librispeech-style test WER %.2f%% (%d err / %d words)",
                result["wer"], result["errors"], result["words"])
    if metrics:
        metrics.write("librispeech_result", **result)
    return result


if __name__ == "__main__":
    import sys
    res = run()
    sys.exit(0 if res["wer"] < 15.0 else 1)
