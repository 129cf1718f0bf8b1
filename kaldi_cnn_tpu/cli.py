"""The command-line multitool: the reference's ~200 thin binaries as
verbs of one entry point (SURVEY.md §2 disposition for src/*bin/).

    python -m kaldi_cnn_tpu.cli <verb> [--flag=value ...] args...

Verbs mirror the load-bearing reference binaries (same names, same
ark/scp piping model via the io layer):

  compute-mfcc-feats   featbin/compute-mfcc-feats.cc
  compute-fbank-feats  featbin/compute-fbank-feats.cc
  apply-cmvn           featbin/apply-cmvn.cc (global per-ark here)
  add-deltas           featbin/add-deltas.cc
  splice-feats         featbin/splice-feats.cc
  copy-feats           featbin/copy-feats.cc
  compute-wer          bin/compute-wer.cc
  run-recipe           egs/<corpus>/run.sh equivalents
  bench                the bench.py harness verbs

Every verb self-documents with --help (ref: ParseOptions usage
strings).
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List

import numpy as np


def _feat_opts(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--sample-frequency", type=float, default=16000.0)
    parser.add_argument("--frame-length", type=float, default=25.0)
    parser.add_argument("--frame-shift", type=float, default=10.0)
    parser.add_argument("--num-mel-bins", type=int, default=23)
    parser.add_argument("--dither", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)


def _make_opts(args, kind: str):
    from kaldi_cnn_tpu.features import functional as F
    opts = F.MfccOptions() if kind == "mfcc" else F.FbankOptions()
    opts.frame_opts.samp_freq = args.sample_frequency
    opts.frame_opts.frame_length_ms = args.frame_length
    opts.frame_opts.frame_shift_ms = args.frame_shift
    opts.frame_opts.dither = args.dither
    opts.mel_opts.num_bins = args.num_mel_bins
    return opts


def cmd_compute_feats(argv: List[str], kind: str) -> int:
    import jax
    from kaldi_cnn_tpu.features import functional as F
    from kaldi_cnn_tpu.io.kaldi_io import ArkWriter
    from kaldi_cnn_tpu.io.wave import read_wave
    p = argparse.ArgumentParser(prog=f"compute-{kind}-feats")
    _feat_opts(p)
    p.add_argument("wav_scp", help="scp file: <utt> <wav path>")
    p.add_argument("out_ark")
    p.add_argument("--out-scp", default=None)
    args = p.parse_args(argv)
    opts = _make_opts(args, kind)
    fn = F.compute_mfcc if kind == "mfcc" else F.compute_fbank
    n = 0
    with ArkWriter(args.out_ark, args.out_scp) as w:
        for line in open(args.wav_scp):
            utt, path = line.split(None, 1)
            wave, rate = read_wave(path.strip())
            if wave.ndim == 2:
                wave = wave[0]   # channel 0 (ref: --channel default)
            opts.frame_opts.samp_freq = rate
            key = jax.random.PRNGKey(args.seed + n) \
                if args.dither > 0 else None
            w.write(utt, np.asarray(fn(wave, opts, key), np.float32))
            n += 1
    print(f"computed {kind} features for {n} utterances",
          file=sys.stderr)
    return 0


def cmd_transform(argv: List[str], verb: str) -> int:
    from kaldi_cnn_tpu.features import functional as F
    from kaldi_cnn_tpu.io.kaldi_io import ArkWriter, read_mat_ark
    p = argparse.ArgumentParser(prog=verb)
    p.add_argument("in_ark")
    p.add_argument("out_ark")
    p.add_argument("--out-scp", default=None)
    p.add_argument("--norm-vars", action="store_true")
    p.add_argument("--delta-order", type=int, default=2)
    p.add_argument("--left-context", type=int, default=4)
    p.add_argument("--right-context", type=int, default=4)
    args = p.parse_args(argv)
    n = 0
    with ArkWriter(args.out_ark, args.out_scp) as w:
        for utt, mat in read_mat_ark(args.in_ark):
            if verb == "apply-cmvn":
                out = F.apply_cmvn(mat, args.norm_vars)
            elif verb == "add-deltas":
                out = F.compute_deltas(mat, args.delta_order)
            elif verb == "splice-feats":
                out = F.splice_frames(mat, args.left_context,
                                      args.right_context)
            else:  # copy-feats
                out = mat
            w.write(utt, np.asarray(out, np.float32))
            n += 1
    print(f"{verb}: processed {n} utterances", file=sys.stderr)
    return 0


def cmd_compute_wer(argv: List[str]) -> int:
    from kaldi_cnn_tpu.decode.score import wer_details
    p = argparse.ArgumentParser(
        prog="compute-wer",
        description="ref/hyp text files: '<utt> <word> <word> ...'")
    p.add_argument("ref_text")
    p.add_argument("hyp_text")
    args = p.parse_args(argv)

    def load(path: str) -> Dict[str, List[str]]:
        out = {}
        for line in open(path):
            parts = line.split()
            if parts:
                out[parts[0]] = parts[1:]
        return out

    r = wer_details(load(args.ref_text), load(args.hyp_text))
    print(f"%WER {r['wer']:.2f} [ {r['errors']} / {r['words']}, "
          f"{r['ins']} ins, {r['del']} del, {r['sub']} sub ]")
    return 0


def cmd_run_recipe(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="run-recipe")
    p.add_argument("recipe", choices=["yesno", "rm", "wsj"])
    p.add_argument("--pallas", action="store_true")
    args = p.parse_args(argv)
    import importlib
    mod = importlib.import_module(f"kaldi_cnn_tpu.recipes.{args.recipe}")
    kw = {}
    if args.recipe in ("yesno",):
        kw["use_pallas_features"] = args.pallas
    elif args.recipe == "wsj":
        kw["use_pallas"] = args.pallas
    res = mod.run(**kw)
    print(res)
    return 0


VERBS = {
    "compute-mfcc-feats": lambda a: cmd_compute_feats(a, "mfcc"),
    "compute-fbank-feats": lambda a: cmd_compute_feats(a, "fbank"),
    "apply-cmvn": lambda a: cmd_transform(a, "apply-cmvn"),
    "add-deltas": lambda a: cmd_transform(a, "add-deltas"),
    "splice-feats": lambda a: cmd_transform(a, "splice-feats"),
    "copy-feats": lambda a: cmd_transform(a, "copy-feats"),
    "compute-wer": cmd_compute_wer,
    "run-recipe": cmd_run_recipe,
}


def main(argv: List[str] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("verbs:", ", ".join(sorted(VERBS)))
        return 0
    verb, rest = argv[0], argv[1:]
    if verb not in VERBS:
        print(f"unknown verb {verb!r}; verbs: {', '.join(sorted(VERBS))}",
              file=sys.stderr)
        return 2
    return VERBS[verb](rest)


if __name__ == "__main__":
    sys.exit(main())
