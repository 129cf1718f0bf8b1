"""End-to-end smoke test: the yesno recipe must reach WER 0
(the reference's de-facto integration test, egs/yesno/s5/run.sh —
SURVEY.md §4 'Integration / smoke')."""

from kaldi_cnn_tpu.recipes import yesno


def test_yesno_end_to_end_wer_zero():
    result = yesno.run(num_utts=100, num_iters=25, totgauss=400, seed=17)
    assert result["words"] > 20
    assert result["wer"] == 0.0
