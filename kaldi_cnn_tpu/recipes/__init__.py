"""End-to-end recipes (ref: egs/ in the reference).

No external corpora exist in this environment (zero egress), so the
recipes run on deterministic synthetic speech from
``recipes/synthetic.py``: each phone is rendered with a distinct
formant signature, utterances are word sequences with optional
silence — structurally the same shape as yesno/rm-style corpora, with
known transcripts so WER has a ground truth.
"""
