"""TPU-native end-to-end ASR framework.

A brand-new JAX/XLA/Pallas/pjit rebuild of the capabilities of the
MXNet-Gluon reference stack ``Hex-Lee/gluon-e2e-asr`` (the reference
checkout was empty at survey time — see SURVEY.md §0 — so the contract
is BASELINE.json, cited throughout as [BASELINE.json:L<n>]).

Capability surface [BASELINE.json:L5]:
  - fused acoustic frontend (framing, STFT, log-Mel, CMVN, SpecAugment)
    as a single Pallas kernel, with an XLA-composed fallback
  - XLA-scanned BiLSTM encoder + LAS attention decoder over
    length-bucketed padded batches
  - on-device CTC forward-backward (alpha-beta) and joint
    CTC-attention losses
  - data-parallel training over ICI with gradient allreduce
  - batched beam-search decoding with CTC prefix scoring + length
    normalization
"""

__version__ = "0.1.0"
