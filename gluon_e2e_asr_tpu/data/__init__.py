from gluon_e2e_asr_tpu.data.tokenizer import CharTokenizer
from gluon_e2e_asr_tpu.data.manifest import (
    Utterance,
    build_synthetic_manifest,
    load_manifest,
    save_manifest,
    synth_waveform,
)
from gluon_e2e_asr_tpu.data.sampler import BucketSampler, BucketSpec
from gluon_e2e_asr_tpu.data.loader import Batch, DataLoader
