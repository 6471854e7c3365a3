from gluon_e2e_asr_tpu.data.tokenizer import (
    CharTokenizer,
    SubwordTokenizer,
    build_tokenizer,
    tokenizer_from_json,
)
from gluon_e2e_asr_tpu.data.manifest import (
    Utterance,
    build_synthetic_manifest,
    load_manifest,
    save_manifest,
    synth_waveform,
)
from gluon_e2e_asr_tpu.data.sampler import BucketSampler, BucketSpec
from gluon_e2e_asr_tpu.data.loader import Batch, DataLoader
