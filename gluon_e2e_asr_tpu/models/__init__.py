from gluon_e2e_asr_tpu.models.encoder import BiLSTMEncoder
from gluon_e2e_asr_tpu.models.decoder import AttentionDecoder
from gluon_e2e_asr_tpu.models.asr import ASRModel, build_model
