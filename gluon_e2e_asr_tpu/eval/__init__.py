from gluon_e2e_asr_tpu.eval.metrics import edit_distance, wer, cer
