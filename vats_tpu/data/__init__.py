from vats_tpu.data.synthetic import synthetic_lm_batches

__all__ = ["synthetic_lm_batches"]
