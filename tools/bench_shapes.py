"""Shared shapes between bench.py and tools/calibrate_baseline.py."""

BENCH_CFG = dict(
    d_model=512,
    num_heads=8,
    query_groups=2,
    d_ffn=2048,
    num_layers=8,
    vocab_size=32768,
    max_seq_len=1024,
    num_experts=8,
    top_k=2,
)
BATCH = 64
PROMPT_LEN = 128
DECODE_STEPS = 256
