"""Block-size sweep for the flash kernel at a training shape, plus a
high-precision oracle check (is the ~7e-3 'error' the oracle's default
TPU matmul precision, not the kernel?)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from vats_tpu.ops.attention_xla import dot_product_attention  # noqa: E402
from vats_tpu.ops.flash_attention import flash_attention  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

# precision check at small shape (fp32)
B, T, H, G, hd = 2, 256, 4, 2, 64
q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, hd), jnp.float32)
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, G, hd), jnp.float32)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, G, hd), jnp.float32)
with jax.default_matmul_precision("highest"):
    ref_hi = jax.device_get(jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, scale=0.125, causal=True))(q, k, v))
ref_lo = jax.device_get(jax.jit(lambda q, k, v: dot_product_attention(
    q, k, v, scale=0.125, causal=True))(q, k, v))
fl = jax.device_get(jax.jit(lambda q, k, v: flash_attention(
    q, k, v, scale=0.125, causal=True))(q, k, v))
print("oracle(lo) vs oracle(hi):", float(np.max(np.abs(ref_lo - ref_hi))),
      flush=True)
print("flash vs oracle(hi):     ", float(np.max(np.abs(fl - ref_hi))),
      flush=True)

# timing sweep at training shape (env-overridable; bench.py's kernel shape
# is B=4 T=4096 H=24 G=8 hd=60)
import os  # noqa: E402

B2 = int(os.environ.get("PROBE_B", "4"))
T2 = int(os.environ.get("PROBE_T", "4096"))
H2 = int(os.environ.get("PROBE_H", "8"))
G2 = int(os.environ.get("PROBE_G", "2"))
hd2 = int(os.environ.get("PROBE_HD", "64"))
q = jax.random.normal(jax.random.PRNGKey(4), (B2, T2, H2, hd2), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(5), (B2, T2, G2, hd2), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(6), (B2, T2, G2, hd2), jnp.bfloat16)


def bench(fn, tag):
    try:
        jax.device_get(fn(q, k, v))
        t0 = time.time()
        for _ in range(20):
            r = fn(q, k, v)
        jax.device_get(r)
        print(f"{tag}: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


for bq, bk in [(128, 128), (256, 256), (512, 512), (256, 1024), (512, 1024),
               (1024, 1024)]:
    bench(jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
        q, k, v, scale=0.125, causal=True, block_q=bq, block_k=bk)),
        f"flash bq={bq} bk={bk}")

bench(jax.jit(lambda q, k, v: dot_product_attention(
    q, k, v, scale=0.125, causal=True)), "xla oracle")

# upstream pallas flash as a speed-of-light sanity bound (GQA unsupported
# there; repeat KV to full heads first)
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_flash,
    )

    def upstream(q, k, v):
        kf = jnp.repeat(k, H2 // G2, axis=2)
        vf = jnp.repeat(v, H2 // G2, axis=2)
        return jax_flash(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(kf, (0, 2, 1, 3)),
            jnp.transpose(vf, (0, 2, 1, 3)),
            causal=True, sm_scale=0.125,
        )
    bench(jax.jit(upstream), "upstream pallas flash (repeated KV)")
except Exception as e:
    print("upstream flash unavailable:", str(e)[:120], flush=True)
