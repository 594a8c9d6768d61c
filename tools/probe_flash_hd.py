"""Hardware probe: flash kernel at non-128 head dims + segids + backward.

Verifies the kernel lowers on the real TPU at the configs' operating points
(head_dim 64/72/66) and times kernel vs the XLA oracle at a training shape.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from vats_tpu.ops.attention_xla import dot_product_attention  # noqa: E402
from vats_tpu.ops.flash_attention import flash_attention  # noqa: E402

print("backend:", jax.default_backend(), flush=True)


def check(tag, fn_flash, fn_ref, args, tol=2e-2):
    try:
        t0 = time.time()
        out = jax.device_get(fn_flash(*args))
        dt = time.time() - t0
        ref = jax.device_get(fn_ref(*args))
        import numpy as np

        err = float(np.max(np.abs(np.asarray(out, np.float32)
                                  - np.asarray(ref, np.float32))))
        ok = "OK " if err < tol else "ERRTOL"
        print(f"{tag}: {ok} compile+run {dt:.1f}s max_err={err:.2e}", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{tag}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


B, T, H, G = 2, 256, 4, 2
for hd in (64, 72, 66):
    key = jax.random.PRNGKey(hd)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H, hd), jnp.float32)
    k = jax.random.normal(kk, (B, T, G, hd), jnp.float32)
    v = jax.random.normal(kv, (B, T, G, hd), jnp.float32)
    scale = 1.0 / hd ** 0.5
    ff = jax.jit(lambda q, k, v, s=scale: flash_attention(
        q, k, v, scale=s, causal=True, left_window=64))
    fr = jax.jit(lambda q, k, v, s=scale: dot_product_attention(
        q, k, v, scale=s, causal=True, left_window=64))
    check(f"fwd hd={hd}", ff, fr, (q, k, v), tol=1e-3)
    gf = jax.jit(jax.grad(lambda q, k, v, s=scale: jnp.sum(flash_attention(
        q, k, v, scale=s, causal=True) ** 2), argnums=1))
    gr = jax.jit(jax.grad(lambda q, k, v, s=scale: jnp.sum(dot_product_attention(
        q, k, v, scale=s, causal=True) ** 2), argnums=1))
    check(f"bwd-dk hd={hd}", gf, gr, (q, k, v), tol=1e-2)

# segment ids on hardware
hd = 64
q = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, hd), jnp.float32)
k = jax.random.normal(jax.random.PRNGKey(2), (B, T, G, hd), jnp.float32)
v = jax.random.normal(jax.random.PRNGKey(3), (B, T, G, hd), jnp.float32)
seg = (jnp.arange(T)[None, :] // 80).astype(jnp.int32).repeat(B, 0)
scale = 0.125
ff = jax.jit(lambda q, k, v, seg: flash_attention(
    q, k, v, scale=scale, causal=True, q_segment_ids=seg, kv_segment_ids=seg))
fr = jax.jit(lambda q, k, v, seg: dot_product_attention(
    q, k, v, scale=scale, causal=True, q_segment_ids=seg, kv_segment_ids=seg))
check("fwd segids hd=64", ff, fr, (q, k, v, seg), tol=1e-3)

# timing: kernel vs XLA at a training-like shape (bf16, long seq)
B2, T2, H2, G2, hd2 = 4, 4096, 8, 2, 64
q = jax.random.normal(jax.random.PRNGKey(4), (B2, T2, H2, hd2), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(5), (B2, T2, G2, hd2), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(6), (B2, T2, G2, hd2), jnp.bfloat16)
for name, fn in (
    ("flash", jax.jit(lambda q, k, v: flash_attention(
        q, k, v, scale=0.125, causal=True))),
    ("xla", jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, scale=0.125, causal=True))),
):
    try:
        jax.device_get(fn(q, k, v))  # compile
        t0 = time.time()
        for _ in range(20):
            r = fn(q, k, v)
        jax.device_get(r)
        dt = (time.time() - t0) / 20
        print(f"time {name} B{B2} T{T2} H{H2} hd{hd2} bf16: {dt*1e3:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"time {name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
