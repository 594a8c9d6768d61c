"""Test configuration: run JAX on a fake 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated
on a host-platform mesh (the standard JAX trick), mirroring SURVEY.md §4's
recommended strategy.

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the TPU plugin before pytest starts, so plain env vars are too late — we
override through jax.config (backends initialize lazily, so this still wins
as long as no computation ran at import time).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache makes repeat suite runs much faster.
# NOTE: kept separate from the TPU cache (.jax_cache) — the axon remote
# compiler bakes CPU AOT entries with different host features (SIGILL risk).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
