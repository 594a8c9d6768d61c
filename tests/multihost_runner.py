"""Subprocess body for the 2-process multi-host integration test.

Run as: python tests/multihost_runner.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=2 in the environment
(2 virtual CPU devices per process -> a 4-device global mesh over 2 hosts).

Prints one line: MULTIHOST_LOSS=<loss> so the parent can assert both
processes computed the identical global loss.
"""

import os
import sys


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vats_tpu.parallel.multihost import (
        host_shard_slice,
        initialize_multihost,
        is_coordinator,
        make_global_batch,
    )

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
        cpu_collectives="gloo",
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    import numpy as np

    from vats_tpu.configs import ModelArgs, TrainingArgs
    from vats_tpu.models import TextLM
    from vats_tpu.parallel import create_mesh
    from vats_tpu.parallel.sharded import make_sharded_train

    cfg = ModelArgs(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=128, max_seq_len=64, left_window=-1,
        num_experts=2, top_k=1, moe_dispatch="dense", dtype="float32",
        gradient_checkpointing=False, use_mqa=False,
    )
    model = TextLM(cfg)
    targs = TrainingArgs(grad_accum_steps=1)

    # global batch built deterministically, then host-sharded: each process
    # materializes ONLY its slice
    global_bs, seq = 8, 32
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.vocab_size, size=(global_bs, seq)).astype(np.int32)
    labels = np.concatenate(
        [ids[:, 1:], np.full((global_bs, 1), -100, np.int32)], axis=1
    )
    mask = np.ones((global_bs, seq), dtype=bool)
    sl = host_shard_slice(global_bs)
    local = {"input_ids": ids[sl], "labels": labels[sl], "padding_mask": mask[sl]}

    # mesh over ALL processes' devices: data axis spans hosts (DCN in prod,
    # gloo here), fsdp within
    mesh = create_mesh(data=nproc, fsdp=2, expert=1, tensor=1, seq=1)
    batch = make_global_batch(local, mesh)

    init_fn, step_fn, _ = make_sharded_train(
        model, targs, mesh, batch, num_training_steps=10
    )
    state = init_fn(jax.random.PRNGKey(1))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    print(f"MULTIHOST_LOSS={loss:.6f}", flush=True)
    print(f"MULTIHOST_COORD={int(is_coordinator())}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
