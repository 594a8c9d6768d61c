"""vats_tpu: a TPU-native JAX/Pallas framework with the capabilities of
S-VATS31/vats-multimodal-lm.

Five workloads over one shared transformer core:
  1. MoE decoder LLM (text)           -> vats_tpu.models.text_lm
  2. 2D ViT image encoder             -> vats_tpu.models.vit2d
  3. 3D ViT video encoder             -> vats_tpu.models.vit3d
  4. Autoregressive text->image gen   -> vats_tpu.models.image_gen
  5. Autoregressive text->video gen   -> vats_tpu.models.video_gen

Design (TPU-first, not a torch translation):
  - flax.linen modules with logical-axis param partitioning; shardings are
    resolved against a jax.sharding.Mesh (axes: data, fsdp, expert, tensor)
    so the same model runs 1-chip or pod-scale via pjit/NamedSharding.
  - bf16 activations with fp32 numerical islands (RMSNorm, RoPE, softmax),
    mirroring the reference's autocast-disabled regions
    (/root/reference/src/rms_norm.py:30, /root/reference/src/optimized_attention.py:58).
  - Pallas flash-attention kernels (causal / sliding-window / GQA /
    segment-ids) in vats_tpu.ops replace the reference's external
    flash_attn_varlen_qkvpacked_func dependency
    (/root/reference/configs/setup_env.py:14-20).
  - Generation is a single jitted prefill + lax.while_loop decode over a
    static-shape KV cache (the reference's eager per-token python loop is
    /root/reference/src/transformers/nlp/inference/generate.py:102-236).
"""

__version__ = "0.1.0"
