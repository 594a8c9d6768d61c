"""Device mesh + logical-axis sharding rules.

The reference repo has no distributed code at all (verified: zero hits for
torch.distributed/NCCL anywhere; every model runs on a single
``device = cuda|cpu``, /root/reference/configs/setup_env.py:11).  Parallelism
here is therefore a TPU-native design, not a port:

  * a ``jax.sharding.Mesh`` with named axes ``(data, fsdp, expert, tensor, seq)``
  * model params annotated with *logical* axis names (flax linen
    ``with_logical_partitioning``)
  * a rules table mapping logical names -> mesh axes, resolved at jit time so
    the identical model code runs single-chip or pod-scale
  * XLA inserts the collectives (psum for DP grads, all_gather/reduce_scatter
    for FSDP, all_to_all for MoE expert dispatch over the ``expert`` axis,
    ppermute for ring attention over ``seq``), riding ICI within a slice.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Physical mesh axis names, in priority order.
#   data:   pure data parallelism (batch)
#   fsdp:   fully-sharded data parallelism (batch + param/optimizer sharding)
#   expert: MoE expert parallelism (all_to_all token dispatch)
#   tensor: tensor parallelism (attention heads / FFN hidden dim)
#   seq:    sequence/context parallelism (ring attention)
MESH_AXES: Tuple[str, ...] = ("data", "fsdp", "expert", "tensor", "seq")

# Logical axis name -> candidate mesh axes (first available wins).
# Matches MaxText-style logical sharding rules.
DEFAULT_LOGICAL_AXIS_RULES: Tuple[Tuple[str, Optional[Sequence[str]]], ...] = (
    ("batch", ("data", "fsdp")),
    ("activation_batch", ("data", "fsdp")),
    ("activation_seq", "seq"),
    ("activation_embed", "tensor"),
    ("activation_heads", "tensor"),
    ("activation_kv", None),
    ("embed", "fsdp"),
    ("vocab", "tensor"),
    ("heads", "tensor"),
    ("kv_heads", "tensor"),
    ("head_dim", None),
    ("mlp", "tensor"),
    ("experts", "expert"),
    ("expert_mlp", "tensor"),
    ("conv_in", None),
    ("conv_out", "tensor"),
    ("norm", None),
)


def logical_axis_rules(
    overrides: Optional[Sequence[Tuple[str, Optional[Sequence[str]]]]] = None,
) -> Tuple[Tuple[str, Optional[Sequence[str]]], ...]:
    """Return logical->mesh axis rules, with optional per-call overrides."""
    if not overrides:
        return DEFAULT_LOGICAL_AXIS_RULES
    merged = dict(DEFAULT_LOGICAL_AXIS_RULES)
    merged.update(dict(overrides))
    return tuple(merged.items())


def create_device_mesh(
    *,
    data: int = 1,
    fsdp: int = -1,
    expert: int = 1,
    tensor: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> np.ndarray:
    """Build an ndarray of devices shaped for :data:`MESH_AXES`.

    Exactly one axis may be -1 (absorbs all remaining devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    sizes = [data, fsdp, expert, tensor, seq]
    n_unknown = sum(1 for s in sizes if s == -1)
    if n_unknown > 1:
        raise ValueError(f"At most one mesh axis may be -1, got sizes {sizes}")
    known = math.prod(s for s in sizes if s != -1)
    if n_unknown == 1:
        if len(devices) % known != 0:
            raise ValueError(
                f"Device count {len(devices)} not divisible by fixed mesh "
                f"axes product {known}"
            )
        sizes = [len(devices) // known if s == -1 else s for s in sizes]
    elif known != len(devices):
        raise ValueError(
            f"Mesh sizes {sizes} (product {known}) != device count {len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        return mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
        # CPU-backed fake meshes (tests) reject create_device_mesh; fall back.
        return np.array(devices).reshape(sizes)


def create_mesh(
    *,
    data: int = 1,
    fsdp: int = -1,
    expert: int = 1,
    tensor: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the framework's standard 5-axis mesh.

    Default: all devices on the ``fsdp`` axis (pure FSDP), which is the right
    starting point on a v5e-8 slice for the model sizes in configs/.
    """
    device_array = create_device_mesh(
        data=data, fsdp=fsdp, expert=expert, tensor=tensor, seq=seq, devices=devices
    )
    return Mesh(device_array, MESH_AXES)


def logical_to_mesh_spec(
    logical_axes: Sequence[Optional[str]],
    rules: Optional[Sequence[Tuple[str, Optional[Sequence[str]]]]] = None,
    mesh: Optional[Mesh] = None,
) -> PartitionSpec:
    """Resolve a tuple of logical axis names to a PartitionSpec.

    A rule whose mesh axis does not exist in ``mesh`` (or has size 1) resolves
    to None (replicated) so code is portable across mesh shapes.
    """
    rules = rules or DEFAULT_LOGICAL_AXIS_RULES
    table = dict(rules)
    used: set = set()
    spec = []
    for name in logical_axes:
        if name is None:
            spec.append(None)
            continue
        target = table.get(name)
        if target is None:
            spec.append(None)
            continue
        if isinstance(target, str):
            target = (target,)
        chosen = []
        for axis in target:
            if axis in used:
                continue
            if mesh is not None and mesh.shape.get(axis, 1) == 1:
                continue
            chosen.append(axis)
            used.add(axis)
        if not chosen:
            spec.append(None)
        elif len(chosen) == 1:
            spec.append(chosen[0])
        else:
            spec.append(tuple(chosen))
    return PartitionSpec(*spec)


def ambient_mesh() -> Optional[Mesh]:
    """The Mesh of the enclosing ``with mesh:`` context, or None.

    Lets model code route through shard_map-based ops (ring/Ulysses
    attention) only when actually running under a mesh with the relevant
    axis — the identical model code stays single-chip-portable."""
    try:
        from jax._src import mesh as _mesh_lib

        m = _mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - private-API move
        try:
            from jax.interpreters import pxla

            m = pxla.thread_resources.env.physical_mesh
        except Exception:
            return None
    if m is not None and not m.empty:
        return m
    return None


def with_logical_constraint(x, logical_axes: Sequence[Optional[str]]):
    """Apply a logical sharding constraint to an activation inside jit.

    No-op when called outside a ``flax.linen.logical_axis_rules`` /
    mesh context, so single-chip code paths need no special casing.
    """
    try:
        return nn.with_logical_constraint(x, tuple(logical_axes))
    except Exception:
        return x


def named_sharding(mesh: Mesh, *logical_axes: Optional[str]) -> NamedSharding:
    """NamedSharding for data arrays, resolved via the default rules."""
    return NamedSharding(mesh, logical_to_mesh_spec(logical_axes, mesh=mesh))
