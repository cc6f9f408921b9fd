"""Multi-host (DCN) initialization and mesh construction.

SURVEY §7.7's scale-out obligation: single-host GSPMD is proven by the
sharded multibook (`multibook.py`); this module adds the multi-process
story — `jax.distributed` runtime init plus a mesh builder that lays the
book axis out so collectives ride ICI within a slice and only the final
O(N + N²) delta/gamma psum crosses DCN.

Design (scaling-book recipe): the book's ROWS are the only large axis,
so shard rows over every device; replicate quotes, curve params and the
aggregate. Within a slice the per-trade scatter-add reduces over ICI;
across slices only the [S, N] delta and [S, N, N] gamma reductions touch
DCN — at N=168, ~220 KB per scenario, negligible against any DCN link.
There is NO pipeline/tensor split to place: the curve graph is a few
hundred KB of f64 and recomputes per device faster than it could be
communicated.

Usage (one process per host, e.g. under SLURM/GKE):

    from adrates_tpu.parallel import distributed as dist
    dist.init_distributed()              # env-driven; no-op single-host
    mesh = dist.book_mesh()              # 1-D ("book",) or 2-D
                                         # ("dcn", "book") across slices
    fn = make_sharded_multibook_fn(mb, mesh,
                                   axis=("dcn", "book") if "dcn" in
                                   mesh.axis_names else "book")

The CPU-mesh dryrun (`__graft_entry__.dryrun_multichip`) exercises both
mesh shapes without hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime for multi-host meshes.

    Arguments default to jax.distributed's own environment/cluster
    auto-detection (SLURM, GKE, Cloud TPU metadata). Returns True when a
    multi-process runtime is active after the call. Safe to call when
    single-process (no-op) or already initialized (idempotent)."""
    import jax

    already = getattr(jax.distributed.global_state, "client", None)
    if already is not None:
        return jax.process_count() > 1

    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    auto_env = any(os.environ.get(v) for v in (
        "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not auto_env:
        return False          # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def book_mesh(book_axis: str = "book", dcn_axis: str = "dcn",
              devices=None):
    """A mesh for row-sharded books.

    Single slice/process: 1-D ``(book,)`` over all devices. Multiple
    slices or processes: 2-D ``(dcn, book)`` via
    ``mesh_utils.create_hybrid_device_mesh`` so the ``book`` axis maps
    onto ICI-connected chips and ``dcn`` onto the slice/process axis —
    row shards never straddle a DCN hop."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)

    # number of DCN-separated groups: distinct slice indices if the
    # platform reports them, else the process count
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    n_groups = len(slice_ids) if slice_ids != {None} \
        else jax.process_count()

    if n_groups <= 1:
        return Mesh(np.asarray(devices), (book_axis,))

    per_group = n // n_groups
    mesh_devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, per_group),
        dcn_mesh_shape=(n_groups, 1),
        devices=devices)
    return Mesh(mesh_devices, (dcn_axis, book_axis))
