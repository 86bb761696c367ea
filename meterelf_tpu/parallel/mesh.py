"""Multi-chip scaling: SPMD data parallelism over a 1-D device mesh.

The reference has no parallelism at all (SURVEY.md §2c) — one process,
one image at a time. The TPU-native scaling model for this workload is
pure data parallelism: per-image decode has zero cross-image
communication, so the batch dim is sharded over the mesh with
`jax.sharding` + jit, and collectives are only needed for aggregate
metrics (psum over ICI). TP/PP/SP/EP are deliberately NOT implemented:
there is no model to shard — documenting that is part of the design.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def data_parallel_decoder(decoder, mesh: Mesh, axis: str = "data"):
    """Wrap a MeterDecoder so batches are sharded over the mesh's data
    axis. Batch size must be divisible by the mesh size. Results come
    back with the same batch-dim sharding (host gathers lazily)."""
    from ..pipeline.decode import _decode_batch
    import functools

    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    prec = "pallas" if mesh.devices.flat[0].platform == "tpu" else "matmul"
    # reuse the decoder's full static configuration (fused-frontend
    # window origins, static color-sample centers, stats bounding box)
    # so each shard runs the same fast path as the single-chip graph,
    # overriding only the correlation impl for the mesh's platform
    static_kwargs = dict(
        getattr(decoder, "_static_kwargs", None)
        or {"sum_dtype": jax.numpy.float64})
    static_kwargs["conv_precision"] = prec
    fn = jax.jit(
        functools.partial(_decode_batch, **static_kwargs),
        in_shardings=(replicated, batch_sharding, batch_sharding),
        out_shardings=batch_sharding,
    )

    def run(crops_u8, load_ok=None):
        if load_ok is None:
            load_ok = np.ones(crops_u8.shape[0], bool)
        assert crops_u8.shape[0] % mesh.size == 0, (
            f"batch {crops_u8.shape[0]} not divisible by mesh size {mesh.size}")
        return fn(decoder.param_arrays, crops_u8, load_ok)

    return run


def aggregate_metrics(values, err, mesh: Mesh, axis: str = "data"):
    """Cross-chip aggregate statistics via psum-class collectives:
    (n_ok, n_err, mean value over ok) — the multi-host metric-reduction
    path for streaming deployments."""
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    @functools_partial_shard(mesh, axis)
    def agg(v, e):
        ok = (e == 0)
        n_ok = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis)
        n_err = jax.lax.psum(jnp.sum((~ok).astype(jnp.int32)), axis)
        s = jax.lax.psum(jnp.sum(jnp.where(ok, v, 0.0)), axis)
        return n_ok, n_err, s / jnp.maximum(n_ok, 1)

    return agg(values, err)


def functools_partial_shard(mesh: Mesh, axis: str):
    """shard_map decorator with batch-dim sharding on inputs and
    replicated outputs."""
    from jax.experimental.shard_map import shard_map

    def deco(f):
        return shard_map(
            f, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(), P(), P()),
        )

    return deco
