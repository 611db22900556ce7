"""Multi-chip Monte-Carlo: frames sharded over a device mesh.

The reference scales out by forking one OS process per SNR point
(``/root/reference/start.sh:18-22``) with no inter-process communication.
The TPU-native replacement (SURVEY.md §2.5): frames are i.i.d., so the frame
axis shards perfectly over a ``jax.sharding.Mesh``; per-batch error counters
are reduced with ``psum`` over ICI and only five scalars ever reach the host,
where the stop-at-K-errors rule runs.  Multi-host slices just extend the
mesh — same program, DCN-aware collectives courtesy of XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.code import NBCode
from ..sim.mc import SimConfig, make_batch_step


def _to_varying(x, axis_names):
    """Mark a replicated value as varying over mesh axes (pcast in jax
    >= 0.9, pvary before)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_names, to="varying")
    return jax.lax.pvary(x, axis_names)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D frame-sharding mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} {devices[0].platform} device(s) are "
                    "visible (for a virtual CPU mesh set XLA_FLAGS="
                    f"--xla_force_host_platform_device_count={n_devices} "
                    "AND jax.config.update('jax_platforms','cpu') before "
                    "first jax use)"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("frames",))


def make_mesh_2d(hosts: int, chips_per_host: int, devices=None) -> Mesh:
    """(hosts, chips) mesh for multi-host slices.

    Frames shard over both axes; laying hosts on the outer axis keeps the
    per-host psum partial reductions on ICI, with only the final
    host-count-sized reduction crossing DCN (the all-reduce XLA emits for a
    2-D psum is hierarchical on TPU meshes).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: hosts * chips_per_host]).reshape(
        hosts, chips_per_host
    )
    return Mesh(devices, axis_names=("dcn", "ici"))


def _shardable(cfg: SimConfig) -> SimConfig:
    """Rewrite a decoder config into its jittable device-loop equivalent.

    ``loop="host"`` and the legacy ``storage="compressed"``+``cn_impl=
    "topk"`` stepper are host-control-flow conveniences for the tunneled
    single-chip device; under ``shard_map`` the same decode runs as a
    ``while_loop`` (``decode_layered`` / ``decode_layered_list``) with
    identical semantics, so sharding just switches the loop style.

    The rewrite is announced with a UserWarning: the replacement paths are
    argued-equivalent but not bit-identical (e.g. the legacy topk stepper
    computes f32 top_k where the list CN uses bf16 packed-key sorts), so a
    user A/B-ing "the same config" sharded vs not should know the decoder
    implementation changed underneath.
    """
    import dataclasses
    import warnings

    d = cfg.decoder
    repl = {}
    if d.loop == "host":
        repl["loop"] = "device"
    if d.storage == "compressed" and d.cn_impl == "topk":
        repl["cn_impl"] = "auto"   # list path: the shardable compressed CN
    if repl:
        warnings.warn(
            f"sharded execution rewrote decoder config {repl} (host control "
            "flow cannot live under shard_map); semantics are equivalent "
            "but numerics may differ slightly from the unsharded run",
            stacklevel=3,
        )
        cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(d, **repl))
    return cfg


def sharded_batch_step_2d(code: NBCode, cfg: SimConfig, mesh: Mesh):
    """Counters psum-reduced hierarchically over ('dcn', 'ici').

    Returned step signature: ``(key, ebn0_db) -> counters [5]`` — Eb/N0 is
    a traced argument, so one compile serves a whole SNR sweep.
    """
    step, enc = make_batch_step(code, _shardable(cfg))
    pmat = jax.device_put(step.pmat)

    def device_step(key, ebn0):
        h = jax.lax.axis_index("dcn")
        c = jax.lax.axis_index("ici")
        idx = h * jax.lax.axis_size("ici") + c
        counters, _ = step(jax.random.fold_in(key, idx), ebn0, pmat)
        counters = jax.lax.psum(counters, axis_name="ici")
        tot = jax.lax.psum(counters, axis_name="dcn")
        return _to_varying(tot, ("dcn", "ici"))[None, None]

    fn = jax.shard_map(
        device_step, mesh=mesh, in_specs=(P(), P()),
        out_specs=P("dcn", "ici"),
    )
    jitted = jax.jit(fn)

    def run_step(key, ebn0=None):
        e = jnp.float32(cfg.ebn0_db if ebn0 is None else ebn0)
        return jitted(key, e)[0, 0]

    run_step.encoder = enc
    return run_step


def sharded_batch_step(code: NBCode, cfg: SimConfig, mesh: Mesh):
    """Build a jitted step: (key, ebn0_db) -> global counters [5].

    ``cfg.frames_per_batch`` is the *per-device* batch; each device draws an
    independent PRNG stream by folding in its mesh position.  Eb/N0 is a
    traced argument (one compile per code/config across a whole sweep,
    matching the single-device path, sim.mc.MonteCarlo).
    """
    step, enc = make_batch_step(code, _shardable(cfg))
    n_dev = mesh.devices.size
    pmat = jax.device_put(step.pmat)

    def device_step(key, ebn0):
        # distinct stream per mesh position
        idx = jax.lax.axis_index("frames")
        counters, _ = step(jax.random.fold_in(key, idx), ebn0, pmat)
        # psum makes every device hold the global totals; the varying cast
        # lets the replicated result be returned as stacked per-device rows
        # under full vma checking (check_vma=False was observed to
        # intermittently DROP the psum on the virtual CPU mesh — silent
        # wrong counters)
        tot = jax.lax.psum(counters, axis_name="frames")
        return _to_varying(tot, ("frames",))[None]

    fn = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P()),   # same key everywhere; fold_in differentiates
        out_specs=P("frames"),
    )
    jitted = jax.jit(fn)

    def run_step(key, ebn0=None):
        e = jnp.float32(cfg.ebn0_db if ebn0 is None else ebn0)
        return jitted(key, e)[0]

    run_step.n_devices = n_dev
    run_step.encoder = enc
    return run_step


def run_sharded(code: NBCode, cfg: SimConfig, mesh: Mesh,
                verbose: bool = False, step=None):
    """Monte-Carlo loop over the mesh; mirrors sim.mc.MonteCarlo.run.

    Pass a prebuilt ``step`` (from :func:`sharded_batch_step`) to reuse one
    compile across the SNR points of a sweep — Eb/N0 is traced.
    """
    import time

    from ..sim.mc import SimResult

    if step is None:
        step = sharded_batch_step(code, cfg, mesh)
    totals = np.zeros(5, dtype=np.int64)
    key = jax.random.PRNGKey(cfg.seed)
    ebn0 = jnp.float32(cfg.ebn0_db)
    t0 = time.perf_counter()
    b = 0
    while totals[0] < cfg.max_frames and totals[1] < cfg.stop_errors:
        counters = step(jax.random.fold_in(key, b), ebn0)
        totals += np.asarray(counters, dtype=np.int64)
        b += 1
        if verbose:
            print(f"\rFER={totals[1]}/{totals[0]}", end="", flush=True)
    elapsed = time.perf_counter() - t0
    if verbose:
        print()
    return SimResult(
        frames=int(totals[0]), frame_errors=int(totals[1]),
        bit_errors=int(totals[2]), undetected_errors=int(totals[3]),
        iter_sum=int(totals[4]), elapsed_s=elapsed, config=cfg,
        code_name=code.name, n=code.n, k=code.k, logq=code.logq,
    )
