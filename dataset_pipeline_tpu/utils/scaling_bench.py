"""Collective-share measurement of the sharded paths on the virtual mesh.

BASELINE.md's >=80%-at-N>=2-hosts north star cannot be measured on real
multi-host hardware in this environment (one chip, no DCN/ICI). Two things
CAN be measured on the 8-virtual-CPU-device mesh:

1. The COLLECTIVE SHARE of each sharded step: the same shard_map'ed
   computation with its psum vs with the psum removed, at fixed device
   count — (t_with - t_without)/t_with. Core contention hits both arms
   equally, so the difference isolates the collective.
2. The psum PAYLOAD sizes the designs ship per step (the quantity ICI/DCN
   bandwidth actually sees): O(42^2) for the moment Gram, O(1) scalars
   for the photometric H,b (per-image blocks never cross devices),
   O((n_keep+1)^2) for the joint-BA Schur reduction.

A weak-scaling table over 1/2/4/8 virtual devices is NOT reported: the
virtual devices time-share the same physical cores, so step time grows
~linearly with device count by construction and the table would measure
host core contention, not the framework.

Run in a fresh interpreter:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m dataset_pipeline_tpu.utils.scaling_bench
Prints one JSON object.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timed(fn, warm_args, rep_args, reps=5):
    import jax

    jax.block_until_ready(fn(*warm_args))
    t0 = time.time()
    for i in range(reps):
        out = fn(*rep_args(i))
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def _moment_share(mesh, m_per_device=500_000, reps=5):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dataset_pipeline_tpu.icp.moments import moment_gram_xla

    axis = mesh.axis_names[0]
    nd = int(mesh.devices.size)
    m = m_per_device * nd
    rng = np.random.RandomState(0)
    sh = NamedSharding(mesh, P(axis))
    arrs = [jax.device_put(jnp.asarray(rng.randn(m, 3).astype(np.float32)),
                           sh) for _ in range(4)]
    w = jax.device_put(jnp.ones((m,), jnp.float32), sh)

    def local_psum(ps, ns, pt, nt, w):
        return jax.lax.psum(moment_gram_xla(ps, ns, pt, nt, w), axis)

    def local_nopsum(ps, ns, pt, nt, w):
        return moment_gram_xla(ps, ns, pt, nt, w)

    specs = (P(axis),) * 5
    with_f = jax.jit(jax.shard_map(local_psum, mesh=mesh, in_specs=specs,
                                   out_specs=P()))
    wo_f = jax.jit(jax.shard_map(local_nopsum, mesh=mesh, in_specs=specs,
                                 out_specs=P(axis)))

    def args(i):
        return (arrs[0] + 1e-6 * (i + 1), arrs[1], arrs[2], arrs[3], w)

    t_with = _timed(with_f, args(99), args, reps)
    t_wo = _timed(wo_f, args(98), args, reps)
    return t_with, t_wo, 42 * 42 * 4


def _joint_schur_share(mesh, rows_per_device=200_000, n_keep=100, reps=5):
    """The joint-BA Schur reduction pattern: each device forms its local
    damped (n_keep+1, n_keep+1) reduced block from its rows; ONE psum
    replicates it (parallel/joint_ba.py). A/B with the psum removed."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = int(mesh.devices.size)
    m = rows_per_device * nd
    rng = np.random.RandomState(1)
    sh = NamedSharding(mesh, P(axis))
    rows = jax.device_put(
        jnp.asarray(rng.randn(m, n_keep + 1).astype(np.float32)), sh)

    def local(rows, eps):
        G = jax.lax.dot_general(
            rows + eps, rows + eps, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return jax.lax.psum(G, axis)

    def local_no(rows, eps):
        return jax.lax.dot_general(
            rows + eps, rows + eps, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    with_f = jax.jit(jax.shard_map(local, mesh=mesh,
                                   in_specs=(P(axis), P()), out_specs=P()))
    wo_f = jax.jit(jax.shard_map(local_no, mesh=mesh,
                                 in_specs=(P(axis), P()),
                                 out_specs=P(axis)))

    def args(i):
        return (rows, jnp.float32(1e-6 * (i + 1)))

    t_with = _timed(with_f, args(99), args, reps)
    t_wo = _timed(wo_f, args(98), args, reps)
    return t_with, t_wo, (n_keep + 1) ** 2 * 4


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    from jax.sharding import Mesh

    out = {"devices": len(devs), "method": "psum-vs-no-psum A/B at fixed "
           "device count (isolates the collective from virtual-device core "
           "contention)"}
    for nd in (2, 8):
        if nd > len(devs):
            continue
        mesh = Mesh(np.asarray(devs[:nd]), ("data",))
        blk = {}
        for name, fn in (("moment_gram", _moment_share),
                         ("joint_schur", _joint_schur_share)):
            t_with, t_wo, payload = fn(mesh)
            blk[name] = {
                "step_s": round(t_with, 4),
                "no_collective_s": round(t_wo, 4),
                "collective_share": round(
                    max(0.0, (t_with - t_wo) / t_with), 4),
                "psum_payload_bytes": payload,
            }
        out[f"nd{nd}"] = blk
    print(json.dumps(out))


if __name__ == "__main__":
    main()
