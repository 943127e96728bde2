"""Benchmark: ICP Gauss-Newton inner-iteration throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures full inner LM iterations (H,b accumulation over M=1M symmetric
point-to-plane correspondences + cost eval + host solve) per second on the
default JAX device. ``vs_baseline`` compares against a vectorized NumPy CPU
implementation of the same math measured in-process (a stand-in for the
reference's single-node CPU loop, ``icp_point_to_plane_impl.h:115-293``,
until the C++ reference numbers are measured on shared data).
"""

import json
import time

import numpy as np


def _problem(m, num_clouds=2, seed=0):
    rng = np.random.RandomState(seed)
    ps = rng.randn(m, 3).astype(np.float32)
    ns = rng.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * rng.randn(m, 3).astype(np.float32)
    nt = ns.copy()
    sid = rng.randint(0, num_clouds, m).astype(np.int32)
    tid = ((sid + 1) % num_clouds).astype(np.int32)
    w = np.ones(m, np.float32)
    return ps, ns, pt, nt, sid, tid, w


def bench_numpy_cpu(m=200_000, iters=3):
    C = 2
    ps, ns, pt, nt, sid, tid, w = _problem(m)
    q = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (C, 1))
    t = np.zeros((C, 3), np.float32)

    def one_iter():
        # identity poses: global = local
        diff = pt - ps
        r1 = np.sum(ns * diff, -1)
        r2 = -np.sum(nt * diff, -1)
        j1 = np.concatenate([ns, np.cross(pt, ns)], -1)
        j2 = np.concatenate([nt, np.cross(ps, nt)], -1)
        oh_s = np.eye(C, dtype=np.float32)[sid]
        oh_t = np.eye(C, dtype=np.float32)[tid]
        rows1 = ((oh_t - oh_s)[:, :, None] * j1[:, None, :]).reshape(m, 6 * C)
        rows2 = ((oh_s - oh_t)[:, :, None] * j2[:, None, :]).reshape(m, 6 * C)
        rows = np.concatenate([rows1, rows2], 0)
        r = np.concatenate([r1, r2], 0)
        H = rows.T @ rows
        b = rows.T @ r
        x = np.linalg.solve(H[6:, 6:] + 0.1 * np.eye(6 * (C - 1)), b[6:])
        cost = float(r @ r)
        return x, cost

    one_iter()
    t0 = time.time()
    for _ in range(iters):
        one_iter()
    dt = (time.time() - t0) / iters
    return m / dt  # correspondences per second (one full iteration)


def bench_tpu(m=1_000_000, iters=20):
    """Fused Gauss-Newton ICP iteration: Pallas H,b,cost accumulation +
    on-device damped solve + pose update, sequentially dependent (each
    iteration consumes the previous poses). Uses the fully fused kernel
    (pose transform + Jacobians in-kernel); the packed correspondence
    tensor is pose-independent and packed once, as in real ICP inner
    iterations."""
    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_hb_cost_pallas_fused,
        pack_icp_inputs,
    )

    C = 2
    ps, ns, pt, nt, sid, tid, w = (jnp.asarray(x) for x in _problem(m))
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (C, 1))
    t = jnp.zeros((C, 3), jnp.float32)
    data = pack_icp_inputs(ps, ns, pt, nt, w)

    def gn_step(carry, _):
        q, t = carry
        H, b, cost = icp_hb_cost_pallas_fused(q, t, data, sid, tid, C,
                                              chunk=16384)
        n_var = 6 * (C - 1)
        Hv = H[6:, 6:] + 0.1 * jnp.eye(n_var, dtype=jnp.float32)
        x = jnp.linalg.solve(Hv, b[6:])
        delta = jnp.concatenate([jnp.zeros(6), -x]).reshape(C, 6)
        upd = SE3.exp(delta).compose(SE3(q, t))
        return (upd.q, upd.t), cost

    @jax.jit
    def run_iters(q, t):
        # sequentially dependent chain of full GN iterations, one dispatch
        # (the real inner LM loop is exactly such a chain)
        (qf, tf), costs = jax.lax.scan(gn_step, (q, t), None, length=iters)
        return qf, tf, costs

    q1, t1, c = run_iters(q, t)
    jax.block_until_ready(q1)  # compile
    t0 = time.time()
    q1, t1, c = run_iters(q, t)
    jax.block_until_ready(q1)
    dt = (time.time() - t0) / iters
    return m / dt


def main():
    tpu_corr_per_s = bench_tpu()
    cpu_corr_per_s = bench_numpy_cpu()
    result = {
        "metric": "icp_gn_correspondences_per_s",
        "value": round(tpu_corr_per_s, 1),
        "unit": "corr/s (full fused GN iteration on 1M correspondences)",
        "vs_baseline": round(tpu_corr_per_s / cpu_corr_per_s, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
