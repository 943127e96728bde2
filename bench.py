"""Benchmark matrix on one chip. Prints ONE JSON line.

Headline metric: ICP inner-LM throughput (correspondences x iterations / s)
using the moment-matrix formulation (``icp/moments.py``): ONE Pallas pass
accumulates the 48x48 monomial Gram per correspondence group, after which
every LM iteration (H, b, cost included) is O(1) host f64 math.  This is the
schedule the real engine runs per outer ICP iteration
(``/root/reference/src/icp/icp_point_to_plane_impl.h:217-291`` re-accumulates
per lambda trial; here the accumulation happens once).

``vs_baseline`` compares against the MEASURED C++ reference inner loop
(``native/ref_icp_loop.cc`` — the reference's own accumulation math under
its own -O2 -msse2 -msse3 flags, single-threaded like the original)
re-accumulating all rows per iteration as ``impl.h:217-291`` does; the
NumPy stand-in remains only as a fallback when no compiler is available
(flagged by ``baseline_kind``).

Round-5 timing discipline: the schedule headline is ADDITIVE (measured
moment pass at R=65 repeat-delta, median of 5 estimates with min/max, plus
20 x the scan-length-differenced O(1) LM step); ``hbm_copy_gbps`` is a
pure-HBM-copy kernel under the same harness that validates the
repeat-delta methodology against a known-bandwidth op; utilization is
reported UNCLIPPED; C++ baselines are medians of 3 (the single-core rates
swing ~2x with host load).

Additional metrics (the BASELINE.md matrix), reported in the "metrics" dict:
  photometric_hb_obs_per_s   — batched photometric H,b accumulation
                               (``photometric/optimizer.py:_hb_batch``,
                               brick row-gather sampler)
  registrator_dslr_*         — the full engine at DSLR production scale
                               + ref_cpp_photo_obs_per_s (median C++ core)
  cubemap_2048_faces_per_s   — 2048^2 cube-map faces/s e2e on a 10M-point
                               scan, split into cubemap_device_faces_per_s
                               (repeat-delta device time) and the packed
                               5 B/px wire metrics; *_vs_ref against the
                               measured C++ face loop (ref_render_loops.cc)
  gt_depth_frames_per_s      — occlusion splat render + min-z GT depth per
                               frame, 4M points at 3072x2048, + gt_depth_vs_ref
  registrator_e2e_s          — end-to-end two-frame ImageRegistrator
                               optimization (10 LM iterations/scale, 2 scales)
  icp_moment_pass_gbps       — effective HBM bandwidth of the moment kernel
                               (median + min/max) + unclipped hbm_util_pct
  gather_*                   — the measured per-gathered-item cost model
                               (scalar vs 128-lane-row regimes)
  icp_engine_*               — moment-vs-direct engine A/B incl. 28M corr
                               (relay-RTT-dominated; high run-to-run
                               variance — see BASELINE.md)
  scaling                    — psum-vs-no-psum collective share on the
                               8-virtual-device mesh + payload bytes
  joint_ba_*                 — multi-scene Schur BA step at >=2M rows
"""

import json
import math
import time

import numpy as np

ICP_M = 8_000_000
ICP_ITERS = 20

HBM_PEAK_GBPS = {
    # device_kind substring -> peak HBM GB/s
    "v6": 1640.0,
    "v5p": 2765.0,
    "v5e": 819.0,
    "v5": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
}

F32_MXU_PEAK_TFLOPS = {
    # f32 matmul peak = bf16 peak / 3 (the MXU's bf16_3x emulation);
    # v5e bf16 394 TFLOP/s -> 131. Empirically confirmed: the tri moment
    # kernel's compute-only pass issues ~118 TFLOP/s (repeat-delta harness)
    "v6": 306.0,
    "v5p": 153.0,
    "v5e": 131.3,
    "v5": 131.3,
    "v4": 91.7,
}


def _icp_problem(m, seed=0):
    """Two correspondence groups (pair 0->1 and 1->0), as real ICP emits."""
    rng = np.random.RandomState(seed)
    half = m // 2
    groups = []
    for _ in range(2):
        ps = rng.randn(half, 3).astype(np.float32)
        ns = rng.randn(half, 3).astype(np.float32)
        ns /= np.linalg.norm(ns, axis=1, keepdims=True)
        pt = ps + 0.01 * rng.randn(half, 3).astype(np.float32)
        nt = ns.copy()
        groups.append({"ps": ps, "ns": ns, "pt": pt, "nt": nt,
                       "w": np.ones(half, np.float32)})
    pairs = [(0, 1), (1, 0)]
    return groups, pairs


def bench_numpy_cpu_schedule(m=200_000, iters=3):
    """Reference-style per-iteration row accumulation, time per iteration."""
    C = 2
    rng = np.random.RandomState(0)
    ps = rng.randn(m, 3).astype(np.float32)
    ns = rng.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * rng.randn(m, 3).astype(np.float32)
    nt = ns.copy()
    sid = rng.randint(0, C, m).astype(np.int32)
    tid = ((sid + 1) % C).astype(np.int32)

    def one_iter():
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
    per_iter = (time.time() - t0) / iters
    return m / per_iter  # corr*iters/s for the per-iteration scheme


def bench_hbm_copy_roofline(mp=8_388_608, R=65, chunk=131_072):
    """Pure HBM READ kernel under the SAME repeat-delta harness as the
    moment pass — validates the harness against a known-bandwidth op
    (VERDICT r4 weak #2: a slope that reads above the chip's stated peak
    means the harness, not the chip). Returns measured GB/s."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    data2 = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, mp).astype(np.float32))

    @partial(jax.jit, static_argnames=("repeats",))
    def timed(d2, repeats: int):
        def body(in_ref, out_ref):
            r = pl.program_id(1)

            @pl.when((pl.program_id(0) == 0) & (r == 0))
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += jnp.sum(in_ref[0], axis=1, keepdims=True)

        return pl.pallas_call(
            body,
            grid=(mp // chunk, repeats),
            in_specs=[pl.BlockSpec((1, 8, chunk), lambda i, r: (r % 2, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 1), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        )(d2)

    def t_of(repeats):
        out = timed(data2, repeats)
        float(np.asarray(out[0, 0]))
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            out = timed(data2, repeats)
            float(np.asarray(out[0, 0]))
            best = min(best, time.time() - t0)
        return best

    dt = max((t_of(R) - t_of(1)) / (R - 1), 1e-9)
    return 8 * mp * 4 / dt / 1e9


def bench_icp_moments(m=ICP_M, iters=ICP_ITERS, reps=5, n_est=5, R=65):
    """ICP headline measurements with uncertainty (VERDICT r4 weak #2).

    The schedule metric is ADDITIVE BY CONSTRUCTION: one moment pass
    (measured alone by the alternating-buffer repeat-delta kernel at R=65,
    median over ``n_est`` independent estimates) + ``iters`` O(1) LM steps
    (measured by scan-length differencing with a carry-dependent state, so
    XLA cannot hoist anything). Round 4's combined-scan metric let XLA
    hoist the loop-invariant moment pass out of the repeat scan, which is
    where the 84G-vs-122G run-to-run spread came from.
    """
    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.icp.moments import (
        hb_cost_from_moments_jax,
        pack_group_data,
    )
    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_moment_pallas_tri_sub,
        icp_moment_pallas_tri_sub_timed,
        moment_tri_extract,
    )

    groups, pairs = _icp_problem(m)
    chunk, sub = 49152, 8192
    data_np, chunk_gid = pack_group_data(groups, chunk)
    data = jnp.asarray(data_np)
    gid = jnp.asarray(chunk_gid)
    C = 2
    q0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (C, 1))
    t0_ = jnp.zeros((C, 3), jnp.float32)

    @jax.jit
    def schedule(data, q, t):
        parts = icp_moment_pallas_tri_sub(data, chunk=chunk, sub=sub)
        parts = moment_tri_extract(parts)
        P = jnp.zeros((len(groups), 42, 42), jnp.float32).at[gid].add(parts)

        def step(carry, _):
            q, t = carry
            H, b, cost = hb_cost_from_moments_jax(P, pairs, q, t, C)
            x = jnp.linalg.solve(H[6:, 6:] + 0.1 * jnp.eye(6), b[6:])
            delta = jnp.concatenate([jnp.zeros(6), -x]).reshape(C, 6)
            upd = SE3.exp(delta.astype(jnp.float32)).compose(SE3(q, t))
            return (upd.q, upd.t), cost

        (qf, tf), costs = jax.lax.scan(step, (q, t), None, length=iters)
        return qf, tf, costs

    qf, tf, costs = schedule(data, q0, t0_)
    jax.block_until_ready(qf)
    assert bool(jnp.all(jnp.isfinite(costs)))

    # relay dispatch floor (environment artifact, reported separately)
    rngr = np.random.RandomState(2)
    t0s = [jnp.asarray(1e-5 * rngr.randn(C, 3), jnp.float32)
           for _ in range(reps)]
    t0 = time.time()
    outs = [schedule(data, q0, t_) for t_ in t0s]
    float(np.asarray(outs[-1][0][0, 0]))
    dt_disp = (time.time() - t0) / reps

    # (a) moment pass DEVICE time: n_est INDEPENDENT repeat-delta
    # estimates at R=65 (the r4 R=9 delta was ~5 ms of signal on ~190 ms
    # of relay jitter — under-resolved), reported as median + range
    data2 = jnp.stack([data, data])

    def timed(repeats):
        out = icp_moment_pallas_tri_sub_timed(
            data2, chunk=chunk, sub=sub, repeats=repeats)
        float(np.asarray(out[0, 0, 0]))
        t0 = time.time()
        out = icp_moment_pallas_tri_sub_timed(
            data2, chunk=chunk, sub=sub, repeats=repeats)
        float(np.asarray(out[0, 0, 0]))
        return time.time() - t0

    timed(1)
    timed(R)  # compile both
    passes = []
    for _ in range(n_est):
        passes.append(max((timed(R) - timed(1)) / (R - 1), 1e-9))
    pass_med = float(np.median(passes))
    pass_min, pass_max = float(np.min(passes)), float(np.max(passes))

    # (b) LM step time: scan-length differencing, carry-dependent state
    P_fixed = jnp.zeros((len(groups), 42, 42), jnp.float32).at[gid].add(
        moment_tri_extract(icp_moment_pallas_tri_sub(
            data, chunk=chunk, sub=sub)))

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("length",))
    def lm_only(P, q, t, length: int):
        def step(carry, _):
            q, t = carry
            H, b, cost = hb_cost_from_moments_jax(P, pairs, q, t, C)
            x = jnp.linalg.solve(H[6:, 6:] + 0.1 * jnp.eye(6), b[6:])
            delta = jnp.concatenate([jnp.zeros(6), -x]).reshape(C, 6)
            upd = SE3.exp(delta.astype(jnp.float32)).compose(SE3(q, t))
            return (upd.q, upd.t), cost

        (qf, tf), costs = jax.lax.scan(step, (q, t), None, length=length)
        return qf, costs

    L1, L2 = iters, iters + 200

    def lm_t(length):
        qf, _ = lm_only(P_fixed, q0, t0_, length)
        float(np.asarray(qf[0, 0]))
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            qf, _ = lm_only(P_fixed, q0, t0_ + 1e-7, length)
            float(np.asarray(qf[0, 0]))
            best = min(best, time.time() - t0)
        return best

    lm_step_s = max((lm_t(L2) - lm_t(L1)) / (L2 - L1), 1e-12)

    schedule_s = pass_med + iters * lm_step_s
    out = {
        "icp_moment_pass_s": round(pass_med, 6),
        "icp_moment_pass_s_min": round(pass_min, 6),
        "icp_moment_pass_s_max": round(pass_max, 6),
        "icp_moment_pass_bytes": int(data_np.nbytes),
        "icp_lm_step_s": round(lm_step_s, 9),
        "icp_schedule_s": round(schedule_s, 6),
        "icp_schedule_dispatch_s": round(dt_disp, 5),
        "icp_gn_corr_iters_per_s": round(m * iters / schedule_s, 1),
        "icp_gn_corr_iters_per_s_min": round(
            m * iters / (pass_max + iters * lm_step_s), 1),
        "icp_gn_corr_iters_per_s_max": round(
            m * iters / (pass_min + iters * lm_step_s), 1),
        "icp_moment_accum_corr_per_s": round(m / pass_med, 1),
        "icp_moment_pass_gbps": round(data_np.nbytes / pass_med / 1e9, 2),
        "icp_moment_pass_gbps_min": round(
            data_np.nbytes / pass_max / 1e9, 2),
        "icp_moment_pass_gbps_max": round(
            data_np.nbytes / pass_min / 1e9, 2),
    }
    try:
        out["hbm_copy_gbps"] = round(bench_hbm_copy_roofline(), 1)
    except Exception as e:  # pragma: no cover
        out["hbm_copy_error"] = repr(e)[:120]
    return out


def bench_photometric_hb(nb=8, n_points=262_144, K=5, L=4, W=1024, H=768,
                         reps=5):
    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.photometric.optimizer import _hb_batch

    rng = np.random.RandomState(0)
    f, cx, cy = 900.0, (W - 1) / 2.0, (H - 1) / 2.0
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])
    params = jnp.asarray(cam.params)

    u = rng.uniform(32, W - 32, n_points)
    v = rng.uniform(32, H - 32, n_points)
    z = rng.uniform(2.0, 5.0, n_points)
    pts = np.stack([(u - cx) / f * z, (v - cy) / f * z, z], -1).astype(np.float32)
    nbr = rng.randint(0, n_points, (n_points, K)).astype(np.int32)
    desc = np.zeros((n_points, K), np.float32)
    pyr = []
    for s in range(L):
        hs, ws = max(1, round(H * 2.0 ** -s)), max(1, round(W * 2.0 ** -s))
        pyr.append(jnp.asarray(
            rng.uniform(10, 200, (nb, hs, ws)).astype(np.float32)))
    obs_scale = jnp.asarray(
        rng.uniform(0.1, L - 2.1, (nb, n_points)).astype(np.float32))
    contrib = jnp.ones((nb, n_points), bool)
    pose_q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (nb, 1))
    pose_t = jnp.tile(jnp.asarray([0.0, 0, 0], jnp.float32), (nb, 1))

    pts_j, nbr_j, desc_j = (jnp.asarray(pts), jnp.asarray(nbr),
                            jnp.asarray(desc))

    def run(pt_):
        return _hb_batch(cam, params, pose_q, pt_, pts_j, nbr_j, desc_j,
                         pyr, obs_scale, contrib, 0.01,
                         optimize_intrinsics=True, dynamic_scale=True)

    out = run(pose_t)  # compile
    count = out[3]
    assert int(count) > nb * n_points // 2, f"only {int(count)} valid obs"
    # distinct inputs per rep (relay dedup) + value-fetch sync
    poses = [pose_t + 1e-6 * (i + 1) for i in range(reps)]
    t0 = time.time()
    outs = [run(p_) for p_ in poses]
    float(np.asarray(outs[-1][2]))
    dt = (time.time() - t0) / reps
    return nb * n_points / dt


def bench_gather_roofline(n=1_600_000, K=5, V=10, nb=8, reps=10):
    """The gather cost model behind the photometric paths (round-5
    finding, experiments/gather_probe*.py): XLA charges a FIXED ~2-7 ns
    PER GATHERED ITEM regardless of payload width, so the metric that
    matters is gathers/s, not GB/s. Returns a dict:

      gather_item_ns      — measured per-gather cost at _hb_batch-like
                            shapes (K neighbor-row gathers per point)
      gather_row128_gbps  — effective GB/s when each gather moves a full
                            128-lane row (the brick-layout regime)
      gather_micro_gbps   — legacy name: effective GB/s of the V-float
                            row gathers (the narrow-row regime the r4
                            'gather wall' was measured in)
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    J = jnp.asarray(rng.randn(nb, n, V).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (n, K)).astype(np.int32))
    xs = [jnp.asarray(rng.randn(n, 1).astype(np.float32))
          for _ in range(reps)]

    @jax.jit
    def f(J, idx, x):
        # per-DESTINATION weights + per-destination (n,) output: the
        # gathered rows couple to the gathering index, so XLA cannot
        # rewrite the random gathers into occurrence-count algebra
        acc = jnp.zeros((nb, n, V), jnp.float32)
        for k in range(K):
            acc = acc + J[:, idx[:, k], :] * x[None]
        return acc.sum(axis=(0, 2))

    float(np.asarray(f(J, idx, xs[0])[0]))  # compile + sync
    t0 = time.time()
    outs = [f(J, idx, x) for x in xs]  # distinct inputs per rep
    float(np.asarray(outs[-1][0]))  # value fetch: the only reliable sync
    dt = (time.time() - t0) / reps
    n_gathers = nb * n * K
    out = {
        "gather_micro_gbps": round(n_gathers * V * 4 / dt / 1e9, 2),
        "gather_item_ns": round(dt / n_gathers * 1e9, 2),
    }

    # full-row regime (the brick sampler's gathers)
    t_rows = (32 << 20) // (128 * 4)
    table = jnp.asarray(rng.randn(t_rows, 128).astype(np.float32))
    ridx = [jnp.asarray(rng.randint(0, t_rows, 4_000_000).astype(np.int32))
            for _ in range(reps)]

    @jax.jit
    def g(table, i):
        return jnp.sum(table[i])

    float(np.asarray(g(table, ridx[0])))
    t0 = time.time()
    outs = [g(table, i) for i in ridx]
    float(np.asarray(outs[-1]))
    dt = (time.time() - t0) / reps
    out["gather_row128_gbps"] = round(4_000_000 * 512 / dt / 1e9, 2)
    out["gather_row128_item_ns"] = round(dt / 4_000_000 * 1e9, 2)
    return out


def _cube_cloud(n_points, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.uniform(1.0, 20.0, n_points).astype(np.float32)
    v = rng.randn(n_points, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cols = rng.randint(0, 255, (n_points, 3)).astype(np.uint8)
    return v * d[:, None], cols


def bench_cubemap(size=2048, n_points=10_000_000, R=9):
    """End-to-end faces/s AND the split the driver metric conflated in r4
    (VERDICT weak #4): DEVICE faces/s (repeat-delta inside one dispatch)
    vs the relay wire cost (one packed 5 B/px exact-color fetch)."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    from dataset_pipeline_tpu.tools.cube_map_renderer import (
        _render_all_faces_packed,
        _render_all_faces_q,
        render_cube_map,
    )

    pos, cols = _cube_cloud(n_points)

    render_cube_map(pos, cols, size)  # compile
    t0 = time.time()
    render_cube_map(pos, cols, size)
    e2e = time.time() - t0

    out = {"cubemap_2048_faces_per_s": round(6.0 / e2e, 3)}
    if jax.default_backend() == "cpu":
        return out

    # wire: time the packed fetch alone (the render is already done and
    # cached on device from the e2e call? no — rerun and split phases)
    posd = jnp.asarray(pos)
    colsd = jnp.asarray(cols)
    packed = _render_all_faces_packed(posd, colsd, size)
    jax.block_until_ready(packed)
    t0 = time.time()
    packed_np = np.asarray(packed)
    fetch_s = time.time() - t0
    wire_mb = packed_np.nbytes / 1e6
    out["cubemap_wire_mb"] = round(wire_mb, 1)
    out["relay_fetch_mbps"] = round(wire_mb / fetch_s, 1)

    # device time: R distinct renders chained in one dispatch, differenced
    @_partial(jax.jit, static_argnames=())
    def reps(dxs):
        import jax as _jax

        def body(c, dx):
            q, col = _render_all_faces_q(posd + dx, colsd, size)
            return (c + jnp.sum(q[:, ::509, ::509].astype(jnp.int32))
                    + jnp.sum(col[:, ::509, ::509, 0].astype(jnp.int32))), None

        c, _ = _jax.lax.scan(body, jnp.int32(0), dxs)
        return c

    dxs = jnp.asarray(1e-5 * np.random.RandomState(1).randn(R, 1, 3),
                      jnp.float32)

    def t_of(d):
        int(np.asarray(reps(d)))
        t0 = time.time()
        int(np.asarray(reps(d)))
        return time.time() - t0

    t_of(dxs[:1])
    t_of(dxs)  # compile both
    dt = max((t_of(dxs) - t_of(dxs[:1])) / (R - 1), 1e-9)
    out["cubemap_device_faces_per_s"] = round(6.0 / dt, 3)
    return out


def bench_ref_render_baselines(cube_size=2048, cube_points=10_000_000,
                               gt_w=3072, gt_h=2048, gt_points=4_000_000):
    """Measured single-core C++ baselines for the cube-map face and
    GT-depth frame loops (``native/ref_render_loops.cc`` mirrors of
    ``exe/cube_map_renderer.cc:230-372`` and
    ``exe/ground_truth_creator.cc:148-216``, reference flags,
    single-threaded) at the SAME workload shapes as bench_cubemap /
    bench_gt_depth. VERDICT r4 missing #2: no north-star metric without a
    measured reference value. Note the TPU gt_depth_frames_per_s INCLUDES
    the occlusion splat render; the C++ loop consumes a prebuilt occlusion
    image (the reference renders it in OpenGL) — conservative in the
    reference's favor."""
    from dataset_pipeline_tpu.native.refbench import (
        ref_cubemap_face,
        ref_gt_depth_frame,
    )

    out = {}
    pos, cols = _cube_cloud(cube_points)
    f = cube_size / 2.0
    c = cube_size // 2
    t0 = time.time()
    r = ref_cubemap_face(pos, cols, np.eye(3), f, f, float(c), float(c),
                         cube_size, cube_size)
    if r is not None:
        dt = time.time() - t0
        out["ref_cpp_cubemap_faces_per_s"] = round(1.0 / dt, 3)

    rng = np.random.RandomState(0)
    fd = 2800.0
    pts = np.stack([rng.uniform(-6, 6, gt_points),
                    rng.uniform(-4, 4, gt_points),
                    rng.uniform(3, 12, gt_points)], -1).astype(np.float32)
    obs = np.full(gt_points, 3, np.int32)
    occl = np.full((gt_h, gt_w), 100.0, np.float32)
    T = np.hstack([np.eye(3), np.zeros((3, 1))])
    t0 = time.time()
    r = ref_gt_depth_frame(pts, obs, T, fd, fd, (gt_w - 1) / 2.0,
                           (gt_h - 1) / 2.0, gt_w, gt_h, occl)
    if r is not None:
        dt = time.time() - t0
        out["ref_cpp_gt_depth_frames_per_s"] = round(1.0 / dt, 3)
    return out


def bench_gt_depth(width=3072, height=2048, n_points=4_000_000, frames=4):
    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.tools.ground_truth_creator import (
        _gt_depth_image,
        render_occlusion_depth,
    )

    rng = np.random.RandomState(0)
    f = 2800.0
    cam = cm.make_camera("PINHOLE", width, height,
                         [f, f, (width - 1) / 2.0, (height - 1) / 2.0])
    pts = jnp.asarray(np.stack([
        rng.uniform(-6, 6, n_points), rng.uniform(-4, 4, n_points),
        rng.uniform(3, 12, n_points)], -1).astype(np.float32))
    keep = jnp.ones((n_points,), bool)

    def one_frame(tx):
        pose = SE3(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                   jnp.asarray([tx, 0.0, 0.0], jnp.float32))
        occ = render_occlusion_depth(cam, pose, pts, splat_radius=0.01)
        depth = _gt_depth_image(cam, pose.q, pose.t, pts, keep, occ,
                                width, height)
        return depth

    float(np.asarray(one_frame(0.0)[0, 0]))  # compile + sync
    t0 = time.time()
    outs = [one_frame(0.01 * (i + 1)) for i in range(frames)]
    float(np.asarray(outs[-1][0, 0]))  # value fetch: reliable sync
    dt = time.time() - t0
    return frames / dt


def bench_registrator_e2e():
    """End-to-end two-frame photometric registration (the ImageRegistrator
    core loop on a rendered synthetic scene): seconds for a 2-scale run with
    10 LM iterations per scale."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.ops.splat import (
        fill_color_from_depth,
        flood_fill_colors,
        render_points_depth_color,
    )
    from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
    from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
    from dataset_pipeline_tpu.photometric.problem import (
        ImageGroup,
        PhotoProblem,
        build_image_pyramid,
        build_photo_level,
    )

    W, H = 160, 120
    n = 120
    xs = np.linspace(0, 2, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = 0.1 * np.sin(3 * gx) * np.cos(2.5 * gy)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * gx) * np.cos(9 * gy)).clip(0, 252)
    cols = np.stack([tex.ravel()] * 3, -1).astype(np.uint8)
    f, cx, cy = 140.0, 79.5, 59.5
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])

    def look_at(eye):
        target = np.asarray([1.0, 1.0, 0.0])
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        r = np.cross(fwd, [0.0, 1.0, 0.0])
        r /= np.linalg.norm(r)
        d = np.cross(fwd, r)
        R = np.stack([r, d, fwd])
        return R, -R @ eye

    mats, imgs = [], []
    for eye in ([1.0, 1.0, -2.2], [1.25, 1.05, -2.15]):
        R, t = look_at(np.asarray(eye))
        p_cam = pts @ R.T + t
        d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                         W, H, f, f, cx, cy)
        cf, v = fill_color_from_depth(d, c)
        img = np.asarray(flood_fill_colors(cf, v))[..., 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3], m[:3, 3] = R, t
        mats.append(m)
        imgs.append(img)

    poses = SE3.from_matrix(jnp.asarray(np.stack(mats), jnp.float32))
    scale_count = 2
    pyr = build_image_pyramid(np.stack(imgs), scale_count)
    levels_raw = build_multiscale_cloud(pts, cols, np.zeros(len(pts), np.uint8),
                                        poses, cam, scale_count)
    levels = [pl for i, lv in enumerate(levels_raw)
              if (pl := build_photo_level(lv, seed=i)) is not None]

    def make_problem():
        group = ImageGroup(camera=cam, pyramid=pyr, poses=poses,
                           image_ids=[0, 1])
        return PhotoProblem(groups=[group], levels=levels,
                            occlusion_points=jnp.asarray(pts),
                            occlusion_radius=0.03, scale_count=scale_count)

    # warm the kernel compilations (the remote-compile relay takes minutes on
    # a cold cache; the metric is the steady-state tool time)
    PhotometricOptimizer(make_problem()).run(max_iterations_per_scale=2)

    t0 = time.time()
    opt = PhotometricOptimizer(make_problem())
    opt.run(max_iterations_per_scale=10)
    return time.time() - t0


def bench_icp_engine_ab(ms=(1_000_000, 8_000_000, 28_000_000), iters=20):
    """ENGINE inner-LM A/B (VERDICT r3 item 5): the gated moment
    accelerator + exact finisher (use_moments=True) vs the direct path
    (use_moments=False), timed end-to-end through ``_inner_lm`` on fixed
    correspondences — every host round-trip and dispatch included. The
    lambda ladders run as ONE batched cost dispatch per iteration on both
    paths. Convergence threshold is the engine's default 1e-7: the r4-r5a
    runs passed 1e-12, below the f32 step-noise floor, so BOTH paths
    always ran all 20 direct iterations and the A/B degenerated to
    "direct" vs "direct + moment overhead" (ratio noise around 1.0) —
    structurally unlike the engine, whose finisher exits on threshold."""
    from dataset_pipeline_tpu.icp.point_to_plane import PointToPlaneICP

    out = {}
    for m in ms:
        rng = np.random.RandomState(0)
        half = m // 2
        # well-conditioned wavy-surface correspondences so the gate engages
        xy = rng.uniform(-2, 2, (half, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(1.7 * xy[:, 1])
        ps_h = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        dzdx = 0.6 * np.cos(2 * xy[:, 0]) * np.cos(1.7 * xy[:, 1])
        dzdy = -0.51 * np.sin(2 * xy[:, 0]) * np.sin(1.7 * xy[:, 1])
        n_h = np.stack([-dzdx, -dzdy, np.ones(half, np.float32)], -1)
        n_h /= np.linalg.norm(n_h, axis=1, keepdims=True)
        pt_h = ps_h + 0.01 * rng.randn(half, 3).astype(np.float32)
        corr = {
            "sid": np.concatenate([np.zeros(half, np.int32),
                                   np.ones(half, np.int32)]),
            "tid": np.concatenate([np.ones(half, np.int32),
                                   np.zeros(half, np.int32)]),
            "ps": np.concatenate([ps_h, pt_h]),
            "ns": np.concatenate([n_h, n_h]),
            "pt": np.concatenate([pt_h, ps_h]),
            "nt": np.concatenate([n_h, n_h]),
            "groups": [(0, 1, half), (1, 0, half)],
        }
        tag = f"{m // 1_000_000}m"
        for use_moments in (True, False):
            icp = PointToPlaneICP(use_moments=use_moments)
            icp._clouds = [(ps_h, n_h), (pt_h, n_h)]  # entries only sized
            run = lambda: icp._inner_lm(corr, 2, iters, 1e-7)  # noqa: E731
            run()  # compile
            t0 = time.time()
            run()
            dt = time.time() - t0
            key = "moment" if use_moments else "direct"
            out[f"icp_engine_{key}_s_{tag}"] = round(dt, 4)
        out[f"icp_engine_speedup_{tag}"] = round(
            out[f"icp_engine_direct_s_{tag}"]
            / out[f"icp_engine_moment_s_{tag}"], 2)
    return out


def bench_registrator_dslr(n_images=16, W=3072, H=2048, iters=3,
                           level_sizes=(1_600_000, 400_000, 100_000)):
    """ImageRegistrator at DSLR production scale (VERDICT r3 item 3):
    3072x2048, 16 images, ~2.1M multi-resolution points over 3 levels,
    REAL engine path (PhotometricOptimizer.run_on_current_scale: splat
    occlusion renders + footprint-gated visibility + LM with frozen-
    visibility accept). Reports s/LM-iteration, the H,b observation rate
    under the engine's own visibility masks, and the host<->device
    round-trip share of an iteration."""
    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.photometric.multiscale import PointLevel
    from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
    from dataset_pipeline_tpu.photometric.problem import (
        ImageGroup,
        PhotoProblem,
        build_image_pyramid,
        build_photo_level,
        image_scale_count,
    )

    rng = np.random.RandomState(0)
    f = 2800.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])
    scale_count = image_scale_count(W, H)  # 5 for 3072x2048

    def tex(x, y):
        return (128 + 55 * np.sin(2.1 * x) * np.cos(1.7 * y)
                + 35 * np.sin(5.3 * x + 3.1 * y)).clip(3, 250)

    # multi-res point levels: radius doubles per level, chosen so level-0
    # footprints land in [0, 1.5) at z in [3, 8] (the engine's own gate
    # keeps obs_scale in [current_scale, scale_count-1))
    levels = []
    r0 = 0.0015
    for li, n in enumerate(level_sizes):
        u = rng.uniform(64, W - 64, n)
        v = rng.uniform(64, H - 64, n)
        # a smooth SURFACE height field (real scans are surfaces): random
        # volumetric points would self-occlude under the splat z-test
        xn = (u - cx) / f
        yn = (v - cy) / f
        z = (5.0 + 1.2 * np.sin(2.5 * xn) * np.cos(2.0 * yn)).astype(
            np.float64)
        pts = np.stack([xn * z, yn * z, z], -1).astype(np.float32)
        inten = tex(pts[:, 0], pts[:, 1]).astype(np.float32)
        lv = build_photo_level(
            PointLevel(pts, inten, np.zeros(n, np.uint8), r0 * (2.0 ** li)),
            apply_gradient_filter=False, seed=li)
        levels.append(lv)
    n_points = sum(int(lv.points.shape[0]) for lv in levels)

    # 16 DSLR frames: analytic texture sampled on the pixel grid + noise,
    # near-identity pose perturbations
    xs = np.linspace(-cx / f * 5.0, cx / f * 5.0, W, dtype=np.float32)
    ys = np.linspace(-cy / f * 5.0, cy / f * 5.0, H, dtype=np.float32)
    base = tex(xs[None, :], ys[:, None]).astype(np.float32)
    imgs = np.repeat(base[None], n_images, 0)
    imgs += rng.randn(*imgs.shape).astype(np.float32)
    poses = SE3.exp(jnp.asarray(0.002 * rng.randn(n_images, 6), jnp.float32))
    pyr = build_image_pyramid(imgs, scale_count)
    del imgs

    all_pts = np.concatenate([np.asarray(lv.points) for lv in levels])
    group = ImageGroup(camera=cam, pyramid=pyr, poses=poses,
                       image_ids=list(range(n_images)))
    problem = PhotoProblem(groups=[group], levels=levels,
                           occlusion_points=jnp.asarray(all_pts),
                           occlusion_radius=0.01, scale_count=scale_count)
    # 8-image chunks: with fused per-chunk dispatches the whole
    # (levels x types) accumulation is TWO relay dispatches (a single
    # 16-image chunk compiles to 17.4 GB HBM temps — just over the
    # 15.75 GB budget)
    opt = PhotometricOptimizer(problem, optimize_intrinsics=True)
    opt.current_scale = 0

    # warm-up compiles every kernel in the loop — TWO iterations so the
    # _lm_step path (entered from iteration 1) compiles too
    opt.run_on_current_scale(max_iterations=2)
    t0 = time.time()
    report = opt.run_on_current_scale(max_iterations=iters)
    iter_s = (time.time() - t0) / max(report.iterations, 1)

    # split: the LM accumulate+solve+accept portion of an iteration (all
    # _hb_batch dispatches async + ONE fetch + host f64 solve + lambda
    # ladder) vs the visibility/color/cost refresh that makes up the rest
    vis = opt._frozen_vis
    t0 = time.time()
    opt._lm_step(vis)
    lm_step_s = time.time() - t0

    obs = int(sum(int(np.asarray(m).sum()) for per_lvl in vis[0]
                  for (m, _) in per_lvl)) if vis else 0
    return {
        "registrator_dslr_iter_s": round(iter_s, 3),
        "registrator_dslr_lm_step_s": round(lm_step_s, 3),
        "registrator_dslr_points": n_points,
        "registrator_dslr_images": n_images,
        "registrator_dslr_obs_per_iter": obs,
        "registrator_dslr_obs_per_s": round(obs / iter_s, 1),
    }


def bench_joint_ba_system(n_scenes=4, imgs_per_scene=8, n_pts=12_000,
                          n_icp=50_000, W=256, H=192, reps=5, lm_iters=3):
    """Production joint BA at scale: >=1M residual rows over >=32 images,
    rows produced ON-DEVICE inside shard_map (``parallel/joint_ba.py``) and
    reduced through the distributed Schur complement — nothing of size
    rows x n_vars ever exists on host or device. Returns a dict with the
    warm per-step time, total rows, LM cost descent and the host peak RSS
    (flat in the row count)."""
    import resource

    import jax
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.parallel.ba import JointScene
    from dataset_pipeline_tpu.parallel.joint_ba import (
        JointBASystem,
        apply_delta,
        make_state,
        pack_scenes,
    )
    from dataset_pipeline_tpu.parallel.mesh import make_data_mesh
    from dataset_pipeline_tpu.photometric.multiscale import PointLevel
    from dataset_pipeline_tpu.photometric.problem import (
        ImageGroup,
        PhotoProblem,
        build_image_pyramid,
        build_photo_level,
    )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    f = 200.0
    cam = cm.make_camera("PINHOLE", W, H,
                         [f, f, (W - 1) / 2.0, (H - 1) / 2.0])

    def scene(seed):
        rng = np.random.RandomState(seed)
        xy = rng.uniform(-0.9, 0.9, (n_pts, 2)).astype(np.float32)
        z = 2.2 + 0.05 * np.sin(3 * xy[:, 0]) * np.cos(2.5 * xy[:, 1])
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        scans = (np.arange(n_pts) % 2).astype(np.uint8)
        inten = (120 + 70 * np.sin(5 * pts[:, 0] + seed)
                 * np.cos(4 * pts[:, 1])).astype(np.float32)
        imgs = (120 + 70 * np.sin(
            5 * np.linspace(-1, 1, W)[None, None, :] + seed
        ) * np.cos(4 * np.linspace(-0.75, 0.75, H)[None, :, None])
        ).astype(np.float32)
        imgs = np.repeat(imgs, imgs_per_scene, 0)
        imgs += rng.randn(*imgs.shape).astype(np.float32)
        poses = SE3.exp(jnp.asarray(
            0.002 * rng.randn(imgs_per_scene, 6), jnp.float32))
        level = build_photo_level(PointLevel(pts, inten, scans, 0.008),
                                  apply_gradient_filter=False, seed=seed)
        group = ImageGroup(camera=cam, pyramid=build_image_pyramid(imgs, 2),
                           poses=poses,
                           image_ids=list(range(imgs_per_scene)))
        problem = PhotoProblem(groups=[group], levels=[level],
                               occlusion_points=jnp.asarray(pts),
                               occlusion_radius=0.02, scale_count=2)
        # ICP rows: perturbed self-correspondences between the two scans
        sel = rng.randint(0, n_pts, n_icp)
        ps = pts[sel]
        pt = ps + 0.005 * rng.randn(n_icp, 3).astype(np.float32)
        ns = rng.randn(n_icp, 3).astype(np.float32)
        ns /= np.linalg.norm(ns, axis=1, keepdims=True)
        icp = (ps, ns, pt.astype(np.float32), ns.copy(),
               np.zeros(n_icp, np.int32), np.ones(n_icp, np.int32))
        return JointScene(problem, 0, icp, icp_weight=5.0)

    scenes = [scene(11 + i) for i in range(n_scenes)]
    mesh = make_data_mesh()
    pack = pack_scenes(mesh, scenes, optimize_intrinsics=True)
    system = JointBASystem(pack)
    state = make_state(pack)

    vis, obs_scale = system.visibility(state)
    cost0, count = system.cost(state, vis, obs_scale)
    jax.block_until_ready(cost0)
    rows = int(count) * int(pack.scene_neighbors.shape[-1]) + 2 * pack.n_icp

    def step(lam):
        xk, xi, cost, cnt = system.step(state, vis, obs_scale, lam)
        return xk, xi, float(cost)  # value fetch syncs

    step(1e-2)  # compile
    # distinct lam per rep (relay dedups identical dispatches)
    t0 = time.time()
    for i in range(reps):
        xk, xi, _ = step(1e-2 * (1.0 + 1e-3 * i))
    step_s = (time.time() - t0) / reps

    # a short damped descent (frozen visibility) to prove the step is real
    cost_trace = [float(cost0)]
    for _ in range(lm_iters):
        xk, xi, _ = step(1e-2)
        state = apply_delta(pack, state, xk, xi)
        c, _ = system.cost(state, vis, obs_scale)
        cost_trace.append(float(c))
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    return {
        "joint_ba_step_s": round(step_s, 4),
        "joint_ba_rows": rows,
        "joint_ba_images": pack.n_images,
        "joint_ba_cost0": round(cost_trace[0], 1),
        "joint_ba_cost_final": round(cost_trace[-1], 1),
        "joint_ba_host_rss_mb": round(rss1 - rss0, 1),
    }


def bench_joint_ba(reps=5):
    """One damped Schur GN step of the joint multi-scene scan+image BA on
    REAL residual rows (photometric descriptor + symmetric ICP), on a
    1-device mesh of the current chip — the single-chip slice of
    BASELINE.json's fifth config. Returns (seconds/step, row count)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from dataset_pipeline_tpu.models import cameras as cm
    from dataset_pipeline_tpu.parallel.ba import (
        JointScene,
        build_joint_rows,
        joint_ba_step,
    )
    from dataset_pipeline_tpu.parallel.mesh import make_data_mesh, shard_rows
    from test_joint_ba import CX, CY, F, H, W, _build_scene

    cam = cm.make_camera("PINHOLE", W, H, [F, F, CX, CY])
    rng = np.random.RandomState(3)
    scenes = []
    for si, (seed, phase) in enumerate([(10, 0.0), (20, 0.7)]):
        scan1_delta = 0.008 * rng.randn(6).astype(np.float32)
        pose_deltas = 0.003 * rng.randn(2, 6).astype(np.float32)
        problem, icp, _, _ = _build_scene(seed, cam, phase, scan1_delta,
                                          pose_deltas)
        scenes.append(JointScene(problem, 0, icp, icp_weight=30.0))
    rows, r, w, n_keep, m = build_joint_rows(scenes, obs_scale=0.0)

    mesh = make_data_mesh()
    nd = mesh.devices.size
    pad = (-len(rows)) % nd
    inputs = (
        shard_rows(mesh, jnp.asarray(np.pad(rows, ((0, pad), (0, 0))))),
        shard_rows(mesh, jnp.asarray(np.pad(r, (0, pad)))),
        shard_rows(mesh, jnp.asarray(np.pad(w, (0, pad)))),
    )
    specs = (P("data"), P("data"), P("data"))

    def row_fn(rows, r, w):
        return rows, r, w

    def step():
        xk, xi, cost = joint_ba_step(mesh, row_fn, inputs, specs, n_keep, m,
                                     lam=1e-3)
        jax.block_until_ready(xk)
        return xk

    step()  # compile
    t0 = time.time()
    for _ in range(reps):
        step()
    return (time.time() - t0) / reps, len(rows)


def main():
    import jax

    metrics = {}
    errors = {}

    try:
        icp_out = bench_icp_moments()
        metrics.update(icp_out)
        corr_iters_per_s = icp_out["icp_gn_corr_iters_per_s"]
        accum_corr_per_s = icp_out["icp_moment_accum_corr_per_s"]
        dt_pass = icp_out["icp_moment_pass_s"]
    except Exception as e:  # pragma: no cover
        errors["icp"] = repr(e)
        corr_iters_per_s = 0.0
        accum_corr_per_s = 0.0
        dt_pass = 0.0

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in HBM_PEAK_GBPS.items() if k in kind), None)
    mxu_peak = next(
        (v for k, v in F32_MXU_PEAK_TFLOPS.items() if k in kind), None)
    metrics["device_kind"] = jax.devices()[0].device_kind
    if peak and metrics.get("icp_moment_pass_gbps"):
        # roofline statement for the moment kernel (tri_sub layout):
        # bytes/corr from the ACTUAL packed tensor; useful flops 2*42^2;
        # ISSUED MXU flops 2*128^2/3 per corr (the 128-wide contraction
        # carries 3 x 42-row groups; tile fill 126/128). Utilization is
        # reported UNCLIPPED (a value above 100 means the measurement or
        # the stated peak is wrong — hbm_copy_gbps is the harness check).
        bytes_per_corr = metrics.get("icp_moment_pass_bytes", 64 * ICP_M) / ICP_M
        useful_flops = 2 * 42 * 42
        issued_flops = 2 * 128 * 128 / 3.0
        metrics["hbm_peak_gbps"] = peak
        metrics["hbm_util_pct"] = round(
            100.0 * metrics["icp_moment_pass_gbps"] / peak, 2)
        metrics["icp_moment_bytes_per_corr"] = round(bytes_per_corr, 1)
        metrics["icp_moment_flops_per_corr"] = useful_flops
        if mxu_peak and dt_pass:
            issued_tflops = issued_flops * ICP_M / dt_pass / 1e12
            metrics["f32_mxu_peak_tflops"] = mxu_peak
            metrics["mxu_issue_pct"] = round(
                100.0 * issued_tflops / mxu_peak, 1)
            metrics["icp_moment_bound"] = (
                "roofline-crossover"
                if abs(issued_tflops / mxu_peak
                       - metrics["icp_moment_pass_gbps"] / peak) < 0.15
                else ("mxu-issue" if issued_tflops / mxu_peak
                      > metrics["icp_moment_pass_gbps"] / peak else "hbm"))

    for name, fn in (
        ("photometric_hb_obs_per_s", bench_photometric_hb),
        ("gt_depth_frames_per_s", bench_gt_depth),
        ("registrator_e2e_s", bench_registrator_e2e),
    ):
        try:
            metrics[name] = round(fn(), 3)
        except Exception as e:  # pragma: no cover
            errors[name] = repr(e)

    try:
        metrics.update(bench_cubemap())
    except Exception as e:  # pragma: no cover
        errors["cubemap"] = repr(e)

    try:
        metrics.update(bench_ref_render_baselines())
        if metrics.get("ref_cpp_cubemap_faces_per_s"):
            if metrics.get("cubemap_device_faces_per_s"):
                metrics["cubemap_device_vs_ref"] = round(
                    metrics["cubemap_device_faces_per_s"]
                    / metrics["ref_cpp_cubemap_faces_per_s"], 2)
            if metrics.get("cubemap_2048_faces_per_s"):
                metrics["cubemap_vs_ref"] = round(
                    metrics["cubemap_2048_faces_per_s"]
                    / metrics["ref_cpp_cubemap_faces_per_s"], 2)
        if (metrics.get("ref_cpp_gt_depth_frames_per_s")
                and metrics.get("gt_depth_frames_per_s")):
            metrics["gt_depth_vs_ref"] = round(
                metrics["gt_depth_frames_per_s"]
                / metrics["ref_cpp_gt_depth_frames_per_s"], 2)
    except Exception as e:  # pragma: no cover
        errors["ref_render_baselines"] = repr(e)

    try:
        # gather cost model for the photometric paths (round-5 redesign):
        # XLA charges ~2-7 ns PER GATHERED ITEM regardless of payload, so
        # the bound is gather-units/observation, not bytes. The brick H,b
        # path spends ~17 gather-units/obs (2 brick rows + 5 J rows +
        # 2x5 neighbor inten/ok items); the bound below judges the
        # achieved rate against that budget at the measured per-item cost
        gm = bench_gather_roofline()
        metrics.update(gm)
        if metrics.get("photometric_hb_obs_per_s") and gm.get(
                "gather_row128_item_ns"):
            # brick H,b gather budget: 2 brick rows + 5 neighbor-J rows +
            # 5 sentinel-merged neighbor intensity/validity items per obs,
            # at the saturated per-item cost (row-gather regime)
            units_per_obs = 12.0
            bound = 1e9 / (units_per_obs * gm["gather_row128_item_ns"])
            metrics["photometric_hb_gather_bound_obs_per_s"] = round(bound, 1)
            metrics["photometric_hb_gather_bound_pct"] = round(
                100.0 * metrics["photometric_hb_obs_per_s"] / bound, 1)
    except Exception as e:  # pragma: no cover
        errors["gather_roofline"] = repr(e)

    try:
        metrics.update(bench_icp_engine_ab())
    except Exception as e:  # pragma: no cover
        errors["icp_engine_ab"] = repr(e)

    try:
        metrics.update(bench_joint_ba_system())
    except Exception as e:  # pragma: no cover
        errors["joint_ba"] = repr(e)

    try:
        # collective share of the sharded paths (VERDICT r4 missing #3):
        # psum-vs-no-psum A/B on the 8-virtual-device CPU mesh in a fresh
        # subprocess (the TPU backend is already claimed by this process)
        import os
        import subprocess
        import sys as _sys

        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        r = subprocess.run(
            [_sys.executable, "-m",
             "dataset_pipeline_tpu.utils.scaling_bench"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = r.stdout.strip().splitlines()[-1]
        metrics["scaling"] = json.loads(line)
    except Exception as e:  # pragma: no cover
        errors["scaling"] = repr(e)

    try:
        metrics.update(bench_registrator_dslr())
        # measured C++ single-core photometric baseline at matched scale
        # (PINHOLE trilinear + chain rule + Huber descriptor rows,
        # reference flags; native/ref_photo_loop.cc)
        from dataset_pipeline_tpu.native.refbench import ref_photo_inner

        rng = np.random.RandomState(0)
        Np, Kp = 500_000, 5
        Wd, Hd = 3072, 2048
        fd, cxd, cyd = 2800.0, (Wd - 1) / 2.0, (Hd - 1) / 2.0
        u = rng.uniform(64, Wd - 64, Np)
        v = rng.uniform(64, Hd - 64, Np)
        z = rng.uniform(3.0, 8.0, Np)
        pts = np.stack([(u - cxd) / fd * z, (v - cyd) / fd * z, z],
                       -1).astype(np.float32)
        nbr = rng.randint(0, Np, (Np, Kp)).astype(np.int32)
        desc = (5 * rng.randn(Np, Kp)).astype(np.float32)
        lv0 = rng.uniform(10, 200, (Hd, Wd)).astype(np.float32)
        lv1 = rng.uniform(10, 200, (Hd // 2, Wd // 2)).astype(np.float32)
        sz = rng.uniform(0.1, 0.9, Np).astype(np.float32)
        # median of 3 independent runs: the single-core rate swings ~2x
        # with host load/frequency (r4 captured 0.68M, r5 1.43M obs/s)
        rates = []
        for _ in range(3):
            out = ref_photo_inner(pts, nbr, desc, lv0, lv1, sz, fd, cxd,
                                  cyd, iters=2)
            if out is not None:
                secs, cnt = out
                rates.append(2 * cnt / secs)
        if rates:
            metrics["ref_cpp_photo_obs_per_s"] = round(
                float(np.median(rates)), 1)
            metrics["ref_cpp_photo_obs_per_s_min"] = round(min(rates), 1)
            metrics["ref_cpp_photo_obs_per_s_max"] = round(max(rates), 1)
            if metrics.get("registrator_dslr_obs_per_s"):
                metrics["registrator_dslr_vs_ref"] = round(
                    metrics["registrator_dslr_obs_per_s"]
                    / metrics["ref_cpp_photo_obs_per_s"], 2)
    except Exception as e:  # pragma: no cover
        errors["registrator_dslr"] = repr(e)

    # MEASURED C++ reference baseline: the reference's own inner-loop math
    # (icp_point_to_plane_impl.h:115-211) compiled with its own flags
    # (-O2 -msse2 -msse3, single-threaded) — see native/ref_icp_loop.cc for
    # why the reference's binaries themselves are unbuildable here
    cpu = None
    try:
        from dataset_pipeline_tpu.native.refbench import ref_icp_inner

        rng = np.random.RandomState(0)
        Mr = ICP_M
        ps = rng.randn(Mr, 3).astype(np.float32)
        ns = rng.randn(Mr, 3).astype(np.float32)
        ns /= np.linalg.norm(ns, axis=1, keepdims=True)
        pt = ps + 0.01 * rng.randn(Mr, 3).astype(np.float32)
        rates = []
        for _ in range(3):
            out = ref_icp_inner(ps, ns, pt, ns.copy(), iters=1)
            if out is not None:
                rates.append(Mr / out[0])
        if rates:
            cpu = float(np.median(rates))
            metrics["ref_cpp_icp_corr_per_s"] = round(cpu, 1)
    except Exception as e:  # pragma: no cover
        errors["ref_cpp_baseline"] = repr(e)
    if cpu is None:
        try:
            cpu = bench_numpy_cpu_schedule()
            metrics["baseline_kind"] = "numpy-standin"
        except Exception as e:  # pragma: no cover
            errors["cpu_baseline"] = repr(e)
            cpu = 1.0
    if cpu and accum_corr_per_s:
        # kernel-vs-kernel comparison (accumulation rate, no amortization)
        metrics["vs_ref_kernel"] = round(accum_corr_per_s / cpu, 1)

    result = {
        "metric": "icp_gn_correspondences_per_s",
        "value": round(corr_iters_per_s, 1),
        "unit": "corr*iters/s, DEVICE time of the 20-iteration inner LM "
                "schedule at 8M corr, ADDITIVE decomposition: measured "
                "moment pass (R=65 repeat-delta, median of 5 estimates, "
                "min/max shipped) + 20 x measured O(1) LM step "
                "(scan-length differencing) — immune to the loop-"
                "invariant-hoisting that spread r4's combined metric "
                "+/-45%; relay dispatch floor reported separately as "
                "icp_schedule_dispatch_s; vs the measured C++ reference "
                "loop re-accumulating per iteration (median of 3)",
        "vs_baseline": round(corr_iters_per_s / cpu, 3),
        "metrics": metrics,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
