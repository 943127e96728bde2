"""Round-5 gather probes, part 2: quantify the row-gather redesign.

Findings from part 1: XLA gathers cost ~6.7 ns EACH regardless of payload
(scalar -> 0.6 GB/s, 128-lane row -> 100-330 GB/s); Pallas lowers
take_along_axis along lanes (hardware dynamic gather); sortedness and table
size don't matter.

Here: (a) per-gather cost vs row width, (b) XLA take_along_axis lane
extraction rate, (c) Pallas lane-extract kernel rate, (d) end-to-end
blocked-row bilinear sampler prototype obs/s.
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def out(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.RandomState(0)


def time_delta(fn, args1, argsR, label, per_rep_items, item="gathers"):
    float(np.asarray(fn(*args1)))
    float(np.asarray(fn(*argsR)))
    t0 = time.perf_counter()
    float(np.asarray(fn(*args1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(fn(*argsR)))
    tR = time.perf_counter() - t0
    R = argsR[-1].shape[0]
    dt = (tR - t1) / (R - 1)
    out(bench=label, per_rep_s=round(dt, 6),
        ns_per_item=round(dt / per_rep_items * 1e9, 3),
        mitems_per_s=round(per_rep_items / dt / 1e6, 1), item=item)


# (a) row width scaling --------------------------------------------------------


@jax.jit
def _row_gather_scan(table2, idxs):
    def body(c, i):
        return c + jnp.sum(table2[i]), None

    c, _ = lax.scan(body, jnp.float32(0), idxs)
    return c


N = 4_000_000
R = 9
for W in (8, 32, 128):
    T_rows = (32 << 20) // (W * 4)  # ~32 MB table
    table2 = jnp.asarray(rng.randn(T_rows, W).astype(np.float32))
    idx = rng.randint(0, T_rows, (R, N)).astype(np.int32)
    idxs = jnp.asarray(idx)
    time_delta(_row_gather_scan, (table2, idxs[:1]), (table2, idxs),
               f"xla_row_gather_w{W}_32MB", N)

# two independent gathers in one fusion: do they overlap?
W = 128
T_rows = (32 << 20) // (W * 4)
tA = jnp.asarray(rng.randn(T_rows, W).astype(np.float32))
tB = jnp.asarray(rng.randn(T_rows, W).astype(np.float32))


@jax.jit
def _dual_gather_scan(ta, tb, idxs):
    def body(c, i):
        return c + jnp.sum(ta[i]) + jnp.sum(tb[i]), None

    c, _ = lax.scan(body, jnp.float32(0), idxs)
    return c


idx = rng.randint(0, T_rows, (R, N)).astype(np.int32)
idxs = jnp.asarray(idx)
time_delta(_dual_gather_scan, (tA, tB, idxs[:1]), (tA, tB, idxs),
           "xla_dual_row_gather_w128", 2 * N)


# (b) XLA take_along_axis lane extraction --------------------------------------


@jax.jit
def _xla_lane_extract_scan(rows, lanes_s):
    def body(c, l):
        v = jnp.take_along_axis(rows, l[:, None], axis=1)[:, 0]
        return c + jnp.sum(v), None

    c, _ = lax.scan(body, jnp.float32(0), lanes_s)
    return c


Nr = 2_000_000
rows = jnp.asarray(rng.randn(Nr, 128).astype(np.float32))
lanes = rng.randint(0, 128, (R, Nr)).astype(np.int32)
lanes_d = jnp.asarray(lanes)
time_delta(_xla_lane_extract_scan, (rows, lanes_d[:1]), (rows, lanes_d),
           "xla_take_along_lanes", Nr, item="extracts")


# (c) Pallas lane-extract kernel ----------------------------------------------
# Consumes rows0/rows1 (N,128) + lane + fx + fy; emits (N, 8):
# value, ddx, ddy, pad — the bilinear tail of the blocked-row sampler.

CH = 2048


def _extract_kernel(r0_ref, r1_ref, lane_ref, fx_ref, fy_ref, out_ref):
    r0 = r0_ref[:]  # (CH, 128)
    r1 = r1_ref[:]
    lane = lane_ref[:]  # (CH, 1)
    fx = fx_ref[:]
    fy = fy_ref[:]
    blend = r0 * (1.0 - fy) + r1 * fy        # rows y, y+1 pre-gathered
    diff = r1 - r0
    l0 = jnp.take_along_axis(blend, lane, axis=1)
    l1 = jnp.take_along_axis(blend, lane + 1, axis=1)
    d0 = jnp.take_along_axis(diff, lane, axis=1)
    d1 = jnp.take_along_axis(diff, lane + 1, axis=1)
    value = (1.0 - fx) * l0 + fx * l1
    ddx = l1 - l0
    ddy = (1.0 - fx) * d0 + fx * d1
    zero = jnp.zeros_like(value)
    out_ref[:] = jnp.concatenate(
        [value, ddx, ddy, zero, zero, zero, zero, zero], axis=1)


@partial(jax.jit, static_argnames=())
def pallas_extract(r0, r1, lane, fx, fy):
    n = r0.shape[0]
    grid = n // CH
    bs = lambda w: pl.BlockSpec((CH, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _extract_kernel,
        grid=(grid,),
        in_specs=[bs(128), bs(128), bs(1), bs(1), bs(1)],
        out_specs=bs(8),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
    )(r0, r1, lane, fx, fy)


def check_extract():
    n = CH * 2
    r0 = rng.randn(n, 128).astype(np.float32)
    r1 = rng.randn(n, 128).astype(np.float32)
    lane = rng.randint(0, 127, (n, 1)).astype(np.int32)
    fx = rng.rand(n, 1).astype(np.float32)
    fy = rng.rand(n, 1).astype(np.float32)
    got = np.asarray(pallas_extract(*(jnp.asarray(a) for a in
                                      (r0, r1, lane, fx, fy))))
    blend = r0 * (1 - fy) + r1 * fy
    diff = r1 - r0
    ar = np.arange(n)
    l0 = blend[ar, lane[:, 0]]
    l1 = blend[ar, lane[:, 0] + 1]
    d0 = diff[ar, lane[:, 0]]
    d1 = diff[ar, lane[:, 0] + 1]
    val = (1 - fx[:, 0]) * l0 + fx[:, 0] * l1
    ddx = l1 - l0
    ddy = (1 - fx[:, 0]) * d0 + fx[:, 0] * d1
    ok = (np.allclose(got[:, 0], val, atol=1e-5)
          and np.allclose(got[:, 1], ddx, atol=1e-5)
          and np.allclose(got[:, 2], ddy, atol=1e-5))
    out(probe="pallas_extract_correct", ok=bool(ok))
    return ok


try:
    if check_extract():
        @jax.jit
        def _extract_scan(r0, r1, lane, fx, fys):
            def body(c, fy):
                o = pallas_extract(r0, r1, lane, fx, fy)
                return c + o[0, 0] + o[-1, 2], None

            c, _ = lax.scan(body, jnp.float32(0), fys)
            return c

        n = 2_000_000 // CH * CH
        r0 = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        r1 = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        lane = jnp.asarray(rng.randint(0, 127, (n, 1)), jnp.int32)
        fx = jnp.asarray(rng.rand(n, 1).astype(np.float32))
        fys = jnp.asarray(rng.rand(R, n, 1).astype(np.float32))
        time_delta(_extract_scan, (r0, r1, lane, fx, fys[:1]),
                   (r0, r1, lane, fx, fys),
                   "pallas_lane_extract", n, item="obs")
except Exception as e:  # noqa: BLE001
    out(probe="pallas_extract", ok=False, err=repr(e)[:300])


# (d) end-to-end blocked-row bilinear sampler prototype ------------------------
# Per obs: two row gathers (levels si, si-1 surrogate: two tables) + two
# Pallas extracts + trilinear blend. Reports obs/s for the full sampler.


@jax.jit
def _sampler_proto(tab, r_idx0, r_idx1, lane0, lane1, fx0, fy0, z, fxs):
    def body(c, fx_step):
        rows0a = tab[r_idx0]
        rows1a = tab[r_idx0 + 1]
        rows0b = tab[r_idx1]
        rows1b = tab[r_idx1 + 1]
        oa = pallas_extract(rows0a, rows1a, lane0, fx_step, fy0)
        ob = pallas_extract(rows0b, rows1b, lane1, fx_step, fy0)
        o = oa * z + ob * (1.0 - z)
        return c + o[0, 0] + o[-1, 1], None

    c, _ = lax.scan(body, jnp.float32(0), fxs)
    return c


try:
    n = 2_000_000 // CH * CH
    T_rows = (32 << 20) // (128 * 4)
    tab = jnp.asarray(rng.randn(T_rows, 128).astype(np.float32))
    r_idx0 = jnp.asarray(rng.randint(0, T_rows - 1, (n,)), jnp.int32)
    r_idx1 = jnp.asarray(rng.randint(0, T_rows - 1, (n,)), jnp.int32)
    lane0 = jnp.asarray(rng.randint(0, 127, (n, 1)), jnp.int32)
    lane1 = jnp.asarray(rng.randint(0, 127, (n, 1)), jnp.int32)
    fy0 = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    z = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    fxs = jnp.asarray(rng.rand(R, n, 1).astype(np.float32))
    time_delta(_sampler_proto,
               (tab, r_idx0, r_idx1, lane0, lane1, fxs[0], fy0, z, fxs[:1]),
               (tab, r_idx0, r_idx1, lane0, lane1, fxs[0], fy0, z, fxs),
               "sampler_proto_2level", n, item="obs")
except Exception as e:  # noqa: BLE001
    out(probe="sampler_proto", ok=False, err=repr(e)[:300])


# Note: the prototype uses tab[r] and tab[r+1] (4 gathers) to emulate the
# general case where y,y+1 rows are separate gathers; the production blocked
# layout packs the full 2x2 into ONE row (2 gathers/obs) — measured next.


def _extract_packed_kernel(ra_ref, rb_ref, la_ref, lb_ref, fxa_ref, fya_ref,
                           fxb_ref, fyb_ref, zf_ref, out_ref):
    """Production-layout extract: each row holds a 4x32 pixel block; the
    2x2 footprint sits at lanes (l, l+1, l+32, l+33). Trilinear blend of
    levels A (finer) and B (coarser) with weight zf on A."""

    def bil(r, lane, fx, fy):
        tl = jnp.take_along_axis(r, lane, axis=1)
        tr = jnp.take_along_axis(r, lane + 1, axis=1)
        bl = jnp.take_along_axis(r, lane + 32, axis=1)
        br = jnp.take_along_axis(r, lane + 33, axis=1)
        top = (1.0 - fx) * tl + fx * tr
        bot = (1.0 - fx) * bl + fx * br
        val = (1.0 - fy) * top + fy * bot
        ddx = fy * (br - bl) + (1.0 - fy) * (tr - tl)
        ddy = bot - top
        return val, ddx, ddy

    va, dxa, dya = bil(ra_ref[:], la_ref[:], fxa_ref[:], fya_ref[:])
    vb, dxb, dyb = bil(rb_ref[:], lb_ref[:], fxb_ref[:], fyb_ref[:])
    zf = zf_ref[:]
    value = zf * va + (1.0 - zf) * vb
    ddx = zf * dxa + (1.0 - zf) * dxb * 0.5  # level-B pixel scale 2^-1
    ddy = zf * dya + (1.0 - zf) * dyb * 0.5
    dds = va - vb
    zero = jnp.zeros_like(value)
    out_ref[:] = jnp.concatenate(
        [value, ddx, ddy, dds, zero, zero, zero, zero], axis=1)


@partial(jax.jit, static_argnames=())
def pallas_extract_packed(ra, rb, la, lb, fxa, fya, fxb, fyb, zf):
    n = ra.shape[0]
    grid = n // CH
    bs = lambda w: pl.BlockSpec((CH, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _extract_packed_kernel,
        grid=(grid,),
        in_specs=[bs(128), bs(128), bs(1), bs(1), bs(1), bs(1), bs(1),
                  bs(1), bs(1)],
        out_specs=bs(8),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
    )(ra, rb, la, lb, fxa, fya, fxb, fyb, zf)


@jax.jit
def _sampler_proto_packed(tab, ra_idx, rb_idx, la, lb, fya, fyb, zf, fxs):
    def body(c, fx_step):
        ra = tab[ra_idx]
        rb = tab[rb_idx]
        o = pallas_extract_packed(ra, rb, la, lb, fx_step, fya, fx_step,
                                  fyb, zf)
        return c + o[0, 0] + o[-1, 1], None

    c, _ = lax.scan(body, jnp.float32(0), fxs)
    return c


try:
    n = 2_000_000 // CH * CH
    T_rows = (32 << 20) // (128 * 4)
    tab = jnp.asarray(rng.randn(T_rows, 128).astype(np.float32))
    ra_idx = jnp.asarray(rng.randint(0, T_rows, (n,)), jnp.int32)
    rb_idx = jnp.asarray(rng.randint(0, T_rows, (n,)), jnp.int32)
    la = jnp.asarray(rng.randint(0, 94, (n, 1)), jnp.int32)
    lb = jnp.asarray(rng.randint(0, 94, (n, 1)), jnp.int32)
    fya = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    fyb = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    zf = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    fxs = jnp.asarray(rng.rand(R, n, 1).astype(np.float32))
    time_delta(_sampler_proto_packed,
               (tab, ra_idx, rb_idx, la, lb, fya, fyb, zf, fxs[:1]),
               (tab, ra_idx, rb_idx, la, lb, fya, fyb, zf, fxs),
               "sampler_proto_packed", n, item="obs")
except Exception as e:  # noqa: BLE001
    out(probe="sampler_proto_packed", ok=False, err=repr(e)[:300])


# (e) argsort (fixed from part 1) ---------------------------------------------


@jax.jit
def _argsort_scan(keys):
    def body(c, k):
        p = jnp.argsort(k)
        return c + p[0] + p[-1], None

    c, _ = lax.scan(body, jnp.int32(0), keys)
    return c


for Nk in (1_000_000, 4_000_000):
    keys = rng.randint(0, 1 << 20, (R, Nk)).astype(np.int32)
    keysd = jnp.asarray(keys)
    time_delta(_argsort_scan, (keysd[:1],), (keysd,),
               f"argsort_N{Nk}", Nk, item="keys")

out(done=True)
