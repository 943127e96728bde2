"""Blocked-row ("brick") pyramid sampling — the TPU answer to the gather wall.

The photometric hot path samples image pyramids at scattered sub-pixel
positions (``opt/intrinsics_and_pose_optimizer.cc:932-1217`` samples with
derivatives per observation). XLA lowers scattered reads to one gather
descriptor per ELEMENT at a measured ~6.7 ns each (~0.6 GB/s for scalars on
v5e — the round-4 "gather wall"), but the SAME per-gather cost applies to a
full 128-lane row (~2 ns each at 4M+ gathers, 250+ GB/s measured —
``experiments/gather_probe2.py``). So the fix is layout, not sorting:

- Each pyramid level is re-laid into OVERLAPPING 4x32-pixel blocks, one per
  128-lane table row, on a (3, 31)-pixel stride. Any bilinear 2x2 footprint
  with top-left (y0, x0) lives entirely inside block (y0//3, x0//31) at
  lanes (l, l+1, l+32, l+33), l = (y0%3)*32 + (x0%31).
- One XLA row gather per (point, level) fetches the whole footprint:
  8 scalar gathers/observation become 2 row gathers.
- A tiny Pallas kernel does the in-register lane extraction + bilinear
  combine (Mosaic lowers ``take_along_axis`` along lanes to the hardware
  dynamic gather; full-width indices with per-column offsets fetch all
  four taps in ONE gather).

The brick table costs 128/93 ~ 1.38x the level's pixels and is rebuilt
inside the jitted consumer (two strided-slice passes, bandwidth-trivial
next to the gathers it feeds).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block geometry: 4x32 pixels per 128-lane row, (3, 31) usable stride
_BY, _BX = 4, 32
_SY, _SX = 3, 31


class BrickPyramid(NamedTuple):
    """Flat brick table of a whole pyramid + per-level meta (all traced)."""

    table: jnp.ndarray  # (total_rows, 128) f32
    meta: jnp.ndarray   # (L, 4) f32: [H_l, W_l, C_l, row_off_l]


def _level_dims(H: int, W: int):
    R = max(H - 2, 0) // _SY + 1
    C = max(W - 2, 0) // _SX + 1
    return R, C


def build_brick_level(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image plane -> (R*C, 128) brick table (36 strided slices)."""
    H, W = img.shape
    R, C = _level_dims(H, W)
    img_p = jnp.pad(img, ((0, _SY * R + 1 - H), (0, _SX * C + 1 - W)),
                    mode="edge")
    # rows: (R, 4, Wp) with Y[r, ly] = img_p[3r + ly]
    Y = jnp.stack([img_p[ly::_SY][:R] for ly in range(_BY)], axis=1)
    # cols: (R, 4, C, 32) with X[..., c, lx] = Y[..., 31c + lx]
    X = jnp.stack([Y[:, :, lx::_SX][:, :, :C] for lx in range(_BX)], axis=3)
    return X.transpose(0, 2, 1, 3).reshape(R * C, _BY * _BX)


def build_brick_pyramid(image_pyr: List[jnp.ndarray]) -> BrickPyramid:
    tables = []
    meta = []
    off = 0
    for img in image_pyr:
        H, W = img.shape[-2], img.shape[-1]
        R, C = _level_dims(H, W)
        tables.append(build_brick_level(img))
        meta.append((float(H), float(W), float(C), float(off)))
        off += R * C
    return BrickPyramid(jnp.concatenate(tables, axis=0),
                        jnp.asarray(meta, jnp.float32))


def _meta_at(meta: jnp.ndarray, level: jnp.ndarray):
    """Per-point (H, W, C, off) WITHOUT tiny-table gathers (each XLA gather
    costs ~6.7 ns regardless of table size): a static chain of elementwise
    selects. NOT a one-hot matvec — on TPU that would ride the MXU at bf16
    default precision and corrupt the integer row offsets (>2^8)."""
    L = meta.shape[0]
    m = jnp.broadcast_to(meta[0], level.shape + (4,))
    for l in range(1, L):
        m = jnp.where((level == l)[..., None], meta[l], m)
    return m[..., 0], m[..., 1], m[..., 2].astype(jnp.int32), \
        m[..., 3].astype(jnp.int32)


def _brick_address(meta, level, pix0):
    """Row index + lane + fractions + validity of the bilinear footprint of
    full-res coords ``pix0`` at pyramid ``level`` (same coordinate
    convention and validity as ``_bilinear_flat``)."""
    f = jnp.exp2(-level.astype(jnp.float32))
    x = f * (pix0[..., 0] + 0.5) - 0.5
    y = f * (pix0[..., 1] + 0.5) - 0.5
    H_l, W_l, C_l, off_l = _meta_at(meta, level)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    valid = (x >= 0) & (y >= 0) & (ix.astype(jnp.float32) < W_l - 1) & (
        iy.astype(jnp.float32) < H_l - 1)
    ixc = jnp.clip(ix, 0, jnp.maximum(W_l.astype(jnp.int32) - 2, 0))
    iyc = jnp.clip(iy, 0, jnp.maximum(H_l.astype(jnp.int32) - 2, 0))
    r = iyc // _SY
    c = ixc // _SX
    row = off_l + r * C_l + c
    lane = (iyc - r * _SY) * _BX + (ixc - c * _SX)
    fx = x - ixc.astype(jnp.float32)
    fy = y - iyc.astype(jnp.float32)
    return row, lane, fx, fy, f, valid


# ---------------------------------------------------------------------------
# Lane extraction + bilinear combine
# ---------------------------------------------------------------------------

_CH = 1024  # points per extract-kernel grid step


def _bilin_from_taps(tl, tr, bl, br, fx, fy, f):
    top = (1.0 - fx) * tl + fx * tr
    bottom = (1.0 - fx) * bl + fx * br
    value = (1.0 - fy) * top + fy * bottom
    dx = (fy * (br - bl) + (1.0 - fy) * (tr - tl)) * f
    dy = (bottom - top) * f
    return value, dx, dy


def _extract_kernel(rows_ref, lane_ref, fx_ref, fy_ref, f_ref, out_ref):
    """(CH, 128) gathered rows -> (3, CH/128, 128) [value, dx, dy].

    Mosaic-legal lane extraction: per 128-observation sub-block, transpose
    (128, 128) so observations lie on LANES, then pick each tap with a
    one-hot SUBLANE reduction (~1.5k VPU ops/obs). Scalars travel as DENSE
    (n/128, 128) planes with (8, 128) blocks — (N, 1) columns tile-pad
    128x in HBM, (1, CH) blocks violate the (8, 128) block rule under
    vmap, and (8,128)->(1024,1) shape casts don't lower; this layout
    avoids all three."""
    mc = lane_ref.shape[0]
    for sb in range(mc):
        rt = rows_ref[sb * 128:(sb + 1) * 128, :].T  # (128, 128)
        lane = lane_ref[sb:sb + 1, :]  # (1, 128)
        fx = fx_ref[sb:sb + 1, :]
        fy = fy_ref[sb:sb + 1, :]
        f = f_ref[sb:sb + 1, :]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, rt.shape, 0)

        def tap(off):
            oh = (s_iota == lane + off).astype(jnp.float32)
            return jnp.sum(rt * oh, axis=0, keepdims=True)  # (1, 128)

        tl = tap(0)
        tr = tap(1)
        bl = tap(_BX)
        br = tap(_BX + 1)
        value, dx, dy = _bilin_from_taps(tl, tr, bl, br, fx, fy, f)
        out_ref[:, sb, :] = jnp.concatenate([value, dx, dy], axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def _extract_pallas(rows, lane, fx, fy, f, interpret: bool = False):
    n = rows.shape[0]
    pad = (-n) % _CH
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        lane = jnp.pad(lane, (0, pad))
        fx = jnp.pad(fx, (0, pad))
        fy = jnp.pad(fy, (0, pad))
        f = jnp.pad(f, (0, pad))
    npad = n + pad
    m = npad // 128
    mc = _CH // 128
    sc = lambda a, dt: a.reshape(m, 128).astype(dt)
    o = pl.pallas_call(
        _extract_kernel,
        grid=(npad // _CH,),
        in_specs=[
            pl.BlockSpec((_CH, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, mc, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, m, 128), jnp.float32),
        interpret=interpret,
    )(rows, sc(lane, jnp.int32), sc(fx, jnp.float32), sc(fy, jnp.float32),
      sc(f, jnp.float32))
    return (o[0].reshape(npad)[:n], o[1].reshape(npad)[:n],
            o[2].reshape(npad)[:n])


def _extract_xla(rows, lane, fx, fy, f):
    """XLA twin of the extract kernel (CPU path / equality tests)."""
    offs = jnp.asarray([0, 1, _BX, _BX + 1], jnp.int32)
    taps = jnp.take_along_axis(rows, lane[:, None] + offs[None, :], axis=1)
    return _bilin_from_taps(taps[:, 0], taps[:, 1], taps[:, 2], taps[:, 3],
                            fx, fy, f)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


_GCHUNK = 262_144  # obs per gather+extract block: bounds the transient
# (chunk, 128) gathered-rows tensor to 128 MB/image (at DSLR scale the
# unchunked (1.6M, 128) rows OOM'd HBM under an 8-image vmap)


def _bilinear_brick(brick: BrickPyramid, level, pix0, extract=None):
    """Brick twin of ``_bilinear_flat``: (value, dx, dy, valid)."""
    row, lane, fx, fy, f, valid = _brick_address(brick.meta, level, pix0)
    if extract is None:
        extract = _extract_pallas if _use_pallas() else _extract_xla
    n = row.shape[0]
    if n <= _GCHUNK:
        rows = brick.table[row]  # ONE row gather per (point, level)
        value, dx, dy = extract(rows, lane, fx, fy, f)
        return value, dx, dy, valid
    pad = (-n) % _GCHUNK

    def pd(a):
        return jnp.pad(a, (0, pad)).reshape(-1, _GCHUNK)

    def body(args):
        r_, l_, fx_, fy_, f_ = args
        rows = brick.table[r_]
        return extract(rows, l_, fx_, fy_, f_)

    v, dx, dy = jax.lax.map(body, (pd(row), pd(lane), pd(fx), pd(fy), pd(f)))
    return (v.reshape(-1)[:n], dx.reshape(-1)[:n], dy.reshape(-1)[:n],
            valid)


def brick_sample_with_derivs(brick: BrickPyramid, L: int, pix0, obs_scale,
                             extract=None):
    """Trilinear sample + derivatives from a brick pyramid — drop-in twin
    of ``photometric.optimizer._sample_pyramid_with_derivs`` given the
    prebuilt table: returns (value, d/dx, d/dy, d/dscale, ok)."""
    if L == 1:
        zero = jnp.zeros(pix0.shape[:-1], jnp.int32)
        v, dx, dy, ok = _bilinear_brick(brick, zero, pix0, extract)
        return v, dx, dy, jnp.zeros_like(v), ok
    si = jnp.clip(jnp.floor(obs_scale).astype(jnp.int32) + 1, 1, L - 1)
    z = 1.0 - (obs_scale - jnp.floor(obs_scale))
    vc, dxc, dyc, okc = _bilinear_brick(brick, si, pix0, extract)
    vf, dxf, dyf, okf = _bilinear_brick(brick, si - 1, pix0, extract)
    value = (1.0 - z) * vc + z * vf
    dpx = (1.0 - z) * dxc + z * dxf
    dpy = (1.0 - z) * dyc + z * dyf
    ds = -(vf - vc)
    return value, dpx, dpy, ds, okc & okf


def brick_sample(brick: BrickPyramid, L: int, pix0, obs_scale, extract=None):
    """Trilinear value + validity (twin of ``_sample_pyramid``)."""
    if L == 1:
        zero = jnp.zeros(pix0.shape[:-1], jnp.int32)
        v, _, _, ok = _bilinear_brick(brick, zero, pix0, extract)
        return v, ok
    si = jnp.clip(jnp.floor(obs_scale).astype(jnp.int32) + 1, 1, L - 1)
    z = 1.0 - (obs_scale - jnp.floor(obs_scale))
    vc, _, _, okc = _bilinear_brick(brick, si, pix0, extract)
    vf, _, _, okf = _bilinear_brick(brick, si - 1, pix0, extract)
    return (1.0 - z) * vc + z * vf, okc & okf
