"""Pallas TPU kernel: fused Gauss-Newton normal-equation accumulation.

The hot loop of ICP (and the pattern behind the photometric accumulation):
given per-correspondence 6-dof Jacobian vectors with the symmetric
point-to-plane block structure (+j at the target cloud's block, -j at the
source cloud's block), accumulate

    H = sum_i w_i J_i^T J_i   (6C x 6C),   b = sum_i w_i J_i^T r_i,
    cost = sum_i w_i r_i^2

WITHOUT materializing the (M, 6C) row matrix in HBM: rows are built in VMEM
per chunk (lane-major ``(6, M)`` layouts), contracted on the MXU into a
(6C, 6C) accumulator, and only the tiny outputs leave the chip. XLA's
equivalent one-hot formulation moves ~200 MB/iteration through HBM; this
kernel moves only the ~50 MB of inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dataset_pipeline_tpu.models.lie import quat_rotate


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _gn_kernel(j1_ref, j2_ref, r1_ref, r2_ref, sid_ref, tid_ref, w_ref,
               G_ref, *, C: int):
    """Accumulates the augmented Gram matrix G = [rows; r][rows; r]^T so one
    MXU contraction yields H (top-left), b (last data column), and the cost
    (corner) — also sidestepping Mosaic's constant-accumulator limitation on
    matrix-vector reductions."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)

    j1 = j1_ref[:]  # (8, CH) — rows 0..5 are the Jacobian, 6..7 zero padding
    j2 = j2_ref[:]
    r1 = r1_ref[:]  # (1, CH)
    r2 = r2_ref[:]
    sid = sid_ref[:]  # (1, CH) int32
    tid = tid_ref[:]
    w = w_ref[:]

    blocks1 = []
    blocks2 = []
    for c in range(C):
        s1 = ((tid == c).astype(jnp.float32) - (sid == c).astype(jnp.float32))
        blocks1.append(j1[:6, :] * s1)
        blocks2.append(j2[:6, :] * (-s1))  # residual 2: +j2 at src, -j2 at tgt
    sw = jnp.sqrt(w)
    S = _pad8(6 * C + 1)
    pad_rows = S - (6 * C + 1)
    zero = jnp.zeros((pad_rows, j1.shape[1]), jnp.float32)
    A1 = jnp.concatenate(blocks1 + [r1, zero], axis=0) * sw  # (S, CH)
    A2 = jnp.concatenate(blocks2 + [r2, zero], axis=0) * sw

    dims = (((1,), (1,)), ((), ()))
    G_ref[:] += (
        jax.lax.dot_general(A1, A1, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(A2, A2, dims, preferred_element_type=jnp.float32)
    )


@partial(jax.jit, static_argnames=("num_clouds", "chunk", "interpret"))
def icp_hb_cost_pallas(q, t, ps, ns, pt, nt, sid, tid, w,
                       num_clouds: int, chunk: int = 16384,
                       interpret: bool = False):
    """Drop-in replacement for the XLA H,b,cost accumulation.

    M must not be huge relative to VMEM per chunk; chunk rows are processed
    per grid step with double-buffered DMA handled by the Pallas pipeline.
    """
    C = num_clouds
    M = ps.shape[0]
    pad = (-M) % chunk
    if pad:
        z3 = jnp.zeros((pad, 3), ps.dtype)
        ps = jnp.concatenate([ps, z3])
        ns = jnp.concatenate([ns, z3])
        pt = jnp.concatenate([pt, z3])
        nt = jnp.concatenate([nt, z3])
        sid = jnp.concatenate([sid, jnp.zeros((pad,), sid.dtype)])
        tid = jnp.concatenate([tid, jnp.ones((pad,), tid.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    Mp = M + pad

    # Elementwise prep (one fused XLA pass): global-frame Jacobian vectors.
    gps = quat_rotate(q[sid], ps) + t[sid]
    gns = quat_rotate(q[sid], ns)
    gpt = quat_rotate(q[tid], pt) + t[tid]
    gnt = quat_rotate(q[tid], nt)
    diff = gpt - gps
    r1 = jnp.sum(gns * diff, -1)
    r2 = -jnp.sum(gnt * diff, -1)
    j1 = jnp.concatenate([gns, jnp.cross(gpt, gns)], -1)  # (M,6)
    j2 = jnp.concatenate([gnt, jnp.cross(gps, gnt)], -1)

    # lane-major layouts, sublanes padded 6 -> 8
    j1_t = jnp.zeros((8, Mp), jnp.float32).at[:6].set(j1.T)
    j2_t = jnp.zeros((8, Mp), jnp.float32).at[:6].set(j2.T)
    r1_t = r1[None, :]
    r2_t = r2[None, :]
    sid_t = sid[None, :].astype(jnp.int32)
    tid_t = tid[None, :].astype(jnp.int32)
    w_t = w[None, :]

    grid = Mp // chunk
    S = _pad8(6 * C + 1)
    G = pl.pallas_call(
        partial(_gn_kernel, C=C),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.float32),
        interpret=interpret,
    )(j1_t, j2_t, r1_t, r2_t, sid_t, tid_t, w_t)
    n = 6 * C
    return G[:n, :n], G[:n, n], G[n, n]


# ---------------------------------------------------------------------------
# Fully fused variant: pose transform + Jacobian construction inside the
# kernel. Inputs are the RAW local-frame points/normals (one packed (16, M)
# tensor + cloud ids); poses live in SMEM as scalars. Avoids the XLA prep
# pass of ``icp_hb_cost_pallas`` (the (8, M) Jacobian materialization and the
# (M, 4) ``q[sid]`` gather), cutting HBM traffic per correspondence from
# ~84+84 bytes to a single 72-byte read.
# ---------------------------------------------------------------------------


def _rot_rows(qr, c):
    """3x3 rotation-matrix entries (as traced scalars) of quaternion row c
    of SMEM ref ``qr`` (wxyz, assumed normalized)."""
    w, x, y, z = qr[c, 0], qr[c, 1], qr[c, 2], qr[c, 3]
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def _gn_fused_kernel(q_ref, t_ref, data_ref, sid_ref, tid_ref, G_ref, *, C: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)

    data = data_ref[:]  # (16, CH): ps, ns, pt, nt (3 rows each), w, 3 pad
    sid = sid_ref[:]  # (1, CH)
    tid = tid_ref[:]
    w = data[12:13, :]

    def transform(rows0, ids, translate):
        """Apply each cloud's pose to the (3, CH) block [rows0:rows0+3],
        one-hot selected by ids. All operands stay (1, CH)."""
        vx = data[rows0:rows0 + 1, :]
        vy = data[rows0 + 1:rows0 + 2, :]
        vz = data[rows0 + 2:rows0 + 3, :]
        ox = jnp.zeros_like(vx)
        oy = jnp.zeros_like(vx)
        oz = jnp.zeros_like(vx)
        for c in range(C):
            R = _rot_rows(q_ref, c)
            m = (ids == c).astype(jnp.float32)
            rx = R[0][0] * vx + R[0][1] * vy + R[0][2] * vz
            ry = R[1][0] * vx + R[1][1] * vy + R[1][2] * vz
            rz = R[2][0] * vx + R[2][1] * vy + R[2][2] * vz
            if translate:
                rx = rx + t_ref[c, 0]
                ry = ry + t_ref[c, 1]
                rz = rz + t_ref[c, 2]
            ox += m * rx
            oy += m * ry
            oz += m * rz
        return ox, oy, oz

    psx, psy, psz = transform(0, sid, True)
    nsx, nsy, nsz = transform(3, sid, False)
    ptx, pty, ptz = transform(6, tid, True)
    ntx, nty, ntz = transform(9, tid, False)

    dx, dy, dz = ptx - psx, pty - psy, ptz - psz
    r1 = nsx * dx + nsy * dy + nsz * dz
    r2 = -(ntx * dx + nty * dy + ntz * dz)
    # j1 = [n_s ; p_t x n_s], j2 = [n_t ; p_s x n_t]
    j1 = [nsx, nsy, nsz,
          pty * nsz - ptz * nsy, ptz * nsx - ptx * nsz, ptx * nsy - pty * nsx]
    j2 = [ntx, nty, ntz,
          psy * ntz - psz * nty, psz * ntx - psx * ntz, psx * nty - psy * ntx]

    sw = jnp.sqrt(w)
    S = _pad8(6 * C + 1)
    rows1 = []
    rows2 = []
    for c in range(C):
        s1 = ((tid == c).astype(jnp.float32) - (sid == c).astype(jnp.float32))
        rows1 += [j * s1 for j in j1]
        rows2 += [j * (-s1) for j in j2]
    rows1.append(r1)
    rows2.append(r2)
    pad = S - len(rows1)
    zero = jnp.zeros_like(r1)
    A1 = jnp.concatenate(rows1 + [zero] * pad, axis=0) * sw
    A2 = jnp.concatenate(rows2 + [zero] * pad, axis=0) * sw
    dims = (((1,), (1,)), ((), ()))
    G_ref[:] += (
        jax.lax.dot_general(A1, A1, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(A2, A2, dims, preferred_element_type=jnp.float32)
    )


def pack_icp_inputs(ps, ns, pt, nt, w, chunk: int = 16384):
    """Pack correspondences into the fused kernel's (16, Mp) layout once;
    reuse across iterations (the packed tensor is pose-independent)."""
    M = ps.shape[0]
    pad = (-M) % chunk
    Mp = M + pad
    data = jnp.zeros((16, Mp), jnp.float32)
    data = data.at[0:3, :M].set(ps.T)
    data = data.at[3:6, :M].set(ns.T)
    data = data.at[6:9, :M].set(pt.T)
    data = data.at[9:12, :M].set(nt.T)
    data = data.at[12, :M].set(w)
    return data


# ---------------------------------------------------------------------------
# Moment (monomial Gram) kernels: ONE pose-independent pass over the packed
# correspondence tensor yields per-chunk Grams of the local monomials
# (see ``icp/moments.py``); the host sums them in f64 per correspondence
# group, after which every inner LM iteration costs O(1).
#
# Roofline (v5e, 819 GB/s HBM, ~131 TFLOP/s f32 MXU = bf16/3):
#   bytes/corr = 64, ISSUED tile flops/corr = 2*128^2/3 ~ 10.9k
#   -> both bounds land within 2% of each other: MEASURED via the
#   repeat-delta harness (icp_moment_pallas_tri_sub_timed), the 8M-corr
#   pass takes 0.73 ms DMA-inclusive (707 GB/s, 86% of HBM peak) with a
#   compute-only time of 0.74 ms (~118 TFLOP/s issued, ~90% of f32 MXU
#   peak) — DMA and MXU fully overlap AT the roofline crossover. (Naive
#   per-dispatch timing through the remote relay reads 3-8 ms: that is
#   dispatch latency, not the kernel.)
# The naive (48, CH) x (CH, 48) Gram uses 48 of 128 MXU rows/cols: every
# 128-column pass wastes (1 - (48/128)^2) ~ 86% of the array.  The _tri
# kernel below stacks THREE 42-row monomial groups of three column-thirds
# into one (126, CH/3) operand -> same correspondences in 1/3 of the MXU
# passes at 98% row fill; the 128x128 output carries the three group Grams
# on its diagonal blocks (off-diagonal cross blocks are discarded).
# ---------------------------------------------------------------------------


def _moment_kernel(data_ref, out_ref):
    d = data_ref[:]  # (16, CH): ps, ns, pt, nt (3 rows each), w row 12
    sw = jnp.sqrt(d[12:13, :])
    b = jnp.concatenate([d[3:6, :], d[9:12, :]], axis=0) * sw  # (6, CH)

    # Kronecker block order (see ``icp/moments.py`` layout): [b] then
    # a_k * b for a = (ps_0, ps_1, ps_2, pt_0, pt_1, pt_2) — six
    # sublane-broadcast multiplies instead of 36 scalar-row products.
    blocks = [b]
    for i in (0, 1, 2, 6, 7, 8):
        blocks.append(d[i:i + 1, :] * b)
    blocks.append(jnp.zeros((6, d.shape[1]), jnp.float32))
    m = jnp.concatenate(blocks, axis=0)  # (48, CH)
    out_ref[0] = jax.lax.dot_general(
        m, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def icp_moment_pallas(data, chunk: int = 16384, interpret: bool = False):
    """Per-chunk monomial Grams from the packed (16, Mp) tensor.

    Returns (Mp//chunk, 48, 48) float32 partial Grams; the caller segment-sums
    them (in f64) per correspondence group — chunk->group mapping is the
    caller's (see ``icp/moments.py:pack_group_data``).
    """
    Mp = data.shape[1]
    assert Mp % chunk == 0, (Mp, chunk)
    grid = Mp // chunk
    return pl.pallas_call(
        _moment_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 48, 48), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 48, 48), jnp.float32),
        interpret=interpret,
    )(data)


def _monomials_42(dk):
    """(42, ch) monomial block from a packed (rows>=13, ch) slice — layout
    of ``icp/moments.py``: [b; a_k * b] with b = sqrt(w)*[ns; nt]."""
    sw = jnp.sqrt(dk[12:13, :])
    b = jnp.concatenate([dk[3:6, :], dk[9:12, :]], axis=0) * sw
    blocks = [b]
    for i in (0, 1, 2, 6, 7, 8):
        blocks.append(dk[i:i + 1, :] * b)
    return jnp.concatenate(blocks, axis=0)


def _moment_kernel_tri(data_ref, out_ref):
    d = data_ref[:]  # (13|16, CH)
    third = d.shape[1] // 3
    parts = [_monomials_42(d[:, k * third:(k + 1) * third]) for k in range(3)]
    m = jnp.concatenate(
        parts + [jnp.zeros((2, third), jnp.float32)], axis=0)  # (128, third)
    out_ref[0] = jax.lax.dot_general(
        m, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def icp_moment_pallas_tri(data, chunk: int = 24576, interpret: bool = False):
    """MXU-filling monomial Gram pass (see roofline note above).

    ``data``: packed (13, Mp) (or (16, Mp)) tensor, Mp a multiple of
    ``chunk`` and chunk divisible by 3*128. Returns (Mp//chunk, 128, 128)
    f32; the chunk's 42x42 monomial Gram is the SUM of the three diagonal
    blocks [0:42], [42:84], [84:126] (see :func:`moment_tri_extract`).
    """
    Mp = data.shape[1]
    assert Mp % chunk == 0, (Mp, chunk)
    assert chunk % (3 * 128) == 0, chunk
    grid = Mp // chunk
    rows = data.shape[0]
    return pl.pallas_call(
        _moment_kernel_tri,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 128, 128), jnp.float32),
        interpret=interpret,
    )(data)


def _moment_kernel_tri_sub(data_ref, out_ref, *, sub: int):
    """Tri kernel with an inner sub-tile loop: the (128, third) operand is
    processed ``sub`` columns at a time with a VMEM-resident (128, 128)
    accumulator, so the chunk (hence the DMA granularity) can grow well
    past the VMEM operand limit and the output is written once per chunk."""
    d = data_ref[:]
    third = d.shape[1] // 3
    acc = jnp.zeros((128, 128), jnp.float32)
    for j in range(third // sub):
        parts = [
            _monomials_42(d[:, k * third + j * sub: k * third + (j + 1) * sub])
            for k in range(3)
        ]
        m = jnp.concatenate(parts + [jnp.zeros((2, sub), jnp.float32)], 0)
        acc = acc + jax.lax.dot_general(
            m, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@partial(jax.jit, static_argnames=("chunk", "sub", "interpret"))
def icp_moment_pallas_tri_sub(data, chunk: int = 98304, sub: int = 8192,
                              interpret: bool = False):
    """Sub-tiled tri kernel (see :func:`icp_moment_pallas_tri`); chunk can
    exceed the VMEM operand limit. chunk % (3*sub) == 0 required."""
    Mp = data.shape[1]
    assert Mp % chunk == 0, (Mp, chunk)
    assert chunk % (3 * sub) == 0 and sub % 128 == 0, (chunk, sub)
    grid = Mp // chunk
    rows = data.shape[0]
    return pl.pallas_call(
        partial(_moment_kernel_tri_sub, sub=sub),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(data)


@partial(jax.jit, static_argnames=("chunk", "sub", "repeats"))
def icp_moment_pallas_tri_sub_timed(data2, chunk: int = 49152,
                                    sub: int = 8192, repeats: int = 1):
    """Benchmark harness for the tri_sub kernel: the grid gains a repeat
    dimension whose index alternates between TWO copies of the packed
    tensor — consecutive repeats therefore force REAL HBM re-reads (a
    repeat-invariant index map would let Pallas keep the block resident).
    Device pass time = (T(repeats=R) - T(repeats=1)) / (R - 1),
    independent of the dispatch/relay latency that otherwise dominates
    sub-10ms kernels. ``data2``: (2, rows, Mp)."""
    Mp = data2.shape[2]
    rows = data2.shape[1]
    assert Mp % chunk == 0 and chunk % (3 * sub) == 0

    def body(data_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[0] = jnp.zeros((128, 128), jnp.float32)
        d = data_ref[0]
        third = d.shape[1] // 3
        acc = jnp.zeros((128, 128), jnp.float32)
        for j in range(third // sub):
            parts = [
                _monomials_42(
                    d[:, k * third + j * sub: k * third + (j + 1) * sub])
                for k in range(3)
            ]
            m = jnp.concatenate(
                parts + [jnp.zeros((2, sub), jnp.float32)], 0)
            acc = acc + jax.lax.dot_general(
                m, m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] += acc

    grid = Mp // chunk
    return pl.pallas_call(
        body,
        grid=(grid, repeats),  # chunk-major: out block revisits consecutive
        in_specs=[pl.BlockSpec((1, rows, chunk), lambda i, r: (r % 2, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, r: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(data2)


def moment_tri_extract(parts):
    """(grid, 128, 128) tri-kernel output -> (grid, 42, 42) chunk Grams
    (works on numpy or jnp arrays)."""
    return (parts[:, 0:42, 0:42] + parts[:, 42:84, 42:84]
            + parts[:, 84:126, 84:126])


@partial(jax.jit, static_argnames=("num_clouds", "chunk", "interpret"))
def icp_hb_cost_pallas_fused(q, t, data, sid, tid,
                             num_clouds: int, chunk: int = 16384,
                             interpret: bool = False):
    """H,b,cost from packed inputs (see ``pack_icp_inputs``) and poses.

    ``sid``/``tid`` are the UNPADDED (M,) cloud ids; padding rows get
    sid=0/tid=0 so their one-hot difference (and hence their rows) vanish,
    and w=0 kills their cost contribution.
    """
    C = num_clouds
    Mp = data.shape[1]
    M = sid.shape[0]
    pad = Mp - M
    sid_t = jnp.zeros((1, Mp), jnp.int32).at[0, :M].set(sid.astype(jnp.int32))
    tid_t = jnp.zeros((1, Mp), jnp.int32).at[0, :M].set(tid.astype(jnp.int32))

    grid = Mp // chunk
    S = _pad8(6 * C + 1)
    G = pl.pallas_call(
        partial(_gn_fused_kernel, C=C),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q.astype(jnp.float32), t.astype(jnp.float32), data, sid_t, tid_t)
    n = 6 * C
    return G[:n, :n], G[:n, n], G[n, n]
