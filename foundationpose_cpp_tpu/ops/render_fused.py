"""Fused render megakernel: rasterize + interpolate + shade in one pass.

This is the production render branch. The reference runs ~10 sequential CUDA
kernels over global memory per render (rasterize -> 3x interpolate -> texture
-> refine_color -> clamp -> flip -> threshold -> concat,
foundationpose_render.cpp:611-729). A literal translation is hopeless on TPU
because every stage after rasterization is a per-pixel GATHER, and XLA:TPU
executes random gathers at ~23 M fetches/s (measured) -- the unfused pipeline
spends seconds per 252-view render on index traffic alone.

The fused design eliminates every per-pixel gather and every runtime sort:

- mesh tables are FACE-EXPANDED offline (face_verts/face_normals/face_colors,
  (F,3,*)) and the faces are ordered by the MORTON CODE of their centroid at
  build time: the face->vertex indirection disappears, and object-space
  locality guarantees screen-space locality under any pose, so a contiguous
  chunk of faces lands in a compact screen region for every view. (Runtime
  spatial sorting is off the table: XLA:TPU variadic sort compile time
  explodes with operand count -- a 34-operand lax.sort never finished
  compiling.)
- texturing never gathers. Two modes: (a) corner colors -- texture sampled
  at the three corner UVs offline, blended barycentrically in-kernel; (b)
  PER-FACE TEXEL PATCHES (patch_k > 0, the production default) -- each face
  carries a pk x pk resample of its UV-bbox texture region
  (face_texel_patches) and the kernel evaluates it at the pixel's
  barycentric position with a hat-weight tensor product (= bilinear on the
  patch grid). Patches reproduce the reference's per-pixel bilinear fetch
  (texture.cu:131-179) to the patch's Nyquist: on a sharp-textured scan
  mesh, render-level error vs the reference shader drops 0.054 -> 0.031
  mean at the ORIGINAL face count, beating 2 rounds of subdivision
  (0.037 at 4x the faces, 3.5x the render time). Pipelines that need
  texel-exact rendering use the unfused path (ops.rasterize +
  texture_bilinear_wrap), bit-faithful but gather-bound on TPU.
- culling is a per-(view, tile) BITMASK over face chunks, built in XLA from
  chunk union bboxes (segment min/max, no gathers) and stored in SMEM: the
  CudaRaster bin/coarse stages collapse into `(word >> bit) & 1`.
- the kernel runs two phases per tile with STATIC loop bounds by default
  (Mosaic compile time explodes on dynamic-bound loops: 6 s static vs 78 s
  dynamic vs minutes for cond-in-loop, measured; the opt-in
  p1_livelist/p2_dynamic knobs trade that safety for zero dead trips --
  dynamic trip COUNTS around the unchanged static bodies): a depth phase (exact edge functions +
  screen-affine z/w plane -> nearest-depth winner per pixel) and an attribute
  phase that revisits only chunks containing winners, masked-reducing the
  winner's corner attributes and barycentrics. Lambert shading
  (renfine_color semantics) and the pointcloud threshold/downscale run on the
  selected values before the single (8, 256) output store per tile.

Output equals render_and_transform's render branch (color, xyz shaded,
flipped, thresholded) up to the vertex-sampled-texture substitution; tests
pin it against the unfused ops with per-vertex colors.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundationpose_cpp_tpu.meshio.mesh_loader import MeshAsset

_BIG = 2**30
# 16x16-pixel tiles (256 lanes): with typical face bboxes of 3-6 px the tile
# must be comfortably larger than a face or chunk bboxes span many tiles.
TILE_H = 32
TILE_W = 32
LANES = TILE_H * TILE_W  # 1024
QS = 256  # lanes per 16x16 quadrant (quadrant-major lane layout)
# phase-1 packed depth key: pos-in-chunk rides the low mantissa bits of
# bitcast(z/w + 1.5); chunk size must be a power of two (the pos mask is
# chunk-1), so depth is quantized by `chunk` ulps (~3e-5 at chunk=128)
_BIG_I = 0x7F000000  # > any packed key (zw+1.5 in [0.5, 2.5]); fits int32
# chunk loops fully unroll up to this many chunks. Beyond ~50 unrolled
# chunk bodies the kernel's instruction stream hits a Mosaic cliff
# (measured: a 52-chunk mesh 339 ms unrolled vs 170 ms as fori at finer
# chunks; a 62-chunk unroll 231 ms vs 108 ms at 31 chunks), so the bound
# stays safely below it.
_UNROLL_MAX = 48


def sample_texture_at_uv(texture: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Numpy bilinear-wrap texture sampling at (u, 1-v) -- matches the
    renderer's uv flip + TextureFwdKernelLinear1 semantics exactly."""
    th, tw, _ = texture.shape
    mu = uv[:, 0] * tw - 0.5
    mv = (1.0 - uv[:, 1]) * th - 0.5
    iu0 = np.floor(mu).astype(np.int64)
    iv0 = np.floor(mv).astype(np.int64)
    fu = (mu - iu0)[:, None]
    fv = (mv - iv0)[:, None]
    u0, u1 = iu0 % tw, (iu0 + 1) % tw
    v0, v1 = iv0 % th, (iv0 + 1) % th
    return (
        texture[v0, u0] * (1 - fu) * (1 - fv)
        + texture[v0, u1] * fu * (1 - fv)
        + texture[v1, u0] * (1 - fu) * fv
        + texture[v1, u1] * fu * fv
    ).astype(np.float32)


def vertex_colors_seam_robust(texture: np.ndarray, uvs: np.ndarray) -> np.ndarray:
    """(V, C) texture sampled at each vertex UV, seam-robust.

    Sampling EXACTLY at a UV-wrap boundary (u or v within half a texel of
    0/1) bilinearly blends opposite texture edges (wrap semantics,
    texture.cu:131-179); a vertex sample there would smear that blend
    across every incident face when the fused kernel interpolates corner
    colors. Boundary UVs are clamped half a texel inside; interior UVs
    sample exactly, unchanged.
    """
    th, tw = texture.shape[:2]
    uvn = np.asarray(uvs, np.float64).copy()
    # tiled UVs (outside [0, 1], standard for repeated textures) wrap first
    # -- pointwise sampling is wrap-periodic, so u % 1 samples identically
    # to sample_texture_at_uv's own iu0 % tw. Values already in [0, 1]
    # (including exactly 0/1) are left alone so pinned seam behavior at the
    # boundary is unchanged; clamping UNwrapped tiled UVs instead would pin
    # most of the mesh to the texture's border color.
    outside = (uvn < 0.0) | (uvn > 1.0)
    uvn = np.where(outside, uvn - np.floor(uvn), uvn)
    uvn[:, 0] = np.clip(uvn[:, 0], 0.5 / tw, 1.0 - 0.5 / tw)
    uvn[:, 1] = np.clip(uvn[:, 1], 0.5 / th, 1.0 - 0.5 / th)
    return sample_texture_at_uv(texture, uvn)


def face_corner_colors(
    texture: np.ndarray, uvs: np.ndarray, faces: np.ndarray
) -> np.ndarray:
    """(F, 3, C) seam-robust texture colors at each face corner."""
    return vertex_colors_seam_robust(texture, uvs)[faces]


def face_texel_patches(
    texture: np.ndarray, uvs: np.ndarray, faces: np.ndarray, pk: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Per-face pk x pk texel patch over the face's UV bounding box.

    The per-pixel texturing option of the fused kernel: instead of three
    corner colors, each face carries a small resampled texture patch; the
    kernel evaluates it at the pixel's barycentric position with a
    tensor-product hat-weight blend (= bilinear on the patch grid). This is
    the TPU-shaped analogue of the reference's per-pixel bilinear fetch
    (texture.cu:131-179): the gather into the full texture becomes
    arithmetic over values already extracted by phase 2's one-hot matmul.

    Returns (patches (F, C, pk, pk) [channel, t(row), s(col)],
    corner_st (F, 3, 2) patch coords of the three corners scaled to
    [0, pk-1]). Samples are seam-robust like the corner path.
    """
    th, tw = texture.shape[:2]
    fuv = np.asarray(uvs, np.float64)[faces]  # (F, 3, 2)
    lo = fuv.min(axis=1)
    # tiled UVs: translate each face by the integer part of its bbox min so
    # the patch region starts inside [0, 1) -- intra-face deltas (and hence
    # st) are translation-invariant, and the resample points that spill past
    # 1 wrap correctly inside sample_texture_at_uv. Without this a face at
    # u in [2.2, 2.4] would clamp-sample the texture border.
    fuv = fuv - np.floor(lo)[:, None, :]
    lo = fuv.min(axis=1)
    hi = fuv.max(axis=1)
    # floor the extent at one texel so degenerate-UV faces still sample a
    # sane neighborhood (and the corner-coord division is well-defined)
    ext = np.maximum(hi - lo, np.array([1.0 / tw, 1.0 / th]))
    nf = faces.shape[0]
    g = np.linspace(0.0, 1.0, pk)
    us = lo[:, None, 0] + ext[:, None, 0] * g[None, :]  # (F, pk)
    vs = lo[:, None, 1] + ext[:, None, 1] * g[None, :]
    uu = np.broadcast_to(us[:, None, :], (nf, pk, pk))  # cols vary s (u)
    vv = np.broadcast_to(vs[:, :, None], (nf, pk, pk))  # rows vary t (v)
    pts = np.stack([uu, vv], axis=-1).reshape(-1, 2)
    cols = vertex_colors_seam_robust(texture, pts).reshape(nf, pk, pk, -1)
    st = ((fuv - lo[:, None, :]) / ext[:, None, :] * (pk - 1)).astype(
        np.float32
    )
    return cols.transpose(0, 3, 1, 2).astype(np.float32), st


def eval_texel_patches(
    patches: np.ndarray, st: np.ndarray, bary: np.ndarray
) -> np.ndarray:
    """Numpy oracle for the kernel's patch blend.

    patches (F, C, pk, pk), st (F, 3, 2), bary (P, 3) barycentric probe
    weights -> (F, P, C) colors. Hat-weight tensor product == bilinear on
    the patch grid; matches the in-kernel arithmetic exactly.
    """
    pk = patches.shape[-1]
    s = np.einsum("pj,fj->fp", bary, st[:, :, 0])  # (F, P)
    t = np.einsum("pj,fj->fp", bary, st[:, :, 1])
    s = np.clip(s, 0.0, pk - 1.0)
    t = np.clip(t, 0.0, pk - 1.0)
    i = np.arange(pk, dtype=np.float64)
    ws = np.maximum(0.0, 1.0 - np.abs(s[..., None] - i))  # (F, P, pk)
    wt = np.maximum(0.0, 1.0 - np.abs(t[..., None] - i))
    return np.einsum("fpi,fpj,fcij->fpc", wt, ws, patches)


def face_patch_error(
    texture: np.ndarray,
    uvs: np.ndarray,
    faces: np.ndarray,
    pk: int = 4,
    n_grid: int = 4,
    reduce: str = "mean",
) -> np.ndarray:
    """(F,) color error of pk-patch sampling vs per-pixel texturing,
    probed on a barycentric grid (the patch analogue of
    subdivide.face_sampling_error).

    reduce="mean" (default) is the EXPECTED error of a pixel landing
    uniformly in the face -- the quantity that tracks render-level error.
    "max" is the worst probe; on speckled textures (per-texel noise) the
    max is irreducible under subdivision and wildly overstates the render
    error (measured: scan mesh render error 0.031 mean while 40% of faces
    have probe-max > 0.10)."""
    patches, st = face_texel_patches(texture, uvs, faces, pk)
    # interior barycentric probe grid
    probes = []
    for a in range(n_grid + 1):
        for b in range(n_grid + 1 - a):
            probes.append(
                (a / n_grid, b / n_grid, (n_grid - a - b) / n_grid)
            )
    bary = np.asarray(probes)
    approx = eval_texel_patches(patches, st, bary)  # (F, P, C)
    fuv = np.asarray(uvs, np.float64)[faces]
    uv_p = np.einsum("pj,fjc->fpc", bary, fuv).reshape(-1, 2)
    exact = vertex_colors_seam_robust(texture, uv_p).reshape(
        approx.shape
    )
    err = np.abs(approx - exact).max(axis=2)  # (F, P) worst channel
    if reduce == "mean":
        return err.mean(axis=1).astype(np.float32)
    return err.max(axis=1).astype(np.float32)


def morton_order(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Sort order of 3-D points along a Morton (Z-order) curve."""
    pts = np.asarray(points, dtype=np.float64)
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-12)
    q = np.clip(((pts - lo) / span * (2**bits - 1)).astype(np.uint64), 0, 2**bits - 1)
    code = np.zeros(pts.shape[0], dtype=np.uint64)
    for b in range(bits):
        for axis in range(3):
            code |= ((q[:, axis] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + axis
            )
    return np.argsort(code, kind="stable")


# above this many faces, greedy clustering runs per Morton block of
# _CLUSTER_BLOCK faces instead of globally: the global O(F^2/chunk)
# distance work is ~0.1 s at 6k faces but ~5 s at 57k, while blockwise
# clustering stays ~0.1 s and costs only a few % more quadrant visits
# (6016-face sphere: global 397/view, block-2048 419, morton 525)
_CLUSTER_GLOBAL_MAX = 20_000
_CLUSTER_BLOCK = 4096


def cluster_order(points: np.ndarray, chunk: int) -> np.ndarray:
    """Order 3-D points into compact groups of `chunk` by greedy
    nearest-to-seed growth (seeds advance in Morton order).

    Phase 1 of the megakernel culls FACE CHUNKS by the screen bbox of
    `chunk` consecutive faces, so chunk compactness in object space is
    what bounds the wasted (face, pixel) evaluations. A Morton curve
    gives locality but its chunks are elongated curve segments; greedy
    radial growth around a seed yields near-disk patches -- measured on
    the 6016-face bench sphere (numpy prepass replica, 252 views):
    quadrant visits/view 525 -> 397 (-24%), livelist entries 222 -> 180,
    phase-2 window visits unchanged. Deterministic. Within each patch,
    faces keep their Morton sub-order so phase-2 winner index ranges stay
    compact; large meshes cluster per Morton block (see _CLUSTER_BLOCK).
    """
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n > _CLUSTER_GLOBAL_MAX:
        mo = morton_order(pts)
        parts = []
        for s0 in range(0, n, _CLUSTER_BLOCK):
            sub = mo[s0 : s0 + _CLUSTER_BLOCK]
            parts.append(sub[cluster_order(pts[sub], chunk)])
        return np.concatenate(parts)
    morton = morton_order(pts)
    morton_rank = np.argsort(morton)
    unassigned = np.ones(n, bool)
    order = np.empty(n, dtype=np.int64)
    got = 0
    ptr = 0
    while got < n:
        while ptr < n and not unassigned[morton[ptr]]:
            ptr += 1
        seed = morton[ptr]
        d = np.einsum("ij,ij->i", pts - pts[seed], pts - pts[seed])
        d[~unassigned] = np.inf
        k = min(chunk, n - got)
        take = np.argpartition(d, k - 1)[:k]
        # stable within the patch: keep Morton sub-order so phase-2 winner
        # ranges stay index-compact
        take = take[np.argsort(morton_rank[take], kind="stable")]
        order[got : got + k] = take
        unassigned[take] = False
        got += k
    return order


def _weld_positions(verts: np.ndarray) -> np.ndarray:
    """Canonical vertex id per position (seam/pole duplicates welded)."""
    key = np.round(np.asarray(verts, np.float64) * 1e6).astype(np.int64)
    _, canon = np.unique(key, axis=0, return_inverse=True)
    return canon


def winding_consistent_closed(verts: np.ndarray, faces: np.ndarray) -> bool:
    """True iff the mesh is watertight AND consistently wound.

    Pure topology (no normals): after positional welding, every directed
    edge must appear exactly once and its reverse exactly once. Under that
    condition backfaces of the closed surface are always occluded, so
    winding-based backface culling cannot change the rendered image.
    """
    canon = _weld_positions(verts)
    f = canon[np.asarray(faces, np.int64)]
    nd = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 2] != f[:, 0])
    f = f[nd]
    if f.shape[0] == 0:
        return False
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    eid = (edges[:, 0] << 32) | edges[:, 1]
    uniq, counts = np.unique(eid, return_counts=True)
    if (counts != 1).any():
        return False
    rev = (edges[:, 1] << 32) | edges[:, 0]
    return bool(np.isin(rev, uniq, assume_unique=False).all())


def signed_volume(verts: np.ndarray, faces: np.ndarray) -> float:
    fv = np.asarray(verts, np.float64)[faces]
    return float(
        np.einsum("fi,fi->f", fv[:, 0], np.cross(fv[:, 1], fv[:, 2])).sum() / 6.0
    )


def auto_kernel_knobs(num_faces: int) -> dict:
    """Per-mesh production schedule for the megakernel.

    Swept on a v5e at 252 views x 160x160 (tools/sweep_fused.py,
    round 4): 64-face phase-1 chunks cull measurably tighter than 128/256
    (phase 1 alone 36.7 vs 39.5/49.7 ms on the 6016-face sphere) and a
    1024-wide phase-2 superwindow amortizes the extraction dot's fixed
    cost (58.0 ms total vs 59.8 at w512 vs 79.8 at the old chunk-256
    defaults, patch mode; at scan scale, 28k faces, 158 vs 175 ms).
    The dynamic-trip knobs (livelist phase 1, winner-range phase 2) are
    the module defaults already. Scan-scale meshes (~28k faces) keep the
    same shape -- the livelist makes the chunk count a per-tile trip
    count, not a loop bound. Small meshes cap the window at the face
    count's padding granularity: the tables pad to max(chunk, p2_window)
    faces, so a 12-face cube at w1024 would pay an 85x-padded table and a
    1024-wide extraction dot per visit for nothing.
    """
    w = 128
    while w < num_faces and w < 1024:
        w *= 2
    return {"chunk": 64, "p2_window": w}


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["face_verts", "face_normals", "face_colors", "face_patch"],
    meta_fields=["num_faces", "diameter", "backface_cull_ok", "patch_k",
                 "kernel_chunk", "kernel_p2_window", "kernel_p2_anchor",
                 "kernel_views_pp"],
)
@dataclasses.dataclass(frozen=True)
class FusedMeshTables:
    """Face-expanded, Morton-ordered mesh constants for the megakernel.

    backface_cull_ok records the build-time proof that winding-based
    backface culling is output-identical for this mesh (watertight +
    consistent winding, normalized to outward). The reference renders
    double-sided (foundationpose_render.cu:201 setRenderModeFlags(0)), so
    culling is only an optimization where it provably cannot change the
    image -- the kernel skips ~half the faces of a closed mesh.

    patch_k > 0 enables PER-PIXEL texturing via per-face texel patches
    (face_texel_patches): face_patch holds a component-major
    (6 + 3*pk^2 [+ row pad], F) table of corner patch-coords + pk x pk
    texels; the kernel blends it at each pixel's barycentric position
    instead of interpolating the three corner colors. face_colors stays
    populated either way (trainers and oracles use it).
    """

    face_verts: jnp.ndarray  # (F, 3, 3) centered corner positions
    face_normals: jnp.ndarray  # (F, 3, 3) corner normals
    face_colors: jnp.ndarray  # (F, 3, 3) texture sampled at corner UVs
    num_faces: int
    diameter: float
    backface_cull_ok: bool = False
    face_patch: jnp.ndarray | None = None  # (6 + 3*pk^2 + pad, F)
    patch_k: int = 0
    # production kernel schedule for this mesh (auto_kernel_knobs); None =
    # use render_views_fused's signature defaults. Scheduling only -- the
    # rendered image is knob-invariant (pinned by tests).
    kernel_chunk: int | None = None
    kernel_p2_window: int | None = None
    kernel_p2_anchor: bool = False
    kernel_views_pp: int | None = None

    @staticmethod
    def from_asset(
        asset: MeshAsset,
        face_pad: int | None = None,
        as_numpy: bool = False,
        texture_patch_k: int = 0,
    ) -> "FusedMeshTables":
        """face_pad: pad the tables to a multiple of this with all-zero
        (degenerate -> prepass-culled) faces, so meshes with different face
        counts share one kernel executable (num_faces is a static shape).

        as_numpy keeps the tables host-side (numpy) -- used by bulk builders
        (training/multi.build_mesh_bank) that restack many meshes before one
        device transfer; dozens of small H2D dispatches are pathologically
        slow over a high-latency device tunnel.

        texture_patch_k: per-face texel patch edge (0 = corner sampling);
        4 is the production setting (see face_texel_patches)."""
        centered = asset.vertices - asset.model_center[None, :]
        faces0 = np.asarray(asset.faces)
        cull_ok = winding_consistent_closed(centered, faces0)
        if cull_ok and signed_volume(centered, faces0) < 0:
            faces0 = faces0[:, ::-1]  # normalize to outward winding
        fv = centered[faces0]  # (F, 3, 3)
        # compact CHUNKS, not just a locality curve: phase 1 culls by the
        # union bbox of `chunk` consecutive faces (see cluster_order)
        order = cluster_order(
            fv.mean(axis=1), auto_kernel_knobs(fv.shape[0])["chunk"]
        )
        faces = faces0[order]
        fv = centered[faces]
        fn = asset.vertex_normals[faces]
        fc = face_corner_colors(asset.texture, asset.texcoords, faces)
        patch_rows = None
        pk = int(texture_patch_k)
        if pk:
            patches, st = face_texel_patches(
                asset.texture, asset.texcoords, faces, pk=pk
            )
            # component-major rows: [s0 t0 s1 t1 s2 t2 | texels c-major]
            nf = faces.shape[0]
            patch_rows = np.concatenate(
                [st.reshape(nf, 6), patches.reshape(nf, 3 * pk * pk)],
                axis=1,
            ).T  # (6 + 3*pk^2, F)
            rpad = (-patch_rows.shape[0]) % 8  # sublane alignment
            if rpad:
                patch_rows = np.concatenate(
                    [patch_rows,
                     np.zeros((rpad, nf), patch_rows.dtype)], axis=0
                )
        if face_pad is not None:
            pad = (-fv.shape[0]) % face_pad

            def _pad(a, axis=0):
                if not pad:
                    return a
                width = [(0, 0)] * a.ndim
                width[axis] = (0, pad)
                return np.pad(a, width)

            fv, fn, fc = _pad(fv), _pad(fn), _pad(fc)
            if patch_rows is not None:
                patch_rows = _pad(patch_rows, axis=1)
        conv = (lambda a: np.asarray(a, np.float32)) if as_numpy else (
            lambda a: jnp.asarray(a, jnp.float32)
        )
        knobs = auto_kernel_knobs(int(fv.shape[0]))
        return FusedMeshTables(
            face_verts=conv(fv),
            face_normals=conv(fn),
            face_colors=conv(fc),
            num_faces=int(fv.shape[0]),
            diameter=float(asset.diameter),
            backface_cull_ok=cull_ok,
            face_patch=None if patch_rows is None else conv(patch_rows),
            patch_k=pk,
            kernel_chunk=knobs["chunk"],
            kernel_p2_window=knobs["p2_window"],
            kernel_p2_anchor=knobs.get("p2_anchor", False),
            kernel_views_pp=knobs.get("views_pp"),
        )


# ---------------------------------------------------------------------------
# kernel


def _fused_kernel(
    coeff_ref,  # (1, F_pad, 16) VMEM: [a0(3) a1(3) a2(3) zwplane(3) pad]
    attr_ref,  # (1, 24|32, F_pad) VMEM: the pre-combined phase-2 table --
    #            9 edge-coefficient rows, then corner attributes
    #            (patch mode: corners x [x y z d] + 3 pad rows; corner mode:
    #            corners x [r g b x y z d pad], final pad row dropped)
    bits_ref,  # (1, n_tiles, W32) SMEM i32: chunk-overlap bitmask per tile
    cbb_ref,  # (1, n_chunks, 4) SMEM f32: chunk bboxes [y0 y1 x0 x1]
    trans_ref,  # (1, 1, 8) SMEM: [tx ty tz 0 0 0 0 0]
    *rest,  # [patch_ref (rows_p, F_pad) VMEM when patch_k]
    #         [live_ref (1, n_tiles, 1+n_chunks) SMEM when p1_livelist]
    #         out, scratches
    n_chunks,
    chunk,
    img_h,
    img_w,
    n_tx,
    w_ambient,
    w_diffuse,
    min_depth,
    max_depth,
    inv_downscale,
    debug_phase1_only=False,
    quadrant_split=True,
    patch_k=0,
    p2_window=None,
    p1_group=1,
    p1_livelist=False,
    p2_dynamic=False,
    p1_bf16=False,
    p1_unroll=1,
    p2_anchor=False,
    views_pp=1,
):
    """Control flow is static fori + @pl.when by default (see module
    docstring); pixel state lives in VMEM scratch because predicated bodies
    cannot carry loop values.

    Two DYNAMIC-trip-count options trade Mosaic's static-loop safety for
    skipping dead iterations outright (fori trip machinery costs ~50 cycles
    per (tile, chunk) even when the body is predicated off, and meshes past
    _UNROLL_MAX chunks pay it for every chunk):
      p1_livelist: phase 1 loops over a precomputed per-(view, tile) list of
        live chunk ids (SMEM, built in the XLA prepass from the same overlap
        test as the bitmask) -- trip count == live chunks, zero dead visits.
      p2_dynamic: phase 2 loops fori(lo, hi) over the winner Morton range's
        chunk span instead of range-testing every chunk -- typically 1-3
        trips instead of n_chunks.
    """
    rest = list(rest)
    patch_ref = rest.pop(0) if patch_k else None
    live_ref = rest.pop(0) if p1_livelist else None
    out_ref, state_f_ref, state_i_ref = rest
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    # QUADRANT-MAJOR lane layout: lane = q*QS + r16*16 + c16 with quadrant
    # q = qy*2 + qx of the 32x32 tile. Contiguous 256-lane slices are then
    # 16x16 pixel quadrants, so per-chunk bbox tests can skip 3/4 of the
    # tile's pixels for the typical small chunk (the host untile inverts
    # this layout).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    q_id = lane // QS
    r16 = (lane % QS) // 16
    c16 = lane % 16
    py = ty * TILE_H + (q_id // 2) * 16 + r16
    px = tx * TILE_W + (q_id % 2) * 16 + c16
    fy = (2.0 * py.astype(jnp.float32) + 1.0) / img_h - 1.0
    fx = (2.0 * px.astype(jnp.float32) + 1.0) / img_w - 1.0

    t_lin = ty * n_tx + tx
    pos_mask = chunk - 1
    # basis rows (fx, fy, 1) for evaluating affine quantities via MXU dots.
    # p1_bf16: the phase-1 plane-eval dot is K=12-bound on the MXU (the
    # contraction dim is 12 of a 128-wide tile, so the f32 pass runs at
    # <10% utilization); bf16 operands double the per-tile rate at the
    # cost of ~2^-9 relative edge/depth error -- sub-1/16-pixel silhouette
    # jitter, comparable to CudaRaster's 4-bit subpixel snap
    # (Constants.hpp:23). f32 accumulation is kept either way.
    p1_dt = jnp.bfloat16 if p1_bf16 else jnp.float32
    basis = jnp.concatenate(
        [fx, fy, jnp.ones((1, LANES), jnp.float32)], axis=0
    ).astype(p1_dt)

    # pos-in-chunk iota, hoisted out of both loops (constant)
    lane_span = QS if quadrant_split else LANES
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, lane_span), 0)

    # block-diagonal basis: ONE (chunk, 12) x (12, 4*span) MXU dot per visit
    # evaluates all four affine planes (3 edges + z/w) at once -- per-visit
    # fixed cost is what phase 1 pays for, so fewer/larger dots win. Row
    # layout: rows 3k..3k+2 carry (fx, fy, 1) in column block k.
    def _block_diag_basis(qs):
        blocks = []
        for k in range(4):
            col = [jnp.zeros((3, lane_span), p1_dt)] * 4
            col[k] = basis[:, qs : qs + lane_span]
            blocks.append(jnp.concatenate(col, axis=0))  # (12, span)
        return jnp.concatenate(blocks, axis=1)  # (12, 4*span)

    n_q = 4 if quadrant_split else 1
    basis12 = [_block_diag_basis(q * lane_span) for q in range(n_q)]
    # one-hot iota, hoisted out of the loop (constant); per visit the
    # compare is against the WINDOW-RELATIVE winner index so no (p2w,
    # span) add is spent shifting the iota. Phase 2 visits sub-windows of
    # p2w <= chunk faces: the extraction dot's cost is rows x window, and
    # winners inside one tile are Morton-local (typically spanning far
    # fewer than 128 positions), so narrower windows skip dead table
    # columns that phase 1's coarser chunks must keep for culling economy.
    p2w = p2_window or chunk
    span = LANES  # phase 2 works full-tile spans (n_span = 1, see below)
    pos_lanes = jax.lax.broadcasted_iota(jnp.int32, (p2w, span), 0)

    def _render_one_view(vi):
        # the whole per-view pipeline; everything above (lane
        # geometry, MXU bases, iotas) is tile-constant and shared
        # by all views_pp views of this program
        def chunk_live(ci):
            word = bits_ref[vi, t_lin, ci // 32]
            return ((word >> (ci % 32)) & 1) != 0


        # scratch rows: i[0]=packed depth|pos key, i[1]=winning chunk id
        # Phase 1 is VPU-bandwidth-bound on (chunk, QS) temporaries, so the
        # winner state is ONE packed int32 key per pixel: the low log2(chunk)
        # mantissa bits of (z/w + 1.5) are replaced by the face's position
        # inside its chunk. f32 bit patterns of positives are order-isomorphic,
        # so a single min-reduce yields the nearest-depth winner with
        # lowest-pos tie-breaking (the old formulation needed two reduces plus
        # an equality/tie cascade per visit -- measured ~2x the VPU work).
        # Depth is quantized by `chunk` ulps (~3e-5 in zw units at 128): winner
        # flips only between near-coplanar faces, where either is correct.
        state_i_ref[0:1] = jnp.full((1, LANES), _BIG_I, jnp.int32)
        state_i_ref[1:2] = jnp.zeros((1, LANES), jnp.int32)


        # ---- phase 1: nearest-depth winner per pixel --------------------------
        def depth_chunk_quadrant(ci, cf, q, qs):
            # all four affine planes in one MXU dot; the VPU keeps only
            # coverage + one min-reduce. Edges are orientation-normalized in
            # the prepass (covered = all >= 0); invalid/degenerate faces carry
            # an always-negative edge constant, so no degeneracy guard is
            # needed.
            evall = jax.lax.dot_general(
                cf[:, 0:12].astype(p1_dt), basis12[q],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (chunk, 4*span): [a0 | a1 | a2 | zw]
            s = lane_span
            a0 = evall[:, 0:s]
            a1 = evall[:, s : 2 * s]
            a2 = evall[:, 2 * s : 3 * s]
            zw = evall[:, 3 * s : 4 * s]
            # No per-pixel z-window test: faces with any corner z/w outside
            # [-1, 1] are whole-face culled in the prepass (z/w is affine in
            # screen space, so corner bounds bound every interior pixel), and
            # invalid/pad faces carry an always-negative edge constant.
            covered = jnp.minimum(jnp.minimum(a0, a1), a2) >= 0
            # the zw plane arrives pre-biased by +1.5 (prepass folds it into
            # gamma), so the bit pattern is directly order-isomorphic
            zbits = jax.lax.bitcast_convert_type(zw, jnp.int32)
            packed = (zbits & (~pos_mask)) + pos_iota
            packed = jnp.where(covered, packed, _BIG_I)
            local = jnp.min(packed, axis=0, keepdims=True)  # (1, span)
            best = state_i_ref[0:1, qs : qs + lane_span]
            take = local < best
            state_i_ref[0:1, qs : qs + lane_span] = jnp.where(take, local, best)
            winc = state_i_ref[1:2, qs : qs + lane_span]
            state_i_ref[1:2, qs : qs + lane_span] = jnp.where(take, ci, winc)

        def visit_chunk(ci, cf):
            """One (tile, chunk) visit: quadrant hit test + phase-1 dispatch.
            Shared by the static bitmask path and the dynamic livelist path so
            the two schedules cannot diverge."""
            if not quadrant_split:
                depth_chunk_quadrant(ci, cf, 0, 0)
                return
            cy0 = cbb_ref[vi, ci, 0]
            cy1 = cbb_ref[vi, ci, 1]
            cx0 = cbb_ref[vi, ci, 2]
            cx1 = cbb_ref[vi, ci, 3]
            for q in range(4):
                qy, qx = q // 2, q % 2
                y0q = (ty * TILE_H + qy * 16).astype(jnp.float32)
                x0q = (tx * TILE_W + qx * 16).astype(jnp.float32)
                hit = (
                    (cy0 <= y0q + 15.0) & (cy1 >= y0q)
                    & (cx0 <= x0q + 15.0) & (cx1 >= x0q)
                )

                @pl.when(hit)
                def _(q=q, ci=ci, cf=cf):
                    depth_chunk_quadrant(ci, cf, q, q * QS)

        def depth_body(ci, carry):
            @pl.when(chunk_live(ci))
            def _():
                visit_chunk(ci, coeff_ref[vi, pl.ds(ci * chunk, chunk), :])

            return carry

        # fully unroll small chunk loops: the fori trip machinery costs ~50
        # cycles per (tile, chunk) even when the chunk is dead, and typical
        # meshes have only ~24 chunks (empty-scene floor measured 17.6 ms of a
        # 47.6 ms phase 1); large meshes fall back to fori to bound compile time
        if p1_livelist:
            # dynamic trip count == live chunks for THIS tile: the precomputed
            # SMEM list (count | ascending packed entries) replaces both the
            # bitmask test and the dead-trip machinery; every iteration does
            # real work
            nlive = live_ref[vi, t_lin, 0]

            def visit_entry(k):
                entry = live_ref[vi, t_lin, 1 + k]
                ci = entry >> 4
                cf = coeff_ref[vi, pl.ds(ci * chunk, chunk), :]
                if quadrant_split:
                    # quadrant dispatch off the entry's precomputed hit mask:
                    # two scalar bit ops per quadrant instead of the bbox
                    # load/compare chain (see the prepass livelist comment)
                    for q in range(4):
                        @pl.when((entry & (1 << q)) != 0)
                        def _(q=q, ci=ci, cf=cf):
                            depth_chunk_quadrant(ci, cf, q, q * QS)
                else:
                    depth_chunk_quadrant(ci, cf, 0, 0)

            if p1_unroll > 1:
                # unrolled pairs overlap entry k+1's scalar decode with entry
                # k's vector work (the loop body is a serial scalar->vector
                # dependency chain); the tail entries run predicated
                def live_unrolled(k, carry):
                    for u in range(p1_unroll):
                        visit_entry(k * p1_unroll + u)
                    return carry

                jax.lax.fori_loop(0, nlive // p1_unroll, live_unrolled, 0)
                base = (nlive // p1_unroll) * p1_unroll
                for u in range(p1_unroll - 1):
                    @pl.when(base + u < nlive)
                    def _(u=u):
                        visit_entry(base + u)
            else:
                def live_body(k, carry):
                    visit_entry(k)
                    return carry

                jax.lax.fori_loop(0, nlive, live_body, 0)
        elif n_chunks <= _UNROLL_MAX:
            if p1_group > 1:
                # superchunk gate: one scalar bitmask test skips a whole group
                # of dead chunk bodies (their bits share a 32-bit word as long
                # as the group is aligned and <= 32 wide)
                assert 32 % p1_group == 0
                for g0 in range(0, n_chunks, p1_group):
                    gsz = min(p1_group, n_chunks - g0)
                    # int32 wraparound cast: a group starting at bit 24 has a
                    # mask with bit 31 set, which overflows a Python->int32
                    # literal (255 << 24 > 2**31 - 1)
                    gmask = int(np.uint32(((1 << gsz) - 1) << (g0 % 32)).astype(np.int32))
                    gword = bits_ref[vi, t_lin, g0 // 32]

                    @pl.when((gword & gmask) != 0)
                    def _(g0=g0, gsz=gsz):
                        for _ci in range(g0, g0 + gsz):
                            depth_body(_ci, 0)
            else:
                for _ci in range(n_chunks):
                    depth_body(_ci, 0)
        else:
            jax.lax.fori_loop(0, n_chunks, depth_body, 0)
        packed_key = state_i_ref[0:1]
        win_chunk = state_i_ref[1:2]
        fg_bool = packed_key < _BIG_I
        best_pos = jnp.where(
            fg_bool, win_chunk * chunk + (packed_key & pos_mask), _BIG
        )
        best_zw = jnp.where(
            fg_bool,
            jax.lax.bitcast_convert_type(
                packed_key & (~pos_mask), jnp.float32
            )
            - 1.5,
            jnp.inf,
        )

        # ---- phase 2: attribute resolve for winner chunks ---------------------
        # Winners inside one 16x16 tile come from spatially adjacent faces, which
        # Morton ordering places in a compact index range: two vector reduces give
        # [smin, smax], and every per-iteration predicate below is a SCALAR range
        # test (a vector any() per chunk per tile costs more than the attr math).
        state_f_ref[1:9] = jnp.zeros((8, LANES), jnp.float32)
        fg_mask = best_pos < _BIG

        # phase 2 always works full-tile spans: quadrant-splitting it was
        # measured SLOWER (84.4 vs 82.1 ms / 252 views) -- per-visit fixed cost
        # outweighs the tighter winner ranges
        n_span = 1
        span = LANES // n_span
        smin_q, smax_q = [], []
        for q in range(n_span):
            sl = slice(q * span, (q + 1) * span)
            smin_q.append(
                jnp.min(jnp.where(fg_mask[:, sl], best_pos[:, sl], _BIG))
            )
            smax_q.append(
                jnp.max(jnp.where(fg_mask[:, sl], best_pos[:, sl], -1))
            )
        smin = jnp.min(jnp.stack(smin_q))
        smax = jnp.max(jnp.stack(smax_q))


        def attr_resolve(table, lo, qs):
            """Blend the winner's attributes into span lanes [qs, qs+span)."""
            bp = best_pos[:, qs : qs + span]
            mf = (pos_lanes == (bp - lo)).astype(jnp.float32)
            ext = jax.lax.dot_general(
                table, mf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32|75, span): winner's scalars per pixel (0 where no winner)

            fx_q = fx[:, qs : qs + span]
            fy_q = fy[:, qs : qs + span]
            sa0 = ext[0:1] * fx_q + ext[1:2] * fy_q + ext[2:3]
            sa1 = ext[3:4] * fx_q + ext[4:5] * fy_q + ext[5:6]
            sa2 = ext[6:7] * fx_q + ext[7:8] * fy_q + ext[8:9]
            ssum = sa0 + sa1 + sa2
            iw = jnp.where(
                ssum != 0.0, 1.0 / jnp.where(ssum == 0.0, 1.0, ssum), 0.0
            )
            b0 = sa0 * iw
            b1 = sa1 * iw
            b2 = 1.0 - b0 - b1

            # 1 where this window resolves the pixel's winner. A scalar range
            # test on best_pos -- NOT a (p2w, span) column-sum of the one-hot
            # (a p2w-row vector reduction per visit, measured dead weight):
            # both give exactly 1.0 / 0.0 for in-window winners / everything
            # else (background carries best_pos = _BIG, out of every window).
            hit = ((bp >= lo) & (bp < lo + p2w)).astype(jnp.float32)
            if not patch_k:
                rows = [
                    b0 * ext[9 + c : 10 + c]
                    + b1 * ext[17 + c : 18 + c]
                    + b2 * ext[25 + c : 26 + c]
                    for c in range(7)  # r g b x y z d
                ]
            else:
                # corner-major [x y z d] attr rows, then the patch table:
                # 6 corner patch-coords + pk*pk texels per channel. Color is
                # the hat-weight tensor-product blend of the winner's patch at
                # the pixel's (s, t) -- bilinear on the patch grid, i.e. the
                # reference's per-pixel texture fetch with the gather replaced
                # by arithmetic on phase-2-extracted values.
                pk = patch_k
                xyzd = [
                    b0 * ext[9 + c : 10 + c]
                    + b1 * ext[13 + c : 14 + c]
                    + b2 * ext[17 + c : 18 + c]
                    for c in range(4)
                ]
                sb = 21  # 9 edge + 12 attr rows
                s = (
                    b0 * ext[sb : sb + 1]
                    + b1 * ext[sb + 2 : sb + 3]
                    + b2 * ext[sb + 4 : sb + 5]
                )
                t = (
                    b0 * ext[sb + 1 : sb + 2]
                    + b1 * ext[sb + 3 : sb + 4]
                    + b2 * ext[sb + 5 : sb + 6]
                )
                s = jnp.clip(s, 0.0, pk - 1.0)
                t = jnp.clip(t, 0.0, pk - 1.0)
                wu = [
                    jnp.maximum(0.0, 1.0 - jnp.abs(s - float(j)))
                    for j in range(pk)
                ]
                wv = [
                    jnp.maximum(0.0, 1.0 - jnp.abs(t - float(i)))
                    for i in range(pk)
                ]
                # tensor-product weights built ONCE and shared by the three
                # channels: pk^2 multiplies + 3*pk^2 FMAs instead of the
                # nested per-channel blend (pk^2 + pk multiplies and adds PER
                # channel) -- the patch blend is pure (1, span) VPU work paid
                # per visit, so the op count is the cost
                wgt = [wv[i] * wu[j] for i in range(pk) for j in range(pk)]
                tex0 = sb + 6
                rgb = []
                for c in range(3):
                    acc = None
                    r0 = tex0 + c * pk * pk
                    for k, w in enumerate(wgt):
                        term = w * ext[r0 + k : r0 + k + 1]
                        acc = term if acc is None else acc + term
                    rgb.append(acc)
                rows = rgb + xyzd
            prev = state_f_ref[1:9, qs : qs + span]
            update = jnp.concatenate(
                rows + [jnp.ones((1, span), jnp.float32)], axis=0
            )
            state_f_ref[1:9, qs : qs + span] = prev + update * hit

        def attr_window(slo):
            # Everything a pixel needs from its winner is a PER-FACE scalar:
            # 9 edge coefficients + corner attributes (+ the texel patch in
            # patch mode). One one-hot matmul on the MXU extracts all of them
            # at once -- the previous formulation did ~25 separate masked
            # vector reduces per subchunk and dominated the kernel (226 of
            # 356 ms measured).
            # attr_ref carries the phase-2 table PRE-COMBINED component-major
            # (9 edge rows + corner attrs, built by the prepass), so the
            # per-visit staging is ONE lane slice -- the earlier formulation
            # sliced the 9 edge rows out of the face-major phase-1 coeff
            # table, paying a (p2w, 9) -> (9, p2w) Mosaic transpose plus a
            # second concat per visit.
            if patch_k:
                cfat = attr_ref[vi, 0:21, pl.ds(slo, p2w)]  # (21, p2w)
                pt = patch_ref[:, pl.ds(slo, p2w)]
                pt = pt[0 : 6 + 3 * patch_k * patch_k]
                # ONE all-f32 extraction dot (75, p2w). Precision/split
                # variants re-measured round 5 at this slice staging: a
                # 9-row f32 edge dot + 66-row bf16 attr dot 58.7 ms, the
                # whole table cast bf16 52.5 vs 52.8 f32 -- the dot is not
                # MXU-rate-bound, so f32 keeps exactness for free.
                table = jnp.concatenate([cfat, pt], axis=0)  # (75, p2w)
            else:
                # 9 edges + corner-major [r g b x y z d pad] x 3 with the
                # final pad row dropped = 32 rows, sublane-aligned exactly
                table = attr_ref[vi, 0:32, pl.ds(slo, p2w)]  # (32, p2w)
            attr_resolve(table, slo, 0)

        # window-major: for p2w <= chunk this visits the same set as the old
        # per-chunk sub-window nest; for p2w > chunk (superwindow) one visit
        # covers several phase-1 chunks. The face tables are padded to a
        # multiple of max(chunk, p2w), so every window slice is full-width.
        n_windows = (n_chunks * chunk) // p2w

        def attr_body(wi, carry):
            slo = wi * p2w

            @pl.when(
                jnp.logical_not(debug_phase1_only)
                & (smin < slo + p2w) & (smax >= slo)
            )
            def _():
                attr_window(slo)

            return carry

        # phase 2 stays a fori loop: unrolling it was measured 6x SLOWER
        # (199 ms full render) -- the per-iteration transpose + concat inside
        # the predicated region blow up when replicated 24x
        if p2_anchor and not debug_phase1_only:
            # ANCHORED dynamic window: align the window base to the winner
            # range itself ((smin // 128) * 128, the lane-alignment floor)
            # instead of a fixed window grid. Winners inside one tile are
            # Morton-local (typically spanning < 128 positions), so a narrow
            # window anchored at the range covers them in ONE visit where the
            # grid-aligned schedule needed a window wide enough to swallow any
            # straddle -- the extraction dot's contraction dim and the one-hot
            # build both shrink from p2w=1024 to 256 at identical visit
            # counts. Windows are disjoint by construction (base + k*p2w), so
            # each winner still resolves exactly once; the face tables carry
            # extra tail padding (see pad_f) so the last window never runs
            # off the end. A no-winner tile has smax=-1, base0 ~ 2^30 ->
            # negative trip count -> zero trips.
            base0 = (smin // 128) * 128
            trips = (smax - base0) // p2w + 1

            def attr_window_anchor(k, carry):
                attr_window(pl.multiple_of(base0 + k * p2w, 128))
                return carry

            jax.lax.fori_loop(0, trips, attr_window_anchor, 0)
        elif p2_dynamic and not debug_phase1_only:
            # winners span [smin, smax] (Morton-compact); loop ONLY the windows
            # that intersect it -- dynamic bounds, typically 1-3 trips instead
            # of n_chunks. A no-winner tile has smin=_BIG, smax=-1 -> lo > hi
            # -> zero trips. Visits the same window set as the static predicate
            # (smin < slo + p2w) & (smax >= slo).
            def attr_window_dyn(k, carry):
                attr_window(k * p2w)
                return carry

            jax.lax.fori_loop(smin // p2w, smax // p2w + 1, attr_window_dyn, 0)
        else:
            jax.lax.fori_loop(0, n_windows, attr_body, 0)
        st = state_f_ref[1:9]
        r, g, b = st[0:1], st[1:2], st[2:3]
        x, y, z, d = st[3:4], st[4:5], st[5:6], st[6:7]
        fg = (best_pos < _BIG).astype(jnp.float32)

        # ---- shade (renfine_color) + clamp ------------------------------------
        light = (w_ambient + d * w_diffuse) * fg
        r = jnp.clip(r * light, 0.0, 1.0)
        g = jnp.clip(g * light, 0.0, 1.0)
        b = jnp.clip(b * light, 0.0, 1.0)

        # ---- threshold_and_downscale_pointcloud --------------------------------
        invalid = z < min_depth
        xs = (x - trans_ref[vi, 0, 0]) * inv_downscale
        ys_ = (y - trans_ref[vi, 0, 1]) * inv_downscale
        zs = (z - trans_ref[vi, 0, 2]) * inv_downscale
        xs = jnp.where((jnp.abs(xs) > max_depth) | invalid, 0.0, xs)
        ys_ = jnp.where((jnp.abs(ys_) > max_depth) | invalid, 0.0, ys_)
        zs = jnp.where((jnp.abs(zs) > max_depth) | invalid, 0.0, zs)

        out = jnp.concatenate(
            [r, g, b, xs, ys_, zs, best_zw * fg, fg], axis=0
        )  # (8, LANES)
        out_ref[vi, 0, 0] = out

    # static unroll over the program's views: views_pp > 1
    # amortizes the tile-constant setup above (basis build +
    # (p2w, span) one-hot iota, ~1 MB of VMEM writes) across
    # several views that share this tile
    for _vi in range(views_pp):
        _render_one_view(_vi)


# ---------------------------------------------------------------------------
# host-side orchestration


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_h", "img_w", "chunk", "interpret", "debug_phase1_only",
        "w_ambient", "w_diffuse", "min_depth", "max_depth", "cull_backfaces",
        "quadrant_split", "p2_window", "debug_prepass_only", "p1_group",
        "p1_livelist", "p2_dynamic", "p1_bf16", "p1_unroll", "p2_anchor",
        "views_pp",
    ),
)
def render_views_fused(
    tables: FusedMeshTables,
    poses: jnp.ndarray,
    clip_mats: jnp.ndarray,
    img_h: int,
    img_w: int,
    w_ambient: float = 0.8,
    w_diffuse: float = 0.5,
    min_depth: float = 0.001,
    max_depth: float = 4.0,
    chunk: int = 256,
    interpret: bool = False,
    debug_phase1_only: bool = False,
    cull_backfaces: bool = True,
    quadrant_split: bool = True,
    p2_window: int | None = None,
    debug_prepass_only: bool = False,
    p1_group: int = 1,
    p1_livelist: bool = True,
    p2_dynamic: bool = True,
    p1_bf16: bool = False,
    p1_unroll: int = 1,
    p2_anchor: bool = False,
    views_pp: int = 1,
) -> jnp.ndarray:
    """Full render branch for N poses -> (N, img_h, img_w, 6) [rgb|xyz].

    p1_bf16 runs the phase-1 plane-eval dot with bf16 operands (f32
    accumulation): ~2x the MXU rate for sub-1/16-pixel silhouette jitter
    -- a PRECISION knob, not a scheduling knob; the image may differ at
    razor-edge pixels vs the f32 default.


    clip_mats: (N, 4, 4) mesh-frame -> crop-NDC matrices (pose_clip_matrix).
    Output is shaded, vertically flipped, thresholded/diameter-normalized:
    channels 0:3 color, 3:6 xyz.
    """
    n = poses.shape[0]
    f = tables.num_faces
    assert img_h % TILE_H == 0 and img_w % TILE_W == 0
    if chunk not in (32, 64, 128, 256, 512):
        raise ValueError(
            f"chunk ({chunk}) must be a power of two in 32..512 "
            "(the packed depth key's pos mask is chunk-1)"
        )
    if p2_window is None and chunk < 128:
        # phase 2 slices the face tables along LANES at p2_window
        # granularity and Mosaic requires lane offsets provably aligned to
        # 128 -- sub-128 phase-1 chunks therefore pair with a 128-wide
        # phase-2 superwindow (p2_window % chunk == 0 keeps windows exact)
        p2_window = 128
    if p2_window is not None:
        # phase 2 visits p2_window-wide face windows. The width may be a
        # DIVISOR of chunk (narrower extraction dots) or a MULTIPLE of it
        # (superwindow: phase-1 culls at fine chunks while phase 2 pays
        # fewer, fatter visits -- chunk 128 phase 1 is ~8 ms faster than
        # 256 but phase 2 at 128 costs ~10 ms more, so 128/256 beats
        # either uniform choice). Any other width would silently skip
        # tail faces (winners there render black with fg=1), and Mosaic
        # needs lane-aligned (128) power-of-two slice offsets -- enforced
        # UNCONDITIONALLY (even when p2_window == chunk: an explicit
        # chunk=64/p2_window=64 would otherwise slice face tables at
        # sub-128 lane offsets, and p2_anchor's multiple_of(base, 128)
        # promise requires p2_window % 128 == 0 to hold).
        ok_align = p2_window >= 128 and not (p2_window & (p2_window - 1))
        ok_ratio = (
            chunk % p2_window == 0 if p2_window < chunk
            else p2_window % chunk == 0
        )
        if not (ok_align and ok_ratio):
            raise ValueError(
                f"p2_window ({p2_window}) must be a power of two >= 128 "
                f"that divides or is a multiple of chunk ({chunk})"
            )
    if views_pp < 1:
        raise ValueError(f"views_pp ({views_pp}) must be >= 1")
    if p1_group > 1 and 32 % p1_group != 0:
        raise ValueError(f"p1_group ({p1_group}) must divide 32")
    if p1_livelist and p1_group > 1:
        # the livelist path replaces the bitmask walk entirely; a silent
        # override would let a sweep record claim a p1_group it never ran
        raise ValueError("p1_livelist ignores p1_group; pass one or the other")
    if p1_unroll not in (1, 2, 4):
        raise ValueError(f"p1_unroll ({p1_unroll}) must be 1, 2, or 4")
    if p1_unroll > 1 and not p1_livelist:
        # unrolling targets the livelist loop's scalar->vector dependency
        # chain; the static bitmask walk is already fully unrolled
        raise ValueError("p1_unroll > 1 requires p1_livelist")
    if p2_anchor and not p2_dynamic:
        # anchoring IS a dynamic schedule (the base comes from the winner
        # range); requiring the flag keeps sweep records honest about what
        # actually ran
        raise ValueError("p2_anchor requires p2_dynamic")
    n_ty, n_tx = img_h // TILE_H, img_w // TILE_W
    n_tiles = n_ty * n_tx
    f32 = jax.lax.Precision.HIGHEST

    # ------------------------------------------------------------------
    # PLANE-ORIENTED prepass: every intermediate is an (N, F) array whose
    # minor dim is the large face axis. TPU tiling pads the minor dim to 128
    # lanes, so any (N, F, small) temporary costs up to 128/small x its
    # logical size -- a face-major (252, 6016, 16) coefficient table is
    # 740 MB in HBM (measured OOM). Components therefore live as separate
    # planes end to end; the kernel tables keep the face axis minor too
    # ((G, 16/24, F_pad), stacked per view-group), so packing is a cheap
    # major-axis transpose and carries zero lane padding.
    # ------------------------------------------------------------------
    fv_k = [tables.face_verts[:, k, :] for k in range(3)]  # 3 x (F, 3)
    fn_k = [tables.face_normals[:, k, :] for k in range(3)]

    def proj(rows_nc, offs_n, pts_f3):
        """(N,3) row x (F,3) points + (N,) offset -> (N, F) plane."""
        return (
            jnp.einsum("nj,fj->nf", rows_nc, pts_f3, precision=f32)
            + offs_n[:, None]
        )

    # clip components per corner: x,y,z,w
    clip_k = []
    for k in range(3):
        comp = {}
        for ci, name in enumerate("xyzw"):
            comp[name] = proj(clip_mats[:, ci, :3], clip_mats[:, ci, 3], fv_k[k])
        clip_k.append(comp)

    def cross_planes(q, r):
        """Edge coefficients: cross((qx,qy,qw), (rx,ry,rw)) -> 3 planes."""
        return (
            q["y"] * r["w"] - q["w"] * r["y"],
            q["w"] * r["x"] - q["x"] * r["w"],
            q["x"] * r["y"] - q["y"] * r["x"],
        )

    e0 = cross_planes(clip_k[1], clip_k[2])
    e1 = cross_planes(clip_k[2], clip_k[0])
    e2 = cross_planes(clip_k[0], clip_k[1])
    edge_planes = list(e0) + list(e1) + list(e2)  # 9 x (N, F)

    # screen coords + z/w per corner
    sxk, syk, zwk = [], [], []
    for k in range(3):
        w_c = clip_k[k]["w"]
        sxk.append(clip_k[k]["x"] / w_c)
        syk.append(clip_k[k]["y"] / w_c)
        zwk.append(clip_k[k]["z"] / w_c)

    # screen-affine z/w plane (alpha, beta, gamma)
    d1x = sxk[1] - sxk[0]
    d1y = syk[1] - syk[0]
    d2x = sxk[2] - sxk[0]
    d2y = syk[2] - syk[0]
    dz1 = zwk[1] - zwk[0]
    dz2 = zwk[2] - zwk[0]
    det = d1x * d2y - d1y * d2x
    plane_ok = jnp.abs(det) > 1e-20
    safe = jnp.where(plane_ok, det, 1.0)
    alpha = (dz1 * d2y - dz2 * d1y) / safe
    beta = (dz2 * d1x - dz1 * d2x) / safe
    # the +1.5 depth-key bias (z/w in [-1,1] -> [0.5,2.5], making positive
    # f32 bit patterns order-isomorphic) is folded into the plane's constant
    # term HERE so the kernel's per-visit (chunk, span) stream saves one
    # vector add; the kernel subtracts it once per tile on readout
    gamma = zwk[0] - alpha * sxk[0] - beta * syk[0] + 1.5

    w_pos = (clip_k[0]["w"] > 0) & (clip_k[1]["w"] > 0) & (clip_k[2]["w"] > 0)
    nondeg = jnp.zeros_like(w_pos)
    for p in edge_planes:
        nondeg |= p != 0.0
    # whole-face z-window cull: z/w is screen-affine, so corner bounds bound
    # every interior pixel -- faces fully inside [-1, 1] need no per-pixel
    # depth-window test in the kernel, and faces crossing the near/far plane
    # are culled whole (the documented near-plane deviation vs nvdiffrast's
    # sub-triangle clipping, see ops/rasterize.py)
    zw_min = jnp.minimum(jnp.minimum(zwk[0], zwk[1]), zwk[2])
    zw_max = jnp.maximum(jnp.maximum(zwk[0], zwk[1]), zwk[2])
    valid = w_pos & plane_ok & nondeg & (zw_min >= -1.0) & (zw_max <= 1.0)
    if cull_backfaces and tables.backface_cull_ok:
        # Backface culling as a pure optimization: only applied when the
        # mesh-build proof (watertight + consistent outward winding, see
        # FusedMeshTables) guarantees the image is unchanged. Front faces
        # have det > 0 under this pipeline's conventions (pinned by tests);
        # ~half the faces -- and most of their chunks -- drop out of the
        # phase-1 loop. The reference renders double-sided
        # (foundationpose_render.cu:201), which this preserves exactly.
        valid &= det > 0

    # sign-normalize the edge functions by the triangle orientation (the
    # screen-space det has the same sign as the clip det when all w > 0), so
    # coverage in the kernel is a single three-way min >= 0 instead of the
    # both-signs test -- phase 1 is VPU-bound and every op on the
    # (chunk, lanes) tensors counts
    orient = jnp.where(det >= 0, 1.0, -1.0)
    edge_planes = [p * orient for p in edge_planes]

    # per-corner attributes: camera xyz (rot @ v + t) and diffuse intensity
    rot = poses[:, :3, :3]
    attr_xyz = []  # [corner][component] -> (N, F)
    diffuse_k = []
    for k in range(3):
        comps = [
            proj(rot[:, ci, :], poses[:, ci, 3], fv_k[k]) for ci in range(3)
        ]
        attr_xyz.append(comps)
        tnx = jnp.einsum("nj,fj->nf", rot[:, 0, :], fn_k[k], precision=f32)
        tny = jnp.einsum("nj,fj->nf", rot[:, 1, :], fn_k[k], precision=f32)
        tnz = jnp.einsum("nj,fj->nf", rot[:, 2, :], fn_k[k], precision=f32)
        nrm = jnp.sqrt(tnx * tnx + tny * tny + tnz * tnz)
        diffuse_k.append(
            jnp.clip(
                jnp.where(nrm == 0.0, 0.0, -tnz / jnp.maximum(nrm, 1e-30)),
                0.0, 1.0,
            )
        )

    # pixel bboxes bounding covered pixel CENTERS (+-0.25 f32 safety)
    pxs = [(s + 1.0) * (img_w / 2.0) - 0.5 for s in sxk]
    pys = [(s + 1.0) * (img_h / 2.0) - 0.5 for s in syk]
    x0 = jnp.floor(jnp.minimum(jnp.minimum(pxs[0], pxs[1]), pxs[2]) - 0.25)
    x1 = jnp.ceil(jnp.maximum(jnp.maximum(pxs[0], pxs[1]), pxs[2]) + 0.25)
    y0 = jnp.floor(jnp.minimum(jnp.minimum(pys[0], pys[1]), pys[2]) - 0.25)
    y1 = jnp.ceil(jnp.maximum(jnp.maximum(pys[0], pys[1]), pys[2]) + 0.25)
    onscreen = (x1 >= 0) & (x0 < img_w) & (y1 >= 0) & (y0 < img_h)
    valid &= onscreen

    # invalid faces: zero edge coefficients EXCEPT one constant term forced
    # to -1, so their coverage test (min of edges >= 0) fails at every pixel
    # without any per-pixel validity guard; plus an empty bbox so their
    # chunks cull away
    edge_planes = [
        jnp.where(valid, p, -1.0 if i == 2 else 0.0)
        for i, p in enumerate(edge_planes)
    ]
    alpha = jnp.where(valid, alpha, 0.0)
    beta = jnp.where(valid, beta, 0.0)
    gamma = jnp.where(valid, gamma, 3.5)  # 2.0 + the 1.5 key bias
    inf = jnp.float32(jnp.inf)
    x0 = jnp.where(valid, x0, inf)
    y0 = jnp.where(valid, y0, inf)
    x1 = jnp.where(valid, x1, -inf)
    y1 = jnp.where(valid, y1, -inf)

    # pad to the larger of chunk / p2_window so both phase-1 chunks and
    # phase-2 windows tile the table exactly (superwindow mode pads more)
    pad_unit = max(chunk, p2_window or chunk)
    pad_f = (-f) % pad_unit
    if p2_anchor:
        # anchored windows start at any 128-aligned base <= the last real
        # face (pad faces never win), so the table must extend p2w past
        # that base or the final window's slice runs off the end
        need = ((f - 1) // 128) * 128 + (p2_window or chunk)
        if f + pad_f < need:
            pad_f = need + ((-need) % pad_unit) - f

    def padf(p, value=0.0):
        return (
            jnp.pad(p, ((0, 0), (0, pad_f)), constant_values=value)
            if pad_f else p
        )

    f_pad = f + pad_f
    n_chunks = f_pad // chunk

    # pad faces carry the same always-negative edge constant as invalid
    # faces (coverage fails), and the out-of-range depth plane for hygiene
    coeff_planes = [
        padf(p, -1.0 if i == 2 else 0.0) for i, p in enumerate(edge_planes)
    ] + [padf(alpha), padf(beta), padf(gamma, 3.5)]
    zeros = jnp.zeros((n, f_pad), jnp.float32)
    coeff_planes += [zeros] * 4  # pad to 16

    patch_k = int(tables.patch_k)
    colors = tables.face_colors  # (F, 3, 3) pose-independent
    # the phase-2 extraction table, PRE-COMBINED component-major: the 9
    # edge-coefficient rows (same masked/oriented planes phase 1 reads
    # face-major) followed by the corner attributes, so the kernel's
    # per-visit staging is one lane slice (no transpose, no edge/attr
    # concat). Costs 9 extra rows of HBM per view vs the attr-only table;
    # saves a (p2w, 9) Mosaic transpose per (tile, window) visit.
    tail_planes = []  # table rows after the 9 edges (corner attributes)
    if patch_k:
        # colors ride the pose-independent patch table (ONE copy, not
        # broadcast per view); the per-view rows beyond the edges are just
        # corner-major [x y z d] x 3 -- colors would cost 9 more rows of
        # HBM traffic per view
        for k in range(3):
            for q in range(3):
                tail_planes.append(padf(attr_xyz[k][q]))
            tail_planes.append(padf(diffuse_k[k]))
    else:
        for k in range(3):  # corner-major: r g b x y z d pad
            for q in range(3):
                tail_planes.append(
                    padf(jnp.broadcast_to(colors[None, :, k, q], (n, f)))
                )
            for q in range(3):
                tail_planes.append(padf(attr_xyz[k][q]))
            tail_planes.append(padf(diffuse_k[k]))
            tail_planes.append(zeros)
        tail_planes = tail_planes[:-1]  # drop the last pad row (row 33)
    attr_planes = list(coeff_planes[0:9]) + tail_planes
    while len(attr_planes) % 8:
        attr_planes.append(zeros)  # sublane-align the table rows
    attr_rows = len(attr_planes)

    # chunk union bboxes -> per-(view, tile) overlap bitmask
    cx0 = jnp.min(padf(x0, jnp.inf).reshape(n, n_chunks, chunk), axis=2)
    cy0 = jnp.min(padf(y0, jnp.inf).reshape(n, n_chunks, chunk), axis=2)
    cx1 = jnp.max(padf(x1, -jnp.inf).reshape(n, n_chunks, chunk), axis=2)
    cy1 = jnp.max(padf(y1, -jnp.inf).reshape(n, n_chunks, chunk), axis=2)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tlx = ((tile_ids % n_tx) * TILE_W).astype(jnp.float32)  # (T,)
    tly = ((tile_ids // n_tx) * TILE_H).astype(jnp.float32)
    overlap = (
        (cx0[:, :, None] <= tlx[None, None, :] + (TILE_W - 1))
        & (cx1[:, :, None] >= tlx[None, None, :])
        & (cy0[:, :, None] <= tly[None, None, :] + (TILE_H - 1))
        & (cy1[:, :, None] >= tly[None, None, :])
    )  # (N, n_chunks, T)

    live_list = None
    if p1_livelist:
        # per-(view, tile) live-chunk list: [count | ascending entries |
        # sentinel pad]. Each entry packs (chunk_id << 4) | quadrant_mask:
        # the prepass resolves WHICH 16x16 quadrants the chunk bbox hits
        # (bit q = quadrant qy*2+qx, the kernel's lane layout), so the
        # kernel's per-visit quadrant dispatch is two scalar bit ops
        # instead of four SMEM bbox loads + eight compares -- phase 1's
        # livelist loop is serial scalar->vector, and every scalar op on
        # its critical path is paid per (tile, chunk) visit. Sorting by
        # the packed value keeps chunk ids ascending (the mask rides the
        # low bits; ids are unique per tile); dead slots carry
        # n_chunks << 4, out of range by construction.
        qx0 = tlx[None, None, :, None] + (
            jnp.arange(4, dtype=jnp.float32)[None, None, None, :] % 2
        ) * 16.0  # (1, 1, T, 4)
        qy0 = tly[None, None, :, None] + (
            jnp.arange(4, dtype=jnp.float32)[None, None, None, :] // 2
        ) * 16.0
        overlap_q = (
            (cx0[:, :, None, None] <= qx0 + 15.0)
            & (cx1[:, :, None, None] >= qx0)
            & (cy0[:, :, None, None] <= qy0 + 15.0)
            & (cy1[:, :, None, None] >= qy0)
        )  # (N, C, T, 4)
        qmask = (
            overlap_q.astype(jnp.int32)
            * (jnp.int32(1) << jnp.arange(4, dtype=jnp.int32))[
                None, None, None, :
            ]
        ).sum(axis=-1)  # (N, C, T)
        cid = jnp.arange(n_chunks, dtype=jnp.int32)
        ids = jnp.where(
            overlap,
            (cid[None, :, None] << 4) | qmask,
            jnp.int32(n_chunks) << 4,
        )  # (N, C, T)
        ids_sorted = jnp.sort(ids, axis=1).transpose(0, 2, 1)  # (N, T, C)
        counts = overlap.sum(axis=1).astype(jnp.int32)  # (N, T)
        live_list = jnp.concatenate([counts[:, :, None], ids_sorted], axis=2)

    pad_c = (-n_chunks) % 32
    if pad_c:
        overlap = jnp.pad(overlap, ((0, 0), (0, pad_c), (0, 0)))
    w32 = (n_chunks + pad_c) // 32
    bit_weights = jnp.int32(1) << jnp.arange(32, dtype=jnp.int32)
    bits = (
        overlap.transpose(0, 2, 1)
        .reshape(n, n_tiles, w32, 32)
        .astype(jnp.int32)
        * bit_weights[None, None, None, :]
    ).sum(axis=-1).astype(jnp.int32)  # (N, T, W32); disjoint bits: sum == or

    trans = jnp.pad(poses[:, :3, 3], ((0, 0), (0, 5))).reshape(n, 1, 8)

    patch_tab = None
    if patch_k:
        patch_tab = tables.face_patch
        if pad_f:
            patch_tab = jnp.pad(patch_tab, ((0, 0), (0, pad_f)))
    patch_rows_p = 0 if patch_tab is None else patch_tab.shape[0]

    kernel = functools.partial(
        _fused_kernel,
        n_chunks=n_chunks,
        chunk=chunk,
        img_h=img_h,
        img_w=img_w,
        n_tx=n_tx,
        w_ambient=w_ambient,
        w_diffuse=w_diffuse,
        min_depth=min_depth,
        max_depth=max_depth,
        inv_downscale=2.0 / tables.diameter,
        debug_phase1_only=debug_phase1_only,
        quadrant_split=quadrant_split,
        patch_k=patch_k,
        p2_window=p2_window,
        p1_group=p1_group,
        p1_livelist=p1_livelist,
        p2_dynamic=p2_dynamic,
        p1_bf16=p1_bf16,
        p1_unroll=p1_unroll,
        p2_anchor=p2_anchor,
        views_pp=views_pp,
    )

    cbb = jnp.stack([cy0, cy1, cx0, cx1], axis=-1)  # (N, n_chunks, 4)

    def run_group(args):
        """Run the kernel over one view GROUP. Tables are stored COMPONENT-
        MAJOR -- (G, 16/24, F_pad) with the large face axis minor -- so the
        lane dim is fully utilized (a face-major (F_pad, 16) layout would
        lane-pad 16 -> 128 and cost 8x the HBM traffic, the old design)."""
        if p1_livelist:
            coeff_g, attr_g, bits_g, cbb_g, trans_g, live_g = args
        else:
            coeff_g, attr_g, bits_g, cbb_g, trans_g = args
        g = coeff_g.shape[1]
        # coeff table FACE-MAJOR (phase 1's MXU dots want faces on
        # sublanes; it pays 16 -> 128 lane padding in HBM), attr table
        # COMPONENT-MAJOR (face axis on lanes, zero padding; phase 2
        # contracts the face axis directly)
        coeffs_packed = coeff_g.transpose(1, 2, 0)  # (G, F_pad, 16)
        attrs_packed = attr_g.transpose(1, 0, 2)  # (G, attr_rows, F_pad)
        vpp = views_pp
        in_specs = [
            pl.BlockSpec((vpp, f_pad, 16), lambda i, t, u: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vpp, attr_rows, f_pad), lambda i, t, u: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vpp, n_tiles, w32), lambda i, t, u: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((vpp, n_chunks, 4), lambda i, t, u: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((vpp, 1, 8), lambda i, t, u: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = [coeffs_packed, attrs_packed, bits_g, cbb_g, trans_g]
        if patch_k:
            # pose-independent: one copy, same block for every grid step
            in_specs.append(
                pl.BlockSpec((patch_rows_p, f_pad), lambda i, t, u: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(patch_tab)
        if p1_livelist:
            in_specs.append(
                pl.BlockSpec((vpp, n_tiles, 1 + n_chunks),
                             lambda i, t, u: (i, 0, 0),
                             memory_space=pltpu.SMEM)
            )
            operands.append(live_g)
        return pl.pallas_call(
            kernel,
            grid=(g // vpp, n_ty, n_tx),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (vpp, 1, 1, 8, LANES), lambda i, t, u: (i, t, u, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (g, n_ty, n_tx, 8, LANES), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((16, LANES), jnp.float32),
                pltpu.VMEM((8, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(*operands)

    # view-group size: bound the packed-table HBM footprint (lane-padded
    # face-major coeffs + component-major attrs per view), then shrink the
    # group so it divides N as evenly as possible (group=31 for N=252 would
    # pad to 310 views -- 23% of the kernel time spent rendering padding).
    # A second bound keeps the per-pallas_call VMEM demand under the ~16 MB
    # scoped limit: one view's table blocks are double-buffered
    # (f_pad*(16+24)*4*2 bytes) and XLA may place the call's whole
    # (g, TY, TX, 8, LANES) result in VMEM, which scales with g -- a 32k-face
    # mesh (the subdivision policy cap) OOMs at g=10 but runs at g<=2.
    table_bytes = f_pad * (16 + attr_rows) * 4 * 2 * views_pp
    if patch_k:  # constant block, but budget a double-buffered copy
        table_bytes += patch_rows_p * f_pad * 4 * 2
    out_bytes_per_view = n_ty * n_tx * 8 * LANES * 4
    vmem_budget = 11 * 1024 * 1024
    group_vmem = max(1, (vmem_budget - table_bytes) // out_bytes_per_view)
    group_max = max(
        1,
        min(
            n,
            (192 * 1024 * 1024) // (f_pad * (128 + attr_rows) * 4),
            group_vmem,
        ),
    )
    group_max = max(views_pp, group_max - group_max % views_pp)
    n_groups_min = -(-n // group_max)
    group = -(-n // n_groups_min)
    group = -(-group // views_pp) * views_pp  # grid g must divide by vpp
    pad_n = (-n) % group
    n_pad = n + pad_n

    def padn(p):
        return jnp.pad(p, ((0, pad_n),) + ((0, 0),) * (p.ndim - 1)) if pad_n else p

    coeff_stack = jnp.stack([padn(p) for p in coeff_planes])  # (16, Np, F_pad)
    attr_stack = jnp.stack([padn(p) for p in attr_planes])  # (attr_rows, Np, F_pad)
    if debug_prepass_only:
        # timing knob: force the prepass products (planes, bitmask, stacks)
        # but skip the kernel + untile, so bench_fused can subtract the
        # XLA-side budget from the full render
        probe = (
            coeff_stack.sum() + attr_stack.sum()
            + bits.sum().astype(jnp.float32) + cbb.sum()
        )
        if p1_livelist:
            # the livelist sort/concat is prepass work too; without this
            # term XLA dead-code-eliminates it and the prepass-vs-kernel
            # attribution for livelist variants is wrong
            probe = probe + live_list.sum().astype(jnp.float32)
        return jnp.zeros((n, img_h, img_w, 6), jnp.float32) + probe * 1e-30
    n_groups = n_pad // group
    map_args = [
        coeff_stack.reshape(16, n_groups, group, f_pad).transpose(1, 0, 2, 3),
        attr_stack.reshape(attr_rows, n_groups, group, f_pad).transpose(1, 0, 2, 3),
        padn(bits).reshape(n_groups, group, n_tiles, w32),
        padn(cbb).reshape(n_groups, group, n_chunks, 4),
        padn(trans).reshape(n_groups, group, 1, 8),
    ]
    if p1_livelist:
        map_args.append(
            padn(live_list).reshape(n_groups, group, n_tiles, 1 + n_chunks)
        )
    out = jax.lax.map(
        run_group, tuple(map_args)
    )  # (n_groups, G, TY, TX, 8, LANES)
    out = out.reshape(n_pad, n_ty, n_tx, 8, LANES)[:n]

    # untile quadrant-major lanes: lane = ((qy*2+qx)*16 + r16)*16 + c16
    out = out.reshape(n, n_ty, n_tx, 8, 2, 2, 16, 16)  # (..., qy, qx, r, c)
    out = out.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(n, img_h, img_w, 8)
    out = out[:, ::-1, :, :6]  # vertical flip (GL y-up -> image y-down)
    return out
