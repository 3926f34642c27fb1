"""Training losses (reference: lib/core/loss.py) as pure jitted functions.

The face-based mesh losses (normal / edge / Laplacian) gather the 13776-face
index triplets once as constants and run as batched gathers + elementwise
ops — XLA fuses them with the surrounding graph; no per-batch `.cuda()`
index uploads like the reference (loss.py:67,96).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _face_incidence_cached(faces_bytes: bytes, nfaces: int,
                           num_verts: int) -> np.ndarray:
    """[V, D] flat indices into the concatenated [3F] corner axis
    (corner*F + face); padded with 3F (a zero row appended by the
    caller). D = max faces incident to any vertex (~9 for SMPL)."""
    f = np.frombuffer(faces_bytes, np.int64).reshape(nfaces, 3)
    lists: list = [[] for _ in range(num_verts)]
    for corner in range(3):
        for i, v in enumerate(f[:, corner]):
            lists[v].append(corner * nfaces + i)
    d = max(len(lst) for lst in lists)
    inc = np.full((num_verts, d), 3 * nfaces, np.int32)
    for v, lst in enumerate(lists):
        inc[v, :len(lst)] = lst
    return inc


def make_corner_gather(faces: np.ndarray, num_verts: int):
    """Gather (p0, p1, p2) face corners from a [B, V, 3] mesh with a
    custom VJP: the backward maps per-corner cotangents back to vertices
    through the PRECOMPUTED incidence table as a gather+sum — XLA's
    default scatter-add lowering for this serializes on TPU and measured
    ~25 ms/step at B=512 (the losses cost as much as the whole fused LBF
    stack VJP before this)."""
    f = np.asarray(faces, np.int64)
    fj = jnp.asarray(f)
    inc = jnp.asarray(_face_incidence_cached(f.tobytes(), len(f),
                                             num_verts))

    @jax.custom_vjp
    def gather(mesh):
        return mesh[:, fj[:, 0]], mesh[:, fj[:, 1]], mesh[:, fj[:, 2]]

    def fwd(mesh):
        return gather(mesh), None

    def bwd(_, g):
        g0, g1, g2 = g
        b = g0.shape[0]
        pad = jnp.zeros((b, 1, g0.shape[-1]), g0.dtype)
        contrib = jnp.concatenate([g0, g1, g2, pad], axis=1)  # [B,3F+1,3]
        dmesh = contrib[:, inc, :].sum(axis=2)                # [B,V,3]
        return (dmesh,)

    gather.defvjp(fwd, bwd)
    return gather


def _plain_corner_gather(faces):
    fj = jnp.asarray(np.asarray(faces, np.int64))

    def gather(mesh):
        return mesh[:, fj[:, 0]], mesh[:, fj[:, 1]], mesh[:, fj[:, 2]]

    return gather


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps).

    The clamp sits INSIDE the sqrt: sqrt(sumsq)'s gradient at 0 is inf,
    and the outer max()'s zero-branch gradient turns that into 0*inf=NaN.
    Degenerate (zero-length) edges are impossible in f32 meshes but
    HAPPEN in the bf16 fast path — nearby SMPL vertices round to equal
    coordinates — and one NaN gradient poisons the whole step."""
    norm = jnp.sqrt(jnp.maximum((x * x).sum(axis=axis, keepdims=True),
                                eps * eps))
    return x / norm


def coord_l1_loss(pred, target, valid=None):
    """Validity-masked L1, mean over ALL elements (masked entries contribute
    zeros to the mean — reference: loss.py:10-23 applies the mask to both
    operands and keeps reduction='mean')."""
    if valid is not None:
        pred = pred * valid
        target = target * valid
    return jnp.abs(pred - target).mean()


def _normal_from_corners(po, pg):
    """Normal-vector loss from pre-gathered corners (reference math:
    loss.py:61-87). Internally CHANNEL-MAJOR [B, 3, F]: with the natural
    [B, F, 3] layout the 3-wide minor dim lands on the TPU's 128-lane
    axis, wasting 97% of every vector op over the 13776-face tensors."""
    p0, p1, p2 = (t.swapaxes(-1, -2) for t in po)
    v1_out = _l2_normalize(p1 - p0, axis=-2)
    v2_out = _l2_normalize(p2 - p0, axis=-2)
    v3_out = _l2_normalize(p2 - p1, axis=-2)
    g0, g1, g2 = (t.swapaxes(-1, -2) for t in pg)
    v1_gt = _l2_normalize(g1 - g0, axis=-2)
    v2_gt = _l2_normalize(g2 - g0, axis=-2)
    normal_gt = _l2_normalize(_cross_cm(v1_gt, v2_gt), axis=-2)
    cos1 = jnp.abs((v1_out * normal_gt).sum(-2))
    cos2 = jnp.abs((v2_out * normal_gt).sum(-2))
    cos3 = jnp.abs((v3_out * normal_gt).sum(-2))
    # reduction always in f32 (the operands may be bf16 in the fast path)
    return jnp.concatenate([cos1, cos2, cos3], axis=1).astype(
        jnp.float32).mean()


def _cross_cm(a, b):
    """Cross product over the channel axis of [B, 3, F] tensors."""
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=1)


def _edge_from_corners(po, pg):
    """Edge-length loss from pre-gathered corners (reference math:
    loss.py:90-113); channel-major like `_normal_from_corners`."""
    def elen(a, b):
        # clamp inside the sqrt: zero-length bf16 edges otherwise emit
        # inf gradients (see _l2_normalize)
        return jnp.sqrt(jnp.maximum(((a - b) ** 2).sum(-2), 1e-24))

    p0, p1, p2 = (t.swapaxes(-1, -2) for t in po)
    g0, g1, g2 = (t.swapaxes(-1, -2) for t in pg)
    d1 = jnp.abs(elen(p0, p1) - elen(g0, g1))
    d2 = jnp.abs(elen(p0, p2) - elen(g0, g2))
    d3 = jnp.abs(elen(p1, p2) - elen(g1, g2))
    return jnp.concatenate([d1, d2, d3], axis=1).astype(
        jnp.float32).mean()


def _gt_corners(coord_gt, faces):
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    return coord_gt[:, f0], coord_gt[:, f1], coord_gt[:, f2]


def normal_vector_loss(coord_out, coord_gt, faces: np.ndarray,
                       corner_gather=None):
    """Cosine between predicted edges and GT face normals
    (reference: loss.py:61-87). corner_gather: optional
    `make_corner_gather` instance for the scatter-free backward."""
    cg = corner_gather or _plain_corner_gather(faces)
    return _normal_from_corners(cg(coord_out), _gt_corners(coord_gt,
                                                           faces))


def edge_length_loss(coord_out, coord_gt, faces: np.ndarray,
                     corner_gather=None):
    """|edge length difference| over the three face edges
    (reference: loss.py:90-113)."""
    cg = corner_gather or _plain_corner_gather(faces)
    return _edge_from_corners(cg(coord_out), _gt_corners(coord_gt,
                                                         faces))


def build_laplacian(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """Uniform graph Laplacian, row-normalized by degree (defined-but-unused
    in the reference — kept for capability parity; reference: loss.py:26-47).
    """
    lap = np.zeros((num_verts, num_verts), np.float32)
    for a, b in ((0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)):
        lap[faces[:, a], faces[:, b]] = -1
    np.fill_diagonal(lap, -lap.sum(1))
    lap /= (np.diag(lap)[:, None] + 1e-8)
    return lap


def laplacian_loss(coord_out, laplacian, average=False):
    x = jnp.einsum("vw,bwc->bvc", jnp.asarray(laplacian), coord_out)
    x = (x ** 2).sum(-1)
    if average:
        return x.sum() / coord_out.shape[0]
    return x.mean()


class LossWeights(NamedTuple):
    """Loss weighting (reference: config defaults lib/core/config.py:58-60;
    assembly lib/core/base.py:139-148)."""

    normal: float = 0.1
    edge: float = 20.0
    joint: float = 1e-3


class GatorLossOut(NamedTuple):
    total: jnp.ndarray
    vertex: jnp.ndarray
    normal: jnp.ndarray
    edge: jnp.ndarray
    reg_joint: jnp.ndarray
    lift_joint: jnp.ndarray


def gator_loss(
    pred_mesh, pred_reg_pose, pred_lift_pose,
    gt_mesh, gt_reg_pose, gt_lift_pose,
    mesh_valid, reg_valid, lift_valid,
    faces: np.ndarray, weights: LossWeights,
    edge_enabled,                      # scalar 0/1 (epoch-gated edge term)
    face_loss_dtype=None,
) -> GatorLossOut:
    """Stage-2 loss: vertex L1 + normal + (gated) edge + two joint L1s
    (reference: lib/core/base.py:139-148; the edge term activates after
    cfg.TRAIN.edge_loss_start epochs).

    face_loss_dtype: optional compute dtype for the two face-based terms
    (bfloat16 in the fast training path — the [B, 13776, 3] per-face
    tensors are pure HBM bandwidth; reductions stay f32). The L1 terms
    and the returned scalars are always f32."""
    cg = make_corner_gather(faces, pred_mesh.shape[1])
    fm_pred, fm_gt = pred_mesh, gt_mesh
    if face_loss_dtype is not None:
        fm_pred = pred_mesh.astype(face_loss_dtype)
        fm_gt = gt_mesh.astype(face_loss_dtype)
    l_vert = coord_l1_loss(pred_mesh, gt_mesh, mesh_valid)
    # ONE corner-gather set feeds both face losses (separate gathers cost
    # ~6 extra [B, 13776, 3] HBM reads per step)
    po = cg(fm_pred)
    pg = _gt_corners(fm_gt, faces)
    l_norm = weights.normal * _normal_from_corners(po, pg)
    l_edge = (weights.edge * edge_enabled * _edge_from_corners(po, pg))
    l_reg = weights.joint * coord_l1_loss(
        pred_reg_pose, gt_reg_pose, reg_valid)
    l_lift = weights.joint * coord_l1_loss(
        pred_lift_pose, gt_lift_pose, lift_valid)
    total = l_vert + l_norm + l_edge + l_reg + l_lift
    return GatorLossOut(total, l_vert, l_norm, l_edge, l_reg, l_lift)
