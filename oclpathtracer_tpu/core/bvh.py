"""Flattened BVH — build (host, numpy) and reference traversal (jnp).

The reference intersects by brute-force linear scan over all triangles
(intersectWorld, GenerateColors.cl:137-154) — fine for its 36 triangles, hopeless
beyond. The north star (BASELINE.json) mandates the upgrade: a flattened BVH laid
out for Pallas.

Layout: pre-order depth-first with SKIP LINKS — stackless traversal suited to the
TPU's vector ISA (SURVEY.md §7 hard-part 2):

  * node i's first child is i+1 (pre-order); `skip[i]` is the node visited when the
    subtree rooted at i is culled — traversal is `i = hit ? i+1 : skip[i]`, one
    scalar induction variable, no stack;
  * leaves store a contiguous [tri_start, tri_start+tri_count) range into a
    REORDERED triangle array, so leaf tests are dense vector loops;
  * the Pallas kernel (kernels/bvh_megakernel.py) walks nodes SYNCHRONIZED across
    the (8,128) ray tile — node data comes from SMEM as scalars, every lane tests
    its own ray against the node box, and the tile descends iff ANY lane hits:
    coherent tiles prune like a scalar tracer, incoherent tiles degrade gracefully
    toward the brute-force cost.

Build: top-down binned SAH (16 bins over the longest centroid axis, surface-area
cost SA_L·N_L + SA_R·N_R, median-split fallback for degenerate distributions).
The builder is host-side numpy; on the tile-synchronized traversal a better tree
directly shrinks the UNION of subtrees an incoherent tile visits.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from oclpathtracer_tpu.scene.types import Geometry


class FlatBVH(NamedTuple):
    """Flattened BVH as jnp arrays (a pytree; replicable across the mesh).

    nodes_min/max: (N, 3) f32 — node AABBs
    skip:          (N,) i32  — next node when this subtree is culled (N = end)
    tri_start:     (N,) i32  — leaf: first triangle in the REORDERED order; -1 internal
    tri_count:     (N,) i32  — leaf: triangle count; 0 for internal nodes
    order:         (T,) i32  — reordered-tri -> original-tri index map
    """

    nodes_min: jnp.ndarray
    nodes_max: jnp.ndarray
    skip: jnp.ndarray
    tri_start: jnp.ndarray
    tri_count: jnp.ndarray
    order: jnp.ndarray

    @property
    def num_nodes(self) -> int:
        return self.skip.shape[0]


_SAH_BINS = 16


def _sah_split(idxs: np.ndarray, centroid: np.ndarray,
               tri_min: np.ndarray, tri_max: np.ndarray):
    """Binned-SAH split of `idxs`; returns (left_idxs, right_idxs).

    Evaluates 16 uniform centroid bins on the longest centroid axis; the split
    minimizing SA(L)·N(L) + SA(R)·N(R). Falls back to an exact median split when
    the centroids are degenerate (zero extent) or SAH puts everything on one side.
    """
    c = centroid[idxs]
    ext = c.max(axis=0) - c.min(axis=0)
    axis = int(np.argmax(ext))
    key = c[:, axis]
    lo, hi = float(key.min()), float(key.max())

    def median():
        mid = len(idxs) // 2
        part = np.argpartition(key, mid)
        return idxs[part[:mid]], idxs[part[mid:]]

    if hi - lo < 1e-12:
        return median()

    bins = np.minimum(
        ((key - lo) * (_SAH_BINS / (hi - lo))).astype(np.int64), _SAH_BINS - 1)
    counts = np.bincount(bins, minlength=_SAH_BINS)

    # Per-bin AABBs -> prefix/suffix sweep of surface areas.
    bmin = np.full((_SAH_BINS, 3), np.inf)
    bmax = np.full((_SAH_BINS, 3), -np.inf)
    for a in range(3):
        np.minimum.at(bmin[:, a], bins, tri_min[idxs, a])
        np.maximum.at(bmax[:, a], bins, tri_max[idxs, a])

    def areas(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    lmin = np.minimum.accumulate(bmin, axis=0)
    lmax = np.maximum.accumulate(bmax, axis=0)
    rmin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
    rmax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
    nl = np.cumsum(counts)[:-1]                 # tris in bins [0..s]
    nr = len(idxs) - nl
    cost = areas(lmin, lmax)[:-1] * nl + areas(rmin, rmax)[1:] * nr
    # Empty-side splits get infinite cost.
    cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
    if not np.isfinite(cost).any():
        return median()
    s = int(np.argmin(cost))
    go_left = bins <= s
    return idxs[go_left], idxs[~go_left]


def build_bvh(geom: Geometry, leaf_size: int = 4, branching: int = 2) -> FlatBVH:
    """Host-side build; returns the flattened pre-order skip-link BVH.

    branching: children per internal node (power of two). The flattened format
    is branching-agnostic (box + skip + leaf range per node); wider trees have
    ~(b-1)/b fewer internal nodes, which directly cuts the tile-synchronized
    traversal's iteration count — its measured cost driver — because an
    incoherent (8,128) tile visits the UNION of its rays' subtrees (~73% of all
    nodes on a 5k-tri scene). A b-wide node is built as log2(b) recursive binned-
    SAH splits, so box quality matches the binary tree."""
    p1 = np.asarray(geom.p1, np.float64)
    p2 = np.asarray(geom.p2, np.float64)
    p3 = np.asarray(geom.p3, np.float64)
    n_tris = p1.shape[0]

    tri_min = np.minimum(np.minimum(p1, p2), p3)
    tri_max = np.maximum(np.maximum(p1, p2), p3)
    centroid = (tri_min + tri_max) * 0.5

    order = np.arange(n_tris)

    # Recursive build into python lists, then flatten.
    nodes_min, nodes_max, skips, starts, counts = [], [], [], [], []

    def emit(idxs: np.ndarray) -> int:
        """Emit subtree for triangles `idxs` (positions in `order` space); returns
        the emitted node id."""
        nid = len(nodes_min)
        bmin = tri_min[idxs].min(axis=0)
        bmax = tri_max[idxs].max(axis=0)
        nodes_min.append(bmin)
        nodes_max.append(bmax)
        skips.append(-1)     # patched after subtree emitted
        starts.append(-1)
        counts.append(0)

        if len(idxs) <= leaf_size:
            starts[nid] = emit.tri_cursor
            counts[nid] = len(idxs)
            emit.reordered.extend(idxs.tolist())
            emit.tri_cursor += len(idxs)
        else:
            # Split into up to `branching` children via recursive SAH
            # splits, largest group first, REPLACED IN PLACE (stable child
            # order). Splitting one group per step keeps the child count
            # exactly ≤ branching — the earlier split-every-group rounds
            # could overshoot to ~2×branching−1, which the 8-wide node
            # format (widen_bvh) cannot hold.
            groups = [idxs]
            while len(groups) < branching:
                gi_best, sz_best = -1, leaf_size
                for gi, g in enumerate(groups):
                    if len(g) > sz_best:
                        gi_best, sz_best = gi, len(g)
                if gi_best < 0:
                    break  # nothing left to split
                l, r = _sah_split(groups[gi_best], centroid, tri_min, tri_max)
                groups[gi_best:gi_best + 1] = [l, r]
            for g in groups:
                emit(g)
        skips[nid] = len(nodes_min)  # next pre-order node after this subtree
        return nid

    emit.tri_cursor = 0
    emit.reordered = []
    emit(order)

    return FlatBVH(
        nodes_min=jnp.asarray(np.asarray(nodes_min, np.float32)),
        nodes_max=jnp.asarray(np.asarray(nodes_max, np.float32)),
        skip=jnp.asarray(np.asarray(skips, np.int32)),
        tri_start=jnp.asarray(np.asarray(starts, np.int32)),
        tri_count=jnp.asarray(np.asarray(counts, np.int32)),
        order=jnp.asarray(np.asarray(emit.reordered, np.int32)),
    )


class WideBVH(NamedTuple):
    """8-wide node groups derived from a FlatBVH (same tree, same leaf order).

    One GROUP per internal node holds its ≤8 children's AABBs and metadata
    contiguously, so a traversal iteration can slab-test all siblings in one
    batch (kernels/wide_bvh.py). child_kind: 0 = empty slot (inverted box —
    can never be hit), 1 = internal (child_a = child's group id), 2 = leaf
    (child_a = tri_start, child_b = tri_count). depth = max stack depth a
    bitmask-stack traversal needs (root group = id 0).
    """

    child_min: jnp.ndarray   # (G, 8, 3) f32
    child_max: jnp.ndarray   # (G, 8, 3) f32
    child_kind: jnp.ndarray  # (G, 8) i32
    child_a: jnp.ndarray     # (G, 8) i32
    child_b: jnp.ndarray     # (G, 8) i32
    order: jnp.ndarray       # (T,) i32 — same reorder as the source FlatBVH
    depth: int


def widen_bvh(bvh: FlatBVH, max_children: int = 8) -> WideBVH:
    """Group each internal node's children into one wide node (host, numpy).

    Children are stored in pre-order (slot 0 = leftmost), so a traversal that
    pops the lowest set stack bit visits leaves in EXACTLY the pre-order the
    skip-link walk uses — outputs stay bitwise-identical (extra speculative
    leaf visits can never win a best-hit: any triangle in a prunable box has
    t ≥ the box's t_near ≥ best_t)."""
    skip = np.asarray(bvh.skip)
    start = np.asarray(bvh.tri_start)
    count = np.asarray(bvh.tri_count)
    nmin = np.asarray(bvh.nodes_min)
    nmax = np.asarray(bvh.nodes_max)
    n = skip.shape[0]
    internal = count == 0

    if n == 1 or not internal[0]:
        # Degenerate single-leaf tree: one group whose slot 0 is the leaf.
        cmin = np.full((1, max_children, 3), 1e30, np.float32)
        cmax = np.full((1, max_children, 3), -1e30, np.float32)
        kind = np.zeros((1, max_children), np.int32)
        a = np.zeros((1, max_children), np.int32)
        b = np.zeros((1, max_children), np.int32)
        cmin[0, 0] = nmin[0]
        cmax[0, 0] = nmax[0]
        kind[0, 0] = 2
        a[0, 0] = start[0]
        b[0, 0] = count[0]
        return WideBVH(jnp.asarray(cmin), jnp.asarray(cmax),
                       jnp.asarray(kind), jnp.asarray(a), jnp.asarray(b),
                       bvh.order, 1)

    gid = -np.ones(n, np.int64)
    g = 0
    for i in range(n):
        if internal[i]:
            gid[i] = g
            g += 1
    cmin = np.full((g, max_children, 3), 1e30, np.float32)
    cmax = np.full((g, max_children, 3), -1e30, np.float32)
    kind = np.zeros((g, max_children), np.int32)
    a = np.zeros((g, max_children), np.int32)
    b = np.zeros((g, max_children), np.int32)
    depth = np.zeros(g, np.int64)  # filled bottom-up below (children first? no: compute after)

    for i in range(n):
        if not internal[i]:
            continue
        gi = gid[i]
        c = i + 1
        slot = 0
        while c < skip[i]:
            assert slot < max_children, (
                f"node {i} has >{max_children} children — build with "
                f"branching <= {max_children}")
            cmin[gi, slot] = nmin[c]
            cmax[gi, slot] = nmax[c]
            if internal[c]:
                kind[gi, slot] = 1
                a[gi, slot] = gid[c]
            else:
                kind[gi, slot] = 2
                a[gi, slot] = start[c]
                b[gi, slot] = count[c]
            c = skip[c]
            slot += 1

    # Stack depth: groups are numbered in pre-order, so children have larger
    # ids — one reverse sweep computes subtree depths.
    for gi in range(g - 1, -1, -1):
        d = 1
        for slot in range(max_children):
            if kind[gi, slot] == 1:
                d = max(d, 1 + int(depth[a[gi, slot]]))
        depth[gi] = d

    return WideBVH(jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(kind),
                   jnp.asarray(a), jnp.asarray(b), bvh.order, int(depth[0]))


def reorder_geometry(geom: Geometry, bvh: FlatBVH) -> Geometry:
    """Geometry permuted into BVH leaf order (dense leaf ranges for the kernels)."""
    o = bvh.order
    return Geometry(p1=geom.p1[o], p2=geom.p2[o], p3=geom.p3[o],
                    mat_id=geom.mat_id[o])


def _ray_box_hit(o, inv_d, bmin, bmax, t_best):
    """Slab test: does the ray hit [bmin, bmax] closer than t_best?

    o, inv_d: (..., 3); bmin/bmax broadcastable. Standard robust slab with the
    min/max swap absorbed by taking elementwise min/max of the two plane ts.
    """
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)


def intersect_bvh_one(o, d, bvh: FlatBVH, rgeom: Geometry, t_max=1e20):
    """Single-ray stackless traversal (jnp while_loop) — the correctness reference
    for the Pallas tile traversal. o, d: (3,). Returns (t, tri_idx_in_reordered).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    n_nodes = bvh.num_nodes

    def cond(c):
        node, t_best, best = c
        return node < n_nodes

    def body(c):
        node, t_best, best = c
        bmin = bvh.nodes_min[node]
        bmax = bvh.nodes_max[node]
        box_hit = _ray_box_hit(o, inv_d, bmin, bmax, t_best)
        count = bvh.tri_count[node]
        is_leaf = count > 0

        def leaf_scan(c2):
            t_best, best = c2
            start = bvh.tri_start[node]

            def tri_body(k, c3):
                t_best, best = c3
                j = start + k
                e1 = rgeom.p2[j] - rgeom.p1[j]
                e2 = rgeom.p3[j] - rgeom.p1[j]
                pvec = jnp.cross(d, e2)
                det = jnp.dot(e1, pvec)
                front = det >= 1e-8
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tvec = o - rgeom.p1[j]
                u = jnp.dot(tvec, pvec) * inv_det
                qvec = jnp.cross(tvec, e1)
                v = jnp.dot(d, qvec) * inv_det
                t = jnp.dot(e2, qvec) * inv_det
                ok = (front & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                      & (t > 0) & (t < t_best))
                return jnp.where(ok, t, t_best), jnp.where(ok, j, best)

            return jax.lax.fori_loop(0, count, tri_body, (t_best, best))

        t_best, best = jax.lax.cond(
            box_hit & is_leaf, leaf_scan, lambda c2: c2, (t_best, best))
        descend = box_hit & ~is_leaf
        node = jnp.where(descend, node + 1, bvh.skip[node])
        return node, t_best, best

    _, t_best, best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(t_max), jnp.int32(-1)))
    return t_best, best


def intersect_bvh(o, d, bvh: FlatBVH, rgeom: Geometry, t_max=1e20):
    """Batched jnp traversal via vmap (reference path; the fast path is the Pallas
    tile-synchronized kernel). Returns (t (N,), reordered tri idx (N,), hit (N,))."""
    t, idx = jax.vmap(lambda oo, dd: intersect_bvh_one(oo, dd, bvh, rgeom, t_max))(o, d)
    return t, idx, idx >= 0
