"""Core device-resident containers.

TPU-first re-design of the reference's ``util::Cloud`` / ``util::PointList``
(reference: include/gpd/util/cloud.h:39, include/gpd/util/point_list.h) and
``candidate::Hand`` (include/gpd/candidate/hand.h): instead of per-point PCL
objects and per-candidate Hand objects, everything is a padded
struct-of-arrays pytree with validity masks, so the whole pipeline runs as a
fixed-shape XLA program.

Conventions:
  - ``points``/``normals`` are (N, 3) float32 row-vectors (the reference uses
    3xN Eigen column-major; rows map better onto (8,128) VPU tiles).
  - ``cam_source`` is a (N,) uint32 bitmask (bit k = seen by camera k),
    replacing the reference's k x n 0/1 matrix (cloud.h:342-343).
  - padded slots have ``mask == False``; padded point coordinates are pushed
    to ``PAD_COORD`` so they never enter any radius neighborhood.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Far-away coordinate for padded points: outside any plausible workspace,
# keeps distance math finite.
PAD_COORD = 1.0e6


def _next_size(n: int, minimum: int = 256) -> int:
    """Round up to a friendly padded size.

    Buckets are pow2 x {1.25, 1.5, 1.75, 2} multiples of 128 (~12.5% max
    waste): fine enough that padded work tracks the real cloud size, coarse
    enough to bound the number of compile-cache entries.
    """
    s = minimum
    while s < n:
        s *= 2
    if s == minimum:
        return s
    half = s // 2
    for c in (half + half // 4, half + half // 2, half + 3 * half // 4):
        if c >= n and c % 128 == 0:
            return c
    return s


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CloudArrays:
    """Padded device point cloud = the reference's processed Cloud."""

    points: jax.Array        # (N, 3) f32
    normals: jax.Array       # (N, 3) f32 (zeros until estimated)
    cam_source: jax.Array    # (N,) uint32 bitmask
    mask: jax.Array          # (N,) bool
    view_points: jax.Array   # (V, 3) f32 camera positions

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def num_cameras(self) -> int:
        return self.view_points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask)

    @staticmethod
    def from_numpy(points: np.ndarray,
                   view_points: Optional[np.ndarray] = None,
                   cam_source: Optional[np.ndarray] = None,
                   normals: Optional[np.ndarray] = None,
                   capacity: Optional[int] = None) -> "CloudArrays":
        """Build a padded CloudArrays from host arrays.

        Mirrors the 1- and 2-camera Cloud constructors
        (reference: src/gpd/util/cloud.cpp:11-152): ``view_points`` is (V,3);
        ``cam_source`` either None (single camera -> all bit 0) or an (N,)
        uint32 bitmask / (V,N) 0-1 matrix.
        """
        points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        n = points.shape[0]
        cap = capacity or _next_size(n)
        if view_points is None:
            view_points = np.zeros((1, 3), np.float32)
        view_points = np.asarray(view_points, dtype=np.float32).reshape(-1, 3)

        if cam_source is None:
            cs = np.ones(n, dtype=np.uint32)  # bit 0
        else:
            cam_source = np.asarray(cam_source)
            if cam_source.ndim == 2:  # (V, N) 0/1 matrix like the reference
                bits = (cam_source != 0).astype(np.uint32)
                cs = np.zeros(n, dtype=np.uint32)
                for k in range(bits.shape[0]):
                    cs |= bits[k] << np.uint32(k)
            else:
                cs = cam_source.astype(np.uint32)

        pts = np.full((cap, 3), PAD_COORD, dtype=np.float32)
        pts[:n] = points
        nrm = np.zeros((cap, 3), dtype=np.float32)
        if normals is not None:
            nrm[:n] = np.asarray(normals, dtype=np.float32).reshape(-1, 3)
        cs_pad = np.zeros(cap, dtype=np.uint32)
        cs_pad[:n] = cs
        mask = np.zeros(cap, dtype=bool)
        mask[:n] = True

        return CloudArrays(
            points=jnp.asarray(pts),
            normals=jnp.asarray(nrm),
            cam_source=jnp.asarray(cs_pad),
            mask=jnp.asarray(mask),
            view_points=jnp.asarray(view_points),
        )

    def compact_host(self, capacity: Optional[int] = None) -> "CloudArrays":
        """Drop padded slots (host sync) and re-pad to a snug bucket, or to
        a caller-fixed ``capacity`` (batch jobs pin one capacity across many
        clouds so every downstream kernel compiles once)."""
        mask = np.asarray(self.mask)
        idx = np.nonzero(mask)[0]
        return CloudArrays.from_numpy(
            np.asarray(self.points)[idx],
            view_points=np.asarray(self.view_points),
            cam_source=np.asarray(self.cam_source)[idx],
            normals=np.asarray(self.normals)[idx],
            capacity=capacity,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Samples:
    """Padded sample set: either xyz positions or indices into the cloud."""

    positions: jax.Array     # (S, 3) f32
    mask: jax.Array          # (S,) bool

    @staticmethod
    def from_numpy(positions: np.ndarray, capacity: Optional[int] = None) -> "Samples":
        positions = np.asarray(positions, dtype=np.float32).reshape(-1, 3)
        s = positions.shape[0]
        cap = capacity or _next_size(s, minimum=8)
        pos = np.full((cap, 3), PAD_COORD, dtype=np.float32)
        pos[:s] = positions
        mask = np.zeros(cap, dtype=bool)
        mask[:s] = True
        return Samples(positions=jnp.asarray(pos), mask=jnp.asarray(mask))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Grasps:
    """Struct-of-arrays grasp batch = the reference's vector<Hand>
    (include/gpd/candidate/hand.h). Flat over (sample x axis x orientation)."""

    position: jax.Array       # (G, 3) f32: hand bottom-center in world
    orientation: jax.Array    # (G, 3, 3) f32: columns approach/binormal/axis
    sample: jax.Array         # (G, 3) f32
    width: jax.Array          # (G,) f32 grasp aperture
    score: jax.Array          # (G,) f32 classifier score
    bottom: jax.Array         # (G,) f32 closing-box bottom (hand frame x)
    top: jax.Array            # (G,) f32 closing-box top
    center: jax.Array         # (G,) f32 closing-box lateral center
    finger_placement: jax.Array  # (G,) i32
    full_antipodal: jax.Array    # (G,) bool
    half_antipodal: jax.Array    # (G,) bool
    valid: jax.Array             # (G,) bool
    sample_id: jax.Array         # (G,) i32: originating sample index

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid)

    @property
    def approach(self) -> jax.Array:
        return self.orientation[..., :, 0]

    @property
    def binormal(self) -> jax.Array:
        return self.orientation[..., :, 1]

    @property
    def axis(self) -> jax.Array:
        return self.orientation[..., :, 2]

    def take(self, idx) -> "Grasps":
        return jax.tree_util.tree_map(lambda a: a[idx], self)

    def to_host(self) -> "Grasps":
        """One bulk device->host transfer of every field (on remote-TPU
        backends each eager fetch is a round trip; never fetch per-grasp)."""
        return jax.tree_util.tree_map(np.asarray, self)

    def to_host_list(self):
        """Materialize valid grasps as a list of dicts (for printing/CSV)."""
        h = self.to_host()
        order = np.nonzero(h.valid)[0]
        out = []
        for i in order:
            out.append(dict(
                position=h.position[i],
                orientation=h.orientation[i],
                sample=h.sample[i],
                width=float(h.width[i]),
                score=float(h.score[i]),
                bottom=float(h.bottom[i]),
                top=float(h.top[i]),
                center=float(h.center[i]),
                finger_placement=int(h.finger_placement[i]),
                full_antipodal=bool(h.full_antipodal[i]),
                half_antipodal=bool(h.half_antipodal[i]),
            ))
        return out


def write_grasps_csv(path: str, grasps: Grasps) -> None:
    """CSV export matching Hand::writeHandsToFile columns
    (reference: src/gpd/candidate/hand.cpp:48-68):
    position, axis, approach, binormal, grasp_width."""
    rows = []
    for g in grasps.to_host_list():
        R = g["orientation"]
        vals = list(g["position"]) + list(R[:, 2]) + list(R[:, 0]) + \
            list(R[:, 1]) + [g["width"]]
        rows.append(",".join(f"{v:.6f}" for v in vals))
    with open(path, "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
