"""Terrain system: quadtree LOD chunks, height queries, vegetation scatter.

Reference surface:
- gui_client/TerrainSystem.{h,cpp}: TerrainNode quadtree refined by camera
  distance (updateCampos, TerrainSystem.h:177,194-201), per-chunk mesh
  generation (MakeTerrainChunkTask) + physics heightfield objects,
  evalTerrainHeight(x, y, quad_w) point query (TerrainSystem.h:190; used by
  the tick's player terrain clamp, GUIClient.cpp:6521-6539), heightmap +
  mask texture paging, water.
- gui_client/TerrainScattering.{h,cpp}: per-cell vegetation chunks
  (VegetationLocationInfo{pos, scale}), precomputed scatter points matching
  a GPU compute-shader layout (TerrainScattering.h:56-120) — here the
  scatter-point generation IS the device kernel (one jitted batch per
  cell block), grid scatters with fade bands, small-tree physics objects.
- gui_client/BiomeManager.*: park/grass biome scattering over parcels.

Device design: the heightfield lives in HBM (physics.state.Heightfield);
height queries, chunk-mesh vertex generation and scatter-point generation
are all batched jitted kernels; the host keeps only the quadtree bookkeeping.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics.state import Heightfield


# ---------------------------------------------------------------------------
# Height queries
# ---------------------------------------------------------------------------

@jax.jit
def _eval_heights(hf: Heightfield, xy):
    return hf.sample(xy)


@jax.jit
def _eval_heights_normals(hf: Heightfield, xy):
    return hf.sample_with_normal(xy)


# ---------------------------------------------------------------------------
# Chunk mesh generation (device kernel)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("res",))
def make_terrain_chunk(hf: Heightfield, origin, chunk_w, res: int = 16):
    """Vertex grid + normals + uvs for one quadtree chunk
    (MakeTerrainChunkTask equivalent; res x res quads).

    Returns (verts [(res+1)^2, 3], normals [(res+1)^2, 3], uvs [(res+1)^2, 2],
    indices [res*res*2, 3] i32).
    """
    n = res + 1
    xs = jnp.linspace(0.0, 1.0, n) * chunk_w + origin[0]
    ys = jnp.linspace(0.0, 1.0, n) * chunk_w + origin[1]
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    h, nrm = hf.sample_with_normal(xy)
    verts = jnp.concatenate([xy, h[:, None]], axis=1)
    uvs = (xy - jnp.asarray(origin)[None, :]) / chunk_w

    ii = jnp.arange(res)
    jj = jnp.arange(res)
    qi, qj = jnp.meshgrid(ii, jj, indexing="ij")
    v00 = (qi * n + qj).reshape(-1)
    v10 = v00 + n
    v01 = v00 + 1
    v11 = v00 + n + 1
    tris = jnp.concatenate([
        jnp.stack([v00, v10, v11], axis=1),
        jnp.stack([v00, v11, v01], axis=1),
    ]).astype(jnp.int32)
    return verts, nrm, uvs, tris


# ---------------------------------------------------------------------------
# Quadtree
# ---------------------------------------------------------------------------

@dataclass(eq=False)
class TerrainNode:
    """TerrainSystem.h TerrainNode: a quadtree cell, subdivided near the
    camera."""

    origin: np.ndarray       # xy of min corner
    width: float
    depth: int
    children: list = field(default_factory=list)
    chunk: tuple | None = None   # (verts, normals, uvs, tris) when leaf built
    id: int = 0

    @property
    def is_leaf(self):
        return not self.children


class TerrainSystem:
    """Host orchestrator for terrain: owns the device heightfield, refines a
    quadtree against the camera position, builds chunk meshes on demand and
    registers the heightfield with the physics world."""

    MAX_DEPTH = 6
    # Subdivide when camera is closer than width * this factor
    # (quadtree refinement distance ratio, TerrainSystem updateCampos).
    REFINE_FACTOR = 1.5

    def __init__(self, physics_world=None, extent: float = 1024.0,
                 chunk_res: int = 16):
        self.physics_world = physics_world
        self.extent = extent
        self.chunk_res = chunk_res
        self.heightfield = None
        self.water_z = -1e10
        self.root = TerrainNode(origin=np.array([-extent / 2, -extent / 2]),
                                width=extent, depth=0)
        self._next_id = 1
        self.built_chunks: dict[int, tuple] = {}
        self.num_chunks_built = 0

    def set_heightmap(self, heights: np.ndarray, origin, cell_w: float):
        self.heightfield = Heightfield(
            heights=jnp.asarray(heights, jnp.float32),
            origin=jnp.asarray(origin, jnp.float32),
            cell_w=jnp.float32(cell_w))
        if self.physics_world is not None:
            self.physics_world.set_heightfield(heights, origin, cell_w)

    # evalTerrainHeight parity (TerrainSystem.h:190).
    def eval_terrain_height(self, x: float, y: float) -> float:
        if self.heightfield is None:
            return 0.0
        return float(_eval_heights(self.heightfield,
                                   jnp.array([[x, y]], jnp.float32))[0])

    def eval_terrain_heights(self, xy: np.ndarray) -> np.ndarray:
        """Batched height query (used by scattering + the player clamp)."""
        if self.heightfield is None:
            return np.zeros(len(xy), np.float32)
        return np.asarray(_eval_heights(self.heightfield,
                                        jnp.asarray(xy, jnp.float32)))

    # ------------------------------------------------------------------
    def update_campos(self, campos):
        """Refine/coarsen the quadtree around the camera and build leaf
        chunk meshes (updateCampos parity)."""
        if self.heightfield is None:
            return
        cam = np.asarray(campos[:2], np.float64)
        self._refine(self.root, cam)
        self._build_leaves(self.root)

    def _refine(self, node: TerrainNode, cam):
        centre = node.origin + node.width / 2
        dist = float(np.linalg.norm(cam - centre))
        want_split = (dist < node.width * self.REFINE_FACTOR
                      and node.depth < self.MAX_DEPTH)
        if want_split and node.is_leaf:
            hw = node.width / 2
            node.chunk = None
            node.children = [
                TerrainNode(origin=node.origin + np.array([dx * hw, dy * hw]),
                            width=hw, depth=node.depth + 1)
                for dx in (0, 1) for dy in (0, 1)]
        elif not want_split and not node.is_leaf:
            node.children = []
            node.chunk = None
        for c in node.children:
            self._refine(c, cam)

    def _build_leaves(self, node: TerrainNode):
        if node.is_leaf:
            if node.chunk is None:
                node.id = self._next_id
                self._next_id += 1
                node.chunk = tuple(np.asarray(a) for a in make_terrain_chunk(
                    self.heightfield, jnp.asarray(node.origin, jnp.float32),
                    jnp.float32(node.width), self.chunk_res))
                self.built_chunks[node.id] = node.chunk
                self.num_chunks_built += 1
        else:
            for c in node.children:
                self._build_leaves(c)

    def visible_chunks(self):
        out = []

        def walk(node):
            if node.is_leaf and node.chunk is not None:
                out.append((node.origin, node.width, node.chunk))
            for c in node.children:
                walk(c)

        walk(self.root)
        return out

    def get_diagnostics(self) -> str:
        leaves = len(self.visible_chunks())
        return (f"TerrainSystem: {leaves} leaf chunks, "
                f"{self.num_chunks_built} built total")


# ---------------------------------------------------------------------------
# Vegetation scattering (device kernel)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("points_per_cell",))
def scatter_points_for_cells(hf: Heightfield, cell_origins, cell_w, seed,
                             points_per_cell: int = 64,
                             max_slope_cos: float = 0.8):
    """Deterministic scatter points for a batch of grid cells — the
    TPU equivalent of the reference's imposter-precompute compute shader
    (TerrainScattering.h:56-120 notes the GLSL layout; SURVEY.md §2.7 maps
    it to a device kernel).

    For each cell: `points_per_cell` hash-jittered positions, snapped to the
    terrain height, masked by slope; per-point deterministic scale/rotation.
    Returns (pos [C, K, 3], scale [C, K], rot [C, K], valid [C, K]).
    """
    c = cell_origins.shape[0]
    k = points_per_cell
    key = jax.random.PRNGKey(seed)
    # Deterministic per-cell keys from cell coordinates (stable across
    # rebuilds — the reference precomputes points once per cell pattern).
    cell_ids = (cell_origins[:, 0].astype(jnp.int32) * 73856093
                ^ cell_origins[:, 1].astype(jnp.int32) * 19349663)
    keys = jax.vmap(lambda cid: jax.random.fold_in(key, cid))(cell_ids)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (k, 4)))(keys)  # [C,K,4]
    xy = cell_origins[:, None, :] + u[..., :2] * cell_w
    flat_xy = xy.reshape(c * k, 2)
    h, n = hf.sample_with_normal(flat_xy)
    h = h.reshape(c, k)
    nz = n[:, 2].reshape(c, k)
    pos = jnp.concatenate([xy, h[..., None]], axis=-1)
    scale = 0.6 + u[..., 2] * 0.8
    rot = u[..., 3] * (2 * jnp.pi)
    valid = nz > max_slope_cos
    return pos, scale, rot, valid


@dataclass
class VegetationLocationInfo:
    """TerrainScattering.h VegetationLocationInfo: {pos, scale} (+rot)."""

    pos: np.ndarray
    scale: float
    rot: float


class TerrainScattering:
    """Camera-driven vegetation chunks (TerrainScattering updateCampos):
    cells within `radius` of the camera get scatter points; far cells are
    dropped.  Small-tree cells can register physics objects per instance
    (TerrainScattering.h:79-83)."""

    def __init__(self, terrain: TerrainSystem, cell_w: float = 32.0,
                 radius_cells: int = 4, points_per_cell: int = 64,
                 seed: int = 1234):
        self.terrain = terrain
        self.cell_w = cell_w
        self.radius_cells = radius_cells
        self.points_per_cell = points_per_cell
        self.seed = seed
        self.chunks: dict[tuple, list[VegetationLocationInfo]] = {}
        self.tree_physics_obs: dict[tuple, list] = {}
        self.make_tree_physics = None  # callback(pos, scale) -> PhysicsObject

    def update_campos(self, campos):
        if self.terrain.heightfield is None:
            return
        cx = math.floor(campos[0] / self.cell_w)
        cy = math.floor(campos[1] / self.cell_w)
        r = self.radius_cells
        wanted = {(cx + dx, cy + dy) for dx in range(-r, r + 1)
                  for dy in range(-r, r + 1)}
        # Drop out-of-range chunks (+ their physics objects).
        for key in list(self.chunks):
            if key not in wanted:
                del self.chunks[key]
                for ob in self.tree_physics_obs.pop(key, []):
                    if self.terrain.physics_world is not None:
                        self.terrain.physics_world.remove_object(ob)
        new_cells = [key for key in wanted if key not in self.chunks]
        if not new_cells:
            return
        origins = jnp.asarray(np.array(
            [[kx * self.cell_w, ky * self.cell_w] for kx, ky in new_cells],
            np.float32))
        pos, scale, rot, valid = scatter_points_for_cells(
            self.terrain.heightfield, origins, jnp.float32(self.cell_w),
            self.seed, self.points_per_cell)
        pos = np.asarray(pos)
        scale = np.asarray(scale)
        rot = np.asarray(rot)
        valid = np.asarray(valid)
        for i, key in enumerate(new_cells):
            infos = [VegetationLocationInfo(pos[i, j], float(scale[i, j]),
                                            float(rot[i, j]))
                     for j in np.nonzero(valid[i])[0]]
            self.chunks[key] = infos
            if self.make_tree_physics is not None:
                obs = []
                for info in infos[:16]:  # cap physics instances per cell
                    ob = self.make_tree_physics(info.pos, info.scale)
                    if ob is not None:
                        obs.append(ob)
                self.tree_physics_obs[key] = obs

    def num_instances(self) -> int:
        return sum(len(v) for v in self.chunks.values())

    def get_diagnostics(self) -> str:
        return (f"TerrainScattering: {len(self.chunks)} cells, "
                f"{self.num_instances()} instances")


class BiomeManager:
    """Park/grass biome scattering over parcels (gui_client/BiomeManager.*):
    deterministic scatter points inside each parcel AABB, snapped to
    terrain."""

    def __init__(self, terrain: TerrainSystem, density_per_m2: float = 0.02,
                 seed: int = 99):
        self.terrain = terrain
        self.density = density_per_m2
        self.seed = seed
        self.parcel_scatter: dict[int, list[VegetationLocationInfo]] = {}

    def add_biome_for_parcel(self, parcel):
        area = float((parcel.aabb_max[0] - parcel.aabb_min[0])
                     * (parcel.aabb_max[1] - parcel.aabb_min[1]))
        n = max(1, int(area * self.density))
        rng = np.random.default_rng(self.seed ^ hash(parcel.parcel_id) & 0xFFFF)
        xy = rng.uniform(parcel.aabb_min[:2], parcel.aabb_max[:2],
                         size=(n, 2)).astype(np.float32)
        h = self.terrain.eval_terrain_heights(xy)
        infos = [VegetationLocationInfo(np.array([x, y, z], np.float32),
                                        float(rng.uniform(0.7, 1.4)),
                                        float(rng.uniform(0, 2 * np.pi)))
                 for (x, y), z in zip(xy, h)]
        self.parcel_scatter[parcel.parcel_id] = infos
        return infos

    def remove_biome_for_parcel(self, parcel_id: int):
        self.parcel_scatter.pop(parcel_id, None)
