"""Marching-tetrahedra surface extraction invariants."""

import numpy as np

from vbr_tpu.ops import marching_cubes as mc


def sphere_volume(n=24, r=8.0):
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0
    return ((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) < r * r


class TestMarchingTets:
    def test_empty_and_full(self):
        empty = np.zeros((8, 8, 8), bool)
        tris, n = mc.extract_mesh(empty)
        assert n == 0
        full = np.ones((8, 8, 8), bool)
        tris, n = mc.extract_mesh(full)
        assert n == 0  # no crossings anywhere

    def test_single_voxel(self):
        vol = np.zeros((5, 5, 5), bool)
        vol[2, 2, 2] = True
        tris, n = mc.extract_mesh(vol)
        assert n > 0
        # all vertices within one voxel of the center
        assert (np.abs(tris.reshape(-1, 3) - 2.0) <= 1.0 + 1e-5).all()

    def test_watertight_sphere(self):
        vol = sphere_volume()
        tris, n = mc.extract_mesh(vol)
        assert n > 100
        verts, faces = mc.mesh_to_vertex_faces(tris)
        # closed 2-manifold: every undirected edge appears exactly twice
        edges = {}
        for f in faces:
            for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                key = (min(a, b), max(a, b))
                edges[key] = edges.get(key, 0) + 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).all(), f"non-manifold edges: {(counts != 2).sum()}"
        # Euler characteristic of a sphere: V - E + F = 2
        assert len(verts) - len(edges) + len(faces) == 2

    def test_vertex_normals_outward_unit(self):
        """Area-weighted vertex normals: unit length, radially outward on
        a sphere, and written as vn//-indexed faces in the OBJ."""
        vol = sphere_volume()
        tris, _ = mc.extract_mesh(vol)
        verts, faces = mc.mesh_to_vertex_faces(tris)
        vn = mc.vertex_normals(verts, faces)
        np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0,
                                   atol=1e-5)
        center = verts.mean(0)
        radial = verts - center
        radial /= np.linalg.norm(radial, axis=1, keepdims=True)
        cos = (vn * radial).sum(1)
        # voxel staircase corners deviate from radial, but normals must
        # never point inward, and the vast majority align well
        assert (cos > 0).all()
        assert (cos > 0.3).mean() > 0.95

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = f"{d}/m.obj"
            mc.write_obj(p, tris)
            txt = open(p).read()
            assert txt.count("\nvn ") + txt.startswith("vn ") == len(verts)
            assert "//" in txt

    def test_outward_orientation_and_volume(self):
        vol = sphere_volume()
        tris, _ = mc.extract_mesh(vol)
        # signed volume via divergence theorem must be positive and close
        # to the voxel count
        v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
        signed = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
        voxels = vol.sum()
        assert signed > 0, "mesh must be outward-oriented"
        assert abs(signed - voxels) / voxels < 0.15

    def test_spacing_and_origin(self):
        vol = np.zeros((4, 4, 4), bool)
        vol[1:3, 1:3, 1:3] = True
        tris, _ = mc.extract_mesh(vol, origin=(10, 20, 30), spacing=(2, 2, 2))
        mins = tris.reshape(-1, 3).min(0)
        maxs = tris.reshape(-1, 3).max(0)
        assert (mins >= np.array([10, 20, 30])).all()
        assert (maxs <= np.array([10 + 6, 20 + 6, 30 + 6])).all()

    def test_capacity_chunking(self):
        vol = sphere_volume()
        tris_big, n_big = mc.extract_mesh(vol, capacity=4096)
        tris_small, n_small = mc.extract_mesh(vol, capacity=64)
        assert n_big == n_small
        # same triangle set regardless of chunking
        a = np.sort(tris_big.reshape(n_big, -1), axis=0)
        b = np.sort(tris_small.reshape(n_small, -1), axis=0)
        np.testing.assert_allclose(a, b, atol=1e-6)


def _edge_counts(faces):
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    return edges


def _signed_volume(tris):
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    return np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0


class TestClassicMarchingCubes:
    """Generated 256-case table (algorithm="cubes") — algorithmic parity
    with the reference's skimage.measure.marching_cubes call
    (voxel_reconstruction.py:142)."""

    def test_table_invariants(self):
        table, mids = mc._MC_TABLE_NP, mc._MC_MIDS_NP
        assert table.shape == (256, 5, 3)  # classic MC max = 5 triangles
        assert mids.shape == (12, 3)
        # empty/full configs emit nothing; single-corner configs emit 1
        assert (table[0] == -1).all() and (table[255] == -1).all()
        for c in (1, 2, 4, 8, 16, 32, 64, 128):
            assert (table[c, 0] >= 0).all() and (table[c, 1:] == -1).all()
        # midpoints: one half-integer coordinate, two integers
        frac = mids - np.floor(mids)
        assert ((frac == 0.5).sum(axis=1) == 1).all()
        assert ((frac == 0.0).sum(axis=1) == 2).all()

    def test_sphere_watertight_euler_volume(self):
        vol = sphere_volume()
        tris, n = mc.extract_mesh(vol, algorithm="cubes")
        assert n > 100
        verts, faces = mc.mesh_to_vertex_faces(tris)
        counts = np.array(list(_edge_counts(faces).values()))
        assert (counts == 2).all(), f"non-manifold: {(counts != 2).sum()}"
        assert len(verts) - len(counts) + len(faces) == 2
        signed = _signed_volume(tris)
        voxels = vol.sum()
        assert signed > 0
        assert abs(signed - voxels) / voxels < 0.15
        # classic MC emits far fewer triangles than the tet decomposition
        _, n_tet = mc.extract_mesh(vol)
        assert n < 0.5 * n_tet

    def test_vertices_on_cell_edges(self):
        vol = sphere_volume(n=12, r=4.0)
        tris, _ = mc.extract_mesh(vol, algorithm="cubes")
        flat = tris.reshape(-1, 3)
        frac = flat - np.floor(flat)
        # every vertex is an edge midpoint: exactly one .5 coordinate
        assert ((frac == 0.5).sum(axis=1) == 1).all()
        assert ((frac == 0.0).sum(axis=1) == 2).all()

    def test_random_volumes_watertight_and_oriented(self):
        """Fuzz the table's cross-cell consistency: any padded random
        volume must produce a closed, outward-oriented surface — this
        exercises every config pair across shared faces, including the
        ambiguous separate-inside rule."""
        rng = np.random.default_rng(0)
        for _ in range(30):
            vol = np.zeros((7, 7, 7), bool)
            vol[1:6, 1:6, 1:6] = rng.random((5, 5, 5)) < 0.45
            if not vol.any():
                continue
            tris, n = mc.extract_mesh(vol, algorithm="cubes")
            assert n > 0
            _, faces = mc.mesh_to_vertex_faces(tris)
            counts = np.array(list(_edge_counts(faces).values()))
            # closed surface: every edge has EVEN multiplicity.  Count 4
            # happens only where two diagonally-touching regions pinch
            # through the same welded edge midpoints — inherent to
            # binary-field MC, each sheet individually contributes 2.
            assert (counts % 2 == 0).all()
            assert (counts <= 4).all()
            assert _signed_volume(tris) > 0

    def test_capacity_chunking_cubes(self):
        vol = sphere_volume()
        tris_big, n_big = mc.extract_mesh(vol, algorithm="cubes",
                                          capacity=4096)
        tris_small, n_small = mc.extract_mesh(vol, algorithm="cubes",
                                              capacity=64)
        assert n_big == n_small
        a = np.sort(tris_big.reshape(n_big, -1), axis=0)
        b = np.sort(tris_small.reshape(n_small, -1), axis=0)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_volume_agreement_with_tetrahedra(self):
        """Both algorithms bound the same inside set; enclosed volumes
        agree to the corner-trimming difference."""
        vol = sphere_volume()
        tris_c, _ = mc.extract_mesh(vol, algorithm="cubes")
        tris_t, _ = mc.extract_mesh(vol)
        vc, vt = _signed_volume(tris_c), _signed_volume(tris_t)
        assert abs(vc - vt) / vt < 0.05
