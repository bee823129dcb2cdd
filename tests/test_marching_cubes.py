"""Marching-tetrahedra surface extraction invariants."""

import pytest
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


# ---------------------------------------------------------------------------
# Output-level parity with the reference's skimage call (VERDICT r3 #4)
# ---------------------------------------------------------------------------
#
# scikit-image is not installed in this environment (and the raw package
# cannot be fetched), so parity is pinned to two falsifiable, output-level
# characterizations of what ``skimage.measure.marching_cubes`` emits for the
# reference's call (voxel_reconstruction.py:142 — a BINARY volume):
#
#   1. VERTICES are fully determined: every marching-cubes-family algorithm
#      places exactly one vertex on each lattice edge whose endpoint
#      occupancies differ, at the linear ``level``-crossing.  We compute
#      that set from first principles (three shifted comparisons) and
#      require exact equality — including the reference's degenerate
#      ``level=0`` placement (vertices ON the outside corners).
#   2. TOPOLOGY under Lewiner's MC33 ambiguity resolution is decidable in
#      closed form on binary data: every face test is the sign of the
#      bilinear saddle (A·C−B·D)/(A+C−B−D) = ½ > 0 and every interior test
#      evaluates the trilinear interpolant between diagonal inside corners
#      (> 0), so MC33 always JOINS inside corners → surface components
#      follow 26-connectivity of the inside voxels against 6-connectivity
#      of the outside.  ``ambiguity="join"`` implements exactly that rule;
#      we verify the component semantics against scipy.ndimage.label
#      ground truth.
#
# Principled divergence (documented, inherent): the triangulation of each
# surface patch (fan/tube vs MC33's tiling of the same boundary polygons)
# and the default vertex placement (0.5 midpoints vs the reference's
# degenerate level-0) — same vertex set, same patch boundaries, same
# topology.


def _crossed_edge_midpoints(vol, level=0.5):
    """First-principles expected vertex set: the linear level-crossing of
    every lattice edge whose endpoints straddle ``level``."""
    v = vol.astype(np.float64)
    pts = []
    for ax in range(3):
        a = v[tuple(slice(0, -1) if i == ax else slice(None) for i in range(3))]
        b = v[tuple(slice(1, None) if i == ax else slice(None) for i in range(3))]
        crossed = (a > level) != (b > level)
        idx = np.argwhere(crossed).astype(np.float64)
        if len(idx) == 0:
            continue
        va = a[crossed]
        t = (va - level) / (va - b[crossed])
        p = idx.copy()
        p[:, ax] += t
        pts.append(p)
    if not pts:
        return np.zeros((0, 3))
    return np.unique(np.concatenate(pts).round(decimals=6), axis=0)


def _mesh_vertex_set(tris):
    return np.unique(tris.reshape(-1, 3).round(decimals=6), axis=0)


def _random_vol(rng, n=7, pad=1, p=0.45):
    vol = np.zeros((n, n, n), bool)
    vol[pad:n - pad, pad:n - pad, pad:n - pad] = (
        rng.random((n - 2 * pad,) * 3) < p
    )
    return vol


class TestSkimageOutputParity:
    def test_vertex_set_exact_both_rules(self):
        rng = np.random.default_rng(7)
        vols = [sphere_volume(n=12, r=4.0)] + [
            _random_vol(rng) for _ in range(10)
        ]
        for vol in vols:
            if not vol.any():
                continue
            expected = _crossed_edge_midpoints(vol)
            for amb in ("separate", "join"):
                tris, n = mc.extract_mesh(
                    vol, algorithm="cubes", ambiguity=amb
                )
                got = _mesh_vertex_set(tris)
                np.testing.assert_array_equal(got, expected)

    def test_level_zero_reference_degenerate_placement(self):
        """The reference's exact call is level=0 on a binary volume —
        skimage's interpolation then lands every vertex ON the outside
        corner of its crossed edge.  Same formula here."""
        vol = sphere_volume(n=10, r=3.0)
        tris, n = mc.extract_mesh(
            vol, algorithm="cubes", ambiguity="join", level=0.0
        )
        assert n > 0
        got = _mesh_vertex_set(tris)
        expected = _crossed_edge_midpoints(vol, level=0.0)
        np.testing.assert_array_equal(got, expected)
        # and those points are exactly the outside voxels 6-adjacent to
        # an inside voxel (integer lattice coordinates)
        assert (got == np.round(got)).all()
        for p in got[:: max(1, len(got) // 16)].astype(int):
            assert not vol[tuple(p)]
            nbrs = []
            for ax in range(3):
                for d in (-1, 1):
                    q = p.copy()
                    q[ax] += d
                    if (q >= 0).all() and (q < np.array(vol.shape)).all():
                        nbrs.append(vol[tuple(q)])
            assert any(nbrs)

    def test_level_general_scalar_field(self):
        """Continuous fields: vertices at the exact linear crossing of an
        arbitrary level (skimage's formula), case selection v > level."""
        g = np.arange(14)
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        f = ((x - 6.5) ** 2 + (y - 6.5) ** 2 + (z - 6.5) ** 2) / 20.0
        level = 1.37
        tris, n = mc.extract_mesh(
            (f < 99).astype(np.float32) * 0 + f.astype(np.float32),
            algorithm="cubes", level=level,
        )
        # volume passed as float field; rebuild expected from the field
        got = _mesh_vertex_set(tris)
        # NOTE: extract_mesh's "inside" is v > level, but this field grows
        # outward (inside = small values), so the surface is still the
        # level set — vertex positions are what we check
        expected = _crossed_edge_midpoints(f, level=level)
        assert len(got) == len(expected)
        # kernel interpolates in f32, oracle in f64: match by bijection
        from scipy.spatial import cKDTree

        d, _ = cKDTree(expected).query(got)
        assert d.max() < 1e-4
        d, _ = cKDTree(got).query(expected)
        assert d.max() < 1e-4

    def test_join_is_26_connectivity_separate_is_6(self):
        """A corner-touching diagonal chain: Lewiner's binary resolution
        (join) produces ONE tube-snake; the separate rule produces one
        closed cube per voxel."""
        n = 5
        vol = np.zeros((n + 2, n + 2, n + 2), bool)
        for i in range(n):
            vol[i + 1, i + 1, i + 1] = True

        def n_components(tris):
            verts, faces = mc.mesh_to_vertex_faces(tris)
            parent = list(range(len(verts)))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for f in faces:
                for a, b in ((f[0], f[1]), (f[1], f[2])):
                    parent[find(int(a))] = find(int(b))
            return len({find(i) for i in range(len(verts))})

        tris_s, _ = mc.extract_mesh(vol, algorithm="cubes",
                                    ambiguity="separate")
        tris_j, _ = mc.extract_mesh(vol, algorithm="cubes",
                                    ambiguity="join")
        assert n_components(tris_s) == n
        assert n_components(tris_j) == 1
        # the tube encloses more than the n separate corner-trimmed cubes
        assert _signed_volume(tris_j) > _signed_volume(tris_s)

    def test_component_semantics_vs_scipy_labels(self):
        """Fuzz: mesh component count equals the number of adjacent
        (inside-component, outside-component) pairs, with inside labeled
        at 26-connectivity for join / 6 for separate (and outside at the
        dual connectivity) — scipy.ndimage ground truth.  Volumes where
        sheets share a welded vertex (pinch) are skipped for the count
        (the closedness/orientation fuzz still covers them)."""
        from scipy import ndimage

        s6 = ndimage.generate_binary_structure(3, 1)
        s26 = ndimage.generate_binary_structure(3, 3)
        rng = np.random.default_rng(11)
        checked = 0
        for _ in range(40):
            vol = _random_vol(rng, p=0.35)
            if not vol.any():
                continue
            for amb, s_in, s_out in (
                ("join", s26, s6), ("separate", s6, s26)
            ):
                tris, n = mc.extract_mesh(vol, algorithm="cubes",
                                          ambiguity=amb)
                verts, faces = mc.mesh_to_vertex_faces(tris)
                if _has_vertex_pinch(verts, faces):
                    continue
                lab_in, _ = ndimage.label(vol, structure=s_in)
                lab_out, _ = ndimage.label(~vol, structure=s_out)
                pairs = set()
                for ax in range(3):
                    sl_a = tuple(
                        slice(0, -1) if i == ax else slice(None)
                        for i in range(3)
                    )
                    sl_b = tuple(
                        slice(1, None) if i == ax else slice(None)
                        for i in range(3)
                    )
                    a_in, b_in = lab_in[sl_a], lab_in[sl_b]
                    a_out, b_out = lab_out[sl_a], lab_out[sl_b]
                    m = (a_in > 0) & (b_out > 0)
                    pairs.update(zip(a_in[m].tolist(), b_out[m].tolist()))
                    m = (b_in > 0) & (a_out > 0)
                    pairs.update(zip(b_in[m].tolist(), a_out[m].tolist()))
                got = _n_mesh_components(verts, faces)
                assert got == len(pairs), (amb, got, len(pairs))
                checked += 1
        assert checked >= 20

    def test_join_closed_and_oriented_fuzz(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            vol = _random_vol(rng)
            if not vol.any():
                continue
            tris, n = mc.extract_mesh(vol, algorithm="cubes",
                                      ambiguity="join")
            _, faces = mc.mesh_to_vertex_faces(tris)
            und, dir_ = {}, {}
            for f in faces:
                for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                    k = (min(a, b), max(a, b))
                    und[k] = und.get(k, 0) + 1
                    dir_[(a, b)] = dir_.get((a, b), 0) + 1
            counts = np.array(list(und.values()))
            assert (counts % 2 == 0).all() and (counts <= 4).all()
            for (a, b), c in dir_.items():
                assert dir_.get((b, a), 0) == c
            assert _signed_volume(tris) > 0


def _n_mesh_components(verts, faces):
    parent = list(range(len(verts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2])):
            parent[find(int(a))] = find(int(b))
    used = {find(int(i)) for f in faces for i in f}
    return len(used)


def _has_vertex_pinch(verts, faces):
    """True if any vertex's incident triangles do not form a single fan
    connected through shared mesh edges (two sheets welded at a point or
    an edge)."""
    incident = {}
    for t, f in enumerate(faces):
        for v in f:
            incident.setdefault(int(v), []).append(t)
    for v, ts in incident.items():
        if len(ts) <= 1:
            continue
        # connect triangles sharing an edge THROUGH v
        adj = {t: set() for t in ts}
        by_other = {}
        for t in ts:
            others = [int(x) for x in faces[t] if int(x) != v]
            for o in others:
                by_other.setdefault(o, []).append(t)
        for o, tl in by_other.items():
            for i in range(len(tl)):
                for j in range(i + 1, len(tl)):
                    adj[tl[i]].add(tl[j])
                    adj[tl[j]].add(tl[i])
        seen = {ts[0]}
        stack = [ts[0]]
        while stack:
            cur = stack.pop()
            for nb in adj[cur]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        if len(seen) != len(ts):
            return True
    return False


class TestBinaryTableFastPath:
    """The binary fast path (`emit="auto"` → config grid + generated
    256-entry table, extract_mesh docstring) must be BIT-identical to the
    per-cell device pass: the table is generated by the device emitters
    themselves, so any divergence is a re-basing error."""

    def _both(self, vol, **kw):
        fast = mc.extract_mesh(vol, emit="host_table", **kw)
        slow = mc.extract_mesh(vol, emit="device", **kw)
        return fast, slow

    def test_bit_identical_all_algorithms_random(self):
        rng = np.random.default_rng(21)
        for _ in range(6):
            vol = _random_vol(rng, n=9, p=0.4)
            for kw in (
                dict(algorithm="tetrahedra"),
                dict(algorithm="cubes", ambiguity="separate"),
                dict(algorithm="cubes", ambiguity="join"),
                dict(algorithm="cubes", ambiguity="join", level=0.0),
            ):
                (tf, nf), (ts, ns) = self._both(vol, **kw)
                assert nf == ns, kw
                np.testing.assert_array_equal(tf, ts, err_msg=str(kw))

    def test_bit_identical_with_spacing_origin(self):
        rng = np.random.default_rng(22)
        vol = _random_vol(rng, n=8, p=0.5)
        kw = dict(spacing=(11.5, 16.0, 5.0), origin=(-512.0, -1024.0, 64.0))
        (tf, nf), (ts, ns) = self._both(vol, algorithm="cubes", **kw)
        assert nf == ns
        np.testing.assert_array_equal(tf, ts)

    def test_auto_dispatch(self):
        rng = np.random.default_rng(23)
        vol = _random_vol(rng, n=7)
        # bool volume at a dyadic level → auto == table path
        ta, na = mc.extract_mesh(vol, algorithm="cubes")
        tt, nt = mc.extract_mesh(vol, algorithm="cubes", emit="host_table")
        assert na == nt
        np.testing.assert_array_equal(ta, tt)
        # non-binary volume → auto silently uses the device pass
        field = vol.astype(np.float32) * 0.8 + 0.1
        td, nd = mc.extract_mesh(field, algorithm="cubes", level=0.31)
        assert nd > 0
        with pytest.raises(ValueError):
            mc.extract_mesh(field, algorithm="cubes", level=0.31,
                            emit="host_table")

    def test_empty_and_full_volumes(self):
        z = np.zeros((5, 5, 5), bool)
        assert mc.extract_mesh(z, emit="host_table")[1] == 0
        assert mc.extract_mesh(~z, emit="host_table")[1] == 0

    def test_table_cache_reused(self):
        mc._BINARY_EMIT_TABLES.clear()
        rng = np.random.default_rng(24)
        vol = _random_vol(rng, n=6)
        mc.extract_mesh(vol, algorithm="cubes", emit="host_table")
        assert len(mc._BINARY_EMIT_TABLES) == 1
        mc.extract_mesh(vol, algorithm="cubes", emit="host_table")
        assert len(mc._BINARY_EMIT_TABLES) == 1


class TestDeviceTableEmitter:
    """mc.table_emitter (one-hot MXU matmul against the generated table)
    must be bit-identical to the per-cell gather emitters — the one-hot
    matmul is exact because the table's cell-relative coords are dyadic
    (bf16-exact, guarded at build)."""

    def _cells(self, vol, level=0.5):
        flat = np.asarray(mc.active_cells_mask(vol, level=level)).reshape(-1)
        idx = np.flatnonzero(flat)
        cap = max(8, 1 << int(np.ceil(np.log2(max(len(idx), 2)))))
        padded = np.zeros(cap, np.int64)
        padded[: len(idx)] = idx
        return padded, len(idx), cap

    def test_bit_identical_to_per_cell_emitters(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(31)
        for _ in range(4):
            vol = _random_vol(rng, n=8, p=0.45)
            cells, n, cap = self._cells(vol)
            vol_d = jnp.asarray(vol)
            cells_d = jnp.asarray(cells)
            for algorithm, ambiguity, ref in (
                ("tetrahedra", "separate",
                 lambda: mc._emit_triangles(vol_d, cells_d, capacity=cap)),
                ("cubes", "separate",
                 lambda: mc._emit_triangles_mc(
                     vol_d, cells_d, capacity=cap, ambiguity="separate")),
                ("cubes", "join",
                 lambda: mc._emit_triangles_mc(
                     vol_d, cells_d, capacity=cap, ambiguity="join")),
            ):
                fast = mc.table_emitter(algorithm, ambiguity, 0.5)
                vf, valf = fast(vol_d, cells_d, capacity=cap)
                vr, valr = ref()
                tpc = 12 if algorithm == "tetrahedra" else \
                    mc._MC_MAXTS[ambiguity]
                live = np.zeros(cap * tpc, bool)
                live[: n * tpc] = True  # pad cells (id 0) may disagree
                np.testing.assert_array_equal(
                    np.asarray(valf)[live], np.asarray(valr)[live],
                    err_msg=f"{algorithm}/{ambiguity} valid")
                both = live & np.asarray(valr)
                np.testing.assert_array_equal(
                    np.asarray(vf)[both], np.asarray(vr)[both],
                    err_msg=f"{algorithm}/{ambiguity} verts")

    def test_extract_mesh_device_table_matches_device(self):
        rng = np.random.default_rng(32)
        vol = _random_vol(rng, n=9, p=0.4)
        (tf, nf) = mc.extract_mesh(vol, algorithm="cubes",
                                   emit="device_table")
        (td, nd) = mc.extract_mesh(vol, algorithm="cubes", emit="device")
        assert nf == nd
        np.testing.assert_array_equal(tf, td)

    def test_sharded_auto_vs_device_emit(self):
        import jax
        from jax.sharding import Mesh

        from vbr_tpu.parallel import mesh_sharded

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        rng = np.random.default_rng(33)
        vol = np.zeros((16, 12, 12), bool)
        vol[2:14, 2:10, 3:9] = rng.random((12, 8, 6)) < 0.5
        mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("grid",))
        ta, na = mesh_sharded.extract_mesh_sharded(
            vol, mesh, capacity=512, emit="auto")
        td, nd = mesh_sharded.extract_mesh_sharded(
            vol, mesh, capacity=512, emit="device")
        assert na == nd
        np.testing.assert_array_equal(ta, td)

    def test_non_dyadic_level_rejected(self):
        with pytest.raises(ValueError):
            mc.table_emitter("cubes", "separate", 0.3)

    def test_sharded_auto_float_field_uses_interpolation(self):
        # a non-binary scalar field must NOT be midpoint-snapped by the
        # binary table emitter: auto resolves to the per-cell path
        import jax
        from jax.sharding import Mesh

        from vbr_tpu.parallel import mesh_sharded

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        rng = np.random.default_rng(34)
        field = np.zeros((8, 8, 8), np.float32)
        field[2:6, 2:6, 2:6] = rng.uniform(0.6, 0.9, (4, 4, 4))
        mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("grid",))
        ts, ns = mesh_sharded.extract_mesh_sharded(
            field, mesh, capacity=256, emit="auto")
        td, nd = mc.extract_mesh(field, emit="device")
        assert ns == nd
        np.testing.assert_array_equal(ts, td)
