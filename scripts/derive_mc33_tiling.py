"""Derive the skimage/Lewiner-exact MC33 triangle tiling table.

Runs scikit-image's ``marching_cubes`` (the implementation the reference
calls at voxel_reconstruction.py:142) on 256 isolated single-cell binary
volumes at a non-degenerate level, recovers each triangle's edge ids
from the vertex positions (exact-match or fail), validates the result
(cut-edge coverage + MC33-on-binary topology = the ``join`` rule), and
writes ``vbr_tpu/data/mc33_tiling.npz``.  After that,
``extract_mesh(..., algorithm="cubes", ambiguity="mc33")`` (and every
other surface consumer) emits skimage's exact per-cell triangle sets on
binary volumes.

scikit-image is NOT installable in the build environment (zero egress),
so this script is for skimage-equipped machines; the recovery machinery
itself is CI-gated against a mock oracle (tests/test_mc_tiling.py), and
vertex-set/topology parity with skimage is proved analytically in
docs/PARITY.md.

Usage:  python scripts/derive_mc33_tiling.py [out.npz]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    try:
        from skimage import measure
    except ImportError:
        print(
            "scikit-image is not available in this environment; run this "
            "script where it is installed, then ship the npz (see module "
            "docstring).", file=sys.stderr,
        )
        return 2

    from vbr_tpu.ops import marching_cubes as mc

    def oracle(vol, level):
        verts, faces, _normals, _values = measure.marching_cubes(vol, level)
        return verts, faces

    table = mc.derive_tiling_from_oracle(oracle, level=0.25)
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vbr_tpu", "data", "mc33_tiling.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # register_tiling validates before anything is written
    mc.register_tiling("mc33", table)
    np.savez_compressed(out, table=table)
    print(f"wrote {out} (T={table.shape[1]} triangle slots/config)")

    # spot check: identical triangle sets vs skimage on a random volume
    rng = np.random.default_rng(0)
    vol = (rng.uniform(size=(9, 8, 10)) < 0.4)
    ours, _ = mc.extract_mesh(vol, algorithm="cubes", ambiguity="mc33",
                              level=0.5)
    sk_v, sk_f, _, _ = measure.marching_cubes(
        vol.astype(np.float32), 0.5)
    sk = sk_v[sk_f]

    def tri_set(tris):
        return {
            tuple(sorted(map(tuple, np.round(t, 5)))) for t in tris
        }

    assert tri_set(ours) == tri_set(sk), "triangle sets differ!"
    print("triangle-set parity vs skimage verified on a random volume")
    return 0


if __name__ == "__main__":
    sys.exit(main())
