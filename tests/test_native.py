"""Parity tests: native C++ meshkit vs the numpy reference paths."""

import numpy as np
import pytest

from navierstokes_tpu import native
from navierstokes_tpu.fem.reference_elements import edges_of, facets_of
from navierstokes_tpu.mesh import channel_with_cylinder_2d, box_3d

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native meshkit unavailable")


def test_unique_edges_parity():
    mesh = channel_with_cylinder_2d(h=0.08)
    edges = np.array(edges_of(2), dtype=np.int64)
    cells = mesh.cells.astype(np.int64)
    ca, cb = cells[:, edges[:, 0]], cells[:, edges[:, 1]]
    lo = np.minimum(ca, cb).astype(np.int64)
    hi = np.maximum(ca, cb).astype(np.int64)
    keys = (lo * mesh.n_points + hi).ravel()
    uniq, inverse = np.unique(keys, return_inverse=True)

    cell_edges, edge_verts = native.unique_edges(mesh.cells, edges,
                                                 mesh.n_points)
    assert edge_verts.shape[0] == len(uniq)
    np.testing.assert_array_equal(cell_edges.reshape(-1), inverse)
    keys_nat = (edge_verts[:, 0].astype(np.int64) * mesh.n_points
                + edge_verts[:, 1])
    np.testing.assert_array_equal(keys_nat, uniq)


@pytest.mark.parametrize("mesh_fn", [lambda: channel_with_cylinder_2d(h=0.08),
                                     lambda: box_3d(n=3)])
def test_boundary_facets_parity(mesh_fn):
    import os
    mesh = mesh_fn()
    faces_n, cells_n, locals_n = native.boundary_facets(
        mesh.cells, np.array(facets_of(mesh.dim)))
    os.environ["NSTPU_NO_NATIVE"] = "1"
    try:
        # force the numpy path by calling the internals directly
        native._TRIED = False
        native._LIB = None
        faces_p, cells_p, locals_p = mesh.compute_boundary_faces()
    finally:
        del os.environ["NSTPU_NO_NATIVE"]
        native._TRIED = False
        native._LIB = None
    np.testing.assert_array_equal(faces_n, faces_p)
    np.testing.assert_array_equal(cells_n, cells_p)
    np.testing.assert_array_equal(locals_n, locals_p)


def test_scatter_plan_parity():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, 20000).astype(np.int32)
    order_n, sorted_n = native.scatter_plan(ids)
    order_p = np.argsort(ids, kind="stable").astype(np.int32)
    np.testing.assert_array_equal(order_n, order_p)
    np.testing.assert_array_equal(sorted_n, ids[order_p])
