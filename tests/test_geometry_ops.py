"""Geometry kernel tests vs brute-force NumPy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.ops import chamfer, geometry, point_mesh, procrustes

RNG = np.random.RandomState(3)


def test_squared_distance_matrix():
    x = RNG.randn(2, 5, 3).astype(np.float32)
    y = RNG.randn(2, 7, 3).astype(np.float32)
    d2 = np.asarray(chamfer.squared_distance_matrix(jnp.asarray(x), jnp.asarray(y)))
    ref = np.sum((x[:, :, None] - y[:, None, :]) ** 2, axis=-1)
    np.testing.assert_allclose(d2, ref, atol=1e-5)


def test_masked_chamfer_weighted_mean_semantics():
    """Matches pytorch3d's weighted path: sum(w*d2)/sum(w) over (F, M)."""
    F, M, V = 4, 6, 50
    x = RNG.randn(F, M, 3).astype(np.float32)
    y = RNG.randn(F, V, 3).astype(np.float32)
    w = (RNG.rand(F, M) > 0.3).astype(np.float32)
    d2 = np.sum((x[:, :, None] - y[:, None, :]) ** 2, axis=-1).min(axis=-1)  # [F, M]
    expect = (d2 * w).sum() / w.sum()
    got = float(chamfer.masked_chamfer(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_chamfer_zero_for_identical_clouds():
    x = RNG.randn(3, 8, 3).astype(np.float32)
    # float32 |x|^2-2xy+|y|^2 expansion noise floor is ~1e-7 m^2 after centering
    got = float(chamfer.masked_chamfer(jnp.asarray(x), jnp.asarray(x)))
    assert got < 1e-6
    bi = float(chamfer.chamfer_bidirectional(jnp.asarray(x), jnp.asarray(x)))
    assert bi < 1e-6


def test_masked_chamfer_vertex_subset_equals_gather():
    F, M, V = 3, 5, 40
    x = RNG.randn(F, M, 3).astype(np.float32)
    y = RNG.randn(F, V, 3).astype(np.float32)
    keep = RNG.rand(V) > 0.5
    xm = np.ones((F, M), np.float32)
    got = float(
        chamfer.masked_chamfer_vertex_subset(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(xm), jnp.asarray(keep.astype(np.float32))
        )
    )
    # oracle: gather the kept vertices and run plain chamfer
    ref = float(chamfer.masked_chamfer(jnp.asarray(x), jnp.asarray(y[:, keep])))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_mean_nearest_vertex_over_frames():
    F, M, V = 6, 4, 30
    markers = RNG.randn(F, M, 3).astype(np.float32)
    vertices = RNG.randn(F, V, 3).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], np.float32)
    got = np.asarray(
        chamfer.mean_nearest_vertex_over_frames(jnp.asarray(markers), jnp.asarray(vertices), jnp.asarray(mask))
    )
    d = np.linalg.norm(markers[:, :, None] - vertices[:, None, :], axis=-1)  # [F, M, V]
    ref = np.argmin(d[mask == 1].mean(axis=0), axis=-1)
    np.testing.assert_array_equal(got, ref)


def test_point_triangle_closest_oracle():
    """Compare against dense sampling of the triangle."""
    t0 = np.array([[0.0, 0, 0]], np.float32)
    t1 = np.array([[1.0, 0, 0]], np.float32)
    t2 = np.array([[0.0, 1, 0]], np.float32)
    pts = np.array(
        [
            [0.25, 0.25, 1.0],   # above interior
            [2.0, -1.0, 0.0],    # beyond vertex 1
            [-1.0, -1.0, 0.5],   # beyond vertex 0
            [0.5, 0.5, -0.3],    # above hypotenuse edge
            [0.5, -2.0, 0.0],    # below edge t=0
        ],
        np.float32,
    )
    d2, bary = point_mesh.point_triangle_closest(
        jnp.asarray(pts), jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(t2)
    )
    d2 = np.asarray(d2)[:, 0]
    bary = np.asarray(bary)[:, 0]
    # dense-sample oracle
    s = np.linspace(0, 1, 301)
    gs, gt = np.meshgrid(s, s)
    keep = gs + gt <= 1.0
    gs, gt = gs[keep], gt[keep]
    tri_pts = t0[0] + gs[:, None] * (t1[0] - t0[0]) + gt[:, None] * (t2[0] - t0[0])
    for i, p in enumerate(pts):
        ref = np.min(np.sum((tri_pts - p) ** 2, axis=-1))
        assert abs(d2[i] - ref) < 1e-4, (i, d2[i], ref)
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)


def test_point_mesh_distance_on_unit_tetra():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    pts = np.array([[[0.2, 0.2, -0.5], [2.0, 0, 0]]], np.float32)  # [1, 2, 3]
    out = point_mesh.point_mesh_distance(jnp.asarray(pts), jnp.asarray(verts)[None], jnp.asarray(faces))
    d = np.asarray(out["distance"])[0]
    np.testing.assert_allclose(d[0], 0.5, atol=1e-5)  # below z=0 face
    np.testing.assert_allclose(d[1], 1.0, atol=1e-5)  # beyond vertex (1,0,0)
    cp = np.asarray(out["closest_point"])[0]
    np.testing.assert_allclose(cp[0], [0.2, 0.2, 0.0], atol=1e-5)
    np.testing.assert_allclose(cp[1], [1, 0, 0], atol=1e-5)


def test_marker_to_surface_distance_zero_on_surface():
    from uuo_mocap_tpu.body.synthetic import synthetic_body_model

    model = synthetic_body_model()
    verts = np.asarray(model.v_template)[None].astype(np.float32)  # [1, V, 3]
    some = verts[:, ::500]  # points exactly on vertices
    d = float(
        point_mesh.marker_to_surface_distance(
            jnp.asarray(some), jnp.asarray(verts), jnp.asarray(model.faces)
        )
    )
    assert d < 1e-4


def test_similarity_transform_recovers_alignment():
    B, N = 3, 10
    S1 = RNG.randn(B, N, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation as ScipyRot

    Rm = ScipyRot.random(B, random_state=1).as_matrix().astype(np.float32)
    scale = RNG.uniform(0.5, 2.0, (B, 1, 1)).astype(np.float32)
    t = RNG.randn(B, 1, 3).astype(np.float32)
    S2 = scale * np.einsum("bij,bnj->bni", Rm, S1) + t
    S1_hat = np.asarray(procrustes.similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    np.testing.assert_allclose(S1_hat, S2, atol=1e-4)


def test_similarity_transform_handles_reflection():
    B, N = 1, 8
    S1 = RNG.randn(B, N, 3).astype(np.float32)
    S2 = S1.copy()
    S2[..., 0] *= -1  # mirrored: best rotation must still have det=+1
    S1_hat = np.asarray(procrustes.similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    # residual nonzero (can't mirror), but transform must be a proper rotation:
    assert np.isfinite(S1_hat).all()


def test_aabb_and_volume():
    pts = RNG.randn(4, 20, 3).astype(np.float32)
    aabb = np.asarray(geometry.get_aabb(jnp.asarray(pts)))
    np.testing.assert_allclose(aabb[:, 0], pts.min(1), atol=1e-6)
    np.testing.assert_allclose(aabb[:, 1], pts.max(1), atol=1e-6)
    vol = np.asarray(geometry.get_aabb_volume(jnp.asarray(aabb)))
    ref = np.prod(pts.max(1) - pts.min(1), axis=-1)
    np.testing.assert_allclose(vol, ref, rtol=1e-5)


def test_marker_mask():
    m = RNG.randn(2, 4, 3).astype(np.float32)
    m[0, 1] = 0.0
    m[1, 3] = 0.0
    mask = np.asarray(geometry.get_marker_mask(jnp.asarray(m)))
    assert mask[0, 1] == 0 and mask[1, 3] == 0
    assert mask.sum() == 6


def test_geometric_median():
    pts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 10]]], np.float32)
    med = np.asarray(geometry.geometric_median(jnp.asarray(pts)))[0]
    assert np.linalg.norm(med) < 1.2  # robust to the outlier


def test_vertex_normals_sphere():
    from uuo_mocap_tpu.body.synthetic import _fibonacci_sphere
    from scipy.spatial import ConvexHull

    dirs = _fibonacci_sphere(500)
    hull = ConvexHull(dirs)
    faces = hull.simplices.astype(np.int32)
    tri = dirs[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    flip = np.sum(n * c, axis=-1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]
    vn = np.asarray(geometry.vertex_normals(jnp.asarray(dirs, jnp.float32), jnp.asarray(faces)))
    # on a sphere, normals ~ radial directions
    cos = np.sum(vn * dirs, axis=-1)
    assert (cos > 0.99).all()
