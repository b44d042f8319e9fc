"""Native C mass-properties library vs the numpy fallback."""
import os

import numpy as np
import pytest

from mujoco_playground_tpu import native


def _make_box_stl(path, half=(0.1, 0.2, 0.3)):
    """Write a binary STL of an axis-aligned box (12 triangles)."""
    import struct
    hx, hy, hz = half
    v = np.array([[sx * hx, sy * hy, sz * hz]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    # 12 triangles with outward winding
    faces = [
        (0, 2, 1), (1, 2, 3),   # x = -hx? (indices chosen for closed mesh)
        (4, 5, 6), (5, 7, 6),
        (0, 1, 4), (1, 5, 4),
        (2, 6, 3), (3, 6, 7),
        (0, 4, 2), (2, 4, 6),
        (1, 3, 5), (3, 7, 5),
    ]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for (a, b, c) in faces:
            f.write(struct.pack("<3f", 0, 0, 0))
            for idx in (a, b, c):
                f.write(struct.pack("<3f", *v[idx]))
            f.write(struct.pack("<H", 0))


def test_box_mass_properties(tmp_path):
    path = str(tmp_path / "box.stl")
    _make_box_stl(path)
    vol, com, inertia, aabb, n = native._stl_mass_properties_numpy(path)
    assert n == 12
    # |volume| = 8*hx*hy*hz = 0.048 (winding sign may flip)
    np.testing.assert_allclose(abs(vol), 0.048, rtol=1e-6)  # f32 vertices
    np.testing.assert_allclose(com, 0.0, atol=1e-7)
    # box inertia (unit density * |vol|): I_x = m/3 (hy^2+hz^2)
    m = 0.048
    expect = np.diag([m / 3 * (0.2**2 + 0.3**2),
                      m / 3 * (0.1**2 + 0.3**2),
                      m / 3 * (0.1**2 + 0.2**2)])
    np.testing.assert_allclose(np.abs(inertia), expect, atol=1e-7)
    np.testing.assert_allclose(aabb, [[-0.1, -0.2, -0.3], [0.1, 0.2, 0.3]])


def test_native_matches_numpy(tmp_path):
    if native._load() is None:
        pytest.skip("no C toolchain")
    path = str(tmp_path / "box.stl")
    _make_box_stl(path)
    out_c = native.stl_mass_properties(path)
    out_np = native._stl_mass_properties_numpy(path)
    np.testing.assert_allclose(out_c[0], out_np[0], rtol=1e-12)
    np.testing.assert_allclose(out_c[1], out_np[1], atol=1e-12)
    np.testing.assert_allclose(out_c[2], out_np[2], rtol=1e-10, atol=1e-14)
    assert out_c[4] == out_np[4]
