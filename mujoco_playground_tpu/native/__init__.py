"""Native (C) model-compile helpers, loaded via ctypes.

The C library is compiled on demand with the system compiler and cached next
to the source; a pure-numpy fallback keeps everything working without a
toolchain.  See stl_mass.c.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stl_mass.c")
_SO = os.path.join(_HERE, "libstl_mass.so")

_lib = None
_lib_failed = False


class _MassProps(ctypes.Structure):
    _fields_ = [
        ("volume", ctypes.c_double),
        ("com", ctypes.c_double * 3),
        ("inertia", ctypes.c_double * 9),
        ("aabb", ctypes.c_double * 6),
        ("n_triangles", ctypes.c_int32),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.stl_mass_properties_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_MassProps)]
        lib.stl_mass_properties_file.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def stl_mass_properties(path: str):
    """(volume, com(3,), inertia(3,3) about CoM unit-density, aabb(2,3),
    n_triangles) for a binary STL. Native C if available, numpy fallback."""
    lib = _load()
    if lib is not None:
        props = _MassProps()
        rc = lib.stl_mass_properties_file(path.encode(), ctypes.byref(props))
        if rc == 0:
            return (float(props.volume), np.array(props.com),
                    np.array(props.inertia).reshape(3, 3),
                    np.array(props.aabb).reshape(2, 3),
                    int(props.n_triangles))
    return _stl_mass_properties_numpy(path)


def _stl_mass_properties_numpy(path: str):
    """Pure-numpy fallback (same signed-tetrahedron algorithm)."""
    with open(path, "rb") as f:
        data = f.read()
    n = int(np.frombuffer(data[80:84], dtype=np.uint32)[0])
    rec = np.frombuffer(data[84:84 + n * 50], dtype=np.uint8).reshape(n, 50)
    tri = rec[:, 12:48].copy().view(np.float32).reshape(n, 3, 3).astype(
        np.float64)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    vol_t = np.einsum('ij,ij->i', a, np.cross(b, c)) / 6.0
    volume = vol_t.sum()
    com = (vol_t[:, None] * (a + b + c) / 4.0).sum(0) / volume

    def moment(i, j):
        s = (a[:, i] * a[:, j] + b[:, i] * b[:, j] + c[:, i] * c[:, j]
             + 0.5 * (a[:, i] * b[:, j] + a[:, j] * b[:, i]
                      + a[:, i] * c[:, j] + a[:, j] * c[:, i]
                      + b[:, i] * c[:, j] + b[:, j] * c[:, i]))
        return (vol_t / 10.0 * s).sum()

    xx = moment(0, 0) - volume * com[0] ** 2
    yy = moment(1, 1) - volume * com[1] ** 2
    zz = moment(2, 2) - volume * com[2] ** 2
    xy = moment(0, 1) - volume * com[0] * com[1]
    yz = moment(1, 2) - volume * com[1] * com[2]
    zx = moment(2, 0) - volume * com[2] * com[0]
    inertia = np.array([
        [yy + zz, -xy, -zx],
        [-xy, xx + zz, -yz],
        [-zx, -yz, xx + yy],
    ])
    aabb = np.stack([tri.reshape(-1, 3).min(0), tri.reshape(-1, 3).max(0)])
    return volume, com, inertia, aabb, n


def mesh_inertial(path: str, mass: float):
    """InertialSpec-style tuple for a mesh with the given total mass:
    (mass, com, principal quat [w,x,y,z], principal diag inertia)."""
    volume, com, inertia_unit, _aabb, _n = stl_mass_properties(path)
    density = mass / volume
    inertia = inertia_unit * density
    evals, evecs = np.linalg.eigh(inertia)
    idx = np.argsort(evals)[::-1]
    evals, evecs = evals[idx], evecs[:, idx]
    if np.linalg.det(evecs) < 0:
        evecs[:, 2] *= -1
    # rotation matrix -> quaternion [w,x,y,z]
    t = np.trace(evecs)
    if t > 0:
        r = np.sqrt(1 + t)
        q = np.array([0.5 * r,
                      (evecs[2, 1] - evecs[1, 2]) / (2 * r),
                      (evecs[0, 2] - evecs[2, 0]) / (2 * r),
                      (evecs[1, 0] - evecs[0, 1]) / (2 * r)])
    else:
        i = int(np.argmax(np.diag(evecs)))
        j, k = (i + 1) % 3, (i + 2) % 3
        r = np.sqrt(1 + evecs[i, i] - evecs[j, j] - evecs[k, k])
        q = np.zeros(4)
        q[i + 1] = 0.5 * r
        q[0] = (evecs[k, j] - evecs[j, k]) / (2 * r)
        q[j + 1] = (evecs[j, i] + evecs[i, j]) / (2 * r)
        q[k + 1] = (evecs[k, i] + evecs[i, k]) / (2 * r)
    q /= np.linalg.norm(q)
    return mass, com, q, evals


# NOTE: MuJoCo 3.x's default inertia mode ("legacy") computes mesh inertia
# from the *convex hull*; this module integrates the exact mesh volume, so
# values differ by a few percent on non-convex meshes.  The Ackermann robot's
# shipped inertials (spec/robot.py) are baked from MuJoCo's own compile for
# bit-exact parity; this module serves new meshes / tooling.
