"""MJCF -> ModelSpec importer (subset).

Inverse of :mod:`mujoco_playground_tpu.spec.mjcf`: lets users bring existing
MJCF robots into the TPU engine without hand-writing a spec.  Supported
subset (the reference models' feature set): nested bodies, free/hinge/slide
joints, plane/sphere/cylinder/box geoms (meshes are skipped with a warning —
supply explicit <inertial>), sites, <replicate> expansion, explicit
inertials, position/velocity/motor/general actuators, jointpos/jointvel/
rangefinder sensors, joint-coupling equalities, compiler angle modes, and
option timestep/gravity.

Parsing is self-contained (ElementTree); when the optional `mujoco` package
is present, tests cross-check the imported spec against MuJoCo's compiler.
"""
from __future__ import annotations

import math
import warnings
from typing import List, Optional, Tuple
from xml.etree import ElementTree as ET

import numpy as np

from mujoco_playground_tpu.spec import types as st
from mujoco_playground_tpu.spec.types import quat_from_axis_angle, quat_mul_np


def _floats(s, default=None):
    if s is None:
        return default
    return tuple(float(x) for x in s.split())


def _quat_from_elem(elem, angle_scale: float):
    """Resolve orientation attrs (quat / euler / axisangle / zaxis)."""
    if elem.get("quat") is not None:
        q = _floats(elem.get("quat"))
        n = math.sqrt(sum(x * x for x in q))
        return tuple(x / n for x in q)
    if elem.get("euler") is not None:
        e = [x * angle_scale for x in _floats(elem.get("euler"))]
        # MuJoCo default eulerseq "xyz", intrinsic (rotating axes):
        # q = qx * qy * qz
        q = (1.0, 0.0, 0.0, 0.0)
        for axis, ang in zip(((1, 0, 0), (0, 1, 0), (0, 0, 1)), e):
            q = quat_mul_np(q, quat_from_axis_angle(axis, ang))
        return q
    if elem.get("axisangle") is not None:
        a = _floats(elem.get("axisangle"))
        return quat_from_axis_angle(a[:3], a[3] * angle_scale)
    if elem.get("zaxis") is not None:
        z = np.asarray(_floats(elem.get("zaxis")), dtype=np.float64)
        z = z / np.linalg.norm(z)
        # minimal rotation taking (0,0,1) to z (MuJoCo zaxis semantics)
        zhat = np.array([0.0, 0.0, 1.0])
        c = float(np.dot(zhat, z))
        if c > 1 - 1e-12:
            return (1.0, 0.0, 0.0, 0.0)
        if c < -1 + 1e-12:
            return (0.0, 1.0, 0.0, 0.0)
        axis = np.cross(zhat, z)
        axis = axis / np.linalg.norm(axis)
        return quat_from_axis_angle(axis, math.acos(c))
    return (1.0, 0.0, 0.0, 0.0)


def from_mjcf(xml: str, name: Optional[str] = None) -> st.ModelSpec:
    """Parse an MJCF string into a ModelSpec (see module docstring)."""
    root = ET.fromstring(xml)
    compiler = root.find("compiler")
    angle_mode = (compiler.get("angle", "degree") if compiler is not None
                  else "degree")
    ang = math.pi / 180.0 if angle_mode == "degree" else 1.0

    option = st.OptionSpec()
    opt_elem = root.find("option")
    if opt_elem is not None:
        if opt_elem.get("timestep"):
            option.timestep = float(opt_elem.get("timestep"))
        if opt_elem.get("gravity"):
            option.gravity = _floats(opt_elem.get("gravity"))

    spec = st.ModelSpec(name=name or root.get("model", "imported"),
                        option=option)

    # defaults (flat subset: geom defaults only)
    default_geom = {}
    default_elem = root.find("default")
    if default_elem is not None:
        g = default_elem.find("geom")
        if g is not None:
            default_geom = dict(g.attrib)

    def parse_geom(g) -> Optional[st.GeomSpec]:
        attrs = {**default_geom, **g.attrib}
        gtype = attrs.get("type", "sphere")
        if gtype == "mesh":
            warnings.warn(
                "mesh geom skipped on import; provide an explicit <inertial> "
                "and primitive collision proxies (see spec/robot.py)")
            return None
        mass = attrs.get("mass")
        return st.GeomSpec(
            name=attrs.get("name", ""), type=gtype,
            size=_floats(attrs.get("size"), ()) or (),
            pos=_floats(attrs.get("pos"), (0.0, 0.0, 0.0)),
            quat=_quat_from_elem(g, ang),
            mass=float(mass) if mass is not None else None,
            friction=_floats(attrs.get("friction"), (1.0, 0.005, 0.0001)),
            contype=int(attrs.get("contype", 1)),
            conaffinity=int(attrs.get("conaffinity", 1)),
            condim=int(attrs.get("condim", 3)),
            solref=_floats(attrs.get("solref"), (0.02, 1.0)),
            solimp=_floats(attrs.get("solimp"),
                           (0.9, 0.95, 0.001, 0.5, 2.0)),
            rgba=_floats(attrs.get("rgba"), (0.5, 0.5, 0.5, 1.0)),
            group=int(attrs.get("group", 0)))

    def parse_joint(j) -> st.JointSpec:
        jtype = j.get("type", "hinge")
        rng = _floats(j.get("range"))
        if rng is not None and jtype in ("hinge", "ball"):
            rng = tuple(x * ang for x in rng)
        return st.JointSpec(
            name=j.get("name", ""), type=jtype,
            pos=_floats(j.get("pos"), (0.0, 0.0, 0.0)),
            axis=_floats(j.get("axis"), (0.0, 0.0, 1.0)),
            range=rng,
            damping=float(j.get("damping", 0.0)),
            armature=float(j.get("armature", 0.0)),
            frictionloss=float(j.get("frictionloss", 0.0)),
            stiffness=float(j.get("stiffness", 0.0)))

    def expand_replicate(parent_elems, elem):
        """Expand <replicate count= sep= euler=/offset=> children."""
        count = int(elem.get("count", 1))
        sep = elem.get("sep", "")
        euler = [x * ang for x in _floats(elem.get("offset_euler") or
                                          elem.get("euler"),
                                          (0.0, 0.0, 0.0))]
        offset = _floats(elem.get("offset"), (0.0, 0.0, 0.0))
        width = len(str(count - 1))
        out = []
        for i in range(count):
            # cumulative rotation i times about z etc.
            q = (1.0, 0.0, 0.0, 0.0)
            for _ in range(i):
                for axis, a_ in zip(((1, 0, 0), (0, 1, 0), (0, 0, 1)), euler):
                    if a_:
                        q = quat_mul_np(q, quat_from_axis_angle(axis, a_))
            for child in elem:
                c = ET.fromstring(ET.tostring(child))
                base = c.get("name", "")
                c.set("name", f"{base}{sep}{i:0{width}d}")
                p = np.asarray(_floats(c.get("pos"), (0.0, 0.0, 0.0)))
                p = p + i * np.asarray(offset)
                # rotate pos/orientation by q
                w, x, y, z = q
                R = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)]])
                p = R @ p
                c.set("pos", " ".join(repr(float(v)) for v in p))
                cq = quat_mul_np(q, _quat_from_elem(c, ang))
                for k in ("euler", "axisangle", "zaxis"):
                    if k in c.attrib:
                        del c.attrib[k]
                c.set("quat", " ".join(repr(float(v)) for v in cq))
                out.append(c)
        return out

    def walk_body(elem, parent_name: str):
        bname = elem.get("name", f"body_{len(spec.bodies)}")
        body = st.BodySpec(
            name=bname, parent=parent_name,
            pos=_floats(elem.get("pos"), (0.0, 0.0, 0.0)),
            quat=_quat_from_elem(elem, ang))
        inertial = elem.find("inertial")
        if inertial is not None:
            diag = _floats(inertial.get("diaginertia"), (0.0, 0.0, 0.0))
            body.inertial = st.InertialSpec(
                mass=float(inertial.get("mass", 0.0)),
                pos=_floats(inertial.get("pos"), (0.0, 0.0, 0.0)),
                quat=_quat_from_elem(inertial, ang),
                diaginertia=diag)
        for child in list(elem):
            tag = child.tag
            if tag in ("joint",):
                body.joints.append(parse_joint(child))
            elif tag == "freejoint":
                body.joints.append(st.JointSpec(
                    name=child.get("name", f"{bname}_free"), type="free"))
            elif tag == "geom":
                g = parse_geom(child)
                if g is not None:
                    body.geoms.append(g)
            elif tag == "site":
                body.sites.append(st.SiteSpec(
                    name=child.get("name", ""),
                    pos=_floats(child.get("pos"), (0.0, 0.0, 0.0)),
                    quat=_quat_from_elem(child, ang),
                    size=(_floats(child.get("size"), (0.003,)) or (0.003,))[0]))
            elif tag == "replicate":
                for c in expand_replicate(elem, child):
                    if c.tag == "site":
                        body.sites.append(st.SiteSpec(
                            name=c.get("name", ""),
                            pos=_floats(c.get("pos"), (0.0, 0.0, 0.0)),
                            quat=_quat_from_elem(c, 1.0),
                            size=(_floats(c.get("size"), (0.003,))
                                  or (0.003,))[0]))
        spec.bodies.append(body)
        for child in elem.findall("body"):
            walk_body(child, bname)

    worldbody = root.find("worldbody")
    if worldbody is None:
        raise ValueError("MJCF has no <worldbody>")
    for g in worldbody.findall("geom"):
        gs = parse_geom(g)
        if gs is not None:
            spec.world_geoms.append(gs)
    for b in worldbody.findall("body"):
        walk_body(b, "world")

    act_root = root.find("actuator")
    if act_root is not None:
        for a in act_root:
            name = a.get("name", "")
            joint = a.get("joint", "")
            ctrlrange = _floats(a.get("ctrlrange"))
            forcerange = _floats(a.get("forcerange"))
            if a.tag == "position":
                spec.actuators.append(st.ActuatorSpec.position(
                    name, joint, kp=float(a.get("kp", 1.0)),
                    kv=float(a.get("kv", 0.0)), ctrlrange=ctrlrange,
                    forcerange=forcerange))
            elif a.tag == "velocity":
                spec.actuators.append(st.ActuatorSpec.velocity(
                    name, joint, kv=float(a.get("kv", 1.0)),
                    ctrlrange=ctrlrange, forcerange=forcerange))
            elif a.tag == "motor":
                spec.actuators.append(st.ActuatorSpec.motor(
                    name, joint, gear=float((_floats(a.get("gear"))
                                             or (1.0,))[0]),
                    ctrlrange=ctrlrange, forcerange=forcerange))
            elif a.tag == "general":
                gain = (_floats(a.get("gainprm")) or (1.0,))[0]
                bias = _floats(a.get("biasprm"), (0.0, 0.0, 0.0))[:3]
                spec.actuators.append(st.ActuatorSpec(
                    name, joint, gain=gain, bias=tuple(bias),
                    ctrlrange=ctrlrange, forcerange=forcerange))

    sens_root = root.find("sensor")
    if sens_root is not None:
        for s_ in sens_root:
            if s_.tag in ("jointpos", "jointvel"):
                spec.sensors.append(st.SensorSpec(
                    s_.get("name", ""), s_.tag, s_.get("joint", "")))
            elif s_.tag == "rangefinder":
                site = s_.get("site", "")
                cutoff = float(s_.get("cutoff", 0.0))
                # a rangefinder on a replicated site expands to one sensor
                # per generated site (MuJoCo behavior for <replicate>)
                matches = [st_.name for b in spec.bodies for st_ in b.sites
                           if st_.name == site
                           or st_.name.startswith(site + "-")]
                base = s_.get("name", site)
                if len(matches) <= 1:
                    spec.sensors.append(st.SensorSpec(
                        base, "rangefinder", matches[0] if matches else site,
                        cutoff=cutoff))
                else:
                    width = len(str(len(matches) - 1))
                    for i, m in enumerate(sorted(matches)):
                        spec.sensors.append(st.SensorSpec(
                            f"{base}-{i:0{width}d}", "rangefinder", m,
                            cutoff=cutoff))

    eq_root = root.find("equality")
    if eq_root is not None:
        for e in eq_root.findall("joint"):
            spec.equalities.append(st.EqualitySpec(
                name=e.get("name", ""), joint1=e.get("joint1", ""),
                joint2=e.get("joint2", ""),
                polycoef=_floats(e.get("polycoef"),
                                 (0.0, 1.0, 0.0, 0.0, 0.0)),
                solref=_floats(e.get("solref"), (0.02, 1.0)),
                solimp=_floats(e.get("solimp"),
                               (0.9, 0.95, 0.001, 0.5, 2.0))))
    return spec


def from_mjcf_file(path: str, name: Optional[str] = None) -> st.ModelSpec:
    with open(path) as f:
        return from_mjcf(f.read(), name=name)
