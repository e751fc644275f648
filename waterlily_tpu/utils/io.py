"""Checkpoint / restart and VTK export.

TPU-native port of the reference's I/O extensions:

* `save_state`/`load_state` — binary checkpoint of ``(p, u, dt_hist)`` (+
  MeanFlow ``P/U/UU/t``) as a ``.npz``, the analog of the JLD2 extension
  (`/root/reference/ext/WaterLilyJLD2Ext.jl`).  Body state is deliberately
  *not* saved — it is re-derived by `measure` on reconstruction, matching the
  reference's checkpoint philosophy (SURVEY §5.4).
* `VTKWriter` — ``.vti`` (XML ImageData) per step plus a ``.pvd`` collection
  for ParaView, the analog of `ext/WaterLilyWriteVTKExt.jl`; `load_vtk`
  restarts from the last ``.vti`` of a collection, restoring the time step so
  stepping continues (`ext/WaterLilyReadVTKExt.jl:22-43`).

File-extension dispatching `save`/`load` mirrors `src/WaterLily.jl:166-174`.
"""
from __future__ import annotations

import base64
import dataclasses
import os
import struct
import xml.etree.ElementTree as ET
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state", "save_orbax", "load_orbax",
           "VTKWriter", "load_vtk", "save", "load"]


def _is_dist(sim) -> bool:
    """Duck-typed check for a `parallel.dist.DistSimulation` (its live state
    is sharded/blocked and `sim.flow.state` is the stale pre-stepping copy)."""
    return hasattr(sim, "mesh") and hasattr(sim, "sizes")


def _dense_u(sim) -> np.ndarray:
    """Velocity in the dense single-device layout, whatever drives the sim."""
    return np.asarray(sim.u) if _is_dist(sim) else np.asarray(sim.flow.state.u)


def _dense_p(sim) -> np.ndarray:
    return np.asarray(sim.p) if _is_dist(sim) else np.asarray(sim.flow.state.p)


def _restore_fields(sim, u, p):
    """Push dense ``u``/``p`` into whichever engine the sim actually steps
    (3D, flat mirror, or sharded blocked state)."""
    dtype = sim.flow.cfg.dtype
    if _is_dist(sim):
        sim.restore_fields(np.asarray(u, dtype), np.asarray(p, dtype))
        return
    sim.flow.state = dataclasses.replace(
        sim.flow.state, p=jnp.asarray(p, dtype), u=jnp.asarray(u, dtype),
        u0=jnp.asarray(u, dtype))
    _resync_flat(sim)


def _check_shapes(sim, p, u):
    D = sim.flow.cfg.D
    pshape, ushape = tuple(sim.flow.cfg.shape), (D,) + tuple(sim.flow.cfg.shape)
    if tuple(p.shape) != pshape or tuple(u.shape) != ushape:
        raise ValueError(f"checkpoint shapes p{tuple(p.shape)}/u{tuple(u.shape)}"
                         f" != sim p{pshape}/u{ushape}")


# ------------------------------------------------------------- npz checkpoint
def save_state(fname: str, sim, meanflow=None):
    """Checkpoint ``(p, u, dt)`` and optional MeanFlow stats.  Accepts a
    `Simulation` or a `DistSimulation` (the live sharded state is gathered to
    the dense layout, so the checkpoint restores onto any mesh)."""
    data = {
        "p": _dense_p(sim),
        "u": _dense_u(sim),
        "dt": np.asarray(sim.flow.dt, np.float64),
    }
    if meanflow is not None:
        data["mf_P"] = np.asarray(meanflow.P)
        data["mf_U"] = np.asarray(meanflow.U)
        if meanflow.UU is not None:
            data["mf_UU"] = np.asarray(meanflow.UU)
        data["mf_t"] = np.asarray(meanflow.t, np.float64)
    np.savez(fname, **data)


def load_state(fname: str, sim, meanflow=None):
    """Restore ``(p, u, dt)`` into ``sim`` (size-checked like
    `WaterLilyJLD2Ext.jl:30-41`)."""
    with np.load(fname) as d:
        p, u = d["p"], d["u"]
        _check_shapes(sim, p, u)
        _restore_fields(sim, u, p)
        sim.flow.dt = [float(x) for x in d["dt"]]
        if meanflow is not None and "mf_P" in d:
            meanflow.P = jnp.asarray(d["mf_P"])
            meanflow.U = jnp.asarray(d["mf_U"])
            if "mf_UU" in d:
                meanflow.UU = jnp.asarray(d["mf_UU"])
            meanflow.t = [float(x) for x in d["mf_t"]]
    return sim


def _resync_flat(sim):
    """Push restored 3D fields into the flat-engine mirror — without this a
    TPU Simulation (flat engine auto-on for 3D) keeps stepping the
    pre-restore flat state and silently discards the checkpoint."""
    sync = getattr(sim, "_sync_flat", None)
    if sync is not None:
        sync()


# ------------------------------------------------------------- orbax
def save_orbax(path: str, sim, meanflow=None, async_: bool = False):
    """Checkpoint via orbax — the TPU-production backend: device arrays are
    serialized without a host gather round trip through numpy, sharded
    arrays (from `DistSimulation` states) keep their sharding metadata, and
    ``async_=True`` overlaps the write with further stepping.  Payload
    philosophy matches `save_state`: ``(p, u, dt)`` (+ MeanFlow), body
    re-measured on load (`WaterLilyJLD2Ext.jl` analog, SURVEY §5.4).
    Returns the checkpointer (call ``.wait_until_finished()`` on async)."""
    import orbax.checkpoint as ocp

    if _is_dist(sim):
        # the LIVE sharded state (lazily refreshed from the flat engine),
        # written per-shard in the blocked layout without a host gather;
        # `blocked_sizes` lets load restore onto any target
        st = sim.state
        payload = {"p": st.p, "u": st.u,
                   "dt": np.asarray(sim.flow.dt, np.float64),
                   "blocked_sizes": np.asarray(sim.sizes, np.int64)}
    else:
        payload = {"p": sim.flow.state.p, "u": sim.flow.state.u,
                   "dt": np.asarray(sim.flow.dt, np.float64)}
    if meanflow is not None:
        payload["mf_P"] = meanflow.P
        payload["mf_U"] = meanflow.U
        if meanflow.UU is not None:
            payload["mf_UU"] = meanflow.UU
        payload["mf_t"] = np.asarray(meanflow.t, np.float64)
    # always the async checkpointer: even the "sync" StandardCheckpointer
    # finalizes sharded-array directories in a background thread, so a load
    # right after save() can see no checkpoint — block explicitly instead
    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    ckptr.save(os.path.abspath(path), payload, force=True)
    if not async_:
        ckptr.wait_until_finished()
    return ckptr


def load_orbax(path: str, sim, meanflow=None):
    """Restore an orbax checkpoint written by `save_orbax` (size-checked)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    d = ckptr.restore(os.path.abspath(path))
    p, u = np.asarray(d["p"]), np.asarray(d["u"])
    if "blocked_sizes" in d and d["blocked_sizes"] is not None:
        # written from a DistSimulation: de-block to the dense layout first
        from ..parallel.dist import from_blocked

        sizes = tuple(int(v) for v in np.asarray(d["blocked_sizes"]))
        p = from_blocked(p, sizes, lead=0)
        u = from_blocked(u, sizes, lead=1)
    _check_shapes(sim, p, u)
    _restore_fields(sim, u, p)
    sim.flow.dt = [float(x) for x in d["dt"]]
    if meanflow is not None and "mf_P" in d:
        meanflow.P = jnp.asarray(d["mf_P"])
        meanflow.U = jnp.asarray(d["mf_U"])
        if d.get("mf_UU") is not None:
            meanflow.UU = jnp.asarray(d["mf_UU"])
        meanflow.t = [float(x) for x in d["mf_t"]]
    return sim


# ------------------------------------------------------------- VTK
def _write_vti(fname: str, fields: dict[str, np.ndarray], extent: tuple[int, ...]):
    D = len(extent)
    ext6 = list(extent) + [1] * (3 - D)
    ext_str = f"0 {ext6[0]-1} 0 {ext6[1]-1} 0 {ext6[2]-1}"
    root = ET.Element("VTKFile", {"type": "ImageData", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    img = ET.SubElement(root, "ImageData", {"WholeExtent": ext_str,
                                            "Origin": "0 0 0", "Spacing": "1 1 1"})
    piece = ET.SubElement(img, "Piece", {"Extent": ext_str})
    pd = ET.SubElement(piece, "PointData")
    for name, arr in fields.items():
        # VTK wants x-fastest ordering; our arrays are x-major → transpose
        if arr.ndim == D:          # scalar
            a = np.transpose(arr)
            el = ET.Element("DataArray", {"type": "Float32", "Name": name,
                                          "NumberOfComponents": "1", "format": "binary"})
        else:                       # vector: (D, *sp) → (*sp_rev, 3)
            comps = [np.transpose(arr[i]) for i in range(arr.shape[0])]
            while len(comps) < 3:
                comps.append(np.zeros_like(comps[0]))
            a = np.stack(comps, axis=-1)
            el = ET.Element("DataArray", {"type": "Float32", "Name": name,
                                          "NumberOfComponents": "3", "format": "binary"})
        payload = np.ascontiguousarray(a, np.float32).tobytes()
        el.text = base64.b64encode(struct.pack("<I", len(payload)) + payload).decode()
        pd.append(el)
    ET.ElementTree(root).write(fname, xml_declaration=True)


def _read_vti(fname: str) -> dict[str, np.ndarray]:
    root = ET.parse(fname).getroot()
    ext = root.find("ImageData").get("WholeExtent").split()
    nx, ny, nz = (int(ext[1]) + 1, int(ext[3]) + 1, int(ext[5]) + 1)
    out = {}
    for el in root.iter("DataArray"):
        blob = base64.b64decode(el.text.strip())
        (nbytes,) = struct.unpack("<I", blob[:4])
        a = np.frombuffer(blob[4:4 + nbytes], np.float32)
        ncomp = int(el.get("NumberOfComponents", "1"))
        shape = [n for n in (nz, ny, nx) if True]
        if nz == 1:
            shape = [ny, nx]
        if ncomp == 1:
            out[el.get("Name")] = np.transpose(a.reshape(shape))
        else:
            a = a.reshape(shape + [ncomp])
            comps = [np.transpose(a[..., i]) for i in range(ncomp)]
            out[el.get("Name")] = np.stack(comps)
    return out


def default_attrib() -> dict:
    """The default VTK output fields (`default_attrib`,
    `WriteVTKExt.jl:16-19`): velocity + pressure closures over the sim.
    Dist-aware: a `DistSimulation`'s live sharded state is gathered to the
    dense layout (its `sim.flow.state` would be the stale pre-step copy)."""
    return {"Velocity": _dense_u, "Pressure": _dense_p}


class VTKWriter:
    """Paraview collection writer (`vtkWriter`, `WriteVTKExt.jl:21-73`):
    one ``.vti`` per `write` call, indexed by a ``.pvd`` collection with the
    physical time stamps.  ``attrib`` maps field names to ``sim -> array``
    closures (default: velocity + pressure)."""

    def __init__(self, fname: str = "waterlily", attrib: Optional[dict] = None,
                 dirname: str = "vtk_data"):
        self.fname = fname
        self.dir = dirname
        os.makedirs(dirname, exist_ok=True)
        self.attrib = attrib or default_attrib()
        self.entries: list[tuple[float, str]] = []
        self.count = 0

    def write(self, sim):
        """Append one timestep: evaluate every attrib closure on the sim and
        write a ``.vti`` + refresh the ``.pvd`` collection (`vtkWriter`,
        `WriteVTKExt.jl:21-73`)."""
        fields = {k: f(sim) for k, f in self.attrib.items()}
        sp = tuple(sim.flow.cfg.shape)
        path = os.path.join(self.dir, f"{self.fname}_{self.count:06d}.vti")
        _write_vti(path, fields, sp)
        self.entries.append((sim.time, path))
        self.count += 1
        self._write_pvd()

    def _write_pvd(self):
        root = ET.Element("VTKFile", {"type": "Collection", "version": "1.0"})
        col = ET.SubElement(root, "Collection")
        for t, path in self.entries:
            ET.SubElement(col, "DataSet", {"timestep": repr(t), "part": "0",
                                           "file": path})
        ET.ElementTree(root).write(self.fname + ".pvd", xml_declaration=True)

    def close(self):
        """Finalize the ``.pvd`` collection file (`close`,
        `WriteVTKExt.jl:73`)."""
        self._write_pvd()


def load_vtk(sim, fname: str = "waterlily.pvd"):
    """Restart from the last ``.vti`` of a collection: restores p and u and
    rebuilds the Δt history from the file timestamps so stepping continues
    (`WaterLilyReadVTKExt.jl:22-43`).  Returns an append-mode `VTKWriter`."""
    root = ET.parse(fname).getroot()
    entries = [(float(d.get("timestep")), d.get("file"))
               for d in root.iter("DataSet")]
    t_last, path = entries[-1]
    fields = _read_vti(path)
    u = fields["Velocity"][: len(sim.flow.cfg.shape)]
    p = fields["Pressure"]
    _check_shapes(sim, p, u)
    _restore_fields(sim, u, p)
    sim.flow.dt = _dt_hist(entries)
    writer = VTKWriter(fname[:-4] if fname.endswith(".pvd") else fname)
    writer.entries = list(entries)
    writer.count = len(entries)
    return sim, writer


def _dt_hist(entries):
    """Rebuild a Δt history whose prefix sums to the restart time."""
    ts = [t for t, _ in entries]
    dts = [ts[0]] if ts[0] > 0 else []
    dts += [b - a for a, b in zip(ts[:-1], ts[1:]) if b > a]
    if not dts:
        dts = [0.25]
    # append a pending step equal to the last interval (the reference
    # re-appends CFL; the first mom_step recomputes it anyway)
    return dts + [dts[-1]]


# ------------------------------------------------------------- dispatch
def save(fname: str, sim, **kw):
    """Extension-dispatched save (`src/WaterLily.jl:166-174`): ``.npz``
    portable binary or ``.ckpt`` orbax directory."""
    if fname.endswith(".npz"):
        return save_state(fname, sim, **kw)
    if fname.endswith(".ckpt"):
        return save_orbax(fname, sim, **kw)
    raise ValueError(f"unsupported checkpoint format: {fname}")


def load(fname: str, sim, **kw):
    """Checkpoint restore dispatched on file extension — ``.npz`` state,
    ``.ckpt`` orbax directory, or ``.pvd`` VTK-collection restart (`load!`,
    `WaterLily.jl:166-174`)."""
    if fname.endswith(".ckpt"):
        return load_orbax(fname, sim, **kw)
    if fname.endswith(".npz"):
        return load_state(fname, sim, **kw)
    if fname.endswith(".pvd"):
        return load_vtk(sim, fname)
    raise ValueError(f"unsupported checkpoint format: {fname}")
