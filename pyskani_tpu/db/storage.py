"""Sketch database storage backends.

Re-creates the reference's three storage layouts and their on-disk
lifecycle (/root/reference/src/pyskani/_skani/lib.rs:42-123, §4 of
SURVEY.md):

* **memory** — plain dict, nothing on disk (``Database(path=None)``)
* **separated** — one ``<name>.sketch`` file per genome written at
  ``sketch()`` time; ``markers.bin`` written on ``flush()``
  (skani < 0.3.0 style)
* **consolidated** — single append-only ``sketches.db`` written at
  ``sketch()`` time; ``index.db`` (offset/length index, sorted by offset)
  and ``markers.bin`` written on ``flush()`` (skani >= 0.3.0 style)

The byte format is this framework's own (npz records with a JSON
manifest), not bincode — the *logical* artifacts and their lifecycle match
the reference; the reference's Rust-specific serialization does not.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..params import SketchParams

FORMAT_VERSION = 1


# --------------------------------------------------------------------------
# (de)serialization of one sketch


def sketch_to_bytes(host_sketch, params: SketchParams) -> bytes:
    """Serialize a HostSketch (trimmed to true counts) with its params."""
    dev = host_sketch.device
    n = int(dev.n_seeds)
    m = int(dev.n_markers)
    nc = int(dev.n_contigs)
    meta = dict(
        version=FORMAT_VERSION,
        name=host_sketch.name,
        contig_names=host_sketch.contig_names,
        total_len=int(dev.total_len),
        params=dict(c=params.c, marker_c=params.marker_c, k=params.k,
                    marker_k=params.marker_k, use_aa=params.use_aa),
    )
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        kmers=np.asarray(dev.kmers[:n]),
        positions=np.asarray(dev.positions[:n]),
        contig_ids=np.asarray(dev.contig_ids[:n]),
        strands=np.asarray(dev.strands[:n]),
        markers_hi=np.asarray(dev.markers_hi[:m]),
        markers_lo=np.asarray(dev.markers_lo[:m]),
        contig_lengths=np.asarray(dev.contig_lengths[:nc]),
    )
    return buf.getvalue()


def sketch_from_bytes(data: bytes):
    """Deserialize into (HostSketch, SketchParams), re-padding to budgets."""
    import jax.numpy as jnp

    from ..ops.sketch import (DeviceSketch, HostSketch, U32_SENTINEL,
                              I32_SENTINEL, contig_budget_for,
                              marker_budget_for, seed_budget_for)

    with np.load(io.BytesIO(data)) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        kmers = z["kmers"]
        positions = z["positions"]
        contig_ids = z["contig_ids"]
        strands = z["strands"]
        markers_hi = z["markers_hi"]
        markers_lo = z["markers_lo"]
        contig_lengths = z["contig_lengths"]

    p = meta["params"]
    params = SketchParams(c=p["c"], marker_c=p["marker_c"], k=p["k"],
                          marker_k=p["marker_k"], use_aa=p["use_aa"])
    total = meta["total_len"]
    n, m = len(kmers), len(markers_hi)
    sb = max(seed_budget_for(total, params.c), ((n + 1023) // 1024) * 1024)
    mb = max(marker_budget_for(total, params.marker_c),
             ((m + 511) // 512) * 512)

    def pad(arr, size, fill):
        out = np.full(size, fill, dtype=arr.dtype)
        out[:len(arr)] = arr
        return out

    # own multiplicity (run lengths over the kmer-sorted table)
    left = np.searchsorted(kmers, kmers, side="left")
    right = np.searchsorted(kmers, kmers, side="right")
    own_mult = (right - left).astype(np.int32)
    order = np.lexsort((positions, contig_ids))

    C = contig_budget_for(len(contig_lengths))
    dev = DeviceSketch(
        kmers=jnp.asarray(pad(kmers, sb, 0xFFFFFFFF)),
        positions=jnp.asarray(pad(positions, sb, np.int32(0x7FFFFFFF))),
        contig_ids=jnp.asarray(pad(contig_ids, sb, np.int32(0x7FFFFFFF))),
        strands=jnp.asarray(pad(strands, sb, False)),
        own_mult=jnp.asarray(pad(own_mult, sb, np.int32(0))),
        p_positions=jnp.asarray(pad(positions[order], sb,
                                    np.int32(0x7FFFFFFF))),
        p_contig_ids=jnp.asarray(pad(contig_ids[order], sb,
                                     np.int32(0x7FFFFFFF))),
        p_own_mult=jnp.asarray(pad(own_mult[order], sb, np.int32(0))),
        markers_hi=jnp.asarray(pad(markers_hi, mb, 0xFFFFFFFF)),
        markers_lo=jnp.asarray(pad(markers_lo, mb, 0xFFFFFFFF)),
        n_seeds=jnp.int32(n), n_markers=jnp.int32(m),
        contig_lengths=jnp.asarray(pad(contig_lengths.astype(np.int32), C, 0)),
        n_contigs=jnp.int32(len(contig_lengths)),
        total_len=jnp.uint32(total),
    )
    return HostSketch(name=meta["name"], contig_names=meta["contig_names"],
                      device=dev,
                      lengths=[int(x) for x in contig_lengths]), params


# --------------------------------------------------------------------------
# markers.bin


def save_markers(path: Path, params: SketchParams, markers: List) -> None:
    """markers.bin = (params, marker sketch of every genome) — reference
    semantics of Database::_save_markers (lib.rs:187-201)."""
    manifest = dict(
        version=FORMAT_VERSION,
        params=dict(c=params.c, marker_c=params.marker_c, k=params.k,
                    marker_k=params.marker_k, use_aa=params.use_aa),
        genomes=[dict(name=m.name, total_len=m.total_len,
                      n_markers=len(m.hi), contig_names=m.contig_names,
                      contig_lengths=[int(x) for x in m.contig_lengths])
                 for m in markers],
    )
    arrays = {"manifest": np.frombuffer(json.dumps(manifest).encode(),
                                        dtype=np.uint8)}
    for i, m in enumerate(markers):
        arrays[f"hi{i}"] = m.hi
        arrays[f"lo{i}"] = m.lo
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


@dataclasses.dataclass
class MarkerSketch:
    """RAM-resident marker sketch of one genome (screening input)."""

    name: str
    total_len: int
    contig_names: List[str]
    contig_lengths: List[int]
    hi: np.ndarray  # uint32 sorted unique (paired with lo)
    lo: np.ndarray


def load_markers(path: Path):
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        p = manifest["params"]
        params = SketchParams(c=p["c"], marker_c=p["marker_c"], k=p["k"],
                              marker_k=p["marker_k"], use_aa=p["use_aa"])
        markers = []
        for i, g in enumerate(manifest["genomes"]):
            markers.append(MarkerSketch(
                name=g["name"], total_len=g["total_len"],
                contig_names=g["contig_names"],
                contig_lengths=g["contig_lengths"],
                hi=z[f"hi{i}"], lo=z[f"lo{i}"]))
    return params, markers


# --------------------------------------------------------------------------
# storage backends


class MemoryStorage:
    path: Optional[Path] = None

    def __init__(self):
        self._sketches: Dict[str, object] = {}

    def store(self, host_sketch, params: SketchParams) -> None:
        self._sketches[host_sketch.name] = host_sketch

    def load(self, name: str):
        try:
            return self._sketches[name]
        except KeyError:
            raise KeyError(name) from None

    def flush(self, params, markers) -> None:
        pass


class FolderStorage:
    """One ``<name>.sketch`` per genome (separated, skani < 0.3.0 style)."""

    def __init__(self, path: Path):
        self.path = Path(path)

    def store(self, host_sketch, params: SketchParams) -> None:
        data = sketch_to_bytes(host_sketch, params)
        with open(self.path / f"{host_sketch.name}.sketch", "wb") as f:
            f.write(data)

    def load(self, name: str):
        p = self.path / f"{name}.sketch"
        try:
            with open(p, "rb") as f:
                sk, _ = sketch_from_bytes(f.read())
            return sk
        except FileNotFoundError:
            raise OSError(2, f"Failed to open {p}") from None

    def flush(self, params, markers) -> None:
        save_markers(self.path / "markers.bin", params, markers)


class ConsolidatedStorage:
    """Single append-only ``sketches.db`` + offset index (skani >= 0.3.0)."""

    def __init__(self, path: Path, index: Optional[Dict[str, dict]] = None):
        self.path = Path(path)
        self.index: Dict[str, dict] = index or {}

    def store(self, host_sketch, params: SketchParams) -> None:
        name = host_sketch.name
        if name in self.index:
            raise ValueError(f"duplicate name in sketches: {name!r}")
        data = sketch_to_bytes(host_sketch, params)
        db = self.path / "sketches.db"
        with open(db, "ab") as f:
            offset = f.tell()
            f.write(data)
        self.index[name] = dict(file_name=name, offset=offset,
                                length=len(data))

    def load(self, name: str):
        try:
            entry = self.index[name]
        except KeyError:
            raise KeyError(name) from None
        with open(self.path / "sketches.db", "rb") as f:
            f.seek(entry["offset"])
            data = f.read(entry["length"])
        sk, _ = sketch_from_bytes(data)
        return sk

    def flush(self, params, markers) -> None:
        save_markers(self.path / "markers.bin", params, markers)
        entries = sorted(self.index.values(), key=lambda e: e["offset"])
        tmp = self.path / "index.db.tmp"
        with open(tmp, "w") as f:
            json.dump(dict(version=FORMAT_VERSION, entries=entries), f)
        os.replace(tmp, self.path / "index.db")


def load_index(path: Path) -> Dict[str, dict]:
    with open(path / "index.db") as f:
        data = json.load(f)
    return {e["file_name"]: e for e in data["entries"]}
