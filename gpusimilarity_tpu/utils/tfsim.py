"""Native sharded database format (``.tfsim`` directory).

The reference's only on-disk format is the zlib-compressed ``.fsim`` stream,
which must be fully decompressed and re-laid-out at every server start
(``gpusim.cpp:173-253``). For production restarts at billion-row scale the
TPU rebuild adds a native format designed for the load path:

``<name>.tfsim/``
    ``meta.json``        — version, dbkey, bitcount, count
    ``fingerprints.npy`` — packed ``uint8 (count, bitcount//8)`` rows
    ``smiles.blob`` / ``smiles.idx.npy`` — concatenated bytes + int64 (n,2)
    ``ids.blob``    / ``ids.idx.npy``

String-table layouts (``meta.json``'s optional ``strings`` map, per field):

* ``{"kind": "offsets"}`` (default) — blob + explicit int64 (n, 2) index;
* ``{"kind": "strided", "itemsize": K}`` — fixed-width records, blob only
  (row i = blob[i*K:(i+1)*K]; no 16 GB-at-1B-rows index file);
* ``{"kind": "constant", "value": "..."}`` — every row is the same string,
  no files at all (synthetic benchmark libraries).

Everything memory-maps: startup cost is O(metadata), fingerprints stream to
the device directly from the page cache, and the string tables are the same
zero-copy :class:`StringTable` the engine serves from. ``.fsim`` remains the
interchange format (:func:`convert` goes both ways).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from .fsim import FingerprintData
from .strings import ConstantStringTable, StridedStringTable, StringTable

FORMAT_VERSION = 1


def _save_strings(dirpath: Path, field: str, strings) -> dict:
    """Write one string field under its most compact layout; returns its
    ``meta.json`` descriptor."""
    if isinstance(strings, ConstantStringTable):
        return {
            "kind": "constant",
            "value": strings.value.decode("utf-8"),
        }
    if isinstance(strings, StridedStringTable):
        strings._blob.tofile(dirpath / f"{field}.blob")
        return {"kind": "strided", "itemsize": strings.itemsize}
    if isinstance(strings, StringTable):
        blob, offsets = strings._blob, strings._offsets
    else:
        table = StringTable.from_strings(strings)
        blob, offsets = table._blob, table._offsets
    blob.tofile(dirpath / f"{field}.blob")
    np.save(dirpath / f"{field}.idx.npy", offsets)
    return {"kind": "offsets"}


def _load_strings(dirpath: Path, field: str, desc: dict, count: int, mmap: bool):
    kind = desc.get("kind", "offsets")
    if kind == "constant":
        return ConstantStringTable(desc["value"].encode("utf-8"), count)
    blob_path = dirpath / f"{field}.blob"
    blob = np.memmap(blob_path, dtype=np.uint8, mode="r") if (
        mmap and blob_path.stat().st_size > 0
    ) else np.fromfile(blob_path, dtype=np.uint8)
    if kind == "strided":
        return StridedStringTable(blob, int(desc["itemsize"]))
    if kind != "offsets":
        raise ValueError(f"unknown string-table kind {kind!r} for {field}")
    offsets = np.load(
        dirpath / f"{field}.idx.npy", mmap_mode="r" if mmap else None
    )
    return StringTable(blob, offsets)


def save_native(path: str | os.PathLike, data: FingerprintData) -> None:
    """Write a ``.tfsim`` directory (atomically: build under a temp name)."""
    data.validate()
    path = Path(path)
    tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
    tmp.mkdir(parents=True, exist_ok=False)
    try:
        np.save(tmp / "fingerprints.npy", np.ascontiguousarray(data.fingerprints))
        strings_meta = {
            field: _save_strings(tmp, field, strings)
            for field, strings in (("smiles", data.smiles), ("ids", data.ids))
        }
        (tmp / "meta.json").write_text(
            json.dumps(
                {
                    "format_version": FORMAT_VERSION,
                    "dbkey": data.dbkey,
                    "bitcount": data.bitcount,
                    "count": data.count,
                    "generator": data.generator,
                    "strings": strings_meta,
                }
            )
        )
        if path.exists():
            raise FileExistsError(f"{path} already exists")
        tmp.rename(path)
    except Exception:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_native(path: str | os.PathLike, mmap: bool = True) -> FingerprintData:
    """Load a ``.tfsim`` directory; arrays are memory-mapped by default."""
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported .tfsim format version {meta.get('format_version')}"
        )
    mode = "r" if mmap else None
    fingerprints = np.load(path / "fingerprints.npy", mmap_mode=mode)
    strings_meta = meta.get("strings", {})
    tables = {
        field: _load_strings(
            path, field, strings_meta.get(field, {}), meta["count"], mmap
        )
        for field in ("smiles", "ids")
    }
    data = FingerprintData(
        dbkey=meta["dbkey"],
        bitcount=meta["bitcount"],
        fingerprints=fingerprints,
        smiles=tables["smiles"],
        ids=tables["ids"],
        generator=meta.get("generator", ""),
    )
    if data.count != meta["count"]:
        raise ValueError(
            f"count mismatch: meta says {meta['count']}, data has {data.count}"
        )
    data.validate()
    return data


def is_native(path: str | os.PathLike) -> bool:
    return Path(path).is_dir() and (Path(path) / "meta.json").exists()


def load_any(path: str | os.PathLike) -> FingerprintData:
    """Load either format by inspection: ``.tfsim`` dir or ``.fsim`` file."""
    if is_native(path):
        return load_native(path)
    from .fsim import read_fsim

    return read_fsim(path)


def convert(src: str | os.PathLike, dst: str | os.PathLike) -> None:
    """Convert between formats by destination extension (.fsim <-> .tfsim)."""
    data = load_any(src)
    if str(dst).endswith(".fsim"):
        from .fsim import write_fsim

        write_fsim(dst, data)
    else:
        save_native(dst, data)
