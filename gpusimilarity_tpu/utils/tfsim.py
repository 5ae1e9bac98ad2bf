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
from .strings import StringTable

FORMAT_VERSION = 1


def save_native(path: str | os.PathLike, data: FingerprintData) -> None:
    """Write a ``.tfsim`` directory (atomically: build under a temp name)."""
    data.validate()
    path = Path(path)
    tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
    tmp.mkdir(parents=True, exist_ok=False)
    try:
        np.save(tmp / "fingerprints.npy", np.ascontiguousarray(data.fingerprints))
        for field, strings in (("smiles", data.smiles), ("ids", data.ids)):
            if isinstance(strings, StringTable):
                blob, offsets = strings._blob, strings._offsets
            else:
                table = StringTable.from_strings(strings)
                blob, offsets = table._blob, table._offsets
            blob.tofile(tmp / f"{field}.blob")
            np.save(tmp / f"{field}.idx.npy", offsets)
        (tmp / "meta.json").write_text(
            json.dumps(
                {
                    "format_version": FORMAT_VERSION,
                    "dbkey": data.dbkey,
                    "bitcount": data.bitcount,
                    "count": data.count,
                    "generator": data.generator,
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
    tables = {}
    for field in ("smiles", "ids"):
        blob = np.memmap(path / f"{field}.blob", dtype=np.uint8, mode="r") if (
            mmap and (path / f"{field}.blob").stat().st_size > 0
        ) else np.fromfile(path / f"{field}.blob", dtype=np.uint8)
        offsets = np.load(path / f"{field}.idx.npy", mmap_mode=mode)
        tables[field] = StringTable(blob, offsets)
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
