"""Built-in Morgan (ECFP-style) circular fingerprints.

The reference generates RDKit Morgan radius-2 1024-bit fingerprints
(``gpusim_utils.py:55-66``). This is a self-contained implementation of the
same algorithm family (Rogers & Hahn, ECFP): per-atom initial invariants,
iterative neighborhood hashing out to a radius, environment deduplication,
and hash-folding into a fixed-width bit vector.

Bits are NOT RDKit-compatible (RDKit's exact hash mix is library-specific);
they are deterministic and stable within this framework, which is what the
engine requires — the backend is fingerprint-agnostic (packed bits in, scores
out), exactly like the reference (``README.md:3``). When RDKit is installed,
``fingerprints.py`` uses it instead for drop-in parity.
"""

from __future__ import annotations

import struct

import numpy as np

from .smiles import Molecule, parse_smiles

_MASK32 = 0xFFFFFFFF


def _mix(*values: int) -> int:
    """Deterministic 32-bit hash of an int tuple (FNV-1a over packed i64s)."""
    h = 0x811C9DC5
    for v in values:
        for b in struct.pack("<q", v):
            h ^= b
            h = (h * 0x01000193) & _MASK32
    return h


def atom_invariant(mol: Molecule, idx: int) -> int:
    """ECFP-style initial invariant: heavy degree, valence-minus-H, atomic
    number, charge, H count, ring membership, isotope."""
    a = mol.atoms[idx]
    heavy_degree = mol.degree(idx)
    bond_sum = int(sum(mol.bonds[bi].order_value for bi in mol.neighbors(idx)))
    return _mix(
        heavy_degree,
        bond_sum,
        a.atomic_number,
        a.charge,
        a.total_hs,
        1 if a.in_ring else 0,
        a.isotope,
    )


def morgan_bits(mol: Molecule, radius: int = 2, nbits: int = 1024) -> np.ndarray:
    """0/1 vector of the folded Morgan fingerprint (``uint8[nbits]``)."""
    n = len(mol.atoms)
    bits = np.zeros(nbits, dtype=np.uint8)
    if n == 0:
        return bits

    inv = [atom_invariant(mol, i) for i in range(n)]
    # environment dedup: (radius, frozenset of bond ids) -> first invariant
    seen_envs: dict[frozenset, int] = {}
    env_bonds: list[frozenset] = [frozenset() for _ in range(n)]

    for i in range(n):
        bits[inv[i] % nbits] = 1

    for r in range(1, radius + 1):
        new_inv = list(inv)
        new_envs = list(env_bonds)
        round_updates: list[tuple[int, int, frozenset]] = []
        for i in range(n):
            pairs = sorted(
                (
                    int(mol.bonds[bi].order_value * 2),
                    inv[mol.bonds[bi].other(i)],
                    bi,
                )
                for bi in mol.neighbors(i)
            )
            h = _mix(r, inv[i], *(x for o, v, _ in pairs for x in (o, v)))
            env = env_bonds[i].union(
                {bi for _, _, bi in pairs},
                *(env_bonds[mol.bonds[bi].other(i)] for bi in mol.neighbors(i)),
            )
            new_inv[i] = h
            new_envs[i] = env
            round_updates.append((i, h, env))
        inv, env_bonds = new_inv, new_envs
        # set bits, skipping duplicate environments (same bond set already
        # hashed this round or earlier — ECFP's structural dedup)
        for i, h, env in round_updates:
            if env and env in seen_envs:
                continue
            if env:
                seen_envs[env] = h
            bits[h % nbits] = 1
    return bits


def pack_bits(bits: np.ndarray) -> bytes:
    """Pack a 0/1 vector into bytes, bit i -> byte i//8 bit i%8 (the layout
    RDKit's BitVectToBinaryText emits and ``.fsim`` files store)."""
    return np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()


def smiles_to_morgan_packed(
    smiles: str, radius: int = 2, nbits: int = 1024
) -> bytes:
    mol = parse_smiles(smiles)
    return pack_bits(morgan_bits(mol, radius, nbits))
