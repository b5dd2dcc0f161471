"""Residue-type featurization tables.

Semantics of `src/utils/protein_featurizers.py:8-50`: 3-letter residue names
(including 17 rare/modified forms) map to one of 20 canonical types, everything
else to index 20 ("unknown").
"""

from __future__ import annotations

THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q",
    "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K",
    "MET": "M", "PHE": "F", "PRO": "P", "SER": "S", "THR": "T", "TRP": "W",
    "TYR": "Y", "VAL": "V",
    # rare / modified residues
    "HIP": "H", "HIE": "H", "TPO": "T", "HID": "H", "LEV": "L", "MEU": "M",
    "PTR": "Y", "GLV": "E", "CYT": "C", "SEP": "S", "HIZ": "H", "CYM": "C",
    "GLM": "E", "ASQ": "D", "TYS": "Y", "CYX": "C", "GLZ": "G",
}

ONE_TO_INDEX = {
    "Y": 0, "R": 1, "F": 2, "G": 3, "I": 4, "V": 5, "A": 6, "W": 7, "E": 8,
    "H": 9, "C": 10, "N": 11, "M": 12, "D": 13, "T": 14, "S": 15, "K": 16,
    "L": 17, "Q": 18, "P": 19,
}

UNKNOWN_INDEX = 20
NUM_RESIDUE_TYPES = 21


def residue_type_index(resname: str) -> int:
    """3-letter residue name -> integer id in [0, 21)."""
    one = THREE_TO_ONE.get(resname)
    if one is None:
        return UNKNOWN_INDEX
    return ONE_TO_INDEX[one]
