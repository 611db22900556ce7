"""Device-ready constant index arrays for a code graph.

Everything here is a trace-time constant: XLA folds these gathers into
efficient static data movement.  This replaces the reference's pointer-based
``code_t``/``decoder_t`` state (``/root/reference/include/struct.h:29-108``).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..models.code import NBCode


@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """Static index arrays (NumPy; passed into jit as constants)."""

    code: NBCode
    regular: bool            # all rows have degree dc_max
    edge_col: np.ndarray     # [E]
    col_edges: np.ndarray    # [N, dv_max], pad = E
    row_edges: np.ndarray    # [M, dc_max], pad = E
    edge_valid_row: np.ndarray  # [M, dc_max] bool
    edge_slot: np.ndarray    # [E] position of edge within its row
    rot: np.ndarray          # [E, q]  rot[e, c]   = h_e * c
    inv_rot: np.ndarray      # [E, q]  inv_rot[e, u] = h_e^{-1} * u
    layers: tuple            # tuple of row-id arrays (column-disjoint groups)

    @classmethod
    @functools.lru_cache(maxsize=None)
    def from_code(cls, code: NBCode) -> "DeviceGraph":
        e = code.n_edges
        row_edges = code.row_edges
        valid = row_edges < e
        slot = np.zeros(e, dtype=np.int32)
        offs = np.concatenate([[0], np.cumsum(code.row_deg)])
        for r in range(code.m_rows):
            d = int(code.row_deg[r])
            slot[offs[r]: offs[r] + d] = np.arange(d)
        return cls(
            code=code,
            regular=bool(np.all(code.row_deg == code.dc_max)),
            edge_col=code.edge_col.astype(np.int32),
            col_edges=code.col_edges.astype(np.int32),
            row_edges=row_edges.astype(np.int32),
            edge_valid_row=valid,
            edge_slot=slot,
            rot=code.rot_perm,
            inv_rot=code.inv_rot_perm,
            layers=code.layers,
        )

    @property
    def q(self) -> int:
        return self.code.q

    @property
    def n_edges(self) -> int:
        return self.code.n_edges
