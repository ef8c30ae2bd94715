"""Dof handling with static index arrays.

TPU-native analog of Ferrite's `DofHandler`/`add!`/`close!`/`ndofs`/
`dof_range`/`celldofs` (SURVEY.md §2.3). Dof numbering is *node-major
interleaved*: dof(field f, node n) = n * n_fields + f. On lexicographically
numbered structured meshes this keeps multi-field operators banded with
half-bandwidth n_fields * (node bandwidth) — which is what lets the 3-field
shallow-water precision (`/root/reference/src/spdes/shallow_water.jl`) stay
block-tridiagonal without any reordering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from diffeqgmrfs_tpu.fem.mesh import Mesh


@dataclass
class DofHandler:
    mesh: Mesh
    field_names: tuple[str, ...] = ("u",)

    def __post_init__(self):
        self.n_fields = len(self.field_names)
        self.n_nodes = self.mesh.n_nodes
        self.ndofs = self.n_fields * self.n_nodes
        npc = self.mesh.nodes_per_cell
        self.ndofs_per_cell = self.n_fields * npc
        # cell-local layout: [field0 nodes..., field1 nodes..., ...]
        # (Ferrite's dof_range(dh, :field) analog: contiguous per field)
        per_field = [
            self.mesh.cells * self.n_fields + fi for fi in range(self.n_fields)
        ]
        self.cell_dofs = np.concatenate(per_field, axis=1).astype(np.int32)
        self._per_field_cell_dofs = [p.astype(np.int32) for p in per_field]

    def field_index(self, name: str) -> int:
        return self.field_names.index(name)

    def dof_range(self, name: str):
        """Local column range of a field within a cell-dof block."""
        fi = self.field_index(name)
        npc = self.mesh.nodes_per_cell
        return slice(fi * npc, (fi + 1) * npc)

    def cell_dofs_field(self, name: str) -> np.ndarray:
        """Global dofs of one field per cell, [n_cells, nodes_per_cell]."""
        return self._per_field_cell_dofs[self.field_index(name)]

    def node_dofs(self, name: str, nodes: np.ndarray) -> np.ndarray:
        """Global dofs of one field at the given mesh nodes."""
        fi = self.field_index(name)
        return (np.asarray(nodes, dtype=np.int64) * self.n_fields + fi).astype(
            np.int32
        )
