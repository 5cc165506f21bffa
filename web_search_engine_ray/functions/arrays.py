"""Zero-copy Arrow list-column -> numpy matrix helpers.

Embedding columns arrive either as ``list<float>`` (parquet default) or
``FixedSizeList`` (engine-internal transport). Both decode to an (n, d)
numpy matrix without the ``to_pylist()`` Python-object detour: the list's
flat values buffer is viewed directly and reshaped. Ragged rows raise —
an embedding table with mixed dimensions is corrupt, not a layout choice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_matrix(
    col: pa.ChunkedArray | pa.Array, dtype=np.float64
) -> np.ndarray:
    """List-of-float column -> (n, d) numpy matrix, zero-copy where the
    physical layout allows (contiguous values buffer, no nulls, dtype
    already matching)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # pyarrow<13 keeps the wrapper
            col = (
                col.chunk(0)
                if col.num_chunks
                else pa.array([], type=col.type)
            )
    t = col.type
    n = len(col)
    if pa.types.is_fixed_size_list(t):
        d = t.list_size
        if n == 0:
            return np.empty((0, d), dtype=dtype)
        flat = np.asarray(col.flatten())
        return flat.reshape(n, d).astype(dtype, copy=False)
    offs = col.offsets.to_numpy()
    widths = np.diff(offs)
    if widths.size and (widths != widths[0]).any():
        raise ValueError(
            "ragged list column: row widths vary "
            f"({widths.min()}..{widths.max()})"
        )
    d = int(widths[0]) if widths.size else 0
    if n == 0:
        return np.empty((0, d), dtype=dtype)
    vals = np.asarray(col.values)
    return (
        vals[offs[0] : offs[0] + n * d]
        .reshape(n, d)
        .astype(dtype, copy=False)
    )
