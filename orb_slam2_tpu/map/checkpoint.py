"""Map checkpoint / resume.

The reference leaves SaveMap/LoadMap as a TODO (System.h:115-117); here the
map is a pytree of fixed-shape arrays (map/state.py), so checkpointing is one
compressed npz round-trip.  A saved map can be reloaded into a fresh session
for localization-only tracking on a prebuilt map (README.md:232-239 use
case).
"""

from __future__ import annotations

import numpy as np

from orb_slam2_tpu.map.state import MapState

_FORMAT_VERSION = 1


def save_map(state: MapState, path: str) -> None:
    """Serialize the full MapState to a compressed npz."""
    arrays = {f: np.asarray(v) for f, v in zip(state._fields, state)}
    np.savez_compressed(path, __version__=np.asarray(_FORMAT_VERSION),
                        **arrays)


def load_map(path: str) -> MapState:
    """Reload a MapState saved by save_map (as device arrays)."""
    import jax.numpy as jnp
    data = np.load(path)
    ver = int(data["__version__"]) if "__version__" in data else 0
    if ver > _FORMAT_VERSION:
        raise ValueError(f"map checkpoint version {ver} is newer than "
                         f"supported ({_FORMAT_VERSION})")
    missing = [f for f in MapState._fields if f not in data]
    if missing:
        raise ValueError(f"map checkpoint missing fields: {missing}")
    return MapState(*[jnp.asarray(data[f]) for f in MapState._fields])
