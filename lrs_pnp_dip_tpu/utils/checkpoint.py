"""Checkpoint / resume of the solver state (orbax).

The reference has no checkpointing — a crashed 250-iteration run restarts
from scratch (SURVEY §5).  Here every outer iteration's ``SolverState``
(X, duals, PRNG key, counter) can be saved and restored; combined with the
pure-function engine this gives exact resume.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


class SolverCheckpointer:
    """Save/restore SolverState keyed by outer-iteration number."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state_to_pytree(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(step)
        return pytree_to_state(restored)

    def close(self):
        self._mgr.close()


def state_to_pytree(state) -> dict:
    from ..solvers.admm import SolverState

    d = state._asdict()
    # PRNG keys with new-style dtypes serialise as raw uint32 data
    d["key"] = jax.random.key_data(d["key"]) if jax.dtypes.issubdtype(
        d["key"].dtype, jax.dtypes.prng_key
    ) else d["key"]
    return {k: np.asarray(v) for k, v in d.items()}


def pytree_to_state(tree: dict):
    import jax.numpy as jnp

    from ..solvers.admm import SolverState

    return SolverState(**{k: jnp.asarray(v) for k, v in tree.items()})
