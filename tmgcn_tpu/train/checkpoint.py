"""Checkpoint / resume for training state.

The reference never persists model state (SURVEY.md §5: no state_dict /
torch.save anywhere — a crashed run is lost). This module adds the
subsystem the framework needs for long runs: Orbax-backed checkpoints of
(params, opt_state, epoch, metric rows) keyed by run tag, with
latest-checkpoint resume.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class RunCheckpointer:
    """Save/restore a single run's training state under a directory."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self, epoch: int, params, opt_state, results: np.ndarray, buffers=None
    ) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            "results": results,
            # Frozen model buffers (e.g. WD-GCN's untrained U) so
            # inference can restore a complete model without replaying
            # the training run's RNG schedule.
            "buffers": buffers if buffers is not None else {},
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template) -> tuple[int, dict] | None:
        """Restore the latest checkpoint; template matches save structure."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return step, restored

    def restore_inference(
        self, params_template, buffers_template
    ) -> tuple[int, dict, dict] | None:
        """Restore (params, buffers) for inference — no opt state, and
        the saved results array's shape is unknown to the caller.

        Template-free restore (the manager reproduces the saved
        structure), then subtrees are cast onto the templates'
        dtypes/structures. Checkpoints written before buffers were
        saved fall back to the caller's (re-derived) buffers_template.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(step)

        def cast(template, tree):
            return jax.tree.map(
                lambda t, r: jnp.asarray(r, dtype=t.dtype), template, tree
            )

        params = cast(params_template, restored["params"])
        saved_buffers = restored.get("buffers") or {}
        buffers = (
            cast(buffers_template, saved_buffers)
            if jax.tree.structure(saved_buffers)
            == jax.tree.structure(buffers_template)
            else buffers_template
        )
        return step, params, buffers

    def close(self) -> None:
        self._mgr.close()
