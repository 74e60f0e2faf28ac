"""Orbax checkpointing with the reference's three retention policies.

The reference composes three Lightning ModelCheckpoint callbacks
(/root/reference/lightning_callbacks/callbacks.py:456-485): top-k on
eval_loss + save_last, every-N-epochs, and wall-clock-interval.  Here one
`CheckpointKeeper` drives two orbax CheckpointManagers ('best' = top-k by
eval_loss, 'last' = most recent) and implements the epoch/time cadences; the
config is pickled beside the checkpoints for exact reload
(callbacks.py:36-39 parity; loadable by main.py --config <pickle>).
"""
from __future__ import annotations

import os
import pickle
import time
from pathlib import Path

import jax
import orbax.checkpoint as ocp


class CheckpointKeeper:
    def __init__(self, workdir: str, config=None, top_k: int = 3,
                 every_n_epochs: int | None = None,
                 every_timedelta_s: float | None = None):
        self.workdir = os.path.abspath(workdir)
        Path(self.workdir).mkdir(parents=True, exist_ok=True)
        self.best_mgr = ocp.CheckpointManager(
            os.path.join(self.workdir, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=top_k,
                best_fn=lambda m: m["eval_loss"],
                best_mode="min",
            ),
        )
        self.last_mgr = ocp.CheckpointManager(
            os.path.join(self.workdir, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        self.every_n_epochs = every_n_epochs
        self.every_timedelta_s = every_timedelta_s
        self._last_time_save = time.time()
        if config is not None:
            with open(os.path.join(self.workdir, "config.pkl"), "wb") as f:
                pickle.dump(config, f)

    def save_eval(self, step: int, state, eval_loss: float):
        """Called after each validation: feeds the top-k 'best' policy."""
        self.best_mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"eval_loss": float(eval_loss)},
        )
        self.last_mgr.save(step, args=ocp.args.StandardSave(state))

    def maybe_save_periodic(self, step: int, state, epoch: int):
        """Epoch-count and wall-clock cadences (callbacks.py:468-485)."""
        saved = False
        if self.every_n_epochs and epoch > 0 and epoch % self.every_n_epochs == 0:
            self.last_mgr.save(step, args=ocp.args.StandardSave(state))
            saved = True
        if (
            self.every_timedelta_s
            and time.time() - self._last_time_save > self.every_timedelta_s
        ):
            self.last_mgr.save(step, args=ocp.args.StandardSave(state))
            self._last_time_save = time.time()
            saved = True
        return saved

    def wait(self):
        self.best_mgr.wait_until_finished()
        self.last_mgr.wait_until_finished()

    # --- restore -------------------------------------------------------------
    def latest_step(self):
        return self.last_mgr.latest_step()

    def best_step(self):
        return self.best_mgr.best_step()

    def restore(self, abstract_state, step: int | None = None,
                which: str = "last"):
        if which not in ("best", "last"):
            raise ValueError(f"which must be 'best' or 'last', got '{which}'")
        mgr = self.last_mgr if which == "last" else self.best_mgr
        if step is None:
            step = mgr.latest_step() if which == "last" else mgr.best_step()
        if step is None:
            raise FileNotFoundError(f"No '{which}' checkpoint in {self.workdir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def restore_state(workdir: str, abstract_state, which: str = "best"):
    """One-shot restore used by ID estimation / test modes
    (the reference's load_from_checkpoint, dim_reduction.py:127-128)."""
    keeper = CheckpointKeeper(workdir)
    return keeper.restore(abstract_state, which=which)
