"""Checkpoint / resume on the TrainState pytree (Orbax async under the hood).

Capability parity with the reference's checkpointing (SURVEY.md §5.4,
/root/reference/demo_mnist.py:145-171, callbacks.py:239-246, wgan.py:70-71,229-231):

- state captured: G/D params, generator BN stats, **both optimizer states**, the
  ``n_img``/``n_batches`` counters — plus, beyond the reference, the adaptive blur
  controller's host state (the reference's σ variable lives inside the model;
  here σ is derived state of the scheduler, so the scheduler state checkpoints);
- retention: 5 latest + an hourly keeper (demo_mnist.py:146-151);
- steps keyed by examples seen (``manager.save(samples_seen)`` semantics,
  callbacks.py:244-246);
- auto-restore of the latest checkpoint at startup with hparams/config sidecar
  JSONs next to the checkpoint dir (demo_mnist.py:153-169);
- save-on-SIGINT (demo_mnist.py:207-208) via :func:`save_on_interrupt`.

Orbax writes asynchronously — the device keeps training while the previous state
serialises — which is the TPU-native answer to the reference's blocking
``manager.save()``.
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import signal
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Orbax-backed manager for (TrainState, host-side aux dict) pairs."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 keep_time_interval_hours: Optional[float] = 1.0):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_time_interval=(
                datetime.timedelta(hours=keep_time_interval_hours)
                if keep_time_interval_hours else None),
            enable_async_checkpointing=True,
        )
        self.directory = directory
        # item_handlers up front: without them a freshly constructed manager
        # (the resume-from-disk path) returns None from item_metadata, so the
        # layout probes (_saved_n_img_is_scalar / _saved_has_ema_leaves)
        # would see no evidence and never migrate.
        self._mngr = ocp.CheckpointManager(
            directory, options=options,
            item_handlers={"state": ocp.StandardCheckpointHandler(),
                           "aux": ocp.JsonCheckpointHandler()})

    def save(self, samples_seen: int, state, aux: Optional[Dict] = None) -> None:
        """Queue an async save keyed by examples seen."""
        args = {"state": ocp.args.StandardSave(state)}
        if aux is not None:
            args["aux"] = ocp.args.JsonSave(aux)
        self._mngr.save(int(samples_seen), args=ocp.args.Composite(**args))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, state_template
                       ) -> Optional[Tuple[Any, Dict, int]]:
        """Restore the newest checkpoint → (state, aux, samples_seen); None if
        there is none. ``state_template`` provides the pytree structure/shardings
        (an abstract or concrete TrainState)."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        has_aux = "aux" in self._item_names(step)

        def _restore(template):
            args = {"state": ocp.args.StandardRestore(template)}
            if has_aux:
                args["aux"] = ocp.args.JsonRestore()
            return self._mngr.restore(step, args=ocp.args.Composite(**args))

        # Legacy checkpoints (pre-0.3) stored n_img as a scalar int32; the
        # template now expects the (2,)-int32 wide counter. Decide which
        # template fits by inspecting the SAVED n_img metadata up front —
        # retrying on arbitrary restore exceptions would re-attempt (and
        # mis-attribute) unrelated failures like corrupt files or other
        # shape mismatches (round-2 ADVICE).
        is_legacy = (self._saved_n_img_is_scalar(step)
                     and hasattr(state_template, "n_img"))
        # Pre-0.4 checkpoints have no ``g_ema``. Enabling EMA on resume of
        # such a run (template carries EMA leaves, checkpoint doesn't) is
        # migrated by restoring without the field and seeding the average
        # from the restored generator weights.
        saved_ema = self._saved_has_ema_leaves(step)  # None = unknown
        seed_ema = (self._template_has_ema_leaves(state_template)
                    and saved_ema is False)
        if seed_ema:
            state_template = state_template.replace(g_ema=())
        elif (saved_ema is True
              and not self._template_has_ema_leaves(state_template)):
            # The run trained WITH an EMA but the caller's template was built
            # without one (e.g. default hparams in an inference CLI): widen
            # the template with a g_params-shaped g_ema so the saved average
            # restores rather than erroring on the extra saved field.
            state_template = state_template.replace(
                g_ema=state_template.g_params)
        if is_legacy:
            template = self._legacy_counter_template(state_template)
            restored = _restore(template)
            from blurred_gan_tpu.train.state import wide_counter

            state = restored["state"].replace(
                n_img=wide_counter(int(restored["state"].n_img)))
            print("[checkpoint] migrated legacy scalar n_img counter to the "
                  "wide (2,)-int32 form")
        else:
            restored = _restore(state_template)
            state = restored["state"]
        if seed_ema:
            import jax.numpy as jnp

            # Copy, not alias: donated steps must not see one buffer twice.
            state = state.replace(g_ema=jax.tree_util.tree_map(
                jnp.copy, state.g_params))
            print("[checkpoint] checkpoint predates the generator EMA - "
                  "seeded g_ema from the restored generator weights")
        aux = dict(restored.get("aux") or {}) if has_aux else {}
        return state, aux, step

    def _saved_n_img_is_scalar(self, step: int) -> bool:
        """True iff the checkpoint at ``step`` saved ``n_img`` with scalar
        shape (the pre-0.3 layout). Metadata-only — nothing is restored. Any
        metadata-read failure means "not legacy": the normal restore then
        runs and surfaces its own (original) error."""
        try:
            meta = self._mngr.item_metadata(step)["state"]
            # Orbax returns a TreeMetadata wrapper whose .tree is the dict of
            # per-leaf ArrayMetadata (shape/dtype), keyed by field name.
            tree = getattr(meta, "tree", meta)
            n_img = (tree.get("n_img") if isinstance(tree, dict)
                     else getattr(tree, "n_img", None))
            return n_img is not None and tuple(n_img.shape) == ()
        except Exception:
            return False

    @staticmethod
    def _template_has_ema_leaves(state_template) -> bool:
        return bool(jax.tree_util.tree_leaves(
            getattr(state_template, "g_ema", ())))

    def _saved_has_ema_leaves(self, step: int):
        """Whether the checkpoint at ``step`` saved a non-empty ``g_ema`` —
        True/False on positive metadata evidence, None when the metadata
        cannot be read. Migration in either direction happens only on
        positive evidence (None leaves the caller's template untouched so
        the normal restore surfaces its own error, the round-2 ADVICE
        direction)."""
        try:
            meta = self._mngr.item_metadata(step)["state"]
            tree = getattr(meta, "tree", meta)
            if not isinstance(tree, dict):  # unreadable metadata -> unknown
                return None
            return bool(jax.tree_util.tree_leaves(tree.get("g_ema")))
        except Exception:
            return None

    @staticmethod
    def _legacy_counter_template(state_template):
        """state_template with a scalar-int32 ``n_img`` (pre-0.3 layout), or
        None if the template has no such field."""
        import jax.numpy as jnp

        if not hasattr(state_template, "n_img"):
            return None
        return state_template.replace(n_img=jnp.int32(0))

    def _item_names(self, step: int):
        d = os.path.join(self.directory, str(step))
        try:
            return [n for n in os.listdir(d) if not n.startswith(".")]
        except FileNotFoundError:
            return []

    def wait_until_finished(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()


# ---------------------------------------------------------------------------
# JSON sidecars (hparams/config next to the checkpoints, demo_mnist.py:153-169)
# ---------------------------------------------------------------------------


def save_sidecars(run_dir: str, hparams=None, config=None) -> None:
    if hparams is not None:
        hparams.save_json(os.path.join(run_dir, "hyper_parameters.json"))
    if config is not None:
        config.save_json(os.path.join(run_dir, "train_config.json"))


def load_sidecar(run_dir: str, cls, filename: str):
    path = os.path.join(run_dir, filename)
    if os.path.exists(path):
        return cls.from_json(path)
    return None


# ---------------------------------------------------------------------------
# Save on Ctrl-C / SIGTERM (demo_mnist.py:207-208, extended to preemption)
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def save_on_interrupt(save_fn, defer: bool = False):
    """Run a training block; on SIGINT/SIGTERM call ``save_fn()`` once, then
    raise KeyboardInterrupt so the caller unwinds. Covers both Ctrl-C and the
    SIGTERM that TPU spot/queued-resource preemption delivers.

    ``defer=True`` closes the buffer-donation race: a signal landing between a
    donating step dispatch and the train-state rebind would make an immediate
    save serialise deleted buffers. In deferred mode the handler only records
    the signal; the caller invokes the yielded ``check()`` at points where its
    state is live, and ``check()`` then saves once and raises
    KeyboardInterrupt. A second signal while one is pending escalates to an
    immediate KeyboardInterrupt (escape hatch for a stuck step); the save is
    still attempted but failures fall through to the re-raise (the advisory
    fallback: never lose the unwind because the emergency save crashed).
    """
    fired = {"done": False}
    pending = {"sig": False}

    def do_save():
        if fired["done"]:
            return
        fired["done"] = True
        try:
            save_fn()
        except BaseException as e:  # noqa: BLE001 — still unwind via KI below
            print(f"[checkpoint] interrupt save failed: {e!r}")

    def handler(signum, frame):
        if defer and not pending["sig"]:
            pending["sig"] = True
            # Acknowledge immediately: the loop may be blocked in a long
            # device fetch for a while before it reaches the next safe
            # point, and a silent handler reads as a lost signal.
            print("[trainer] signal received - will checkpoint at the next "
                  "safe point; send again to force immediate unwind",
                  flush=True)
            return
        do_save()
        raise KeyboardInterrupt

    def check():
        if pending["sig"]:
            do_save()
            raise KeyboardInterrupt

    old_int = signal.signal(signal.SIGINT, handler)
    old_term = signal.signal(signal.SIGTERM, handler)
    try:
        yield check
        # A deferred signal that landed after the caller's LAST check (e.g.
        # during the final save/flush) must still be acted on — otherwise it
        # would be recorded and silently swallowed when handlers restore.
        check()
    finally:
        signal.signal(signal.SIGINT, old_int)
        signal.signal(signal.SIGTERM, old_term)
