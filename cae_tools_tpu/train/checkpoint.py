"""TPU-native checkpointing (orbax) alongside the reference folder format.

The reference's model-folder format (torch state_dicts + JSON sidecars) is
the *interop* surface and stays the default.  For large mesh-sharded
training runs, this module adds orbax-backed checkpoints: sharded arrays are
saved/restored without gathering to a single host buffer, and an optimizer
state can be included for exact resume (the reference's
``--continue-training`` restarts the optimizer from scratch,
``cli/train_cae.py:111-125`` — orbax resume continues the Adam moments).

Layout: ``<model_folder>/orbax/<step>/`` managed by
``orbax.checkpoint.CheckpointManager``.
"""

from __future__ import annotations

import os
from typing import Optional


def _manager(folder, max_to_keep=3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(folder, "orbax")),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(folder, step: int, params, state, opt_state=None,
                    extra=None):
    """Save a (possibly sharded) train snapshot under ``folder/orbax``.

    ``extra``: additional top-level pytrees (e.g. the GAN critic's params
    and optimizer state) merged into the payload."""
    import orbax.checkpoint as ocp

    mgr = _manager(folder)
    existing = mgr.latest_step()
    if existing is not None and step <= existing:
        # orbax silently refuses to re-save an existing step — a collision
        # means the caller's step numbering lost track of an older lineage
        # (should be prevented by the fresh-run purge + cumulative
        # ckpt_base in resume_trainer); make it loud instead of silent
        print(
            f"[checkpoint] WARNING: snapshot step {step} <= existing "
            f"latest {existing}; orbax will skip the save — stale lineage "
            f"under {folder}/orbax?"
        )
    payload = {"params": params, "state": state}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload.update(extra)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    return step


def latest_step(folder) -> Optional[int]:
    import orbax.checkpoint as ocp  # noqa: F401

    mgr = _manager(folder)
    step = mgr.latest_step()
    mgr.close()
    return step


def resume_trainer(trainer, template):
    """Shared orbax-resume step for every trainer (Trainer/GANTrainer/
    StreamingTrainer previously each inlined a divergent copy of this).

    Honors the one-shot ``trainer.resume`` flag (consumed whether or not
    a snapshot is used, so later ``fit`` calls never rewind) and the
    stale-snapshot guard: a snapshot older than ``trainer.resume_min_step``
    (the model folder's cumulative epoch count, set by
    ``BaseModel._configure_checkpointing``) is ignored — the folder
    weights are newer, e.g. a previous ``--continue-training`` run that
    trained without ``--checkpoint-interval`` and so saved no snapshot.

    Returns ``(restored_payload_or_None, ckpt_base)``.  Callers re-place
    the restored arrays on their mesh (replication/TP differs per
    trainer).

    ``ckpt_base`` is the cumulative epoch count new snapshots are numbered
    from.  When a snapshot is restored it is that snapshot's step; when
    none is (fresh run, no snapshot, or stale snapshot) it is
    ``resume_min_step`` — the folder's cumulative epoch count — so e.g. a
    ``--continue-training`` run that adds orbax checkpointing to a folder
    with 10 prior epochs numbers its snapshots 10+k, and a later run's
    stale guard accepts them.
    """
    min_step = int(getattr(trainer, "resume_min_step", 0) or 0)
    if not trainer.checkpoint_folder:
        return None, 0
    if not trainer.resume:
        return None, min_step
    trainer.resume = False  # one-shot either way
    try:
        step = latest_step(trainer.checkpoint_folder)
    except Exception:
        step = None
    if step is None:
        return None, min_step
    if step < min_step:
        print(
            f"[checkpoint] ignoring orbax snapshot at epoch {step}: the "
            f"model folder already contains {min_step} epochs of training"
        )
        return None, min_step
    restored = restore_checkpoint(
        trainer.checkpoint_folder, step, template=template
    )
    return restored, int(step)


def restore_checkpoint(folder, step: Optional[int] = None, template=None):
    """Restore a snapshot; ``template`` (matching pytree of arrays) guides
    sharding/dtype restoration when provided."""
    import orbax.checkpoint as ocp

    mgr = _manager(folder)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no orbax checkpoint under {folder}")
    if template is not None:
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
    else:
        restored = mgr.restore(step)
    mgr.close()
    return restored
