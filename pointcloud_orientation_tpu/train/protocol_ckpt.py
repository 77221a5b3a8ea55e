"""Checkpoint/resume for the vmapped protocols (ensemble / multiseed).

The sequential trainer has had preemption-safe periodic checkpointing since
round 2 (`trainer.save_checkpoint`, `reliability.PreemptionGuard`); the
vmapped per-label and multi-seed protocols used to warn-and-drop those
flags. This module gives the stacked protocols the same contract: the whole
stacked carry (every label's / seed's TrainState + best-val snapshots) plus
the host-side history saves as ONE artifact at block boundaries, and a
resumed run reproduces the uninterrupted one exactly — the per-epoch PRNG
streams are keyed by absolute epoch numbers inside `_run_block`, so
restarting at ``saved_epoch + 1`` replays identical math (pinned by
``tests/test_ensemble.py`` / ``tests/test_multiseed.py``).

Layout per save: ``<dir>/step_<E>/carry`` (Orbax PyTree of numpy leaves,
template-restored so optax NamedTuple states keep their structure) and
``<dir>/step_<E>/history.json`` (per-key metric curves + the epoch number —
plain JSON: float curves need no tensor store and stay greppable).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence, Tuple

import jax
import numpy as np


def _carry_to_np(carry):
    state, bv, bp, bs, be = carry
    return {
        "step": np.asarray(state.step),
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
        "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
        "best_val": np.asarray(bv),
        "best_params": jax.tree_util.tree_map(np.asarray, bp),
        "best_batch_stats": jax.tree_util.tree_map(np.asarray, bs),
        "best_epoch": np.asarray(be),
    }


def save_protocol_checkpoint(
    directory: str,
    epoch: int,
    carry,
    history: Dict,
    keys: Sequence,
) -> str:
    """Synchronous save of the stacked protocol state after ``epoch``.

    ``history`` is ``{key: {metric: [floats]}}`` with label-string or
    seed-int keys; ``keys`` fixes their order for the JSON round trip.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{int(epoch)}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "carry"), _carry_to_np(carry),
                   force=True)
    payload = {
        "epoch": int(epoch),
        "keys": [str(k) for k in keys],
        "history": {str(k): history[k] for k in keys},
    }
    tmp = os.path.join(path, "history.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(path, "history.json"))
    return path


def restore_protocol_checkpoint(
    path: str, carry_template, keys: Sequence
) -> Tuple[tuple, Dict, int]:
    """Restore ``(carry, history, epoch)`` from a protocol checkpoint.

    ``carry_template`` is the freshly built (epoch-0) stacked carry — same
    shapes/structure as the save; ``keys`` are the protocol's label/seed
    keys in construction order (validated against the artifact). The
    returned carry has numpy leaves; callers re-place it on their mesh.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "history.json")) as f:
        payload = json.load(f)
    if payload["keys"] != [str(k) for k in keys]:
        raise ValueError(
            f"checkpoint at {path} was written for keys {payload['keys']}, "
            f"but this protocol runs {[str(k) for k in keys]}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore(
            os.path.join(path, "carry"), item=_carry_to_np(carry_template))
    state_t = carry_template[0]
    state = state_t.replace(
        step=ckpt["step"],
        params=ckpt["params"],
        batch_stats=ckpt["batch_stats"],
        opt_state=ckpt["opt_state"],
    )
    carry = (state, ckpt["best_val"], ckpt["best_params"],
             ckpt["best_batch_stats"], ckpt["best_epoch"])
    history = {k: payload["history"][str(k)] for k in keys}
    return carry, history, int(payload["epoch"])


def resume_protocol(resume_from: str, carry_template, keys: Sequence,
                    place) -> Tuple[tuple, Dict, int]:
    """Shared resume entry for the vmapped protocols: restore the stacked
    carry + history, re-place the carry on the caller's mesh via ``place``
    (the protocol's shard function), and return the epoch to CONTINUE
    from (``saved + 1``)."""
    import jax.numpy as jnp

    carry_np, history, last_epoch = restore_protocol_checkpoint(
        resume_from, carry_template, keys)
    carry = place(jax.tree_util.tree_map(jnp.asarray, carry_np))
    return carry, history, last_epoch + 1


def checkpoint_and_maybe_stop(
    e_hi: int, epochs: int, carry, history: Dict, keys: Sequence,
    checkpoint_dir, checkpoint_every: int, preemption_guard,
) -> bool:
    """Block-boundary bookkeeping shared by ensemble/multiseed: periodic or
    preemption-triggered save, then the stop decision.

    Returns True only when the run must stop EARLY — a preemption that
    fires on the FINAL block is a completed run (every epoch trained), so
    the protocol continues to its test phase and artifact writes instead
    of discarding finished work; the save above still provides the
    preemption contract's durable state."""
    fired = preemption_guard is not None and preemption_guard.requested
    if checkpoint_dir and (fired or (
            checkpoint_every and e_hi % checkpoint_every == 0
            and e_hi < epochs)):
        save_protocol_checkpoint(checkpoint_dir, e_hi, carry, history, keys)
    if fired and e_hi < epochs:
        print(f"[preempt] graceful stop after epoch {e_hi}"
              + (f"; checkpoint in {checkpoint_dir}"
                 if checkpoint_dir else ""))
        return True
    return False


def next_block_end(epoch: int, block: int, epochs: int,
                   checkpoint_every: int) -> int:
    """Last epoch of the next device block: block-size capped, never past
    ``epochs``, and aligned so periodic saves land exactly on
    ``checkpoint_every`` multiples (a block never straddles a save point)."""
    e_hi = min(epoch + block - 1, epochs)
    if checkpoint_every:
        e_hi = min(
            e_hi, ((epoch - 1) // checkpoint_every + 1) * checkpoint_every)
    return e_hi
