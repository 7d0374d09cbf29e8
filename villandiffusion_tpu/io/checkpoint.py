"""Orbax checkpointing with the reference's resume semantics.

Replaces accelerate save_state/load_state + data.ckpt
(/root/reference/VillanDiffusion.py:454-462,1103-1115; SURVEY.md §5.4):

- ``save(step, epoch, state)`` writes params/opt_state/step plus a small
  metadata dict (epoch, global step, PRNG key) — async by default so the
  train loop never blocks on disk.
- per-epoch snapshots under ``epochs/ep{n}`` when requested
  (``--is_save_all_model_epochs`` surface).
- the trained UNet is additionally exported in a diffusers-like layout
  (``unet/config.json`` + params msgpack) for downstream sampling/measure.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 2, async_save: bool = True):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(self.ckpt_dir, options=options)

    def save(self, step: int, state: Any, extra: Optional[Dict] = None) -> None:
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"extra": ocp.args.JsonSave(extra)} if extra is not None else {}
            ),
        )
        self._mgr.save(step, args=args)

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.ckpt_dir}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                extra=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored.get("extra"), step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


# ---------------------------------------------------------------------------
# model export (diffusers-like layout for sampling/measure reload)
# ---------------------------------------------------------------------------


def _atomic_write(path: str, data: bytes) -> None:
    """Write-then-rename so a kill mid-write never leaves a truncated file
    at the published path (r4 postmortem: a watchdog killing a wedged
    device->host transfer left a 0-byte params.msgpack that poisoned every
    subsequent resume attempt)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_model_dir(out_dir: str, config, params) -> None:
    """Write <out_dir>/unet/{config.json, params.msgpack} (atomically)."""
    from flax import serialization

    unet_dir = os.path.join(out_dir, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    _atomic_write(
        os.path.join(unet_dir, "config.json"),
        json.dumps(dataclasses.asdict(config), indent=2).encode(),
    )
    params_host = jax.tree.map(np.asarray, params)
    _atomic_write(
        os.path.join(unet_dir, "params.msgpack"),
        serialization.to_bytes(params_host),
    )


def finalized_orbax_steps(ckpt_dir: str):
    """Step numbers with a COMPLETED orbax save under ckpt_dir (orbax writes
    into ``<step>.orbax-checkpoint-tmp...`` and renames on finalize, so a
    digit-named dir is the commit marker; tmp dirs are in-flight/killed
    saves and must not count as resumable)."""
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(
        int(d)
        for d in os.listdir(ckpt_dir)
        if d.isdigit() and os.path.isdir(os.path.join(ckpt_dir, d))
    )


def restore_params_raw(ckpt_dir: str):
    """Template-less restore of the params subtree from the newest finalized
    step, or None. Recovery path for a run dir whose unet export was
    truncated by a mid-save kill but whose orbax state is intact."""
    steps = finalized_orbax_steps(ckpt_dir)
    if not steps:
        return None
    state_dir = os.path.join(os.path.abspath(ckpt_dir), str(steps[-1]), "state")
    if not os.path.isdir(state_dir):
        return None
    restored = ocp.StandardCheckpointer().restore(state_dir)
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return None


def load_model_dir(out_dir: str):
    """Read a save_model_dir export -> (UNet2DConfig, params)."""
    from flax import serialization

    from villandiffusion_tpu.models.unet2d import UNet2DConfig

    unet_dir = os.path.join(out_dir, "unet")
    with open(os.path.join(unet_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    for key in ("block_out_channels", "down_block_types", "up_block_types"):
        cfg_dict[key] = tuple(cfg_dict[key])
    config = UNet2DConfig(**cfg_dict)
    with open(os.path.join(unet_dir, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(bytearray(f.read()))
    return config, params
