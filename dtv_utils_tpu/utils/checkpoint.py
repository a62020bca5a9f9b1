"""Stream-state checkpoint/resume.

Every TX chain's carry state (scrambler phase, interleaver tails, coder
memory, filter history) is a small dataclass pytree of arrays — KBs — so a
long modulation job checkpoints per block and resumes mid-stream exactly
(the serial-vs-resumed equality is tested).  The reference has no
equivalent (its tools are single-pass; SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

_MAGIC = "dtv_utils_tpu.state.v1"


def save_state(path: str, state, kind: str) -> None:
    """Serialize a chain-state dataclass pytree to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {
        "magic": _MAGIC,
        "kind": kind,
        "cls": type(state).__name__,
        "fields": [f.name for f in dataclasses.fields(state)],
        "n_leaves": len(leaves),
    }
    del treedef
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_state(path: str, template, kind: str):
    """Rebuild a chain state from an .npz, validated against a template
    (a fresh init_state(cfg)) so shapes/dtypes must match the config."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta.get("magic") != _MAGIC:
            raise ValueError(f"{path}: not a dtv_utils_tpu state file")
        if meta["kind"] != kind:
            raise ValueError(
                f"{path}: state kind {meta['kind']!r}, expected {kind!r}")
        if meta["cls"] != type(template).__name__:
            raise ValueError(
                f"{path}: state class {meta['cls']} != "
                f"{type(template).__name__}")
        leaves_t, treedef = jax.tree.flatten(template)
        if meta["n_leaves"] != len(leaves_t):
            raise ValueError(f"{path}: leaf count mismatch")
        leaves = []
        for i, t in enumerate(leaves_t):
            a = z[f"leaf{i}"]
            t_np = np.asarray(t)
            if a.shape != t_np.shape or a.dtype != t_np.dtype:
                raise ValueError(
                    f"{path}: leaf {i} is {a.dtype}{a.shape}, config "
                    f"expects {t_np.dtype}{t_np.shape}")
            leaves.append(a)
        return jax.tree.unflatten(treedef, leaves)
