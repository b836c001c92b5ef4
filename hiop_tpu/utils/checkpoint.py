"""Solver-state checkpointing.

Parity with the reference's axom/sidre checkpointing
(SidreHelper.hpp:73; hiopAlgFilterIPMQuasiNewton::save_state_to_sidre_group,
hiopAlgFilterIPM.cpp:1553-1760): saves the full iterate (all 12 blocks),
the L-BFGS memory, the barrier parameter, iteration counters, and the
filter, with schema validation on restore (sizes must match — the
reference asserts the MPI rank count; we record the problem sizes and the
mesh shape). Storage is a single ``.npz`` (the axom::sidre::IOManager
becomes numpy IO; sharded arrays are gathered — orbax-style sharded async
IO is a straightforward swap later).

Trigger: every ``checkpoint_save_every_N_iter`` iterations when
``checkpoint_save=yes`` (checkpointing_stuff(), cpp:1152), or explicitly
via the solver's save_state_to_file/load_state_from_file
(hiopAlgFilterIPM.hpp:399-421).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

FORMAT_VERSION = 1


def save_state(path: str, state: Dict[str, Any], fmt: str = "npz") -> None:
    """Write a checkpoint. ``fmt='npz'`` is a single portable file;
    ``fmt='orbax'`` writes an orbax PyTree checkpoint directory — the
    TPU-native analogue of the reference's axom::sidre::IOManager scalable
    parallel IO (SidreHelper.hpp:73): sharded/async-capable, one tensorstore
    entry per array."""
    if fmt == "orbax":
        _save_orbax(path, state)
        return
    arrays = {}
    meta_keys = {}
    for k, v in state.items():
        if v is None:
            continue
        if isinstance(v, (int, float, bool)):
            arrays[f"scalar__{k}"] = np.asarray(v)
        elif isinstance(v, (list, tuple)) and k == "filter_entries":
            arrays["filter_entries"] = np.asarray(v, dtype=np.float64).reshape(-1, 2)
        else:
            arrays[f"array__{k}"] = np.asarray(v)
    arrays["format_version"] = np.asarray(FORMAT_VERSION)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _save_orbax(path: str, state: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    tree: Dict[str, Any] = {"format_version": FORMAT_VERSION}
    for k, v in state.items():
        if v is None:
            continue
        if k == "filter_entries":
            v = np.asarray(v, dtype=np.float64).reshape(-1, 2)
        a = np.asarray(v)
        if a.ndim > 0 and a.size == 0:
            # orbax/tensorstore cannot store zero-size arrays; record the
            # shape+dtype so load reconstructs the empty array
            tree[f"__empty__{k}__{a.dtype.str}"] = np.asarray(a.shape, dtype=np.int64)
        else:
            tree[k] = v
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def _load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    if int(tree.get("format_version", -1)) != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {tree.get('format_version')} != {FORMAT_VERSION}"
        )
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if k == "format_version":
            continue
        if k.startswith("__empty__"):
            name, _, dtypestr = k[len("__empty__"):].rpartition("__")
            out[name] = np.zeros(tuple(int(s) for s in np.asarray(v)), dtype=np.dtype(dtypestr))
            continue
        if k == "filter_entries":
            out[k] = [tuple(row) for row in np.asarray(v)]
        elif isinstance(v, np.ndarray) and v.ndim == 0:
            out[k] = v.item()
        else:
            out[k] = v
    return out


def load_state(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):  # orbax checkpoints are directories
        return _load_orbax(path)
    with np.load(path, allow_pickle=False) as z:
        if int(z["format_version"]) != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {int(z['format_version'])} != {FORMAT_VERSION}"
            )
        out: Dict[str, Any] = {}
        for k in z.files:
            if k.startswith("scalar__"):
                out[k[len("scalar__"):]] = z[k].item()
            elif k.startswith("array__"):
                out[k[len("array__"):]] = z[k]
            elif k == "filter_entries":
                out["filter_entries"] = [tuple(row) for row in z[k]]
    return out


def validate(state: Dict[str, Any], n: int, m_eq: int, m_ineq: int) -> None:
    """Schema check mirroring the reference's size/rank assertions
    (hiopAlgFilterIPM.cpp:1688)."""
    if int(state.get("n", -1)) != n or int(state.get("m_eq", -1)) != m_eq or int(
        state.get("m_ineq", -1)
    ) != m_ineq:
        raise ValueError(
            f"checkpoint sizes (n={state.get('n')}, m_eq={state.get('m_eq')}, "
            f"m_ineq={state.get('m_ineq')}) do not match the problem "
            f"(n={n}, m_eq={m_eq}, m_ineq={m_ineq})"
        )
