"""Output writers for the deck driver (material-point set).

Parity: reference ``cmad/io/writers.py:63-496`` (MP subset; the FE Exodus
output plan arrives with the fem layer). Artifacts:

- ``cauchy.{npy,csv}``: (3, 3, N+1) stress trajectory
- ``xi.{npy,csv}``: (N+1, num_dofs) flat state trajectory (cmad_tpu's
  flat-state equivalent of the reference's per-block xi files; a
  per-block split is also written for reference parity)
- ``solver.json``, ``J.json``, ``grad/hess.{npy,csv}``
- ``deck.resolved.yaml``, ``opt_history.json``, ``opt_params.yaml``,
  ``opt_status.json``
"""
from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any

import numpy as np
import yaml

_CAUCHY_HEADER = "S11 S12 S13 S21 S22 S23 S31 S32 S33"


def _check_fmt(fmt: str) -> None:
    if fmt not in ("npy", "text"):
        raise ValueError(f"output.format: expected 'npy' or 'text', got {fmt!r}")


def write_cauchy(out_dir: Path, prefix: str, cauchy, fmt: str) -> None:
    _check_fmt(fmt)
    if fmt == "npy":
        np.save(out_dir / f"{prefix}cauchy.npy", cauchy)
    else:
        flat = np.asarray(cauchy).transpose(2, 0, 1).reshape(-1, 9)
        np.savetxt(out_dir / f"{prefix}cauchy.csv", flat,
                   header=_CAUCHY_HEADER, delimiter=",")


def write_xi(out_dir: Path, prefix: str, xi_trajectory, layout,
             fmt: str) -> None:
    """Write the flat state trajectory plus per-block splits.

    ``xi_trajectory``: (N+1, num_dofs) array; ``layout``: the model's
    StateLayout used for the per-block files.
    """
    _check_fmt(fmt)
    xi = np.asarray(xi_trajectory)
    if fmt == "npy":
        np.save(out_dir / f"{prefix}xi.npy", xi)
    else:
        np.savetxt(out_dir / f"{prefix}xi.csv", xi, delimiter=",")
    for k, name in enumerate(layout.var_names):
        block = xi[:, layout.slc(name)]
        if fmt == "npy":
            np.save(out_dir / f"{prefix}xi_block_{k:02d}.npy", block)
        else:
            np.savetxt(out_dir / f"{prefix}xi_block_{k:02d}.csv", block,
                       delimiter=",")


def write_solver_log(out_dir: Path, prefix: str,
                     solver_log: list[dict[str, Any]]) -> None:
    with (out_dir / f"{prefix}solver.json").open("w") as f:
        json.dump(solver_log, f, indent=2)


def write_J(out_dir: Path, prefix: str, J: float) -> None:
    with (out_dir / f"{prefix}J.json").open("w") as f:
        json.dump({"J": J}, f, indent=2)


def write_grad(out_dir: Path, prefix: str, grad, fmt: str) -> None:
    _check_fmt(fmt)
    if fmt == "npy":
        np.save(out_dir / f"{prefix}grad.npy", grad)
    else:
        np.savetxt(out_dir / f"{prefix}grad.csv", grad, delimiter=",")


def write_hessian(out_dir: Path, prefix: str, hessian, fmt: str) -> None:
    _check_fmt(fmt)
    if fmt == "npy":
        np.save(out_dir / f"{prefix}hess.npy", hessian)
    else:
        np.savetxt(out_dir / f"{prefix}hess.csv", hessian, delimiter=",")


def write_resolved_deck(out_dir: Path, prefix: str,
                        resolved_deck: dict[str, Any]) -> None:
    with (out_dir / f"{prefix}deck.resolved.yaml").open("w") as f:
        yaml.safe_dump(resolved_deck, f, default_flow_style=False,
                       sort_keys=False)


def write_opt_history(out_dir: Path, prefix: str,
                      history: list[dict[str, Any]],
                      active_param_paths: list[str] | None) -> None:
    payload: dict[str, Any] = {"history": history}
    if active_param_paths is not None:
        payload["active_param_paths"] = active_param_paths
    with (out_dir / f"{prefix}opt_history.json").open("w") as f:
        json.dump(payload, f, indent=2)


def write_opt_params(out_dir: Path, prefix: str,
                     parameters_section: dict[str, Any],
                     optimized_values) -> None:
    """Deck ``parameters:`` subtree with active leaves rewritten to the
    optimized physical values (directly reusable in a follow-up deck)."""
    out = copy.deepcopy(parameters_section)
    _rewrite_values(out, optimized_values)
    with (out_dir / f"{prefix}opt_params.yaml").open("w") as f:
        yaml.safe_dump(out, f, default_flow_style=False, sort_keys=False)


def _rewrite_values(section: Any, values: Any) -> None:
    if isinstance(section, dict) and "value" in section:
        section["value"] = _to_native(values)
        return
    if isinstance(section, dict):
        for k in section:
            if isinstance(values, dict) and k in values:
                _rewrite_values(section[k], values[k])


def _to_native(x: Any) -> Any:
    arr = np.asarray(x)
    if arr.ndim == 0:
        return float(arr)
    return arr.tolist()


def write_opt_status(out_dir: Path, prefix: str,
                     status: dict[str, Any]) -> None:
    with (out_dir / f"{prefix}opt_status.json").open("w") as f:
        json.dump(status, f, indent=2)
