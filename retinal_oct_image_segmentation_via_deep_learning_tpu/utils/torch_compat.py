"""PyTorch checkpoint import: torch ``state_dict`` -> flax variables.

Enables (a) per-pixel parity tests against the reference implementations run
under torch-cpu, and (b) users migrating trained reference checkpoints into
this framework (the reference saves whole-module pickles,
``ReLayNet_2017.py:117-126``, or Keras HDF5 weights,
``trainTestModels.py:71-76``).

Matching strategy: both frameworks expose parameters in *module call order*
(torch: state_dict insertion order ~ registration order; flax linen: variables
dict insertion order = first-call order). Tensors are grouped into per-module
"units" (conv / transposed-conv / dense / batchnorm / prelu / plain tensor)
and zipped in order with shape-checked layout conversion:

- conv weight     (O, I/g, kh, kw) -> kernel (kh, kw, I/g, O)
- conv-transpose  (I, O/g, kh, kw) -> kernel (kh, kw, I, O)  (blocks.ConvTranspose)
- dense weight    (O, I)           -> kernel (I, O)
- batchnorm       weight/bias/running_mean/running_var -> scale/bias + mean/var
- prelu           weight (n,)      -> alpha

Architectures whose registration order differs from call order can pass a
``reorder`` hook on the torch unit list.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np


def _is_leaf(x) -> bool:
    return not isinstance(x, dict)


def _flatten(tree: dict, prefix=()) -> list[tuple[tuple, Any]]:
    out = []
    for k, v in tree.items():
        if _is_leaf(v):
            out.append((prefix + (k,), v))
        else:
            out.extend(_flatten(v, prefix + (k,)))
    return out


def _module_groups(flat: list[tuple[tuple, Any]]):
    """Group leaves by their parent path, preserving order."""
    groups: dict[tuple, dict] = {}
    for path, v in flat:
        groups.setdefault(path[:-1], {})[path[-1]] = v
    return groups


def torch_units(state_dict) -> list[dict]:
    """Group a torch state_dict (insertion-ordered) into typed units."""
    groups: dict[str, dict] = {}
    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        prefix, _, leaf = name.rpartition(".")
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        groups.setdefault(prefix, {})[leaf] = arr

    units = []
    for prefix, g in groups.items():
        if "running_mean" in g:
            kind = "bn"
        elif "weight" in g and g["weight"].ndim == 4:
            kind = "conv"
        elif "weight" in g and g["weight"].ndim == 2:
            kind = "dense"
        elif "weight" in g and g["weight"].ndim <= 1 and len(g) == 1:
            kind = "prelu"
        elif (
            "weight" in g and g["weight"].ndim == 1 and "bias" in g
            and len(g) == 2
        ):
            kind = "ln"  # LayerNorm / affine InstanceNorm
        else:
            # plain tensor parameters (pos embeddings, cls tokens, scalars):
            # one unit per leaf, preserving order
            for leaf, arr in g.items():
                units.append(
                    {"kind": "tensor", "name": f"{prefix}.{leaf}", leaf: arr}
                )
            continue
        units.append({"kind": kind, "name": prefix, **g})
    return units


def mark_transposed(units: list[dict], name_predicate: Callable[[str], bool]):
    """Tag conv units whose torch module is a ConvTranspose2d (layout differs
    but both are 4D weights — the caller identifies them by name, e.g.
    ``lambda n: 'upconv' in n``)."""
    for u in units:
        if u["kind"] == "conv" and name_predicate(u["name"]):
            u["kind"] = "conv_t"
    return units


def import_torch_state_named(
    variables: dict,
    state_dict,
    name_map: dict[str, str],
    *,
    transposed: Callable[[str], bool] | None = None,
) -> dict:
    """Name-based import: ``name_map`` maps flax module paths ('/'-joined,
    e.g. ``"UNetBlock_0/Conv_0/Conv_0"``) to torch module prefixes (e.g.
    ``"encoder1.enc1conv1"``). Robust alternative to the order-zipped
    :func:`import_torch_state` for models whose torch registration order
    differs from call order; unmapped flax modules keep their init values,
    and every map entry must consume a torch unit (error otherwise)."""
    units = torch_units(state_dict)
    if transposed is not None:
        units = mark_transposed(units, transposed)
    by_name = {u["name"]: u for u in units}

    remapped = []
    params_flat = _flatten(variables.get("params", {}))
    pgroups = _module_groups(params_flat)
    for path in pgroups:
        key = "/".join(str(p) for p in path)
        if key in name_map:
            tname = name_map[key]
            if tname not in by_name:
                raise ValueError(
                    f"name_map: torch module '{tname}' not in state_dict "
                    f"(for flax '{key}')"
                )
            remapped.append((path, by_name[tname]))

    mapped_paths = {p for p, _ in remapped}

    def reorder(units_in):
        # Emit torch units in the flax call order of the mapped modules;
        # unmapped flax modules are skipped by import via a filter below.
        return [u for _, u in remapped]

    # Restrict the flax side to mapped modules by importing into a filtered
    # copy, then grafting the result back.
    out = import_torch_state(
        variables, state_dict, transposed=transposed, reorder=reorder,
        only_paths=mapped_paths,
    )
    return out


def import_torch_state(
    variables: dict,
    state_dict,
    *,
    transposed: Callable[[str], bool] | None = None,
    reorder: Callable[[list[dict]], list[dict]] | None = None,
    only_paths: set | None = None,
) -> dict:
    """Return a new flax ``variables`` dict loaded from ``state_dict``.

    ``only_paths``: restrict the import to these flax module paths (used by
    :func:`import_torch_state_named`); other modules keep their values and
    leftover torch units are tolerated only in that mode."""
    units = torch_units(state_dict)
    if transposed is not None:
        units = mark_transposed(units, transposed)
    if reorder is not None:
        units = reorder(units)

    params_flat = _flatten(variables.get("params", {}))
    stats_flat = _flatten(variables.get("batch_stats", {}))
    pgroups = _module_groups(params_flat)
    sgroups = _module_groups(stats_flat)

    new_params = {p: dict(v) for p, v in pgroups.items()}
    new_stats = {p: dict(v) for p, v in sgroups.items()}

    # Build flax unit list in call order.
    flax_units = []
    for path, g in pgroups.items():
        if only_paths is not None and path not in only_paths:
            continue
        if "kernel" in g:
            kind = "conv" if np.ndim(g["kernel"]) == 4 else "dense"
        elif "scale" in g and path in sgroups:
            kind = "bn"
        elif "scale" in g:
            kind = "ln"
        elif "alpha" in g:
            kind = "prelu"
        else:
            # plain tensor params: one unit per leaf, preserving order
            for leaf in g:
                flax_units.append(
                    {"kind": "tensor", "path": path, "leaves": g, "leaf": leaf}
                )
            continue
        flax_units.append({"kind": kind, "path": path, "leaves": g})

    ui = 0
    for fu in flax_units:
        if ui >= len(units):
            raise ValueError(
                f"Ran out of torch units at flax module {fu['path']}"
            )
        tu = units[ui]
        ui += 1
        path, g = fu["path"], fu["leaves"]
        err = f"flax {path} ({fu['kind']}) vs torch {tu['name']} ({tu['kind']})"

        if fu["kind"] in ("conv", "dense"):
            if tu["kind"] not in ("conv", "conv_t", "dense"):
                raise ValueError("unit kind mismatch: " + err)
            w = tu["weight"]
            if tu["kind"] == "conv_t":
                k = w.transpose(2, 3, 0, 1)  # (I,O,kh,kw)->(kh,kw,I,O)
            elif tu["kind"] == "conv":
                k = w.transpose(2, 3, 1, 0)  # (O,I,kh,kw)->(kh,kw,I,O)
            else:
                k = w.T
            if k.shape != np.shape(g["kernel"]):
                raise ValueError(f"kernel shape {k.shape} vs {np.shape(g['kernel'])}: " + err)
            new_params[path]["kernel"] = k.astype(np.float32)
            if "bias" in g:
                if "bias" not in tu:
                    raise ValueError("flax expects bias, torch has none: " + err)
                new_params[path]["bias"] = tu["bias"].astype(np.float32)
        elif fu["kind"] == "bn":
            if tu["kind"] != "bn":
                raise ValueError("unit kind mismatch: " + err)
            new_params[path]["scale"] = tu["weight"].astype(np.float32)
            new_params[path]["bias"] = tu["bias"].astype(np.float32)
            new_stats[path]["mean"] = tu["running_mean"].astype(np.float32)
            new_stats[path]["var"] = tu["running_var"].astype(np.float32)
        elif fu["kind"] == "ln":
            if tu["kind"] != "ln":
                raise ValueError("unit kind mismatch: " + err)
            new_params[path]["scale"] = tu["weight"].astype(np.float32)
            new_params[path]["bias"] = tu["bias"].astype(np.float32)
        elif fu["kind"] == "prelu":
            new_params[path]["alpha"] = np.reshape(tu["weight"], (-1,)).astype(np.float32)
        else:
            # plain tensor parameter: copy the single torch leaf
            (leaf_name, leaf_val), = [
                (k, v) for k, v in tu.items() if k not in ("kind", "name")
            ]
            fkey = fu["leaf"]
            want_shape = np.shape(g[fkey])
            if np.shape(leaf_val) != want_shape:
                raise ValueError(
                    f"tensor shape {np.shape(leaf_val)} vs {want_shape}: " + err
                )
            new_params[path][fkey] = np.asarray(leaf_val, np.float32)

    if ui != len(units):
        leftover = [u["name"] for u in units[ui:]]
        raise ValueError(f"Unconsumed torch units: {leftover}")

    # Reassemble nested dicts.
    def unflatten(groups: dict[tuple, dict]):
        tree: dict = {}
        for path, leaves in groups.items():
            node = tree
            for p in path:
                node = node.setdefault(p, {})
            node.update(leaves)
        return tree

    out = dict(variables)
    out["params"] = unflatten(new_params)
    if new_stats:
        out["batch_stats"] = unflatten(new_stats)
    return out
