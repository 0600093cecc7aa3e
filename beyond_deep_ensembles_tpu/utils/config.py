"""Config / sweep system with the reference's cw2 YAML semantics.

The reference drives every experiment through cw2 multi-document YAML
(SURVEY.md §5 "Config / flag system"): a DEFAULT document with shared
``params``, one named document per algorithm variant merged over it, a
``list`` key whose entries are zipped into parallel sweeps, a ``grid``
key whose entries form a cross product, and ``repetitions`` controlling
seeds. This is a dependency-free re-implementation of those semantics.
"""
from __future__ import annotations

import itertools
from typing import Iterator, List, Optional

import yaml


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def expand_config(doc: dict) -> List[dict]:
    """Expand one experiment document into concrete configs.

    ``list:`` zips its value lists positionally (cw2 semantics: parallel
    lists of equal length); ``grid:`` takes the cross product. Both yield
    dicts merged into ``params``.
    """
    params = dict(doc.get("params", {}))
    variants = [params]

    grid = doc.get("grid")
    if grid:
        keys = list(grid.keys())
        variants = [
            _deep_merge(v, dict(zip(keys, combo)))
            for v in variants
            for combo in itertools.product(*[grid[k] for k in keys])
        ]

    zipped = doc.get("list")
    if zipped:
        keys = list(zipped.keys())
        lengths = {len(zipped[k]) for k in keys}
        assert len(lengths) == 1, f"'list' entries must have equal length: {zipped}"
        variants = [
            _deep_merge(v, {k: zipped[k][i] for k in keys})
            for v in variants
            for i in range(lengths.pop())
        ]
    return variants


def load_sweep(path: str, name: Optional[str] = None) -> Iterator[dict]:
    """Load a multi-document YAML sweep.

    Document 0 may be ``name: DEFAULT`` providing shared params; every
    other document is a named variant. Yields dicts with keys
    ``name``, ``params``, ``repetitions`` (reference entry protocol:
    ``python3 {task}.py {task}.yaml``, SURVEY.md §1 L6).
    """
    with open(path) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    default: dict = {}
    for d in docs:
        if d.get("name") == "DEFAULT":
            default = d
            break
    for d in docs:
        if d.get("name") in (None, "DEFAULT", "SLURM"):
            continue
        if name is not None and d["name"] != name:
            continue
        merged = _deep_merge(default, d)
        for i, params in enumerate(expand_config(merged)):
            yield {
                "name": d["name"],
                "variant": i,
                "repetitions": merged.get("repetitions", 1),
                "params": params,
            }
