"""Lightweight hierarchical config system (hydra-style groups + dotted overrides).

The reference drives everything through Hydra 1.1 + OmegaConf
(reference configs/config.yaml, src/utils/hydra_utils.py).  Neither package is
available here, so this module implements the subset the framework needs:

* a ``defaults`` list in the root config naming one yaml per group
  (``model: fusion_pointnet_model`` -> ``configs/model/fusion_pointnet_model.yaml``),
* command-line overrides: ``group=name`` swaps a whole group file,
  ``a.b.c=value`` sets a leaf,
* ``${key}`` interpolation against root-level entries,
* attribute-style access (``cfg.model.voxel_size``).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml


class ConfigNode(dict):
    """Dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(obj):
            if isinstance(obj, dict):
                return {k: unwrap(v) for k, v in obj.items()}
            if isinstance(obj, list):
                return [unwrap(v) for v in obj]
            return obj

        return unwrap(self)


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics (int/float/bool/list/str)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.:]+)\}")


def _interpolate(obj: Any, root: Dict[str, Any]) -> Any:
    if isinstance(obj, str):
        def repl(m):
            key = m.group(1)
            node: Any = root
            for part in key.split("."):
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    return m.group(0)  # leave unresolved
            return str(node)

        out = _INTERP_RE.sub(repl, obj)
        return out
    if isinstance(obj, dict):
        return {k: _interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_interpolate(v, root) for v in obj]
    return obj


def _deep_merge(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return data or {}


def default_config_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "configs")


def load_config(
    overrides: Optional[List[str]] = None,
    config_dir: Optional[str] = None,
    config_name: str = "config.yaml",
) -> ConfigNode:
    """Compose the root config with group defaults and CLI overrides.

    ``overrides`` entries are either ``group=groupfile`` (whole-group swap,
    when ``configs/<group>/<groupfile>.yaml`` exists) or ``a.b=value`` leaf
    sets.  Matches the reference CLI surface, e.g.
    ``python src/run_e2e.py model=fusion_pointnet_model dataset.scan_id=lounge``.
    """
    overrides = list(overrides or [])
    config_dir = config_dir or default_config_dir()

    root = _load_yaml(os.path.join(config_dir, config_name))
    defaults = root.pop("defaults", [])

    # group name -> file choice, possibly replaced by overrides
    group_choice: Dict[str, Optional[str]] = {}
    for item in defaults:
        if isinstance(item, dict):
            (group, choice), = item.items()
        else:
            group, choice = str(item), None
        if choice in (None, "null"):
            group_choice[group] = None
        else:
            group_choice[group] = str(choice).replace(".yaml", "")

    leaf_overrides: List[tuple] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got: {ov}")
        key, _, value = ov.partition("=")
        if "." not in key and os.path.exists(
                os.path.join(config_dir, key, value.replace(".yaml", "") + ".yaml")):
            group_choice[key] = value.replace(".yaml", "")
        else:
            leaf_overrides.append((key, _parse_value(value)))

    cfg: Dict[str, Any] = copy.deepcopy(root)
    preset_cfg: Optional[Dict[str, Any]] = None
    for group, choice in group_choice.items():
        if choice is None:
            continue
        group_cfg = _load_yaml(os.path.join(config_dir, group, choice + ".yaml"))
        if group == "preset":
            # presets are CROSS-group partial configs (configs/preset/*.yaml):
            # deep-merged over the composed tree instead of nested under a
            # "preset" key, so one override (preset=fast_e2e) can retune
            # model + trainer + optimizer knobs together.  Applied after all
            # group files, before leaf overrides (user leaf sets still win).
            preset_cfg = group_cfg
            continue
        cfg[group] = group_cfg
    if preset_cfg is not None:
        _deep_merge(cfg, preset_cfg)
        cfg["preset"] = group_choice.get("preset")

    for key, value in leaf_overrides:
        _set_dotted(cfg, key, value)

    # iterate to a fixpoint: interpolations may reference other interpolated
    # values (dataset.data_dir -> ${data_dir} -> ${work_dir}/data/)
    for _ in range(5):
        new_cfg = _interpolate(cfg, cfg)
        if new_cfg == cfg:
            break
        cfg = new_cfg
    return ConfigNode.wrap(cfg)


def config_from_dict(data: Dict[str, Any]) -> ConfigNode:
    return ConfigNode.wrap(copy.deepcopy(data))
