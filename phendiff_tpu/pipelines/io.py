"""Pipeline folder persistence (diffusers-layout interop).

Mirrors the on-disk contract of the reference's
``DiffusionPipeline.save_pretrained`` / ``from_pretrained`` folders
(``pipeline_conditionial_ddim.py`` inherits them; saved by
``utils_training.py:1004-1061``): a ``model_index.json`` naming the
components, plus one subfolder per component with a ``config.json`` and a
weights file.  Weights are stored as safetensors of the *flattened* Flax
param tree ('/'-joined keys), numpy-endian, always float32.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
from safetensors.numpy import load_file, save_file

WEIGHTS_NAME = "params.safetensors"
CONFIG_NAME = "config.json"
MODEL_INDEX = "model_index.json"


def flatten_params(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_component(dirpath: str, config: dict, params: Any = None) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, CONFIG_NAME), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
    if params is not None:
        save_file(flatten_params(params), os.path.join(dirpath, WEIGHTS_NAME))


def load_component(dirpath: str):
    with open(os.path.join(dirpath, CONFIG_NAME)) as f:
        config = json.load(f)
    weights_path = os.path.join(dirpath, WEIGHTS_NAME)
    params = None
    if os.path.exists(weights_path):
        params = unflatten_params(load_file(weights_path))
    return config, params


def save_model_index(dirpath: str, class_name: str, components: Dict[str, str]):
    os.makedirs(dirpath, exist_ok=True)
    index = {"_class_name": class_name, "_framework": "phendiff_tpu"}
    index.update(components)
    with open(os.path.join(dirpath, MODEL_INDEX), "w") as f:
        json.dump(index, f, indent=2, sort_keys=True)


def load_model_index(dirpath: str) -> dict:
    with open(os.path.join(dirpath, MODEL_INDEX)) as f:
        return json.load(f)
