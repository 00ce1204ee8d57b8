"""``python -m phendiff_tpu.cli.img2img_cli`` — class-transfer comparison app.

Capability parity with ``img2img_comparison.py`` (+ its launcher's
config-freezing behavior): a YAML config selects pipelines, dataset splits,
transfer methods, per-method parameters, and metrics; the config file is
copied into the experiment folder before running so delayed/queued jobs see
a frozen config (reference ``duplicate_config_to_experiment_folder``,
``utils_Img2Img.py:907-939``).

Usage:
    python -m phendiff_tpu.cli.img2img_cli --config conf.yaml \
        [--override key=value ...] [--debug]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import shutil
import sys

from phendiff_tpu.experiments.comparison import ComparisonConfig, ComparisonExperiment
from phendiff_tpu.obs.trackers import make_tracker


def apply_overrides(config: ComparisonConfig, overrides) -> ComparisonConfig:
    """Hydra-style ``key=value`` overrides for scalar fields (the sweep
    mechanism drives these, cf. examples/example_sweep_configs)."""
    kw = {}
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        field_types = {f.name: f.type for f in dataclasses.fields(ComparisonConfig)}
        if key not in field_types:
            raise ValueError(f"unknown override key: {key}")
        current = getattr(config, key)
        if isinstance(current, bool):
            kw[key] = value.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            kw[key] = int(value)
        elif isinstance(current, float):
            kw[key] = float(value)
        elif isinstance(current, tuple):
            kw[key] = tuple(value.split(","))
        else:
            kw[key] = value
    return dataclasses.replace(config, **kw)


def main(argv=None) -> int:
    from phendiff_tpu.cli import force_platform_from_env, setup_compilation_cache

    force_platform_from_env()
    setup_compilation_cache()
    # INFO progress lines (route decisions, per-checkpoint transfer walls)
    # — the reference's comparison app logs INFO via the accelerate logger
    # (img2img_comparison.py main's logging setup)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    p = argparse.ArgumentParser("phendiff-img2img-comparison")
    p.add_argument("--config", required=True, help="YAML comparison config")
    p.add_argument("--override", nargs="*", default=[], help="key=value overrides")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    config = ComparisonConfig.from_yaml(args.config)
    config = apply_overrides(config, args.override)
    if args.debug:
        config = dataclasses.replace(
            config, debug=True, num_inference_steps=10,
            metrics=dataclasses.replace(config.metrics, kid_subset_size=1),
        )

    os.makedirs(config.output_dir, exist_ok=True)
    # freeze the config into the experiment folder
    shutil.copy(args.config, os.path.join(config.output_dir, "frozen_config.yaml"))
    with open(os.path.join(config.output_dir, "resolved_config.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2, default=str)

    tracker = make_tracker("jsonl", config.output_dir)
    experiment = ComparisonExperiment(config, tracker=tracker)
    results = experiment.run()
    for k in sorted(results):
        print(f"{k}: {results[k]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
