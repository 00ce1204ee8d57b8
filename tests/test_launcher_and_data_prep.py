"""Launcher + dataset-prep tool tests."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

from phendiff_tpu.cli.launcher import build_command, expand_sweep, main as launcher_main
from phendiff_tpu.cli.prepare_data import prepare
from phendiff_tpu.data.imagefolder import scan_imagefolder


def test_expand_sweep_cartesian():
    runs = expand_sweep({"a": [1, 2], "b": ["x"]})
    assert runs == [["a=1", "b=x"], ["a=2", "b=x"]]


def test_build_command():
    cmd = build_command("c.yaml", ["k=v"], debug=True)
    assert "--config" in cmd and "--debug" in cmd and "k=v" in cmd


def test_launcher_dry_run(tmp_path):
    conf = tmp_path / "c.yaml"
    conf.write_text(yaml.safe_dump({"output_dir": "x"}))
    sweep = tmp_path / "s.yaml"
    sweep.write_text(yaml.safe_dump({"num_inference_steps": [5, 10]}))
    rc = launcher_main([
        "--config", str(conf),
        "--experiment_dir", str(tmp_path / "exp"),
        "--sweep", str(sweep),
        "--dry_run",
    ])
    assert rc == 0
    assert (tmp_path / "exp" / "frozen_launch_config.yaml").exists()


def test_launcher_slurm_script(tmp_path):
    conf = tmp_path / "c.yaml"
    conf.write_text(yaml.safe_dump({"output_dir": "x"}))
    launcher_main([
        "--config", str(conf),
        "--experiment_dir", str(tmp_path / "exp"),
        "--slurm", "--dry_run", "--mail_user", "a@b.c",
    ])
    script = (tmp_path / "exp" / "job_000.sbatch").read_text()
    assert "#SBATCH --job-name=phendiff_0" in script
    assert "--mail-type=FAIL" in script
    assert "img2img_cli" in script


def test_prepare_data_split_and_augment(tiny_image_root, tmp_path):
    dest = tmp_path / "prepared"
    stats = prepare(
        str(tiny_image_root), str(dest), test_frac=0.5, augment=True, seed=0
    )
    # 16 per class → 8 test, 8 train × 8 Dih4 variants
    assert stats["test/DMSO"] == 8
    assert stats["train/DMSO"] == 64
    train_idx = scan_imagefolder(dest / "train")
    assert len(train_idx) == 128
    np.testing.assert_array_equal(train_idx.class_counts(), [64, 64])
    # augmented names follow the scheme
    names = [os.path.basename(p) for p in train_idx.paths]
    assert any("_rot1_flip" in n for n in names)
    # no overlap between train and test stems (within each class)
    test_idx = scan_imagefolder(dest / "test")
    test_stems = {
        (l, os.path.basename(p).split(".")[0])
        for p, l in zip(test_idx.paths, test_idx.labels)
    }
    train_stems = {
        (l, os.path.basename(p).split("_rot")[0])
        for p, l in zip(train_idx.paths, train_idx.labels)
    }
    assert not test_stems & train_stems


def test_prepare_data_deterministic(tiny_image_root, tmp_path):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    prepare(str(tiny_image_root), str(d1), 0.5, False, seed=3)
    prepare(str(tiny_image_root), str(d2), 0.5, False, seed=3)
    i1 = scan_imagefolder(d1 / "train")
    i2 = scan_imagefolder(d2 / "train")
    assert [os.path.basename(p) for p in i1.paths] == [
        os.path.basename(p) for p in i2.paths
    ]
