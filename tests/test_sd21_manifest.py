"""SD-2.1 checkpoint-layout validation (VERDICT r1 missing #3).

``tests/fixtures/sd21_manifest.json`` is the stabilityai/stable-diffusion-2-1
UNet + VAE state-dict key→shape manifest, generated INDEPENDENTLY of the
exporter by ``tools/gen_sd21_manifest.py`` (which encodes diffusers'
public naming rules from the architecture definition).  Its parameter
counts match the published checkpoint exactly (865,910,724 UNet /
83,653,863 VAE), so the fixture pins the real checkpoint layout without
egress.  ``export_sd_unet`` / ``export_vae`` at the full SD-2.1 config
must produce exactly that key set with exactly those shapes — the gap the
round-trip tests could not close (reference loader:
``src/utils_models.py:67-122``).

Params are shape-only (``jax.eval_shape`` init + broadcast-zero views), so
the test never allocates the 866M-parameter model.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.models.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig
from phendiff_tpu.models.hf_import import export_sd_unet, export_vae
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sd21_manifest.json")


@pytest.fixture(scope="module")
def manifest():
    with open(FIXTURE) as f:
        return json.load(f)


def _zeros_view_tree(shapes):
    # Read-only broadcast views: full SD-2.1 param "tensors" at zero memory.
    return jax.tree.map(
        lambda s: np.broadcast_to(np.zeros((), np.float32), s.shape), shapes
    )


def _diff(ours: dict, manifest: dict, what: str):
    ours_keys, man_keys = set(ours), set(manifest)
    missing = sorted(man_keys - ours_keys)
    extra = sorted(ours_keys - man_keys)
    assert not missing and not extra, (
        f"{what}: {len(missing)} checkpoint keys unproduced "
        f"(e.g. {missing[:8]}); {len(extra)} extra keys (e.g. {extra[:8]})"
    )
    bad = {
        k: (list(ours[k].shape), manifest[k])
        for k in man_keys
        if list(ours[k].shape) != manifest[k]
    }
    assert not bad, f"{what}: shape mismatches: {dict(list(bad.items())[:8])}"


def test_manifest_param_counts(manifest):
    # The published SD-2.1 sizes — if the generator drifts, fail loudly.
    assert manifest["unet_param_count"] == 865_910_724
    assert manifest["vae_param_count"] == 83_653_863


def test_sd_unet_export_matches_sd21_checkpoint_layout(manifest):
    cfg = SDUNetConfig()  # defaults ARE the SD-2.1 config
    model = SDUNet(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    seq = jnp.zeros((1, 77, cfg.cross_attention_dim))
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, t, seq), jax.random.key(0)
    )
    sd = export_sd_unet(_zeros_view_tree(shapes), cfg)
    _diff(sd, manifest["unet"], "SD-2.1 UNet")
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    assert n == manifest["unet_param_count"]


def test_vae_export_matches_sd21_checkpoint_layout(manifest):
    cfg = AutoencoderKLConfig()  # defaults ARE the SD VAE config
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, cfg.in_channels))
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, method=None), jax.random.key(0)
    )
    sd = export_vae(_zeros_view_tree(shapes), cfg)
    _diff(sd, manifest["vae"], "SD VAE")
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    assert n == manifest["vae_param_count"]
