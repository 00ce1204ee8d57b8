"""Training engine tests: loss plumbing, EMA law, data-parallel step on the
8-device CPU mesh (reference parity: utils_training.py engine behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig, make_schedule
from phendiff_tpu.models import CondUNet2D, UNet2DConfig
from phendiff_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch
from phendiff_tpu.train.ema import EMAConfig, ema_decay, ema_update
from phendiff_tpu.train.train_loop import (
    OptimizerConfig,
    TrainConfig,
    diffusion_loss,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)

TINY = UNet2DConfig(
    sample_size=8,
    block_out_channels=(8, 8),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    num_class_embeds=2,
)


@pytest.fixture(scope="module")
def setup():
    model = CondUNet2D(TINY)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(
        jax.random.key(0), x, jnp.array([0]), class_labels=jnp.array([0])
    )

    def model_apply(p, xx, t, class_emb):
        return model.apply(p, xx, t, class_emb=class_emb)

    def embed_fn(p, labels):
        return p["params"]["class_embedding"]["embedding"][labels]

    schedule = make_schedule(SchedulerConfig(num_train_timesteps=50))
    return model_apply, embed_fn, schedule, params


def test_ema_decay_warmup_law():
    cfg = EMAConfig(inv_gamma=1.0, power=0.75, max_decay=0.9999)
    assert float(ema_decay(cfg, 0)) == 0.0
    d10, d1000 = float(ema_decay(cfg, 10)), float(ema_decay(cfg, 1000))
    assert 0 < d10 < d1000 <= 0.9999
    assert float(ema_decay(cfg, 10**9)) == pytest.approx(0.9999)


def test_ema_update_moves_towards_params():
    cfg = EMAConfig()
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(cfg, ema, params, step=100)
    assert 0.0 < float(out["w"][0]) < 1.0


@pytest.mark.parametrize(
    "name", ["constant", "constant_with_warmup", "linear", "cosine", "polynomial"]
)
def test_lr_schedules(name):
    cfg = OptimizerConfig(
        learning_rate=1e-3, lr_scheduler=name, lr_warmup_steps=10, total_steps=100
    )
    s = make_lr_schedule(cfg)
    if name != "constant":
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-5)
    if name in ("linear", "cosine", "polynomial"):
        assert float(s(99)) < 1e-3 * 0.2


@pytest.mark.parametrize("pt", ["epsilon", "sample", "v_prediction"])
def test_diffusion_loss_finite(setup, pt):
    model_apply, embed_fn, _, params = setup
    schedule = make_schedule(
        SchedulerConfig(num_train_timesteps=50, prediction_type=pt)
    )
    imgs = jax.random.normal(jax.random.key(1), (4, 8, 8, 3)) * 0.5
    emb = embed_fn(params, jnp.array([0, 1, 0, 1]))
    loss = diffusion_loss(
        model_apply, params, schedule, imgs, emb, jax.random.key(2)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_train_step_descends(setup):
    model_apply, embed_fn, schedule, params = setup
    cfg = TrainConfig(
        optimizer=OptimizerConfig(learning_rate=1e-3, total_steps=100)
    )
    step_fn = jax.jit(make_train_step(model_apply, embed_fn, schedule, cfg))
    state = init_train_state(params, make_optimizer(cfg.optimizer))
    imgs = jax.random.normal(jax.random.key(3), (8, 8, 8, 3)) * 0.5
    labels = jnp.array([0, 1] * 4)
    first = last = None
    for i in range(10):
        state, m = step_fn(state, (imgs, labels), jax.random.key(42))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
        assert int(m["nonfinite"]) == 0
    assert int(state.step) == 10
    assert last < first  # overfits a fixed batch


def test_train_step_proba_uncond(setup):
    model_apply, embed_fn, schedule, params = setup
    cfg = TrainConfig(
        proba_uncond=1.0,  # always unconditional → class-emb grads must be 0
        optimizer=OptimizerConfig(learning_rate=1e-3),
    )
    step_fn = jax.jit(make_train_step(model_apply, embed_fn, schedule, cfg))
    state = init_train_state(params, make_optimizer(cfg.optimizer))
    imgs = jax.random.normal(jax.random.key(4), (4, 8, 8, 3))
    labels = jnp.array([0, 1, 0, 1])
    before = np.asarray(state.params["params"]["class_embedding"]["embedding"])
    state, _ = step_fn(state, (imgs, labels), jax.random.key(0))
    after = np.asarray(state.params["params"]["class_embedding"]["embedding"])
    # AdamW weight decay still shrinks the table, but no gradient signal:
    # direction must be pure shrinkage (sign-preserving scaling)
    assert np.all(np.sign(before) == np.sign(after))


def test_data_parallel_step_matches_single_device(setup):
    """The mesh-sharded step must produce the same loss as single-device
    (multi-node-without-a-cluster check per SURVEY.md §4)."""
    model_apply, embed_fn, schedule, params = setup
    cfg = TrainConfig(optimizer=OptimizerConfig(learning_rate=1e-3))
    mesh = make_mesh()
    assert mesh.devices.size == 8

    step_fn = make_train_step(model_apply, embed_fn, schedule, cfg)
    state = init_train_state(params, make_optimizer(cfg.optimizer))

    imgs = jax.random.normal(jax.random.key(5), (16, 8, 8, 3))
    labels = jnp.tile(jnp.array([0, 1]), 8)

    # single device
    s1, m1 = jax.jit(step_fn)(state, (imgs, labels), jax.random.key(9))

    # sharded over the mesh
    batch = shard_batch(mesh, (imgs, labels))
    state_sharded = jax.device_put(state, replicated(mesh))
    s8, m8 = jax.jit(step_fn)(state_sharded, batch, jax.random.key(9))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_bf16_first_moment_stores_and_descends(setup):
    """moment_dtype="bfloat16" (optax mu_dtype) stores Adam's first moment
    in bf16 — halving its HBM read+write traffic in the update phase
    (~7 GB/step at full SD width, docs/BENCHMARKS.md roofline) — while the
    master params, second moment, and update math stay f32.  TPU-native
    lever; the torch reference has no analog (its optimizer state is f32,
    train.py).  Training must still descend."""
    model_apply, embed_fn, schedule, params = setup
    cfg = TrainConfig(
        optimizer=OptimizerConfig(
            learning_rate=1e-3, total_steps=100, moment_dtype="bfloat16"
        )
    )
    opt = make_optimizer(cfg.optimizer)
    step_fn = jax.jit(make_train_step(model_apply, embed_fn, schedule, cfg, opt))
    state = init_train_state(params, opt)
    # the mu tree is stored in bf16, nu and params stay f32
    mus = [
        s
        for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert mus, "no ScaleByAdamState found in opt_state"
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(mus[0].mu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(mus[0].nu))
    imgs = jax.random.normal(jax.random.key(3), (8, 8, 8, 3)) * 0.5
    labels = jnp.array([0, 1] * 4)
    first = last = None
    for i in range(10):
        state, m = step_fn(state, (imgs, labels), jax.random.key(42))
        first = float(m["loss"]) if first is None else first
        last = float(m["loss"])
        assert int(m["nonfinite"]) == 0
    assert last < first
