"""End-to-end training smoke test: synthetic data -> collate -> jitted train
step -> parameters update (with frozen groups respected)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset, iterate_batches
from neurips2023_soc_tpu.losses import CriterionConfig
from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.training.optim import build_optimizer
from neurips2023_soc_tpu.training.train_step import (
    TrainState,
    make_train_step,
)

SIZE = ((48, 64),)
TIME = (4,)


@pytest.fixture(scope="module")
def setup():
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    ds = SyntheticRVOSDataset(num_samples=8, num_frames=4, frame_size=(48, 64))
    tok = build_tokenizer("roberta-tiny", text_bucket=12)
    batches = list(
        iterate_batches(ds, 2, tok, shuffle=False, size_buckets=SIZE,
                        time_buckets=TIME)
    )
    b0 = batches[0]
    params = model.init(
        jax.random.PRNGKey(0), b0["pixels"], b0["pad_mask"], b0["text_ids"],
        b0["text_mask"],
    )
    tx = build_optimizer(
        params, lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-6,
        clip_max_norm=0.1, freeze_text=True,
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, CriterionConfig(), donate=False)
    return model, state, step, batches


def test_train_steps_update_params(setup):
    model, state, step, batches = setup
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    losses = []
    for i, batch in enumerate(batches[:3]):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert float(metrics["grad_norm"]) > 0

    p1 = state.params
    # frozen text encoder params must not move
    te0 = p0["params"]["text_encoder"]
    te1 = p1["params"]["text_encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(te0), jax.tree_util.tree_leaves(te1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # main params must move
    moved = False
    for a, b in zip(
        jax.tree_util.tree_leaves(p0["params"]["transformer"]),
        jax.tree_util.tree_leaves(p1["params"]["transformer"]),
    ):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            moved = True
            break
    assert moved


def test_loss_decreases_on_repeated_batch(setup):
    model, state, step, batches = setup
    batch = batches[0]
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_train_step_with_valid_indices():
    """A2D-style center-frame training: pred T collapses to 1 annotated frame."""
    from neurips2023_soc_tpu.training.train_step import make_train_step

    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    ds = SyntheticRVOSDataset(num_samples=4, num_frames=4, frame_size=(48, 64),
                              center_frame_only=True)
    tok = build_tokenizer("roberta-tiny", text_bucket=12)
    from neurips2023_soc_tpu.data.synthetic import iterate_batches

    batch = next(iterate_batches(ds, 2, tok, shuffle=False, size_buckets=SIZE,
                                 time_buckets=TIME))
    assert "valid_indices" in batch
    assert batch["masks"].shape[0] == 1  # targets collapse to annotated frame
    params = model.init(
        jax.random.PRNGKey(0), batch["pixels"], batch["pad_mask"],
        batch["text_ids"], batch["text_mask"],
    )
    tx = build_optimizer(params, lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-6)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, CriterionConfig(),
                          has_valid_indices=True, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_vla_fusion_params_in_main_group(setup):
    """Joint-trainer parity (reference jointtrainer.py:84-91): the VLA/MMF
    fusion params must train at the main lr. The reference enforces this with
    a '"VLA" in n' keyword that actually matches nothing (fusion modules are
    named vlf/lvf, models/soc.py:120-121) — the effective behavior is simply
    that vlf/lvf fall in the default group; we pin that here."""
    from neurips2023_soc_tpu.training.optim import _label_tree

    model, state, step, batches = setup
    labels = _label_tree(state.params, freeze_text=True)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {"vlf": set(), "lvf": set(), "backbone": set(), "text": set()}
    for path, label in flat:
        joined = "/".join(str(getattr(p, "key", getattr(p, "name", "")))
                          for p in path)
        for key in ("vlf", "lvf"):
            if f"/{key}" in joined or joined.startswith(key):
                seen[key].add(label)
        if "/backbone/" in joined:
            seen["backbone"].add(label)
        if "text_encoder" in joined:
            seen["text"].add(label)
    assert seen["vlf"] == {"main"} and seen["lvf"] == {"main"}
    assert seen["backbone"] <= {"backbone", "frozen"} and seen["backbone"]
    assert seen["text"] == {"frozen"}  # freeze_text=True


def test_grad_accumulation_semantics(setup):
    """grad_accum_steps=k (optax.MultiSteps in build_optimizer): non-final
    micro-steps leave params untouched; k identical micro-batches produce
    the same update as one k=1 step on that batch (incremental mean of
    identical gradients is exact). This is how a small mesh reproduces the
    reference's 8-GPU global batch (reference README.md:167-172)."""
    model, state0, _, batches = setup
    batch = batches[0]
    params = state0.params
    kw = dict(lr=1e-3, lr_backbone=1e-4, text_encoder_lr=5e-6,
              clip_max_norm=0.1, freeze_text=True)
    s1 = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=build_optimizer(params, **kw))
    s2 = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=build_optimizer(params, **kw, grad_accum_steps=2))
    step = make_train_step(model, CriterionConfig(), donate=False)
    rng = jax.random.PRNGKey(7)

    s1, _ = step(s1, batch, rng)

    s2, _ = step(s2, batch, rng)  # micro-step 1: accumulate only
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s2, _ = step(s2, batch, rng)  # micro-step 2: the update fires
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_grad_accumulation_lr_schedule_counts_updates(setup):
    """The MultiStepLR milestones tick on optimizer UPDATES, not
    micro-steps: with k=2 and a milestone at update 1, the lr drop must
    land after 2 micro-steps, matching trainer.py's milestone // accum
    conversion."""
    import optax

    model, state0, _, batches = setup
    params = state0.params
    tx = build_optimizer(
        params, lr=1e-3, lr_backbone=1e-4, text_encoder_lr=5e-6,
        clip_max_norm=0.0, freeze_text=True, milestones_steps=(1,),
        gamma=0.1, grad_accum_steps=2)
    opt_state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    deltas = []
    p = params
    for i in range(4):  # 4 micro-steps = 2 updates
        updates, opt_state = tx.update(g, opt_state, p)
        norm = float(optax.global_norm(updates))
        deltas.append(norm)
        p = optax.apply_updates(p, updates)
    # micro-steps 1 and 3 emit zero updates; update 2's step norm reflects
    # the post-milestone lr (0.1x), i.e. far smaller than update 1's
    assert deltas[0] == 0.0 and deltas[2] == 0.0
    assert deltas[3] < 0.5 * deltas[1], deltas


def test_update_milestone_conversion_collision_safe():
    """Micro-step -> update-unit milestone conversion keeps every gamma
    drop: floor-division collisions bump to the next update, and a
    milestone inside the first accumulation window clamps to update 1."""
    from neurips2023_soc_tpu.training.optim import (
        update_milestones_from_microsteps,
    )

    assert update_milestones_from_microsteps([60, 80], 1) == [60, 80]
    assert update_milestones_from_microsteps([60, 80], 8) == [7, 10]
    # collision: 6//4 == 7//4 == 1 -> second drop moves to update 2
    assert update_milestones_from_microsteps([6, 7], 4) == [1, 2]
    # floor-to-zero clamps to 1 (never drops lr before the first update)
    assert update_milestones_from_microsteps([3, 6], 8) == [1, 2]
