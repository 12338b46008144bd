"""ZeRO-1 optimizer-state sharding (parallel/zero.py): parity with the
replicated layout, actual 1/N per-device placement, and trainer config
wiring — on the 8-virtual-device CPU mesh.

The reference keeps a full AdamW state replica per rank (torch.optim state
under DDP, reference trainer.py:52-54, 91-99); ZeRO-1 is the TPU-mesh
upgrade: mu/nu sharded over the 'data' axis, params replicated, XLA
inserting the slice/all-gather pair from the sharding annotations alone.
"""
import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset, iterate_batches
from neurips2023_soc_tpu.losses import CriterionConfig
from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.parallel import (
    make_mesh,
    opt_state_bytes_per_device,
    shard_batch,
    shard_opt_state,
    zero1_sharding_for,
)
from neurips2023_soc_tpu.training.optim import build_optimizer
from neurips2023_soc_tpu.training.train_step import TrainState, make_train_step

SIZE = ((48, 64),)
TIME = (2,)
NDEV = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < NDEV:
        pytest.skip(f"needs {NDEV} devices")
    mesh = make_mesh(shape=(NDEV,), axis_names=("data",),
                     devices=jax.devices()[:NDEV])
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    ds = SyntheticRVOSDataset(num_samples=NDEV, num_frames=2,
                              frame_size=(48, 64))
    tok = build_tokenizer("roberta-tiny", text_bucket=12)
    batch = next(iterate_batches(ds, NDEV, tok, shuffle=False,
                                 size_buckets=SIZE, time_buckets=TIME))
    batch = shard_batch(mesh, batch)
    repl = NamedSharding(mesh, P())
    params = jax.jit(model.init, out_shardings=repl)(
        jax.random.PRNGKey(0), batch["pixels"], batch["pad_mask"],
        batch["text_ids"], batch["text_mask"],
    )
    tx = build_optimizer(
        params, lr=1e-3, lr_backbone=1e-4, text_encoder_lr=5e-5,
        clip_max_norm=0.1, freeze_text=True,
    )
    return mesh, model, params, tx, batch


def _run_steps(model, params, tx, batch, mesh, zero1: bool, n_steps: int = 2):
    # the production step donates its state arg — give each run its own
    # param buffers so the first run's donation can't delete the fixture's
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if zero1:
        state = shard_opt_state(state, mesh)
    step = make_train_step(model, CriterionConfig(),
                           zero1_mesh=mesh if zero1 else None)
    rng = jax.random.PRNGKey(7)
    for _ in range(n_steps):
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, batch, srng)
    return state, metrics


def test_zero1_parity_and_layout(setup):
    mesh, model, params, tx, batch = setup
    s_repl, m_repl = _run_steps(model, params, tx, batch, mesh, zero1=False)
    s_z1, m_z1 = _run_steps(model, params, tx, batch, mesh, zero1=True)

    # --- parity: same math up to float reassociation of the sharded update
    assert np.isfinite(float(m_z1["loss"]))
    np.testing.assert_allclose(float(m_z1["loss"]), float(m_repl["loss"]),
                               rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(s_repl.params)
    flat_z = jax.tree_util.tree_leaves(s_z1.params)
    assert len(flat_r) == len(flat_z)
    # Param-space parity after Adam steps cannot be ulp-tight: float
    # reassociation of the sharded update can flip the SIGN of
    # mu/(sqrt(nu)+eps) on near-zero-gradient elements, so individual diffs
    # are bounded by ~lr per step, not by rounding. The meaningful envelope:
    # every element moved less than a couple of lr-steps from the replicated
    # trajectory, and all but a vanishing fraction agree to well below one
    # lr-step (lr_max = 1e-3, the top group lr in the fixture's optimizer).
    lr_max, total, off = 1e-3, 0, 0
    worst = 0.0
    for a, b in zip(flat_r, flat_z):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        if d.size:
            worst = max(worst, float(d.max()))
        total += d.size
        off += int((d > 0.1 * lr_max).sum())
    assert worst < 4 * lr_max, f"param drifted {worst:.2e} > 4*lr"
    assert off / total < 1e-3, f"{off}/{total} elements off by >0.1*lr"

    # --- layout: big mu/nu leaves actually live sharded, 1/NDEV per device
    sharded_leaves = 0
    for leaf in jax.tree_util.tree_leaves(s_z1.opt_state):
        if not hasattr(leaf, "sharding"):
            continue
        spec = getattr(leaf.sharding, "spec", None)
        expected = zero1_sharding_for(leaf.shape, mesh)
        assert leaf.sharding.is_equivalent_to(expected, leaf.ndim), (
            leaf.shape, leaf.sharding, expected)
        if spec is not None and "data" in tuple(spec):
            sharded_leaves += 1
            shard = leaf.addressable_shards[0].data
            assert shard.size * NDEV == leaf.size
    assert sharded_leaves > 10  # every trainable mu/nu with a divisible axis

    # --- the memory claim: per-device bytes ~1/NDEV of the replicated state
    bytes_repl = opt_state_bytes_per_device(s_repl.opt_state)
    bytes_z1 = opt_state_bytes_per_device(s_z1.opt_state)
    assert bytes_z1 < 0.25 * bytes_repl, (bytes_z1, bytes_repl)

    # params stay replicated (the forward path is untouched)
    p_leaf = jax.tree_util.tree_leaves(s_z1.params)[0]
    assert p_leaf.sharding.is_fully_replicated


def test_zero1_sharding_for_picks_divisible_axis(setup):
    mesh = setup[0]
    assert tuple(zero1_sharding_for((16, 3), mesh).spec) == ("data", None)
    # first axis not divisible -> second
    assert tuple(zero1_sharding_for((3, 16), mesh).spec) == (None, "data")
    # nothing divisible -> replicated
    assert tuple(zero1_sharding_for((3, 7), mesh).spec) == ()
    assert tuple(zero1_sharding_for((), mesh).spec) == ()


def test_trainer_resume_replaces_zero1_layout(tmp_path):
    """Orbax restores the optimizer state replicated; a zero1 trainer must
    re-place it in the sharded layout before the donated train step runs
    (trainer.load_checkpoint), and training must continue from it."""
    from neurips2023_soc_tpu.config import load_config
    from neurips2023_soc_tpu.data.collate import collate_batch
    from neurips2023_soc_tpu.training.trainer import Trainer

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")

    def make(epochs):
        cfg = load_config("configs/tiny_synthetic.yaml", overrides={
            "epochs": epochs, "output_dir": str(tmp_path), "batch_size": 2,
            "num_samples": 4, "optimizer_sharding": "zero1",
        })
        ds = SyntheticRVOSDataset(num_samples=4, num_frames=2,
                                  frame_size=(48, 64))
        tok = build_tokenizer("roberta-tiny", text_bucket=12)

        def train_batches(epoch):
            for start in range(0, len(ds), 2):
                yield collate_batch([ds[start], ds[start + 1]], tok,
                                    size_buckets=SIZE, time_buckets=TIME)

        return Trainer(cfg, train_batches, steps_per_epoch=2)

    t1 = make(epochs=1)
    t1.train()

    t2 = make(epochs=2)
    first = next(iter(t2.train_batches(0)))
    t2.load_checkpoint(sample_batch=first)
    assert t2.epoch == 1
    n = int(t2.mesh.shape["data"])
    sharded = [l for l in jax.tree_util.tree_leaves(t2._state.opt_state)
               if hasattr(l, "sharding")
               and getattr(l.sharding, "spec", None)
               and "data" in tuple(l.sharding.spec)]
    assert sharded, "restored opt_state not re-placed in the ZeRO-1 layout"
    assert sharded[0].addressable_shards[0].data.size * n == sharded[0].size
    t2.train()  # the donated zero1 step consumes the restored state
    assert int(t2._state.step) == 4


def test_trainer_wires_zero1(tmp_path):
    """`optimizer_sharding: zero1` in the YAML config reaches the train
    state: after one trainer epoch the AdamW state lives sharded."""
    from neurips2023_soc_tpu.config import load_config
    from neurips2023_soc_tpu.data.collate import collate_batch
    from neurips2023_soc_tpu.training.trainer import Trainer

    if len(jax.devices()) < NDEV:
        pytest.skip(f"needs {NDEV} devices")
    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "epochs": 1, "output_dir": str(tmp_path), "batch_size": NDEV,
        "num_samples": NDEV, "optimizer_sharding": "zero1",
    })
    ds = SyntheticRVOSDataset(num_samples=NDEV, num_frames=2,
                              frame_size=(48, 64))
    tok = build_tokenizer("roberta-tiny", text_bucket=12)

    def train_batches(epoch):
        yield collate_batch([ds[i] for i in range(NDEV)], tok,
                            size_buckets=SIZE, time_buckets=TIME)

    trainer = Trainer(cfg, train_batches, steps_per_epoch=1)
    trainer.train()
    specs = [tuple(l.sharding.spec)
             for l in jax.tree_util.tree_leaves(trainer._state.opt_state)
             if hasattr(l, "sharding")
             and getattr(l.sharding, "spec", None) is not None]
    assert any("data" in s for s in specs)


def test_zero1_composes_with_grad_accum(setup):
    """grad_accum_steps=2 under the ZeRO-1 layout: the MultiSteps
    accumulator is a params-shaped opt-state pytree and gets sharded like
    mu/nu; non-final micro-steps leave params untouched; the second
    micro-step fires a finite update and params stay replicated."""
    mesh, model, params, _, batch = setup
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    tx = build_optimizer(
        params, lr=1e-3, lr_backbone=1e-4, text_encoder_lr=5e-5,
        clip_max_norm=0.1, freeze_text=True, grad_accum_steps=2,
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state = shard_opt_state(state, mesh)
    step = make_train_step(model, CriterionConfig(), donate=False,
                           zero1_mesh=mesh)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state.params)))
    assert moved
    # accumulator + mu/nu leaves live sharded; params replicated
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and "data" in tuple(spec):
            sharded += 1
    assert sharded > 20, sharded  # mu/nu AND acc_grads
    assert jax.tree_util.tree_leaves(state.params)[0].sharding.is_fully_replicated
