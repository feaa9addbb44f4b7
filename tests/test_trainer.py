"""Trainer loop + checkpoint round-trip smoke tests (CPU, tiny shapes)."""
import numpy as np
import jax
import pytest

from superpoints_registration_tpu.data.loader import DataLoader, get_dataloader
from superpoints_registration_tpu.data.synthetic import SyntheticPairDataset
from superpoints_registration_tpu.models import build_model
from superpoints_registration_tpu.train.trainer import Trainer
from superpoints_registration_tpu.train.optim import make_optimizer, make_schedule
from superpoints_registration_tpu.parallel.train_step import TrainState
from superpoints_registration_tpu.train.checkpoint import CheckpointManager

from test_model import tiny_config


def small_loader(n=16, batch=8, budget=128, seed=0):
    ds = SyntheticPairDataset(size=n, n_points=128, seed=seed, overlap_radius=0.06)
    return DataLoader(ds, batch, budget, shuffle=True, seed=seed)


class TestSchedules:
    def test_step_schedule(self):
        from superpoints_registration_tpu.config import Config
        cfg = Config(base_lr=1e-3, scheduler='step', scheduler_param=[100, 0.5])
        s = make_schedule(cfg)
        assert np.isclose(s(0), 1e-3)
        assert np.isclose(s(100), 5e-4)
        assert np.isclose(s(250), 2.5e-4)

    def test_warmup_schedule(self):
        from superpoints_registration_tpu.config import Config
        cfg = Config(base_lr=1e-3, scheduler='warmup',
                     scheduler_param=[10, 100, 0.5])
        s = make_schedule(cfg)
        assert float(s(0)) == 0.0
        assert np.isclose(float(s(5)), 5e-4)
        assert np.isclose(float(s(10)), 1e-3)
        assert np.isclose(float(s(110)), 5e-4, rtol=1e-3)  # decays 0.5x per 100


class TestTrainerFit:
    def test_fit_reduces_loss_and_checkpoints(self, tmp_path):
        cfg = tiny_config()
        cfg.train_batch_size = 8
        cfg.base_lr = 3e-4
        model = build_model('regtr.RegTR', cfg)
        trainer = Trainer(cfg, tmp_path, niter=8, validate_every=4,
                          nb_sanity_val_steps=1, summary_every=4)
        train_loader = small_loader()
        val_loader = small_loader(n=8, seed=99)
        state = trainer.fit(model, train_loader, val_loader)
        assert int(state.step) == 8
        # A checkpoint must exist and restore.
        mgr = trainer.saver
        assert mgr.latest_step() is not None
        template = jax.tree_util.tree_map(np.zeros_like,
                                          jax.device_get(state))
        restored, step = CheckpointManager(tmp_path / 'ckpt').restore(template)
        assert step == mgr.latest_step()
        # Restored params match final state.
        a = jax.tree_util.tree_leaves(restored.params)
        b = jax.tree_util.tree_leaves(jax.device_get(state.params))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_warm_start_resolution(self, tmp_path):
        """resolve_warm_start: (a) manager root passes through, (b) a step
        dir holding a checkpoint is split into (root, step), (c) an
        ALL-DIGIT directory that is itself a manager root — the
        advisor-flagged case where a bare name.isdigit() heuristic would
        silently restore from the parent — passes through unchanged."""
        from superpoints_registration_tpu.train.trainer import resolve_warm_start

        root = tmp_path / 'ckpt'
        step_dir = root / '4000'
        step_dir.mkdir(parents=True)
        (step_dir / '_CHECKPOINT_METADATA').write_text('{}')
        assert resolve_warm_start(root) == (root, None)
        assert resolve_warm_start(step_dir) == (root, 4000)
        # All-digit dir WITHOUT checkpoint metadata = a manager root (e.g. a
        # date-named run dir logs/20260820), not a step to strip.
        digit_root = tmp_path / '20260820'
        (digit_root / '1000').mkdir(parents=True)
        (digit_root / '1000' / '_CHECKPOINT_METADATA').write_text('{}')
        assert resolve_warm_start(digit_root) == (digit_root, None)
        assert resolve_warm_start(digit_root / '1000') == (digit_root, 1000)


class TestLoader:
    def test_deterministic_epoch_order(self):
        l1 = small_loader()
        l1.set_epoch(3)
        b1 = [b['pose'] for b in l1]
        l2 = small_loader()
        l2.set_epoch(3)
        b2 = [b['pose'] for b in l2]
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x, y)

    def test_sharded_loader_partitions(self):
        full = small_loader(n=16, batch=2)
        s0 = small_loader(n=16, batch=2)
        s0.num_shards, s0.shard_index = 2, 0
        s1 = small_loader(n=16, batch=2)
        s1.num_shards, s1.shard_index = 2, 1
        assert len(s0) == len(s1) == len(full) // 2

    def test_get_dataloader_synthetic(self):
        from superpoints_registration_tpu.config import Config
        cfg = Config(dataset='synthetic', train_batch_size=2, num_points=64,
                     level_budgets=[128, 64], dataset_size=4)
        loader = get_dataloader(cfg, 'train')
        batch = next(iter(loader))
        assert batch['src_points'].shape == (2, 128, 3)


class TestReferenceConfigCompat:
    def test_reference_yaml_keys_and_model_name_resolve(self, tmp_path):
        """A reference-style YAML (same sections/keys/model name as
        src/conf/qk_regtr_full_3dmatch.yaml) must load and build with only
        the TPU budget keys added."""
        yaml_text = '''
general:
    expt_name: qk_regtr_full_3dmatch
dataset:
    dataset: 3dmatch
    root: data/indoor
    train_batch_size: 2
    overlap_radius: 0.0375
solver:
    optimizer: AdamW
    base_lr: 0.0001
kpconv_options:
    num_layers: 3
    neighborhood_limits: [10, 10, 10]
    aggregation_mode: sum
    first_subsampling_dl: 0.06
    first_feats_dim: 32
    fixed_kernel_points: center
    in_feats_dim: 1
    in_points_dim: 3
    conv_radius: 2.5
    KP_extent: 2.0
    KP_influence: linear
    use_batch_norm: True
    num_kernel_points: 15
    architecture: [simple, resnetb, resnetb_strided, resnetb]
model:
    model: qk_regtr_full.RegTR
    use_sinkhorn: True
    sinkhorn_itr: 3
    slack: True
    nhead: 4
    d_embed: 64
    d_feedforward: 128
    dropout: 0.0
    pre_norm: True
    transformer_act: relu
    num_encoder_layers: 1
    transformer_encoder_has_pos_emb: True
    sa_val_has_pos_emb: True
    ca_val_has_pos_emb: True
    pos_emb_type: sine
losses:
    wt_overlap: 1.0
    wt_feature: 0.1
    r_p: 0.2
    r_n: 0.4
    feature_loss_on: [0]
    feature_loss_type: infonce
'''
        from test_model import make_batch
        import jax.numpy as jnp
        p = tmp_path / 'ref.yaml'
        p.write_text(yaml_text)
        from superpoints_registration_tpu.config import load_config
        cfg = load_config(p)
        assert cfg.model == 'qk_regtr_full.RegTR'
        cfg.level_budgets = [128, 64]
        model = build_model(cfg.model, cfg)
        batch = {k: jnp.asarray(v) for k, v in
                 make_batch(n_pairs=2, n_points=100, budget=128).items()}
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        out = jax.jit(lambda p, b: model.apply(p, b, compute_loss=False))(
            params, batch)
        assert out['pose'].shape == (2, 3, 4)
