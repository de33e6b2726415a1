"""Data-parallel training through the PRODUCT path.

The reference's default training wrap is DistributedDataParallel declared in
config (`/root/reference/configs/ilsvrc2012/supervised_compression/
entropic_student/splitable_resnet50-fp-beta0.08_from_resnet50.yaml:130,140`,
applied by torchdistill's box; `init_distributed_mode` at
`/root/reference/script/task/image_classification.py:202`). Here the same
contract is: engine builds a 1-D data mesh, the box replicates train state
and shards every batch over 'data', the loader shards the dataset per
process, and `-adjust_lr` scales lr by world size
(`image_classification.py:47-48,152`). These tests assert the 8-device
engine/box runs match single-device trajectories at equal global batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc2bench_tpu.datasets.image import DataLoader, build_dataset
from sc2bench_tpu.models.backbone import SplittableResNet
from sc2bench_tpu.models.layer import FPBasedResNetBottleneck
from sc2bench_tpu.models.resnet import ResNet
from sc2bench_tpu.parallel.mesh import get_mesh
from sc2bench_tpu.train.box import DistillationBox
from sc2bench_tpu.train.engine import scale_stage_lrs


def _range_dataset(n):
    class _DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), i
    return _DS()


def test_loader_process_sharding_disjoint_cover():
    """Shards are disjoint, equally sized (padded by wrapping, the
    DistributedSampler contract) and together cover the dataset."""
    ds = _range_dataset(10)
    seen = []
    lens = []
    for shard in range(3):
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                            num_shards=3, shard_index=shard, prefetch=False)
        ys = [int(y) for _, yb in loader for y in yb]
        lens.append(len(ys))
        seen.extend(ys)
    assert lens == [4, 4, 4]  # ceil(10/3)=4 each, padded to 12
    assert set(seen) == set(range(10))  # full coverage
    # disjoint up to the 2 wrap-padded duplicates
    assert len(seen) - len(set(seen)) == 2


def test_loader_shards_share_global_shuffle():
    """Every process must shuffle with the same seed+epoch, else shards
    overlap. Two loaders with the same seed partition one permutation."""
    ds = _range_dataset(8)
    a = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_shards=2,
                   shard_index=0, prefetch=False)
    b = DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_shards=2,
                   shard_index=1, prefetch=False)
    ya = [int(y) for _, yb in a for y in yb]
    yb_ = [int(y) for _, yb in b for y in yb]
    assert sorted(ya + yb_) == list(range(8))


def test_adjust_lr_scales_by_world_size():
    stages = [{'name': 's1', 'optimizer': {'key': 'SGD',
                                           'kwargs': {'lr': 0.01}}}]
    mesh = get_mesh(8)
    scaled = scale_stage_lrs(stages, mesh)
    assert scaled[0]['optimizer']['kwargs']['lr'] == pytest.approx(0.08)
    # input untouched (configs share subtrees)
    assert stages[0]['optimizer']['kwargs']['lr'] == pytest.approx(0.01)
    assert scale_stage_lrs(stages, None) is stages


def _tiny_models():
    teacher = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=10)
    student = SplittableResNet(
        bottleneck_layer=FPBasedResNetBottleneck(num_bottleneck_channels=8),
        stage_sizes=(1, 1, 1, 1), num_classes=10)
    return teacher, student


def _init_vars(module, x, seed, **kw):
    v = jax.jit(lambda r, x: module.init(r, x, **kw))(
        {'params': jax.random.key(seed), 'noise': jax.random.key(seed + 1)},
        x)
    return {'params': v['params'], 'batch_stats': v.get('batch_stats', {})}


_STAGE = {
    'num_epochs': 1, 'train_bn': False,
    'frozen_modules': ['layer2', 'layer3', 'layer4', 'fc'],
    'optimizer': {'key': 'Adam', 'kwargs': {'lr': 1e-3}},
    'criterion': {'key': 'WeightedSumLoss', 'kwargs': {'sub_terms': {
        'layer1': {'criterion': {'key': 'MSELoss', 'kwargs': {
            'student_module_path': 'bottleneck_layer_out',
            'teacher_module_path': 'layer1_out'}}, 'weight': 1.0},
        'bpp': {'criterion': {'key': 'BppLoss', 'kwargs': {
            'entropy_module_path': 'bottleneck_layer.eb_out',
            'reduction': 'batchmean'}}, 'weight': 0.08}}}},
}


@pytest.mark.slow
def test_box_dp_trajectory_matches_single_device():
    """The SAME DistillationBox code on an 8-device mesh must follow the
    single-device loss trajectory at equal global batch: identical data,
    RNG keys, and optimizer — only the partitioning differs."""
    assert jax.device_count() >= 8
    x8 = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (8, 16, 16, 3)).astype(np.float32))
    y8 = jnp.arange(8) % 10
    losses = {}
    for name, mesh in (('single', get_mesh(1)), ('dp8', get_mesh(8))):
        teacher, student = _tiny_models()
        t_vars = _init_vars(teacher, x8, 0, train=False)
        s_vars = _init_vars(student, x8, 2, mode='train')
        box = DistillationBox(student, s_vars, dict(_STAGE),
                              teacher_module=teacher,
                              teacher_variables=t_vars, mesh=mesh)
        traj = []
        for step in range(4):
            metrics = box.train_step(x8, y8, jax.random.key(100 + step))
            traj.append(float(sum(jax.tree.leaves(metrics['loss']))))
        losses[name] = traj
    np.testing.assert_allclose(losses['dp8'], losses['single'],
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_engine_dp_train_matches_single_device():
    """Engine-driven: `ClassificationEngine.train` over the 8-device mesh
    ends at (numerically) the same student parameters as the single-device
    run with the same seed and global batch — the product-path DDP-parity
    statement (VERDICT r2 item 1)."""
    import __graft_entry__ as graft
    assert jax.device_count() >= 8
    from sc2bench_tpu.train.engine import ClassificationEngine
    finals = {}
    for name, mesh in (('single', None), ('dp8', get_mesh(8))):
        config = graft.tiny_entropic_student_config(8)
        # equal GLOBAL batch on both sides -> lr must not be world-scaled
        # (adjust_lr exists for the per-process-batch convention)
        config.pop('adjust_lr', None)
        engine = ClassificationEngine(config, image_size=(32, 32), seed=0,
                                      mesh=mesh)
        best = engine.train()
        assert np.isfinite(best)
        finals[name] = jax.device_get(engine.student_variables['params'])
    flat_s = jax.tree.leaves(finals['single'])
    flat_d = jax.tree.leaves(finals['dp8'])
    assert len(flat_s) == len(flat_d)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
