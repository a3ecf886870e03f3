"""Segmenter training/inference harness.

The reference loads a frozen TensorRT engine (``RangenetAPI.cpp:13-17``) and
has no training capability; here the segmenter is a first-class trainable
model co-resident with the SLAM engine on the same chips:

* ``TrainState`` + ``train_step``: weighted softmax cross-entropy over
  range-image pixels (ignoring unlabeled), AdamW, bf16 forward / f32 master
  params, jit- and pjit-compatible (the batch axis shards over the device
  mesh's ``data`` axis; see ``parallel/sharding.py``).
* ``Segmenter``: inference facade producing the per-point
  ``(label, probability)`` interface the pipeline consumes
  (``KITTIReader.cpp:183-200``).
"""

from __future__ import annotations


from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DataConfig
from ..ops.projection import project_scan
from .labels import raw_to_train
from .rangenet import RangeNet, labels_for_points, make_input, small_rangenet


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: RangeNet, rng, input_shape,
                       learning_rate=1e-3,
                       weight_decay: float = 1e-4,
                       total_steps: int | None = None):
    """``learning_rate`` may be a float or an optax schedule; passing
    ``total_steps`` builds a linear-warmup + cosine-decay schedule."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if total_steps is not None and not callable(learning_rate):
        learning_rate = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.1, peak_value=learning_rate,
            warmup_steps=max(1, total_steps // 20),
            decay_steps=total_steps, end_value=learning_rate * 0.01)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return tx, TrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


def loss_fn(params, batch_stats, model, images, labels, valid,
            class_weights=None, train=True):
    """Pixel-weighted cross entropy; labels are train-class ids, ``valid``
    masks unlabeled/invalid pixels."""
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats}, images, train=train,
        mutable=["batch_stats"] if train else [])
    logits = out
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        w = w * class_weights[labels]
    loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
    acc = jnp.sum((jnp.argmax(logits, -1) == labels) * valid) / \
        jnp.maximum(jnp.sum(valid), 1)
    new_stats = mutated.get("batch_stats", batch_stats) if train else batch_stats
    return loss, (acc, new_stats)


def make_train_step(model: RangeNet, tx, class_weights=None):
    """Returns a jittable (state, images, labels, valid) -> (state, metrics)."""

    def train_step(state: TrainState, images, labels, valid):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (acc, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, model, images, labels, valid,
            class_weights, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_stats, new_opt, state.step + 1),
                {"loss": loss, "accuracy": acc})

    return train_step


class Segmenter:
    """Inference facade: scan points -> (raw labels, probabilities).

    Drop-in label source for the SLAM pipeline, playing the role of
    ``RangenetAPI::infer`` + the argmax in ``KITTIReader::read``.
    """

    def __init__(self, cfg: DataConfig, model: RangeNet | None = None,
                 variables=None, rng_seed: int = 0, use_knn: bool = True):
        self.cfg = cfg
        self.model = model or small_rangenet()
        if variables is None:
            h, w = cfg.height, cfg.width
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, h, w, 5), jnp.float32), train=False)
        # stage the weights ON DEVICE once: passing host-numpy leaves to
        # the jitted call re-uploads the whole pytree (~9 MB for the mid
        # net) EVERY scan — measured 1.2 scans/s through the remote
        # tunnel vs ~90 with device-resident weights
        self.variables = jax.tree.map(jnp.asarray, variables)
        self.use_knn = use_knn
        self._infer = jax.jit(self._infer_impl)

    def _infer_impl(self, points, remissions, variables):
        res = project_scan(points, remissions=remissions, cfg=self.cfg)
        net_in = make_input(res.vertex_map, res.depth_map, res.remission,
                            res.vertex_valid)[None]
        logits = self.model.apply(variables, net_in, train=False)[0]
        depth = jnp.linalg.norm(points, axis=-1)
        valid = res.point_px >= 0
        labels, probs = labels_for_points(
            logits, jnp.maximum(res.point_px, 0), jnp.maximum(res.point_py, 0),
            depth, valid, res.depth_map, use_knn=self.use_knn)
        return labels, probs

    def __call__(self, points, remissions=None):
        n = points.shape[0]
        if remissions is None:
            remissions = jnp.zeros((n,), jnp.float32)
        return self._infer(jnp.asarray(points), jnp.asarray(remissions),
                           self.variables)

    def save(self, path: str, half: bool = True) -> None:
        """Pickle the variables; ``half`` stores float32 leaves as float16
        (inference computes in bfloat16 anyway — f16's 10-bit mantissa is
        above the compute precision — and the checkpoint halves, keeping
        repo-versioned weights small). The model config rides along so
        ``load`` needs no architecture argument."""
        import pickle

        def shrink(a):
            a = np.asarray(a)
            return a.astype(np.float16) if a.dtype == np.float32 else a

        blob = {
            "variables": jax.tree.map(shrink if half else np.asarray,
                                      self.variables),
            "model": {"num_classes": self.model.num_classes,
                      "stage_blocks": tuple(self.model.stage_blocks),
                      "widths": tuple(self.model.widths)},
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    @classmethod
    def load(cls, path: str, cfg: DataConfig, model: RangeNet | None = None,
             use_knn: bool = True) -> "Segmenter":
        import pickle
        with open(path, "rb") as f:
            blob = pickle.load(f)
        if isinstance(blob, dict) and "variables" in blob:
            variables = blob["variables"]
            if model is None:
                m = blob["model"]
                model = RangeNet(num_classes=m["num_classes"],
                                 stage_blocks=tuple(m["stage_blocks"]),
                                 widths=tuple(m["widths"]))
        else:  # legacy format: bare variables pytree
            variables = blob
        variables = jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if getattr(a, "dtype", None) == np.float16 else a, variables)
        return cls(cfg, model=model, variables=variables, use_knn=use_knn)


def labels_from_projection(points, gt_labels, gt_probs, cfg: DataConfig):
    """Ground-truth label passthrough (SemanticKITTI .label files) shaped
    like the segmenter output — the train-free semantic source."""
    return (jnp.asarray(gt_labels, jnp.int32),
            jnp.asarray(gt_probs, jnp.float32))


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def confusion_matrix(pred, gt, valid, num_classes: int) -> np.ndarray:
    """[C, C] confusion counts over valid pixels (rows = gt, cols = pred)."""
    pred = np.asarray(pred).reshape(-1)
    gt = np.asarray(gt).reshape(-1)
    valid = np.asarray(valid).reshape(-1)
    pred = pred[valid]
    gt = gt[valid]
    idx = gt * num_classes + pred
    return np.bincount(idx, minlength=num_classes * num_classes).reshape(
        num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray):
    """(mIoU over classes present in GT, per-class IoU dict)."""
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    present = (tp + fn) > 0
    iou = tp / np.maximum(tp + fp + fn, 1.0)
    per_class = {int(c): float(iou[c]) for c in np.nonzero(present)[0]}
    m = float(iou[present].mean()) if present.any() else 0.0
    return m, per_class


def class_weights_from_freq(labels, valid, num_classes: int) -> np.ndarray:
    """RangeNet++-style inverse-log-frequency class weights
    w_c = 1 / ln(1.02 + freq_c)."""
    lab = np.asarray(labels).reshape(-1)[np.asarray(valid).reshape(-1)]
    counts = np.bincount(lab, minlength=num_classes).astype(np.float64)
    freq = counts / max(counts.sum(), 1.0)
    w = 1.0 / np.log(1.02 + freq)
    return (w / w.mean()).astype(np.float32)


# ---------------------------------------------------------------------------
# synthetic-world training (the data-free path to a REAL segmenter: the
# reference assumes a pre-trained TensorRT engine; here the engine can be
# trained from scratch on the raycast world and validated by mIoU)
# ---------------------------------------------------------------------------

def synthetic_dataset(cfg: DataConfig, n_scans: int, seed: int = 0,
                      movable_fraction: float = 0.3,
                      noise_sigma: float = 0.03):
    """Range images + train-class labels from the synthetic raycast world.

    Poses sample several ring radii and headings so the network sees varied
    box/ground geometry. Returns (images [N,H,W,5], labels [N,H,W] int32
    train ids, valid [N,H,W] bool) as numpy arrays.
    """
    from ..io.simulation import default_world

    world = default_world(seed=seed, movable_fraction=movable_fraction)
    rng = np.random.default_rng(seed)
    radii = rng.uniform(10.0, 26.0, size=n_scans)
    angles = rng.uniform(0, 2 * np.pi, size=n_scans)

    proj = jax.jit(lambda pose, key: _render_project(world, pose, cfg, key,
                                                     noise_sigma))
    key = jax.random.PRNGKey(seed)
    imgs, labs, vals = [], [], []
    for i in range(n_scans):
        r, a = radii[i], angles[i]
        cy, sy = np.cos(a + np.pi / 2), np.sin(a + np.pi / 2)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        pose[:3, 3] = [r * np.cos(a), r * np.sin(a), 0.0]
        img, lab, val = proj(jnp.asarray(pose), jax.random.fold_in(key, i))
        imgs.append(np.asarray(img))
        labs.append(np.asarray(lab))
        vals.append(np.asarray(val))
    return np.stack(imgs), np.stack(labs), np.stack(vals)


def _render_project(world, pose, cfg: DataConfig, key, noise_sigma):
    from ..io.simulation import render_scan
    from .rangenet import make_input

    scan = render_scan(world, pose, cfg, noise_sigma=noise_sigma, key=key)
    res = project_scan(scan.points, scan.labels, scan.probs,
                       cfg=cfg, point_valid=scan.valid)
    img = make_input(res.vertex_map, res.depth_map, res.remission,
                     res.vertex_valid)
    lab = raw_to_train(res.sem_label)
    valid = res.vertex_valid & (res.sem_label > 0)
    return img, lab, valid


def evaluate_miou(seg: Segmenter, images, labels, valid, batch: int = 4):
    """mIoU of a Segmenter over a stack of range images (train-class ids)."""
    n_cls = seg.model.num_classes

    @jax.jit
    def fwd(imgs):
        logits = seg.model.apply(seg.variables, imgs, train=False)
        return jnp.argmax(logits, axis=-1)

    cm = np.zeros((n_cls, n_cls), np.int64)
    for lo in range(0, images.shape[0], batch):
        pred = fwd(jnp.asarray(images[lo:lo + batch]))
        cm += confusion_matrix(pred, labels[lo:lo + batch],
                               valid[lo:lo + batch], n_cls)
    return miou_from_confusion(cm)


def train_synthetic(cfg: DataConfig, *, n_train: int = 48, n_val: int = 8,
                    steps: int = 300, batch: int = 4, lr: float = 2e-3,
                    seed: int = 0, model: RangeNet | None = None,
                    movable_fraction: float = 0.3, log=None):
    """Train a segmenter on the synthetic world; returns (Segmenter, mIoU).

    This is the data-free 'make the segmenter real' path: train, hold out
    scans, and measure mIoU — the quality contract the reference delegates
    to an externally trained TensorRT engine.
    """
    log = log or (lambda *a: None)
    model = model or small_rangenet()
    imgs, labs, vals = synthetic_dataset(cfg, n_train + n_val, seed=seed,
                                         movable_fraction=movable_fraction)
    tr_i, tr_l, tr_v = imgs[:n_train], labs[:n_train], vals[:n_train]
    va_i, va_l, va_v = imgs[n_train:], labs[n_train:], vals[n_train:]

    cw = jnp.asarray(class_weights_from_freq(tr_l, tr_v, model.num_classes))
    tx, state = create_train_state(
        model, jax.random.PRNGKey(seed),
        (batch, cfg.height, cfg.width, 5), learning_rate=lr,
        total_steps=steps)
    step_fn = jax.jit(make_train_step(model, tx, class_weights=cw))

    # pre-stage the training set ON DEVICE once: indexing host arrays per
    # step re-uploads the batch every iteration (~4.6 MB/step — hundreds
    # of ms through a remote link); a device-side gather is async and free
    tr_i_d, tr_l_d, tr_v_d = (jnp.asarray(tr_i), jnp.asarray(tr_l),
                              jnp.asarray(tr_v))
    rng = np.random.default_rng(seed)
    for it in range(steps):
        sel = jnp.asarray(rng.integers(0, n_train, size=batch))
        state, m = step_fn(state, tr_i_d[sel], tr_l_d[sel], tr_v_d[sel])
        if it % 50 == 0 or it == steps - 1:
            log(f"step {it}: loss={float(m['loss']):.3f} "
                f"acc={float(m['accuracy']):.3f}")

    seg = Segmenter(cfg, model=model,
                    variables={"params": state.params,
                               "batch_stats": state.batch_stats})
    m, per_class = evaluate_miou(seg, va_i, va_l, va_v)
    log(f"val mIoU = {m:.3f}  per-class={per_class}")
    return seg, m


def kitti_dataset(reader, cfg: DataConfig, indices):
    """Project a set of reader scans into (images, train-labels, valid)
    stacks — the KITTI analogue of :func:`synthetic_dataset`."""
    from .rangenet import make_input

    proj = jax.jit(lambda p, l, r: project_scan(p, l, remissions=r, cfg=cfg))
    imgs, labs, vals = [], [], []
    for j in indices:
        scan = reader.read(int(j))
        res = proj(jnp.asarray(scan.points), jnp.asarray(scan.labels),
                   jnp.asarray(scan.remissions))
        imgs.append(np.asarray(make_input(res.vertex_map, res.depth_map,
                                          res.remission, res.vertex_valid)))
        labs.append(np.asarray(raw_to_train(res.sem_label)))
        vals.append(np.asarray(res.vertex_valid & (res.sem_label > 0)))
    return np.stack(imgs), np.stack(labs), np.stack(vals)


def train_kitti(reader, cfg: DataConfig, *, epochs: int = 1, batch: int = 4,
                lr: float = 1e-3, seed: int = 0,
                model: RangeNet | None = None, val_fraction: float = 0.1,
                log=None):
    """Train a segmenter on SemanticKITTI .label supervision with the same
    quality contract as :func:`train_synthetic`: a held-out split, inverse-
    log-frequency class weights, a warmup+cosine schedule, and a final
    held-out mIoU. Returns (Segmenter, mIoU).

    The reference delegates this entirely to an externally trained TensorRT
    engine (RangenetAPI.cpp:13-17); this is the native training path.
    """
    log = log or (lambda *a: None)
    model = model or small_rangenet()
    n = reader.count()
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_val = max(1, int(round(n * val_fraction)))
    val_idx, train_idx = order[:n_val], order[n_val:]
    if len(train_idx) < batch:
        raise ValueError(f"need >= {batch + 1} scans, got {n}")

    # class weights from a sample of the training labels
    sample = train_idx[:min(len(train_idx), 32)]
    s_i, s_l, s_v = kitti_dataset(reader, cfg, sample)
    cw = jnp.asarray(class_weights_from_freq(s_l, s_v, model.num_classes))

    steps_per_epoch = len(train_idx) // batch
    total = max(1, epochs * steps_per_epoch)
    tx, state = create_train_state(
        model, jax.random.PRNGKey(seed), (batch, cfg.height, cfg.width, 5),
        learning_rate=lr, total_steps=total)
    step_fn = jax.jit(make_train_step(model, tx, class_weights=cw))

    cache = {int(j): (s_i[k], s_l[k], s_v[k]) for k, j in enumerate(sample)}

    def fetch(j):
        j = int(j)
        if j not in cache:
            i_, l_, v_ = kitti_dataset(reader, cfg, [j])
            cache[j] = (i_[0], l_[0], v_[0])
        return cache[j]

    for epoch in range(epochs):
        ep_order = rng.permutation(train_idx)
        for bi in range(steps_per_epoch):
            rows = [fetch(j) for j in ep_order[bi * batch:(bi + 1) * batch]]
            state, m = step_fn(
                state, jnp.asarray(np.stack([r[0] for r in rows])),
                jnp.asarray(np.stack([r[1] for r in rows])),
                jnp.asarray(np.stack([r[2] for r in rows])))
            if bi % 10 == 0:
                log(f"epoch {epoch} step {bi}/{steps_per_epoch}: "
                    f"loss={float(m['loss']):.3f} "
                    f"acc={float(m['accuracy']):.3f}")

    seg = Segmenter(cfg, model=model,
                    variables={"params": state.params,
                               "batch_stats": state.batch_stats})
    va_i, va_l, va_v = kitti_dataset(reader, cfg, val_idx)
    m, per_class = evaluate_miou(seg, va_i, va_l, va_v)
    log(f"val mIoU = {m:.3f}  per-class={per_class}")
    return seg, m
