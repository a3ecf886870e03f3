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

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DataConfig
from ..ops.projection import project_scan
from .labels import TRAIN_CLASSES, raw_to_train
from .rangenet import RangeNet, labels_for_points, make_input, small_rangenet


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: RangeNet, rng, input_shape,
                       learning_rate: float = 1e-3,
                       weight_decay: float = 1e-4):
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
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
        self.variables = variables
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

    def save(self, path: str) -> None:
        import pickle
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.variables), f)

    @classmethod
    def load(cls, path: str, cfg: DataConfig, model: RangeNet | None = None,
             use_knn: bool = True) -> "Segmenter":
        import pickle
        with open(path, "rb") as f:
            variables = pickle.load(f)
        return cls(cfg, model=model, variables=variables, use_knn=use_knn)


def labels_from_projection(points, gt_labels, gt_probs, cfg: DataConfig):
    """Ground-truth label passthrough (SemanticKITTI .label files) shaped
    like the segmenter output — the train-free semantic source."""
    return (jnp.asarray(gt_labels, jnp.int32),
            jnp.asarray(gt_probs, jnp.float32))
