"""SemanticKITTI label table, colors, and movable-class tests.

TPU-native counterpart of ``/root/reference/src/shader/color_map.glsl`` and
the inlined tables in ``gen_vertexmap.vert:38-71``: label ids, BGR display
colors, and the set of movable (potentially dynamic) classes that receive
semantic penalties throughout the pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# label id -> (name, (B, G, R)) — SemanticKITTI raw ids
LABELS = {
    0: ("unlabeled", (0, 0, 0)),
    1: ("outlier", (0, 0, 255)),
    10: ("car", (245, 150, 100)),
    11: ("bicycle", (245, 230, 100)),
    13: ("bus", (250, 80, 100)),
    15: ("motorcycle", (150, 60, 30)),
    16: ("on-rails", (255, 0, 0)),
    18: ("truck", (180, 30, 80)),
    20: ("other-vehicle", (255, 0, 0)),
    30: ("person", (30, 30, 255)),
    31: ("bicyclist", (200, 40, 255)),
    32: ("motorcyclist", (90, 30, 150)),
    40: ("road", (255, 0, 255)),
    44: ("parking", (255, 150, 255)),
    48: ("sidewalk", (75, 0, 75)),
    49: ("other-ground", (75, 0, 175)),
    50: ("building", (0, 200, 255)),
    51: ("fence", (50, 120, 255)),
    52: ("other-structure", (0, 150, 255)),
    60: ("lane-marking", (170, 255, 150)),
    70: ("vegetation", (0, 175, 0)),
    71: ("trunk", (0, 60, 135)),
    72: ("terrain", (80, 240, 150)),
    80: ("pole", (150, 240, 255)),
    81: ("traffic-sign", (0, 0, 255)),
    99: ("other-object", (255, 255, 50)),
    252: ("moving-car", (245, 150, 100)),
    253: ("moving-person", (200, 40, 255)),
    254: ("moving-motorcyclist", (30, 30, 255)),
    255: ("moving-on-rails", (90, 30, 150)),
    256: ("moving-bicyclist", (255, 0, 0)),
    257: ("moving-bus", (250, 80, 100)),
    258: ("moving-truck", (180, 30, 80)),
    259: ("moving-other-vehicle", (255, 0, 0)),
}

# Movable classes penalized by the semantic pipeline: the 9 classes tested in
# Frame2Model_jacobians.geom:148-152, update_surfels.vert:189-193,
# gen_surfels.geom:135-139 and gen_vertexmap.vert:96-100.
MOVABLE_CLASSES = (10, 11, 13, 15, 18, 20, 30, 31, 32)

MAX_LABEL = 260

# The 20-class training label set used by RangeNet++ (learning id order).
TRAIN_CLASSES = (0, 10, 11, 15, 18, 20, 30, 31, 32, 40, 44, 48, 49, 50, 51,
                 70, 71, 72, 80, 81)


def _movable_lut() -> np.ndarray:
    lut = np.zeros((MAX_LABEL,), dtype=bool)
    for c in MOVABLE_CLASSES:
        lut[c] = True
    return lut


def _color_lut() -> np.ndarray:
    lut = np.zeros((MAX_LABEL, 3), dtype=np.uint8)
    for lid, (_, bgr) in LABELS.items():
        lut[lid] = bgr[::-1]  # store RGB
    return lut


# NOTE: keep lookup tables as HOST numpy arrays. A module-level jnp.asarray
# would allocate them on the default accelerator at import time, and every
# jit lowering that captures them as constants would then fetch them back
# from the device — pathologically slow through a remote-TPU tunnel.
# jnp.asarray(np_array) inside a traced function embeds a host constant.
_MOVABLE_LUT = _movable_lut()
_COLOR_LUT = _color_lut()

# train id <-> raw label lookup tables
_TRAIN_TO_RAW = np.array(TRAIN_CLASSES, dtype=np.int32)
_RAW_TO_TRAIN = np.zeros((MAX_LABEL,), dtype=np.int32)
for _i, _c in enumerate(TRAIN_CLASSES):
    _RAW_TO_TRAIN[_c] = _i
# moving classes map to their static counterparts for training
for _mov, _stat in ((252, 10), (253, 30), (254, 32), (255, 16), (256, 31),
                    (257, 13), (258, 18), (259, 20)):
    if _stat in TRAIN_CLASSES:
        _RAW_TO_TRAIN[_mov] = TRAIN_CLASSES.index(_stat)


# All movable class ids are < 64, so the membership test compiles to pure
# VPU arithmetic (two shifts + mask select) instead of a [N]-element LUT
# gather — TPU gathers are element-serialized and measure ~100x slower than
# elementwise ops at the 2^18-surfel operating point.
_MOVABLE_MASK_LO = 0  # bits 0..31
_MOVABLE_MASK_HI = 0  # bits 32..63
for _c in MOVABLE_CLASSES:
    if _c < 32:
        _MOVABLE_MASK_LO |= 1 << _c
    elif _c < 64:
        _MOVABLE_MASK_HI |= 1 << (_c - 32)
    else:  # pragma: no cover - all current movable ids are < 64
        raise AssertionError("movable class id >= 64 needs the LUT path")


def is_movable(labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise movable-class test (branch-free bitmask, no gather)."""
    li = labels.astype(jnp.uint32)
    bit = li & jnp.uint32(31)
    lo = (jnp.uint32(_MOVABLE_MASK_LO) >> bit) & jnp.uint32(1)
    hi = (jnp.uint32(_MOVABLE_MASK_HI) >> bit) & jnp.uint32(1)
    word = li >> jnp.uint32(5)
    sel = jnp.where(word == 0, lo, jnp.where(word == 1, hi, jnp.uint32(0)))
    return sel > 0


def label_colors(labels: np.ndarray) -> np.ndarray:
    """RGB uint8 colors for display/export."""
    return _COLOR_LUT[np.clip(np.asarray(labels, dtype=np.int64), 0, MAX_LABEL - 1)]


def raw_to_train(labels) -> jnp.ndarray:
    idx = jnp.clip(jnp.asarray(labels, jnp.int32), 0, MAX_LABEL - 1)
    return jnp.asarray(_RAW_TO_TRAIN)[idx]


def train_to_raw(train_ids) -> jnp.ndarray:
    idx = jnp.clip(jnp.asarray(train_ids, jnp.int32), 0, len(TRAIN_CLASSES) - 1)
    return jnp.asarray(_TRAIN_TO_RAW)[idx]
