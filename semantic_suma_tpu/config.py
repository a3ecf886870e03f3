"""Typed configuration system for the TPU-native surfel SLAM engine.

Replaces the reference's XML -> ``rv::ParameterList`` heterogenous store
(``/root/reference/src/rv/ParameterList.h``, ``/root/reference/config/default.xml``)
with frozen dataclasses that are hashable (usable as jit static args) plus an
XML loader that accepts the reference's config file format for drop-in parity.

Defaults mirror ``/root/reference/config/default.xml:1-86``.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field, replace
from typing import Any, Dict, Iterator, List, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Sensor / range-image geometry (reference ``config/default.xml:7-14``)."""

    width: int = 900
    height: int = 64
    fov_up: float = 3.0      # degrees above horizon
    fov_down: float = -25.0  # degrees below horizon (negative)
    min_depth: float = 2.0
    max_depth: float = 75.0

    @property
    def fov(self) -> float:
        return abs(self.fov_up) + abs(self.fov_down)

    @property
    def pixel_size(self) -> float:
        # vertical angular extent of one pixel in radians; used for surfel radii
        # (reference SurfelMap.cpp computes the same from fov/height).
        return math.radians(self.fov) / self.height


@dataclass(frozen=True)
class IcpConfig:
    """Projective ICP settings (reference ``config/default.xml:15-27``)."""

    max_iterations: int = 33
    stopping_threshold: float = 1e-4  # gradient / error-change epsilon
    delta: float = 1e-4               # minimal parameter change
    max_distance: float = 2.0         # gross-outlier distance gate (m)
    max_angle: float = 30.0           # normal-compatibility gate (deg)
    weighting: str = "huber"          # none | huber | turkey
    factor: float = 0.5               # robust kernel width
    # model-map sampling: "nearest" matches the reference (its frame textures
    # are GL_NEAREST, Frame.h:37-44) and halves the ICP gather cost;
    # "bilinear" smooths the objective at 4x the taps
    sampling: str = "nearest"
    initialize_identity: bool = False  # else constant-velocity init
    # NOTE: the reference's ``cutoff_threshold`` parameter is intentionally
    # absent: it is parsed (default.xml:21) but read by no shader or C++
    # code — dead in the reference too, so it is not carried here.
    # track-loss fallback (frame-to-frame recovery), reference default.xml:42-44
    fallback_mode: bool = True
    fallback_max_distance: float = 0.5
    fallback_max_angle: float = 30.0
    # thresholds on the pose-increment jump that triggers recovery
    # (reference SurfelMapping.cpp:438-449)
    fallback_translation_jump: float = 0.4
    fallback_rotation_jump: float = 0.1


@dataclass(frozen=True)
class MapConfig:
    """Surfel map / fusion settings (reference ``config/default.xml:50-67``)."""

    surfel_capacity: int = 1 << 22      # reference: 2048^2 (SurfelMap.h:87)
    active_capacity: int = 1 << 19      # surfels rendered/updated per scan
    max_poses: int = 10000              # pose texture size (SurfelMap.h:205)
    # paging granularity: the global store is an arena of fixed-size blocks
    # (the TPU analogue of the reference's 20m submap tiles,
    # SurfelMap.cpp:744-824); the active view pages whole blocks in/out with
    # contiguous copies instead of per-row gather/scatter
    block_size: int = 2048
    # minimum rows in the view's fresh (creation) region; SumaConfig sets
    # this to one full range image automatically
    min_fresh_rows: int = 0
    min_radius: float = 0.03
    max_radius: float = 1.00
    max_angle: float = 90.0             # creation view-angle gate (deg)
    max_distance: float = 0.2           # association distance-to-plane gate (m)
    map_max_angle: float = 45.0         # association normal-angle gate (deg)
    unstable_age: int = 3
    confidence_mode: int = 3            # 0 none, 1 angle, 2 distance, 3 both
    confidence_threshold: float = 0.0
    p_stable: float = 0.6
    p_prior: float = 0.5
    p_unstable: float = 0.1             # hard-coded in SurfelMapping.cpp:108
    sigma_angle: float = 1.0
    sigma_distance: float = 1.0
    use_stability: bool = True
    update_always: bool = False
    weighting_scheme: int = 0           # 0 exponential, 1 cumulative, 2 weighted
    averaging_scheme: int = 0
    max_weight: float = 20.0
    stability_upper_bound: float = 20.0  # update_surfels.vert:142 constant
    # submap window (reference default.xml:65-67); the active-set radius is
    # (2*dimension+1)*extent/2 around the vehicle.
    submap_dimension: int = 4
    submap_extent: float = 10.0
    # confidence-threshold warmup length (SurfelMapping.h time_init)
    time_init: int = 30
    # host-RAM spill (the reference's CPU SubmapCache, SurfelMap.cpp:744-824):
    # when the arena nears exhaustion, far blocks page out to host memory and
    # page back in on revisit, making map scale unbounded
    spill_enabled: bool = True
    spill_chunk_blocks: int = 8         # whole blocks per spill chunk
    spill_margin: float = 25.0          # keep blocks within radius+margin
    unspill_margin: float = 25.0        # page back within radius+margin
    # splat resolve window radius for model rendering: 1 = 3x3 (covers the
    # creation-time footprint, <=1.41 px), 2 = 5x5 (covers near-field
    # revisits where old surfels are seen much closer than created;
    # reference render_surfels.geom:101-123 rasterizes true quads)
    splat_resolve_radius: int = 1

    @property
    def log_prior(self) -> float:
        return math.log(self.p_prior / (1.0 - self.p_prior))

    @property
    def log_unstable(self) -> float:
        return math.log(self.p_unstable / (1.0 - self.p_unstable))

    @property
    def active_radius(self) -> float:
        return (2 * self.submap_dimension + 1) * self.submap_extent / 2.0

    @property
    def effective_block_size(self) -> int:
        """Block size adapted so the active view holds >= 16 blocks and both
        capacities divide evenly (capacities are powers of two in practice)."""
        bs = min(self.block_size, max(64, self.active_capacity // 16))
        while bs > 1 and (self.active_capacity % bs
                          or self.surfel_capacity % bs):
            bs //= 2
        return bs


@dataclass(frozen=True)
class LoopClosureConfig:
    """Loop closure settings (reference ``config/default.xml:69-77``)."""

    enabled: bool = True
    residual_threshold: float = 1.15
    valid_threshold: float = 0.95
    outlier_threshold: float = 1.1
    search_distance: float = 50.0
    min_verifications: int = 5
    min_trajectory_distance: float = 200.0  # SurfelMapping.h:222 default
    delta_timestamp: int = 100              # minimum age of candidate poses
    max_loop_closure_distance: float = 8.0  # compose render gate
    compose_rendering: bool = True
    # verification gates the reference inlines as literals
    # (SurfelMapping.cpp:567,713,593) — exposed here so they can be tuned
    min_valid_ratio: float = 0.2        # valid_ratio > gate
    max_outlier_ratio: float = 0.85     # outlier_ratio < gate
    max_increment_difference: float = 0.1  # |log(inc_new)-log(inc_old)| < gate
    residual_margin: float = 0.1        # (res_old - res_new) < margin slack
    # coarse-to-fine pyramid levels for the candidate-search ICP: large-yaw
    # initializations inside the metric gates alias full-width projective
    # association but converge from coarse levels (see ops/pyramid.py);
    # the reference plumbs a pyramid but leaves it at level 0
    # (Frame2Model.cpp:127-129)
    search_levels: int = 3
    # robust m-estimator on loop-closure pose-graph edges (the reference
    # wraps factors in gtsam noiseModel::Robust when configured,
    # Posegraph.cpp:49-60,122-123): "huber" | "dcs" | "none". Odometry
    # edges stay Gaussian (they are trusted); one FALSE verified closure
    # is damped instead of corrupting the whole trajectory. Default is
    # DCS (redescending): measured on a 30-pose chain with one gross
    # false closure, huber's constant-force pull still drags the endpoint
    # ~37 m while dcs bounds the error at ~0 (tests/test_posegraph.py)
    robust_kernel: str = "dcs"
    robust_delta: float = 1.0           # kernel width in whitened-residual units
    # pipelined (device-carried) verification: phase-A verify runs as a
    # speculative per-scan device program chained off the odometry step so
    # the driver never drains the pipeline for a live candidate chain
    # (the reference overlaps this work with tracking the same way its
    # async GTSAM thread overlaps optimization, SurfelMapping.cpp:655-660)
    pipelined_verification: bool = True
    # run the pose-graph optimization on a background host thread and
    # integrate the result on a later scan (integrateLoopClosures,
    # SurfelMapping.cpp:212-253) instead of blocking the scan loop
    async_optimize: bool = True
    # skip the device rebase (pose-table rewrite + model re-render) when
    # the optimization moved the current pose by less than these gates;
    # the host pose log still takes the optimized values, and any skipped
    # correction is re-applied by the next above-gate rebase
    rebase_gate_translation: float = 0.02   # meters
    rebase_gate_rotation: float = 0.002     # radians
    # fraction of the active view used for the VERIFICATION old view
    # (read-only, built around the loop site): the fused verify program
    # renders the old view twice per scan, and its sort/gather cost
    # scales with view rows — 0.5 halves it. 1.0 reproduces the full
    # view (the candidate-SEARCH path always uses the full view; only
    # the per-scan chained verification uses the reduced one). Measured
    # accuracy-neutral on the 140-scan ledger lap (0.5/0.75/1.0 all
    # r_rel 0.0 once the driver's fresh-region sizing is right — an
    # early 0.8 deg/100m attribution to this knob was a confound with
    # min_fresh_rows, see cli.build_config).
    verify_view_fraction: float = 0.5


@dataclass(frozen=True)
class PreprocessConfig:
    """Vertex/normal map generation (reference Preprocessing.cpp)."""

    use_filtered_vertexmap: bool = False
    bilateral_sigma_space: float = 0.5
    bilateral_sigma_range: float = 2.5
    averaging_scheme: int = 0  # 0: z-buffer nearest, 1: blend average
    semantic_erosion: bool = True
    flood_fill: bool = True


@dataclass(frozen=True)
class SemanticConfig:
    """Semantic segmentation settings."""

    enabled: bool = True
    num_classes: int = 20
    model_path: str = ""
    # movable SemanticKITTI classes penalized as potentially dynamic
    # (reference src/shader/color_map.glsl + gen_vertexmap.vert:94-102)
    prior_movable_penalty: float = 0.5  # gen_surfels.geom:140
    remove_movable_on_init: bool = True
    init_scans: int = 10  # gen_vertexmap drops movable points for first scans


@dataclass(frozen=True)
class SumaConfig:
    """Top-level configuration bundle."""

    data: DataConfig = field(default_factory=DataConfig)
    model: DataConfig = field(default_factory=DataConfig)  # rendered model view
    icp: IcpConfig = field(default_factory=IcpConfig)
    map: MapConfig = field(default_factory=MapConfig)
    loop: LoopClosureConfig = field(default_factory=LoopClosureConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    semantic: SemanticConfig = field(default_factory=SemanticConfig)
    approach: str = "frame-to-model"  # or "frame-to-frame"
    odometry_info_translation: float = 1.0
    odometry_info_rotation: float = 1.0

    def __post_init__(self):
        # the view's fresh region must hold one full image of creations
        hw = self.data.height * self.data.width
        if self.map.min_fresh_rows < hw:
            object.__setattr__(self, "map",
                               replace(self.map, min_fresh_rows=hw))

    def replace(self, **kw) -> "SumaConfig":
        return replace(self, **kw)

    def small(self) -> "SumaConfig":
        """A downsized config for fast tests."""
        d = replace(self.data, width=180, height=32)
        return replace(
            self,
            data=d,
            model=d,
            map=replace(self.map, surfel_capacity=1 << 16, active_capacity=1 << 15,
                        max_poses=512),
        )


# ---------------------------------------------------------------------------
# XML compatibility layer
# ---------------------------------------------------------------------------

_XML_CASTS = {
    "integer": int,
    "float": float,
    "string": str,
    "boolean": lambda s: s.strip().lower() == "true",
}

# reference XML parameter name -> (section, field) in SumaConfig
_XML_MAP: Dict[str, Tuple[str, str]] = {
    "data_width": ("data", "width"),
    "data_height": ("data", "height"),
    "data_fov_up": ("data", "fov_up"),
    "data_fov_down": ("data", "fov_down"),
    "max_depth": ("data", "max_depth"),
    "min_depth": ("data", "min_depth"),
    "model_width": ("model", "width"),
    "model_height": ("model", "height"),
    "model_fov_up": ("model", "fov_up"),
    "model_fov_down": ("model", "fov_down"),
    "model_max_depth": ("model", "max_depth"),
    "model_min_depth": ("model", "min_depth"),
    "max iterations": ("icp", "max_iterations"),
    "stopping threshold": ("icp", "stopping_threshold"),
    "delta": ("icp", "delta"),
    "icp-max-distance": ("icp", "max_distance"),
    "icp-max-angle": ("icp", "max_angle"),
    "weighting": ("icp", "weighting"),
    "factor": ("icp", "factor"),
    "initialize_identity": ("icp", "initialize_identity"),
    "fallback_mode": ("icp", "fallback_mode"),
    "fallback-max-distance": ("icp", "fallback_max_distance"),
    "fallback-max-angle": ("icp", "fallback_max_angle"),
    "min_radius": ("map", "min_radius"),
    "max_radius": ("map", "max_radius"),
    "max_angle": ("map", "max_angle"),
    "map-max-distance": ("map", "max_distance"),
    "map-max-angle": ("map", "map_max_angle"),
    "unstable_age": ("map", "unstable_age"),
    "confidence_mode": ("map", "confidence_mode"),
    "confidence_threshold": ("map", "confidence_threshold"),
    "p_stable": ("map", "p_stable"),
    "p_prior": ("map", "p_prior"),
    "sigma_angle": ("map", "sigma_angle"),
    "sigma_distance": ("map", "sigma_distance"),
    "use_stability": ("map", "use_stability"),
    "update_always": ("map", "update_always"),
    "weighting_scheme": ("map", "weighting_scheme"),
    "averaging_scheme": ("map", "averaging_scheme"),
    "submap-dimension": ("map", "submap_dimension"),
    "submap-extent": ("map", "submap_extent"),
    "close-loops": ("loop", "enabled"),
    "loop-residual-threshold": ("loop", "residual_threshold"),
    "loop-valid-threshold": ("loop", "valid_threshold"),
    "loop-outlier-threshold": ("loop", "outlier_threshold"),
    "loop-search-distance": ("loop", "search_distance"),
    "loop-min-verifications": ("loop", "min_verifications"),
    "loop-min-trajectory-distance": ("loop", "min_trajectory_distance"),
    "max_loop_closure_distance": ("loop", "max_loop_closure_distance"),
    "compose_rendering": ("loop", "compose_rendering"),
    "loop-min-valid-ratio": ("loop", "min_valid_ratio"),
    "loop-max-outlier-ratio": ("loop", "max_outlier_ratio"),
    "loop-max-increment-difference": ("loop", "max_increment_difference"),
    "loop-residual-margin": ("loop", "residual_margin"),
    "loop-delta-timestamp": ("loop", "delta_timestamp"),
    "loop-search-levels": ("loop", "search_levels"),
    "loop-verify-view-fraction": ("loop", "verify_view_fraction"),
    "use_filtered_vertexmap": ("preprocess", "use_filtered_vertexmap"),
    "bilateral_sigma_range": ("preprocess", "bilateral_sigma_range"),
    "model_path": ("semantic", "model_path"),
    "approach": ("", "approach"),
}


def parse_parameter_xml(path: str) -> Dict[str, Any]:
    """Parse the reference's ``<config><param name=.. type=..>value</param></config>``
    format (the role of ``rv::parseXmlFile`` + yxml in the reference) into a dict."""
    root = ET.parse(path).getroot()
    out: Dict[str, Any] = {}
    for node in root.iter("param"):
        name = node.attrib["name"]
        typ = node.attrib.get("type", "string")
        cast = _XML_CASTS.get(typ, str)
        out[name] = cast(node.text or "")
    return out


def config_from_xml(path: str, base: SumaConfig | None = None) -> SumaConfig:
    """Load a SumaConfig from a reference-format XML file."""
    params = parse_parameter_xml(path)
    cfg = base or SumaConfig()
    sections: Dict[str, Dict[str, Any]] = {}
    top: Dict[str, Any] = {}
    for name, value in params.items():
        if name not in _XML_MAP:
            continue
        section, fname = _XML_MAP[name]
        if section == "":
            top[fname] = value
        else:
            sections.setdefault(section, {})[fname] = value
    for section, kv in sections.items():
        sub = getattr(cfg, section)
        cfg = replace(cfg, **{section: replace(sub, **kv)})
    if top:
        cfg = replace(cfg, **top)
    return cfg


def sweep(cfg: SumaConfig, grid: Dict[str, List[Any]]) -> Iterator[SumaConfig]:
    """Parameter-sweep iterator over dotted field paths, replacing the
    reference's ``RangeParameter``/``ParameterListIterator`` grid search
    (``/root/reference/src/rv/ParameterListIterator.h``).

    Example: ``sweep(cfg, {"icp.factor": [0.25, 0.5], "map.p_stable": [0.6]})``
    """
    keys = list(grid.keys())
    for combo in itertools.product(*(grid[k] for k in keys)):
        out = cfg
        for key, value in zip(keys, combo):
            parts = key.split(".")
            if len(parts) == 1:
                out = replace(out, **{parts[0]: value})
            else:
                section = getattr(out, parts[0])
                out = replace(out, **{parts[0]: replace(section, **{parts[1]: value})})
        yield out


def asdict(cfg: SumaConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
