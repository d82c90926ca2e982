"""Configuration pytrees and static simulation config.

The reference gym configures vehicles with a plain dict of 18 floats threaded
through every call (reference: gym/f110_gym/envs/f110_env.py:128,
base_classes.py:68-91).  Here the same fields become a `VehicleParams`
NamedTuple — a JAX pytree of arrays, so parameters can be batched per agent
and per env, donated to jit, and swept with `vmap` for population-based
tuning (the reference's CMA param-search use case,
examples/config_example_map.yaml).

`SimConfig` holds everything that must be static at trace time (shapes,
integrator choice, beam counts).  It is hashable so jitted step functions can
close over it.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp


class Integrator(enum.Enum):
    """Time integrator for the vehicle ODE (reference: base_classes.py:40-42)."""

    RK4 = 1
    EULER = 2


class VehicleParams(NamedTuple):
    """Vehicle physical parameters.

    Field names and defaults follow the reference parameter dict
    (reference: gym/f110_gym/envs/f110_env.py:67-128).  Every field is an
    array; fields may be scalars or carry leading (env, agent) batch axes —
    all dynamics kernels broadcast against the state's batch axes.
    """

    mu: jnp.ndarray        # surface friction coefficient
    C_Sf: jnp.ndarray      # front cornering stiffness coefficient
    C_Sr: jnp.ndarray      # rear cornering stiffness coefficient
    lf: jnp.ndarray        # CoG -> front axle distance [m]
    lr: jnp.ndarray        # CoG -> rear axle distance [m]
    h: jnp.ndarray         # CoG height [m]
    m: jnp.ndarray         # mass [kg]
    I: jnp.ndarray         # yaw moment of inertia [kg m^2]
    s_min: jnp.ndarray     # min steering angle [rad]
    s_max: jnp.ndarray     # max steering angle [rad]
    sv_min: jnp.ndarray    # min steering velocity [rad/s]
    sv_max: jnp.ndarray    # max steering velocity [rad/s]
    v_switch: jnp.ndarray  # wheel-spin switching velocity [m/s]
    a_max: jnp.ndarray     # max acceleration [m/s^2]
    v_min: jnp.ndarray     # min longitudinal velocity [m/s]
    v_max: jnp.ndarray     # max longitudinal velocity [m/s]
    width: jnp.ndarray     # car body width [m]
    length: jnp.ndarray    # car body length [m]

    @classmethod
    def default(cls, dtype=jnp.float32) -> "VehicleParams":
        """Default F1TENTH car (reference: f110_env.py:128)."""
        d = DEFAULT_PARAMS_DICT
        return cls(**{k: jnp.asarray(v, dtype=dtype) for k, v in d.items()})

    @classmethod
    def from_dict(cls, d: dict, dtype=jnp.float32) -> "VehicleParams":
        unknown = set(d) - set(cls._fields)
        if unknown:
            raise KeyError(f"unknown vehicle params: {sorted(unknown)}")
        merged = dict(DEFAULT_PARAMS_DICT)
        merged.update(d)
        return cls(**{k: jnp.asarray(merged[k], dtype=dtype) for k in cls._fields})

    def replace(self, **kw) -> "VehicleParams":
        return self._replace(**{k: jnp.asarray(v, dtype=self.mu.dtype) for k, v in kw.items()})


DEFAULT_PARAMS_DICT = {
    "mu": 1.0489,
    "C_Sf": 4.718,
    "C_Sr": 5.4562,
    "lf": 0.15875,
    "lr": 0.17145,
    "h": 0.074,
    "m": 3.74,
    "I": 0.04712,
    "s_min": -0.4189,
    "s_max": 0.4189,
    "sv_min": -3.2,
    "sv_max": 3.2,
    "v_switch": 7.319,
    "a_max": 9.51,
    "v_min": -5.0,
    "v_max": 20.0,
    "width": 0.31,
    "length": 0.58,
}


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (trace-time) simulation configuration.

    Mirrors the kwargs of the reference env constructor
    (reference: f110_env.py:100-157) minus anything that is a runtime array.
    Hashable so jitted functions can specialize on it.
    """

    num_agents: int = 2
    num_beams: int = 1080
    fov: float = 2.0 * math.pi          # fork delta: default 2*pi (f110_env.py:157)
    timestep: float = 0.01
    ego_idx: int = 0
    integrator: Integrator = Integrator.RK4
    # lidar
    theta_dis: int = 2000               # angle discretization bins (laser_models.py:360)
    max_range: float = 30.0
    eps: float = 0.0001                 # ray-march termination distance
    scan_noise_std: float = 0.01        # gaussian beam noise (laser_models.py:429)
    # iTTC wall-collision threshold (base_classes.py:113)
    ttc_thresh: float = 0.005
    # steering delay depth (base_classes.py:107)
    steer_delay: int = 2
    # finish-line geometry (f110_env.py:216-230)
    finish_band_halfwidth: float = 2.0
    finish_dist2: float = 0.1
    laps_to_finish_toggles: int = 4     # 4 toggles == 2 laps
    # numerics
    dtype: str = "float32"
    # ray-march iteration strategy: 0 -> while_loop until every beam
    # terminates; >0 -> fixed budget fori_loop (static unroll for pipelines)
    march_iters: int = 0
    # lidar mode: "exact" = reference-parity sphere march per beam;
    # "fast" = precomputed range texture R(x, y, theta) + trilinear lookup
    # (the BASELINE north-star design: one gather instead of a march)
    scan_mode: str = "exact"
    rt_theta_bins: int = 128      # angular bins of the range texture
    rt_pose_stride: int = 2       # texture cell = stride * map resolution
    # fast-scan epilogue backend.  "xla" (default): plain jnp — XLA fuses the
    # blend into downstream consumers (noise/iTTC/policy), measured ~8%
    # faster end-to-end.  "pallas": the fused shuffle-matmul kernel
    # (ops/pallas_scan.py) — faster in isolation (no (.., 3B) HBM
    # intermediate) but an optimization barrier for the consumers; use it
    # when the scan output feeds a matmul directly.  "auto" = "xla" on
    # today's measurements.
    scan_backend: str = "xla"
    # fast-scan theta interpolation.  "linear" (default): exact linear lerp
    # between theta bins (matches trace_fast).  "spectral": the full real-
    # valued roll goes into the DFT phase and beams are evaluated by one
    # constant matrix — no 3-tap elementwise tail (fastest), trigonometric
    # interpolation semantics with a Lanczos anti-ringing window.
    scan_interp: str = "linear"
    # range-texture STORAGE dtype.  "auto": bfloat16 when running float32
    # (TPU throughput mode) — halves the dominant texture-row gather bytes
    # (+31% whole-step throughput at 16k envs) at a ~0.4% range
    # quantization, the same order as the sensor noise the reference
    # injects (sigma = 1 cm, laser_models.py:429) — and full precision in
    # float64 parity mode.  Explicit "float32"/"bfloat16" override.
    # Interpolation/matmul COMPUTE always stays >= float32.
    rt_dtype: str = "auto"
    # fast-scan spatial lookup.  "bilinear" (default): blend the 4
    # surrounding texture cells — best median error (~0.2 cell) but mixes
    # foreground/background ranges across occlusion edges.  "nearest":
    # single best cell of the 4 (a real marched scan from the quantized
    # pose) — ~2x the median error, modestly smaller worst-case tail
    # (measured frac>4cell 2.5% -> 1.9% at defaults; the remaining tail
    # comes from THETA interpolation at visibility discontinuities, not
    # the spatial blend).  Same runtime cost (the blend becomes a
    # one-hot).  "nearest1": ONE rounded-cell gather instead of four —
    # the texture-row gather is the hottest kernel of the whole step, so
    # this is the ultra-throughput mode (~+35% whole-step); same error
    # class as "nearest", except a pose whose nearest cell center is
    # occupied reads scan 0 — defensible because such a pose is within
    # ~cell/sqrt(2) of a wall, inside the car's own half-width, i.e.
    # already physically colliding.
    rt_spatial: str = "bilinear"
    # fork delta (reference base_classes.py:68,91,280): pluggable low-level
    # controller mapping (speed_cmd, steer_cmd, v, steer, sv_max, a_max,
    # v_max, v_min) -> (accl, steer_vel).  None -> ops.dynamics.pid (the
    # reference default).  Must be a pure jnp function; it is trace-time
    # static (part of the compiled program), matching the reference's
    # construction-time injection.
    speed_controller: Optional[Callable] = None

    def __post_init__(self):
        if self.scan_mode not in ("exact", "fast"):
            raise ValueError(f"scan_mode must be 'exact' or 'fast', got "
                             f"{self.scan_mode!r}")
        if self.scan_backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"scan_backend must be 'auto'|'xla'|'pallas', "
                             f"got {self.scan_backend!r}")
        if self.scan_interp not in ("linear", "spectral"):
            raise ValueError(f"scan_interp must be 'linear'|'spectral', got "
                             f"{self.scan_interp!r}")
        if self.rt_spatial not in ("bilinear", "nearest", "nearest1"):
            raise ValueError(f"rt_spatial must be 'bilinear'|'nearest'|"
                             f"'nearest1', got {self.rt_spatial!r}")
        if self.rt_dtype not in ("auto", "float32", "bfloat16"):
            raise ValueError(f"rt_dtype must be 'auto'|'float32'|'bfloat16', "
                             f"got {self.rt_dtype!r}")
        if self.num_agents < 1 or self.num_beams < 2:
            raise ValueError("need num_agents >= 1 and num_beams >= 2")
        if self.ego_idx < 0 or self.ego_idx >= self.num_agents:
            raise ValueError(f"ego_idx {self.ego_idx} out of range for "
                             f"{self.num_agents} agents")
        if self.speed_controller is not None and not callable(self.speed_controller):
            raise ValueError("speed_controller must be callable (or None for "
                             "the reference PID)")

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def rt_jdtype(self):
        """Resolved range-texture storage dtype (see rt_dtype)."""
        if self.rt_dtype == "auto":
            return jnp.bfloat16 if self.jdtype == jnp.float32 else self.jdtype
        return jnp.dtype(self.rt_dtype)

    @property
    def angle_increment(self) -> float:
        return self.fov / (self.num_beams - 1)
