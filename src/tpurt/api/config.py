"""Config system: frozen dataclass + YAML/flag overrides (SURVEY.md §2b #26).

Single source of truth for every knob in the pipeline; hashable so bench rows
can record exactly what ran.  The reference has no config system (SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class RenderConfig:
    """All render-path knobs."""

    method: str = "bvh"  # 'brute' | 'bvh' | 'packet' | 'wave' | 'pallas'
    leaf_size: int = 8
    spp: int = 1
    # soft/differentiable path
    soft: bool = False
    k_layers: int = 4
    sharpness: float = 100.0
    band: float = 0.08
    # candidate occluders per (ray, light) in the soft shadow model (shared
    # across layers; see render/pipeline._render_soft)
    k_occ: int = 8
    # area lights: Monte-Carlo samples per shading point on the scene's
    # emissive triangles (0 = point lights only); seed feeds the sampler key
    light_samples: int = 0
    light_seed: int = 0

    def tracer_kwargs(self) -> dict[str, Any]:
        return dict(method=self.method, leaf_size=self.leaf_size,
                    band=self.band if self.soft else 0.0)

    def render_kwargs(self) -> dict[str, Any]:
        return dict(soft=self.soft, k_layers=self.k_layers,
                    sharpness=self.sharpness, band=self.band,
                    k_occ=self.k_occ, light_samples=self.light_samples)


@dataclass(frozen=True)
class FitConfig:
    """Inverse-rendering (fit) knobs."""

    steps: int = 200
    lr: float = 1e-2
    optimizer: str = "adam"  # 'adam' | 'sgd'
    fit_verts: bool = True
    fit_albedo: bool = True
    grad_chunks: int = 1  # sub-batches for overlapped grad all-reduce
    ckpt_every: int = 50
    ckpt_path: str | None = None
    seed: int = 0
    # rebuild-on-drift: every `rebuild_every` steps, if the refit tree's
    # SAH-style quality (InverseRenderer.tree_quality) has degraded past
    # rebuild_ratio x its at-build value, rebuild topology from scratch at
    # the current vertices (refit-only fits stall under large
    # deformations).  0 disables the check.
    rebuild_every: int = 25
    rebuild_ratio: float = 2.0


@dataclass(frozen=True)
class DistConfig:
    """Mesh / multi-host knobs."""

    data_parallel: bool = True
    coordinator: str | None = None
    num_processes: int | None = None
    process_id: int | None = None


@dataclass(frozen=True)
class Config:
    render: RenderConfig = field(default_factory=RenderConfig)
    fit: FitConfig = field(default_factory=FitConfig)
    dist: DistConfig = field(default_factory=DistConfig)

    # -- serialization ----------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def digest(self) -> str:
        """Stable short hash identifying this exact configuration."""
        return hashlib.sha256(
            json.dumps(self.to_dict(), sort_keys=True).encode()
        ).hexdigest()[:12]

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        return cls(
            render=_apply(RenderConfig(), d.get("render", {})),
            fit=_apply(FitConfig(), d.get("fit", {})),
            dist=_apply(DistConfig(), d.get("dist", {})),
        )

    def with_overrides(self, overrides: dict[str, Any]) -> "Config":
        """Apply flat 'section.key' -> value overrides (CLI --set form)."""
        d = self.to_dict()
        for key, val in overrides.items():
            section, _, name = key.partition(".")
            if not name:
                raise KeyError(f"override {key!r}: use section.key form")
            if section not in d or name not in d[section]:
                raise KeyError(f"unknown config key {key!r}")
            d[section][name] = val
        return Config.from_dict(d)


def _apply(base, updates: dict[str, Any]):
    fields = {f.name: f.type for f in dataclasses.fields(base)}
    unknown = set(updates) - set(fields)
    if unknown:
        raise KeyError(f"unknown config keys {sorted(unknown)}")
    coerced = {}
    for k, v in updates.items():
        cur = getattr(base, k)
        if cur is not None and v is not None and not isinstance(v, type(cur)):
            v = type(cur)(v)  # str flags -> typed values
        coerced[k] = v
    return dataclasses.replace(base, **coerced)


def load_config(path: str | None = None, overrides: dict | None = None) -> Config:
    """Load from YAML/JSON file (optional) then apply flat overrides."""
    cfg = Config()
    if path:
        with open(path) as f:
            text = f.read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            try:
                import yaml  # optional; environment ships pyyaml with jax

                data = yaml.safe_load(text)
            except ImportError as e:
                raise ValueError(
                    f"{path}: not JSON and pyyaml unavailable"
                ) from e
        cfg = Config.from_dict(data or {})
    if overrides:
        cfg = cfg.with_overrides(overrides)
    return cfg
