"""Framework configuration (SURVEY.md section 5.6).

The reference's three config mechanisms — Cargo features (`std`, `alloc`,
`debug`, `rkyv-impl`, `legacy-proving`), the `CDF_OUTPUT` env var, and the
runtime `PlonkVersion` enum (Cargo.toml:46-62, compiler.rs:28-42) — collapse
into one dataclass, overridable from JSON or env.

Feature-flag mapping:
  legacy-proving -> PlonkConfig.legacy_proving (V2 proving gate)
  debug          -> PlonkConfig.debug (gate-identity debugger on prove failure)
  CDF_OUTPUT     -> PlonkConfig.trace_output (JSON gate trace path)
TPU-specific knobs: mesh axis name, MSM window override, NTT stage radix.
"""

from __future__ import annotations

import dataclasses
import json
import os


@dataclasses.dataclass
class PlonkConfig:
    # protocol
    legacy_proving: bool = False   # allow PlonkVersion.V2 proving
    debug: bool = False            # evaluate gate identities on prove failure
    trace_output: str | None = None  # path for JSON circuit/gate traces

    # TPU execution
    mesh_axis: str = "d"           # domain-sharding mesh axis name
    ntt_mode: str = "gspmd"        # sharded-prover NTT: "gspmd" | "four_step"
    msm_window_bits: int | None = None  # override adaptive Pippenger window
    device_srs_threshold: int = 512     # setup() switches to device gen above

    @staticmethod
    def from_json(path: str) -> "PlonkConfig":
        with open(path) as f:
            data = json.load(f)
        fields = {f.name for f in dataclasses.fields(PlonkConfig)}
        unknown = set(data) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return PlonkConfig(**data)

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


_config = PlonkConfig(
    debug=bool(os.environ.get("PLONK_DEBUG")),
    trace_output=os.environ.get("CDF_OUTPUT") or None,
    ntt_mode=os.environ.get("PLONK_NTT_MODE", "gspmd"),
)
if os.environ.get("PLONK_CONFIG"):
    _config = PlonkConfig.from_json(os.environ["PLONK_CONFIG"])


def get_config() -> PlonkConfig:
    return _config


def set_config(cfg: PlonkConfig) -> PlonkConfig:
    global _config
    _config = cfg
    return cfg
