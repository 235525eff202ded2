"""YAML configuration tree (reference ConfigManager analog).

Reimplements the precedence semantics of the reference's unified config
manager (``/root/reference/src/oboyu/config/base.py:32-151``): a sectioned
YAML file is deep-merged over module defaults one level deep, CLI overrides
beat the file (``merge_cli_overrides``, None-filtered exactly as the
reference does at base.py:131), an unreadable/invalid file warns and falls
back to defaults rather than failing the job, and ``save_config`` round-trips
the resolved tree.  Sections map onto this engine's dataclasses
(``oboyu_ray.config.BuildConfig`` / ``BM25Config``) instead of the
reference's crawler/indexer/query pydantic-ish schema objects.

One deliberate hardening over the reference: unknown KEYS inside a known
section raise ``ValueError`` naming the valid keys (the reference silently
carries typos until a downstream constructor ignores them); unknown
SECTIONS are preserved verbatim, as the reference does, so user extensions
can ride the same file.
"""

from __future__ import annotations

import dataclasses
import warnings
from pathlib import Path
from typing import Any

from oboyu_ray.config import BM25Config, BuildConfig

# Query-engine defaults (reference base.py:21-27 QUERY_ENGINE_DEFAULTS —
# rerank/model knobs there correspond to our gated reranker seam and are
# owned by functions/rerank.py, not the retrieval config).
QUERY_DEFAULTS: dict[str, Any] = {
    "k": 10,
    "num_shards": None,
    "hydrate": False,
    "require_all": False,
}

FUZZY_DEFAULTS: dict[str, Any] = {"max_edits": 1, "buckets": 32}

# `oboyu index DIR` analog (reference crawler defaults, config/crawler.py).
INDEX_DIR_DEFAULTS: dict[str, Any] = {
    "include": None,  # comma-separated globs; None = *.txt,*.md
    "exclude": None,
    "chunk_size": 1024,
    "chunk_overlap": 256,
}

def _build_defaults() -> dict[str, dict[str, Any]]:
    """Complete default tree, derived from the live dataclasses so the two
    sources of truth cannot drift (reference _build_defaults, base.py:49)."""
    bc = dataclasses.asdict(BuildConfig())
    bm25 = bc.pop("bm25")
    build = {"files_per_part": 0, **bc}
    return {
        "build": build,
        "bm25": bm25,
        "query": dict(QUERY_DEFAULTS),
        "fuzzy": dict(FUZZY_DEFAULTS),
        "index_dir": dict(INDEX_DIR_DEFAULTS),
    }


class ConfigManager:
    """Sectioned YAML config with CLI > file > defaults precedence."""

    def __init__(self, config_path: str | Path | None = None) -> None:
        self._config_path = Path(config_path) if config_path else None
        self._config_data: dict[str, Any] | None = None
        self._defaults = _build_defaults()

    @property
    def config_path(self) -> Path | None:
        return self._config_path

    def load_config(self) -> dict[str, Any]:
        """File > defaults; memoized.  Invalid file warns and uses defaults
        (reference base.py:72-101)."""
        if self._config_data is not None:
            return self._config_data

        # merge into a LOCAL dict and memoize only on success: an
        # unknown-key ValueError must not leave a partially-merged config
        # behind for a later load_config()/get_section() call to return
        # silently (the exact silently-carried-typo hazard the validation
        # exists to prevent)
        data = {k: dict(v) for k, v in self._defaults.items()}
        if self._config_path is not None and self._config_path.exists():
            try:
                import yaml

                with open(self._config_path) as f:
                    file_config = yaml.safe_load(f) or {}
                if not isinstance(file_config, dict):
                    raise TypeError(
                        f"top level must be a mapping of sections, got "
                        f"{type(file_config).__name__}"
                    )
                for section, values in file_config.items():
                    if section in data and isinstance(values, dict):
                        known = self._defaults[section]
                        unknown = sorted(set(values) - set(known))
                        if unknown:
                            raise ValueError(
                                f"unknown key(s) {unknown} in section "
                                f"{section!r}; valid: {sorted(known)}"
                            )
                        data[section].update(values)
                    else:
                        # unknown sections (or scalar-valued ones) carry
                        # through verbatim, matching the reference
                        data[section] = values
            except ValueError:
                raise  # typos are a user error, not a fall-back case
            except Exception as e:  # unreadable / malformed YAML
                warnings.warn(
                    f"Failed to load config from {self._config_path}: {e}. "
                    f"Using defaults.",
                    stacklevel=2,
                )
                data = {k: dict(v) for k, v in self._defaults.items()}
        self._config_data = data
        return self._config_data

    def get_section(self, section: str) -> dict[str, Any]:
        config = self.load_config()
        return dict(config.get(section, {}))

    def merge_cli_overrides(
        self, section: str, overrides: dict[str, Any]
    ) -> dict[str, Any]:
        """CLI args > config file > defaults; None CLI values mean
        'not provided' and are filtered (reference base.py:115-137)."""
        merged = self.get_section(section)
        merged.update({k: v for k, v in overrides.items() if v is not None})
        return merged

    def save_config(self, config_data: dict[str, Any] | None = None) -> None:
        """Persist the resolved tree (reference base.py:139-151)."""
        if self._config_path is None:
            raise ValueError("ConfigManager has no config_path to save to")
        import yaml

        data = config_data if config_data is not None else self.load_config()
        self._config_path.parent.mkdir(parents=True, exist_ok=True)
        with open(self._config_path, "w") as f:
            yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)

    # ---- dataclass resolution ------------------------------------------

    def build_config(
        self,
        build_overrides: dict[str, Any] | None = None,
        bm25_overrides: dict[str, Any] | None = None,
    ) -> tuple[BuildConfig, int]:
        """Resolve the `build` + `bm25` sections (with optional CLI
        overrides) into the engine's frozen dataclasses.

        Returns ``(BuildConfig, files_per_part)`` — files_per_part is a
        build_index() argument, not a BuildConfig field.
        """
        build = self.merge_cli_overrides("build", build_overrides or {})
        bm25 = self.merge_cli_overrides("bm25", bm25_overrides or {})
        files_per_part = int(build.pop("files_per_part"))
        cfg = BuildConfig(bm25=BM25Config(**bm25), **build)
        return cfg, files_per_part
