"""YAML pipeline configuration (reference query_db/config.py:5-11 +
config_sample.yaml shape, generalized to the web-page pipeline).

Column mapping, thresholds, blocking passes, and org-name variants are
file-configurable; everything has the reference's defaults
(constants.py:19-22)."""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml


@dataclass
class CcerConfig:
    # input column mapping (config_sample.yaml:9-12 analog)
    column_mapping: dict = field(default_factory=dict)
    # linkage (constants.py:21, config_sample.yaml:21)
    name_threshold: float = 0.85
    input_name_style: str = "auto"
    reference_name_style: str = "auto"
    author_separator: str | None = None
    # entity validation (constants.py:22)
    entity_threshold: float = 0.85
    organization_names: list = field(default_factory=list)
    # ER pipeline
    blocking_passes: tuple = ("url", "host", "minhash", "simhash")
    minhash_bands: int = 32
    num_perm: int = 128
    block_cap: int = 500
    hamming_prefilter: int = 26
    cos_hi: float = 0.80
    cos_lo: float = 0.55
    jw_gate: float = 0.85
    lev_hi: float = 0.90
    # "hybrid" (JVM cosine tiers + Python kernels for the ambiguous band),
    # "sql" (zero Python crossings, the --no-udf mode), or "python"
    scorer: str = "hybrid"

    @classmethod
    def from_yaml(cls, path: str) -> "CcerConfig":
        with open(path) as fh:
            raw = yaml.safe_load(fh) or {}
        known = {k: v for k, v in raw.items() if k in cls.__dataclass_fields__}
        cfg = cls(**known)
        if isinstance(cfg.blocking_passes, list):
            cfg.blocking_passes = tuple(cfg.blocking_passes)
        return cfg

    def scoring_config(self):
        from ccer.operators.scoring import ScoringConfig

        return ScoringConfig(
            cos_hi=self.cos_hi, cos_lo=self.cos_lo,
            jw_gate=self.jw_gate, lev_hi=self.lev_hi,
            backend=self.scorer,
        )

    def pipeline_config(self):
        from ccer.plans.pipeline import PipelineConfig

        return PipelineConfig(
            num_perm=self.num_perm,
            minhash_bands=self.minhash_bands,
            block_cap=self.block_cap,
            passes=self.blocking_passes,
            scoring=self.scoring_config(),
            hamming_prefilter=self.hamming_prefilter,
        )

    def apply_column_mapping(self, df):
        """Rename input columns per ``column_mapping`` ({source: target})
        so arbitrarily-named page tables fit the pipeline's schema."""
        for src, dst in (self.column_mapping or {}).items():
            if src in df.columns:
                df = df.withColumnRenamed(src, dst)
        return df
