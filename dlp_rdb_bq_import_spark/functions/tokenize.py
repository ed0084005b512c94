"""De-identification / re-identification transforms (T1-T5 of SURVEY.md §2.9).

The reference calls the Cloud DLP service with deid/inspect templates
(common/DLPTokenizationDoFn.java:66-159 for deid;
BQReidentificationPipeline.java:160-261 for reid). Here templates are
local objects and the transform runs inside Spark as vectorized Pandas
UDFs — Arrow batches stand in for the reference's one-DLP-call-per-scan-
split batching (SURVEY.md §4.2), and a per-batch unique-value cache
exploits FPE determinism so repeated values tokenize once.

Two transform kinds, matching the reference's template examples:
- whole-field FPE (README.md:195-279 — patient.name ALPHA_NUMERIC,
  patient.age custom alphabet "123456789", patientleave.sign_by);
- infoType inspect + surrogate-wrapped FPE inside free text
  (README.md:283-339 — PHONE_NUMBER at likelihood POSSIBLE, surrogate
  ``[PHONE]``; planted fixture "fever. phone number: 6477803777",
  sqlserver/sampledb.sql:2054-2058).

Surrogate format on the wire: ``NAME(len):token`` — the same
annotation shape DLP emits, regex-locatable so re-identification (T2)
can find and invert every token.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fpe import ALPHA_NUMERIC, FPECipher

# InfoType detector registry: deterministic regex detectors standing in
# for DLP's likelihood-ranked detectors (minLikelihood collapses to
# "pattern matched" in a deterministic engine).
INFO_TYPE_DETECTORS: dict[str, str] = {
    # 10 consecutive digits, optionally formatted 3-3-4 (fixture shape
    # "6477803777"); no digit on either side.
    "PHONE_NUMBER": r"(?<!\d)(?:\d{3}[-. ]\d{3}[-. ]\d{4}|\d{10})(?!\d)",
    "EMAIL_ADDRESS": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "CREDIT_CARD_NUMBER": r"(?<!\d)(?:\d{4}[- ]?){3}\d{4}(?!\d)",
    "US_SOCIAL_SECURITY_NUMBER": r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)",
    "IP_ADDRESS": r"(?<!\d)(?:\d{1,3}\.){3}\d{1,3}(?!\d)",
}

_SURROGATE_RE = re.compile(r"([A-Z_][A-Z_0-9]*)\((\d+)\):")


@dataclass(frozen=True)
class FieldTransform:
    """Whole-field FPE on named fields (cryptoReplaceFfxFpeConfig,
    README.md:195-279)."""

    fields: tuple[str, ...]
    alphabet: str = "ALPHA_NUMERIC"
    tweak: bytes = b""


@dataclass(frozen=True)
class InfoTypeTransform:
    """Inspect named fields for info types; FPE each match, wrapped in a
    surrogate annotation (README.md:283-339)."""

    fields: tuple[str, ...]
    info_types: tuple[str, ...] = ("PHONE_NUMBER",)
    surrogate: str = "PHONE"
    alphabet: str = "ALPHA_NUMERIC"


@dataclass(frozen=True)
class DeidTemplate:
    """A deid template: key + transform list (T5 per-table binding is
    DLPProperties.deid_template naming one of these)."""

    name: str
    key: bytes
    field_transforms: tuple[FieldTransform, ...] = ()
    info_type_transforms: tuple[InfoTypeTransform, ...] = ()


class TemplateRegistry:
    """Template name → template (the engine's stand-in for DLP's
    projects/*/deidentifyTemplates/* references)."""

    def __init__(self) -> None:
        self._templates: dict[str, DeidTemplate] = {}

    def register(self, template: DeidTemplate) -> None:
        self._templates[template.name] = template

    def get(self, name: str) -> DeidTemplate:
        return self._templates[name]

    def __contains__(self, name: str) -> bool:
        return name in self._templates


# ---------------------------------------------------------------------------
# pandas-side primitives (run inside Arrow batches on executors)
# ---------------------------------------------------------------------------


def _fpe_map_series(s: pd.Series, cipher: FPECipher, forward: bool, tweak: bytes) -> pd.Series:
    """FPE a string series with a unique-value cache (determinism ⇒ one
    encryption per distinct value per batch)."""
    fn = cipher.encrypt if forward else cipher.decrypt
    uniques = s.dropna().unique()
    table = {v: fn(v, tweak) for v in uniques}
    return s.map(table)


def _inspect_series(
    s: pd.Series, cipher: FPECipher, info_types: tuple[str, ...], surrogate: str
) -> pd.Series:
    pattern = re.compile("|".join(f"(?:{INFO_TYPE_DETECTORS[t]})" for t in info_types))

    def deid_one(text: str) -> str:
        def repl(m: re.Match) -> str:
            token = cipher.encrypt(m.group(0))
            return f"{surrogate}({len(token)}):{token}"

        return pattern.sub(repl, text)

    uniques = s.dropna().unique()
    table = {v: deid_one(v) for v in uniques}
    return s.map(table)


def _uninspect_series(s: pd.Series, cipher: FPECipher, surrogate: str) -> pd.Series:
    def reid_one(text: str) -> str:
        out = []
        pos = 0
        for m in _SURROGATE_RE.finditer(text):
            if m.group(1) != surrogate:
                continue
            tok_len = int(m.group(2))
            tok_start, tok_end = m.end(), m.end() + tok_len
            if tok_end > len(text):
                continue
            out.append(text[pos : m.start()])
            out.append(cipher.decrypt(text[tok_start:tok_end]))
            pos = tok_end
        out.append(text[pos:])
        return "".join(out)

    uniques = s.dropna().unique()
    table = {v: reid_one(v) for v in uniques}
    return s.map(table)


# ---------------------------------------------------------------------------
# DataFrame-level transforms
# ---------------------------------------------------------------------------


def _transform_df(
    df: DataFrame,
    template: DeidTemplate,
    forward: bool,
    null_to_empty: bool = False,
) -> DataFrame:
    """Apply (de|re)identification via one ``mapInPandas`` pass.

    One pass over Arrow batches transforms every configured column —
    mirroring the reference's one-DLP-request-per-split batching
    (DLPTokenizationDoFn.java:93-117) with no Python-per-row overhead.
    Configured columns are stringified first (the DLP path stringifies
    everything, DLPTokenizationDoFn.java:79-88); ``null_to_empty``
    reproduces null→"" compat (:84-87).
    """
    target_cols: dict[str, tuple] = {}
    for ft in template.field_transforms:
        cipher = FPECipher(template.key, ft.alphabet)
        for f in ft.fields:
            target_cols[f] = ("fpe", cipher, ft.tweak)
    for it in template.info_type_transforms:
        cipher = FPECipher(template.key, it.alphabet)
        for f in it.fields:
            target_cols[f] = ("inspect", cipher, it.info_types, it.surrogate)

    present = [c for c in df.columns if c in target_cols]
    if not present:
        return df  # passthrough for unconfigured tables (DLPTokenizationDoFn.java:153-158)

    casted = df.withColumns({c: F.col(c).cast("string") for c in present})
    if null_to_empty:
        casted = casted.withColumns({c: F.coalesce(F.col(c), F.lit("")) for c in present})
    out_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in target_cols else f.dataType, True)
            for f in casted.schema.fields
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for col, spec in target_cols.items():
                if col not in pdf.columns:
                    continue
                if spec[0] == "fpe":
                    _, cipher, tweak = spec
                    pdf[col] = _fpe_map_series(pdf[col], cipher, forward, tweak)
                else:
                    _, cipher, info_types, surrogate = spec
                    pdf[col] = (
                        _inspect_series(pdf[col], cipher, info_types, surrogate)
                        if forward
                        else _uninspect_series(pdf[col], cipher, surrogate)
                    )
            yield pdf

    return casted.mapInPandas(run, schema=out_schema)


def deidentify(df: DataFrame, template: DeidTemplate, null_to_empty: bool = False) -> DataFrame:
    """T1 — table de-identification (DLPTokenizationDoFn.java:66-159)."""
    return _transform_df(df, template, forward=True, null_to_empty=null_to_empty)


def reidentify(df: DataFrame, template: DeidTemplate) -> DataFrame:
    """T2 — record re-identification (BQReidentificationPipeline.java:160-261)."""
    return _transform_df(df, template, forward=False)


def make_sql_udfs(spark, template: DeidTemplate) -> None:
    """Expose tokenize/detokenize as SQL scalar functions so queries can
    say ``SELECT detokenize(card_number) ...`` (SURVEY.md §7.3)."""
    cipher = FPECipher(template.key, ALPHA_NUMERIC)

    @F.pandas_udf(T.StringType())
    def tokenize(s: pd.Series) -> pd.Series:
        return _fpe_map_series(s, cipher, True, b"")

    @F.pandas_udf(T.StringType())
    def detokenize(s: pd.Series) -> pd.Series:
        return _fpe_map_series(s, cipher, False, b"")

    spark.udf.register("tokenize", tokenize)
    spark.udf.register("detokenize", detokenize)
