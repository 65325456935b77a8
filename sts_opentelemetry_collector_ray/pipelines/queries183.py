"""Driver-contract queries, wave 183 — severity transition matrix between
consecutive conversation turns and the per-source character-class density
profile over documents.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES183: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_sev_transitions — consecutive-turn severity transition counts
# ---------------------------------------------------------------------------

_SEV_RE = r"^\[(?P<sev>[A-Z]+)\]"  # named group: pc.extract_regex requires one


def q_conv_sev_transitions(sf_dir: str):
    """Count of (severity → next severity) pairs over consecutive turns of the
    same conversation (ordered by turn_idx); rows without a `[SEV]` prefix
    count as 'NONE'.

    Scale shape: rows projected to (conv, idx, sev) ride ONE bounded
    conv-hash bucket exchange; each bucket sorts vectorized, shifts once and
    emits |sev|² pair counts; driver folds bounded partials."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = derive_transcripts_from_events(sf_dir)

    def project(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        sev_struct = pc.extract_regex(t["text"], _SEV_RE)
        sev = np.asarray(
            pc.struct_field(sev_struct, "sev").to_numpy(zero_copy_only=False)
        )
        sev = np.where(pd.isna(sev), "NONE", sev)
        df = pd.DataFrame(
            {
                "conv": conv,
                "idx": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "sev": sev,
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "idx"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        sev = g["sev"].to_numpy(object)
        same = conv[:-1] == conv[1:]
        if not same.any():
            return pd.DataFrame(
                {
                    "sev_from": pd.Series([], dtype=object),
                    "sev_to": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            pd.DataFrame(
                {"sev_from": sev[:-1][same], "sev_to": sev[1:][same], "n": 1}
            )
            .groupby(["sev_from", "sev_to"], sort=False, as_index=False)
            .sum()
            .astype({"n": np.int64})
        )
        return out

    part = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "sev_from": pd.Series([], dtype=object),
            "sev_to": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "sev_from" not in part.columns:
        return empty
    return (
        part.groupby(["sev_from", "sev_to"], sort=True, as_index=False)["n"]
        .sum()
        .astype({"n": np.int64})
    )


def _sev_transitions_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + r""",
t AS (
  SELECT conv_id, turn_idx,
         coalesce(nullif(regexp_extract(text, '^\[([A-Z]+)\]', 1), ''), 'NONE') AS sev
  FROM transcripts
),
p AS (
  SELECT sev AS sev_from,
         lead(sev) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS sev_to
  FROM t
)
SELECT sev_from, sev_to, CAST(count(*) AS BIGINT) AS n
FROM p WHERE sev_to IS NOT NULL GROUP BY 1, 2"""
    )


ORACLES183["conv_sev_transitions"] = _sev_transitions_oracle()


# ---------------------------------------------------------------------------
# docs_charclass_profile — per-source character-class density (micro units)
# ---------------------------------------------------------------------------


def q_docs_charclass_profile(sf_dir: str):
    """Per document source: doc count, total characters, and the ASCII
    letter / digit / space densities in micro units of total characters.

    Scale shape: per-batch bounded (source, n, chars, class sums) combiner
    with Arrow regex-count kernels; driver folds |sources| partials."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = t["text"]
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "n_docs": 1,
                "chars": pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64),
                "letters": pc.count_substring_regex(txt, "[A-Za-z]")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "digits": pc.count_substring_regex(txt, "[0-9]")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "spaces": pc.count_substring_regex(txt, " ")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        return (
            df.groupby("source", sort=False, as_index=False)
            .sum()
            .astype({c: np.int64 for c in ("n_docs", "chars", "letters", "digits", "spaces")})
        )

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "chars": pd.Series([], dtype=np.int64),
            "letters_micro": pd.Series([], dtype=np.int64),
            "digits_micro": pd.Series([], dtype=np.int64),
            "spaces_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("source", sort=True, as_index=False).sum()
    chars = g["chars"].to_numpy(np.float64)

    def dens(col: str) -> np.ndarray:
        return np.floor(
            g[col].to_numpy(np.float64) / chars * 1_000_000.0 + 0.5
        ).astype(np.int64)

    return pd.DataFrame(
        {
            "source": g["source"].to_numpy(object),
            "n_docs": g["n_docs"].to_numpy(np.int64),
            "chars": g["chars"].to_numpy(np.int64),
            "letters_micro": dens("letters"),
            "digits_micro": dens("digits"),
            "spaces_micro": dens("spaces"),
        }
    )


ORACLES183["docs_charclass_profile"] = """
WITH d AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS letters,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digits,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS spaces
  FROM documents
),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(chars) AS BIGINT) AS chars,
         CAST(sum(letters) AS BIGINT) AS letters,
         CAST(sum(digits) AS BIGINT) AS digits,
         CAST(sum(spaces) AS BIGINT) AS spaces
  FROM d GROUP BY 1
)
SELECT source, n_docs, chars,
       CAST(floor(CAST(letters AS DOUBLE) / CAST(chars AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS letters_micro,
       CAST(floor(CAST(digits AS DOUBLE) / CAST(chars AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS digits_micro,
       CAST(floor(CAST(spaces AS DOUBLE) / CAST(chars AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS spaces_micro
FROM g"""


QUERIES183 = {
    "conv_sev_transitions": q_conv_sev_transitions,
    "docs_charclass_profile": q_docs_charclass_profile,
}
