"""Corpus mixing: reproducible per-domain sampling for pretraining data
mixtures (the "data recipe" step — e.g. upweight books, downweight web).

Two pieces:

* :func:`temperature_fractions` — pure math: turn observed per-domain
  sizes plus a sampling temperature into per-domain *keep fractions*
  (share ∝ size^(1/T), the multilingual/mixture reweighting rule from
  the XLM-R / mT5 line of work), scaled as large as possible without
  any fraction exceeding 1 (no upsampling — duplication is the
  dataloader's job, not the corpus store's).
* :func:`sample_by_domain` — apply keep fractions with the same
  md5-uniform used by :func:`.text.deterministic_split`: a document is
  kept iff hash(salt ‖ id) < fraction(domain). Deterministic across
  runs, partitionings, and engines — re-building the corpus reproduces
  the exact same sample, and a fraction increase strictly *grows* the
  previous sample (nested samples), which is what makes ablation
  mixtures comparable. Pure projection + filter: no shuffle, no rand()
  (rand(seed) is partition-layout-dependent, so it is NOT reproducible
  under repartitioning — the hash is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localframe import local_df
from .text import hash_uniform


def temperature_fractions(
    sizes: dict[str, int], temperature: float = 1.0
) -> dict[str, float]:
    """Per-domain keep fractions realizing a temperature-T mixture.

    T=1 keeps the natural distribution (all fractions equal → scaled to
    1.0 = keep everything); T→∞ flattens toward uniform shares; T<1
    sharpens toward the largest domain. The target share of domain d is
    size_d^(1/T) / Σ size^(1/T); fractions are target_share/size scaled
    so the binding domain keeps 100% and nothing needs upsampling.
    """
    import math

    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    pos = {d: n for d, n in sizes.items() if n > 0}
    if not pos:
        return {d: 0.0 for d in sizes}
    if temperature == 1.0:
        # natural distribution: keep everything — exactly, not modulo
        # exp/log round-off (a 1-ulp-below-1.0 fraction would drop rows)
        return {d: (1.0 if n > 0 else 0.0) for d, n in sizes.items()}
    # Log-space: size^(1/T) overflows float64 for sharp temperatures on
    # web-scale counts (1e12^(1/0.01) = 1e1200). Only RATIOS matter, so
    # shift by the max exponent before exponentiating.
    logp = {d: math.log(n) / temperature for d, n in pos.items()}
    mx = max(logp.values())
    powered = {d: math.exp(v - mx) for d, v in logp.items()}
    z = sum(powered.values())
    # unnormalized keep rate ∝ target_share / natural_share
    rate = {d: (powered[d] / z) / (pos[d] / sum(pos.values())) for d in pos}
    scale = 1.0 / max(rate.values())
    out = {d: 0.0 for d in sizes}
    out.update({d: min(1.0, rate[d] * scale) for d in pos})
    return out


def sample_by_domain(
    df: DataFrame,
    fractions: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with its domain's fraction, decided by a stable
    content-independent hash of the document id (see module docstring
    for why not ``rand()``). Domains absent from ``fractions`` get
    ``default_fraction`` (0 = drop unknown domains, 1 = pass through).

    The fraction lookup compiles to a CASE expression — broadcast-free,
    shuffle-free, and Catalyst pushes the resulting filter into the
    scan when the domain column is a partition or stats column.

    Null handling: a null *id* cannot be hashed, so its row is kept
    whenever its domain keeps anything (fraction > 0) — losing data
    because an id is missing would be the worse surprise. A null
    *domain* gets ``default_fraction`` (null keys are rejected in
    ``fractions`` — the CASE equality could never match one).
    """
    for d, f in fractions.items():
        if d is None:
            raise ValueError(
                "fractions cannot have a null domain key (a CASE equality "
                "never matches null); null-domain rows get default_fraction"
            )
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {d!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    u = F.coalesce(hash_uniform(id_col, salt), F.lit(0.0))
    frac = F.lit(float(default_fraction))
    for d, f in sorted(fractions.items()):
        frac = F.when(F.col(domain_col) == F.lit(d), F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def mix_corpus(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """One-call recipe: count domains (one map-side-combined agg — the
    only job that touches the data before the filter), derive
    temperature fractions, and return the deterministic sample.
    Null-domain rows are excluded from the mixture math and dropped
    (``sample_by_domain`` CASE equality cannot match null)."""
    sizes = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count("*").alias("n")).collect()
        if r[domain_col] is not None
    }
    return sample_by_domain(
        df,
        temperature_fractions(sizes, temperature),
        domain_col=domain_col,
        id_col=id_col,
        salt=salt,
    )


def token_budget_mix(
    df: DataFrame,
    budget_tokens,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "budget",
) -> DataFrame:
    """Fill each domain's TOKEN budget — the unit a training run
    actually specifies ("30B tokens of web, 5B of code"), where
    :func:`sample_by_domain` works in doc-count fractions.

    Within each ``group_col`` value, documents rank by the universal
    md5 draw (rerun-/partitioning-/engine-stable, nested under salt
    like every sampling decision in this package) and are kept while
    the group's RUNNING token total, current doc included, stays
    within budget: the first doc that would overflow is dropped, as is
    everything after it in draw order. A budget increase strictly
    grows the kept set (same nested-sample property as the fraction
    sampler). ``budget_tokens`` is one int for every group or a
    ``{group value: int}`` dict — groups absent from the dict get
    budget 0.

    Returns the docs' (id, group, n_tokens) plus ``cum_tokens`` and
    ``kept``. Scale shape: the per-group prefix sum is
    :func:`..operators.skew.grouped_global_cumsum` — a handful of
    sources over billions of docs never funnels a source through one
    task; the budget table is a broadcast (or a literal).
    """
    from ..operators.skew import grouped_global_cumsum
    from .packing import _with_tokens

    d, tok = _with_tokens(df, text_col, token_col)
    d = d.select(
        id_col, group_col, F.col(tok).alias("n_tokens")
    ).withColumn("__draw", hash_uniform(id_col, salt))
    cum = grouped_global_cumsum(
        d,
        group_cols=[group_col],
        order_cols=[F.asc("__draw"), F.asc(id_col)],
        value_col="n_tokens",
        cumsum_col="cum_tokens",
    )
    if isinstance(budget_tokens, dict):
        spark = df.sparkSession
        # Budget keys must carry the GROUP COLUMN'S type (ADVICE r8: a
        # hardcoded string schema broke non-string group cols — an int
        # source id joined nothing and every group fell to budget 0).
        group_type = df.schema[group_col].dataType.simpleString()
        budgets = local_df(
            spark,
            [(k, int(v)) for k, v in budget_tokens.items()],
            f"{group_col} {group_type}, __budget long",
        )
        cum = cum.join(F.broadcast(budgets), group_col, "left").withColumn(
            "__budget", F.coalesce("__budget", F.lit(0))
        )
    else:
        cum = cum.withColumn("__budget", F.lit(int(budget_tokens)))
    return cum.select(
        id_col,
        group_col,
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.col("__budget")).alias("kept"),
    )
