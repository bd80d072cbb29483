"""Deterministic corpus mixing for training-data pipelines.

ADDITIVE — the reference has no dataset-mixture operator (SURVEY.md
§1.1); this is the "mix corpora at sampling weights" step every
LLM-pretraining data pipeline runs (e.g. upweight curated sources,
downweight crawl). Design constraints at 100 TB:

- **No shuffle.** Sampling is a pure narrow filter per source; the
  union is a plan-level concat. Nothing moves between executors.
- **Deterministic & portable.** Membership is a hash rule, not RNG
  state: keep a row iff the first 6 hex chars of ``md5(seed|id)``
  fall below the fraction threshold. Hex strings compare
  lexicographically = numerically, so the rule is one string
  comparison any engine with md5 can replay bit-identically (the
  DuckDB oracle does) — re-runs reproduce the same sample regardless
  of partitioning, speculative retries, or cluster size.
- **Composable.** Different seeds give independent samples; the same
  seed gives nested samples (frac 0.1 ⊂ frac 0.5), which is exactly
  what you want for scaling-law subset ladders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 6


def _hex_threshold(frac: float) -> str:
    t = max(0, min(_HEX_SPAN, int(round(frac * _HEX_SPAN))))
    return format(t, "06x")


def hash_key(id_col: str, seed="0"):
    """The 6-hex-char membership key ``md5(seed|id)[:6]`` — THE
    deterministic-Bernoulli rule shared by hash_bernoulli and
    learn.hash_split (one definition so the SQL oracles replay both
    from the same formula)."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(str(seed)),
                          F.col(id_col).cast("string"))), 1, 6)


def hash_bernoulli(sdf: SparkDF, id_col: str, frac: float,
                   seed="0") -> SparkDF:
    """Deterministic Bernoulli(frac) sample keyed on md5(seed|id).
    Resolution is 16^-6 ≈ 6e-8 of the fraction — far below any
    mixing-weight tolerance.

    frac that rounds to >= 1.0 short-circuits to the unfiltered frame
    (the hex threshold would otherwise be the 7-char string "1000000",
    which compares lexicographically *below* most 6-char prefixes and
    silently dropped ~94% of a keep-everything source); frac <= 0 is a
    constant-false filter."""
    t = max(0, min(_HEX_SPAN, int(round(frac * _HEX_SPAN))))
    if t >= _HEX_SPAN:
        return sdf
    if t <= 0:
        return sdf.filter(F.lit(False))
    return sdf.filter(hash_key(id_col, seed) < F.lit(_hex_threshold(frac)))


def weighted_sample(sdf: SparkDF, weight_col: str, id_col: str,
                    scale: float = 1.0, seed="0") -> SparkDF:
    """Deterministic PER-ROW importance resampling — the DSIR
    resample step (Xie et al. 2023) in its distributed-friendly
    Bernoulli-thinning form: keep each row with probability
    ``clip(weight·scale, 0, 1)``, decided by the same md5(seed|id)
    rule as hash_bernoulli, but with a PER-ROW threshold computed
    from the weight column. The kept set is partition-independent
    and SQL-replayable: key = the 6-hex md5 prefix as an integer,
    keep iff ``key < floor(clip(w·scale)·16^6 + 0.5)``. One narrow
    filter — no shuffle, no aggregate, no sorting by weight (true
    weighted sampling-without-replacement needs a global sort; the
    thinning form is what scales to 100 TB and is the published DSIR
    recipe). Rows with NULL weight are dropped (no defined keep
    probability)."""
    key_int = F.conv(hash_key(id_col, seed), 16, 10).cast("long")
    p = F.least(F.lit(1.0), F.greatest(
        F.lit(0.0), F.col(weight_col) * F.lit(float(scale))))
    thresh = F.floor(p * F.lit(float(_HEX_SPAN)) + F.lit(0.5))
    return sdf.filter(key_int < thresh)


def sample_mixture(sources, id_col: str, seed="0") -> SparkDF:
    """Mix corpora: ``sources = [(sdf, frac, tag), ...]`` → one frame
    with a ``_corpus`` provenance column. Each source is sampled under
    its own derived seed (``seed:i``) so per-source samples are
    independent; schemas may differ (missing columns null-fill)."""
    out = None
    for i, (sdf, frac, tag) in enumerate(sources):
        s = hash_bernoulli(sdf, id_col, frac, seed=f"{seed}:{i}")
        s = s.withColumn("_corpus", F.lit(tag))
        out = s if out is None else out.unionByName(
            s, allowMissingColumns=True)
    return out


def cap_per_key(sdf: SparkDF, key_cols, n: int, order_by) -> SparkDF:
    """Keep at most ``n`` rows per key, best-first — the per-domain /
    per-source cap every crawl-curation pipeline applies so one
    mega-domain can't dominate the mixture (the C4/RefinedWeb
    "top-N per host" rule). ``order_by`` is a Column or list of
    Columns ranking rows within a key (pass rounded scores + an id
    tie-break for a deterministic, oracle-replayable keep set).

    One shuffle on the keys (row_number window) over the full rows.
    When rows are HEAVY (document text) and the cap drops most of a
    mega-domain, rank a skinny projection yourself and semi-join the
    surviving ids back (the best_in_cluster_dedup shape):
    ``cap_per_key(df.select(key, score, id), ...).select(id)`` then
    ``df.join(ids, id, "leftsemi")`` — the corpus bytes never ride
    the ranking shuffle."""
    from pyspark.sql import Window

    keys = key_cols if isinstance(key_cols, (list, tuple)) else [key_cols]
    order = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def temperature_weights(counts: dict[str, int],
                        alpha: float = 0.7) -> dict[str, float]:
    """Source-temperature mixing weights (the multilingual-LM rule,
    e.g. XLM-R / Llama data recipes): resampling probability
    q_s ∝ p_s^alpha with p_s = n_s / Σn — alpha < 1 upsamples small
    sources relative to their natural share, alpha = 1 is natural
    sampling. Returns per-source KEEP FRACTIONS normalized so the
    largest is 1.0 (sample DOWN toward the temperature profile; no
    source is oversampled, which a Bernoulli filter cannot do).
    Driver-side arithmetic over the (tiny) per-source count dict —
    get it from one groupBy(source).count()."""
    if not counts:
        return {}
    total = float(sum(counts.values()))
    q = {s: (n / total) ** alpha for s, n in counts.items()}
    # keep_s ∝ q_s / p_s = p_s^(alpha-1); normalize max to 1.0
    keep = {s: q[s] / (counts[s] / total) for s in counts}
    mx = max(keep.values())
    return {s: k / mx for s, k in keep.items()}


def temperature_mixture(sdf: SparkDF, source_col: str, id_col: str,
                        alpha: float = 0.7, seed="0") -> SparkDF:
    """Resample a multi-source corpus toward the temperature-alpha
    profile: per-source deterministic Bernoulli keeps with
    temperature_weights fractions (md5-rule, so the kept set is
    partition-independent and SQL-oracle-replayable). ONE count
    aggregate (collects |sources| rows) + one narrow filter — the
    corpus never shuffles. Rows with a NULL source are EXCLUDED (the
    temperature profile is defined over named sources; a null key
    would also never match the equality predicate below)."""
    counts = {r[source_col]: r["n"] for r in
              sdf.groupBy(source_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()
              if r[source_col] is not None}
    keep = temperature_weights(counts, alpha)
    key = hash_key(id_col, seed)
    pred = F.lit(False)
    for s, frac in sorted(keep.items()):
        t = max(0, min(_HEX_SPAN, int(round(frac * _HEX_SPAN))))
        cond = (F.col(source_col) == s)
        if t >= _HEX_SPAN:
            pred = pred | cond
        elif t > 0:
            pred = pred | (cond & (key < F.lit(format(t, "06x"))))
    return sdf.filter(pred)
