"""Declarative corpus-cleaning recipe — the composition layer over
the hygiene operators (text quality/repetition filters, PII
redaction, dedup, eval-set decontamination).

ADDITIVE (SURVEY.md §1.1): each stage is individually implemented and
driver-verified elsewhere (llm/text.py, llm/pii.py, llm/dedup.py,
llm/decontam.py); this module fixes the ORDER a 100 TB run wants:

1. narrow per-row filters first (quality, repetition, language) —
   pure Column predicates that reach the parquet scan and prune data
   before anything shuffles;
2. PII redaction next (narrow map, must precede fingerprinting so
   redacted text is what gets deduped and shipped);
3. dedup (the first shuffle — exact fingerprint or MinHash-LSH);
4. decontamination last (broadcast semi-join against the small eval
   gram set — cheapest on the already-shrunk corpus).

The narrow stages (1-2) collapse into the scan projection — Catalyst
folds the filter predicates and the redaction map into one pass. At
stage 3 the plan BRANCHES: dedup consumes the cleaned frame on both
sides of its semi-join and decontam again on both sides of its
anti-join, and Spark re-computes a lazy subtree once per consumer —
the 4-regex redaction chain and the quality regexes would run 3-4×.
``materialize=True`` (default) therefore snapshots the
filtered+redacted corpus ONCE (localCheckpoint — blocks are
GC-released after the query) before the branching stages; measured
2.3× end-to-end at sf0.1 with identical results. At 100 TB the
equivalent is writing the cleaned corpus to parquet before dedup —
which a real pipeline does anyway (it IS the deliverable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import decontam as _decontam
from mars_spark.llm import dedup as _dedup
from mars_spark.llm import pii as _pii
from mars_spark.llm import text as _text


def quality_predicate(col: Column | str, *, min_quality: float = 0.0,
                      max_dup2: float = 1.0, max_topw: float = 1.0,
                      min_tokens: int = 0,
                      langs: list[str] | None = None) -> Column:
    """The keep-row predicate for the filter stage — one Column
    expression so it folds into the scan."""
    keep = F.lit(True)
    if min_quality > 0.0:
        keep = keep & (_text.quality_score(col) >= min_quality)
    if max_dup2 < 1.0:
        keep = keep & (_text.dup_ngram_fraction(col, 2) <= max_dup2)
    if max_topw < 1.0:
        keep = keep & (_text.top_word_fraction(col) <= max_topw)
    if min_tokens > 0:
        keep = keep & (_text.token_count(col) >= min_tokens)
    if langs:
        keep = keep & _text.language_id(col).isin(langs)
    return keep


def clean_corpus(docs: SparkDF, *, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_quality: float = 0.0, max_dup2: float = 1.0,
                 max_topw: float = 1.0, min_tokens: int = 0,
                 langs: list[str] | None = None,
                 langid_model=None,
                 redact_pii: bool = True,
                 dedup: str | None = "exact",
                 dedup_threshold: float = 0.5,
                 vec_col: str | None = None,
                 n_clusters: int = 64,
                 eval_df: SparkDF | None = None,
                 decontam_k: int = 13,
                 line_dedup_sep: str | None = None,
                 source_col: str | None = None,
                 max_per_source: int | None = None,
                 temperature_alpha: float | None = None,
                 materialize: bool = True):
    """Run the standard pretraining-hygiene pipeline; returns the
    cleaned frame (same schema, ``text_col`` redacted in place when
    ``redact_pii``). ``dedup`` ∈ {None, 'exact', 'minhash',
    'semantic'} — 'semantic' needs ``vec_col`` (an embedding column)
    and dedups on cosine >= ``dedup_threshold`` inside deterministic
    IVF cells (raise ``n_clusters`` with corpus size).

    ``langs`` filters by language: with ``langid_model`` (a fitted
    ``llm.langid.NGramLangID``) the trained classifier decides
    (CCNet's lead hygiene stage); without it the marker-word
    ``text.language_id`` heuristic folds into the scan predicate.

    Optional curation stages, applied in pipeline order:
    - ``line_dedup_sep`` (e.g. ``"\\n"``): C4-style GLOBAL line dedup
      after doc-level dedup — first corpus occurrence of every line
      wins, docs reassemble in order, fully-deduped docs drop.
    - ``source_col`` + ``max_per_source``: per-domain cap, best
      quality first (quality_score ranking, id tie-break).
    - ``source_col`` + ``temperature_alpha``: md5-rule resampling
      toward the p^alpha source profile (XLM-R/Llama rule), applied
      LAST so mixing weights see the post-hygiene counts.

    ``materialize`` snapshots the filtered+redacted corpus before the
    branching dedup/decontam joins (see module docstring; pass False
    to keep the plan fully lazy, e.g. when composing into a larger
    plan that already persists)."""
    out = docs.filter(quality_predicate(
        text_col, min_quality=min_quality, max_dup2=max_dup2,
        max_topw=max_topw, min_tokens=min_tokens,
        langs=None if langid_model is not None else langs))
    if langid_model is not None and langs:
        # trained langid (llm/langid.NGramLangID, CCNet's lead stage)
        # replaces the marker-word heuristic when a fitted model is
        # provided: score (narrow map, broadcast model), filter, drop
        # the helper columns. Runs after the closed-form predicates
        # so the hash+NB transform only sees rows that survived the
        # cheap scan-folded filters.
        out = (langid_model.predict(out, text_col)
               .filter(F.col("lang_pred").isin(langs))
               .drop("lang_pred", "lang_conf"))
    if redact_pii:
        out = out.withColumn(text_col, _pii.redact(F.col(text_col)))
        # the eval set must see the SAME redaction, or any shared
        # k-gram containing PII would no longer match at decontam time
        # and a genuinely contaminated doc would survive
        if eval_df is not None:
            eval_df = eval_df.withColumn(
                text_col, _pii.redact(F.col(text_col)))
    if materialize and (dedup is not None or eval_df is not None
                        or line_dedup_sep is not None
                        or max_per_source is not None):
        # the frame is consumed 2× by dedup's semi-join, 2× by
        # decontam's anti-join, and again by line_dedup's reassembly
        # self-join and the per-source-cap semi-join; without a
        # snapshot each consumer re-runs the regex stages (measured
        # 2.3× end-to-end)
        out = out.localCheckpoint()
    if dedup == "exact":
        out = _dedup.exact_dedup(out, text_col, id_col)
    elif dedup == "minhash":
        out = _dedup.minhash_dedup(out, text_col, id_col,
                                   threshold=dedup_threshold)
    elif dedup == "semantic":
        if vec_col is None:
            raise ValueError("dedup='semantic' needs vec_col")
        from mars_spark.llm import similarity as _sim

        out = _sim.semantic_dedup(out, vec_col,
                                  threshold=dedup_threshold,
                                  n_clusters=n_clusters, id_col=id_col)
    elif dedup is not None:
        raise ValueError(f"unknown dedup mode {dedup!r}")
    if line_dedup_sep is not None:
        out = _dedup.line_dedup(out, text_col, id_col,
                                sep=line_dedup_sep)
    if eval_df is not None:
        out = _decontam.decontaminate(out, eval_df, text_col, id_col,
                                      k=decontam_k)
    if max_per_source is not None:
        if source_col is None:
            raise ValueError("max_per_source needs source_col")
        from mars_spark.llm.mixture import cap_per_key

        ids = cap_per_key(
            out.select(source_col, id_col,
                       _text.quality_score(text_col).alias("__q")),
            source_col, max_per_source,
            [F.desc("__q"), F.asc(id_col)]).select(id_col)
        out = out.join(ids, id_col, "leftsemi")
    if temperature_alpha is not None:
        if source_col is None:
            raise ValueError("temperature_alpha needs source_col")
        from mars_spark.llm.mixture import temperature_mixture

        out = temperature_mixture(out, source_col, id_col,
                                  alpha=temperature_alpha)
    return out
