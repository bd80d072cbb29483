"""One-object facade over the ANN compression ladder.

ADDITIVE (SURVEY.md §1.1) — the usability layer on top of
``llm.similarity``'s index families: a user picks a ``kind`` on the
compression/recall curve and gets build / search / batched-search /
save / load as one object, with the scale defaults (corpus-scaled
cell counts, cluster-partitioned persistence) applied for them.

| kind  | index row            | compression | search path          |
|-------|----------------------|-------------|----------------------|
| flat  | (id, cluster, e)     | none        | probe + Arrow gemv   |
| pq    | (id, cluster, codes) | ~64x        | probe + JVM ADC      |
| adc   | (id, cluster, codes) | ~64x        | probe + residual ADC |
| sq8   | (id, cluster, codes) | 4x          | probe + affine ADC   |
| bq1   | (id, words)          | 32x         | Hamming bit_count    |

Everything stays deterministic (the underlying builders' smallest-id
seeding), so a saved index reloads bit-identically. Persistence is
Spark-native: the index table writes partitionBy(cluster) (probe
pruning at the scan) and the constant-sized model data (centroids /
codebook / bounds / thresholds) rides in a one-row parquet sidecar
under ``<path>/_meta`` — any filesystem Spark can reach, no
driver-local files. Reference capability analog:
mars/learn/neighbors (proxima backends expose the same
build/search/save surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import similarity as S

_KINDS = ("flat", "pq", "adc", "sq8", "bq1")


class AnnIndex:
    def __init__(self, kind: str, index: SparkDF, model: dict,
                 id_col: str = "vec_id"):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}")
        self.kind = kind
        self.index = index
        self.model = model
        self.id_col = id_col

    # ------------------------------------------------------------ build
    @classmethod
    def build(cls, sdf: SparkDF, vec_col: str, kind: str = "adc",
              n_clusters: int | None = None, m: int = 8,
              nbits: int = 4, refine: int = 0,
              coarse_refine: int = 0,
              id_col: str = "vec_id") -> "AnnIndex":
        """Build an index of the chosen kind. ``n_clusters`` defaults
        to the corpus-scaled max(16, n/256) — the knob that keeps
        probe joins linear in corpus size (SCALE.md r11).
        ``coarse_refine=N`` runs N Lloyd iterations on the coarse
        quantizer (ivf_index_deterministic's trained path) — seeds
        alone give recall 1.0 on uniformly spread corpora, but on
        CLUSTERED data a trained quantizer balances the cells and
        buys recall at the same n_probe (SCALE.md r13 measurement);
        every iteration stays deterministic (smallest-id seeds,
        first-max argmax), so a refined index is still
        bit-reproducible. Sizing it
        needs one count() action; to avoid recomputing an uncached
        upstream lineage for that count AND again for the build, the
        input is localCheckpointed first (same snapshot discipline as
        ivf_index_deterministic). Callers that already know the corpus
        size can pass ``n_clusters`` explicitly and skip both."""
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}")
        if kind == "bq1":
            words, th = S.bq1_index(sdf, vec_col, id_col=id_col)
            return cls(kind, words, {"thresholds": list(th)}, id_col)
        if n_clusters is None:
            sdf = sdf.localCheckpoint()
            n_clusters = max(16, sdf.count() // 256)
        if kind == "flat":
            assigned, cents = S.ivf_index_deterministic(
                sdf, vec_col, n_clusters=n_clusters, id_col=id_col,
                refine=coarse_refine)
            return cls(kind, assigned, {"centroids": cents}, id_col)
        if kind == "pq":
            idx, cents, cb = S.ivfpq_index(
                sdf, vec_col, n_clusters=n_clusters, m=m, nbits=nbits,
                id_col=id_col, coarse_refine=coarse_refine)
            return cls(kind, idx, {"centroids": cents, "codebook": cb},
                       id_col)
        if kind == "adc":
            idx, cents, cb = S.ivfadc_index(
                sdf, vec_col, n_clusters=n_clusters, m=m, nbits=nbits,
                id_col=id_col, refine=refine,
                coarse_refine=coarse_refine)
            return cls(kind, idx, {"centroids": cents, "codebook": cb},
                       id_col)
        idx, cents, mins, maxs = S.ivfsq8_index(
            sdf, vec_col, n_clusters=n_clusters, id_col=id_col,
            coarse_refine=coarse_refine)
        return cls(kind, idx, {"centroids": cents, "mins": mins,
                               "maxs": maxs}, id_col)

    # ----------------------------------------------------------- search
    def search(self, query: list, k: int = 10,
               n_probe: int = 4) -> SparkDF:
        """Top-k for ONE query vector. Result column is cos_sim
        (flat), adc_dist (pq/adc/sq8 — smaller is closer) or hamming
        (bq1)."""
        q = [float(x) for x in query]
        m = self.model
        if self.kind == "flat":
            return S.ivf_search(self.index, m["centroids"], q, k=k,
                                n_probe=n_probe, id_col=self.id_col)
        if self.kind == "pq":
            return S.ivfpq_search(self.index, m["centroids"],
                                  m["codebook"], q, k=k,
                                  n_probe=n_probe, id_col=self.id_col)
        if self.kind == "adc":
            return S.ivfadc_search(self.index, m["centroids"],
                                   m["codebook"], q, k=k,
                                   n_probe=n_probe, id_col=self.id_col)
        if self.kind == "sq8":
            return S.ivfsq8_search(self.index, m["centroids"],
                                   m["mins"], m["maxs"], q, k=k,
                                   n_probe=n_probe, id_col=self.id_col)
        qw = S.bq1_encode_query(q, m["thresholds"])
        return S.hamming_search(self.index, qw, k=k,
                                id_col=self.id_col)

    def search_queries(self, queries: SparkDF, k: int = 10,
                       n_probe: int = 4,
                       query_id_col: str = "query_id",
                       query_vec_col: str = "q") -> SparkDF:
        """Batched top-k over a (query_id, vector) frame — one corpus
        pass scores every query (the bulk-retrieval shape)."""
        m = self.model
        if self.kind == "flat":
            return S.ivf_search_queries(
                self.index, m["centroids"], queries, k=k,
                n_probe=n_probe, id_col=self.id_col,
                query_id_col=query_id_col, query_vec_col=query_vec_col)
        if self.kind == "adc":
            return S.ivfadc_search_queries(
                self.index, m["centroids"], m["codebook"], queries,
                k=k, n_probe=n_probe, id_col=self.id_col,
                query_id_col=query_id_col, query_vec_col=query_vec_col)
        if self.kind == "pq":
            return S.pq_search_queries(
                self.index, m["codebook"], queries, k=k,
                id_col=self.id_col, query_id_col=query_id_col,
                query_vec_col=query_vec_col)
        if self.kind == "sq8":
            return S.sq8_search_queries(
                self.index, m["mins"], m["maxs"], queries, k=k,
                id_col=self.id_col, query_id_col=query_id_col,
                query_vec_col=query_vec_col)
        return S.hamming_search_queries(
            self.index, m["thresholds"], queries, k=k,
            id_col=self.id_col, query_id_col=query_id_col,
            query_vec_col=query_vec_col)

    # ------------------------------------------------------ persistence
    def save(self, path: str, mode: str = "overwrite") -> None:
        """Write the index table partitionBy(cluster) (probe pruning
        at the scan) + the constant-sized model sidecar at
        ``<path>/_meta`` — both through Spark's filesystem layer."""
        import json

        if "cluster" in self.index.columns:
            S.write_ivf_index(self.index, f"{path}/table", mode=mode)
        else:
            self.index.write.mode(mode).parquet(f"{path}/table")
        spark = self.index.sparkSession
        meta = spark.createDataFrame(
            [(self.kind, self.id_col, json.dumps(self.model))],
            "kind string, id_col string, model string")
        meta.coalesce(1).write.mode(mode).parquet(f"{path}/_meta")

    @classmethod
    def load(cls, spark, path: str) -> "AnnIndex":
        import json

        row = spark.read.parquet(f"{path}/_meta").first()
        index = spark.read.parquet(f"{path}/table")
        return cls(row["kind"], index, json.loads(row["model"]),
                   row["id_col"])
