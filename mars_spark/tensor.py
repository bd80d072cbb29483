"""Thin tensor facade (SURVEY.md §2.9).

The reference ships a full 282-op ndarray engine (mars/tensor/); a
general ndarray engine is explicitly out of scope for the Spark-native
build. What the DataFrame layer actually consumes is kept: random
column generation (mars/tensor/random/, 42 ops → F.rand/randn +
deterministic hashing), element-wise ufuncs (→ Column math, §2.8),
reductions/statistics (→ aggregates, percentile), and distributed
linear algebra for the learn facade (→ MLlib linalg: RowMatrix SVD /
Gramian; mars/tensor/linalg/ has cholesky/qr/svd/… tiled by hand).

The full mars/tensor/linalg ten-op list (cholesky, qr, svd, lu,
solve, norm, matmul, tensordot, inv, randomized_svd) is covered at
the facade's tall-skinny shapes (r14): the n×d data stays
row-partitioned on the cluster, every reduction is per-batch gemm
partials (d×d / d×l), and only gram-sized work runs on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pyspark.sql import functions as F


def _spark() -> SparkSession:
    from mars_spark.session import get_spark

    s = SparkSession.getActiveSession()
    return s if s is not None else get_spark()


# ------------------------------------------------------- random (§2.9)
def rand(n: int, seed: int = 42, name: str = "x",
         num_partitions: int | None = None) -> SparkDF:
    """Uniform[0,1) column of length n (mars/tensor/random/rand.py).
    spark.range + F.rand: generated distributed, never materialized on
    the driver."""
    return _spark().range(0, n, 1, num_partitions).select(
        "id", F.rand(seed).alias(name))


def randn(n: int, seed: int = 42, name: str = "x",
          num_partitions: int | None = None) -> SparkDF:
    return _spark().range(0, n, 1, num_partitions).select(
        "id", F.randn(seed).alias(name))


def randint(n: int, low: int, high: int, seed: int = 42, name: str = "x",
            num_partitions: int | None = None) -> SparkDF:
    return _spark().range(0, n, 1, num_partitions).select(
        "id", (F.floor(F.rand(seed) * (high - low)) + low)
        .cast("bigint").alias(name))


def random_vectors(n: int, dim: int, seed: int = 42, name: str = "vec",
                   num_partitions: int | None = None) -> SparkDF:
    """(id, vec: array<double>) — deterministic per (id, position) via
    hash-seeded uniforms, reproducible regardless of partitioning
    (unlike F.rand, which is per-partition-seeded)."""
    u = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(F.substring(
                F.md5(F.concat_ws("|", F.col("id"), j, F.lit(seed))), 1, 8),
                16, 10).cast("double") / F.lit(float(0xFFFFFFFF))
        ),
    )
    return _spark().range(0, n, 1, num_partitions).select(
        "id", u.alias(name))


def arange(start, stop=None, step=1, name: str = "x",
           num_partitions: int | None = None) -> SparkDF:
    """mars/tensor/datasource/arange.py analog — spark.range IS the
    distributed arithmetic-sequence constructor."""
    if stop is None:
        start, stop = 0, start
    if any(isinstance(v, float) for v in (start, stop, step)):
        # float form: affine map over a counted range (numpy arange
        # semantics — int() truncation here would silently corrupt)
        import math

        if step == 0:
            raise ValueError("arange step must be nonzero")
        num = max(0, math.ceil((stop - start) / step))
        return _spark().range(0, num, 1, num_partitions).select(
            "id", (F.lit(float(start)) + F.col("id")
                   * F.lit(float(step))).alias(name))
    return _spark().range(int(start), int(stop), int(step),
                          num_partitions).withColumnRenamed("id", name)


def linspace(start: float, stop: float, num: int = 50,
             endpoint: bool = True, name: str = "x",
             num_partitions: int | None = None) -> SparkDF:
    """mars/tensor/datasource/linspace.py analog — an exact affine
    map over spark.range (generated distributed, the id→value
    expression runs in codegen)."""
    div = (num - 1) if endpoint else num
    step = (float(stop) - float(start)) / div if div else 0.0
    return _spark().range(0, num, 1, num_partitions).select(
        "id", (F.lit(float(start)) + F.col("id") * F.lit(step))
        .alias(name))


def ones(n: int, name: str = "x",
         num_partitions: int | None = None) -> SparkDF:
    """mars/tensor/datasource/ones.py analog (column form)."""
    return full(n, 1.0, name, num_partitions)


def zeros(n: int, name: str = "x",
          num_partitions: int | None = None) -> SparkDF:
    """mars/tensor/datasource/zeros.py analog (column form)."""
    return full(n, 0.0, name, num_partitions)


def full(n: int, fill_value, name: str = "x",
         num_partitions: int | None = None) -> SparkDF:
    """mars/tensor/datasource/full.py analog — constant column over a
    distributed range (never driver-materialized)."""
    return _spark().range(0, n, 1, num_partitions).select(
        "id", F.lit(fill_value).alias(name))


# -------------------------------------------------- statistics (§2.9)
def percentile(sdf: SparkDF, col: str, q) -> list[float]:
    """Exact percentile (mars/tensor/statistics/percentile.py). At
    100 TB use approx_percentile(relative_error>0)."""
    qs = [q] if isinstance(q, float) else list(q)
    row = sdf.agg(*[
        F.percentile(F.col(col), F.lit(x)).alias(f"p{i}")
        for i, x in enumerate(qs)
    ]).collect()[0]
    return [row[f"p{i}"] for i in range(len(qs))]


def histogram(sdf: SparkDF, col: str, bins: int = 10) -> list[tuple]:
    """Fixed-width histogram: one min/max pass + one bucket-count agg
    (mars/tensor/statistics/histogram.py tiles the same two passes)."""
    row = sdf.agg(F.min(col), F.max(col)).collect()[0]
    lo, hi = float(row[0]), float(row[1])  # Decimal columns → float
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    counts = (sdf.groupBy(bucket.alias("b"))
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy("b").collect())
    by_b = {int(r.b): r.n for r in counts}
    return [(lo + i * width, lo + (i + 1) * width, by_b.get(i, 0))
            for i in range(bins)]


def average(sdf: SparkDF, col: str, weights_col: str | None = None
            ) -> float:
    """mars/tensor/statistics/average.py — (weighted) mean as ONE
    aggregate; Σwx/Σw keeps the combine associative."""
    c = F.col(col).cast("double")
    if weights_col is None:
        row = sdf.agg(F.avg(c).alias("a")).collect()[0]
        if row["a"] is None:
            raise ZeroDivisionError(
                "average of an empty frame (numpy parity)")
        return float(row["a"])
    w = F.col(weights_col).cast("double")
    row = sdf.agg(F.sum(c * w).alias("n"),
                  F.sum(w).alias("d")).collect()[0]
    if row["d"] is None:
        raise ZeroDivisionError(
            "average of an empty frame (numpy parity)")
    return float(row["n"]) / float(row["d"])


def ptp(sdf: SparkDF, col: str) -> float:
    """mars/tensor/statistics/ptp.py — peak-to-peak (max − min), one
    aggregate pass."""
    row = sdf.agg(F.max(F.col(col).cast("double")).alias("hi"),
                  F.min(F.col(col).cast("double")).alias("lo")
                  ).collect()[0]
    if row["hi"] is None:
        raise ValueError("ptp of an empty frame (numpy parity)")
    return float(row["hi"]) - float(row["lo"])


def bincount(sdf: SparkDF, col: str, minlength: int = 0,
             max_size: int = 1 << 22) -> list[int]:
    """mars/tensor/statistics/bincount.py — counts of non-negative
    ints. Distributed groupBy-count; the collected result is bounded
    by max(col)+1 entries (numpy's own output contract). A cheap
    min/max pre-pass rejects negatives and driver-array-sized maxima
    BEFORE the distinct collect (the same explicit-escape-hatch rule
    as kendall's max_items / pdist's max_rows). NULLs are skipped
    (they have no integer bin; min/max already ignore them, so the
    group pass must too or the driver-side int() crashes)."""
    c = F.col(col).cast("long")
    sdf = sdf.filter(c.isNotNull())
    pre = sdf.agg(F.min(c).alias("lo"), F.max(c).alias("hi")
                  ).collect()[0]
    if pre["lo"] is None:
        return [0] * minlength
    if int(pre["lo"]) < 0:
        raise ValueError("bincount requires non-negative values")
    if int(pre["hi"]) + 1 > max_size:
        raise ValueError(
            f"bincount output would have {int(pre['hi']) + 1} "
            f"entries (> max_size={max_size}) — the numpy contract "
            "is a dense array up to max(col); pass max_size "
            "explicitly if you mean it")
    rows = (sdf.groupBy(c.alias("v"))
            .agg(F.count(F.lit(1)).alias("n")).collect())
    by_v = {int(r["v"]): int(r["n"]) for r in rows}
    size = max(int(pre["hi"]) + 1, minlength)
    return [by_v.get(i, 0) for i in range(size)]


def digitize(sdf: SparkDF, col: str, bins, right: bool = False,
             out_col: str = "bucket") -> SparkDF:
    """mars/tensor/statistics/digitize.py — numpy.digitize semantics
    (monotonically increasing bins): index = #{b ≤ x} (right=False)
    or #{b < x}. A size(filter(<literal array>)) Column — stays
    JVM-side, no shuffle, no UDF."""
    edges = [float(b) for b in bins]
    if any(b > a for a, b in zip(edges[1:], edges)):
        raise ValueError("bins must be monotonically increasing")
    arr = F.array(*[F.lit(b) for b in edges])
    x = F.col(col).cast("double")
    cmp = (lambda b: b < x) if right else (lambda b: b <= x)
    return sdf.withColumn(out_col, F.size(F.filter(arr, cmp)))


# -------------------------------------------------------- fft (§2.9)
def _fft_factor(n: int) -> int:
    """Largest divisor of n that is ≤ √n (n1 of the 4-step split)."""
    best = 1
    i = 1
    while i * i <= n:
        if n % i == 0:
            best = i
        i += 1
    return best


def fft(sdf: SparkDF, id_col: str, re_col: str,
        im_col: str | None = None, n: int | None = None,
        inverse: bool = False, _single_group_cap: int = 1 << 22
        ) -> SparkDF:
    """Distributed 1-D DFT of a length-N signal stored as
    (index, re[, im]) rows — the four-step Cooley–Tukey decomposition
    (mars/tensor/fft/ runs numpy FFT per chunk and recombines; the
    same N = n1·n2 splitting, Spark-shaped):

    1. inner FFTs: group by j1 = j mod n1 → n1 groups of n2 rows,
       ``np.fft`` per group (one applyInPandas),
    2. twiddle: multiply by ω_N^(j1·k2) — pure Column cos/sin,
    3. outer FFTs: group by k2 → n2 groups of n1 rows (second
       applyInPandas),
    4. output index k = k2 + n2·k1.

    Two shuffles, each group bounded at ~√N — at N = 10¹² a group is
    10⁶ complex values, executor-sized. Returns (k, re, im). A prime
    (or badly-factoring) N cannot split into bounded groups; below
    ``_single_group_cap`` it falls back to one group, above it the
    transform re-expresses as Bluestein's chirp-z — three of these
    same FFTs at a power-of-two length M ≥ 2N−1 (``_bluestein``), so
    EVERY length runs distributed. ``inverse=True`` computes the
    unscaled-conjugate form and divides by N (numpy ifft
    convention)."""
    import numpy as np
    import pandas as pd

    if n is None:
        n = sdf.count()
    if n == 0:
        raise ValueError("fft of an empty frame")
    n1 = _fft_factor(n)
    sign = 1.0 if inverse else -1.0
    base = sdf.select(
        F.col(id_col).cast("long").alias("__j"),
        F.col(re_col).cast("double").alias("re"),
        (F.col(im_col).cast("double") if im_col is not None
         else F.lit(0.0)).alias("im"))
    if max(n1, n // n1) > _single_group_cap:
        # prime or badly-factoring length: groups would exceed the
        # cap — run the chirp-z re-expression instead
        return _bluestein(base, n, inverse, _single_group_cap)
    if n1 == 1:

        def whole(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("__j")
            if len(pdf) != n:
                raise ValueError(
                    f"fft: {len(pdf)} rows for declared length {n} — "
                    "the index must be exactly 0..n-1 (no gaps or "
                    "duplicates)")
            z = pdf["re"].to_numpy() + 1j * pdf["im"].to_numpy()
            zz = np.fft.ifft(z) * len(z) if inverse else np.fft.fft(z)
            return pd.DataFrame({"k": np.arange(len(z)),
                                 "re": zz.real, "im": zz.imag})

        out = (base.withColumn("__g", F.lit(0)).groupBy("__g")
               .applyInPandas(whole, "k long, re double, im double"))
        if inverse:
            out = out.select("k", (F.col("re") / n).alias("re"),
                             (F.col("im") / n).alias("im"))
        return out
    n2 = n // n1

    def inner(pdf: pd.DataFrame) -> pd.DataFrame:
        # one column of the n1×n2 view: x[j1 + n1·j2] over j2. The
        # length check turns an index-contract violation (gaps or
        # duplicate ids) into an error instead of a silently wrong
        # transform.
        pdf = pdf.sort_values("__j2")
        if len(pdf) != n2:
            raise ValueError(
                f"fft: group j1={int(pdf['__j1'].iloc[0])} has "
                f"{len(pdf)} rows, expected {n2} — the index must "
                "be exactly 0..n-1 (no gaps or duplicates)")
        z = pdf["re"].to_numpy() + 1j * pdf["im"].to_numpy()
        zz = np.fft.ifft(z) * len(z) if inverse else np.fft.fft(z)
        return pd.DataFrame({"__j1": pdf["__j1"].to_numpy(),
                             "__k2": np.arange(len(z)),
                             "re": zz.real, "im": zz.imag})

    def outer(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__j1")
        if len(pdf) != n1:
            raise ValueError(
                f"fft: group k2={int(pdf['__k2'].iloc[0])} has "
                f"{len(pdf)} rows, expected {n1} — the index must "
                "be exactly 0..n-1 (no gaps or duplicates)")
        z = pdf["re"].to_numpy() + 1j * pdf["im"].to_numpy()
        zz = np.fft.ifft(z) * len(z) if inverse else np.fft.fft(z)
        return pd.DataFrame({"__k2": pdf["__k2"].to_numpy(),
                             "__k1": np.arange(len(z)),
                             "re": zz.real, "im": zz.imag})

    a = (base.select((F.col("__j") % n1).alias("__j1"),
                     F.expr(f"__j div {n1}").alias("__j2"),
                     "re", "im")
         .groupBy("__j1")
         .applyInPandas(inner,
                        "__j1 long, __k2 long, re double, im double"))
    # j1·k2 < n1·n2 = n, so the integer product stays in a long for
    # any n < 2⁶² and the twiddle phase is already < 2π — no range
    # reduction concerns at any supported scale
    ang = (F.lit(sign * 2.0 * 3.141592653589793) / n
           * F.col("__j1") * F.col("__k2"))
    c, s = F.cos(ang), F.sin(ang)
    b = a.select(
        "__j1", "__k2",
        (F.col("re") * c - F.col("im") * s).alias("re"),
        (F.col("re") * s + F.col("im") * c).alias("im"))
    x = (b.groupBy("__k2")
         .applyInPandas(outer,
                        "__k2 long, __k1 long, re double, im double")
         .select((F.col("__k2") + F.col("__k1") * n2).alias("k"),
                 "re", "im"))
    if inverse:
        x = x.select("k", (F.col("re") / n).alias("re"),
                     (F.col("im") / n).alias("im"))
    return x


def _bluestein(base: SparkDF, n: int, inverse: bool,
               cap: int) -> SparkDF:
    """Chirp-z re-expression of a length-n DFT (Bluestein 1968) for
    prime / badly-factoring lengths: X[k] = w[k]·(a ⊛ b)[k] with
    a[j] = x[j]·w[j], w[j] = e^(−iπ·j²/n), b[m] = e^(+iπ·m²/n) — the
    linear convolution runs as THREE of this module's own 4-step
    FFTs at the power-of-two length M ≥ 2n−1 (which always splits
    into ~√M groups) plus one pointwise join. Chirp angles use the
    exact integer j² mod 2n (the chirp has period 2n in j²), so no
    trig-argument precision is lost at any n < 2³¹. ``base`` carries
    (__j, re, im); forward only — the inverse conjugates around it."""
    import math

    if inverse:
        conj_in = base.select("__j", "re", (-F.col("im")).alias("im"))
        out = _bluestein(conj_in, n, False, cap)
        return out.select(
            "k", (F.col("re") / n).alias("re"),
            (-F.col("im") / n).alias("im"))
    if n >= 1 << 31:
        raise ValueError("bluestein chirp needs j² in a long: "
                         "n must be < 2^31")
    m = 1
    while m < 2 * n - 1:
        m <<= 1
    spark = _spark()
    scale = math.pi / n

    def chirp(j_col, sign: float):
        jj = (j_col * j_col) % (2 * n)
        ang = F.lit(sign * scale) * jj
        return F.cos(ang), F.sin(ang)

    wc, ws = chirp(F.col("__j"), -1.0)
    a = base.select(
        "__j",
        (F.col("re") * wc - F.col("im") * ws).alias("re"),
        (F.col("re") * ws + F.col("im") * wc).alias("im"))
    zeros = spark.range(n, m).select(
        F.col("id").alias("__j"), F.lit(0.0).alias("re"),
        F.lit(0.0).alias("im"))
    a_pad = a.unionByName(zeros)
    # b wrapped for circular convolution: index m−q aliases −q; the
    # guarded when() keeps q² inside long range on inactive rows
    q = F.least(F.col("id"), F.lit(m) - F.col("id"))
    active = q < n
    bqq = F.when(active, (q * q) % (2 * n)).otherwise(F.lit(0))
    bang = F.lit(scale) * bqq
    b_pad = spark.range(m).select(
        F.col("id").alias("__j"),
        F.when(active, F.cos(bang)).otherwise(F.lit(0.0)).alias("re"),
        F.when(active, F.sin(bang)).otherwise(F.lit(0.0)).alias("im"))
    # the internal transforms MUST take the 4-step path: a cap below
    # M's own ~√M split would recurse straight back into Bluestein
    # (M doubles each level — unbounded). Power-of-two M splits into
    # groups of ≤ 2·√M, so that is the effective floor.
    inner_cap = max(cap, 2 * int(m ** 0.5) + 1)
    fa = fft(a_pad, "__j", "re", "im", n=m,
             _single_group_cap=inner_cap)
    fb = fft(b_pad, "__j", "re", "im", n=m,
             _single_group_cap=inner_cap)
    prod = (fa.alias("a").join(fb.alias("b"), "k")
            .select(F.col("k").alias("__j"),
                    (F.col("a.re") * F.col("b.re")
                     - F.col("a.im") * F.col("b.im")).alias("re"),
                    (F.col("a.re") * F.col("b.im")
                     + F.col("a.im") * F.col("b.re")).alias("im")))
    conv = fft(prod, "__j", "re", "im", n=m, inverse=True,
               _single_group_cap=inner_cap)
    kc, ks = chirp(F.col("k"), -1.0)
    return (conv.filter(F.col("k") < n)
            .select("k",
                    (F.col("re") * kc - F.col("im") * ks).alias("re"),
                    (F.col("re") * ks + F.col("im") * kc).alias("im")))


def ifft(sdf: SparkDF, id_col: str, re_col: str,
         im_col: str | None = None, n: int | None = None) -> SparkDF:
    """Inverse DFT (numpy ifft convention — see ``fft``)."""
    return fft(sdf, id_col, re_col, im_col, n=n, inverse=True)


def rfft(sdf: SparkDF, id_col: str, re_col: str,
         n: int | None = None) -> SparkDF:
    """Real-input DFT: the non-redundant half spectrum
    k ∈ [0, ⌊N/2⌋] (numpy rfft output contract). Runs the full
    4-step transform and prunes — the conjugate-symmetry halving is
    a constant-factor optimization the distributed form doesn't
    need; the OUTPUT contract is what callers depend on."""
    if n is None:
        n = sdf.count()
    return fft(sdf, id_col, re_col, None, n=n).filter(
        F.col("k") <= n // 2)


def irfft(sdf: SparkDF, id_col: str, re_col: str, im_col: str,
          n: int) -> SparkDF:
    """Inverse of ``rfft``: rebuild the conjugate-symmetric full
    spectrum from the half (mirror k → N−k with negated imaginary
    part), then one inverse transform; the imaginary output is ~0 by
    construction and dropped (numpy irfft contract). ``n`` is the
    ORIGINAL signal length (the half spectrum doesn't determine
    parity)."""
    half = sdf.select(F.col(id_col).cast("long").alias("k"),
                      F.col(re_col).cast("double").alias("re"),
                      F.col(im_col).cast("double").alias("im"))
    mirror = (half.filter((F.col("k") > 0) & (F.col("k") < n - F.col("k")))
              .select((F.lit(n) - F.col("k")).alias("k"), "re",
                      (-F.col("im")).alias("im")))
    full = half.filter(F.col("k") <= n // 2).unionByName(mirror)
    out = fft(full, "k", "re", "im", n=n, inverse=True)
    return out.select("k", "re")


def fftfreq(n: int, d: float = 1.0,
            num_partitions: int | None = None) -> SparkDF:
    """numpy.fftfreq as a distributed column: k/(d·n) for
    k < ⌈n/2⌉, else (k−n)/(d·n)."""
    k = F.col("id")
    f = F.when(k < (n + 1) // 2, k / (d * n)).otherwise(
        (k - n) / (d * n))
    return _spark().range(0, n, 1, num_partitions).select(
        k.alias("k"), f.alias("freq"))


def fft2(sdf: SparkDF, i_col: str, j_col: str, re_col: str,
         im_col: str | None = None, inverse: bool = False) -> SparkDF:
    """2-D DFT of an r×c matrix stored as (i, j, re[, im]) rows:
    length-c FFTs along every row (one applyInPandas grouped by i),
    then length-r FFTs along every column (grouped by the new column
    frequency). Both passes shuffle once and each group holds one
    AXIS — r×c can be arbitrarily large as long as a single row/
    column fits an executor (images, spectrogram frames; for an
    unbounded single axis use the 1-D ``fft``, whose 4-step split
    bounds groups at ~√N). Returns (ki, kj, re, im)."""
    import numpy as np
    import pandas as pd

    def axis_fft(key_col, pos_col, out_pos):
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(pos_col)
            pos = pdf[pos_col].to_numpy()
            # same index-contract guard as the 1-D fft: a missing or
            # duplicated cell must error, not silently mis-transform
            if len(pos) == 0 or pos[0] != 0 or pos[-1] != len(pos) - 1 \
                    or (len(pos) > 1 and (pos[1:] == pos[:-1]).any()):
                raise ValueError(
                    f"fft2: axis positions for "
                    f"{key_col}={int(pdf[key_col].iloc[0])} are not "
                    "exactly 0..len-1 (gaps or duplicates)")
            z = pdf["re"].to_numpy() + 1j * pdf["im"].to_numpy()
            # scaled ifft per axis: the two passes compose to the
            # full 1/(r·c) normalization with no extra job
            zz = np.fft.ifft(z) if inverse else np.fft.fft(z)
            return pd.DataFrame({
                key_col: pdf[key_col].to_numpy(),
                out_pos: np.arange(len(z)),
                "re": zz.real, "im": zz.imag})
        return run

    base = sdf.select(
        F.col(i_col).cast("long").alias("__i"),
        F.col(j_col).cast("long").alias("__j"),
        F.col(re_col).cast("double").alias("re"),
        (F.col(im_col).cast("double") if im_col is not None
         else F.lit(0.0)).alias("im"))
    rows = (base.groupBy("__i")
            .applyInPandas(axis_fft("__i", "__j", "__kj"),
                           "__i long, __kj long, re double, im double"))
    out = (rows.groupBy("__kj")
           .applyInPandas(axis_fft("__kj", "__i", "__ki"),
                          "__kj long, __ki long, re double, im double"))
    return out.select(F.col("__ki").alias("ki"),
                      F.col("__kj").alias("kj"), "re", "im")


def ifft2(sdf: SparkDF, i_col: str, j_col: str, re_col: str,
          im_col: str | None = None) -> SparkDF:
    """Inverse 2-D DFT (numpy ifft2 convention — see ``fft2``)."""
    return fft2(sdf, i_col, j_col, re_col, im_col, inverse=True)


def rfftfreq(n: int, d: float = 1.0,
             num_partitions: int | None = None) -> SparkDF:
    """numpy.rfftfreq — the non-negative frequencies k/(d·n) for
    k ∈ [0, ⌊n/2⌋]."""
    k = F.col("id")
    return _spark().range(0, n // 2 + 1, 1, num_partitions).select(
        k.alias("k"), (k / (d * n)).alias("freq"))


def ifftshift(sdf: SparkDF, k_col: str, n: int,
              out_col: str = "k_shifted") -> SparkDF:
    """Inverse of ``fftshift``: input bin k lands at position
    (k + ⌈n/2⌉) mod n (undoes fftshift for any n, odd included)."""
    return sdf.withColumn(
        out_col, (F.col(k_col) + (n + 1) // 2) % n)


def fftshift(sdf: SparkDF, k_col: str, n: int,
             out_col: str = "k_shifted") -> SparkDF:
    """numpy.fftshift as pure index arithmetic: the zero-frequency
    bin moves to the center — input bin k lands at position
    (k + ⌊n/2⌋) mod n, applied to the INDEX column (no data
    movement; downstream sorts/joins on the new index plan their own
    exchange)."""
    return sdf.withColumn(
        out_col, (F.col(k_col) + n // 2) % n)


# ---------------------------------------------------- spatial (§2.9)
def cdist(sdf: SparkDF, vec_col: str, y, id_col: str,
          metric: str = "euclidean") -> SparkDF:
    """mars/tensor/spatial/distance/cdist.py at the Spark shape: the
    right side is a driver-small matrix (the broadcastable case every
    100 TB pipeline actually runs row-wise) — delegates to the learn
    facade's per-batch-gemm pairwise kernel, returning the
    (id, y_idx, dist) long frame. For big×big use
    llm.similarity.knn_join (blocked theta-join, neither side
    collected)."""
    from mars_spark.learn.pairwise import pairwise_distances

    return pairwise_distances(sdf, [list(map(float, r)) for r in y],
                              vec_col, id_col, metric=metric)


def pdist(sdf: SparkDF, id_col: str, vec_col: str,
          metric: str = "euclidean", max_rows: int = 20_000) -> SparkDF:
    """mars/tensor/spatial/distance/pdist.py — all unordered pairs
    within one frame, returned LONG-FORM (id_i, id_j, dist with
    id_i < id_j) instead of numpy's condensed vector (a 100 TB engine
    must never promise an O(n²) driver array). The n² pair space is
    real, so a documented ``max_rows`` guard rejects unbounded input
    — raise it explicitly, or use llm.similarity.knn_join /
    neardup_pairs for the pruned forms. Broadcast self-join: one scan
    of the frame against its broadcast copy."""
    n = sdf.count()
    if n > max_rows:
        raise ValueError(
            f"pdist over {n} rows is an O(n²) pair explosion; pass "
            f"max_rows>={n} explicitly if you mean it, or use "
            "llm.similarity.knn_join for top-k / threshold forms")
    # cast up-front: float32 element arithmetic rounds per-op, so the
    # fold must run in double to be replayable against any engine
    left = sdf.select(F.col(id_col).alias("id_i"),
                      F.col(vec_col).cast("array<double>")
                      .alias("__vi"))
    right = sdf.select(F.col(id_col).alias("id_j"),
                       F.col(vec_col).cast("array<double>")
                       .alias("__vj"))
    j = left.join(F.broadcast(right), F.col("id_i") < F.col("id_j"))
    if metric == "euclidean":
        d = F.sqrt(F.aggregate(
            F.zip_with("__vi", "__vj", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v))
    elif metric == "sqeuclidean":
        d = F.aggregate(
            F.zip_with("__vi", "__vj", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v)
    elif metric == "cityblock":
        d = F.aggregate(
            F.zip_with("__vi", "__vj", lambda a, b: F.abs(a - b)),
            F.lit(0.0), lambda acc, v: acc + v)
    elif metric == "cosine":
        dot = F.aggregate(F.zip_with("__vi", "__vj",
                                     lambda a, b: a * b),
                          F.lit(0.0), lambda acc, v: acc + v)
        nrm = (lambda c: F.sqrt(F.aggregate(
            F.transform(c, lambda a: a * a), F.lit(0.0),
            lambda acc, v: acc + v)))
        d = 1.0 - F.try_divide(dot, nrm("__vi") * nrm("__vj"))
    else:
        raise NotImplementedError(f"pdist metric {metric!r}")
    return j.select("id_i", "id_j", d.alias("dist"))


def squareform(pairs: SparkDF, ids=None) -> SparkDF:
    """mars/tensor/spatial/distance/squareform.py (condensed →
    square direction) at the Spark shape: mirror the (i, j) long
    frame into both orders and add the zero diagonal — the square
    matrix STAYS a distributed long frame (i, j, dist), never a
    driver array. ``ids`` (an iterable of row ids) supplies the
    diagonal universe explicitly — required whenever a point can be
    absent from every pair (a single-row pdist, isolated points),
    since the pair frame alone cannot name it."""
    up = pairs.select("id_i", "id_j", "dist")
    lo = pairs.select(F.col("id_j").alias("id_i"),
                      F.col("id_i").alias("id_j"), "dist")
    if ids is not None:
        spark = _spark()
        diag = spark.createDataFrame(
            [(i,) for i in ids], "id_i long").select(
            "id_i", F.col("id_i").alias("id_j"),
            F.lit(0.0).alias("dist"))
    else:
        diag = (pairs.select(F.col("id_i").alias("k"))
                .union(pairs.select(F.col("id_j").alias("k")))
                .distinct()
                .select(F.col("k").alias("id_i"),
                        F.col("k").alias("id_j"),
                        F.lit(0.0).alias("dist")))
    return up.unionByName(lo).unionByName(diag)


# ------------------------------------------------------ linalg (§2.9)
def gramian(sdf: SparkDF, vec_col: str):
    """Aᵀ·A of a tall-skinny matrix stored as an array column — ONE
    gemm (Xᵀ·X over the stacked batch) per Arrow batch, one d×d
    partial row per partition, summed on the driver (what
    mars/tensor/linalg tiles by hand as blockwise-multiply +
    tree-sum). The driver collect is bounded-contract:
    num_partitions × d² doubles (1000 partitions × d=64 ≈ 32 MB).
    Replaces the r8 per-row ``rdd.treeAggregate`` + ``np.outer`` path
    that pickled every row through Python — measured warm at
    local[32], 200k × 64 rows: 1.20 s (old) → 0.59 s (gemm), and the
    gap widens with row count since the old path ran O(rows) Python
    calls (at the 2k-row bench scale both are overhead-dominated and
    within noise). Returns a numpy (d, d) array, or None for an
    empty frame (parity with the treeAggregate zero)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__v"]])
            p = x.T @ x
            acc = p if acc is None else acc + p
        if acc is not None:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    partials = (sdf.select(F.col(vec_col).alias("__v"))
                .mapInPandas(gen, schema="g array<double>").collect())
    if not partials:
        return None
    mats = np.stack([np.asarray(r["g"], dtype=np.float64)
                     for r in partials])
    d = int(round(mats.shape[1] ** 0.5))
    return mats.sum(axis=0).reshape(d, d)


def svd(sdf: SparkDF, vec_col: str, k: int):
    """Top-k SVD of a tall-skinny array-column matrix via the Gramian
    (d×d eigendecomposition on the driver; d = vector dim, small).
    mars/tensor/linalg/svd.py tiles the equivalent two-stage QR."""
    import numpy as np

    g = gramian(sdf, vec_col)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    s = np.sqrt(np.maximum(vals[order], 0.0))
    return s, vecs[:, order]  # singular values, right singular vectors


def matmul(sdf: SparkDF, vec_col: str, b, out_col: str = "y") -> SparkDF:
    """Tall-skinny matrix times a small driver-side matrix: each row's
    d-vector maps to ``v @ B`` (d×m) — ONE gemm per Arrow batch
    (mars/tensor/linalg tiles A@B into chunk block-products; with a
    broadcastable right side the whole product is a narrow map, the
    only matmul shape a 100 TB pipeline runs row-wise). For big×big
    use MLlib BlockMatrix — deliberately not wrapped here
    (SURVEY §2.9 scope)."""
    import numpy as np
    import pandas as pd

    bm = np.asarray(b, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__v"]])
            out = x @ bm
            pdf = pdf.drop(columns="__v")
            pdf[out_col] = list(out)
            yield pdf

    cols = [c for c in sdf.columns if c != vec_col]
    base = sdf.select(*cols, F.col(vec_col).alias("__v"))
    schema = ", ".join(f"{c} {t}" for c, t in base.dtypes
                       if c != "__v") + f", {out_col} array<double>"
    return base.mapInPandas(gen, schema=schema)


def cholesky(g) -> "object":
    """Driver-side lower Cholesky of a (small, d×d) Gramian —
    mars/tensor/linalg/cholesky.py tiles this over chunked matrices;
    at tall-skinny shapes d is small and the factor is a driver
    computation over the tree-aggregated Gramian."""
    import numpy as np

    return np.linalg.cholesky(np.asarray(g, dtype=np.float64))


def _cross_partials(sdf: SparkDF, left_col: str, right_col: str):
    """Σ rows ``lᵀ·r`` of two array columns — one gemm per Arrow
    batch, one (dl×dr) partial per partition, summed on the driver
    (the cross-column generalization of ``gramian``; same bounded
    driver-collect contract). Returns numpy (dl, dr) or None for an
    empty frame."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__l"]])
            y = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__r"]])
            p = x.T @ y
            acc = p if acc is None else acc + p
        if acc is not None:
            yield pd.DataFrame({"g": [acc.ravel().tolist()],
                                "dl": [acc.shape[0]]})

    partials = (sdf.select(F.col(left_col).alias("__l"),
                           F.col(right_col).alias("__r"))
                .mapInPandas(gen, schema="g array<double>, dl int")
                .collect())
    if not partials:
        return None
    dl = int(partials[0]["dl"])
    mats = np.stack([np.asarray(r["g"], dtype=np.float64).reshape(dl, -1)
                     for r in partials])
    return mats.sum(axis=0)


def norm(sdf: SparkDF, col: str, ord=None) -> float:
    """Matrix / vector norm with numpy semantics
    (mars/tensor/linalg/norm.py). A scalar column is a length-n
    vector — ord None/2 = sqrt(Σx²), 1 = Σ|x|, inf = max|x|, each ONE
    distributed aggregate. An array column is an n×d matrix —
    None/'fro' = Frobenius (one agg of per-row square sums),
    1 / inf = max column / row absolute sum (a d-wide per-partition
    partial / one agg), 2 / 'nuc' = spectral / nuclear norm via the
    d×d Gramian's eigenvalues (driver-side, gram-sized like
    ``cholesky``). Every formulation is a single data pass."""
    import math

    import numpy as np

    is_array = dict(sdf.dtypes)[col].startswith("array")
    c = F.col(col)
    if not is_array:
        if ord in (None, 2):
            v = sdf.agg(F.sum(c.cast("double") * c).alias("s")
                        ).collect()[0]["s"]
            return math.sqrt(float(v or 0.0))
        if ord == 1:
            v = sdf.agg(F.sum(F.abs(c)).alias("s")).collect()[0]["s"]
            return float(v or 0.0)
        if ord == float("inf"):
            v = sdf.agg(F.max(F.abs(c)).alias("s")).collect()[0]["s"]
            return float(v or 0.0)
        raise NotImplementedError(f"vector norm ord={ord!r}")
    if ord in (None, "fro"):
        sq = F.aggregate(c, F.lit(0.0),
                         lambda a, x: a + x.cast("double") * x)
        v = sdf.agg(F.sum(sq).alias("s")).collect()[0]["s"]
        return math.sqrt(float(v or 0.0))
    if ord == float("inf"):
        rs = F.aggregate(c, F.lit(0.0),
                         lambda a, x: a + F.abs(x.cast("double")))
        v = sdf.agg(F.max(rs).alias("s")).collect()[0]["s"]
        return float(v or 0.0)
    if ord == 1:
        # max column abs-sum: d-wide per-partition partials (the
        # gramian collect contract), never an n×d explode shuffle
        import pandas as pd

        def gen(batches):
            acc = None
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.abs(np.vstack([np.asarray(v, dtype=np.float64)
                                      for v in pdf["__v"]])).sum(axis=0)
                acc = x if acc is None else acc + x
            if acc is not None:
                yield pd.DataFrame({"s": [acc.tolist()]})

        parts = (sdf.select(c.alias("__v"))
                 .mapInPandas(gen, schema="s array<double>").collect())
        if not parts:
            return 0.0
        return float(np.stack([np.asarray(r["s"]) for r in parts])
                     .sum(axis=0).max())
    if ord in (2, "nuc"):
        g = gramian(sdf, col)
        if g is None:
            return 0.0
        vals = np.sqrt(np.maximum(np.linalg.eigvalsh(g), 0.0))
        return float(vals.max() if ord == 2 else vals.sum())
    raise NotImplementedError(f"matrix norm ord={ord!r}")


def inv(g):
    """Driver-side inverse of a small d×d matrix — gram-sized like
    ``cholesky``. mars/tensor/linalg/inv.py tiles block-LU over
    chunked square matrices; at tall-skinny shapes every inverse this
    engine needs is of a d×d Gramian / R factor, a driver
    computation."""
    import numpy as np

    return np.linalg.inv(np.asarray(g, dtype=np.float64))


def lu(g):
    """Partial-pivot LU of a small d×d matrix, driver-side and
    numpy-only (scipy is deliberately not a dependency). Returns
    (P, L, U) with ``A = P @ L @ U`` — the mars convention
    (mars/tensor/linalg/lu.py). Doolittle elimination with row
    pivoting; the reference tiles the same factorization blockwise."""
    import numpy as np

    a = np.asarray(g, dtype=np.float64).copy()
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError("lu expects a square matrix")
    perm = np.arange(n)
    for k in range(n):
        piv = int(np.argmax(np.abs(a[k:, k]))) + k
        if piv != k:
            a[[k, piv]] = a[[piv, k]]
            perm[[k, piv]] = perm[[piv, k]]
        if a[k, k] != 0.0:
            a[k + 1:, k] /= a[k, k]
            a[k + 1:, k + 1:] -= np.outer(a[k + 1:, k], a[k, k + 1:])
    lo = np.tril(a, -1) + np.eye(n)
    up = np.triu(a)
    p = np.zeros((n, n))
    p[perm, np.arange(n)] = 1.0  # rows were permuted: A = Pᵀrows·L·U
    return p, lo, up


def solve(a, b=None, *, vec_col: str | None = None,
          b_col: str | None = None, return_parts: bool = False):
    """Solve ``A·x = b`` (mars/tensor/linalg/solve.py). Two shapes:

    - ``solve(G, rhs)`` with driver-side d×d input: plain LAPACK
      (gram-sized, like ``cholesky``/``inv``).
    - ``solve(sdf, vec_col=..., b_col=...)`` with a tall-skinny array
      column A and a scalar column b: the normal-equations solution
      ``x = (AᵀA)⁻¹·Aᵀb`` — exact for square consistent systems,
      least-squares otherwise (the only solve shape a 100 TB pipeline
      runs against row-partitioned data). ONE data pass: the gramian
      of the augmented [A | b] rows carries AᵀA, Aᵀb and bᵀb
      together; the d×d solve is driver-side, with an lstsq fallback
      for rank-deficient Gramians (a partition-constant feature must
      degrade to the min-norm solution, not a LinAlgError).

    ``return_parts=True`` (distributed shape) also returns
    ``(AᵀA, Aᵀb)`` so callers can audit the exact aggregates."""
    import numpy as np

    if vec_col is None:
        g = np.asarray(a, dtype=np.float64)
        return np.linalg.solve(g, np.asarray(b, dtype=np.float64))
    aug = a.select(F.concat(
        F.col(vec_col).cast("array<double>"),
        F.array(F.col(b_col).cast("double"))).alias("__ab"))
    gb = gramian(aug, "__ab")
    if gb is None:
        raise ValueError("solve on an empty frame")
    g, atb = gb[:-1, :-1], gb[:-1, -1]
    try:
        x = np.linalg.solve(g, atb)
    except np.linalg.LinAlgError:
        x = np.linalg.lstsq(g, atb, rcond=None)[0]
    return (x, g, atb) if return_parts else x


def tensordot(sdf: SparkDF, vec_col: str, b, axes=1, out_col: str = "y"):
    """Tensor contraction over the facade's supported shapes
    (mars/tensor/linalg/tensordot.py tiles the general form into
    blockwise products + tree-sums; Spark-side, the shapes a
    row-partitioned pipeline runs are):

    - ``b`` names ANOTHER array column and ``axes`` contracts the row
      axis (``axes=([0],[0])`` or ``"rows"``): returns the (dl×dr)
      numpy matrix ``Σ rows lᵀ·r`` via per-batch gemm partials —
      ``gramian`` is the ``b == vec_col`` special case.
    - ``b`` is a driver-side d×m matrix, ``axes=1`` (or
      ``([1],[0])``): delegates to ``matmul`` — one narrow gemm map.
    - ``b`` is a driver-side length-d vector, ``axes=1``: per-row dot
      product as ONE codegen'd JVM expression column (no Python in
      the hot path).

    General ndarray contractions are out of scope (SURVEY §2.9)."""
    import numpy as np

    rows_axes = (axes == "rows" or (isinstance(axes, (tuple, list))
                 and tuple(map(tuple, axes)) == ((0,), (0,))))
    if isinstance(b, str):
        if not rows_axes:
            raise NotImplementedError(
                "column×column tensordot supports only row-axis "
                "contraction (axes=([0],[0]))")
        return _cross_partials(sdf, vec_col, b)
    bm = np.asarray(b, dtype=np.float64)
    mat_axes = (axes == 1 or (isinstance(axes, (tuple, list))
                and tuple(map(tuple, axes)) == ((1,), (0,))))
    if not mat_axes:
        raise NotImplementedError(f"tensordot axes={axes!r} out of "
                                  "facade scope (SURVEY §2.9)")
    if bm.ndim == 2:
        return matmul(sdf, vec_col, bm, out_col=out_col)
    if bm.ndim == 1:
        terms = " + ".join(
            f"CAST(element_at(`{vec_col}`, {j + 1}) AS DOUBLE) "
            f"* ({float(v)!r})" for j, v in enumerate(bm))
        return sdf.withColumn(out_col, F.expr(terms))
    raise NotImplementedError("tensordot rhs must be 1-D or 2-D")


def randomized_svd(sdf: SparkDF, vec_col: str, k: int,
                   n_oversamples: int = 10, n_iter: int = 2,
                   seed: int = 42):
    """Top-k randomized SVD (Halko–Martinsson–Tropp range finder; the
    reference reaches the same algorithm through sklearn's
    ``randomized_svd`` per chunk — mars/learn/decomposition/_pca.py).
    The n×d data never leaves the cluster and Y = A·Mₜ is never
    materialized: every power iteration folds into the d×l driver
    matrix Mₜ₊₁ = orth((AᵀA)·Mₜ), computed as ONE pass of per-batch
    ``xᵀ·(x·Mₜ)`` partials; the final pass emits YᵀY and YᵀA
    together over the augmented [x·M | x] rows. Driver work is
    d×l / l×d only (l = k + n_oversamples). Deterministic for a given
    seed. Returns ``(s, V)`` like ``svd``."""
    import numpy as np

    d_row = sdf.select(F.size(F.col(vec_col)).alias("d")).first()
    if d_row is None:
        raise ValueError("randomized_svd on an empty frame")
    d = int(d_row["d"])
    ell = min(d, k + n_oversamples)
    m = np.random.RandomState(seed).standard_normal((d, ell))
    m, _ = np.linalg.qr(m)

    for _ in range(max(0, int(n_iter))):
        # Mₜ₊₁ ∝ (AᵀA)·Mₜ via one pass: partials of xᵀ·(x·Mₜ)
        ydf = matmul(sdf.select(F.col(vec_col).alias("__x"),
                                F.col(vec_col)), vec_col,
                     m, out_col="__y")
        p = _cross_partials(ydf, "__x", "__y")
        if p is None:
            raise ValueError("randomized_svd on an empty frame")
        m, _ = np.linalg.qr(p)
    # final pass: YᵀY and YᵀA from one augmented cross-partial —
    # [x·M | x] against itself would be (l+d)², so contract
    # [x·M] against [x·M | x] instead: (l × (l+d)) partials
    ydf = matmul(sdf.select(F.col(vec_col).alias("__x"),
                            F.col(vec_col)), vec_col, m, out_col="__y")
    aug = ydf.select(
        F.col("__y").cast("array<double>").alias("__y"),
        F.concat(F.col("__y").cast("array<double>"),
                 F.col("__x").cast("array<double>")).alias("__ya"))
    p = _cross_partials(aug, "__y", "__ya")
    gy, yta = p[:, :ell], p[:, ell:]
    # Cholesky-QR of the implicit Y: B = QᵀA = R⁻ᵀ·(YᵀA). A sketch
    # whose columns are linearly dependent (rank(A) < l — e.g. a
    # corpus of near-duplicate vectors) makes YᵀY singular; mirror
    # solve()'s contract (degrade, don't LinAlgError) by
    # orthonormalizing through the eigen-decomposition instead,
    # dropping the null directions.
    import numpy.linalg as npl

    try:
        r = npl.cholesky(gy).T
        bmat = npl.solve(r.T, yta)
    except npl.LinAlgError:
        vals, vecs = npl.eigh(gy)
        keep = vals > max(vals.max(), 0.0) * 1e-12
        if not keep.any():
            raise ValueError("randomized_svd of an all-zero matrix")
        bmat = (vecs[:, keep] / np.sqrt(vals[keep])).T @ yta
    _, s, vt = npl.svd(bmat, full_matrices=False)
    return s[:k], vt[:k].T


def qr(sdf: SparkDF, vec_col: str, q_col: str = "q", gram=None):
    """Tall-skinny QR by the indirect (Cholesky-QR) method — the
    distributed formulation mars/tensor/linalg/qr.py tiles: R comes
    from the Cholesky factor of the Gramian (R = Lᵀ where
    AᵀA = L·Lᵀ), and Q = A·R⁻¹ is one narrow gemm map. One data pass
    for the Gramian + one for Q; the d×d work is driver-side. Pass a
    precomputed ``gram`` (d×d, e.g. from an earlier ``gramian`` call
    on the same frame) to skip the first pass. Returns (frame with
    ``q_col``, R)."""
    import numpy as np

    g = (gramian(sdf, vec_col) if gram is None
         else np.asarray(gram, dtype=np.float64))
    r = cholesky(g).T
    rinv = np.linalg.inv(r)
    return matmul(sdf, vec_col, rinv, out_col=q_col), r
